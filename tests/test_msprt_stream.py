"""Stream-vs-batch parity for the mSPRT experiment monitor: the
streaming operator's per-day emissions must match the batch
ab_msprt_sequential query row-for-row — integer state exactly, the
float chain to ~1 ulp of libm-vs-JVM ln (compared at 1e-9, three
orders below the q6 the batch query reports at).
"""

from __future__ import annotations

import os

import pytest

from cse_datapipeline_and_mls_spark import streaming as ST
from cse_datapipeline_and_mls_spark.queries import QUERIES
from cse_datapipeline_and_mls_spark.streaming.stateful import (
    msprt_columns,
    msprt_monitor_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders_stream_dir(spark, tmp_path_factory):
    """1995 orders split into 4 DAY-ALIGNED files (the monitor's ingest
    contract: day-complete micro-batches in day order), named so the
    file source lists them in order."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("msprt_orders"))
    o = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.year("o_orderdate") == 1995)
        .orderBy("o_orderdate", "o_orderkey")
    )
    days = sorted(
        r["d"] for r in o.select(F.col("o_orderdate").cast("date").alias("d")).distinct().collect()
    )
    cuts = [days[len(days) // 4], days[len(days) // 2], days[3 * len(days) // 4]]
    lo = None
    for i, hi in enumerate([*cuts, None]):
        part = o
        if lo is not None:
            part = part.filter(F.col("o_orderdate").cast("date") >= F.lit(lo))
        if hi is not None:
            part = part.filter(F.col("o_orderdate").cast("date") < F.lit(hi))
        part.coalesce(1).write.parquet(os.path.join(out, f"part{i}"))
        lo = hi
    return out


def test_msprt_stream_matches_batch_query(spark, orders_stream_dir):
    from pyspark.sql import functions as F

    schema = spark.read.parquet(f"{SF}/orders.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(orders_stream_dir, "part*"))
    )
    got = ST.run_to_memory_sink(
        msprt_monitor_stream(msprt_columns(stream)), "msprt_monitor_test"
    ).collect()
    got_by_day = {r["day"]: r for r in got}
    # every day emitted exactly once (day-aligned batches, append mode)
    assert len(got) == len(got_by_day)

    want = QUERIES["ab_msprt_sequential"](spark, SF).collect()
    assert len(want) == len(got)
    for w in want:
        g = got_by_day[w["day"]]
        assert (g["n_treat"], g["n_ctrl"]) == (w["n_treat"], w["n_ctrl"])
        # batch reports q6; quantize the stream's raw values the same way
        q6 = lambda x: __import__("math").floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
        assert q6(g["diff_musd"]) == pytest.approx(w["diff_musd"], abs=1e-9)
        assert q6(g["log_lambda"]) == pytest.approx(w["log_lambda"], abs=1e-9)
        assert g["reject"] == w["reject"]

    # the integer state is an exact fold: replay cumulative sums in pandas
    import numpy as np
    import pandas as pd

    o = pd.read_parquet(f"{SF}/orders.parquet")
    o = o[o["o_orderdate"].dt.year == 1995].copy()
    import hashlib

    o["t"] = o["o_custkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 2 == 0
    )
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["day"] = o["o_orderdate"].dt.date
    d = o.groupby("day", sort=True).apply(
        lambda grp: pd.Series(
            {
                "st": grp.loc[grp["t"], "cents"].sum(),
                "sc": grp.loc[~grp["t"], "cents"].sum(),
            }
        ),
        include_groups=False,
    )
    st_cum = d["st"].cumsum()
    sc_cum = d["sc"].cumsum()
    for day, r in got_by_day.items():
        assert r["s_treat_cents"] == int(st_cum.loc[day])
        assert r["s_ctrl_cents"] == int(sc_cum.loc[day])
