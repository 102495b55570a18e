"""Regression tests for the three r10 ADVICE findings:

1. CUPED theta moments must be formed in double — int64 cross products
   (n*sxy, sx*sx) wrap silently near sf10 (n~1.5e6, E[x^2]~2.6e7).
2. Boolean verdict columns (srm_flag / reject / significant) must be a
   pure function of the REPORTED q6-quantized statistic, not the raw
   one — a raw stat within 1 ulp of the threshold could flip the flag
   across engines while the q6 value matches.
3. Fellegi-Sunter blocking must coalesce the noun token to '' so a
   single-token p_name blocks like DuckDB's split_part (returns '')
   instead of dropping via the NULL equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_cuped_theta_survives_int64_overflow_scale(spark):
    # Moments sized like the sf10 failure mode: the int64 moment SUMS
    # (sx, sxy, sxx ~ 1e18) are fine, but the cross products n*sxx and
    # sx*sx (~1e19) exceed 2^63 — exactly where the old int64 theta
    # wrapped (ANSI off) or raised (ANSI on). The fixed expression
    # casts each moment to double BEFORE multiplying.
    rng = np.random.default_rng(7)
    x = rng.integers(300_000_000, 340_000_000, size=10).astype("int64")
    y = x + rng.integers(-1_000_000, 1_000_000, size=10).astype("int64")
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    m = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # replicate the query's fixed shape: double cross products
    got = m.select(
        (
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("theta")
    ).collect()[0]["theta"]
    # sanity: the cross products genuinely exceed int64
    sx = int(x.sum())
    assert sx * sx > 2**63
    xf, yf = x.astype("float64"), y.astype("float64")
    n = float(len(xf))
    want = (n * float((xf * yf).sum()) - xf.sum() * yf.sum()) / (
        n * float((xf * xf).sum()) - xf.sum() * xf.sum()
    )
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=1e-9)


def test_cuped_query_theta_matches_numpy_replay(spark):
    # end-to-end: the in-query double-cast theta must equal the numpy
    # float64 replay of the same moments at sf0.001
    got = QUERIES["ab_cuped_adjusted"](spark, SF).toPandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey"]]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["year"] = o["o_orderdate"].dt.year
    o = o[o["year"].isin([1995, 1996])]
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    per = cust.merge(
        o.pivot_table(
            index="o_custkey", columns="year", values="cents", aggfunc="sum"
        )
        .reindex(columns=[1995, 1996])
        .fillna(0)
        .rename(columns={1995: "x95", 1996: "y96"}),
        left_on="c_custkey",
        right_index=True,
        how="left",
    ).fillna(0)
    xs = np.floor(per["x95"].astype("float64") / 10000).astype("int64")
    ys = np.floor(per["y96"].astype("float64") / 10000).astype("int64")
    xf, yf = xs.astype("float64"), ys.astype("float64")
    n = float(len(xf))
    theta = (n * float((xf * yf).sum()) - xf.sum() * yf.sum()) / (
        n * float((xf * xf).sum()) - xf.sum() * xf.sum()
    )
    assert got["theta"].iloc[0] == pytest.approx(theta, abs=1e-6)


@pytest.mark.parametrize(
    "qname,stat_col,flag_col,threshold",
    [
        ("ab_srm_check", "chi2", "srm_flag", 3.841459),
        ("ab_msprt_sequential", "log_lambda", "reject", 2.995732273553991),
        ("ab_msprt_customer_grain", "log_lambda", "reject", 2.995732273553991),
        ("t_logrank_test", "logrank_chi2", "significant", 3.841459),
    ],
)
def test_flag_is_pure_function_of_reported_statistic(
    spark, qname, stat_col, flag_col, threshold
):
    out = QUERIES[qname](spark, SF).toPandas()
    assert len(out) > 0
    # the flag must be recomputable from the REPORTED (q6) statistic
    # alone — this is what guarantees engine/oracle agreement even
    # when the raw stat sits within 1 ulp of the threshold
    recomputed = out[stat_col] > threshold
    assert (out[flag_col].astype(bool) == recomputed).all()


def test_fellegi_sunter_single_token_name_blocks_on_empty(spark, tmp_path):
    # two single-token names must land in the same ''-noun block and
    # form a scored pair (DuckDB split_part parity), not silently drop
    parts = pd.DataFrame(
        {
            "p_partkey": [1, 2, 3, 4],
            "p_name": ["azure", "azure", "azure metal", "azure metal"],
            "p_type": ["STANDARD BRASS"] * 4,
            "p_brand": ["Brand#11"] * 4,
            "p_size": [5, 6, 5, 6],
        }
    )
    spark.createDataFrame(parts).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    out = QUERIES["j_fellegi_sunter_parts"](spark, str(tmp_path)).toPandas()
    # with the coalesce: block '' pairs (1,2) and block 'metal' pairs
    # (3,4) → 2 candidate pairs total; without it the NULL noun join
    # drops parts 1 and 2 entirely leaving only 1 pair
    assert int(out["n_pairs"].sum()) == 2
