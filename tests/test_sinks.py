"""Write-path layout contract (sources/sinks.py): partition pruning,
bounded file sizes, round-trip fidelity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.sources import load_table
from cse_datapipeline_and_mls_spark.sources.sinks import write_partitioned


def test_write_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(
        orders,
        path,
        partition_cols=["o_orderstatus"],
        sort_cols=["o_orderdate"],
        max_records_per_file=500,
    )

    # hive-style partition directories, one per status value
    statuses = {r["o_orderstatus"] for r in orders.select("o_orderstatus").distinct().collect()}
    dirs = {os.path.basename(d) for d in glob.glob(f"{path}/o_orderstatus=*")}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    # file sizes bounded: no data file exceeds max_records_per_file
    back = spark.read.parquet(path)
    counts = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts and all(r["n"] <= 500 for r in counts)

    # round trip loses nothing
    assert back.count() == orders.count()
    a = {tuple(r) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    b = {tuple(r) for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b

    # partition pruning: a status predicate reads only that directory
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
