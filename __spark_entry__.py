"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``cse_datapipeline_and_mls_spark``; this module
just adapts the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's analytics read path (E2, spark_stream.py:95-156) as
    one Catalyst plan: per-key pct-change → population z-score →
    anomaly flag → per-key anomaly summary. Scan → Project → Window →
    Filter → Aggregate with a single shuffle on the series key.
    """
    from pyspark.sql import functions as F

    from cse_datapipeline_and_mls_spark.operators import tswindow as TS
    from cse_datapipeline_and_mls_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    w = TS.series_window("user_id", ["ts", "event_id"])
    df = TS.with_diff_pct(ev, "value", w)
    df = TS.with_anomaly_flag(df, "pct_change", w)
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("anomaly") == "Anomaly", 1)).alias("n_anomalies"),
        F.round(F.avg("pct_change"), 6).alias("avg_pct_change"),
        F.round(F.max(F.abs(F.col("zscore"))), 6).alias("max_abs_z"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from cse_datapipeline_and_mls_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query; approximate/ML ops are
    registered without an oracle → rows-only check per the contract."""
    from cse_datapipeline_and_mls_spark.queries import ORACLE

    return dict(ORACLE)
