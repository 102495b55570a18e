"""Sketch-rollup tour: build a mergeable rollup table once, answer
distinct-count / quantile / overlap questions from blobs forever.

    python examples/sketch_rollups.py [sf_dir]

1. build      — one scan: per-(day, event_type) HLL + KLL + theta row.
2. persist    — day-partitioned parquet (range queries prune dirs).
3. query      — merge blobs: totals per type, last-week range, p50/p95.
4. overlap    — theta set algebra: users in click ∩ purchase.
5. increment  — fold one more day in with merge_rollup_tables (no
                raw-data rescans; streaming twin: sketch_rollup_stream).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.operators import sketches as SK  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("sketch-rollup-tour")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )

    t0 = time.time()
    roll = SK.sketch_rollup(ev, ["day", "event_type"], "user_id", "value")
    n_roll = roll.count()
    print(f"build         {time.time() - t0:5.2f}s  rollup rows={n_roll}")

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "rollup")
        roll.write.partitionBy("day").parquet(path)
        stored = spark.read.parquet(path)

        t0 = time.time()
        per_type = SK.merge_sketch_rollup(
            stored, ["event_type"], quantiles=(0.5, 0.95)
        ).orderBy("event_type")
        for r in per_type.collect():
            print(
                f"  {r['event_type']:9s} distinct≈{r['n_distinct_est']:>5d} "
                f"rows={r['n_rows']:>6d} p50≈{r['q50_est']:.1f} p95≈{r['q95_est']:.1f}"
            )
        print(f"query(all)    {time.time() - t0:5.2f}s")

        t0 = time.time()
        recent = stored.filter(F.col("day") >= F.lit("2024-01-24").cast("timestamp"))
        last_week = SK.merge_sketch_rollup(recent, ["event_type"]).count()
        print(f"query(range)  {time.time() - t0:5.2f}s  groups={last_week} "
              "(day filter = directory pruning on the partitioned rollup)")

    t0 = time.time()
    ov = SK.distinct_overlap(
        load_table(spark, sf_dir, "events").filter(
            F.col("event_type").isin("click", "purchase")
        ),
        "event_type",
        "user_id",
    ).collect()[0]
    print(f"overlap       {time.time() - t0:5.2f}s  union≈{ov['n_union_est']:.0f} "
          f"intersection≈{ov['n_intersection_est']:.0f}")

    t0 = time.time()
    day1 = roll.orderBy("day").limit(5)
    merged = SK.merge_rollup_tables(roll, day1, ["day", "event_type"])
    print(f"increment     {time.time() - t0:5.2f}s  rows={merged.count()} "
          "(blob-level fold; raw events untouched)")
    spark.stop()


if __name__ == "__main__":
    main()
