"""Table-maintenance tour: the lifecycle every long-lived parquet table
needs, end to end on a real partitioned table.

    python examples/table_maintenance.py [sf_dir]

1. land       — write events day-partitioned (pruning layout).
2. upsert     — apply a CDC batch with merge_upsert_parquet; only the
                touched day directories rewrite.
3. compact    — small-files OPTIMIZE-style rewrite.
4. expire     — TTL cleanup: drop partitions older than the horizon
                (directory removal, zero reads).
5. drift      — read back through read_with_schema_evolution after a
                new column appears.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402
from cse_datapipeline_and_mls_spark.sources.ingest import (  # noqa: E402
    read_with_schema_evolution,
)
from cse_datapipeline_and_mls_spark.sources.sinks import (  # noqa: E402
    compact_parquet,
    expire_partitions,
    merge_upsert_parquet,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("table-maintenance-tour")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "events_table")

        t0 = time.time()
        ev.write.partitionBy("day").parquet(path)
        n_dirs = len(glob.glob(f"{path}/day=*"))
        print(f"land          {time.time() - t0:5.2f}s  partitions={n_dirs}")

        # CDC batch: bump the value of 50 events on one day + 3 new rows
        t0 = time.time()
        one_day = ev.filter(F.col("day") == "2024-01-05").limit(50)
        updates = one_day.withColumn("value", F.col("value") + 1000.0).unionByName(
            one_day.limit(3).withColumn("event_id", F.col("event_id") + 10_000_000)
        )
        n = merge_upsert_parquet(
            spark, path, updates, ["event_id", "day"], partition_col="day"
        )
        print(f"upsert        {time.time() - t0:5.2f}s  rows in touched partitions={n}")

        t0 = time.time()
        dst = os.path.join(td, "compacted")
        files = compact_parquet(spark, path, dst, target_records_per_file=50_000)
        print(f"compact       {time.time() - t0:5.2f}s  files={files}")

        t0 = time.time()
        keep = [os.path.basename(d).split("=")[1] for d in sorted(glob.glob(f"{path}/day=*"))[-7:]]
        dropped = expire_partitions(spark, path, "day", keep_values=keep)
        print(f"expire        {time.time() - t0:5.2f}s  dropped={len(dropped)} kept={len(keep)}")

        # schema drift: a new column lands in a fresh partition
        t0 = time.time()
        newcol = (
            spark.createDataFrame([(99_000_001, "2024-02-01", 1.0, "gdpr")],
                                  "event_id long, day string, value double, consent string")
        )
        newcol.write.mode("append").partitionBy("day").parquet(path)
        merged = read_with_schema_evolution(spark, path)
        assert "consent" in merged.columns
        n_null = merged.filter(F.col("consent").isNull()).count()
        print(f"drift         {time.time() - t0:5.2f}s  consent col merged, "
              f"backfilled NULLs={n_null}")

    spark.stop()


if __name__ == "__main__":
    main()
