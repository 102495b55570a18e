"""Write-path sinks: the layout contract a 100 TB table needs at rest.

The reference lands its outputs as keyed JSON documents and model
artifacts (reference spark_stream.py:149-156, rtdb_* sinks); this
module is the engine-side generalization: columnar, partitioned,
size-bounded files that downstream scans can prune and parallelize
over. Design rules encoded here:

- **Partition by low-cardinality query keys** (date, source): partition
  pruning turns P6-style date predicates into zero-I/O directory skips.
  Never partition by a high-cardinality key — a million tiny
  directories is a metastore DoS.
- **Bound file sizes, not file counts**: `maxRecordsPerFile` splits
  oversized partitions without a shuffle; a pre-write
  `repartition(partition_cols)` collapses the many-tasks × many-
  partitions cross product (which otherwise writes
  tasks × partitions tiny files).
- **Sort within files** on the habitual filter/join column so min/max
  page statistics prune row groups on read (poor man's z-order for the
  single-column case).
- **Bucketing** (`write_bucketed`) pre-shuffles ONCE at write time so
  every future equi-join/agg on the bucket key runs shuffle-free
  (verified in tests/test_bucketing.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with bounded file sizes.

    One shuffle (repartition on the partition key) so each on-disk
    partition is written by few tasks — without it, every task holding
    rows of every partition emits tasks × partitions small files.
    ``sortWithinPartitions`` orders rows inside each file so parquet
    min/max stats prune on ``sort_cols`` predicates at read time.
    """
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*[*partition_cols, *sort_cols])
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table write: pay the shuffle once at ingest so
    every later equi-join or aggregation on ``bucket_col`` between
    co-bucketed tables is exchange-free (SortMergeJoin with zero
    Exchange — asserted in tests/test_bucketing.py)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    target_records_per_file: int = 1_000_000,
    sort_cols: Sequence[str] = (),
) -> int:
    """Small-files maintenance (the OPTIMIZE-style rewrite every real
    table needs): read a fragmented parquet table, rewrite it as
    ``ceil(rows / target_records_per_file)`` right-sized files, return
    the file count. Streaming micro-batches and over-parallel writers
    both produce thousands of KB-scale files; at 100 TB the resulting
    per-file open/footer cost and scheduler pressure dominate scans, so
    periodic compaction is part of the layout contract (same family as
    `write_partitioned`/`write_zordered`).

    With ``sort_cols`` the rewrite range-partitions and sorts within
    files, so the compacted table ALSO gains min/max row-group pruning
    on those columns — compaction and clustering in one pass. Writes to
    ``dst_path`` (atomic swap is the caller's move/rename: Spark can't
    safely overwrite a path it is reading).
    """
    import math

    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, math.ceil(n / int(target_records_per_file)))
    if sort_cols:
        out = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
