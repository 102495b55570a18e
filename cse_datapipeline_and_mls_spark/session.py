"""SparkSession factory.

The reference configures Spark ad hoc per script
(reference: ml-algorithms/regression.py:36-41 — shuffle.partitions=30,
executor.memory=4g, hardcoded Windows python path). Here one factory owns
the config profile:

* AQE on — runtime partition coalescing, auto-broadcast, skew-join
  splitting. At 100 TB this is what turns a static 32-partition plan into
  a right-sized one.
* Arrow on — any pandas interop (Pandas UDFs, toPandas at the serving
  edge) moves columnar batches, not pickled rows.
* Session timezone pinned UTC — Spark timestamps are session-TZ-relative
  while the DuckDB oracle is UTC-naive; pinning makes hashes comparable.
* shuffle.partitions defaults to the local core count; on a real cluster
  AQE coalesces from a deliberately high initial number instead.
* Runtime Bloom-filter join pruning stays at Spark's default (enabled,
  10 GB application-side-scan floor) — it arms exactly at the scale it
  pays for; tests/test_runtime_filters.py proves the injection and
  result parity with lowered thresholds.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "cse_datapipeline_and_mls_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with the tuned profile."""
    cores = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    # Deployment-specific overrides ride in via SPARK_GRAFT_CONF
    # ("k=v;k=v", empty default): cluster profiles tune shuffle codec /
    # advisory partition size / join strategy WITHOUT code edits, and
    # the bench stays comparable because the default is no-op. Explicit
    # extra_conf (below) still wins over the env profile.
    for kv in filter(None, os.environ.get("SPARK_GRAFT_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        if k and v:
            # log each applied override so a bench/verify run records the
            # effective non-default config (ADVICE r14: silent overrides
            # can desync results from the committed baseline); note that
            # getOrCreate reuses any live session, in which case builder
            # configs — env overrides included — do not take effect.
            print(f"[session] SPARK_GRAFT_CONF override: {k.strip()}={v.strip()}")
            builder = builder.config(k.strip(), v.strip())
        else:
            print(f"[session] SPARK_GRAFT_CONF entry malformed (need k=v): {kv!r}")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
