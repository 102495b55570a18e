"""Batch sources for the driver's parquet testdata (SURVEY §2.1 S5/S6).

Parquet is self-describing, so no inference scan happens; the explicit
schemas in :mod:`..schemas` are asserted against the file footer to catch
drift early instead of at hash-compare time.

Scale note: at 100 TB the same call works unchanged — parquet scans get
column pruning + predicate pushdown from Catalyst, and
``spark.sql.files.maxPartitionBytes`` (default 128 MB) splits files into
right-sized input partitions. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TESTDATA_SCHEMAS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = tuple(TESTDATA_SCHEMAS)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    # The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
    # parquet reader rejects. Read nanos as long (legacy conf, runtime-
    # settable) and truncate to microsecond timestamps — the same
    # truncation DuckDB applies, so oracle hashes agree.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    actual = dict(df.dtypes)
    for field in TESTDATA_SCHEMAS[name].fields:
        if isinstance(field.dataType, T.TimestampType) and actual.get(field.name) == "bigint":
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"`{field.name}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names or TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register each table as a temp view for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
