"""Driver-facing query registry.

Every operator from SURVEY.md §2 registers here as a named (spark_fn,
oracle_sql) pair. ``spark_fn(spark, sf_dir) -> DataFrame`` is the engine's
implementation; ``oracle_sql`` is the ANSI-SQL twin DuckDB runs on the same
parquet for the hash-compare correctness gate. Non-SQL-expressible ops
(LSH, ML) register with ``oracle=None`` → rows-only check.

Determinism rules enforced across the registry (FIXTURES.md §6):
* every computed column aliased identically in both texts;
* doubles rounded (6 decimals) in BOTH engine and oracle so float
  summation order can't flip the hash;
* window orderings always include a unique tiebreaker column;
* stddev flavor (samp/pop) pinned explicitly on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from . import (  # noqa: F401
        analytics_q,
        attribution_q,
        coverage_q,
        curation_q,
        experiments_q,
        geo_q,
        functions_q,
        llmdata_q,
        ml_q,
        mleval_q,
        northstar,
        relational_q,
        streaming_q,
        tpch_more_q,
        windows_q,
    )


_load_all()
