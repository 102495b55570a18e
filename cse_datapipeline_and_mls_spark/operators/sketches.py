"""Frequent-items (heavy hitters) sketch: Misra–Gries, mergeable.

Completes the engine's sketch trio — HLL distinct counts
(``agg_approx_distinct``), GK quantiles (``agg_approx_percentile``),
and now frequency estimation — the three cardinality/percentile/
frequency questions every 100 TB corpus audit asks ("how many distinct
tokens", "what's the p99 doc length", "which tokens dominate").

Why a sketch when ``x_word_topk`` computes exact counts: the exact path
shuffles EVERY distinct token (vocabulary-sized exchange — fine at
millions of tokens, painful at web-corpus trillions). The Misra–Gries
path is one scan with O(k) memory per partition and a
k·partitions-sized exchange, independent of vocabulary size.

Guarantees (the textbook ones, asserted in tests/test_sketches.py):
- a per-partition sketch of size k undercounts any item by at most
  n_p/(k+1) (n_p = tokens in that partition); summing the per-item
  lower bounds across partitions keeps a global undercount bound of
  Σ n_p/(k+1) = n/(k+1);
- therefore every item with true count > n/(k+1) appears in the merged
  sketch, and true_count ∈ [est, est + n/(k+1)] for survivors.

Arrow path: ``mapInPandas`` — per batch a C-speed ``Counter`` builds
exact in-batch counts, which then fold into the bounded MG dict (the
decrement step amortizes to O(1) per token). No Python per-token work
beyond the Counter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SKETCH_SCHEMA = "item string, est long, n_part long"


def _mg_fold(mg: dict, batch_counts: dict, k: int) -> None:
    """Fold exact batch counts into a size-bounded Misra–Gries dict."""
    for item, c in batch_counts.items():
        if item in mg:
            mg[item] += c
        elif len(mg) < k:
            mg[item] = c
        else:
            # decrement all by the smallest admissible amount: the
            # classic one-at-a-time MG decrement, batched. Items that
            # hit zero make room; the new item keeps any surplus.
            dec = min(min(mg.values()), c)
            for key in [key for key, v in mg.items() if v == dec]:
                del mg[key]
            for key in mg:
                mg[key] -= dec
            if c > dec:
                mg[item] = c - dec


def frequent_items(
    df: DataFrame, tokens_col: Column | str, k: int = 64
) -> DataFrame:
    """Merged Misra–Gries sketch over an array column's elements.

    Returns (item, est, lo, hi): ``est`` sums the per-partition MG
    counters (a lower bound on the true count); ``lo``/``hi`` bracket
    the true count using the global n/(k+1) undercount bound. One scan,
    one k·partitions exchange.
    """
    exploded = df.select(F.explode(tokens_col).alias("item"))

    def sketch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from collections import Counter

        mg: dict = {}
        n = 0
        for pdf in batches:
            vals = pdf["item"]
            n += len(vals)
            _mg_fold(mg, Counter(vals), k)
        if n:
            yield pd.DataFrame(
                {"item": list(mg), "est": list(mg.values()), "n_part": n}
            )

    per_part = exploded.mapInPandas(sketch_partition, _SKETCH_SCHEMA)
    # total n must come from ALL partitions, including ones whose items
    # were fully decremented away: aggregate first() of each partition's
    # constant n_part keyed by a synthetic partition id — cheap because
    # the sketch output is already tiny (≤ k rows per partition).
    with_pid = per_part.withColumn("_pid", F.spark_partition_id())
    totals = with_pid.groupBy("_pid").agg(F.first("n_part").alias("np"))
    n_total = totals.agg(F.sum("np").alias("n_total"))
    merged = with_pid.groupBy("item").agg(F.sum("est").alias("est"))
    return (
        merged.crossJoin(F.broadcast(n_total))
        .select(
            "item",
            "est",
            F.col("est").alias("lo"),
            (F.col("est") + (F.col("n_total") / (k + 1)).cast("long")).alias("hi"),
            "n_total",
        )
    )
