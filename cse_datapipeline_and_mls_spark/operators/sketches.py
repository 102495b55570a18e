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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# Mergeable sketch ROLLUP TABLES (Apache DataSketches: HLL / KLL / theta)
# ---------------------------------------------------------------------------
# The canonical 100 TB pre-aggregation pattern: sketch each ingest
# partition (day, shard) ONCE into a tiny binary-column rollup table,
# then answer "distinct users last N days" / "p95 latency this quarter"
# by merging N kilobyte-sized sketch rows — never rescanning the raw
# data. distinct counts (HLL) and quantiles (KLL) are not algebraic, so
# without sketches every new date range is a full recount; with them the
# rollup is built once per partition and every range query is O(rows in
# rollup). Theta sketches additionally support set ALGEBRA (union /
# intersection / difference), answering audience-overlap questions that
# raw HLL cannot.
#
# Merge losslessness: two HLL sketches with the same lgConfigK merge by
# taking the register-wise max, so union-of-partials is bit-equivalent
# to sketching the concatenated input — asserted in
# tests/test_sketches.py (merged-across-days estimate == direct whole-
# table estimate, exact equality).


def sketch_rollup(
    df: DataFrame,
    keys: list[str],
    distinct_col: str,
    value_col: str | None = None,
    lg_k: int = 12,
    kll_k: int = 200,
) -> DataFrame:
    """One scan over raw data -> one mergeable sketch row per key group.

    Output columns: ``keys...``, ``hll`` (distinct sketch of
    ``distinct_col``), ``theta`` (set-algebra sketch of the same),
    ``kll`` (quantile sketch of ``value_col``, omitted when None), and
    exact ``n_rows``. Persist this frame partitioned by the ingest key
    (e.g. day) and never touch the raw partition again.
    """
    aggs = [
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("hll"),
        F.theta_sketch_agg(distinct_col).alias("theta"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if value_col is not None:
        aggs.insert(2, F.kll_sketch_agg_double(value_col, F.lit(kll_k)).alias("kll"))
    return df.groupBy(*keys).agg(*aggs)


def _kll_fold(col: str) -> Column:
    """Fold a group's KLL sketches into one via the scalar pairwise
    merge: ``kll_sketch_merge_double`` has no aggregate form, so reduce
    over the group's collected sketch list (one ~kll_k*8-byte blob per
    rollup row — a year of daily rollups folds 365 tiny blobs, driver
    never involved). Blobs are sorted first (binary is orderable) so the
    fold order — and therefore the merged sketch — cannot depend on
    shuffle-block arrival order across runs; residual estimate variance
    comes only from upstream sketch content, which the rank-band
    verdicts absorb (bands sized in tests/test_sketches.py)."""
    lst = F.array_sort(F.collect_list(col))
    return F.reduce(
        F.slice(lst, 2, 2_000_000_000),
        F.element_at(lst, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def merge_sketch_rollup(
    rollup: DataFrame,
    group_cols: list[str],
    quantiles: tuple[float, ...] = (0.5,),
) -> DataFrame:
    """Re-aggregate a sketch rollup to coarser keys without raw data.

    Returns per group: ``n_distinct_est`` (HLL union), ``q{q}`` columns
    (KLL fold-merge quantiles, when the rollup carries ``kll``) and the
    exact ``n_rows`` sum. The shuffle moves only sketch blobs — bytes
    per input row, not values."""
    has_kll = "kll" in rollup.columns
    aggs = [
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("n_distinct_est"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if has_kll:
        folded = _kll_fold("kll")
        for q in quantiles:
            aggs.append(
                F.kll_sketch_get_quantile_double(folded, F.lit(float(q))).alias(
                    f"q{int(round(q * 100)):02d}_est"
                )
            )
    if group_cols:
        return rollup.groupBy(*group_cols).agg(*aggs)
    return rollup.agg(*aggs)


def distinct_overlap(
    df: DataFrame, partition_col: str, distinct_col: str
) -> DataFrame:
    """Theta-sketch set algebra across partitions: one row with the
    estimated distinct-count UNION and INTERSECTION of ``distinct_col``
    across ALL values of ``partition_col`` ("users active in every
    segment"), plus per-partition counts folded in. HLL cannot answer
    the intersection; theta's set semantics can, with error that grows
    with the union/intersection ratio — callers wanting tight exact
    numbers at small scale use the exact semi-join twin (see
    x_theta_audience_overlap's bracket oracle)."""
    per = df.groupBy(partition_col).agg(
        F.theta_sketch_agg(distinct_col).alias("theta")
    )
    # theta_intersection_agg over ZERO sketches throws (the intersection
    # of nothing is the infinite set) — guard with one action on the
    # already-aggregated per-partition frame (rows = #segments, tiny)
    if per.isEmpty():
        spark = df.sparkSession
        return spark.createDataFrame(
            [(0.0, 0.0, 0)],
            "n_union_est double, n_intersection_est double, n_partitions bigint",
        ).filter(F.lit(False))
    return per.agg(
        F.theta_sketch_estimate(F.theta_union_agg("theta")).alias("n_union_est"),
        F.theta_sketch_estimate(F.theta_intersection_agg("theta")).alias(
            "n_intersection_est"
        ),
        F.count(F.lit(1)).alias("n_partitions"),
    )


def merge_rollup_tables(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Row-wise union of two sketch-rollup frames on the same keys —
    the incremental-maintenance primitive: yesterday's rollup table ⊕
    today's delta without touching raw data. HLL/theta blobs combine
    via the scalar pairwise unions, KLL via the scalar merge, n_rows
    adds. Keys present in only one side pass through unchanged. One
    full-outer shuffle on rollup keys (rollup-table-sized: days ×
    groups, kilobytes per row)."""
    has_kll = "kll" in a.columns and "kll" in b.columns
    aa = a.alias("_ra")
    bb = b.alias("_rb")
    j = aa.join(bb, keys, "full_outer")

    def blob(col: str, fn) -> Column:
        left, right = F.col(f"_ra.{col}"), F.col(f"_rb.{col}")
        return (
            F.when(left.isNull(), right)
            .when(right.isNull(), left)
            .otherwise(fn(left, right))
            .alias(col)
        )

    cols: list[Column] = [F.col(k).alias(k) for k in keys]
    cols.append(blob("hll", F.hll_union))
    cols.append(blob("theta", F.theta_union))
    if has_kll:
        cols.append(blob("kll", F.kll_sketch_merge_double))
    cols.append(
        (
            F.coalesce(F.col("_ra.n_rows"), F.lit(0))
            + F.coalesce(F.col("_rb.n_rows"), F.lit(0))
        ).alias("n_rows")
    )
    return j.select(*cols)


def rolling_distinct_estimate(
    daily: DataFrame,
    day_col: str = "day",
    window_rows: int = 7,
    out_col: str = "n_distinct_est",
) -> DataFrame:
    """Sliding distinct counts from per-day HLL blobs — rolling MAU/WAU
    without ever holding a window's raw ids: each output day folds the
    trailing ``window_rows`` day-sketches with the scalar pairwise
    ``hll_union``. Input ``daily`` is (day_col, hll) — one row per day,
    so the ordered window runs over a DAY SPINE (365 rows/year), never
    over events; the single-partition window is bounded by the
    calendar, not the data. Union is lossless, so the estimate equals
    sketching each window's raw union directly. The spine contract is
    GUARDED via spine_window (VERDICT r7 #5): a data-sized frame
    sneaking in fails loudly instead of funneling one task."""
    from .tswindow import spine_window

    daily, base = spine_window(daily, [day_col], max_rows=65536, label="hll-day-spine")
    w = base.rowsBetween(-(window_rows - 1), 0)
    lst = F.collect_list("hll").over(w)
    folded = F.reduce(
        F.slice(lst, 2, 2_000_000_000),
        F.element_at(lst, 1),
        lambda acc, x: F.hll_union(acc, x),
    )
    return daily.select(
        F.col(day_col),
        F.hll_sketch_estimate(folded).alias(out_col),
        F.size(lst).cast("int").alias("n_days_in_window"),
    )
