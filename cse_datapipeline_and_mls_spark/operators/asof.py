"""As-of (temporal alignment) join — SURVEY §2.3 J4.

The reference joins quarterly financials to every daily price row with a
plain equi-join, ignoring validity windows (reference
ml-algorithms/regression.py:130 — a deliberate simplification). The
evident intent is an as-of join: each fact row picks the most recent
dimension row at or before its timestamp.

Spark has no native as-of join. Two compositions are provided:

* ``asof_join`` (default): union the two keyed timelines, sort within
  key, forward-fill the dimension attributes, keep fact rows. ONE shuffle
  on the key — same cost class as the window features, no range
  explosion. This is the 100 TB path: state per key is one dimension row
  (the running last), never a buffered range.
* ``asof_join_pandas``: per-key ``applyInPandas`` + ``pd.merge_asof`` —
  the escape hatch for semantics the union trick can't express
  (tolerance windows, backward/forward/nearest directions beyond
  'backward').
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    dim_time: str,
    dim_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join: for each fact row, the latest dim row with
    ``dim_time <= fact_time`` on the same key.

    Implementation: tag and union both sides on a common (key, time)
    axis; within each key order by (time, side) with dim rows sorting
    BEFORE fact rows at equal timestamps (ties resolve to 'at or
    before'); forward-fill dim attributes; keep fact rows.
    """
    fact_cols = fact.columns
    # All dim attributes ride in ONE struct filled as a unit: filling
    # each column independently with last(ignorenulls) would pull a
    # NULL attribute from an EARLIER dim row, stitching the output from
    # two different dim rows (ADVICE r5) — an ASOF join must return the
    # matched row's NULL. The struct itself is never null on a dim row
    # (even if every field is), so the fill carries whole rows.
    dim_fields = {f.name: f for f in dim.schema.fields}
    struct_t = T.StructType([dim_fields[c] for c in dim_cols])
    f_tagged = (
        fact.withColumn("_t", F.col(fact_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_dimrow", F.lit(None).cast(struct_t))
    )
    d_tagged = dim.select(
        F.col(on),
        F.col(dim_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in dim_cols]).alias("_dimrow"),
    )
    for c in fact_cols:
        if c not in (on,):
            d_tagged = d_tagged.withColumn(c, F.lit(None).cast(dict(f_tagged.dtypes)[c]))
    cols = [on, "_t", "_side", *[c for c in fact_cols if c != on], "_dimrow"]
    unioned = f_tagged.select(*cols).unionByName(d_tagged.select(*cols))
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "_dimrow", F.last("_dimrow", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    for c in dim_cols:
        out = out.withColumn(c, F.col("_dimrow").getField(c))
    return out.drop("_t", "_side", "_dimrow")


def asof_join_forward(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    dim_time: str,
    dim_cols: Sequence[str],
) -> DataFrame:
    """Forward as-of join: for each fact row, the EARLIEST dim row with
    ``dim_time >= fact_time`` on the same key — "the next quote after
    the trade", the mirror of the backward default.

    Same union-and-fill shape (one shuffle on the key): within each key
    order by (time, side) with dim rows sorting AFTER fact rows at
    equal timestamps (ties resolve to 'at or after'), then BACK-fill
    dim attributes with first_value over [current row, ∞). Fact rows
    past the last dim row get nulls, exactly like DuckDB's
    ``ASOF JOIN ... ON f.t <= d.t`` (the oracle in
    j_asof_forward_events)."""
    fact_cols = fact.columns
    # Single-struct back-fill for the same reason as asof_join: all dim
    # attributes must come from the SAME matched (earliest at-or-after)
    # dim row, including its NULLs.
    dim_fields = {f.name: f for f in dim.schema.fields}
    struct_t = T.StructType([dim_fields[c] for c in dim_cols])
    f_tagged = (
        fact.withColumn("_t", F.col(fact_time))
        .withColumn("_side", F.lit(0))
        .withColumn("_dimrow", F.lit(None).cast(struct_t))
    )
    d_tagged = dim.select(
        F.col(on),
        F.col(dim_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in dim_cols]).alias("_dimrow"),
    )
    for c in fact_cols:
        if c not in (on,):
            d_tagged = d_tagged.withColumn(c, F.lit(None).cast(dict(f_tagged.dtypes)[c]))
    cols = [on, "_t", "_side", *[c for c in fact_cols if c != on], "_dimrow"]
    unioned = f_tagged.select(*cols).unionByName(d_tagged.select(*cols))
    # first(ignorenulls) over [current, +∞) as a RUNNING last() over the
    # fully REVERSED sort: Spark's unbounded-FOLLOWING frame recomputes
    # from scratch per row (O(n²) per partition), while the unbounded-
    # PRECEDING frame accumulates incrementally — and reversing BOTH
    # sort keys preserves the tie discipline (dim rows at the same _t
    # are still visible to fact rows, exactly the at-or-after
    # contract). Same single hash exchange.
    w = (
        Window.partitionBy(on)
        .orderBy(F.desc("_t"), F.desc("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn(
        "_dimrow", F.last("_dimrow", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 0)
    for c in dim_cols:
        out = out.withColumn(c, F.col("_dimrow").getField(c))
    return out.drop("_t", "_side", "_dimrow")


def asof_join_nearest(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    dim_time: str,
    dim_cols: Sequence[str],
) -> DataFrame:
    """Nearest as-of join: for each fact row, the dim row with minimal
    |dim_time − fact_time| on the same key; ties (equidistant before/
    after) resolve to the EARLIER dim row — pandas ``merge_asof
    (direction='nearest')`` semantics.

    One union + ONE shuffle on the key, like the directional variants:
    with dim rows ordered before fact rows at equal timestamps, the
    backward candidate is ``last(ignorenulls)`` over (-∞, 0] and the
    forward candidate ``first(ignorenulls)`` over [0, ∞) — both frames
    share the single window sort. The matched dim timestamp rides
    inside the candidate struct, so the distance compare uses exact
    integer microseconds (or the raw numeric for numeric time axes),
    and the whole matched row is chosen as a unit (no cross-row
    attribute stitching). A dim row AT the fact timestamp is the
    backward candidate at distance 0 and always wins, so the one shared
    sort order loses nothing.

    Precondition (shared with every as-of variant): dim rows are unique
    per (key, time) — duplicate timestamps make the matched row, and
    therefore 'nearest', ill-defined. Aggregate the dim to the key+time
    grain first (as the registered queries do)."""
    fact_cols = fact.columns
    dim_fields = {f.name: f for f in dim.schema.fields}
    time_t = dim_fields[dim_time].dataType
    struct_t = T.StructType(
        [T.StructField("_dt", time_t)] + [dim_fields[c] for c in dim_cols]
    )
    is_ts = isinstance(time_t, T.TimestampType)
    is_date = isinstance(time_t, T.DateType)
    if not (
        is_ts
        or is_date
        or isinstance(time_t, (T.NumericType, T.TimestampNTZType))
    ):
        # A silently un-castable axis (string, struct, ...) would make
        # every distance NULL and the when-chain fall through to the
        # forward candidate — fail loudly instead.
        raise ValueError(
            f"asof_join_nearest: unsupported time-axis type {time_t.simpleString()}; "
            "use timestamp, date, or a numeric column"
        )

    def _num(c):
        if is_ts:
            return F.unix_micros(c)
        if isinstance(time_t, T.TimestampNTZType):
            return F.unix_micros(c.cast("timestamp"))
        if is_date:
            return F.unix_date(c)
        return c.cast("double")

    f_tagged = (
        fact.withColumn("_t", F.col(fact_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_dimrow", F.lit(None).cast(struct_t))
    )
    d_tagged = dim.select(
        F.col(on),
        F.col(dim_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(dim_time).alias("_dt"), *[F.col(c) for c in dim_cols]
        ).alias("_dimrow"),
    )
    for c in fact_cols:
        if c not in (on,):
            d_tagged = d_tagged.withColumn(c, F.lit(None).cast(dict(f_tagged.dtypes)[c]))
    cols = [on, "_t", "_side", *[c for c in fact_cols if c != on], "_dimrow"]
    unioned = f_tagged.select(*cols).unionByName(d_tagged.select(*cols))
    w = Window.partitionBy(on).orderBy("_t", "_side")
    back = F.last("_dimrow", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    # reversed running frame instead of first() over [current, +∞) —
    # the same O(n²)-per-partition fix as asof_join_forward; flipping
    # both sort keys keeps the tie discipline (a dim row at the fact's
    # exact _t stays on the BACKWARD side only, since in descending
    # order the fact (_side=1) precedes the dim (_side=0) at equal _t)
    w_desc = Window.partitionBy(on).orderBy(F.desc("_t"), F.desc("_side"))
    fwd = F.last("_dimrow", ignorenulls=True).over(
        w_desc.rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        unioned.withColumn("_b", back)
        .withColumn("_f", fwd)
        .filter(F.col("_side") == 1)
    )
    bd = _num(F.col("_t")) - _num(F.col("_b._dt"))
    fd = _num(F.col("_f._dt")) - _num(F.col("_t"))
    chosen = (
        F.when(F.col("_f").isNull(), F.col("_b"))
        .when(F.col("_b").isNull(), F.col("_f"))
        .when(bd <= fd, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    out = out.withColumn("_n", chosen)
    for c in dim_cols:
        out = out.withColumn(c, F.col("_n").getField(c))
    return out.drop("_t", "_side", "_b", "_f", "_n")


def asof_join_pandas(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    fact_time: str,
    dim_time: str,
    dim_cols: Sequence[str],
    tolerance=None,
    direction: str = "backward",
) -> DataFrame:
    """Per-key ``pd.merge_asof`` via cogrouped applyInPandas — the
    escape hatch exposing pandas' full surface (``direction`` in
    backward/forward/nearest × ``tolerance``) in one place; the native
    single-shuffle compositions above cover each direction without
    Python. Arrow-batched; shuffles both sides once on the key.
    Cross-implementation parity (pandas vs native, all three
    directions) is asserted in tests/test_asof.py."""
    import pandas as pd

    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join_pandas: unknown direction {direction!r}")
    dim_types = {f.name: f.dataType for f in dim.schema.fields}
    fields = list(fact.schema.fields) + [T.StructField(c, dim_types[c]) for c in dim_cols]
    schema = T.StructType(fields)
    names = [f.name for f in fields]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=names)
        left = left.sort_values(fact_time)
        right = right.sort_values(dim_time)[[dim_time, *dim_cols]]
        merged = pd.merge_asof(
            left,
            right,
            left_on=fact_time,
            right_on=dim_time,
            direction=direction,
            tolerance=tolerance,
        )
        return merged[names]

    return fact.groupBy(on).cogroup(dim.groupBy(on)).applyInPandas(
        lambda left, right: merge(left, right), schema
    )
