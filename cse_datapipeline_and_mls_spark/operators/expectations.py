"""Declarative data-quality expectations (Deequ-style constraint
validation, public pattern from the AWS Deequ / Great Expectations
literature) — the missing piece between "the pipeline ran" and "the
output is trustworthy" at 100 TB.

Design: a check suite compiles into as FEW plans as the constraint mix
allows —

* every ROW-LEVEL check (not_null, in_set, range, arbitrary boolean
  SQL) becomes one conditional-sum aggregate, so N row-level checks
  over a 100 TB table cost exactly ONE scan with map-side partials and
  a 1-row shuffle;
* each UNIQUE check is one groupBy on its key set (the unavoidable
  shuffle), counting keys seen more than once;
* each SUBSET (referential-integrity) check is one left-anti join
  against the parent key set — broadcastable when the parent side is a
  dimension.

Results union into one tidy frame: (check_name, kind, n_violations,
passed) — the shape a CI gate or a freshness dashboard consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation. ``kind`` ∈ {not_null, in_set, range, expr,
    unique, subset}. Row-level kinds use ``col``/``values``/``lo``/
    ``hi``/``sql``; ``unique`` uses ``cols``; ``subset`` uses ``col``
    plus ``parent``/``parent_col`` supplied to validate_expectations."""

    name: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = ()
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    sql: str | None = None
    parent_col: str | None = None


def _row_violation(c: Check) -> F.Column:
    if c.kind == "not_null":
        return F.col(c.col).isNull()
    if c.kind == "in_set":
        return ~F.col(c.col).isin(*c.values) | F.col(c.col).isNull()
    if c.kind == "range":
        v = F.col(c.col)
        return v.isNull() | (v < F.lit(c.lo)) | (v > F.lit(c.hi))
    if c.kind == "expr":
        # the sql names the PASS condition; violation = NOT pass (NULL-safe)
        return ~F.coalesce(F.expr(c.sql), F.lit(False))
    raise ValueError(f"not a row-level check kind: {c.kind}")


def validate_expectations(
    df: DataFrame,
    checks: list[Check],
    parents: dict[str, tuple[DataFrame, str]] | None = None,
) -> DataFrame:
    """Run a check suite; returns (check_name, kind, n_violations,
    passed). ``parents`` maps a subset-check's name to (parent_df,
    parent_col). Row-level checks share one aggregate plan; see module
    docstring for the full cost model."""
    parents = parents or {}
    spark = df.sparkSession

    # Check names are user input that becomes output data — never SQL
    # text (the unpivot below is built from typed literals, so quotes,
    # spaces, or SQL metacharacters in a name are just characters).
    # Duplicates would silently collide in the result frame: reject.
    seen: set[str] = set()
    for c in checks:
        if c.name in seen:
            raise ValueError(f"duplicate check name: {c.name!r}")
        seen.add(c.name)

    results: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind in ("not_null", "in_set", "range", "expr")]
    if row_checks:
        # coalesce: sum over an EMPTY input is NULL, and an empty table
        # (or empty micro-batch in the streaming gate) violates nothing.
        # Aliases are positional (_v0, _v1, ...) so arbitrary check names
        # never reach an identifier position.
        aggs = [
            F.coalesce(F.sum(_row_violation(c).cast("long")), F.lit(0)).alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        # unpivot the 1-row wide frame into tidy rows via a typed
        # struct array — same single-scan plan as stack(), no SQL string
        tidy = one.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c.name).alias("check_name"),
                        F.lit(c.kind).alias("kind"),
                        F.col(f"_v{i}").alias("n_violations"),
                    )
                    for i, c in enumerate(row_checks)
                ])
            ).alias("_r")
        ).select("_r.*")
        results.append(tidy)

    for c in checks:
        if c.kind == "unique":
            dup_keys = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
            )
            results.append(
                dup_keys.agg(
                    F.coalesce(F.sum(F.col("_n") - 1), F.lit(0)).alias("n_violations")
                ).select(
                    F.lit(c.name).alias("check_name"),
                    F.lit(c.kind).alias("kind"),
                    "n_violations",
                )
            )
        elif c.kind == "subset":
            parent_df, parent_col = parents[c.name]
            orphans = df.select(F.col(c.col).alias("_k")).join(
                parent_df.select(F.col(parent_col).alias("_k")).distinct(),
                "_k",
                "left_anti",
            )
            results.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
                    F.lit(c.name).alias("check_name"),
                    F.lit(c.kind).alias("kind"),
                    "n_violations",
                )
            )
        elif c.kind not in ("not_null", "in_set", "range", "expr"):
            raise ValueError(f"unknown check kind: {c.kind}")

    if not results:
        # empty suite -> empty typed frame (only here does the RDD-backed
        # empty relation enter a plan; seeding every union with it cost
        # ~0.3 s per run at sf0.1)
        return spark.createDataFrame(
            [], "check_name string, kind string, n_violations long, passed boolean"
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r.select(
            "check_name", "kind", F.col("n_violations").cast("long").alias("n_violations")
        ))
    return out.select(
        "check_name",
        "kind",
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )
