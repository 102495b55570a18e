"""Serving-edge helpers (SURVEY §2.1 K3): DataFrame → JSON records.

The reference hands query results to its Flask/JS edge as
``records``-oriented JSON with NaN scrubbed to 0 (reference
data-pipeline/main-pipeline/spark_stream.py:149-156,
ml-algorithms/ml_impl.py:194-206 — ``df.fillna(0).to_json(orient=
'records')``). JSON has no NaN/Infinity literal, so unscrubbed floats
produce invalid documents; these helpers make the scrub policy explicit
and keep serialization distributed (one JSON string per row via the JVM
``to_json`` expression — the driver only collects at the very edge, and
only as many rows as the endpoint pages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLOAT_TYPES = ("double", "float")


def scrub_non_finite(df: DataFrame, policy: str = "zero") -> DataFrame:
    """Replace NaN/±Inf (and, under ``zero``, SQL NULL) in every float
    column.

    * ``zero``  — NaN/±Inf/NULL → 0.0 (the reference's fillna(0) serving
      behavior).
    * ``null``  — NaN/±Inf → NULL (JSON-safe while preserving missingness;
      ``to_json`` then omits the key).
    """
    if policy not in ("zero", "null"):
        raise ValueError(f"unknown NaN policy {policy!r}; use 'zero' or 'null'")
    fill = F.lit(0.0) if policy == "zero" else F.lit(None).cast("double")
    for name, dtype in df.dtypes:
        if dtype not in _FLOAT_TYPES:
            continue
        c = F.col(name)
        finite = ~(F.isnan(c) | (F.abs(c) == F.lit(float("inf"))))
        scrubbed = F.when(c.isNotNull() & finite, c).otherwise(
            fill if policy == "zero" else F.when(c.isNull(), c).otherwise(fill)
        )
        df = df.withColumn(name, scrubbed.cast(dtype))
    return df


def to_json_records(df: DataFrame, nan_policy: str = "zero", out: str = "json") -> DataFrame:
    """K3: one valid-JSON object string per row, NaN policy applied first.

    Row-level ``to_json(struct(*))`` stays in the JVM (no Python in the
    path) and needs no shuffle; the result is a one-column DataFrame the
    serving edge can limit/collect. Equivalent of the reference's
    ``to_json(orient='records')`` minus the driver-side pandas hop.
    """
    scrubbed = scrub_non_finite(df, policy=nan_policy)
    return scrubbed.select(F.to_json(F.struct(*scrubbed.columns)).alias(out))
