"""K3 serving-edge tests: NaN/Inf/null scrub + records JSON validity
(reference spark_stream.py:149-156 parity)."""

from __future__ import annotations

import json
import math

import pytest
from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.serving import scrub_non_finite, to_json_records


def _messy(spark):
    return spark.createDataFrame(
        [
            (1, 1.5, "ok"),
            (2, float("nan"), "nan"),
            (3, float("inf"), "inf"),
            (4, float("-inf"), "-inf"),
            (5, None, "null"),
        ],
        "id long, x double, tag string",
    )


def test_scrub_zero_policy(spark):
    out = {r["id"]: r["x"] for r in scrub_non_finite(_messy(spark), "zero").collect()}
    assert out == {1: 1.5, 2: 0.0, 3: 0.0, 4: 0.0, 5: 0.0}


def test_scrub_null_policy_preserves_missingness(spark):
    out = {r["id"]: r["x"] for r in scrub_non_finite(_messy(spark), "null").collect()}
    assert out[1] == 1.5
    assert out[2] is None and out[3] is None and out[4] is None
    assert out[5] is None  # was already null, stays null


def test_scrub_rejects_unknown_policy(spark):
    with pytest.raises(ValueError, match="policy"):
        scrub_non_finite(_messy(spark), "keep")


def test_to_json_records_every_row_is_valid_json(spark):
    rows = [r["json"] for r in to_json_records(_messy(spark), "zero").collect()]
    assert len(rows) == 5
    parsed = [json.loads(s) for s in rows]  # raises on NaN/Infinity literals
    by_id = {p["id"]: p for p in parsed}
    assert by_id[2]["x"] == 0.0 and by_id[3]["x"] == 0.0
    assert by_id[1] == {"id": 1, "x": 1.5, "tag": "ok"}
    assert all(math.isfinite(p["x"]) for p in parsed)


def test_to_json_records_null_policy_omits_missing_keys(spark):
    rows = [json.loads(r["json"]) for r in to_json_records(_messy(spark), "null").collect()]
    by_tag = {p["tag"]: p for p in rows}
    # Spark's to_json drops null fields -> "x" absent, never NaN
    assert "x" not in by_tag["nan"] and "x" not in by_tag["null"]
    assert by_tag["ok"]["x"] == 1.5


def test_non_float_columns_untouched(spark):
    df = _messy(spark).withColumn("n", F.col("id") * 2)
    out = {r["id"]: r["n"] for r in scrub_non_finite(df, "zero").collect()}
    assert out == {1: 2, 2: 4, 3: 6, 4: 8, 5: 10}
