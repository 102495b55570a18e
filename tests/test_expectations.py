"""Deequ-style expectations operator: fused row-level checks, unique,
and referential — violation counting pinned on hand-built data."""

from __future__ import annotations

from cse_datapipeline_and_mls_spark.operators.expectations import (
    Check,
    validate_expectations,
)


def test_validate_expectations_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 0.05, 10.0),
            (1, "A", 0.05, 10.0),   # duplicate pk -> 1 unique violation
            (2, None, 0.2, -5.0),   # null flag, range high, negative price
            (3, "X", None, 0.0),    # bad flag, null range col
            (9, "N", 0.0, 1.0),     # pk 9 not in parent -> subset violation
        ],
        "pk long, flag string, disc double, price double",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    checks = [
        Check("flag_not_null", "not_null", col="flag"),
        Check("flag_in_set", "in_set", col="flag", values=("A", "N", "R")),
        Check("disc_range", "range", col="disc", lo=0.0, hi=0.1),
        Check("price_nonneg", "expr", sql="price >= 0"),
        Check("pk_unique", "unique", cols=("pk",)),
        Check("pk_in_parent", "subset", col="pk"),
    ]
    out = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in validate_expectations(
            df, checks, parents={"pk_in_parent": (parent, "k")}
        ).collect()
    }
    assert out["flag_not_null"] == (1, False)
    assert out["flag_in_set"] == (2, False)      # null + 'X'
    assert out["disc_range"] == (2, False)       # 0.2 + null
    assert out["price_nonneg"] == (1, False)
    assert out["pk_unique"] == (1, False)        # one extra copy of pk=1
    assert out["pk_in_parent"] == (1, False)     # pk=9 orphan row


def test_validate_expectations_all_green(spark):
    df = spark.createDataFrame([(1, "A"), (2, "N")], "pk long, flag string")
    checks = [
        Check("flag_not_null", "not_null", col="flag"),
        Check("pk_unique", "unique", cols=("pk",)),
    ]
    out = validate_expectations(df, checks).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)
    assert {r["check_name"] for r in out} == {"flag_not_null", "pk_unique"}

def test_validate_expectations_hostile_names_empty_and_dups(spark):
    """ADVICE r3: check names are data, not SQL — quotes/spaces/commas
    must flow through; an empty suite returns an empty typed frame; a
    duplicate name raises instead of silently colliding."""
    import pytest

    df = spark.createDataFrame([(1, "A")], "pk long, flag string")
    hostile = """it's a "check", with, commas -- ; DROP"""
    out = validate_expectations(
        df, [Check(hostile, "not_null", col="flag")]
    ).collect()
    assert len(out) == 1 and out[0]["check_name"] == hostile
    assert out[0]["passed"] and out[0]["n_violations"] == 0

    empty = validate_expectations(df, [])
    assert empty.count() == 0
    assert empty.columns == ["check_name", "kind", "n_violations", "passed"]

    with pytest.raises(ValueError, match="duplicate check name"):
        validate_expectations(
            df,
            [Check("same", "not_null", col="flag"),
             Check("same", "unique", cols=("pk",))],
        )
