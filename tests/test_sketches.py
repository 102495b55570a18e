"""Misra–Gries heavy hitters: containment + bracket guarantees vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import sketches as SK
from cse_datapipeline_and_mls_spark.sources import load_table

K = 64


def _token_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ").alias(
            "tokens"
        )
    )


def test_mg_sketch_contains_all_guaranteed_heavy_hitters(spark, sf_dir):
    toks = _token_df(spark, sf_dir)
    sketch = {r["item"]: r for r in SK.frequent_items(toks, "tokens", k=K).collect()}
    exact = {
        r["item"]: r["n"]
        for r in toks.select(F.explode("tokens").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(exact.values())
    threshold = n / (K + 1)
    missed = [t for t, c in exact.items() if c > threshold and t not in sketch]
    assert not missed, f"guaranteed-frequent tokens missing from sketch: {missed[:5]}"
    # every survivor's bracket contains its true count
    for item, row in sketch.items():
        assert row["lo"] <= exact[item] <= row["hi"], (
            item,
            row["lo"],
            exact[item],
            row["hi"],
        )


def test_mg_fold_bounds_memory_and_total_error(spark):
    """Adversarial single-partition stream: sketch size stays ≤ k and the
    undercount obeys n/(k+1) even when most items are unique."""
    from collections import Counter

    k = 8
    stream = (["hot"] * 50) + [f"u{i}" for i in range(100)] + (["warm"] * 20)
    mg: dict = {}
    SK._mg_fold(mg, Counter(stream), k)
    assert len(mg) <= k
    n = len(stream)
    assert mg.get("hot", 0) >= 50 - n / (k + 1)
    assert mg.get("warm", 0) >= 20 - n / (k + 1)
