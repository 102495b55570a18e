"""Empty-input hardening: every operator family must accept an empty
(0-row) frame and return an empty result with the right schema — the
degenerate case every 100 TB pipeline hits (empty partition, empty
micro-batch, filter that drops everything)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, source string")


def test_text_ops_on_empty_corpus(spark, empty_docs):
    from cse_datapipeline_and_mls_spark.operators import text as X

    assert X.pack_sequences(empty_docs, "text", "doc_id", "source").count() == 0
    spans = X.duplicate_spans(empty_docs, "text", "doc_id", k=8)
    assert spans.count() == 0
    assert spans.columns == ["doc_id", "span_id", "span_start", "span_end", "span_words"]


def test_dedup_and_similarity_on_empty(spark, empty_docs):
    from cse_datapipeline_and_mls_spark.operators import dedup as D
    from cse_datapipeline_and_mls_spark.operators import similarity as S

    assert D.exact_dedup_by_content(empty_docs).count() == 0
    assert D.ngram_jaccard_pairs(empty_docs, "text", "doc_id").count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.embedding_neardup_pairs(empty_emb, "vec_id", "embedding").count() == 0
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert D.connected_components(empty_pairs).count() == 0


def test_expectations_on_empty_table_pass_with_zero_violations(spark):
    from cse_datapipeline_and_mls_spark.operators.expectations import (
        Check,
        validate_expectations,
    )

    df = spark.createDataFrame([], "pk long, flag string")
    parent = spark.createDataFrame([], "k long")
    out = validate_expectations(
        df,
        [
            Check("flag_not_null", "not_null", col="flag"),
            Check("flag_in_set", "in_set", col="flag", values=("A",)),
            Check("pk_unique", "unique", cols=("pk",)),
            Check("pk_in_parent", "subset", col="pk"),
        ],
        parents={"pk_in_parent": (parent, "k")},
    ).collect()
    assert len(out) == 4
    assert all(r["n_violations"] == 0 and r["passed"] for r in out)


def test_graph_and_windows_on_empty(spark):
    from cse_datapipeline_and_mls_spark.operators.graph import pagerank
    from cse_datapipeline_and_mls_spark.operators import relational as R

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty_edges).count() == 0
    empty = spark.createDataFrame([], "k string, v double")
    assert R.group_count(empty, ["k"]).count() == 0
    a = empty.select(F.col("k").alias("name_a"))
    b = empty.select(F.col("k").alias("name_b"))
    assert R.fuzzy_join_blocked(a, b, "name_a", "name_b").count() == 0


def test_round4_operators_on_empty(spark, empty_docs):
    """Round-4 additions accept 0-row frames: span removal, incremental
    dedup (both sides), PQ encode/search, robust outlier stats, prefix
    fuzzy mode."""
    from cse_datapipeline_and_mls_spark.operators import relational as R
    from cse_datapipeline_and_mls_spark.operators import similarity as S
    from cse_datapipeline_and_mls_spark.operators import text as X
    from cse_datapipeline_and_mls_spark.operators.dedup import exact_dedup_incremental

    removed = X.remove_duplicate_spans(empty_docs, "text", "doc_id")
    assert removed.count() == 0
    assert removed.columns == ["doc_id", "clean_text", "n_words", "n_removed_words"]

    some = spark.createDataFrame([(1, "a b c", "s")], "doc_id long, text string, source string")
    assert exact_dedup_incremental(empty_docs, some).count() == 0
    assert exact_dedup_incremental(some, empty_docs).count() == 1

    books = [[[0.0, 0.0], [1.0, 1.0]]] * 2  # 2 subspaces, dim 4
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.pq_encode(empty_emb, books).count() == 0
    queries = spark.createDataFrame([(0, [1.0, 0.0, 1.0, 0.0])], "query_id long, embedding array<double>")
    assert S.pq_topk(empty_emb, queries, books, k=3).count() == 0

    empty_kv = spark.createDataFrame([], "k string, v double")
    assert R.robust_outlier_stats(empty_kv, "v", ["k"]).count() == 0

    a = empty_kv.select(F.col("k").alias("name_a"))
    b = empty_kv.select(F.col("k").alias("name_b"))
    assert R.fuzzy_join_blocked(a, b, "name_a", "name_b", method="prefix").count() == 0
