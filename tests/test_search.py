"""Inverted index + BM25: exact postings, formula parity, AND/OR modes."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
)

CORPUS = [
    (1, "spark shuffle join join"),
    (2, "spark scan"),
    (3, "join filter  filter\tscan"),
    (4, ""),
]


def _index(spark, min_df=1):
    docs = spark.createDataFrame(CORPUS, "doc_id bigint, text string")
    return build_inverted_index(docs, min_df=min_df)


def test_postings_exact(spark):
    postings, doc_stats = _index(spark)
    got = {(r["term"], r["doc_id"]): r["tf"] for r in postings.collect()}
    assert got == {
        ("spark", 1): 1,
        ("shuffle", 1): 1,
        ("join", 1): 2,
        ("spark", 2): 1,
        ("scan", 2): 1,
        ("join", 3): 1,
        ("filter", 3): 2,
        ("scan", 3): 1,
    }
    lens = {r["doc_id"]: r["doc_len"] for r in doc_stats.collect()}
    assert lens == {1: 4, 2: 2, 3: 4, 4: 0}


def test_min_df_prunes_rare_terms(spark):
    postings, _ = _index(spark, min_df=2)
    terms = {r["term"] for r in postings.select("term").distinct().collect()}
    # shuffle/filter appear in only one doc each
    assert terms == {"spark", "join", "scan"}


def test_bm25_score_matches_closed_form(spark):
    """Engine score for a single-term query equals the hand-computed
    BM25 formula (N=4 docs, avgdl=2.5)."""
    postings, doc_stats = _index(spark)
    rows = {r["doc_id"]: r for r in bm25_topk(postings, doc_stats, ["join"], k=10).collect()}
    n_docs, avgdl, k1, b = 4.0, 2.5, 1.2, 0.75
    df = 2  # docs 1 and 3
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert rows[1]["score"] == pytest.approx(score(2, 4), rel=1e-12)
    assert rows[3]["score"] == pytest.approx(score(1, 4), rel=1e-12)
    assert set(rows) == {1, 3}
    # higher tf at equal length ranks first
    assert rows[1]["score"] > rows[3]["score"]


def test_bm25_and_vs_or_mode(spark):
    postings, doc_stats = _index(spark)
    any_ids = {r["doc_id"] for r in bm25_topk(postings, doc_stats, ["spark", "scan"], k=10).collect()}
    all_ids = {r["doc_id"] for r in bm25_topk(postings, doc_stats, ["spark", "scan"], k=10, mode="all").collect()}
    assert any_ids == {1, 2, 3}
    assert all_ids == {2}


def test_bm25_topk_is_take_ordered(spark):
    postings, doc_stats = _index(spark)
    plan = bm25_topk(postings, doc_stats, ["join"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_rejects_bad_args(spark):
    postings, doc_stats = _index(spark)
    with pytest.raises(ValueError):
        bm25_topk(postings, doc_stats, [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(postings, doc_stats, ["x"], mode="nope")


def test_rrf_fuse_hand_computed(spark):
    from cse_datapipeline_and_mls_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id bigint, rank int")
    b = spark.createDataFrame([(2, 1), (4, 2)], "doc_id bigint, rank int")
    got = {r["doc_id"]: r for r in rrf_fuse([a, b], top_k=10).collect()}
    assert got[2]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61, rel=1e-12)
    assert got[2]["n_lists"] == 2
    assert got[1]["rrf_score"] == pytest.approx(1 / 61, rel=1e-12)
    # doc in both lists outranks any single-list doc here
    best = max(got.values(), key=lambda r: r["rrf_score"])
    assert best["doc_id"] == 2


def test_rrf_fuse_rejects_empty(spark):
    from cse_datapipeline_and_mls_spark.operators.search import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_persisted_postings_partition_prune(spark, tmp_path):
    """The at-rest contract from the module docstring: postings written
    partitioned BY TERM answer `term IN (...)` by reading only those
    terms' directories — the scan's partition filters carry the IN
    list, and only matching files are touched."""
    import glob

    postings, _ = _index(spark)
    idx = str(tmp_path / "postings")
    postings.write.partitionBy("term").parquet(idx)
    q = spark.read.parquet(idx).filter(F.col("term").isin("spark", "join"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term" in plan
    got = {(r["term"], r["doc_id"]) for r in q.collect()}
    assert got == {("spark", 1), ("spark", 2), ("join", 1), ("join", 3)}
    # directories exist per term; the pruned read touches only 2 of them
    assert len(glob.glob(f"{idx}/term=*")) == 5


def test_phrase_search_counts_all_occurrences_including_overlaps(spark):
    from cse_datapipeline_and_mls_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),        # two hits of "a b c"
            (2, "a a a a"),            # self-overlapping "a a": 3 hits
            (3, "a b x c"),            # no hit
            (4, "A  B\tC"),            # case/whitespace normalization
        ],
        "doc_id long, text string",
    )
    abc = {r["doc_id"]: r["n_hits"] for r in phrase_search(docs, "a b c").collect()}
    assert abc == {1: 2, 4: 1}
    aa = {r["doc_id"]: r["n_hits"] for r in phrase_search(docs, "a a").collect()}
    assert aa == {2: 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(docs, "   ")
