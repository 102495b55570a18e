"""Sparse keyword retrieval: inverted index + BM25 ranking.

The lexical complement to the dense-vector ANN stack (similarity.py):
an LLM-data pipeline needs BOTH — embedding search for semantic
near-dup/retrieval, keyword search for targeted corpus slicing
("every doc mentioning these API names"), quality forensics, and the
sparse half of hybrid retrieval. The reference engine has no retrieval
surface at all; this is an absent→added capability expressed entirely
in DataFrame ops (no UDFs).

Scale posture (100 TB corpus):
- the index build is ONE explode + ONE (term, doc) groupBy — linear
  work, one shuffle keyed by (term, doc_id); the optional min_df prune
  adds one term-keyed window pass over the already-aggregated postings
  (postings ≪ token stream: one row per distinct term per doc);
- persist the postings frame partitioned/bucketed BY TERM and queries
  become partition-pruned point lookups — the filter
  ``term IN (...)`` reaches the parquet scan (PushedFilters), so a
  query reads only its terms' buckets, never the corpus;
- query-time cost after the scan is proportional to the candidate
  postings of the query terms, not the corpus: df/idf come from a
  window over the filtered (tiny) postings, the doc-length join is an
  equi-join Catalyst is free to broadcast when doc_stats is a dim, and
  top-k compiles to TakeOrderedAndProject (no global sort).

Tokenization matches the engine-wide convention (text.py): lowercase,
explicit ``[ \\t\\n\\r]+`` whitespace class (Java-vs-RE2-proof), empty
tokens dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """One corpus scan -> (postings, doc_stats).

    postings: (term, doc_id, tf) — one row per distinct term per doc,
    pruned to terms appearing in >= min_df docs (stopword-free indexes
    set min_df high; default keeps everything).
    doc_stats: (doc_id, doc_len) — token counts for BM25 normalization.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r]+", " "),
            " ",
        ).alias("_toks"),
    )
    doc_stats = toks.select(
        "doc_id",
        F.size(F.filter("_toks", lambda t: t != F.lit(""))).alias("doc_len"),
    )
    postings = (
        toks.select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if min_df > 1:
        w = Window.partitionBy("term")
        postings = (
            postings.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") >= min_df)
            .drop("_df")
        )
    return postings, doc_stats


def bm25_topk(
    postings: DataFrame,
    doc_stats: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    mode: str = "any",
) -> DataFrame:
    """BM25-ranked top-k docs for a bag of query terms.

    mode='any' ranks every doc matching >= 1 term (classic OR
    retrieval); mode='all' keeps only docs containing every query term
    (AND semantics — posting-list intersection, done as a count filter
    after the per-doc aggregate rather than an N-way join).

    Returns (doc_id, n_matched, score) with the deterministic
    (score desc, doc_id) order inside the limit. idf is the standard
    smoothed BM25 form ln(1 + (N - df + .5)/(df + .5)), always
    positive.
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if mode not in ("any", "all"):
        raise ValueError(f"bm25_topk: unknown mode {mode!r}")
    # tiny global scalars: corpus size + average doc length, broadcast
    glob = doc_stats.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg("doc_len").alias("_avgdl"),
    )
    p = postings.filter(F.col("term").isin(*query_terms))
    # df over the filtered postings (identical to corpus-wide df for
    # these terms; the window input is candidate-sized, not corpus-sized)
    p = p.withColumn("_df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    scored = (
        p.join(doc_stats, "doc_id")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
            ),
        )
        .withColumn(
            "_sc",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("doc_len") / F.col("_avgdl"))
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched"), F.sum("_sc").alias("score")
    )
    if mode == "all":
        agg = agg.filter(F.col("n_matched") == len(set(query_terms)))
    return agg.orderBy(F.desc("score"), "doc_id").limit(k)


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    k_rrf: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion across retrieval modalities (Cormack et
    al.: score = Σ_lists 1/(k + rank)) — the standard way to combine
    BM25's sparse ranking with dense ANN results WITHOUT calibrating
    their incomparable score scales; only ranks enter the fusion.

    Each input frame carries (id_col, rank). The fuse is a union + one
    groupBy on the id — candidate-list-sized work (lists are top-k
    already), never corpus-sized. Returns (id_col, rrf_score, n_lists)
    in deterministic (rrf_score desc, id) order inside the limit.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")
    u = None
    for df in ranked:
        part = df.select(F.col(id_col), F.col("rank"))
        u = part if u is None else u.unionByName(part)
    fused = u.groupBy(id_col).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("rank"))).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    return fused.orderBy(F.desc("rrf_score"), id_col).limit(top_k)


def merge_postings(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta postings frame (new/changed docs) into an existing
    index: tf adds per (term, doc_id) — the incremental-maintenance
    primitive that keeps a 100 TB keyword index fresh without rebuilds.
    One shuffle keyed by (term, doc_id); at rest, re-bucket by term on
    write so queries stay partition-pruned. Doc DELETIONS are the
    caller's pre-step: pass the removed docs' postings negated
    (tf * -1) and rows that reach zero are dropped here."""
    return (
        existing.unionByName(delta)
        .groupBy("term", "doc_id")
        .agg(F.sum("tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase (positional) search: (doc_id, n_hits) for every
    document containing the consecutive word sequence ``phrase``,
    counting ALL occurrences including self-overlapping ones.

    The positional-postings shape: tokenize once with positions
    (posexplode), keep only the phrase's terms (the selective filter
    runs BEFORE any shuffle), then chain k-1 equi-joins on
    (doc_id, pos - offset) — each join aligns term_i to one position
    after term_{i-1}. At 100 TB with postings persisted by term, each
    term's positions are a partition-pruned point lookup and the joins
    are candidate-sized, never corpus-sized. Tokenization matches the
    engine-wide convention (lowercase, explicit whitespace class)."""
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("phrase_search: phrase must contain at least one word")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r]+", " "),
                " ",
            )
        ).alias("pos", "term"),
    ).filter(F.col("term").isin(words))
    matched = toks.filter(F.col("term") == words[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    for i, w in enumerate(words[1:], start=1):
        nxt = toks.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - i).alias("p0")
        )
        matched = matched.join(nxt, ["doc_id", "p0"], "inner")
    return matched.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hits"))
