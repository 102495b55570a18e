"""LLM training-data pipeline queries beyond the X1-X5 north-star set:
PII scrubbing, document chunking, benchmark-contamination screening.

All three are fully oracle-checked: the scrub query deterministically
injects PII-shaped tokens (the synthetic corpus contains none) with the
same SQL-expressible concat on both engines, so every row exercises
every pattern; chunking and containment are pure relational algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import text as X
from ..sources import load_table
from . import register


@register(
    "x_pii_scrub",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             text || ' visit https://ex.com/p/' || doc_id
                  || ' or mail user' || doc_id || '@mail.example.org'
                  || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS raw_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw_text, 'https?://\S+')) AS INT)  AS n_urls,
           CAST(len(regexp_extract_all(raw_text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)    AS n_emails,
           CAST(len(regexp_extract_all(raw_text,
             '\b[0-9]{3}-[0-9]{4}\b')) AS INT)                             AS n_phones,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw_text, 'https?://\S+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')                      AS clean_text
    FROM raw
    """,
)
def x_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass: URLs → <URL>, emails → <EMAIL>, phones → <PHONE>,
    plus per-doc match counts. The synthetic corpus contains no PII, so
    the query INJECTS one of each (deterministically, from doc_id, with
    the identical concat in the oracle) — the hash check then proves
    every pattern fires on every row in both engines. Patterns live in
    operators/text.py and are drawn from the Java-regex ∩ RE2 subset.
    Three chained regexp_replace ops fuse into one codegen projection:
    zero shuffles, one corpus scan at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" visit https://ex.com/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" or mail user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org"),
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("raw_text"),
    )
    return raw.select(
        "doc_id",
        X.match_count("raw_text", X.URL_REGEX).alias("n_urls"),
        X.match_count("raw_text", X.EMAIL_REGEX).alias("n_emails"),
        X.match_count("raw_text", X.PHONE_REGEX).alias("n_phones"),
        X.scrub_text("raw_text").alias("clean_text"),
    )


@register(
    "x_doc_chunks",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, unnest(generate_series(0, CAST(floor((len(w) - 1) / 40) AS INT)))
               AS chunk_idx, w
      FROM words
    )
    SELECT doc_id, chunk_idx,
           array_to_string(list_slice(w, chunk_idx * 40 + 1, chunk_idx * 40 + 50), ' ')
             AS chunk_text,
           CAST(least(50, len(w) - chunk_idx * 40) AS INT) AS n_words_chunk
    FROM chunks
    """,
)
def x_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size word-window chunking (window 50, stride 40 → 10-word
    overlap): the explode that turns documents into trainable units.
    Map-side only — no shuffle; see operators/text.chunk_by_words."""
    docs = load_table(spark, sf_dir, "documents")
    return X.chunk_by_words(docs, "text", "doc_id", window=50, stride=40)


@register(
    "x_sequence_packing",
    oracle="""
    WITH d AS (
      SELECT source AS shard, doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tok
      FROM documents
    ), o AS (
      SELECT shard, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
      FROM d
    ), e AS (
      SELECT shard, doc_id, n_tok, end_off, end_off - n_tok AS off,
             unnest(generate_series(CAST(floor((end_off - n_tok) / 512.0) AS BIGINT),
                                    CAST(floor((end_off - 1) / 512.0) AS BIGINT))) AS seq_id
      FROM o
    )
    SELECT shard, seq_id, doc_id, n_tok,
           greatest(0, seq_id * 512 - off)                              AS frag_start,
           least(n_tok, (seq_id + 1) * 512 - off)
             - greatest(0, seq_id * 512 - off)                          AS frag_len
    FROM e
    """,
)
def x_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-then-cut) at token budget 512:
    per-shard running token offsets, each doc exploded into the training
    sequences it spans. One window shuffle per shard, map-side explode —
    see operators/text.pack_sequences for the 100 TB posture."""
    docs = load_table(spark, sf_dir, "documents")
    return X.pack_sequences(docs, "text", "doc_id", shard_col="source", budget=512)


@register(
    "x_contamination_check",
    oracle="""
    WITH ev AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(w) - 3, 1)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
             )) AS grams
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents WHERE source IN ('src0', 'src1')) t
      WHERE len(w) >= 5
    ), tr AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(w) - 3, 1)),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
             )) AS grams
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
            FROM documents WHERE source NOT IN ('src0', 'src1')) t
      WHERE len(w) >= 5
    ), ex_e AS (
      SELECT doc_id AS eval_id, unnest(grams) AS g FROM ev
    ), ex_t AS (
      SELECT doc_id AS train_id, unnest(grams) AS g FROM tr
    ), inter AS (
      SELECT eval_id, train_id, count(*) AS n_shared
      FROM ex_e JOIN ex_t USING (g)
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT i.eval_id, i.train_id, i.n_shared,
           round(i.n_shared / len(e.grams), 6) AS containment
    FROM inter i JOIN ev e ON e.doc_id = i.eval_id
    """,
)
def x_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: 5-gram containment of 'benchmark'
    documents (sources src0/src1 as the stand-in eval set) in the rest
    of the corpus. Asymmetric containment |eval∩train|/|eval| — the
    right metric for leak detection (a prompt inside a big train doc has
    tiny Jaccard but containment 1.0). Cross-corpus gram equi-join, cost
    ∝ shared grams; see operators/dedup.ngram_containment_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("source").isin("src0", "src1"))
    tr = docs.filter(~F.col("source").isin("src0", "src1"))
    return D.ngram_containment_pairs(ev, tr, "text", "doc_id", n=5, min_shared=3)
