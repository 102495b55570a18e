"""Corpus-search tour: keyword (BM25), dense (cosine), and hybrid (RRF)
retrieval over the bundled documents — plus the at-rest layout that
makes keyword search partition-pruned at 100 TB.

    python examples/corpus_search.py [sf_dir]

1. BM25 AND-search      — inverted index (one explode + one groupBy),
                          candidate-sized ranking, TakeOrderedAndProject.
2. dense cosine top-k   — exact baseline from the vector stack.
3. hybrid RRF           — rank-only fusion of 1+2; docs surfaced by
                          both modalities rise (n_lists = 2).
4. persisted postings   — write the index partitioned BY TERM; the
                          query's `term IN (...)` becomes directory
                          pruning (only its terms' partitions are read).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.operators import similarity as S  # noqa: E402
from cse_datapipeline_and_mls_spark.operators.search import (  # noqa: E402
    bm25_topk,
    build_inverted_index,
    rrf_fuse,
)
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402

TERMS = ["vector", "hash", "merge"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-search-tour")
    docs = load_table(spark, sf_dir, "documents")

    # 1. sparse: BM25 over the in-memory index
    t0 = time.time()
    postings, doc_stats = build_inverted_index(docs)
    sparse = bm25_topk(postings, doc_stats, TERMS, k=20, mode="all")
    rows = sparse.collect()
    print(f"bm25(all)     {time.time() - t0:5.2f}s  top: "
          f"{[(r['doc_id'], round(r['score'], 3)) for r in rows[:5]]}")

    # 2. dense: exact cosine for one query vector
    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q0 = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    dense = S.brute_force_topk(emb, q0, k=20)
    drows = dense.collect()
    print(f"dense cosine  {time.time() - t0:5.2f}s  top: "
          f"{[(r['vec_id'], r['cosine_sim']) for r in drows[:5]]}")

    # 3. hybrid: rank-only fusion
    t0 = time.time()
    sparse_r = sparse.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc(F.round("score", 6)), "doc_id"))
        .alias("rank"),
    )
    dense_r = dense.select(F.col("vec_id").alias("doc_id"), F.col("rnk").alias("rank"))
    fused = rrf_fuse([sparse_r, dense_r], top_k=10).collect()
    print(f"hybrid RRF    {time.time() - t0:5.2f}s  top: "
          f"{[(r['doc_id'], round(r['rrf_score'], 4), r['n_lists']) for r in fused[:5]]}")

    # 4. the at-rest layout: postings partitioned by term -> the search
    # reads only its terms' directories (partition pruning)
    with tempfile.TemporaryDirectory() as td:
        idx = os.path.join(td, "postings")
        postings.write.partitionBy("term").parquet(idx)
        on_disk = spark.read.parquet(idx).filter(F.col("term").isin(*TERMS))
        plan = on_disk._jdf.queryExecution().executedPlan().toString()
        pruned = "PartitionFilters" in plan or "partition" in plan.lower()
        n = on_disk.count()
        print(f"persisted     partition-pruned={pruned}  candidate postings={n}")

    from cse_datapipeline_and_mls_spark.operators.search import phrase_search

    t0 = time.time()
    hits = phrase_search(docs, "value table part").orderBy("doc_id").limit(5).collect()
    print(
        f"phrase        {time.time() - t0:5.2f}s  'value table part' in: "
        + ", ".join(f"doc {r['doc_id']} x{r['n_hits']}" for r in hits)
    )

    spark.stop()


if __name__ == "__main__":
    main()
