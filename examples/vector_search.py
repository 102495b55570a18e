"""Vector-search tour: the same top-k question answered four ways, from
exact baseline to 32×-compressed codes — run it to see the accuracy/cost
ladder on the bundled embeddings.

    python examples/vector_search.py [sf_dir]

1. brute force   — exact, corpus never shuffles; right answer when the
                   query set is small (broadcast map-side scan).
2. IVF           — k-means coarse cells, probe nprobe of them; the
                   corpus scan shrinks to ~nprobe/k of itself.
3. IVF persisted — same, against the cell-partitioned on-disk index
                   (partition pruning does the probing).
4. PQ            — vectors encoded to m one-byte codes (32× smaller:
                   what you SCAN at 100 TB); LUT-gather candidates,
                   exact-cosine rerank.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.operators import similarity as S  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("vector-search-tour")
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def show(tag, df, t0):
        rows = df.collect()
        keep = {(r[0], r[1]) for r in rows}
        print(f"{tag:14s} {time.time() - t0:5.2f}s  {sorted(keep)[:6]} ...")
        return keep

    t0 = time.time()
    exact = show("brute-force", S.brute_force_topk(emb, queries, k=5), t0)

    t0 = time.time()
    book = S.fit_codebook(emb, k=8, seed=42, max_iter=5)
    ivf = show("ivf nprobe=2", S.ivf_topk(emb, queries, book, k=5, nprobe=2), t0)

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.time()
        S.save_ivf_index(emb, book, f"{tmp}/ivf")
        inv, cents = S.load_ivf_index(spark, f"{tmp}/ivf")
        show(
            "ivf persisted",
            S.ivf_topk_from_index(inv, cents, queries, k=5, nprobe=2),
            t0,
        )

        t0 = time.time()
        books = S.fit_pq_codebooks(emb, m=8, k=32, seed=42)
        pq = show("pq refine=8", S.pq_topk(emb, queries, books, k=5, refine=8), t0)

    for tag, approx in (("ivf", ivf), ("pq", pq)):
        recall = len(exact & approx) / len(exact)
        print(f"{tag} recall@5 vs exact: {recall:.2f}")


if __name__ == "__main__":
    main()
