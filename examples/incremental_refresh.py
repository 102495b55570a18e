"""Incremental-refresh tour — the delta-vs-corpus patterns that make a
100 TB lakehouse affordable: never rescan the corpus to absorb a new
batch. Every leg is an oracle-checked registry query whose hash gate
proves the incremental algebra equals the full recompute (or, for the
approximate index, that the refreshed index IS the rebuilt index).

    python examples/incremental_refresh.py [sf_dir]

1. Rollup refresh    — per-day aggregate: only watermark-new days
                       aggregate from the fact scan, then MERGE
                       (x_incremental_rollup_refresh; merged table ==
                       full recompute row-for-row).
2. Exact dedup       — new batch vs corpus fingerprints: left-anti on
                       the distinct-fingerprint table, |batch|+|fps|
                       per refresh (x_exact_dedup_incremental).
3. Near-dup (MinHash)— banded LSH probe of the batch against the
                       corpus index: batch×corpus + batch×batch
                       candidates only, never corpus×corpus
                       (x_minhash_incremental).
4. Recommender       — co-occurrence pairs decompose by order, so the
                       refresh is a delta pair build + a (pa,pb)-keyed
                       count merge + re-truncation ONLY for touched
                       items; oracle is the full recompute shared
                       verbatim with ml_item_cooccurrence_recs
                       (ml_item_recs_incremental).
5. Vector index      — new vectors assign to cells with the FROZEN
                       codebook and append to the partitioned inverted
                       file; the query asserts the refreshed index is
                       row-identical to a rebuild and that probe
                       recall holds (x_ann_ivf_incremental).
6. Search index      — inverted-index maintenance with deletions, as a
                       stream (streaming twin; see tests) — shown here
                       as the batch postings refresh.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-tour")

    print("== 1. Materialized rollup refresh (MERGE only the new days) ==")
    QUERIES["x_incremental_rollup_refresh"](spark, sf_dir).orderBy(
        "day", ascending=False
    ).show(8)

    print("== 2. Exact dedup, batch-vs-corpus (anti-join on fingerprints) ==")
    QUERIES["x_exact_dedup_incremental"](spark, sf_dir).show(8)

    print("== 3. MinHash near-dup, batch probe of the corpus LSH index ==")
    QUERIES["x_minhash_incremental"](spark, sf_dir).show(8)

    print("== 4. Item-kNN refresh (delta pairs + touched-item re-window) ==")
    QUERIES["ml_item_recs_incremental"](spark, sf_dir).show(9)

    print("== 5. IVF index append (frozen codebook; equals rebuild) ==")
    QUERIES["x_ann_ivf_incremental"](spark, sf_dir).show(8)

    print(
        "Every result above is hash-compared against a DuckDB oracle at\n"
        "driver time; legs 1 and 4 use the FULL-recompute SQL as the\n"
        "oracle, so the delta algebra is proven, not assumed."
    )


if __name__ == "__main__":
    main()
