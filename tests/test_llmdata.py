"""Behavior tests for the LLM-data pipeline queries beyond what the
DuckDB oracles already hash-check: rule-level semantics of the quality
filter, the α=0.5 rebalancing property of mixture sampling, and
survivor-selection invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_quality_filter_reasons_match_keep(spark):
    rows = QUERIES["x_quality_filter"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert (r["keep"] == 1) == (r["reasons"] == "")
        # every named rule must be consistent with its metric
        reasons = set(r["reasons"].split(",")) if r["reasons"] else set()
        assert ("too_short" in reasons) == (r["n_words"] < 30)
        # rule fires on the UNROUNDED ratio; the reported metric is
        # rounded to 6dp, so skip the one ambiguous boundary value
        if r["stopword_ratio"] != 0.05:
            assert ("low_stopword" in reasons) == (r["stopword_ratio"] < 0.05)
    # the synthetic corpus produces a real mix, not a degenerate gate
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_mixture_sample_rebalances_toward_rare_sources(spark):
    kept = (
        QUERIES["x_mixture_sample"](spark, SF)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .collect()
    )
    from cse_datapipeline_and_mls_spark.sources import load_table

    totals = {
        r["source"]: r["n"]
        for r in load_table(spark, SF, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rates = {r["source"]: r["n_kept"] / totals[r["source"]] for r in kept}
    # budget is half the corpus: overall keep rate near 0.5 (md5-binomial noise)
    overall = sum(r["n_kept"] for r in kept) / sum(totals.values())
    assert 0.3 < overall < 0.7
    # α=0.5: smaller sources must not be sampled at a LOWER rate than the
    # largest source (monotone rebalancing, up to binomial noise on tiny
    # strata — compare aggregate of smallest vs largest halves)
    by_size = sorted(totals, key=totals.get)
    small, large = by_size[: len(by_size) // 2], by_size[len(by_size) // 2:]
    rate = lambda srcs: sum(rates.get(s, 0) * totals[s] for s in srcs) / sum(
        totals[s] for s in srcs
    )
    if totals[by_size[0]] != totals[by_size[-1]]:
        assert rate(small) >= rate(large) - 0.1


def test_dedup_survivors_one_per_cluster(spark):
    rows = QUERIES["x_dedup_survivors"](spark, SF).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["is_survivor"] for m in members) == 1
        surv = next(m for m in members if m["is_survivor"] == 1)
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert surv["doc_id"] == best["doc_id"]


def test_sequence_packing_budget_holds_at_each_sf(spark):
    out = QUERIES["x_sequence_packing"](spark, SF)
    per_seq = (
        out.groupBy("shard", "seq_id").agg(F.sum("frag_len").alias("n")).collect()
    )
    last = {
        r["shard"]: r["seq_id"]
        for r in out.groupBy("shard").agg(F.max("seq_id").alias("seq_id")).collect()
    }
    for r in per_seq:
        if r["seq_id"] != last[r["shard"]]:
            assert r["n"] == 512
        else:
            assert 1 <= r["n"] <= 512


def test_weighted_sample_docs_is_exact_es_topk(spark):
    """Efraimidis-Spirakis sample must equal the exact top-k by
    u^(1/w) computed independently in plain Python (hashlib md5), and
    selection must be repartition-invariant by construction."""
    import hashlib

    from cse_datapipeline_and_mls_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars").collect()
    keys = {}
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keys[r["doc_id"]] = round(u ** (1.0 / r["n_chars"]), 8)
    expected = sorted(keys, key=lambda d: (-keys[d], d))[:25]
    got = QUERIES["x_weighted_sample_docs"](spark, SF).collect()
    assert [r["doc_id"] for r in got] == expected
    for r in got:
        assert abs(r["sample_key"] - keys[r["doc_id"]]) < 1e-9


def test_zipf_fit_matches_numpy(spark, sf_dir):
    """Independent numpy replay of x_zipf_fit_words at sf0.001:
    Counter-based word counts, (count desc, word) rank order,
    polyfit-free closed-form least squares on (ln rank, ln count)."""
    import re as _re
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.llmdata_q import x_zipf_fit_words

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    counts = Counter()
    for t in texts:
        counts.update(w for w in _re.split(r"[ \t\n\r]+", t.strip().lower()) if w)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(top) + 1))
    y = np.log(np.array([n for _, n in top], dtype=float))
    slope = ((x * y).mean() - x.mean() * y.mean()) / ((x * x).mean() - x.mean() ** 2)
    intercept = y.mean() - slope * x.mean()
    r2 = float(np.corrcoef(x, y)[0, 1]) ** 2

    row = x_zipf_fit_words(spark, sf_dir).collect()[0]
    assert row["n_words"] == len(top)
    assert abs(row["zipf_slope"] - slope) < 1e-6
    assert abs(row["intercept"] - intercept) < 1e-6
    assert abs(row["r2"] - r2) < 1e-6
    assert row["zipf_slope"] < 0  # frequency falls with rank


def test_centroid_cosine_matrix_matches_numpy(spark, sf_dir):
    """Independent numpy replay of x_centroid_cosine_matrix at
    sf0.001: per-label mean vectors quantized at 6 decimals (the
    engine contract), then plain cosine per label pair."""
    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.coverage_q import (
        x_centroid_cosine_matrix,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])
    labels = np.asarray(t["label"])
    emb = np.array(t["embedding"].to_pylist(), dtype=float)
    cents = {}
    for lb in np.unique(labels):
        c = emb[labels == lb].mean(axis=0)
        cents[int(lb)] = np.floor(c * 1e6 + 0.5) / 1e6
    rows = x_centroid_cosine_matrix(spark, sf_dir).collect()
    ks = sorted(cents)
    assert len(rows) == len(ks) * (len(ks) - 1) // 2
    for r in rows:
        a, b = cents[r["label_a"]], cents[r["label_b"]]
        want = float(a @ b / np.sqrt((a @ a) * (b @ b)))
        assert abs(r["cosine"] - want) < 1e-6


def test_js_divergence_matches_numpy(spark, sf_dir):
    """Independent numpy replay of x_js_divergence_sources at
    sf0.001: Counter vocab, add-half smoothed distributions, direct
    JSD formula."""
    import re as _re
    from collections import Counter, defaultdict

    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.llmdata_q import (
        x_js_divergence_sources,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per_src = defaultdict(Counter)
    glob = Counter()
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        ws = [w for w in _re.split(r"[ \t\n\r]+", txt.strip().lower()) if w]
        per_src[s].update(ws)
        glob.update(ws)
    vocab = [w for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:200]]
    dists = {}
    for s, cnt in per_src.items():
        c = np.array([cnt.get(w, 0) for w in vocab], dtype=float)
        dists[s] = (c + 0.5) / (c.sum() + 100.0)
    rows = x_js_divergence_sources(spark, sf_dir).collect()
    srcs = sorted(dists)
    assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
    for r in rows:
        p, q = dists[r["source_a"]], dists[r["source_b"]]
        m = (p + q) / 2
        want = float(0.5 * (p * np.log(p / m)).sum() + 0.5 * (q * np.log(q / m)).sum())
        assert abs(r["jsd"] - want) < 1e-6


def test_source_entropy_matches_numpy(spark, sf_dir):
    """Independent numpy replay of x_source_entropy at sf0.001:
    Counter-based per-source distributions, direct Shannon/Simpson."""
    import re as _re
    from collections import Counter, defaultdict

    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.llmdata_q import x_source_entropy

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per_src = defaultdict(Counter)
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        per_src[s].update(
            w for w in _re.split(r"[ \t\n\r]+", txt.strip().lower()) if w
        )
    rows = x_source_entropy(spark, sf_dir).collect()
    assert len(rows) == len(per_src)
    for r in rows:
        c = np.array(list(per_src[r["source"]].values()), dtype=float)
        n = c.sum()
        p = c / n
        shannon = float(-(p * np.log(p)).sum())
        simpson = float((c * (c - 1)).sum() / (n * (n - 1)))
        assert r["n_tokens"] == int(n)
        assert r["n_types"] == len(c)
        assert abs(r["ttr"] - len(c) / n) < 1e-6
        assert abs(r["shannon_nats"] - shannon) < 1e-6
        assert abs(r["simpson"] - simpson) < 1e-6


def test_bigram_entropy_rate_matches_numpy(spark, sf_dir):
    """Independent replay of x_bigram_entropy_rate at sf0.001:
    Counter bigrams, direct H(w2|w1) = -sum p(w1,w2) ln p(w2|w1)."""
    import math
    import re as _re
    from collections import Counter

    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.llmdata_q import (
        x_bigram_entropy_rate,
    )

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    bi, uni = Counter(), Counter()
    for t in texts:
        ws = [w for w in _re.split(r"[ \t\n\r]+", t.strip().lower()) if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
            uni[a] += 1
    n = sum(bi.values())
    want = -sum(
        (c / n) * math.log(c / uni[a]) for (a, _), c in bi.items()
    )
    row = x_bigram_entropy_rate(spark, sf_dir).collect()[0]
    assert row["n_bigrams"] == n
    assert abs(row["entropy_rate_nats"] - want) < 1e-6
    assert abs(row["perplexity"] - math.exp(want)) < 1e-4
