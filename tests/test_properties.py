"""Property-based invariants (SURVEY §5.2 item 4) via hypothesis.

Each property drives a real Spark plan on a small generated frame, so
examples are capped and the deadline disabled (JVM round-trips dominate).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import dedup as D
from cse_datapipeline_and_mls_spark.operators import tswindow as TS

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


def _series_df(spark, values):
    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "key string, i long, v double")


@given(v=finite, n=st.integers(min_value=2, max_value=8))
@SETTINGS
def test_zscore_of_constant_series_is_null_and_normal(spark, v, n):
    df = _series_df(spark, [v] * n)
    w = TS.series_window("key", ["i"])
    out = TS.with_anomaly_flag(df, "v", w).collect()
    # stddev_pop = 0 → z NULL (nullif guard), flag coalesces to Normal
    assert all(r["zscore"] is None for r in out)
    assert all(r["anomaly"] == "Normal" for r in out)


@given(vals=st.lists(finite, min_size=1, max_size=6), k=st.integers(min_value=2, max_value=5))
@SETTINGS
def test_inclusive_rolling_mean_min_periods_guard(spark, vals, k):
    df = _series_df(spark, vals)
    w = TS.series_window("key", ["i"])
    out = TS.rolling_mean(df, "v", "m", w, k, inclusive=True, min_periods=k)
    rows = sorted(out.collect(), key=lambda r: r["i"])
    for idx, r in enumerate(rows):
        if idx + 1 < k:  # pandas rolling(k): first k-1 rows are NaN
            assert r["m"] is None
        else:
            want = sum(vals[idx + 1 - k : idx + 1]) / k
            assert math.isclose(r["m"], want, rel_tol=1e-9, abs_tol=1e-9)


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=12), min_size=1, max_size=8
    )
)
@SETTINGS
def test_exact_dedup_is_idempotent_and_keeps_min_id(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = D.exact_dedup_by_content(df)
    twice = D.exact_dedup_by_content(once)
    got_once = sorted(r["doc_id"] for r in once.collect())
    got_twice = sorted(r["doc_id"] for r in twice.collect())
    assert got_once == got_twice  # idempotent
    # survivor is the minimum doc_id of its normalized-content group
    norm = lambda t: " ".join(t.lower().strip().split())  # noqa: E731
    groups: dict[str, int] = {}
    for i, t in enumerate(texts):
        groups.setdefault(norm(t), i)
    assert got_once == sorted(groups.values())


@given(vals=st.lists(finite, min_size=2, max_size=8))
@SETTINGS
def test_pct_change_sign_matches_diff(spark, vals):
    df = _series_df(spark, vals)
    w = TS.series_window("key", ["i"])
    out = sorted(TS.with_diff_pct(df, "v", w).collect(), key=lambda r: r["i"])
    assert out[0]["diff"] is None  # no predecessor
    for prev, r in zip(vals, out[1:]):
        assert math.isclose(r["diff"], r["v"] - prev, rel_tol=1e-9, abs_tol=1e-9)
        if r["pct_change"] is not None and prev > 0:
            assert (r["pct_change"] > 0) == (r["diff"] > 0) or r["diff"] == 0


@given(
    text=st.text(alphabet="abcdef gh", min_size=0, max_size=30),
    pad=st.text(alphabet=" ", min_size=0, max_size=3),
)
@SETTINGS
def test_simhash_invariant_to_leading_trailing_whitespace(spark, text, pad):
    df = spark.createDataFrame([(0, text), (1, pad + text + pad)], "doc_id long, text string")
    out = {r["doc_id"]: r["simhash"] for r in D.with_simhash(df).collect()}
    assert out[0] == out[1]


def _brute_duplicate_spans(docs: dict, k: int):
    """Reference implementation: per (doc, pos) k-grams, positions whose
    gram appears >=2 times anywhere, merged into maximal islands."""
    from collections import Counter

    grams = {}
    for did, words in docs.items():
        grams[did] = [tuple(words[i : i + k]) for i in range(len(words) - k + 1)]
    counts = Counter(g for gs in grams.values() for g in gs)
    spans = {}
    for did, gs in grams.items():
        hits = [i + 1 for i, g in enumerate(gs) if counts[g] >= 2]  # 1-based
        merged = []
        for p in hits:
            if merged and p <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], p + k - 1))
            else:
                merged.append((p, p + k - 1))
        if merged:
            spans[did] = merged
    return spans


@given(
    data=st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij kl".split()), min_size=0, max_size=12),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(min_value=2, max_value=4),
)
@SETTINGS
def test_duplicate_spans_matches_brute_force(spark, data, k):
    """duplicate_spans == brute-force reference on arbitrary small-vocab
    corpora (small vocab forces collisions, the interesting case)."""
    from cse_datapipeline_and_mls_spark.operators import text as X

    docs = {i: words for i, words in enumerate(data)}
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in docs.items()], "doc_id long, text string"
    )
    got = {}
    for r in X.duplicate_spans(df, "text", "doc_id", k=k).collect():
        got.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for d in got:
        got[d].sort()
    # empty-text docs: Spark's split('') yields one empty token; the
    # brute force tokenizes to [] — both produce no k-grams for k>=2,
    # so the outputs agree without special-casing.
    assert got == _brute_duplicate_spans(docs, k)


@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6), min_size=1, max_size=8
    ),
    tau=st.integers(min_value=1, max_value=2),
)
@SETTINGS
def test_fuzzy_segment_blocking_matches_brute_force(spark, names, tau):
    """Pigeonhole segment blocking == exhaustive levenshtein on ARBITRARY
    tiny-alphabet strings (hypothesis drives the segment-boundary and
    short-string corners a fixed fixture can miss)."""
    import itertools

    from cse_datapipeline_and_mls_spark.operators.relational import fuzzy_join_blocked

    def lev(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy)))
            prev = cur
        return prev[-1]

    uniq = sorted(set(names))
    df = spark.createDataFrame([(n,) for n in uniq], "name string")
    a = df.select(F.col("name").alias("name_a"))
    b = df.select(F.col("name").alias("name_b"))
    got = {
        (r["name_a"], r["name_b"], r["edit_distance"])
        for r in fuzzy_join_blocked(a, b, "name_a", "name_b", max_distance=tau)
        .filter(F.col("name_a") < F.col("name_b"))
        .collect()
    }
    want = {
        (x, y, lev(x.strip(), y.strip()))
        for x, y in itertools.combinations(uniq, 2)
        if lev(x.strip(), y.strip()) <= tau
    }
    assert got == want


# ---------------------------------------------------------------------------
# round-4 session-2 operator properties
# ---------------------------------------------------------------------------


@SETTINGS
@given(
    target=st.dictionaries(
        st.integers(min_value=0, max_value=9), finite, min_size=1, max_size=6
    ),
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(min_value=0, max_value=9), finite),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=3,
    ),
)
def test_merge_upsert_sequential_equals_latest_once(spark, target, batches):
    """Applying CDC batches one-by-one must equal applying the
    concatenated batch with latest-per-key reduction once — the
    associativity that makes replay/catch-up safe."""
    from cse_datapipeline_and_mls_spark.operators.relational import merge_upsert

    t0 = spark.createDataFrame(
        [(k, v) for k, v in target.items()], "id bigint, bal double"
    )
    seq = t0
    flat = []
    version = 0
    for batch in batches:
        rows = []
        for k, v in batch:
            rows.append((k, v, version))
            flat.append((k, v, version))
            version += 1
        bdf = spark.createDataFrame(rows, "id bigint, bal double, v long")
        seq = merge_upsert(seq, bdf, ["id"], set_cols=["bal"], order_col="v")
    once = merge_upsert(
        t0,
        spark.createDataFrame(flat, "id bigint, bal double, v long"),
        ["id"],
        set_cols=["bal"],
        order_col="v",
    )
    assert sorted(map(tuple, seq.collect())) == sorted(map(tuple, once.collect()))


@SETTINGS
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
def test_inverted_index_reconstructs_token_counts(spark, texts):
    """postings tf sums per doc == doc_len, and df == docs containing
    the term — for arbitrary corpora over a tiny alphabet."""
    from cse_datapipeline_and_mls_spark.operators.search import build_inverted_index

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    postings, stats = build_inverted_index(docs)
    tf_sum = {
        r["doc_id"]: r["s"]
        for r in postings.groupBy("doc_id").agg(F.sum("tf").alias("s")).collect()
    }
    lens = {r["doc_id"]: r["doc_len"] for r in stats.collect()}
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        assert lens[i] == len(toks)
        assert tf_sum.get(i, 0) == len(toks)
    # df parity on the full vocabulary
    df_counts = {
        r["term"]: r["d"]
        for r in postings.groupBy("term").agg(F.count(F.lit(1)).alias("d")).collect()
    }
    vocab = {w for t in texts for w in t.lower().split() if w}
    for w in vocab:
        truth = sum(1 for t in texts if w in t.lower().split())
        assert df_counts[w] == truth


@SETTINGS
@given(
    keys=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=30, unique=True
    ),
    nparts=st.integers(min_value=1, max_value=6),
)
def test_dense_ids_are_a_sorted_bijection(spark, keys, nparts):
    from cse_datapipeline_and_mls_spark.operators.relational import assign_dense_ids

    df = spark.createDataFrame([(k,) for k in keys], "k bigint").repartition(nparts)
    got = {r["k"]: r["dense_id"] for r in assign_dense_ids(df, ["k"]).collect()}
    assert [got[k] for k in sorted(keys)] == list(range(len(keys)))


@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcx", min_size=1, max_size=3),
            min_size=0,
            max_size=12,
        ).map(lambda ws: " ".join(ws)),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(min_value=2, max_value=5),
)
@SETTINGS
def test_word_ngrams_matches_naive_python(spark, texts, n):
    """The zip_with n-gram build (text.word_ngrams — the fix for the
    per-gram tokenizer re-evaluation trap) must produce exactly the
    naive Python sliding-window n-grams for every input, including docs
    shorter than n and empty docs."""
    from cse_datapipeline_and_mls_spark.operators.text import word_ngrams

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim("t")), r"[ \t\n\r]+", " "), " "
    )
    got = {
        r["id"]: r["g"]
        for r in df.select("id", word_ngrams(words_expr, n).alias("g")).collect()
    }
    import re

    for i, t in enumerate(texts):
        ws = re.sub(r"[ \t\n\r]+", " ", t.lower().strip()).split(" ")
        want = [" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)]
        assert got[i] == want, (t, n)


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1,
        max_size=14,
    ),
    iters=st.integers(min_value=1, max_value=4),
)
def test_katz_walk_counts_match_matrix_powers(spark, edges, iters):
    """katz_centrality's integer walk counts equal the column sums of
    the adjacency-matrix powers (walks_k(v) = (1ᵀAᵏ)_v) on random
    digraphs — the linear-algebra definition as the oracle. Duplicate
    edges in the input are NOT deduped by the operator (a multigraph
    reading), so dedupe here to fix the semantics."""
    import numpy as np

    uniq = sorted(set(edges))
    df = spark.createDataFrame(uniq, "src long, dst long")
    out = {r["node"]: r for r in __import__(
        "cse_datapipeline_and_mls_spark.operators.graph", fromlist=["katz_centrality"]
    ).katz_centrality(df, iters=iters, alpha_inv=20).collect()}
    nodes = sorted({n for e in uniq for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for s, d in uniq:
        A[idx[s], idx[d]] = 1
    ones = np.ones(len(nodes), dtype=np.int64)
    walks = []
    v = ones
    for _ in range(iters):
        v = v @ A  # row vector times A: walks ending at each node
        walks.append(v.copy())
    for n in nodes:
        for k in range(1, iters + 1):
            assert out[n][f"w{k}"] == walks[k - 1][idx[n]], (n, k)
        expect = sum(walks[k - 1][idx[n]] / float(20**k) for k in range(1, iters + 1))
        assert abs(out[n]["katz"] - expect) < 1e-12
