"""BPE subword trainer (text.train_bpe_merges / bpe_token_counts):
deterministic merges on the word-frequency dictionary, distinct-word
broadcast re-encode, and the token-economics guarantees the registered
bracket-verdict query relies on."""

from __future__ import annotations

from cse_datapipeline_and_mls_spark.operators import text as X


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_dominant_pair_becomes_first_merge(spark):
    docs = _docs(spark, ["aaaa aaaa aaaa", "aaaa ab", "b c"])
    merges = X.train_bpe_merges(docs, n_merges=3)
    assert merges[0] == ("a", "a")  # 'aa' dominates every other pair


def test_merges_are_deterministic_and_bounded(spark):
    docs = _docs(spark, ["low lower lowest", "low low lower", "newest widest"])
    m1 = X.train_bpe_merges(docs, n_merges=10)
    m2 = X.train_bpe_merges(docs, n_merges=10)
    assert m1 == m2
    assert len(m1) <= 10
    # every merge joins symbols buildable from earlier merges + chars
    known = set("abcdefghijklmnopqrstuvwxyz") | {"</w>"}
    for a, b in m1:
        assert a in known and b in known, (a, b)
        known.add(a + b)


def test_encode_word_applies_merges_in_order(spark):
    merges = [("a", "a"), ("aa", "a")]
    assert X.bpe_encode_word("aaa", merges) == ["aaa", "</w>"]
    assert X.bpe_encode_word("aab", merges) == ["aa", "b", "</w>"]
    # word with none of the merged pairs stays at char granularity
    assert X.bpe_encode_word("xy", merges) == ["x", "y", "</w>"]


def test_token_counts_match_hand_computation_and_guarantees(spark):
    docs = _docs(spark, ["aa aa bb", "aa xyz"])
    merges = X.train_bpe_merges(docs, n_merges=1)
    # ('a','a') and ('a','</w>') both occur 3x ('aa' has one of each);
    # the lexicographic tiebreak picks ('a','</w>') ('<' sorts below 'a')
    assert merges == [("a", "</w>")]
    rows = {
        r["doc_id"]: r for r in X.bpe_token_counts(docs, merges).collect()
    }
    # doc 0: 'aa'->[a,a</w>]=2 twice, 'bb'->[b,b,</w>]=3; chars: (2+1)*3=9
    assert rows[0]["n_words"] == 3
    assert rows[0]["n_char_tokens"] == 9
    assert rows[0]["n_bpe_tokens"] == 2 + 2 + 3
    # doc 1: 'aa'->2, 'xyz'->[x,y,z,</w>]=4 (unseen pairs untouched)
    assert rows[1]["n_bpe_tokens"] == 6
    for r in rows.values():
        assert r["n_words"] <= r["n_bpe_tokens"] <= r["n_char_tokens"]


def test_empty_corpus_trains_nothing(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert X.train_bpe_merges(docs, n_merges=5) == []
    assert X.bpe_token_counts(docs, []).count() == 0
