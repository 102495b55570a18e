"""Text operator + scalar function library tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import text as X
from cse_datapipeline_and_mls_spark.schemas import (
    parse_date_multi,
    parse_filename_date,
    sanitize_column_name,
)


def test_token_count_bpe_ish(spark):
    df = spark.createDataFrame([("Hello, world! x2",)], "text string")
    row = df.select(
        X.token_count("text").alias("n"), X.whitespace_token_count("text").alias("ws")
    ).collect()[0]
    # Hello , world ! x 2  -> 6 regex tokens; 3 whitespace tokens
    assert row["n"] == 6
    assert row["ws"] == 3


def test_stopword_and_punct_ratio(spark):
    df = spark.createDataFrame([("the cat and the hat",)], "text string")
    row = df.select(
        X.stopword_ratio("text").alias("sr"), X.punct_ratio("text").alias("pr")
    ).collect()[0]
    assert abs(row["sr"] - 3 / 5) < 1e-9  # the, and, the
    assert row["pr"] == 0.0


def test_lang_id_heuristic_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and that is fine"),
            (2, "der hund ist nicht da und die katze"),
            (3, "def foo(): return import class void function"),
            (4, "xyzzy plugh"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r["g"] for r in df.select("id", X.lang_id_heuristic("text").alias("g")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "code"
    assert got[4] == "unknown"


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello worlds")],
        "id int, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", X.doc_fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_sanitize_column_name_matches_reference_regex():
    # reference scraper/main.py:57: [\$#\[\]\/\.\s] -> _
    assert sanitize_column_name("Last Trade (Rs.)") == "Last_Trade_(Rs_)"
    assert sanitize_column_name("a$b#c[d]e/f.g h") == "a_b_c_d_e_f_g_h"


def test_multi_format_date_parse(spark):
    df = spark.createDataFrame(
        [("2023-03-10",), ("20230310",), (" 2023-03-10 ",), ("garbage",)], "d string"
    )
    got = [r["p"] for r in df.select(parse_date_multi("d").cast("string").alias("p")).collect()]
    assert got[0] == "2023-03-10"
    assert got[1] == "2023-03-10"
    assert got[2] == "2023-03-10"  # trimmed
    assert got[3] is None


def test_filename_date_parse(spark):
    df = spark.createDataFrame([("20230310.csv",)], "d string")
    got = df.select(parse_filename_date("d").cast("string").alias("p")).collect()[0]["p"]
    assert got == "2023-03-10"


def test_quality_score_orders_good_above_garbage(spark):
    good = "the quick brown fox jumps over the lazy dog and runs far into the quiet green field today"
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(1, good), (2, bad)], "id int, text string")
    got = {r["id"]: r["q"] for r in df.select("id", X.quality_score("text").alias("q")).collect()}
    assert got[1] > got[2]


def test_repetition_ratios(spark):
    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now buy now"),  # heavy word+bigram repeats
            (2, "each word here is fully unique today"),  # none
            (3, "single"),  # <2 words: bigram ratio must be 0, not negative/null
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["w"], r["b"])
        for r in df.select(
            "id",
            X.word_repetition_ratio("text").alias("w"),
            X.bigram_repetition_ratio("text").alias("b"),
        ).collect()
    }
    assert got[1][0] == 0.75  # 8 words, 2 distinct
    assert got[1][1] > 0.5  # 7 bigrams, 2 distinct
    assert got[2] == (0.0, 0.0)
    assert got[3] == (0.0, 0.0)


def test_scrub_text_replaces_all_three_patterns(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://x.io/a?b=1 mail a.b+c@ex.org call 555-1234 done"),
            (2, "no pii here"),
            (3, "http://plain.com and u@d.co and 123-4567"),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: (r["clean"], r["nu"], r["ne"], r["np"])
        for r in df.select(
            "id",
            X.scrub_text("text").alias("clean"),
            X.match_count("text", X.URL_REGEX).alias("nu"),
            X.match_count("text", X.EMAIL_REGEX).alias("ne"),
            X.match_count("text", X.PHONE_REGEX).alias("np"),
        ).collect()
    }
    assert got[1] == ("see <URL> mail <EMAIL> call <PHONE> done", 1, 1, 1)
    assert got[2] == ("no pii here", 0, 0, 0)
    assert got[3] == ("<URL> and <EMAIL> and <PHONE>", 1, 1, 1)


def test_chunk_by_words_covers_every_word_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(130))
    df = spark.createDataFrame([(1, text), (2, "short doc")], "doc_id long, text string")
    rows = X.chunk_by_words(df, "text", "doc_id", window=50, stride=40).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 130 words -> starts at 0,40,80,120 -> 4 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c1] == [0, 1, 2, 3]
    assert [r["n_words_chunk"] for r in c1] == [50, 50, 50, 10]
    assert c1[0]["chunk_text"].startswith("w0 ") and c1[3]["chunk_text"] == " ".join(
        f"w{i}" for i in range(120, 130)
    )
    # overlap: chunk 1 starts at w40, inside chunk 0's [0,50) window
    assert c1[1]["chunk_text"].split()[0] == "w40"
    # every word appears in at least one chunk
    seen = {w for r in c1 for w in r["chunk_text"].split()}
    assert len(seen) == 130
    # doc 2: single short chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_words_chunk"] == 2


def test_ngram_containment_is_asymmetric(spark):
    from cse_datapipeline_and_mls_spark.operators import dedup as D

    train = spark.createDataFrame(
        [(10, "a b c d e f g h i j k l m n o p")], "doc_id long, text string"
    )
    # eval doc fully contained in the train doc, plus an unrelated one
    ev = spark.createDataFrame(
        [(1, "c d e f g h i j"), (2, "z y x w v u t s")], "doc_id long, text string"
    )
    got = {
        (r["eval_id"], r["train_id"]): r["containment"]
        for r in D.ngram_containment_pairs(ev, train, n=5, min_shared=2).collect()
    }
    # eval 1 has 4 distinct 5-grams, all present in train -> containment 1.0
    assert got == {(1, 10): 1.0}


def test_pack_sequences_invariants(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, "shard_a" if i < 40 else "shard_b", " ".join("w" * 1 for _ in range(rng.randint(5, 200))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = X.pack_sequences(df, "text", "doc_id", shard_col="source", budget=64).collect()

    # fragments of one doc reassemble it exactly: contiguous, start at 0,
    # lengths sum to n_tok
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    n_tok_truth = {i: len(t.split()) for i, _, t in rows}
    assert set(by_doc) == set(n_tok_truth)
    for doc_id, frags in by_doc.items():
        frags.sort(key=lambda r: r["seq_id"])
        assert frags[0]["frag_start"] == 0
        pos = 0
        for f in frags:
            assert f["frag_start"] == pos and f["frag_len"] >= 1
            pos += f["frag_len"]
        assert pos == n_tok_truth[doc_id] == frags[0]["n_tok"]

    # every sequence except each shard's last carries exactly the budget
    by_seq = {}
    for r in out:
        by_seq.setdefault((r["shard"], r["seq_id"]), 0)
        by_seq[(r["shard"], r["seq_id"])] += r["frag_len"]
    for shard in {s for s, _ in by_seq}:
        seqs = sorted(k[1] for k in by_seq if k[0] == shard)
        assert seqs == list(range(len(seqs)))  # dense shard-local ids
        for s in seqs[:-1]:
            assert by_seq[(shard, s)] == 64
        assert 1 <= by_seq[(shard, seqs[-1])] <= 64


def test_duplicate_spans_merging_and_cross_doc(spark):
    """duplicate_spans: cross-doc shared phrases and within-doc
    repetition both count; overlapping k-gram hits merge into one
    maximal span; unique text yields no spans."""
    shared = "one two three four five six seven eight nine ten"  # 10 words
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail alpha beta gamma delta epsilon zeta"),
            (2, "totally different head words here also " + shared),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"),
            # doc 4 repeats its own 8-gram twice -> self-duplication
            (4, "r1 r2 r3 r4 r5 r6 r7 r8 filler r1 r2 r3 r4 r5 r6 r7 r8"),
        ],
        "doc_id long, text string",
    )
    out = X.duplicate_spans(docs, "text", "doc_id", k=8, min_occurrences=2)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_words"])
        )
    # doc 1: the shared phrase occupies words 1..10 -> one merged span
    # (3 overlapping duplicated 8-grams at pos 1,2,3 merge)
    assert spans[1] == [(1, 10, 10)]
    # doc 2: same phrase at words 7..16
    assert spans[2] == [(7, 16, 10)]
    # doc 3: unique text -> no duplicated spans
    assert 3 not in spans
    # doc 4: self-repetition -> both occurrences flagged, not merged
    # (gap 'filler' at word 9 separates them)
    assert spans[4] == [(1, 8, 8), (10, 17, 8)]


def test_remove_duplicate_spans_cuts_exactly_the_spans(spark):
    """remove_duplicate_spans: cleaned text == the word array minus the
    exact positions duplicate_spans reports; span-free docs come back
    whitespace-normalized but otherwise intact."""
    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (1, shared + " unique tail alpha beta gamma delta epsilon zeta"),
            (2, "totally different head words here also " + shared),
            (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"),
            (4, "r1 r2 r3 r4 r5 r6 r7 r8 filler r1 r2 r3 r4 r5 r6 r7 r8"),
            (5, "short doc"),
        ],
        "doc_id long, text string",
    )
    spans = {}
    for r in X.duplicate_spans(docs, "text", "doc_id", k=8, min_occurrences=2).collect():
        spans.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    out = {
        r["doc_id"]: (r["clean_text"], r["n_words"], r["n_removed_words"])
        for r in X.remove_duplicate_spans(docs, "text", "doc_id", k=8).collect()
    }
    for row in docs.collect():
        words = row["text"].lower().split()
        covered = {
            i
            for (s, e) in spans.get(row["doc_id"], [])
            for i in range(s, e + 1)
        }
        expect = " ".join(w for i, w in enumerate(words, 1) if i not in covered)
        clean, n_words, n_removed = out[row["doc_id"]]
        assert clean == expect, row["doc_id"]
        assert n_words == len(words)
        assert n_removed == len(covered)
    # sanity on the fixture itself: doc 1 loses its shared prefix,
    # doc 3 and 5 are untouched, doc 4 keeps only the filler word
    assert out[3][2] == 0 and out[5][2] == 0
    assert out[4][0] == "filler"


def test_remove_source_boilerplate_planted(spark):
    """Planted site chrome: an 8-word footer shared by two docs of the
    same source must be cut from both; the identical segment in a
    DIFFERENT source (only one doc there) must survive; uniques keep
    their text verbatim."""
    from cse_datapipeline_and_mls_spark.operators.text import (
        remove_source_boilerplate,
    )

    footer = "terms of service apply contact us legal notice"
    rows = [
        (1, "a", f"alpha beta gamma delta epsilon zeta eta theta {footer}"),
        (2, "a", f"one two three four five six seven eight {footer}"),
        (3, "b", f"solo doc in another source keeps its words {footer}"),
        (4, "a", "completely unique words here nothing repeats at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in remove_source_boilerplate(df, "text", "doc_id", "source").collect()
    }
    # docs 1 and 2: 16 words, the footer segment (positions 9-16) cut
    for i in (1, 2):
        assert got[i]["n_words"] == 16
        assert got[i]["n_removed_words"] == 8, got[i]
        assert footer not in got[i]["clean_text"]
    assert got[1]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    # doc 3: same footer but source b has only one doc — survives
    assert got[3]["n_removed_words"] == 0
    assert footer in got[3]["clean_text"]
    assert got[4]["n_removed_words"] == 0
    assert got[4]["clean_text"] == rows[3][2]
