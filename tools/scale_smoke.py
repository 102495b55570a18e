"""Scale smoke: run representative operators at ~25-50x the sf0.1 row
counts (synthesized in-session by unioning key-shifted copies, so no
extra test data is needed) and report per-row throughput vs the sf0.1
run. Near-constant per-row cost across the scale-up is the evidence
that the operator's plan has no hidden superlinear term (driver-side
loop, all-pairs blowup, single-partition window).

    python tools/scale_smoke.py [k_events] [k_docs]

Writes one JSON line: per-operator {rows, sec, us_per_row} at 1x and
at kx, plus the ratio of per-row costs (≈1.0 = linear).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.operators import dedup as D  # noqa: E402
from cse_datapipeline_and_mls_spark.operators import text as X  # noqa: E402
from cse_datapipeline_and_mls_spark.operators import tswindow as TS  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def scaled_events(spark, k: int) -> DataFrame:
    """k key-shifted copies of events: user_id and event_id offsets keep
    keys distinct per copy, so per-key series lengths stay realistic and
    the number of window partitions grows with the data (as it would at
    a real larger SF)."""
    ev = load_table(spark, SF_DIR, "events")
    copies = spark.range(k).select(F.col("id").alias("_k"))
    return ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("_k") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_k") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scaled_docs(spark, k: int) -> DataFrame:
    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(k).select(F.col("id").alias("_k"))
    # shift ids; append the copy index to the text so content is unique
    # per copy (otherwise dedup degenerates to k-way duplicates, which is
    # ALSO worth measuring — see exact_dedup_dup_heavy below)
    return docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("_k") * 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copy"), F.col("_k")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def timed(df: DataFrame) -> tuple[int, float]:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    sec = time.time() - t0
    return sec


def run(spark, k_events: int, k_docs: int, k_graph: int = 10) -> dict:
    out: dict = {}

    def case(name, mk_df, n_rows_fn=None):
        # n_rows_fn(one) -> denominator rows. Queries whose OUTPUT is
        # fixed-size (top-k, per-group rollups) must report per-INPUT-row
        # cost, otherwise the ratio reads as superlinear when total work
        # is actually sublinear in the input.
        res = {}
        for label, kk in (("1x", 1), (f"{k_events if 'window' in name or 'events' in name else k_docs}x", None)):
            one = label == "1x"
            df = mk_df(1 if one else None)
            n = n_rows_fn(one) if n_rows_fn is not None else df.count()
            # warm the input (file listing, codegen), then measure
            sec = min(timed(df), timed(df))
            res[label] = {"rows": n, "sec": round(sec, 2), "us_per_row": round(sec / n * 1e6, 3)}
        r1 = res["1x"]["us_per_row"]
        rk = list(res.values())[1]["us_per_row"]
        res["per_row_ratio"] = round(rk / r1, 2) if r1 > 0 else None
        out[name] = res

    # 1. The whole window feature block (one exchange, many functions).
    def window_block(one):
        ev = scaled_events(spark, 1 if one else k_events)
        w = TS.series_window("user_id", ["ts", "event_id"])
        df = TS.with_rsi(ev, "value", w)
        df = TS.with_diff_pct(df, "value", w)
        return TS.with_anomaly_flag(df, "pct_change", w)

    case("window_block_events", window_block)

    # 2. Exact content dedup over unique-heavy corpus (hash + window).
    def exact_dedup(one):
        return D.exact_dedup_by_content(scaled_docs(spark, 1 if one else k_docs))

    case("exact_dedup_docs", exact_dedup)

    # 3. Text quality stats (pure map-side — the linearity baseline).
    def text_stats(one):
        return X.with_text_stats(scaled_docs(spark, 1 if one else k_docs))

    case("text_stats_docs", text_stats)

    # 4. Sequence packing (per-shard window + explode).
    def packing(one):
        return X.pack_sequences(
            scaled_docs(spark, 1 if one else k_docs), "text", "doc_id", "source", 512
        )

    case("sequence_packing_docs", packing)

    # 5. Duplicated-span detection (gram explode + hash agg + join +
    # per-doc window) — the newest heavy shuffle; the per-row cost must
    # not grow with corpus size even though every copy of the corpus
    # shares its duplicated grams with every other copy (the dup-gram
    # table grows, the candidate join stays gram-equality-bounded).
    def dup_spans(one):
        return X.duplicate_spans(
            scaled_docs(spark, 1 if one else k_docs), "text", "doc_id", k=8
        )

    case("duplicate_spans_docs", dup_spans)

    # 6. PageRank — per-EDGE cost must stay flat as k disjoint
    # key-shifted copies of the purchase graph multiply |E| (each
    # iteration shuffles |E| contributions; the per-iteration task count
    # is pinned to defaultParallelism — regression-tested in
    # tests/test_graph.py). Construction runs eager localCheckpoints, so
    # the whole build+iterate+write is inside the timer (single run).
    from cse_datapipeline_and_mls_spark.operators.graph import pagerank

    def scaled_edges(kk: int) -> DataFrame:
        o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
        e = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select((-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst"))
            .distinct()
        )
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return e.crossJoin(copies).select(
            (F.col("src") - F.col("_k") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("_k") * 10_000_000).alias("dst"),
        )

    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        e = scaled_edges(kk)
        n_edges = e.count()
        t0 = time.time()
        pagerank(e, iters=6).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_edges,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_edges * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["pagerank_edges"] = res

    # 7. Entity resolution: blocked fuzzy pairs -> string-keyed CC.
    # Copies get a distinct numeric suffix so clusters stay per-copy
    # (cluster count scales with data; block sizes stay bounded).
    from cse_datapipeline_and_mls_spark.operators.dedup import connected_components
    from cse_datapipeline_and_mls_spark.operators.relational import fuzzy_join_blocked

    def fuzzy_clusters(kk: int) -> tuple[DataFrame, int]:
        part = load_table(spark, SF_DIR, "part")
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        names = (
            part.select("p_name").distinct()
            .crossJoin(copies)
            .select(F.concat(F.col("p_name"), F.lit(" v"), F.col("_k")).alias("name"))
        )
        n_in = names.count()
        a = names.select(F.col("name").alias("name_a"))
        b = names.select(F.col("name").alias("name_b"))
        pairs = (
            fuzzy_join_blocked(a, b, "name_a", "name_b", max_distance=2)
            .filter(F.col("name_a") < F.col("name_b"))
            .select(F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b"))
        )
        return connected_components(pairs), n_in

    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        # CC iterates with a checksum action per round, so construction
        # belongs inside the timer
        t0 = time.time()
        cc, n_in = fuzzy_clusters(kk)
        cc.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_in,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_in * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["fuzzy_name_clusters"] = res

    # 8. Declarative expectations: N row-level checks fuse into ONE scan
    # + 1-row shuffle, plus a unique groupBy and a subset anti-join —
    # per-INPUT-row cost must stay flat (output is always a tiny frame).
    from cse_datapipeline_and_mls_spark.operators.expectations import (
        Check,
        validate_expectations,
    )

    def quality(kk: int) -> tuple[DataFrame, int]:
        ev = scaled_events(spark, kk)
        users = ev.select(F.col("user_id").alias("u")).distinct()
        checks = [
            Check("value_not_null", "not_null", col="value"),
            Check("value_range", "range", col="value", lo=-1e9, hi=1e9),
            Check("type_in_set", "in_set", col="event_type",
                  values=("click", "view", "buy", "scroll", "login")),
            Check("value_sane", "expr", sql="value = value"),
            Check("event_unique", "unique", cols=("event_id",)),
            Check("user_known", "subset", col="user_id"),
        ]
        return (
            validate_expectations(ev, checks, parents={"user_known": (users, "u")}),
            ev.count(),
        )

    res = {}
    for label, kk in (("1x", 1), (f"{k_events}x", k_events)):
        dq, n_in = quality(kk)
        t0 = time.time()
        dq.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_in,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_in * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_events}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["data_quality_checks"] = res

    # 9. BM25 retrieval: index build (explode + (term,doc) groupBy) +
    # AND-search + top-k. Query-time work is candidate-bounded, so the
    # timed whole (build + search) must stay linear in corpus tokens.
    from cse_datapipeline_and_mls_spark.operators.search import (
        bm25_topk,
        build_inverted_index,
    )

    def bm25(one):
        docs = scaled_docs(spark, 1 if one else k_docs)
        postings, stats = build_inverted_index(docs)
        return bm25_topk(postings, stats, ["vector", "hash", "merge"], k=10, mode="all")

    case(
        "bm25_search_docs",
        bm25,
        n_rows_fn=lambda one: scaled_docs(spark, 1 if one else k_docs).count(),
    )

    # 10. Sketch rollup build + merge: per-(day,type) HLL/KLL/theta
    # sketches then a blob-only re-aggregation — the shuffle carries
    # sketch bytes, so per-INPUT-row cost must stay flat as events scale.
    from cse_datapipeline_and_mls_spark.operators import sketches as SK

    def rollup(one):
        ev = scaled_events(spark, 1 if one else k_events).withColumn(
            "day", F.date_trunc("day", "ts")
        )
        roll = SK.sketch_rollup(ev, ["day", "event_type"], "user_id", "value")
        return SK.merge_sketch_rollup(roll, ["event_type"], quantiles=(0.5, 0.95))

    case(
        "sketch_rollup_events",
        rollup,
        n_rows_fn=lambda one: scaled_events(spark, 1 if one else k_events).count(),
    )

    # 11. MERGE upsert: one full-outer shuffle on the key — per-row cost
    # flat as both sides scale together (the realistic CDC shape).
    from cse_datapipeline_and_mls_spark.operators.relational import merge_upsert

    def upsert(one):
        kk = 1 if one else k_events
        ev = scaled_events(spark, kk)
        target = ev.groupBy("user_id").agg(F.min("value").alias("value"))
        updates = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "value", F.struct("ts", "event_id").alias("_ord"))
        )
        return merge_upsert(target, updates, ["user_id"], set_cols=["value"], order_col="_ord")

    case("merge_upsert_events", upsert)

    # 12. Rolling median/MAD anomaly: 21-row collect_list frame per key —
    # per-row CPU is O(k log k) map work; must not grow with corpus size
    # (window partition count scales with keys, series length constant).
    def rolling_mad(one):
        ev = scaled_events(spark, 1 if one else k_events)
        w = TS.series_window("user_id", ["ts", "event_id"]).rowsBetween(-20, 0)
        arr = F.array_sort(F.collect_list("value").over(w))
        n = F.size(arr)
        med = F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))).otherwise(
            (F.element_at(arr, (n / 2).cast("int")) + F.element_at(arr, (n / 2 + 1).cast("int"))) / 2
        )
        base = ev.withColumn("_vals", arr).withColumn("_med", med)
        return base.select("event_id", "_med")

    case("rolling_mad_events", rolling_mad)

    # Triangle counting over key-shifted copies of the part co-purchase
    # graph (disjoint copies: triangles and wedges scale linearly with
    # copies; per-edge cost must stay flat). Construction runs eager
    # DISK_ONLY localCheckpoints, so build+count is inside the timer.
    from cse_datapipeline_and_mls_spark.operators.graph import triangle_counts

    def copurchase_edges(kk: int) -> DataFrame:
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
        b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
        e = a.join(b, "k").filter(F.col("src") < F.col("dst")).select("src", "dst").distinct()
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return e.crossJoin(copies).select(
            (F.col("src") + F.col("_k") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("_k") * 10_000_000).alias("dst"),
        )

    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        e = copurchase_edges(kk)
        n_edges = e.count()
        t0 = time.time()
        triangle_counts(e).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_edges,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_edges * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["triangle_copurchase_edges"] = res

    # Interval-overlap join on key-shifted copies of per-user session
    # intervals. Copies shift users, NOT time, so bucket occupancy grows
    # with copies — the honest skew direction (more concurrent sessions
    # per time window). Denominator = CANDIDATE PAIRS the bucket join
    # must examine (grows ~quadratically in concurrency by the problem's
    # nature); flat per-candidate cost = the equi-join plan is doing
    # exactly the irreducible work.
    from cse_datapipeline_and_mls_spark.operators.relational import interval_overlap_join

    def session_intervals(kk: int) -> DataFrame:
        ev = scaled_events(spark, kk).select("event_id", "user_id", "ts")
        from pyspark.sql import Window as W

        w = TS.series_window("user_id", ["ts", "event_id"])
        gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        cum = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
            W.unboundedPreceding, 0
        )
        return (
            ev.select("user_id", "ts", F.sum(new_sess).over(cum).alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        )

    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        sess = session_intervals(kk).localCheckpoint(eager=True)
        a = sess.select(
            F.col("user_id").alias("ua"), F.col("sid").alias("sa"),
            F.col("t0").alias("a_t0"), F.col("t1").alias("a_t1"),
        )
        b = sess.select(
            F.col("user_id").alias("ub"), F.col("sid").alias("sb"),
            F.col("t0").alias("b_t0"), F.col("t1").alias("b_t1"),
        )
        pairs = interval_overlap_join(a, b, "a_t0", "a_t1", "b_t0", "b_t1", 1800)
        n_pairs = pairs.count()
        t0 = time.time()
        pairs.filter(F.col("ua") < F.col("ub")).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_pairs,
            "sec": round(sec, 2),
            "us_per_row": round(sec / max(n_pairs, 1) * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["session_overlap_pairs"] = res

    # 13. MinHash banded candidate generation (VERDICT r5 #2): the
    # band-bucket fan-out is the one place a skewed shingle set could
    # recreate all-pairs. The " copyK" suffix makes copies distinct but
    # CROSS-COPY near-dups real (a doc and its other-copy twin differ
    # in one word), so the true pair set grows ~k² while input grows k —
    # deliberately adversarial for banding. Per-OUTPUT-PAIR cost must
    # stay flat-or-falling: the measured r6 run handled the ~1000×
    # pair blowup at per-pair cost FALLING 31622→256 µs (ratio 0.01),
    # i.e. cost tracked the candidate set, never n².
    # NOTE on partitioning for this and the two cases below: the local
    # sf0.1 documents table is ONE parquet file, so the map-side
    # signature/tokenize stages of a crossJoin-scaled copy would run as
    # a single task — measuring one thread, not the plan. A corpus at
    # the simulated scale arrives as many files/partitions; repartition
    # to defaultParallelism at BOTH scales to measure the real shape.
    par_docs = max(spark.sparkContext.defaultParallelism, 1)
    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        pairs = D.minhash_neardup_pairs(
            scaled_docs(spark, kk).repartition(par_docs),
            "text", "doc_id", jaccard_threshold=0.5
        )
        n_pairs = pairs.count()
        sec = timed(pairs)
        res[label] = {
            "rows": n_pairs,
            "sec": round(sec, 2),
            "us_per_row": round(sec / max(n_pairs, 1) * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["minhash_banded_pairs"] = res

    # 14. BPE distinct-word re-encode (VERDICT r5 #2): merges train ONCE
    # on the bounded frequency dict; the re-encode cost that could grow
    # is the DISTINCT-word broadcast. Disjoint copies multiply the
    # corpus while the vocabulary stays ~constant, so per-INPUT-row
    # cost must stay flat (the broadcast is vocab-sized, the corpus
    # side is one exploded equi-join + keyed agg).
    merges = X.train_bpe_merges(scaled_docs(spark, 1), n_merges=50)
    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        docs_k = scaled_docs(spark, kk).repartition(par_docs)
        n_in = docs_k.count()
        sec = min(
            timed(X.bpe_token_counts(docs_k, merges)),
            timed(X.bpe_token_counts(docs_k, merges)),
        )
        res[label] = {
            "rows": n_in,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_in * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["bpe_reencode_docs"] = res

    # 15. BM25 under STOP-LIKE terms (VERDICT r5 #2): query terms are
    # the corpus's 3 most frequent words, so the OR-mode candidate set
    # touches corpus-sized posting lists — posting-list skew in the
    # hybrid-search BM25 leg. Per-INPUT-row cost must stay flat: the
    # union of postings touched is linear in corpus size, and the
    # per-term document-frequency agg is map-side combined.
    words_expr = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"[ \t\n\r]+", " "), " "
    )
    stop_terms = [
        r["w"]
        for r in scaled_docs(spark, 1)
        .select(F.explode(words_expr).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(3)
        .collect()
    ]

    def bm25_stop(one):
        docs_k = scaled_docs(spark, 1 if one else k_graph).repartition(par_docs)
        postings, stats = build_inverted_index(docs_k)
        return bm25_topk(postings, stats, stop_terms, k=10, mode="any")

    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        one = label == "1x"
        n_in = scaled_docs(spark, 1 if one else k_graph).count()
        sec = min(timed(bm25_stop(one)), timed(bm25_stop(one)))
        res[label] = {
            "rows": n_in,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_in * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["bm25_stopterm_search"] = res

    # 16. SKEWED-key join (VERDICT r5 #3): 30% of fact rows land on ONE
    # join key (the rest uniform) — the first smoke case that measures
    # an actual hot key rather than disjoint uniform copies. Three
    # variants over the same materialized inputs, broadcast disabled so
    # the join genuinely shuffles:
    #   plain_noaqe  — sort-merge join, AQE skew splitting OFF: the hot
    #                  key's partition serializes on one task.
    #   plain_aqe    — AQE skew splitting ON with thresholds lowered to
    #                  local-scale sizes; the final plan must show the
    #                  split (isSkew/skew=true) for the trigger claim.
    #   salted       — the explicit salted_equi_join rewrite (32
    #                  buckets), AQE splitting off to isolate it.
    from cse_datapipeline_and_mls_spark.operators.relational import salted_equi_join

    def build_skew_inputs():
        # REBUILT per variant: the AQE skew rule reads its knobs from
        # the conf state in effect when the checkpointed input frames
        # are CONSTRUCTED — measured deterministically on this build
        # (5/5 splits with confs set before localCheckpoint, 0/3 with
        # the same sets issued after), so toggling skewJoin.enabled on
        # shared inputs would silently measure the wrong variant.
        ev = scaled_events(spark, k_events)
        fact = ev.select(
            F.when(F.col("event_id") % 10 < 3, F.lit(0))
            .otherwise(F.col("user_id"))
            .alias("k"),
            "event_id",
            "value",
            "props",
        ).localCheckpoint(eager=True)
        dim = (
            fact.select(F.col("k").alias("dk"))
            .distinct()
            .withColumn("w", F.col("dk") * 2.0)
            .localCheckpoint(eager=True)
        )
        return fact, dim

    conf_prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        )
    }
    res = {"hot_key_share": 0.3}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # thresholds sized to the local shuffle (hot partition ~30 MB,
        # median ~3 MB); production uses the 256 MB defaults
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
        )

        def run_variant(mode: str, skew_enabled: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_enabled else "false",
            )
            fact, dim = build_skew_inputs()
            res.setdefault("rows", fact.count())
            best, triggered = float("inf"), False
            for _ in range(2):
                if mode == "salted":
                    j = salted_equi_join(
                        fact, dim, "k", "dk", discriminator=F.col("event_id"),
                        salt_buckets=32,
                    )
                else:
                    j = fact.join(dim, fact["k"] == dim["dk"])
                # execute THROUGH the DataFrame's own QueryExecution:
                # AQE finalizes (and records skew splits in) the plan of
                # the execution that actually ran — a separate write
                # QueryExecution would leave this one un-finalized
                qe = j._jdf.queryExecution()
                t0 = time.time()
                qe.toRdd().count()
                best = min(best, time.time() - t0)
                triggered = triggered or (
                    "skew=true" in qe.executedPlan().toString()
                )
            return round(best, 2), triggered

        res["plain_noaqe_sec"], _ = run_variant("plain", False)
        res["plain_aqe_sec"], res["aqe_skew_split_triggered"] = run_variant(
            "plain", True
        )
        res["salted_sec"], _ = run_variant("salted", False)
        res["salted_speedup_vs_plain"] = (
            round(res["plain_noaqe_sec"] / res["salted_sec"], 2)
            if res["salted_sec"]
            else None
        )
        res["aqe_speedup_vs_plain"] = (
            round(res["plain_noaqe_sec"] / res["plain_aqe_sec"], 2)
            if res["plain_aqe_sec"]
            else None
        )
    finally:
        for k, v in conf_prev.items():
            spark.conf.set(k, v)
    out["skewed_join_hot_key"] = res

    # 18. k-core peeling (r6): rounds x (degree agg + 2 semi-joins) on
    # the sparse repeat-co-purchase graph. Disjoint copies leave the
    # round count unchanged (each copy peels identically), so per-EDGE
    # cost must stay flat as |E| scales with copies.
    from cse_datapipeline_and_mls_spark.operators.graph import k_core, label_propagation

    def sparse_edges(kk: int) -> DataFrame:
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        bk = li.distinct()
        a = bk.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
        b = bk.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
        e = (
            a.join(b, "k")
            .filter(F.col("src") < F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
            .select("src", "dst")
        )
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return e.crossJoin(copies).select(
            (F.col("src") + F.col("_k") * 10_000_000).alias("src"),
            (F.col("dst") + F.col("_k") * 10_000_000).alias("dst"),
        )

    from cse_datapipeline_and_mls_spark.operators.graph import wl_refinement

    for case_name, op in (
        ("kcore_sparse_edges", lambda e: k_core(e, k=2, max_rounds=10)),
        ("label_propagation_edges", lambda e: label_propagation(e, rounds=4)),
        ("wl_refinement_edges", lambda e: wl_refinement(e, rounds=2)),
    ):
        res = {}
        for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
            e = sparse_edges(kk)
            n_edges = e.count()
            t0 = time.time()
            op(e).write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            res[label] = {
                "rows": n_edges,
                "sec": round(sec, 2),
                "us_per_row": round(sec / n_edges * 1e6, 3),
            }
        res["per_row_ratio"] = round(
            res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
        )
        out[case_name] = res

    # 18b. Multi-source BFS (r7): per-round frontier join + anti-join.
    # Disjoint copies multiply components; seeds are replicated per
    # copy (base graph's 5 smallest node ids, matched by residue), so
    # every copy explores the same radius — per-edge cost must stay
    # ~flat, proving the frontier work scales with |reached|, not with
    # rounds x |V|.
    from cse_datapipeline_and_mls_spark.operators.graph import bfs_hops

    base_nodes = sparse_edges(1)
    base5 = [
        r["node"]
        for r in base_nodes.select(F.col("src").alias("node"))
        .unionByName(base_nodes.select(F.col("dst").alias("node")))
        .distinct()
        .orderBy("node")
        .limit(5)
        .collect()
    ]
    res = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        e = sparse_edges(kk)
        n_edges = e.count()
        seeds = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .filter((F.col("node") % 10_000_000).isin(base5))
        )
        t0 = time.time()
        bfs_hops(e, seeds, max_rounds=4).write.format("noop").mode(
            "overwrite"
        ).save()
        sec = time.time() - t0
        res[label] = {
            "rows": n_edges,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_edges * 1e6, 3),
        }
    res["per_row_ratio"] = round(
        res[f"{k_graph}x"]["us_per_row"] / res["1x"]["us_per_row"], 2
    )
    out["bfs_hops_edges"] = res

    # 18c. Distributed prefix sum over the grouped-by-value frame (the
    # Mann-Whitney midrank spine): input copies multiply the first
    # groupBy's rows but the distinct-value frame saturates, so
    # per-INPUT-row cost must fall or stay flat — the evidence that the
    # range-partition + broadcast-offset pass never becomes the
    # bottleneck as the fact table grows.
    from cse_datapipeline_and_mls_spark.operators.relational import (
        distributed_prefix_sum,
    )

    def prefix_sum_ranks(one):
        ev = scaled_events(spark, 1 if one else k_events)
        g = ev.groupBy(F.col("value").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        return distributed_prefix_sum(g, ["v"], ["n"])

    def prefix_sum_input_rows(one):
        return scaled_events(spark, 1 if one else k_events).count()

    case("prefix_sum_value_ranks", prefix_sum_ranks, n_rows_fn=prefix_sum_input_rows)

    # 19. Cross-source contamination matrix (r6): one gram shuffle into
    # per-gram source sets, O(sources^2) matrix out. Doc copies multiply
    # gram rows; source count is FIXED, so per-input-doc cost must stay
    # flat (the matrix never grows with the corpus).
    from cse_datapipeline_and_mls_spark.queries import QUERIES as _Q

    def contamination(one):
        docs = scaled_docs(spark, 1 if one else k_docs).select(
            "source", "doc_id", "text"
        )
        gram_sources = (
            D.shingle(docs, "text", n=3)
            .select("source", F.explode("shingles").alias("g"))
            .groupBy("g")
            .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
            .select("srcs")
        )
        pair_pairs = F.filter(
            F.flatten(
                F.transform(
                    "srcs",
                    lambda x: F.transform(
                        "srcs", lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda pr: pr["a"] < pr["b"],
        )
        return (
            gram_sources.select(F.explode(pair_pairs).alias("p"))
            .select(F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b"))
            .groupBy("src_a", "src_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )

    case(
        "source_contamination_docs",
        contamination,
        n_rows_fn=lambda one: scaled_docs(spark, 1 if one else k_docs).count(),
    )

    # 20a. Segment-level corpus dedup (r7 curation batch): map-side
    # segmenting + one md5-keyed groupBy-min + join back + per-doc
    # rollup. The unique-per-copy corpus keeps the segment key space
    # growing with the data — per-row cost must stay flat even though
    # the first-occurrence table is corpus-sized.
    def seg_dedup(one):
        return X.segment_dedup_audit(scaled_docs(spark, 1 if one else k_docs))

    case("segment_dedup_docs", seg_dedup)

    # 20b. Deterministic Poisson bootstrap (r7): 20x map-side explode +
    # md5 weight per (row, replicate) + ONE 20-group agg. Output is a
    # fixed 20 rows, so cost is reported per INPUT row; linearity here
    # proves the explode never shuffles and the agg stays map-side.
    def bootstrap(one):
        ev = scaled_events(spark, 1 if one else k_events)
        reps = ev.select(
            "event_id", "value", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        )
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("boot:"),
                            F.col("rep").cast("string"),
                            F.lit(":"),
                            F.col("event_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        )
        wt = (
            F.when(u < 0.36787944117144233, 0)
            .when(u < 0.7357588823428847, 1)
            .when(u < 0.9196986029286058, 2)
            .when(u < 0.9810118431238462, 3)
            .when(u < 0.9963401531726563, 4)
            .when(u < 0.9994058151824183, 5)
            .otherwise(6)
        )
        return (
            reps.select("rep", "value", wt.alias("wt"))
            .groupBy("rep")
            .agg((F.sum(F.col("wt") * F.col("value")) / F.sum("wt")).alias("m"))
        )

    case(
        "bootstrap_poisson_events",
        bootstrap,
        n_rows_fn=lambda one: scaled_events(spark, 1 if one else k_events).count(),
    )

    # 20. Hub-skewed LPA round (r7, VERDICT r6 #6): one node on ~30% of
    # raw edges. The per-round neighbor-label join is node-keyed, so the
    # hub concentrates one join partition — exactly the stage the
    # skewed_join_hot_key methodology measures, now on the real LPA
    # round body (2 joins + (node,label) count + per-node argmax).
    # Variants (inputs REBUILT per variant — AQE reads its knobs at
    # input-build/localCheckpoint time, same gotcha as case 17):
    #   plain_noaqe — LPA round as written, skew split off
    #   plain_aqe   — AQE skew-join split, thresholds sized to the
    #                 local shuffle; plan must show skew=true
    #   salted      — both neighbor joins through salted_equi_join(32)
    # k_core's hub exposure differs: its degree agg is protected by
    # map-side partial aggregation and its semi-joins have the same
    # salting answer as the LPA join, so LPA is the binding case.
    def build_lpa_inputs():
        E, n_nodes = 2_000_000, 1_000_000
        base = spark.range(E)
        raw = base.select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n_nodes)) + 1)
            .alias("src"),
            (F.pmod(F.col("id") * 40503 + 7, F.lit(n_nodes)) + 1).alias("dst"),
        )
        und = (
            raw.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = (
            und.select(F.col("a").alias("node"))
            .unionByName(und.select(F.col("b").alias("node")))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        return und, labels

    def lpa_round(und, labels, mode: str):
        if mode == "salted":
            j_b = salted_equi_join(
                und,
                labels.select(F.col("node").alias("b"), "lbl"),
                "b",
                "b",
                discriminator=F.col("a"),
                salt_buckets=32,
            ).select(F.col("a").alias("node"), "lbl")
            j_a = salted_equi_join(
                und,
                labels.select(F.col("node").alias("a"), "lbl"),
                "a",
                "a",
                discriminator=F.col("b"),
                salt_buckets=32,
            ).select(F.col("b").alias("node"), "lbl")
        else:
            j_b = und.join(
                labels.select(F.col("node").alias("b"), "lbl"), "b"
            ).select(F.col("a").alias("node"), "lbl")
            j_a = und.join(
                labels.select(F.col("node").alias("a"), "lbl"), "a"
            ).select(F.col("b").alias("node"), "lbl")
        nbr = j_b.unionByName(j_a)
        cnt = nbr.groupBy("node", "lbl").agg(F.count(F.lit(1)).alias("c"))
        w = SqlWindow.partitionBy("node").orderBy(F.desc("c"), F.asc("lbl"))
        return (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "lbl")
        )

    from pyspark.sql import Window as SqlWindow

    from cse_datapipeline_and_mls_spark.operators.relational import (  # noqa: F811
        salted_equi_join,
    )

    conf_prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        )
    }
    res = {"hub_raw_edge_share": 0.3}
    try:
        # labels must NOT broadcast (production |V| won't), and the
        # skew thresholds are sized to the local shuffle like case 17
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
        )

        def run_lpa_variant(mode: str, skew_enabled: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_enabled else "false",
            )
            und, labels = build_lpa_inputs()
            res.setdefault("edges", und.count())
            best, triggered = float("inf"), False
            for _ in range(2):
                j = lpa_round(und, labels, mode)
                qe = j._jdf.queryExecution()
                t0 = time.time()
                qe.toRdd().count()
                best = min(best, time.time() - t0)
                triggered = triggered or (
                    "skew=true" in qe.executedPlan().toString()
                )
            return round(best, 2), triggered

        res["plain_noaqe_sec"], _ = run_lpa_variant("plain", False)
        res["plain_aqe_sec"], res["aqe_skew_split_triggered"] = run_lpa_variant(
            "plain", True
        )
        res["salted_sec"], _ = run_lpa_variant("salted", False)
        res["salted_speedup_vs_plain"] = (
            round(res["plain_noaqe_sec"] / res["salted_sec"], 2)
            if res["salted_sec"]
            else None
        )
        res["aqe_speedup_vs_plain"] = (
            round(res["plain_noaqe_sec"] / res["plain_aqe_sec"], 2)
            if res["plain_aqe_sec"]
            else None
        )
    finally:
        for k, v in conf_prev.items():
            spark.conf.set(k, v)
    out["lpa_round_hub_skew"] = res

    # 21. Hub-skewed HITS iteration (r8, VERDICT r7 #3): the same
    # 30%-hub graph and variant methodology as case 20, round body =
    # one full HITS iteration (src-keyed score join + dst agg, then
    # dst-keyed join + src agg). Structurally the score "dim" is
    # |V|-sized like LPA's label frame, so dim-replication salting is
    # expected to LOSE for the same reason; AQE skew split is the
    # mitigation of record. Inputs rebuilt per variant (AQE conf is
    # captured at localCheckpoint time).
    def build_hits_inputs():
        E, n_nodes = 2_000_000, 1_000_000
        base = spark.range(E)
        raw = (
            base.select(
                F.when(F.col("id") % 10 < 3, F.lit(0))
                .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n_nodes)) + 1)
                .alias("src"),
                (F.pmod(F.col("id") * 40503 + 7, F.lit(n_nodes)) + 1).alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        scores = (
            raw.select(F.col("src").alias("node"))
            .unionByName(raw.select(F.col("dst").alias("node")))
            .distinct()
            .select("node", F.lit(1.0).alias("s"))
            .localCheckpoint(eager=True)
        )
        return raw, scores

    def hits_iter(e, scores, mode: str):
        if mode == "salted":
            j1 = salted_equi_join(
                e,
                scores.withColumnRenamed("node", "src"),
                "src",
                "src",
                discriminator=F.col("dst"),
                salt_buckets=32,
            )
        else:
            j1 = e.join(scores.withColumnRenamed("node", "src"), "src")
        auth = (
            j1.groupBy("dst").agg(F.sum("s").alias("s")).withColumnRenamed("dst", "node")
        )
        if mode == "salted":
            j2 = salted_equi_join(
                e,
                auth.withColumnRenamed("node", "dst"),
                "dst",
                "dst",
                discriminator=F.col("src"),
                salt_buckets=32,
            )
        else:
            j2 = e.join(auth.withColumnRenamed("node", "dst"), "dst")
        return j2.groupBy("src").agg(F.sum("s").alias("s"))

    res_h = {"hub_raw_edge_share": 0.3}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
        )

        def run_hits_variant(mode: str, skew_enabled: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_enabled else "false",
            )
            e, scores = build_hits_inputs()
            res_h.setdefault("edges", e.count())
            best, triggered = float("inf"), False
            for _ in range(2):
                j = hits_iter(e, scores, mode)
                qe = j._jdf.queryExecution()
                t0 = time.time()
                qe.toRdd().count()
                best = min(best, time.time() - t0)
                triggered = triggered or ("skew=true" in qe.executedPlan().toString())
            return round(best, 2), triggered

        res_h["plain_noaqe_sec"], _ = run_hits_variant("plain", False)
        res_h["plain_aqe_sec"], res_h["aqe_skew_split_triggered"] = run_hits_variant(
            "plain", True
        )
        res_h["salted_sec"], _ = run_hits_variant("salted", False)
        res_h["aqe_speedup_vs_plain"] = (
            round(res_h["plain_noaqe_sec"] / res_h["plain_aqe_sec"], 2)
            if res_h["plain_aqe_sec"]
            else None
        )
        res_h["salted_speedup_vs_plain"] = (
            round(res_h["plain_noaqe_sec"] / res_h["salted_sec"], 2)
            if res_h["salted_sec"]
            else None
        )
    finally:
        for k, v in conf_prev.items():
            spark.conf.set(k, v)
    out["hits_iter_hub_skew"] = res_h

    # 22. Hub-skewed BFS round (r8, VERDICT r7 #3): the frontier
    # CONTAINS the hub (the worst round — its adjacency is 30% of raw
    # edges), round body = frontier-keyed equi-join + distinct + anti-
    # join vs settled. BFS differs from LPA/HITS in both directions:
    # (a) the production default is a BROADCAST frontier (frontier-
    # sized, not |V|-sized), which sidesteps the hot key entirely — no
    # edge shuffle exists to skew; (b) if the frontier ever outgrows
    # broadcast, dim-replication salting IS viable here (the dim is
    # the frontier, 32x a small set is cheap), unlike the |V|-sized
    # label/score dims of cases 20/21.
    def build_bfs_inputs():
        E, n_nodes = 2_000_000, 1_000_000
        base = spark.range(E)
        raw = base.select(
            F.when(F.col("id") % 10 < 3, F.lit(0))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n_nodes)) + 1)
            .alias("src"),
            (F.pmod(F.col("id") * 40503 + 7, F.lit(n_nodes)) + 1).alias("dst"),
        )
        und = (
            raw.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        und = (
            und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .localCheckpoint(eager=True)
        )
        # hub + 999 ordinary nodes: a realistic mid-expansion frontier
        frontier = (
            spark.range(1000)
            .select(F.when(F.col("id") == 0, F.lit(0)).otherwise(F.col("id") * 997).alias("a"))
            .localCheckpoint(eager=True)
        )
        settled = frontier.select(F.col("a").alias("node")).localCheckpoint(eager=True)
        return und, frontier, settled

    def bfs_round(und, frontier, settled, mode: str):
        if mode == "salted":
            j = salted_equi_join(
                und, frontier, "a", "a", discriminator=F.col("b"), salt_buckets=32
            )
        else:
            j = und.join(frontier, "a")
        return (
            j.select(F.col("b").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
        )

    res_b = {"hub_raw_edge_share": 0.3, "frontier_rows": 1000}
    try:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m"
        )

        def run_bfs_variant(mode: str, skew_enabled: bool, broadcast: bool):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_enabled else "false",
            )
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                "10485760" if broadcast else "-1",
            )
            und, frontier, settled = build_bfs_inputs()
            res_b.setdefault("edges", und.count())
            best, triggered = float("inf"), False
            for _ in range(2):
                j = bfs_round(und, frontier, settled, mode)
                qe = j._jdf.queryExecution()
                t0 = time.time()
                qe.toRdd().count()
                best = min(best, time.time() - t0)
                triggered = triggered or ("skew=true" in qe.executedPlan().toString())
            return round(best, 2), triggered

        res_b["broadcast_sec"], _ = run_bfs_variant("plain", False, True)
        res_b["plain_noaqe_sec"], _ = run_bfs_variant("plain", False, False)
        res_b["plain_aqe_sec"], res_b["aqe_skew_split_triggered"] = run_bfs_variant(
            "plain", True, False
        )
        res_b["salted_sec"], _ = run_bfs_variant("salted", False, False)
        res_b["aqe_speedup_vs_plain"] = (
            round(res_b["plain_noaqe_sec"] / res_b["plain_aqe_sec"], 2)
            if res_b["plain_aqe_sec"]
            else None
        )
        res_b["salted_speedup_vs_plain"] = (
            round(res_b["plain_noaqe_sec"] / res_b["salted_sec"], 2)
            if res_b["salted_sec"]
            else None
        )
    finally:
        for k, v in conf_prev.items():
            spark.conf.set(k, v)
    out["bfs_round_hub_skew"] = res_b

    # 24. r9 model-evaluation family: the deterministic score build +
    # 10-bin calibration agg — map-side expression work + one 10-key
    # partial-aggregated shuffle. The flattest shape in the engine;
    # any ratio drift here means the md5/conv expression chain stopped
    # fusing into the scan.
    def _scored_scaled(one):
        ev = scaled_events(spark, 1 if one else k_events)
        h = (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
        )
        z = (F.col("value") - 50.0) / 30.0 + ((h % 2001) - 1000) / F.lit(1000.0)
        return ev.select(
            "event_id",
            "event_type",
            F.when(F.col("value") >= 50.0, 1).otherwise(0).cast("long").alias("y"),
            (F.lit(0.5) + z / (2.0 * (1.0 + F.abs(z)))).alias("s"),
        )

    def calibration(one):
        sc = _scored_scaled(one)
        return sc.groupBy(F.floor(F.col("s") * 10).cast("long").alias("bin")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )

    case(
        "mleval_calibration_events",
        calibration,
        n_rows_fn=lambda one: scaled_events(spark, 1 if one else k_events).count(),
    )

    # 25. Exact rank-AUC where the score is per-row unique, so the
    # group-by-score spine is DATA-SIZED — the hard direction for the
    # prefix-sum rank machinery (value-ranks above collapse ties; this
    # case can't). Flat per-input-row cost = the two-phase range
    # partition absorbs a data-sized ordered spine.
    def rank_auc(one):
        sc = _scored_scaled(one)
        g = sc.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("np"),
        )
        c = distributed_prefix_sum(g, ["s"], ["n"])
        return c.agg(
            F.sum("np").cast("long").alias("n1"),
            F.sum("n").cast("long").alias("ntot"),
            F.sum(F.col("np") * (2 * F.col("cum_n") + F.col("n") + 1))
            .cast("long")
            .alias("r1x2"),
        )

    case(
        "rank_auc_unique_scores_events",
        rank_auc,
        n_rows_fn=lambda one: scaled_events(spark, 1 if one else k_events).count(),
    )

    # 26. Katz integer walk counts on the scaled co-purchase graph —
    # pagerank's per-iteration exchange shape with int64 payloads.
    from cse_datapipeline_and_mls_spark.operators.graph import katz_centrality

    res_k = {}
    for label, kk in (("1x", 1), (f"{k_graph}x", k_graph)):
        e_half = copurchase_edges(kk)
        e_sym = e_half.unionByName(
            e_half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        n_edges = e_sym.count()
        t0 = time.time()
        katz_centrality(e_sym, iters=4).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res_k[label] = {
            "rows": n_edges,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n_edges * 1e6, 3),
        }
    res_k["per_row_ratio"] = round(
        res_k[f"{k_graph}x"]["us_per_row"] / res_k["1x"]["us_per_row"], 2
    )
    out["katz_walks_copurchase_edges"] = res_k

    # 27. Item-kNN recommendations over key-shifted copies of the
    # purchase graph (orders AND customers shift together, so each copy
    # is an independent marketplace — per-copy work is constant and the
    # total must scale linearly). Stresses the bounded pair build, the
    # per-item truncation window, and the candidate join's 20x cap.
    def item_knn(one):
        kk = 1 if one else k_graph
        o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        o = o.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("_k") * 100_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_k") * 10_000_000).alias("o_custkey"),
        )
        li = li.crossJoin(spark.range(kk).select(F.col("id").alias("_k2"))).select(
            (F.col("l_orderkey") + F.col("_k2") * 100_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_k2") * 10_000_000).alias("l_partkey"),
        )
        from pyspark.sql import Window as W

        pur = (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
            .distinct()
        )
        a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
        b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
        pairs = (
            a.join(b, "k")
            .filter(F.col("pa") != F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).cast("long").alias("co"))
        )
        topnb = (
            pairs.withColumn(
                "nrn", F.row_number().over(W.partitionBy("pa").orderBy(F.desc("co"), "pb"))
            )
            .filter(F.col("nrn") <= 20)
            .drop("nrn")
        )
        cand = (
            pur.join(topnb, pur["part"] == topnb["pa"])
            .groupBy("cust", "pb")
            .agg(F.sum("co").cast("long").alias("score"))
            .withColumnRenamed("pb", "part")
        )
        fresh = cand.join(pur, ["cust", "part"], "left_anti")
        return fresh.withColumn(
            "rnk", F.row_number().over(W.partitionBy("cust").orderBy(F.desc("score"), "part"))
        ).filter(F.col("rnk") <= 3)

    def item_knn_input_rows(one):
        kk = 1 if one else k_graph
        return load_table(spark, SF_DIR, "lineitem").count() * kk

    res_i = {}
    for label, one in (("1x", True), (f"{k_graph}x", False)):
        df = item_knn(one)
        n = item_knn_input_rows(one)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        res_i[label] = {
            "rows": n,
            "sec": round(sec, 2),
            "us_per_row": round(sec / n * 1e6, 3),
        }
    res_i["per_row_ratio"] = round(
        res_i[f"{k_graph}x"]["us_per_row"] / res_i["1x"]["us_per_row"], 2
    )
    out["item_knn_recs_lineitem"] = res_i

    # 28. Bloom prefilter probe over scaled events keyed by user_id —
    # the bit build is dim-sized, probing is distinct-key-sized, and
    # the row filter is a broadcast semi-join: per-row cost must stay
    # flat because nothing here shuffles the fact table at all.
    def bloom_probe(one):
        ev = scaled_events(spark, 1 if one else k_events)
        dim = ev.filter(F.col("user_id") % 4 == 0).select(F.col("user_id").alias("k")).distinct()
        three = F.array(F.lit(1), F.lit(2), F.lit(3))

        def bbit(j_col, k_col):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(j_col.cast("string"), F.lit(":"), k_col.cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 131072
            )

        bits = (
            dim.select(F.explode(three).alias("j"), "k")
            .select(bbit(F.col("j"), F.col("k")).alias("bit"))
            .distinct()
        )
        keys = ev.select(F.col("user_id").alias("k")).distinct()
        probed = (
            keys.select("k", F.explode(three).alias("j"))
            .withColumn("bit", bbit(F.col("j"), F.col("k")))
            .join(
                F.broadcast(bits.withColumnRenamed("bit", "hit_bit")),
                F.col("bit") == F.col("hit_bit"),
                "left",
            )
            .groupBy("k")
            .agg(
                F.sum(F.when(F.col("hit_bit").isNotNull(), 1).otherwise(0))
                .cast("long")
                .alias("hits")
            )
        )
        pass_keys = probed.filter(F.col("hits") == 3).select("k")
        return ev.join(F.broadcast(pass_keys), ev["user_id"] == pass_keys["k"], "left_semi")

    case(
        "bloom_prefilter_events",
        bloom_probe,
        n_rows_fn=lambda one: scaled_events(spark, 1 if one else k_events).count(),
    )

    # 30. Boilerplate CUT over scaled docs (r10): corpus-scan-shaped —
    # segmenting scan + (source,h) distinct-doc count + hit join +
    # bounded per-doc collect + higher-order filter. Per-row cost must
    # stay flat: nothing here is corpus×corpus. Copy-suffixed text
    # means each copy's segments are distinct, so the boilerplate SET
    # grows with the corpus the way real site chrome does per domain.
    def boilerplate_cut(one):
        from cse_datapipeline_and_mls_spark.operators.text import (
            remove_source_boilerplate,
        )

        docs = scaled_docs(spark, 1 if one else k_docs)
        return remove_source_boilerplate(docs, "text", "doc_id", "source")

    case("boilerplate_cut_docs", boilerplate_cut)

    # 31. Gram-free PCA power iteration over scaled embeddings (r10):
    # per iteration one map-side dot + a posexplode 64-group agg — the
    # posexplode fans rows×64, so per-INPUT-row cost is the honest
    # denominator and must stay flat (nothing materializes the Gram).
    def scaled_emb(kk: int) -> DataFrame:
        emb = load_table(spark, SF_DIR, "embeddings").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("_k") * 10_000_000).alias("vec_id"),
            "embedding",
        )

    def pca_power(one):
        from cse_datapipeline_and_mls_spark.operators.similarity import (
            pca_power_topvec,
        )

        return pca_power_topvec(scaled_emb(1 if one else k_docs), dim=64, iters=3)

    case(
        "pca_power_embeddings",
        pca_power,
        n_rows_fn=lambda one: scaled_emb(1 if one else k_docs).count(),
    )

    # 32. Grid-bucketed spatial radius join (r10): k key-shifted copies
    # of the customer points rescatter under the md5 coordinates, so
    # point DENSITY grows k-fold on the fixed map — the honest
    # constant-local-workload scale-up shrinks the radius (and with it
    # the cell) by sqrt(k), keeping expected neighbors-per-point fixed.
    # Flat per-INPUT-row cost then proves the join does work
    # proportional to true local density (a cross join would read k x
    # flat-degrading here; the 3x3 probe guarantees no lost pairs —
    # tests/test_geo.py proves completeness against brute force).
    def scaled_points(kk: int) -> DataFrame:
        cust = load_table(spark, SF_DIR, "customer").select("c_custkey")
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return cust.crossJoin(copies).select(
            (F.col("c_custkey") + F.col("_k") * 10_000_000).alias("c_custkey")
        )

    def geo_radius(one):
        from cse_datapipeline_and_mls_spark.operators.geo import radius_pairs

        kk = 1 if one else k_graph
        return radius_pairs(
            scaled_points(kk), "c_custkey", radius_deg=3.0 / kk**0.5
        )

    case(
        "geo_radius_join_points",
        geo_radius,
        n_rows_fn=lambda one: scaled_points(1 if one else k_graph).count(),
    )

    out["item_knn_hub_topk"] = hub_topk_smoke(spark)

    return out


def hub_topk_smoke(spark) -> dict:
    """Two hub sizes, so the single-task-sort penalty's GROWTH is the
    readout (one point can't distinguish 'plain wins' from 'plain wins
    until the hub outgrows a task'): at ~8M hub neighbors the plain
    window wins (the extra two-phase exchange costs more than a small
    single-task sort); at ~38M the two plans reach parity; past
    single-task memory (the mega-hub regime this smoke exists for,
    unreachable under the 8 GiB local heap — the 90M-row build itself
    OOMs) the plain plan has no valid physical execution at all while
    two-phase scales with the salt width. See SCALE.md's item-kNN
    hub-skew row for the posture."""
    res = {
        "hub_8m": _hub_topk_once(spark, n_rows=16_000_000, hub_tenths=5),
        "hub_38m": _hub_topk_once(spark, n_rows=48_000_000, hub_tenths=8),
    }
    res["two_phase_relative_cost_trend"] = [
        round(res[k]["two_phase_sec"] / res[k]["plain_sec"], 2)
        for k in ("hub_8m", "hub_38m")
    ]
    return res


def _hub_topk_once(spark, n_rows: int, hub_tenths: int) -> dict:
    # 29. Hub-skewed item-kNN neighbor truncation (r10, VERDICT r9 #2):
    # ml_item_cooccurrence_recs keeps each item's top-20 co-purchase
    # neighbors via row_number over Window.partitionBy(pa). The window
    # input is the PRE-AGGREGATED (pa, pb, co) pair-count table (the
    # groupBy upstream already collapsed purchase multiplicity), so the
    # hot partition is hub-item-DISTINCT-NEIGHBOR-sized — at TPC-H skew
    # that is bounded by the ≤7-lines-per-order pair fan-out, but a
    # mega-hub catalog item co-purchased with a large share of the
    # catalog concentrates its full neighbor row set on ONE task (AQE
    # skew-join splitting does NOT apply: this is a window exchange,
    # not a join). Mitigation measured here: two-phase top-k — per
    # (pa, salt) top-20 first (64-way hash salt on pb), then top-20 of
    # the ≤ 20·64 per-item survivors. Semantics-preserving BY
    # CONSTRUCTION (every global-top-20 row is in its salt bucket's
    # top-20; deterministic (desc co, pb) total order on the deduped
    # input), asserted by a full-output checksum equality.
    def build_hub_pairs(n_rows: int = n_rows, hub_tenths: int = hub_tenths):
        # n_rows pair rows; the hub (pa=0) carries hub_tenths/10 of
        # them with all-distinct neighbor ids — the worst window
        # partition (a mega-hub's neighbor set approaches catalog size,
        # so at default sizing ~8M rows sort on ONE task in the plain
        # plan while every other partition is ~40 rows).
        base = spark.range(n_rows)
        raw = base.select(
            F.when(F.col("id") % 10 < hub_tenths, F.lit(0))
            .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(200_000)) + 1)
            .alias("pa"),
            F.when(F.col("id") % 10 < hub_tenths, F.col("id") * 7 + 1)
            .otherwise(F.pmod(F.col("id") * 40503 + 7, F.lit(1_000_000)) + 1)
            .alias("pb"),
            (F.pmod(F.col("id") * 65537, F.lit(9973)) + 1).alias("c"),
        )
        return (
            raw.filter(F.col("pa") != F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.sum("c").cast("long").alias("co"))
            .localCheckpoint(eager=True)
        )

    from pyspark.sql import Window as SqlWindow

    def topk_plain(pairs):
        w = SqlWindow.partitionBy("pa").orderBy(F.desc("co"), "pb")
        return (
            pairs.withColumn("nrn", F.row_number().over(w))
            .filter(F.col("nrn") <= 20)
            .drop("nrn")
        )

    def topk_two_phase(pairs, buckets: int = 64):
        salted = pairs.withColumn("_salt", F.pmod(F.xxhash64("pb"), F.lit(buckets)))
        w1 = SqlWindow.partitionBy("pa", "_salt").orderBy(F.desc("co"), "pb")
        survivors = (
            salted.withColumn("nrn", F.row_number().over(w1))
            .filter(F.col("nrn") <= 20)
            .drop("nrn", "_salt")
        )
        w2 = SqlWindow.partitionBy("pa").orderBy(F.desc("co"), "pb")
        return (
            survivors.withColumn("nrn", F.row_number().over(w2))
            .filter(F.col("nrn") <= 20)
            .drop("nrn")
        )

    def _checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("pa") * 31 + F.col("pb")).alias("s1"),
            F.sum("co").alias("s2"),
        ).collect()[0]
        return (r["n"], r["s1"], r["s2"])

    res_k = {"hub_raw_share": hub_tenths / 10.0, "raw_rows": n_rows}
    hub_pairs = build_hub_pairs()
    res_k["pair_rows"] = hub_pairs.count()
    res_k["hub_distinct_neighbors"] = hub_pairs.filter(F.col("pa") == 0).count()
    for label, fn in (("plain", topk_plain), ("two_phase", topk_two_phase)):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(hub_pairs).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        res_k[f"{label}_sec"] = round(best, 2)
    res_k["two_phase_speedup_vs_plain"] = (
        round(res_k["plain_sec"] / res_k["two_phase_sec"], 2)
        if res_k["two_phase_sec"]
        else None
    )
    res_k["outputs_identical"] = _checksum(topk_plain(hub_pairs)) == _checksum(
        topk_two_phase(hub_pairs)
    )
    return res_k


def run_r12(spark, k: int = 10) -> dict:
    """VERDICT r11 #4: linearity smokes for the round's most expensive
    registry rows (x_triangle_copurchase already has one —
    triangle_copurchase_edges above). Same protocol as run(): key-
    shifted disjoint copies stand in for a larger SF; per-input-row
    cost must stay ~flat at kx."""
    out: dict = {}

    # A. agg_randomization_test: ONE md5 per row -> 20 nibble-derived
    # relabelings -> 40-key partial agg. The explode rides map-side, so
    # per-input-row cost must be flat (the r12 single-md5 rework's
    # scale evidence).
    def scaled_li(kk: int) -> DataFrame:
        li = load_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag"
        )
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        return li.crossJoin(copies).select(
            (F.col("l_orderkey") + F.col("_k") * 10_000_000_000).alias("l_orderkey"),
            "l_linenumber",
            "l_extendedprice",
            "l_returnflag",
        )

    def randomization(kk: int) -> DataFrame:
        li = scaled_li(kk).select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("grp"),
        )
        obs = li.agg(
            F.sum(F.when(F.col("grp") == 1, F.col("cents")).otherwise(0)).cast("long").alias("s1"),
            F.sum("grp").cast("long").alias("n1"),
            F.sum(F.when(F.col("grp") == 0, F.col("cents")).otherwise(0)).cast("long").alias("s0"),
            F.sum(1 - F.col("grp")).cast("long").alias("n0"),
        )
        hashed = li.select(
            "cents",
            F.md5(F.concat(F.col("l_orderkey").cast("string"), F.lit("-"),
                           F.col("l_linenumber").cast("string"))).alias("hx"),
        )
        g = (F.conv(F.expr("substring(hx, rep + 1, 1)"), 16, 10).cast("bigint") % 2).alias("g")
        reps = hashed.select(
            "cents", "hx", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep")
        ).select("rep", "cents", g)
        rstat = reps.groupBy("rep").agg(
            F.sum(F.when(F.col("g") == 1, F.col("cents")).otherwise(0)).cast("long").alias("s1"),
            F.sum("g").cast("long").alias("n1"),
            F.sum(F.when(F.col("g") == 0, F.col("cents")).otherwise(0)).cast("long").alias("s0"),
            F.sum(1 - F.col("g")).cast("long").alias("n0"),
        )
        adiff = F.abs(F.col("s1").cast("double") / F.col("n1")
                      - F.col("s0").cast("double") / F.col("n0"))
        d = rstat.select(adiff.alias("adiff"))
        o = obs.select(adiff.alias("adiff_obs"))
        return d.crossJoin(F.broadcast(o)).agg(
            F.sum(F.when(F.col("adiff") >= F.col("adiff_obs"), 1).otherwise(0)).alias("n_extreme")
        )

    res: dict = {}
    for label, kk in (("1x", 1), (f"{k}x", k)):
        n_in = scaled_li(kk).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            randomization(kk).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        res[label] = {"rows": n_in, "sec": round(best, 2),
                      "us_per_row": round(best / n_in * 1e6, 3)}
    res["per_row_ratio"] = round(res[f"{k}x"]["us_per_row"] / res["1x"]["us_per_row"], 2)
    out["randomization_test_lineitem"] = res

    # B. x_dedup_survivors chain: exact-jaccard pairs -> connected
    # components -> quality-ranked survivor window. Copies are made
    # CONTENT-DISJOINT by tagging every word with the copy id (a mere
    # suffix doc would leave each doc near-identical to its other-copy
    # twins -> pair count grows k², which is the minhash smoke's
    # adversarial case, not this one): pairs/clusters then scale
    # linearly with copies and per-input-doc cost must stay flat.
    from cse_datapipeline_and_mls_spark.operators import dedup as D12
    from cse_datapipeline_and_mls_spark.operators import text as X12
    from pyspark.sql import Window as W12

    def disjoint_docs(kk: int) -> DataFrame:
        docs = load_table(spark, SF_DIR, "documents")
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("_"), F.col("_k").cast("string")),
            ),
            " ",
        )
        return docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("_k") * 10_000_000).alias("doc_id"),
            tagged.alias("text"),
        )

    def survivors(kk: int) -> DataFrame:
        docs = disjoint_docs(kk)
        pairs = D12.ngram_jaccard_pairs(
            docs, "text", "doc_id", n=3, threshold=0.3, max_rows=None
        ).select("id_a", "id_b")
        labels = D12.connected_components(pairs)
        q = docs.select("doc_id", X12.quality_score("text").alias("quality"))
        joined = q.join(
            labels.select(F.col("node").alias("doc_id"), F.col("label").alias("_cl")),
            "doc_id", "left",
        ).select("doc_id", F.coalesce("_cl", "doc_id").alias("cluster_id"), "quality")
        w = W12.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
        return joined.withColumn("is_survivor", (F.row_number().over(w) == 1).cast("int"))

    res = {}
    for label, kk in (("1x", 1), (f"{k}x", k)):
        n_in = disjoint_docs(kk).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            survivors(kk).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        res[label] = {"rows": n_in, "sec": round(best, 2),
                      "us_per_row": round(best / n_in * 1e6, 3)}
    res["per_row_ratio"] = round(res[f"{k}x"]["us_per_row"] / res["1x"]["us_per_row"], 2)
    out["dedup_survivors_docs"] = res

    # C. KEEP IN SYNC with queries/ml_q.py ml_item_recs_incremental
    # (the source of truth) and bench.py's production leg.
    # ml_item_recs_incremental's REFRESH leg (steps 1-4: delta pair
    # build, count merge, touched-only re-truncation, purchase union)
    # with the persisted corpus state pre-materialized OUTSIDE the
    # timer, the way production reads it. Corpus and delta scale
    # together (disjoint key-shifted copies); per-total-input-row cost
    # must stay flat — the merge and re-window are keyed on (pa, pb) /
    # pa, never corpus re-pairs.
    from pyspark import StorageLevel

    def scaled_ol(kk: int):
        o = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("day")
        )
        li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
        copies = spark.range(kk).select(F.col("id").alias("_k"))
        o_k = o.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("_k") * 10_000_000_000).alias("o_orderkey"),
            (F.col("o_custkey") + F.col("_k") * 1_000_000_000).alias("o_custkey"),
            "day",
        )
        li_k = li.crossJoin(copies).select(
            (F.col("l_orderkey") + F.col("_k") * 10_000_000_000).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_k") * 1_000_000_000).alias("l_partkey"),
        )
        return o_k, li_k

    def pair_counts(li: DataFrame, orders_side: DataFrame) -> DataFrame:
        side_li = li.join(
            orders_side.select("o_orderkey"),
            li["l_orderkey"] == orders_side["o_orderkey"], "left_semi",
        )
        a = side_li.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("pa"))
        b = side_li.select(F.col("l_orderkey").alias("kk"), F.col("l_partkey").alias("pb"))
        return (
            a.join(b, "kk").filter(F.col("pa") != F.col("pb"))
            .groupBy("pa", "pb").agg(F.count(F.lit(1)).cast("long").alias("co"))
        )

    res = {}
    for label, kk in (("1x", 1), (f"{k}x", k)):
        o_k, li_k = scaled_ol(kk)
        n_in = li_k.count()
        cutoff = o_k.agg(F.date_sub(F.max("day"), 30).alias("c")).collect()[0]["c"]
        corpus_o = o_k.filter(F.col("day") <= F.lit(cutoff)).localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
        delta_o = o_k.filter(F.col("day") > F.lit(cutoff)).localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
        wn = W12.partitionBy("pa").orderBy(F.desc("co"), "pb")
        corpus_pairs = pair_counts(li_k, corpus_o).localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )
        corpus_topnb = (
            corpus_pairs.withColumn("nrn", F.row_number().over(wn))
            .filter(F.col("nrn") <= 20).drop("nrn")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )
        corpus_pur = (
            corpus_o.join(li_k, corpus_o["o_orderkey"] == li_k["l_orderkey"])
            .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
            .distinct()
            .localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)
        )

        def refresh() -> DataFrame:
            delta_pairs = pair_counts(li_k, delta_o)
            merged = (
                corpus_pairs.unionByName(delta_pairs)
                .groupBy("pa", "pb").agg(F.sum("co").cast("long").alias("co"))
            )
            touched = delta_pairs.select("pa").distinct()
            topnb = corpus_topnb.join(touched, "pa", "left_anti").unionByName(
                merged.join(touched, "pa", "left_semi")
                .withColumn("nrn", F.row_number().over(wn))
                .filter(F.col("nrn") <= 20).drop("nrn")
            )
            delta_pur = (
                delta_o.join(li_k, delta_o["o_orderkey"] == li_k["l_orderkey"])
                .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
                .distinct()
            )
            pur = corpus_pur.unionByName(delta_pur).distinct()
            # materialize BOTH refresh outputs (new neighbor table +
            # new purchase set) through one sink
            return topnb.unionByName(
                pur.select(F.col("cust").alias("pa"), F.col("part").alias("pb"),
                           F.lit(0).cast("long").alias("co"))
            )

        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            refresh().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        res[label] = {"rows": n_in, "sec": round(best, 2),
                      "us_per_row": round(best / n_in * 1e6, 3)}
    res["per_row_ratio"] = round(res[f"{k}x"]["us_per_row"] / res["1x"]["us_per_row"], 2)
    out["item_recs_incremental_refresh"] = res
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k_events = int(args[0]) if len(args) > 0 else 25
    k_docs = int(args[1]) if len(args) > 1 else 50
    k_graph = int(args[2]) if len(args) > 2 else 10
    spark = get_spark("scale_smoke")
    out = {} if "--r12-only" in sys.argv[1:] else run(spark, k_events, k_docs, k_graph)
    out.update(run_r12(spark, k_graph))
    print(json.dumps({"sf_dir": SF_DIR, "k_events": k_events, "k_docs": k_docs, "k_graph": k_graph, "cases": out}))


if __name__ == "__main__":
    main()
