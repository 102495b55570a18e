"""Streaming pipeline tests: drive real readStream/writeStream queries to
completion via the memory sink and check stream/batch parity (SURVEY §5.2
item 3 — T1-T4 semantics)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark import streaming as ST


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                i,
                base + dt.timedelta(minutes=3 * i + (i % 7)),
                i % 5,
                ["click", "view", "buy"][i % 3],
                float(i % 50),
                "{}",
            )
        )
    # duplicate event_ids to exercise ingest dedup
    rows += rows[:20]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    path = str(tmp_path_factory.mktemp("events_stream"))
    df.repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_bronze_ingest_dedups_event_ids(spark, events_dir):
    stream = ST.ingest_file_stream(spark, events_dir)
    assert stream.isStreaming
    out = ST.run_to_memory_sink(ST.bronze_ingest(stream), "bronze_test")
    assert out.count() == 200  # 220 raw rows, 20 dups dropped
    assert out.select("event_id").distinct().count() == 200


def test_windowed_aggregate_matches_batch(spark, events_dir):
    stream = ST.ingest_file_stream(spark, events_dir)
    got = ST.run_to_memory_sink(
        ST.windowed_aggregate(stream, size="15 minutes"), "tumbling_test", output_mode="complete"
    )
    # batch twin over the SAME expression (dedup first to match bronze? no:
    # windowed_aggregate consumes the raw stream here, so batch uses raw too)
    batch = spark.read.parquet(events_dir)
    want = (
        batch.groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_session_aggregate_runs_and_bounds_sessions(spark, events_dir):
    stream = ST.ingest_file_stream(spark, events_dir)
    out = ST.run_to_memory_sink(
        ST.session_aggregate(stream, gap="10 minutes"), "session_test", output_mode="complete"
    )
    rows = out.collect()
    assert rows, "sessions should materialize"
    for r in rows:
        assert r["session_end"] > r["session_start"]
        assert r["n_events"] >= 1


def test_stateful_running_zscore_matches_batch_twin(spark, events_dir):
    from pyspark.sql import Window

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(ST.running_zscore_anomalies(stream), "stateful_test")
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    std = F.stddev_pop("value").over(w)
    z = (F.col("value") - F.avg("value").over(w)) / std
    want = batch.select(
        "event_id", F.when(std > 0, F.round(z, 6)).otherwise(F.lit(0.0)).alias("z")
    )
    got_map = {r["event_id"]: round(r["running_z"], 6) for r in got.collect()}
    want_map = {r["event_id"]: r["z"] for r in want.collect()}
    assert len(got_map) == 200
    mismatches = {
        k: (got_map[k], want_map[k])
        for k in want_map
        if abs(got_map[k] - want_map[k]) > 1e-6
    }
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    raw = ST.ingest_file_stream(spark, events_dir)
    clicks = raw.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    buys = raw.filter(F.col("event_type") == "buy").select(
        F.col("user_id").alias("user_id_r"), F.col("ts").alias("ts_r"),
        F.col("event_id").alias("buy_id"),
    )
    joined = ST.interval_join(clicks, buys).select("event_id", "buy_id")
    got = sorted(map(tuple, ST.run_to_memory_sink(joined, "ssj_test").collect()))

    b = spark.read.parquet(events_dir)
    bc = b.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    bb = b.filter(F.col("event_type") == "buy").select(
        F.col("user_id").alias("user_id_r"), F.col("ts").alias("ts_r"),
        F.col("event_id").alias("buy_id"),
    )
    want = sorted(
        map(tuple, ST.interval_join(bc, bb).select("event_id", "buy_id").collect())
    )
    assert got and got == want


def test_threshold_alert_filters(spark, events_dir):
    stream = ST.ingest_file_stream(spark, events_dir)
    out = ST.run_to_memory_sink(ST.threshold_alerts(stream, threshold=45.0), "alerts_test")
    vals = [r["alert_value"] for r in out.collect()]
    assert vals and all(v > 45.0 for v in vals)


def test_enrich_stream_matches_batch_join(spark, events_dir):
    dim = spark.createDataFrame(
        [(u, f"segment_{u % 2}") for u in range(5)], "user_id long, segment string"
    )
    stream = ST.ingest_file_stream(spark, events_dir)
    got = ST.run_to_memory_sink(
        ST.enrich_stream(stream, dim, on="user_id"), "enrich_test"
    )
    batch = spark.read.parquet(events_dir).join(dim, "user_id", "left")
    assert got.count() == batch.count()
    g = {(r["event_id"], r["segment"]) for r in got.select("event_id", "segment").collect()}
    w = {(r["event_id"], r["segment"]) for r in batch.select("event_id", "segment").collect()}
    assert g == w
    # stream-static joins are stateless: no watermark/state operators in plan
    assert stream.isStreaming and not dim.isStreaming


def test_dedup_against_history_drops_seen_fingerprints(spark, tmp_path_factory):
    from cse_datapipeline_and_mls_spark.operators.text import doc_fingerprint

    docs = spark.createDataFrame(
        [(i, ["fresh text one", "fresh text two", "already seen doc"][i % 3]) for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("docs_stream"))
    docs.withColumn("fingerprint", doc_fingerprint("text")).repartition(2).write.mode(
        "overwrite"
    ).parquet(path)

    history = spark.createDataFrame([("already seen doc",)], "text string").select(
        doc_fingerprint("text").alias("fingerprint")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, fingerprint long")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    got = ST.run_to_memory_sink(
        ST.dedup_against_history(stream, history), "hist_dedup_test"
    )
    # 10 of 30 docs repeat the historical content; all dropped, rest kept
    assert got.count() == 20
    assert got.filter(F.col("text") == "already seen doc").count() == 0


def test_checkpoint_restart_is_exactly_once(spark, tmp_path_factory):
    """Stop/restart with a checkpoint must process each input file once:
    the file-source offset log + file-sink commit log give end-to-end
    exactly-once for the bronze path — the recovery story a 100 TB
    ingest needs (a restarted job must neither skip nor re-land data)."""
    src = str(tmp_path_factory.mktemp("ckpt_src"))
    out = str(tmp_path_factory.mktemp("ckpt_out"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_state"))

    def run_once():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    run_once()
    first = spark.read.parquet(out).count()
    assert first == 100

    # second batch lands between runs; restart resumes from the offset log
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100, 180)], "doc_id long, text string"
    ).write.mode("append").parquet(src)
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == 180  # nothing skipped, nothing re-landed
    assert back.select("doc_id").distinct().count() == 180


def test_tws_running_distinct_matches_batch_twin(spark, events_dir):
    """transformWithState parity: the TWS running distinct-count equals
    size(collect_set) over the cumulative window. Skips where the TWS
    wire protocol's protobuf dependency is absent (this sandbox); the
    operator then fails fast with an actionable ImportError, which is
    asserted instead so the gate itself stays tested."""
    from pyspark.sql import Window

    from cse_datapipeline_and_mls_spark.streaming import tws

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    if not tws.HAS_PROTOBUF:
        with pytest.raises(ImportError, match="protobuf"):
            tws.running_distinct_types(stream)
        pytest.skip("google.protobuf unavailable: TWS runtime cannot start here")

    got = ST.run_to_memory_sink(tws.running_distinct_types(stream), "tws_test")
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = batch.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_events"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("nd"),
    )
    got_map = {r["event_id"]: (r["n_events"], r["n_distinct_types"]) for r in got.collect()}
    want_map = {r["event_id"]: (r["n_events"], r["nd"]) for r in want.collect()}
    assert got_map == want_map


def test_expectations_on_stream_matches_batch_totals(spark, events_dir):
    """Streaming DQ gate: per-micro-batch validate_expectations via
    foreachBatch; violation counts summed across epochs equal the
    batch-mode counts over the same data."""
    from cse_datapipeline_and_mls_spark.operators.expectations import (
        Check,
        validate_expectations,
    )

    checks = [
        Check("value_in_range", "range", col="value", lo=0.0, hi=30.0),
        Check("type_known", "in_set", col="event_type", values=("click", "view", "buy")),
    ]
    collected: list[dict] = []
    fb = ST.expectations_on_stream(
        checks, on_result=lambda epoch, rows: collected.extend(rows)
    )
    stream = ST.ingest_file_stream(spark, events_dir, max_files_per_trigger=1)
    q = stream.writeStream.foreachBatch(fb).start()
    q.processAllAvailable()
    q.stop()
    assert len({r["epoch_id"] for r in collected}) > 1  # really micro-batched
    stream_totals = {}
    for r in collected:
        stream_totals[r["check_name"]] = stream_totals.get(r["check_name"], 0) + r["n_violations"]
    batch = {
        r["check_name"]: r["n_violations"]
        for r in validate_expectations(spark.read.parquet(events_dir), checks).collect()
    }
    assert stream_totals == batch
    assert batch["value_in_range"] > 0  # fixture has values up to 49
    assert batch["type_known"] == 0


def test_content_dedup_stream_drops_normalized_duplicates(spark, tmp_path):
    """Streaming content dedup: rows whose normalized text fingerprint
    repeats (case/whitespace variants included) are dropped; the
    survivor set matches the batch X1 operator on the same files."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "doc", 0.0, "alpha beta gamma"),
        (2, base + dt.timedelta(minutes=1), 1, "doc", 0.0, "Alpha  beta GAMMA"),  # normalized dup
        (3, base + dt.timedelta(minutes=2), 1, "doc", 0.0, "delta epsilon"),
        (4, base + dt.timedelta(minutes=3), 1, "doc", 0.0, "delta epsilon"),      # exact dup
        (5, base + dt.timedelta(minutes=4), 1, "doc", 0.0, "zeta eta"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    path = str(tmp_path / "docs_stream")
    df.write.mode("overwrite").parquet(path)

    stream = ST.ingest_file_stream(spark, path)
    out = ST.run_to_memory_sink(
        ST.content_dedup_stream(stream, text_col="props"), "content_dedup_test"
    )
    got = {r["props"] for r in out.collect()}
    assert out.count() == 3
    # one survivor per normalized content; which variant survives is
    # arrival-order dependent, so compare normalized forms
    assert {" ".join(p.lower().split()) for p in got} == {
        "alpha beta gamma", "delta epsilon", "zeta eta",
    }

    from cse_datapipeline_and_mls_spark.operators.dedup import exact_dedup_by_content

    batch = exact_dedup_by_content(spark.read.parquet(path), "props", "event_id")
    assert batch.count() == 3


def test_sketch_rollup_stream_matches_batch_and_skips_replay(spark, tmp_path):
    """Two micro-batches fold into the persisted rollup; HLL estimates
    equal a direct whole-data rollup (lossless union), n_rows exact, and
    a replayed batch id is a no-op (the _last_batch high-watermark)."""
    import datetime as dt
    import json

    from cse_datapipeline_and_mls_spark.operators import sketches as SK

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=13 * i), i % 37, ["click", "view"][i % 2], float(i % 29), "{}")
        for i in range(300)
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    all_df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "src")
    roll_path = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    # land batch 1, run the stream, then land batch 2 and drain again
    spark.createDataFrame(rows[:180], schema).write.parquet(src)
    stream = ST.ingest_file_stream(spark, src)
    q = ST.sketch_rollup_stream(stream, roll_path, checkpoint_dir=ckpt)
    q.processAllAvailable()
    spark.createDataFrame(rows[180:], schema).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    rollup = spark.read.parquet(roll_path)
    merged = {
        r["event_type"]: r
        for r in SK.merge_sketch_rollup(rollup, ["event_type"], quantiles=(0.5,)).collect()
    }
    direct_roll = SK.sketch_rollup(
        all_df.withColumn("day", F.date_trunc("day", "ts")),
        ["day", "event_type"], "user_id", "value",
    )
    direct = {
        r["event_type"]: r
        for r in SK.merge_sketch_rollup(direct_roll, ["event_type"], quantiles=(0.5,)).collect()
    }
    assert set(merged) == {"click", "view"}
    for et in merged:
        assert merged[et]["n_rows"] == direct[et]["n_rows"] == 150
        assert merged[et]["n_distinct_est"] == direct[et]["n_distinct_est"]

    # replay protection: calling the upsert again with an old batch id
    # must not change the table (KLL merge / n_rows are not idempotent)
    marker = roll_path.rstrip("/") + "._last_batch"
    last = json.load(open(marker))["batch_id"]
    before = sorted(map(tuple, spark.read.parquet(roll_path).select("day", "event_type", "n_rows").collect()))
    q2 = ST.sketch_rollup_stream(ST.ingest_file_stream(spark, src), roll_path, checkpoint_dir=ckpt)
    q2.processAllAvailable()
    q2.stop()
    after = sorted(map(tuple, spark.read.parquet(roll_path).select("day", "event_type", "n_rows").collect()))
    assert before == after
    assert json.load(open(marker))["batch_id"] == last


def test_inverted_index_stream_matches_batch_index(spark, tmp_path):
    """Streamed index (two micro-batches folded incrementally) must
    equal the one-shot batch index over the same corpus — postings,
    doc_stats, AND the BM25 ranking run against it."""
    from cse_datapipeline_and_mls_spark.operators.search import (
        bm25_topk,
        build_inverted_index,
    )

    docs = [
        (1, "spark shuffle join join"),
        (2, "spark scan"),
        (3, "join filter filter scan"),
        (4, "scan spark spark"),
    ]
    schema = "doc_id long, text string"
    src = str(tmp_path / "docs")
    idx = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(docs[:2], schema).write.parquet(src)
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())])
    stream = spark.readStream.schema(st).parquet(src)
    q = ST.inverted_index_stream(stream, idx, checkpoint_dir=ckpt)
    q.processAllAvailable()
    spark.createDataFrame(docs[2:], schema).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    live_post = spark.read.parquet(idx + "/postings")
    live_stats = spark.read.parquet(idx + "/doc_stats")
    batch_post, batch_stats = build_inverted_index(
        spark.createDataFrame(docs, schema)
    )
    assert sorted(map(tuple, live_post.collect())) == sorted(map(tuple, batch_post.collect()))
    assert sorted(map(tuple, live_stats.collect())) == sorted(map(tuple, batch_stats.collect()))
    live_top = bm25_topk(live_post, live_stats, ["spark"], k=10).collect()
    batch_top = bm25_topk(batch_post, batch_stats, ["spark"], k=10).collect()
    assert [tuple(r) for r in live_top] == [tuple(r) for r in batch_top]


def test_merge_postings_deletion_via_negation(spark):
    from cse_datapipeline_and_mls_spark.operators.search import merge_postings

    existing = spark.createDataFrame(
        [("a", 1, 2), ("b", 1, 1), ("a", 2, 1)], "term string, doc_id long, tf long"
    )
    # remove doc 1 entirely: negate its postings
    delta = spark.createDataFrame(
        [("a", 1, -2), ("b", 1, -1)], "term string, doc_id long, tf long"
    )
    left = {(r["term"], r["doc_id"]): r["tf"] for r in merge_postings(existing, delta).collect()}
    assert left == {("a", 2): 1}


def test_ohlc_stream_matches_batch_bars(spark, events_dir):
    """Streaming OHLC (min_by/max_by tumbling bars) must equal the batch
    tswindow.ohlc_bars result bar-for-bar — F.window aligns to the epoch
    exactly like the batch floor(epoch/secs) bucket, and the ordered
    arg-min/arg-max picks the same fully-tiebroken open/close."""
    from cse_datapipeline_and_mls_spark.operators.tswindow import ohlc_bars

    stream = ST.ingest_file_stream(spark, events_dir)
    got = ST.run_to_memory_sink(
        ST.ohlc_aggregate(stream, size="1 hour"), "ohlc_test", output_mode="complete"
    )
    batch = spark.read.parquet(events_dir).select(
        "user_id", "ts", "value", "event_id"
    )
    want = ohlc_bars(batch, "user_id", "ts", "value", bucket_seconds=3600)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_stream_stream_left_outer_interval_join_matches_batch(spark, events_dir):
    """left_outer interval join: clicks with NO buy inside the window
    must arrive null-padded once the watermark closes their interval —
    the abandonment-feed shape. Stream result must equal the identical
    batch expression row-for-row (including the null-padded rows)."""
    raw = ST.ingest_file_stream(spark, events_dir)
    clicks = raw.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = raw.filter(F.col("event_type") == "buy").select(
        F.col("user_id").alias("user_id_r"), F.col("ts").alias("ts_r"),
        F.col("event_id").alias("buy_id"),
    )
    joined = ST.interval_join(clicks, buys, how="left_outer").select(
        "event_id", "buy_id"
    )
    got = sorted(
        map(tuple, ST.run_to_memory_sink(joined, "ssj_lo_test").collect()),
        key=str,
    )

    b = spark.read.parquet(events_dir)
    bc = b.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    bb = b.filter(F.col("event_type") == "buy").select(
        F.col("user_id").alias("user_id_r"), F.col("ts").alias("ts_r"),
        F.col("event_id").alias("buy_id"),
    )
    batch_rows = (
        ST.interval_join(bc, bb, how="left_outer")
        .select("event_id", "buy_id", "ts")  # ts = the left click's time
        .collect()
    )
    # A null verdict is only FINAL once the watermark passes the click's
    # interval; after the last event the watermark stops advancing, so
    # clicks in the trailing (within + watermark) window stay buffered —
    # the correct streaming semantics, not a bug. Compare exactly:
    # matched rows must agree everywhere; null-padded rows must agree
    # for every click the watermark could close.
    import datetime as _dt

    # the global watermark is the MIN over both inputs of (max event
    # time - 30m); a click can be null-finalized only once its interval
    # end (ts + 15m) is strictly below that
    max_click = max(r["ts"] for r in bc.collect())
    max_buy = max(r["ts_r"] for r in bb.collect())
    wm = min(max_click, max_buy) - _dt.timedelta(minutes=30)
    cutoff = wm - _dt.timedelta(minutes=15)
    want = sorted(
        (r["event_id"], r["buy_id"])
        for r in batch_rows
        if r["buy_id"] is not None or r["ts"] < cutoff
    )
    got_set = set(got)
    assert got_set >= set(want), set(want) - got_set
    # and nothing extra beyond the full batch result
    assert got_set <= {(r["event_id"], r["buy_id"]) for r in batch_rows}
    assert any(buy is None for _, buy in got), "expected abandonment rows"


def _staged_batches(spark, tmp_path_factory, name, batches, schema):
    """Write each batch as one parquet file with strictly increasing
    mtimes so the file source (maxFilesPerTrigger=1, oldest-first)
    replays them as separate micro-batches in order."""
    import os
    import time

    src = str(tmp_path_factory.mktemp(name))
    t0 = time.time() - 1000
    for i, rows in enumerate(batches):
        part = f"{src}/b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(part)
        for root, _dirs, files in os.walk(part):
            for f in files:
                os.utime(os.path.join(root, f), (t0 + 10 * i, t0 + 10 * i))
    return src


def test_windowed_aggregate_drops_late_rows_and_counts_them(spark, tmp_path_factory):
    """VERDICT r5 #4: an event older than the watermark must be DROPPED
    by the windowed aggregation (its window never materializes), and
    the drop must be observable — numRowsDroppedByWatermark via
    run_audited_to_memory_sink, arrival counts via observed()."""
    import datetime as dt

    from cse_datapipeline_and_mls_spark.sources.ingest import observed

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    src = _staged_batches(
        spark,
        tmp_path_factory,
        "late_win",
        # NOTE the extra batch between the watermark-advancing event and
        # the late arrival: since SPARK-40925 the LATE-event filter uses
        # the PREVIOUS batch's watermark (eventTimeWatermarkForLateEvents)
        # while eviction uses the current one, so a row is only counted
        # dropped once the 9:50 watermark is one full batch old.
        [
            [(1, T(10, 0), 1, "click", 1.0, "{}")],          # watermark -> 9:50
            [(3, T(10, 1), 1, "view", 2.0, "{}")],            # on-time; 9:50 now 'old'
            [(2, T(9, 0), 1, "click", 1.0, "{}")],            # LATE: 9:00 < 9:50 -> dropped
            [(4, T(11, 0), 1, "buy", 3.0, "{}")],             # pushes watermark to 10:50
        ],
        schema,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    stream, metric_name = observed(stream, "late_win_audit")
    out, audit = ST.run_audited_to_memory_sink(
        ST.windowed_aggregate(stream, size="5 minutes", watermark="10 minutes"),
        "late_win_test",
    )
    # the late event's window [9:00, 9:05) never appears
    assert out.filter(F.col("window_start") == T(9, 0)).count() == 0
    # the on-time 10:00/10:01 windows finalized once the 11:00 event
    # moved the watermark past them
    assert out.filter(F.col("window_start") == T(10, 0)).count() == 2
    # the state store counted exactly the one late row as dropped
    assert audit["rows_dropped_by_watermark"] == 1
    # observed() saw all 4 arrivals across the micro-batches
    arrived = sum(b[metric_name]["n_rows"] for b in audit["observed"])
    assert arrived == 4
    # the final batch's progress event arrived -> the audit is exact,
    # not a timed-out partial sum (ADVICE r7)
    assert audit["drained"] is True


def test_content_dedup_stream_drops_late_rows_and_counts_them(spark, tmp_path_factory):
    """Same policy check for the streaming dedup: a late row with NEVER-
    SEEN content is still dropped (it is behind the fingerprint state's
    watermark horizon), and the drop is counted."""
    import datetime as dt

    from cse_datapipeline_and_mls_spark.sources.ingest import observed

    T = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    schema = "doc_id long, ts timestamp, props string"
    src = _staged_batches(
        spark,
        tmp_path_factory,
        "late_dedup",
        [
            [(1, T(10, 0), "content A")],                     # watermark -> 9:50
            [(3, T(10, 1), "content C")],                     # on-time; 9:50 now 'old'
            [(2, T(9, 0), "content B")],                      # LATE, fresh content -> dropped
        ],
        schema,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    stream, metric_name = observed(stream, "late_dedup_audit")
    out, audit = ST.run_audited_to_memory_sink(
        ST.content_dedup_stream(stream, text_col="props", watermark="10 minutes"),
        "late_dedup_test",
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == {1, 3}  # late doc 2 excluded despite fresh content
    assert audit["rows_dropped_by_watermark"] == 1
    arrived = sum(b[metric_name]["n_rows"] for b in audit["observed"])
    assert arrived == 3


def test_stateful_cusum_matches_batch_closed_form(spark, events_dir):
    """Streaming CUSUM (literal Page recurrence, one double of state per
    key, carried across micro-batches) equals the batch Lindley closed
    form (tswindow.with_cusum) on the same data with the same fixed
    target/slack; alert decisions agree everywhere."""
    from pyspark.sql import Window

    from cse_datapipeline_and_mls_spark.operators.tswindow import with_cusum

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.cusum_alerts_stream(stream, target=24.0, slack=2.0, threshold=40.0),
        "cusum_test",
    )
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    want = with_cusum(
        batch, "value", w, target=F.lit(24.0), slack=F.lit(2.0), out="cusum"
    ).select("event_id", "cusum")
    got_map = {r["event_id"]: (round(r["cusum"], 6), r["alert"]) for r in got.collect()}
    want_map = {
        r["event_id"]: (round(r["cusum"], 6), "Alert" if r["cusum"] > 40.0 else "Normal")
        for r in want.collect()
    }
    assert len(got_map) == 200
    mismatches = {
        k: (got_map[k], want_map[k])
        for k in want_map
        if abs(got_map[k][0] - want_map[k][0]) > 1e-6 or got_map[k][1] != want_map[k][1]
    }
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_stateful_holt_matches_batch_closed_form(spark, events_dir):
    """Streaming Holt (literal recurrence, O(1) state) == the batch
    eigen-split closed form (tswindow.with_holt_linear) on the same
    per-key (ts, event_id)-ordered series, to float precision."""
    from cse_datapipeline_and_mls_spark.operators.tswindow import with_holt_linear

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.holt_forecast_stream(stream, alpha=0.8, beta=0.2), "holt_stream_test"
    )
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    want = with_holt_linear(
        batch, "value", ["user_id"], ["ts", "event_id"], alpha=0.8, beta=0.2, L=96
    ).select("event_id", "level", "trend", "forecast_1")
    got_map = {
        r["event_id"]: (r["level"], r["trend"], r["forecast_1"]) for r in got.collect()
    }
    want_map = {
        r["event_id"]: (r["level"], r["trend"], r["forecast_1"]) for r in want.collect()
    }
    assert len(got_map) == 200
    mismatches = {
        k: (got_map[k], want_map[k])
        for k in want_map
        if any(abs(a - b) > 1e-7 for a, b in zip(got_map[k], want_map[k]))
    }
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_stateful_attribution_matches_batch_join_form(spark, events_dir):
    """Streaming last-touch attribution (one string of state per user,
    carried across micro-batches) credits every purchase to exactly the
    touch the batch running-count + self-join formulation names
    (VERDICT r7 #6); the aggregated revenue rollup agrees too."""
    from pyspark.sql import Window

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.attribution_stream(stream, convert_type="buy"), "attribution_test"
    )
    got_map = {r["event_id"]: r["touch_type"] for r in got.collect()}

    # batch twin: the registered query's per-purchase credit assignment
    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    ev = batch.withColumn(
        "is_touch", F.when(F.col("event_type").isin("view", "click"), 1).otherwise(0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    g = ev.withColumn("grp", F.sum("is_touch").over(w))
    touches = ev.filter(F.col("is_touch") == 1).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch_type"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    purchases = g.filter(F.col("event_type") == "buy")
    want = purchases.join(
        touches,
        (purchases["user_id"] == touches["t_user"])
        & (purchases["grp"] == touches["rn"]),
        "left",
    ).select("event_id", F.coalesce("touch_type", F.lit("none")).alias("touch_type"))
    want_map = {r["event_id"]: r["touch_type"] for r in want.collect()}
    assert want_map, "expected purchases in the fixture"
    assert got_map == want_map
    # the rollup the batch query publishes matches when run on the sink
    got_roll = {
        (r["touch_type"]): (r["n"], round(r["rev"], 6))
        for r in got.groupBy("touch_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev"))
        .collect()
    }
    want_roll = {
        (r["touch_type"]): (r["n"], round(r["rev"], 6))
        for r in purchases.join(
            touches,
            (purchases["user_id"] == touches["t_user"])
            & (purchases["grp"] == touches["rn"]),
            "left",
        )
        .groupBy(F.coalesce("touch_type", F.lit("none")).alias("touch_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev"))
        .collect()
    }
    assert got_roll == want_roll


def test_stateful_markov_matches_batch_lead_form(spark, events_dir):
    """Streaming transition pairs (previous type as state) equal the
    batch lead() window's pair multiset, and the normalized transition
    matrix built from the stream sink matches the batch query's."""
    from pyspark.sql import Window

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.markov_transitions_stream(stream), "markov_test"
    )
    got_pairs = sorted((r["cur"], r["nxt"]) for r in got.collect())

    batch = spark.read.parquet(events_dir).dropDuplicates(["event_id"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = batch.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    want_pairs = sorted((r["cur"], r["nxt"]) for r in seq.collect())
    assert want_pairs and got_pairs == want_pairs


def test_stateful_page_hinkley_matches_batch_exactly(spark, events_dir):
    """Streaming Page-Hinkley (4 int64s of state per key) reproduces the
    batch w_page_hinkley_drift query BIT-FOR-BIT: both sides iterate the
    same exact-integer micro-unit invariants (running sum, m_t, running
    min), so ph and the alert agree with zero tolerance — the strongest
    stream/batch parity in the detector family."""
    from cse_datapipeline_and_mls_spark.queries import QUERIES

    stream = ST.ingest_file_stream(spark, events_dir).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.page_hinkley_stream(stream, delta=0.5, threshold=50.0),
        "ph_test",
    )
    # batch twin on the SAME rows: the registered query reads a
    # sf-root-shaped dir, so write a DEDUPED copy there (the fixture
    # carries 20 duplicate event_ids the stream's ingest dedup drops)
    import os

    sf_like = os.path.join(os.path.dirname(events_dir), "ph_sf_root")
    tgt = os.path.join(sf_like, "events.parquet")
    if not os.path.exists(tgt):
        spark.read.parquet(events_dir).dropDuplicates(["event_id"]).coalesce(
            1
        ).write.parquet(tgt)
    want = QUERIES["w_page_hinkley_drift"](spark, sf_like)
    got_map = {r["event_id"]: (r["ph"], r["alert"]) for r in got.collect()}
    want_map = {r["event_id"]: (r["ph"], r["alert"]) for r in want.collect()}
    assert len(got_map) == 200
    mismatches = {
        k: (got_map[k], want_map[k])
        for k in want_map
        if got_map[k][0] != want_map[k][0] or got_map[k][1] != want_map[k][1]
    }
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. {list(mismatches.items())[:3]}"


def test_stateful_auc_monitor_matches_batch_exactly(spark, events_dir):
    """VERDICT r9 #6: the streaming AUC monitor's final emission per
    segment must equal the batch ml_auc_monitor_segments query on the
    same rows BIT-for-bit — and unlike the detector family this parity
    needs no ordered delivery at all (histogram folds commute), so the
    stream is deliberately driven one file per micro-batch (4 splits,
    arbitrary arrival order within each)."""
    import os

    from cse_datapipeline_and_mls_spark.queries import QUERIES
    from cse_datapipeline_and_mls_spark.queries.mleval_q import scored_columns

    # dedicated fixture: the shared events_dir has value = i % 50, so
    # y = (value >= 50) is 0 everywhere and AUC is undefined — this one
    # spans both classes in every segment
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=i),
            i % 5,
            ["click", "view", "buy"][i % 3],
            float((i * 37) % 100),
            "{}",
        )
        for i in range(240)
    ]
    auc_dir = os.path.join(os.path.dirname(events_dir), "auc_events")
    if not os.path.exists(auc_dir):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).repartition(4).write.parquet(auc_dir)
    events_dir = auc_dir

    stream = ST.ingest_file_stream(
        spark, events_dir, max_files_per_trigger=1
    ).dropDuplicates(["event_id"])
    got = ST.run_to_memory_sink(
        ST.auc_monitor_stream(scored_columns(stream)), "auc_monitor_test"
    ).collect()
    # final emission per segment = the row with the max running n_seen
    final: dict = {}
    for r in got:
        if r["segment"] not in final or r["n_seen"] > final[r["segment"]]["n_seen"]:
            final[r["segment"]] = r
    # intermediate emissions exist: >1 micro-batch touched each segment
    assert len(got) > len(final)

    sf_like = os.path.join(os.path.dirname(events_dir), "auc_sf_root")
    tgt = os.path.join(sf_like, "events.parquet")
    if not os.path.exists(tgt):
        spark.read.parquet(events_dir).dropDuplicates(["event_id"]).coalesce(
            1
        ).write.parquet(tgt)
    want = {r["segment"]: r for r in QUERIES["ml_auc_monitor_segments"](spark, sf_like).collect()}
    assert set(final) == set(want)
    for seg, w in want.items():
        g = final[seg]
        assert g["n_seen"] == w["n_pos"] + w["n_neg"]
        assert g["n_pos"] == w["n_pos"] and g["n_neg"] == w["n_neg"]
        assert g["auc"] == w["auc"], (seg, g["auc"], w["auc"])
        assert g["gini"] == w["gini"], (seg, g["gini"], w["gini"])


def test_stateful_heavy_hitters_mg_guarantees(spark, events_dir):
    """Misra-Gries heavy hitters: bounds-checked against exact batch
    counts (the bracket-verdict pattern — MG counter values are
    micro-batch-split-dependent, the guarantees are not): every item
    with true frequency > n/(k+1) survives, estimates never exceed
    truth, undercount stays within n/(k+1)."""
    import os

    K = 4
    # skewed items per segment: bucket value so one item dominates
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(600):
        # item "0" takes ~70% of rows in EVERY segment (skew orthogonal
        # to the i%3 segment assignment), the rest spread over 11 items
        v = 0.0 if i % 10 < 7 else float(i % 11 + 1)
        rows.append(
            (i, base + dt.timedelta(minutes=i), i % 5,
             ["click", "view", "buy"][i % 3], v, "{}")
        )
    hh_dir = os.path.join(os.path.dirname(events_dir), "hh_events")
    if not os.path.exists(hh_dir):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).repartition(4).write.parquet(hh_dir)

    stream = ST.ingest_file_stream(spark, hh_dir, max_files_per_trigger=1)
    items = stream.withColumn("item", F.col("value").cast("int").cast("string"))
    got = ST.run_to_memory_sink(
        ST.heavy_hitters_stream(items, k=K), "hh_test"
    ).collect()
    final_n: dict = {}
    for r in got:
        final_n[r["segment"]] = max(final_n.get(r["segment"], 0), r["n_seen"])
    final = {
        (r["segment"], r["item"]): r
        for r in got
        if r["n_seen"] == final_n[r["segment"]]
    }

    truth = {
        (r["event_type"], str(int(r["value"]))): r["c"]
        for r in spark.read.parquet(hh_dir)
        .groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for (seg, item), r in final.items():
        true_c = truth[(seg, item)]
        assert r["est_count"] <= true_c, (seg, item)
        assert true_c - r["est_count"] <= r["max_undercount"], (seg, item)
    # completeness: every true heavy hitter (> n/(k+1)) must be present
    for seg, n in final_n.items():
        for (s2, item), c in truth.items():
            if s2 == seg and c > n // (K + 1):
                assert (seg, item) in final, (seg, item, c, n)
    # the dominant bucket must be the top estimate in every segment
    for seg in final_n:
        top = max(
            (r for (s2, _), r in final.items() if s2 == seg),
            key=lambda r: r["est_count"],
        )
        assert top["item"] == "0"


def test_stateful_detectors_order_across_arrow_chunks():
    """ADVICE r9: a key's micro-batch may arrive split across several
    Arrow chunks in the ``pdfs`` iterator, with chunk boundaries NOT
    aligned to event-time order. The detectors must produce the same
    output as if the whole micro-batch arrived as one ordered frame —
    exercised directly on the generator with a deliberately misaligned
    two-chunk split (the later half of the timeline in the FIRST chunk)."""
    import pandas as pd

    from cse_datapipeline_and_mls_spark.streaming import stateful as S

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self.exists, self._v = True, v

    base = pd.Timestamp("2024-01-01")
    rows = pd.DataFrame(
        {
            "user_id": [1] * 8,
            "event_id": list(range(8)),
            "ts": [base + pd.Timedelta(minutes=i) for i in range(8)],
            "value": [5.0, 9.0, 1.0, 7.0, 3.0, 8.0, 2.0, 6.0],
        }
    )
    # misaligned split: events 4..7 land in the first chunk, 0..3 second
    split = [rows.iloc[4:].reset_index(drop=True), rows.iloc[:4].reset_index(drop=True)]
    whole = [rows.copy()]

    def run(fn_factory):
        outs = []
        for chunks in (whole, [c.copy() for c in split]):
            st = FakeState()
            out = pd.concat(list(fn_factory(iter(chunks), st)), ignore_index=True)
            outs.append(out.sort_values("event_id").reset_index(drop=True))
        return outs

    for factory in (
        lambda p, st: S._score_batches((1,), p, st, 3.0),
        lambda p, st: S._cusum_batches((1,), p, st, 5.0, 0.5, 4.0),
        lambda p, st: S._holt_batches((1,), p, st, 0.8, 0.2),
        lambda p, st: S._page_hinkley_batches((1,), p, st, 0.5e6, 50.0),
    ):
        got_whole, got_split = run(factory)
        pd.testing.assert_frame_equal(got_whole, got_split)


def test_erasure_cascade_stream_matches_batch_and_skips_replay(spark, sf_dir, tmp_path):
    """Two streamed DSAR batches must leave the store exactly where the
    one-shot batch cascade over the union of victims leaves it; the
    audit rows must carry the residual invariant; a restarted query
    re-delivering applied batches must change nothing."""
    import shutil

    store = str(tmp_path / "store")
    src = str(tmp_path / "dsar")
    ckpt = str(tmp_path / "ckpt")
    from cse_datapipeline_and_mls_spark.sources import load_table

    orders0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li0 = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev0 = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    orders0.write.parquet(store + "/orders")
    li0.write.parquet(store + "/lineitem")
    ev0.write.parquet(store + "/events")

    batch1 = [r["o_custkey"] for r in orders0.select("o_custkey").distinct().limit(3).collect()]
    batch2 = [r["o_custkey"] for r in orders0.select("o_custkey").distinct().orderBy(F.desc("o_custkey")).limit(3).collect()]
    spark.createDataFrame([(int(c),) for c in batch1], "c_custkey long").write.parquet(src)

    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store, checkpoint_dir=ckpt
    )
    q.processAllAvailable()
    spark.createDataFrame([(int(c),) for c in batch2], "c_custkey long").write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()

    # batch reference: one-shot cascade over the union of victims
    all_victims = spark.createDataFrame(
        [(int(c),) for c in set(batch1) | set(batch2)], "c_custkey long"
    )
    vo = orders0.join(all_victims, orders0["o_custkey"] == all_victims["c_custkey"], "left_semi")
    ref_orders = orders0.join(
        all_victims, orders0["o_custkey"] == all_victims["c_custkey"], "left_anti"
    )
    ref_li = li0.join(vo, li0["l_orderkey"] == vo["o_orderkey"], "left_anti")
    ref_ev = ev0.join(all_victims, ev0["user_id"] == all_victims["c_custkey"], "left_anti")

    live_orders = spark.read.parquet(store + "/orders")
    live_li = spark.read.parquet(store + "/lineitem")
    live_ev = spark.read.parquet(store + "/events")
    assert live_orders.count() == ref_orders.count()
    assert live_orders.exceptAll(ref_orders).count() == 0
    assert live_li.count() == ref_li.count()
    assert live_ev.count() == ref_ev.count()
    assert live_ev.exceptAll(ref_ev).count() == 0

    audit = spark.read.parquet(store + "/audit").orderBy("batch_id").collect()
    assert len(audit) == 2
    assert all(r["residual_consistent"] for r in audit)
    assert sum(r["n_orders_erased"] for r in audit) == orders0.count() - ref_orders.count()

    # replay with a FRESH checkpoint: Spark re-delivers all source
    # files as batch 0, whose victim fingerprint differs from the
    # applied marker — the sink must REPROCESS (idempotent: 0 rows
    # erased, tables unchanged), never id-skip, because a reset batch
    # can carry brand-new victims
    shutil.rmtree(ckpt)
    before = (live_orders.count(), live_li.count(), live_ev.count())
    q2 = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    q2.processAllAvailable()
    q2.stop()
    after = (
        spark.read.parquet(store + "/orders").count(),
        spark.read.parquet(store + "/lineitem").count(),
        spark.read.parquet(store + "/events").count(),
    )
    assert after == before
    audit2 = spark.read.parquet(store + "/audit").collect()
    replayed = [r for r in audit2 if r["batch_id"] == 0 and r["n_victims"] == 6]
    assert replayed and all(
        r["n_orders_erased"] == 0 and r["residual_consistent"] for r in replayed
    )

    # exact re-delivery of the applied (id, fingerprint) pair must skip:
    # restart on the SAME checkpoint with no new files
    n_audit = len(audit2)
    q3 = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q3.processAllAvailable()
    q3.stop()
    assert spark.read.parquet(store + "/audit").count() == n_audit

    # NEW victim arriving after a checkpoint reset must still be erased
    # (the bug a bare id-watermark has): pick a surviving custkey
    new_victim = spark.read.parquet(store + "/orders").select("o_custkey").first()[0]
    spark.createDataFrame([(int(new_victim),)], "c_custkey long").write.mode(
        "append"
    ).parquet(src)
    q4 = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    q4.processAllAvailable()
    q4.stop()
    assert (
        spark.read.parquet(store + "/orders")
        .filter(F.col("o_custkey") == new_victim)
        .count()
        == 0
    )


def test_erasure_cascade_partition_scoped_rewrite(spark, sf_dir, tmp_path):
    """Partition-scoped erasure (VERDICT r12 #2): on a
    prepare_erasure_store layout, a DSAR batch must (a) leave every
    UNTOUCHED bucket's files byte-identical (same paths, sizes, bytes —
    proof the rewrite never read or wrote them), (b) erase exactly what
    the whole-store batch cascade erases, and (c) delete a touched
    partition dir outright when every row in it belonged to victims."""
    import glob
    import hashlib
    import os

    store = str(tmp_path / "pstore")
    src = str(tmp_path / "dsar")
    from cse_datapipeline_and_mls_spark.sources import load_table

    orders0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li0 = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ev0 = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    B = 64
    ST.prepare_erasure_store(orders0, li0, ev0, store, buckets=B)

    # victims: every customer whose hash lands in bucket 3 → after the
    # batch, orders/o_bucket=3 must be GONE (the all-erased case), plus
    # one customer from another bucket (the partial-rewrite case)
    bucketed = orders0.select(
        "o_custkey", F.pmod(F.hash("o_custkey"), F.lit(B)).alias("b")
    ).distinct()
    bucket3 = [r["o_custkey"] for r in bucketed.filter(F.col("b") == 3).collect()]
    other = bucketed.filter(F.col("b") != 3).first()
    victims = sorted(set(bucket3) | {other["o_custkey"]})
    touched_o_buckets = {3, other["b"]}

    def snap(table):
        return {
            f: (os.path.getsize(f), hashlib.sha1(open(f, "rb").read()).hexdigest())
            for f in glob.glob(f"{store}/{table}/**/*.parquet", recursive=True)
        }

    before = {t: snap(t) for t in ("orders", "lineitem", "events")}
    spark.createDataFrame([(int(c),) for c in victims], "c_custkey long").write.parquet(src)
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()

    # (c) the all-erased bucket directory is gone
    assert not os.path.exists(f"{store}/orders/o_bucket=3")

    # (a) untouched partitions byte-identical
    vb = {r[0] for r in spark.createDataFrame(
        [(int(c),) for c in victims], "c_custkey long"
    ).select(F.pmod(F.hash("c_custkey"), F.lit(B))).distinct().collect()}
    assert vb == touched_o_buckets
    after = {t: snap(t) for t in ("orders", "lineitem", "events")}
    # lineitem's touched buckets derive from the victims' orderkeys
    lb = {
        r[0]
        for r in orders0.join(
            spark.createDataFrame([(int(c),) for c in victims], "c_custkey long"),
            orders0["o_custkey"] == F.col("c_custkey"),
            "left_semi",
        ).select(F.pmod(F.hash("o_orderkey"), F.lit(B))).distinct().collect()
    }
    for t, bcol, touched in (
        ("orders", "o_bucket", vb),
        ("events", "e_bucket", vb),
        ("lineitem", "l_bucket", lb),
    ):
        untouched_before = {
            f: v
            for f, v in before[t].items()
            if not any(f"{bcol}={b}/" in f for b in touched)
        }
        assert untouched_before, f"test must cover untouched partitions for {t}"
        for f, v in untouched_before.items():
            assert after[t].get(f) == v, f"untouched partition file changed: {f}"

    # (b) erased == whole-store batch cascade reference
    vdf = spark.createDataFrame([(int(c),) for c in victims], "c_custkey long")
    ref_orders = orders0.join(vdf, orders0["o_custkey"] == vdf["c_custkey"], "left_anti")
    vo = orders0.join(vdf, orders0["o_custkey"] == vdf["c_custkey"], "left_semi")
    ref_li = li0.join(vo, li0["l_orderkey"] == vo["o_orderkey"], "left_anti")
    ref_ev = ev0.join(vdf, ev0["user_id"] == vdf["c_custkey"], "left_anti")
    live_orders = spark.read.parquet(store + "/orders")
    live_li = spark.read.parquet(store + "/lineitem")
    live_ev = spark.read.parquet(store + "/events")
    assert live_orders.count() == ref_orders.count()
    assert live_orders.select("o_orderkey", "o_custkey").exceptAll(ref_orders).count() == 0
    assert live_li.count() == ref_li.count()
    assert live_ev.count() == ref_ev.count()

    audit = spark.read.parquet(store + "/audit").collect()
    assert len(audit) == 1 and audit[0]["residual_consistent"]
    assert audit[0]["n_orders_erased"] == orders0.count() - ref_orders.count()


def test_erasure_cascade_null_victims_and_recoverable_swap(spark, sf_dir, tmp_path):
    """ADVICE r12: (1) a DSAR batch containing NULL victim ids must not
    kill the stream — nulls are dropped, real victims still cascade;
    (2) a crash between the two legacy-swap renames must be recovered
    on replay — simulate every crash state and assert _recover_swap
    restores a readable table."""
    import os
    import shutil

    from cse_datapipeline_and_mls_spark.sources import load_table

    store = str(tmp_path / "store")
    src = str(tmp_path / "dsar")
    orders0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li0 = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev0 = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    orders0.write.parquet(store + "/orders")
    li0.write.parquet(store + "/lineitem")
    ev0.write.parquet(store + "/events")

    victim = orders0.select("o_custkey").first()[0]
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    spark.createDataFrame(
        [(int(victim),), (None,), (None,)], st
    ).write.parquet(src)
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    ex = q.exception()
    q.stop()
    assert ex is None, f"stream died on NULL victims: {ex}"
    assert spark.read.parquet(store + "/orders").filter(
        F.col("o_custkey") == victim
    ).count() == 0
    audit = spark.read.parquet(store + "/audit").collect()
    assert len(audit) == 1 and audit[0]["n_victims"] == 1

    from cse_datapipeline_and_mls_spark.streaming.pipeline import _recover_swap

    # crash-state recovery: table renamed away, complete stage present
    path = store + "/orders"
    n0 = spark.read.parquet(path).count()
    shutil.copytree(path, path + "._stage")
    os.rename(path, path + "._old")
    _recover_swap(path)
    assert os.path.exists(path) and not os.path.exists(path + "._old")
    assert not os.path.exists(path + "._stage")
    assert spark.read.parquet(path).count() == n0

    # crash-state: stage promoted but old never deleted
    shutil.copytree(path, path + "._old")
    _recover_swap(path)
    assert os.path.exists(path) and not os.path.exists(path + "._old")

    # crash-state: mid-stage-write (table intact, partial stage)
    os.makedirs(path + "._stage", exist_ok=True)
    _recover_swap(path)
    assert os.path.exists(path) and not os.path.exists(path + "._stage")
    assert spark.read.parquet(path).count() == n0


def test_erasure_audit_alerts_stream_batch_parity(spark, tmp_path):
    """The governance monitor must flag exactly the suspicious audit
    rows — broken residual, oversized batch, silent cascade leg — and,
    being stateless, produce identical rows in stream and batch mode."""
    rows = [
        # healthy batch: no alert
        (0, 3, 5, 12, 7, True),
        # broken residual invariant
        (1, 2, 4, 9, 3, False),
        # oversized victim batch
        (2, 5000, 10, 20, 30, True),
        # orders erased but lineitem leg silent
        (3, 2, 6, 0, 4, True),
        # orders erased but events leg silent (ADVICE r13)
        (4, 2, 6, 12, 0, True),
        # reverse: child/log rows erased with ZERO orders (ADVICE r13)
        (5, 2, 0, 5, 3, True),
        # both dependent legs silent at once
        (6, 2, 6, 0, 0, True),
    ]
    schema = (
        "batch_id long, n_victims long, n_orders_erased long, "
        "n_lineitems_erased long, n_events_erased long, residual_consistent boolean"
    )
    audit = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "audit")
    audit.write.parquet(path)

    batch_out = {
        r["batch_id"]: sorted(r["alert_reasons"])
        for r in ST.erasure_audit_alerts(spark.read.parquet(path)).collect()
    }
    assert set(batch_out) == {1, 2, 3, 4, 5, 6}
    assert batch_out[1] == ["residual_broken"]
    assert batch_out[2] == ["victim_volume"]
    assert batch_out[3] == ["lineitem_leg_silent"]
    assert batch_out[4] == ["events_leg_silent"]
    assert batch_out[5] == ["orders_leg_silent"]
    assert batch_out[6] == ["events_leg_silent", "lineitem_leg_silent"]

    stream = spark.readStream.schema(schema).parquet(path)
    got = ST.run_to_memory_sink(ST.erasure_audit_alerts(stream), "erasure_alerts_test")
    stream_out = {
        r["batch_id"]: sorted(r["alert_reasons"]) for r in got.collect()
    }
    assert stream_out == batch_out


def test_erasure_store_int_typed_keys_still_pruned(spark, sf_dir, tmp_path):
    """ADVICE r13: Spark hash() is type-sensitive (hash(int 5) !=
    hash(bigint 5)). A store prepared from INT-typed keys must still be
    pruned correctly by a DSAR batch carrying LONG victim ids — both
    sides hash through the shared cast-to-bigint expression. Pre-fix,
    pruning missed every victim partition while the residual audit
    stayed green (rows silently survived erasure)."""
    from cse_datapipeline_and_mls_spark.sources import load_table

    store = str(tmp_path / "istore")
    src = str(tmp_path / "dsar")
    orders0 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        F.col("o_custkey").cast("int").alias("o_custkey"),
    )
    li0 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("int").alias("l_orderkey")
    )
    ev0 = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("int").alias("user_id"), "event_id"
    )
    ST.prepare_erasure_store(orders0, li0, ev0, store, buckets=16)

    victim = int(orders0.select("o_custkey").first()[0])
    n_victim_orders = orders0.filter(F.col("o_custkey") == victim).count()
    assert n_victim_orders > 0
    spark.createDataFrame([(victim,)], "c_custkey long").write.parquet(src)
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    ex = q.exception()
    q.stop()
    assert ex is None
    assert (
        spark.read.parquet(store + "/orders")
        .filter(F.col("o_custkey") == victim)
        .count()
        == 0
    )
    audit = spark.read.parquet(store + "/audit").collect()
    assert len(audit) == 1
    assert audit[0]["n_orders_erased"] == n_victim_orders
    assert audit[0]["residual_consistent"]


def test_erasure_store_layout_hash_mismatch_fails_loudly(spark, sf_dir, tmp_path):
    """A store whose _layout.json lacks (or disagrees on) the
    key_hash_cast convention must kill the DSAR stream with a loud
    error — pruning a mismatched layout would silently skip victim
    partitions (ADVICE r13)."""
    import json
    import os

    from cse_datapipeline_and_mls_spark.sources import load_table

    store = str(tmp_path / "mstore")
    src = str(tmp_path / "dsar")
    orders0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li0 = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev0 = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    ST.prepare_erasure_store(orders0, li0, ev0, store, buckets=8)
    # simulate a pre-fix store: strip the recorded hashing convention
    with open(os.path.join(store, "_layout.json")) as fh:
        layout = json.load(fh)
    del layout["key_hash_cast"]
    with open(os.path.join(store, "_layout.json"), "w") as fh:
        json.dump(layout, fh)

    victim = int(orders0.select("o_custkey").first()[0])
    spark.createDataFrame([(victim,)], "c_custkey long").write.parquet(src)
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        ex = q.exception()
    except Exception as caught:  # processAllAvailable may surface it directly
        ex = caught
    finally:
        q.stop()
    assert ex is not None and "key_hash_cast" in str(ex)
    # and nothing was erased from the store
    assert spark.read.parquet(store + "/orders").filter(
        F.col("o_custkey") == victim
    ).count() > 0


def test_partition_rewrite_crash_recovery(spark, sf_dir, tmp_path):
    """ADVICE r13: dynamic partition overwrite commits delete-then-move
    per partition, so a crash inside commitJob can lose a touched
    bucket's surviving rows. The rewrite snapshots touched dirs to
    '._bak' first; _recover_partition_rewrite must restore every crash
    state byte-identically, and the DSAR replay must then converge."""
    import glob
    import hashlib
    import os
    import shutil

    from cse_datapipeline_and_mls_spark.sources import load_table
    from cse_datapipeline_and_mls_spark.streaming.pipeline import (
        _backup_touched_partitions,
        _recover_partition_rewrite,
    )

    store = str(tmp_path / "cstore")
    orders0 = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li0 = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    ev0 = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    ST.prepare_erasure_store(orders0, li0, ev0, store, buckets=16)
    path = store + "/orders"

    def snap():
        return {
            f: hashlib.sha1(open(f, "rb").read()).hexdigest()
            for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
        }

    before = snap()
    touched = [3, 5]
    # crash state 1: backup complete, commitJob wiped one touched bucket
    # and left partial output in another
    _backup_touched_partitions(path, "o_bucket", touched)
    shutil.rmtree(f"{path}/o_bucket=3")
    for f in glob.glob(f"{path}/o_bucket=5/*.parquet")[:1]:
        os.remove(f)
    _recover_partition_rewrite(path)
    assert snap() == before
    assert not os.path.exists(path + "._bak")

    # crash state 2: mid-snapshot ('._bak.tmp') — live table untouched,
    # tmp must be discarded
    _backup_touched_partitions(path, "o_bucket", [3])
    os.rename(path + "._bak", path + "._bak.tmp")
    _recover_partition_rewrite(path)
    assert snap() == before
    assert not os.path.exists(path + "._bak.tmp")

    # crash state 3: a touched bucket that had NO pre-existing dir got
    # partial output — recovery must remove it entirely
    ghost = 9999  # bucket id outside the real layout
    _backup_touched_partitions(path, "o_bucket", [ghost])
    os.makedirs(f"{path}/o_bucket={ghost}", exist_ok=True)
    with open(f"{path}/o_bucket={ghost}/part-junk.parquet", "wb") as fh:
        fh.write(b"partial")
    _recover_partition_rewrite(path)
    assert not os.path.exists(f"{path}/o_bucket={ghost}")
    assert snap() == before

    # end to end: leave a crash state behind, then run a real DSAR batch
    # — the sink's recovery pass must roll back before pruning, and the
    # batch must converge to the whole-store cascade reference
    victim = int(orders0.select("o_custkey").first()[0])
    _backup_touched_partitions(path, "o_bucket", touched)
    shutil.rmtree(f"{path}/o_bucket=3")
    src = str(tmp_path / "dsar")
    spark.createDataFrame([(victim,)], "c_custkey long").write.parquet(src)
    from pyspark.sql import types as T

    st = T.StructType([T.StructField("c_custkey", T.LongType())])
    q = ST.erasure_cascade_stream(
        spark.readStream.schema(st).parquet(src), store,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    ex = q.exception()
    q.stop()
    assert ex is None
    vdf = spark.createDataFrame([(victim,)], "c_custkey long")
    ref = orders0.join(vdf, orders0["o_custkey"] == vdf["c_custkey"], "left_anti")
    live = spark.read.parquet(path)
    assert live.count() == ref.count()
    assert live.select("o_orderkey", "o_custkey").exceptAll(ref).count() == 0
    assert not os.path.exists(path + "._bak")
