"""Misra–Gries heavy hitters: containment + bracket guarantees vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import sketches as SK
from cse_datapipeline_and_mls_spark.sources import load_table

K = 64


def _token_df(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ").alias(
            "tokens"
        )
    )


def test_mg_sketch_contains_all_guaranteed_heavy_hitters(spark, sf_dir):
    toks = _token_df(spark, sf_dir)
    sketch = {r["item"]: r for r in SK.frequent_items(toks, "tokens", k=K).collect()}
    exact = {
        r["item"]: r["n"]
        for r in toks.select(F.explode("tokens").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n = sum(exact.values())
    threshold = n / (K + 1)
    missed = [t for t, c in exact.items() if c > threshold and t not in sketch]
    assert not missed, f"guaranteed-frequent tokens missing from sketch: {missed[:5]}"
    # every survivor's bracket contains its true count
    for item, row in sketch.items():
        assert row["lo"] <= exact[item] <= row["hi"], (
            item,
            row["lo"],
            exact[item],
            row["hi"],
        )


def test_mg_fold_bounds_memory_and_total_error(spark):
    """Adversarial single-partition stream: sketch size stays ≤ k and the
    undercount obeys n/(k+1) even when most items are unique."""
    from collections import Counter

    k = 8
    stream = (["hot"] * 50) + [f"u{i}" for i in range(100)] + (["warm"] * 20)
    mg: dict = {}
    SK._mg_fold(mg, Counter(stream), k)
    assert len(mg) <= k
    n = len(stream)
    assert mg.get("hot", 0) >= 50 - n / (k + 1)
    assert mg.get("warm", 0) >= 20 - n / (k + 1)


# ---------------------------------------------------------------------------
# Mergeable sketch rollups (DataSketches HLL / KLL / theta)
# ---------------------------------------------------------------------------


def test_hll_rollup_merge_is_lossless(spark, sf_dir):
    """Union of per-day HLL sketches must give the SAME estimate as one
    whole-table sketch (same lgK -> register-wise max merge, lossless) —
    the property that makes incremental rollup tables trustworthy."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    roll = SK.sketch_rollup(ev, ["day", "event_type"], "user_id", "value")
    merged = SK.merge_sketch_rollup(roll, ["event_type"]).collect()
    direct = {
        r["event_type"]: r["nd"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("nd"))
        .collect()
    }
    assert merged, "empty rollup"
    for r in merged:
        assert r["n_distinct_est"] == direct[r["event_type"]], r


def test_rollup_estimates_within_brackets(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    roll = SK.sketch_rollup(ev, ["day", "event_type"], "user_id", "value")
    merged = {
        r["event_type"]: r
        for r in SK.merge_sketch_rollup(
            roll, ["event_type"], quantiles=(0.5, 0.95)
        ).collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.count(F.lit(1)).alias("n"),
            F.percentile(
                "value", F.array(*[F.lit(x) for x in (0.47, 0.53, 0.92, 0.98)])
            ).alias("p"),
        )
        .collect()
    }
    for et, m in merged.items():
        e = exact[et]
        assert m["n_rows"] == e["n"]
        assert abs(m["n_distinct_est"] - e["nd"]) <= 0.02 * e["nd"]
        # KLL rank-band check: estimate lands between exact q∓0.03 quantiles
        assert e["p"][0] <= m["q50_est"] <= e["p"][1], (et, m["q50_est"], e["p"])
        assert e["p"][2] <= m["q95_est"] <= e["p"][3], (et, m["q95_est"], e["p"])


def test_kll_fold_merge_stays_in_rank_band_across_partitionings(spark):
    """Fold-merging the per-group KLL blobs compacts (randomized, so
    bit-equality across merge orders is NOT guaranteed) — what must hold
    under any partitioning is the published rank bound: the merged p50
    estimate stays inside the exact q∓0.03 band (k=200 → ~1.65% rank
    error at 99% confidence)."""
    rows = [(i % 7, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, val double")
    for nparts in (1, 7, 32):
        roll = SK.sketch_rollup(
            df.repartition(nparts), ["g"], distinct_col="g", value_col="val"
        )
        m = SK.merge_sketch_rollup(roll, [], quantiles=(0.5,)).collect()[0]
        assert 470.0 <= m["q50_est"] <= 530.0, (nparts, m["q50_est"])


def test_theta_overlap_exact_on_small_sets(spark):
    """Below the theta nominal-entries threshold the sketch keeps every
    hash -> union/intersection estimates are exact."""
    rows = [("a", u) for u in range(100)] + [("b", u) for u in range(50, 180)]
    df = spark.createDataFrame(rows, "seg string, uid bigint")
    r = SK.distinct_overlap(df, "seg", "uid").collect()[0]
    assert r["n_partitions"] == 2
    assert round(r["n_union_est"]) == 180
    assert round(r["n_intersection_est"]) == 50


def test_sketch_rollup_without_value_col(spark):
    df = spark.createDataFrame([(1, 10), (1, 11), (2, 10)], "g int, uid int")
    roll = SK.sketch_rollup(df, ["g"], distinct_col="uid")
    assert "kll" not in roll.columns
    m = {r["g"]: r for r in SK.merge_sketch_rollup(roll, ["g"]).collect()}
    assert m[1]["n_distinct_est"] == 2 and m[2]["n_distinct_est"] == 1


def test_rolling_distinct_matches_direct_union(spark):
    """Each day's trailing-7 fold must equal a direct HLL over the raw
    union of those days (lossless pairwise union) — exact-mode sizes so
    estimates are exact counts."""
    rows = [(d, d * 10 + u) for d in range(1, 11) for u in range(5)]  # 5 new users/day
    df = spark.createDataFrame(rows, "day int, uid long")
    daily = df.groupBy("day").agg(F.hll_sketch_agg("uid", F.lit(12)).alias("hll"))
    got = {
        r["day"]: (r["n_distinct_est"], r["n_days_in_window"])
        for r in SK.rolling_distinct_estimate(daily, "day", window_rows=7).collect()
    }
    for d in range(1, 11):
        span = min(d, 7)
        assert got[d] == (5 * span, span), (d, got[d])


def test_merge_rollup_tables_partition_invariant(spark):
    """Splitting the raw data into ANY two halves, rolling each up and
    blob-merging must give the same HLL estimate and n_rows as one
    rollup over the whole — the algebraic property incremental
    maintenance rests on."""
    rows = [(i % 4, i * 7 % 50, float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, "g int, uid long, val double")
    whole = SK.merge_sketch_rollup(
        SK.sketch_rollup(df, ["g"], "uid", "val"), ["g"]
    ).collect()
    for cut in (1, 100, 399):
        a = spark.createDataFrame(rows[:cut], "g int, uid long, val double")
        b = spark.createDataFrame(rows[cut:], "g int, uid long, val double")
        merged_tbl = SK.merge_rollup_tables(
            SK.sketch_rollup(a, ["g"], "uid", "val"),
            SK.sketch_rollup(b, ["g"], "uid", "val"),
            ["g"],
        )
        split = SK.merge_sketch_rollup(merged_tbl, ["g"]).collect()
        w = {r["g"]: (r["n_distinct_est"], r["n_rows"]) for r in whole}
        sp = {r["g"]: (r["n_distinct_est"], r["n_rows"]) for r in split}
        assert w == sp, (cut, w, sp)
