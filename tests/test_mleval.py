"""Invariants of the model-evaluation family (queries/mleval_q.py)
that the DuckDB oracles can't see: mathematical identities of the
metrics themselves (rank-AUC vs a direct pairwise count, the LOO
mean-preservation identity, threshold-sweep monotonicity, the Murphy
decomposition inequality, conformal coverage near its guarantee)."""

from __future__ import annotations

from cse_datapipeline_and_mls_spark.queries import QUERIES
from cse_datapipeline_and_mls_spark.queries.mleval_q import _scored

SF = "/root/testdata/sf0.001"


def test_score_build_is_bounded_and_separable(spark):
    rows = _scored(spark, SF).collect()
    assert all(0.0 < r["s"] < 1.0 for r in rows)
    assert all(r["y"] in (0, 1) for r in rows)
    # the score must actually separate the label for the eval queries
    # to exercise non-degenerate structure
    pos = [r["s"] for r in rows if r["y"] == 1]
    neg = [r["s"] for r in rows if r["y"] == 0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.2


def test_auc_matches_direct_pairwise_count(spark):
    # O(n^2) literal definition on the small fixture: P(s_pos > s_neg)
    # + 0.5 P(tie) — the midrank formula must agree exactly.
    rows = _scored(spark, SF).select("s", "y").collect()
    pos = [r["s"] for r in rows if r["y"] == 1]
    neg = [r["s"] for r in rows if r["y"] == 0]
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    direct = wins / (len(pos) * len(neg))
    out = QUERIES["ml_auc_rank_exact"](spark, SF).collect()[0]
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert abs(out["auc"] - direct) < 1e-12
    assert abs(out["gini"] - (2 * direct - 1)) < 1e-12


def test_calibration_bins_partition_and_brier_bounds(spark):
    bins = QUERIES["ml_calibration_bins"](spark, SF).collect()
    n_total = sum(r["n"] for r in bins)
    assert n_total == _scored(spark, SF).count()
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in bins)
    assert all(0.0 < r["avg_score"] < 1.0 for r in bins)
    dec = QUERIES["ml_brier_decomposition"](spark, SF).collect()[0]
    # Murphy: brier = reliability - resolution + uncertainty EXACTLY
    # for a discrete forecast; for a binned continuous score the gap
    # is within-bin Var(s) - 2 Cov(s, y), small when bins are narrow —
    # assert the reconstruction lands close, and every term in range.
    assert 0.0 <= dec["brier"] <= 1.0
    assert dec["reliability"] >= 0.0 and dec["resolution"] >= 0.0
    assert 0.0 <= dec["uncertainty"] <= 0.25 + 1e-9
    recon = dec["reliability"] - dec["resolution"] + dec["uncertainty"]
    assert abs(dec["brier"] - recon) < 0.02, (dec["brier"], recon)


def test_threshold_sweep_monotone(spark):
    rows = sorted(
        QUERIES["ml_threshold_sweep"](spark, SF).collect(),
        key=lambda r: r["threshold"],
    )
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps, reverse=True), "tp must fall as threshold rises"
    assert fps == sorted(fps, reverse=True), "fp must fall as threshold rises"
    for r in rows:
        assert r["tp"] + r["fn"] == rows[0]["tp"] + rows[0]["fn"]  # pos total
        assert r["fp"] + r["tn"] == rows[0]["fp"] + rows[0]["tn"]  # neg total
        if r["prec"] is not None:
            assert 0.0 <= r["prec"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0


def test_lift_deciles_partition_and_top_enriched(spark):
    rows = sorted(
        QUERIES["ml_lift_gain_deciles"](spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert sum(r["n"] for r in rows) == _scored(spark, SF).count()
    # score separates the label, so the best-score decile must be
    # enriched and the worst depleted
    assert rows[0]["lift"] > 1.0 > rows[-1]["lift"]
    assert abs(rows[-1]["cum_gain"] - 1.0) < 1e-12
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains), "cumulative gain must be non-decreasing"


def test_target_encoding_loo_mean_preservation(spark):
    # identity: sum over a category of (np - y_i)/(n-1) = np, so the
    # per-category MEAN of the encodings equals the category rate —
    # LOO removes leakage without shifting the encoded mean.
    from pyspark.sql import functions as F

    enc = QUERIES["ml_target_encoding_loo"](spark, SF)
    chk = (
        enc.groupBy("event_type")
        .agg(
            F.avg("te_loo").alias("enc_mean"),
            (F.sum("y") / F.count(F.lit(1))).alias("rate"),
        )
        .collect()
    )
    for r in chk:
        assert abs(r["enc_mean"] - r["rate"]) < 1e-9, r


def test_conformal_coverage_near_guarantee(spark):
    out = QUERIES["ml_conformal_interval"](spark, SF).collect()[0]
    # split-conformal guarantees E[coverage] >= 0.9; a single 500-row
    # test split can sit a few points under
    assert out["coverage"] >= 0.85, out
    assert out["q_hat"] > 0.0
    assert out["n_cal"] + out["n_tst"] == _scored(spark, SF).count()


def test_kfold_and_feature_hashing_partition(spark):
    n = _scored(spark, SF).count()
    folds = QUERIES["ml_kfold_assignment"](spark, SF).collect()
    assert sum(r["n"] for r in folds) == n
    assert len(folds) == 5
    fh = QUERIES["ml_feature_hashing"](spark, SF).collect()
    assert sum(r["n"] for r in fh) == 2 * n  # two features per row
    assert all(r["n_feats"] >= 1 for r in fh)


def test_ks_discrimination_matches_direct_ecdf_scan(spark):
    """Numpy replay of the two-sample KS statistic: direct ECDF
    difference over the pooled distinct scores must equal the
    prefix-sum formulation exactly (both are integer-count ratios)."""
    rows = _scored(spark, SF).select("s", "y").collect()
    pos = sorted(r["s"] for r in rows if r["y"] == 1)
    neg = sorted(r["s"] for r in rows if r["y"] == 0)
    import bisect

    best, at = -1.0, None
    for s in sorted({r["s"] for r in rows}):
        d = abs(
            bisect.bisect_right(pos, s) / len(pos)
            - bisect.bisect_right(neg, s) / len(neg)
        )
        if d > best:
            best, at = d, s
    out = QUERIES["ml_ks_discrimination"](spark, SF).collect()[0]
    assert out["n_pos"] == len(pos) and out["n_neg"] == len(neg)
    assert out["ks_stat"] == best
    assert out["at_score"] == at
    assert 0.0 < out["ks_stat"] <= 1.0


def test_trimmed_mean_matches_direct_sort(spark):
    """Direct replay: sort all order totals, drop floor(0.05 N) from
    each side, average the middle — must equal the rank-interval
    formulation to q6."""
    from cse_datapipeline_and_mls_spark.sources import load_table

    vals = sorted(
        r["o_totalprice"] for r in load_table(spark, SF, "orders").collect()
    )
    k = int(len(vals) * 0.05)
    middle = vals[k : len(vals) - k]
    direct = sum(middle) / len(middle)
    out = QUERIES["agg_trimmed_mean_revenue"](spark, SF).collect()[0]
    assert out["n_total"] == len(vals)
    assert out["n_trimmed_each_side"] == k
    assert abs(out["trimmed_mean"] - direct) < 1e-6


def test_regression_metrics_match_mllib_evaluators(spark):
    """The fused single-agg regression_metrics (VERDICT r12 #1) must
    reproduce RegressionEvaluator's rmse/mse/mae/r2 to float tolerance,
    and regression_report must additionally agree with the standalone
    directional_accuracy pass."""
    from pyspark.ml.evaluation import RegressionEvaluator

    from cse_datapipeline_and_mls_spark.ml import pipelines as M

    preds = spark.createDataFrame(
        [(1.0, 0.8), (2.0, 2.5), (-1.0, -0.4), (0.5, -0.2), (3.0, 2.0), (-2.0, -2.6)],
        "target double, prediction double",
    )
    fused = M.regression_metrics(preds)
    for name in ("rmse", "mse", "mae", "r2"):
        ref = RegressionEvaluator(
            labelCol="target", predictionCol="prediction", metricName=name
        ).evaluate(preds)
        assert abs(fused[name] - ref) < 1e-9, (name, fused[name], ref)
    report = M.regression_report(preds)
    for name in ("rmse", "mse", "mae", "r2"):
        assert abs(report[name] - fused[name]) < 1e-12
    assert abs(report["directional_accuracy"] - M.directional_accuracy(preds)) < 1e-12
    assert report["n"] == 6
