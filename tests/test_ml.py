"""MLlib pipeline tests (SURVEY §5.2 item 5): fit/transform round-trip,
metrics vs known values, save/load."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark import ml as M
from cse_datapipeline_and_mls_spark.operators import tswindow as TS
from cse_datapipeline_and_mls_spark.sources import load_table


@pytest.fixture(scope="module")
def features(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return M.build_price_features(ev, "user_id", ["ts", "event_id"], "value").cache()


def test_feature_build_shapes(features):
    cols = set(features.columns)
    assert {"value_lag_1", "value_lag_3", "value_lag_7", "ma5", "ma10", "vol14",
            "rsi", "macd", "momentum_3", "pct_change"} <= cols
    assert features.count() == 1000


def test_time_split_is_disjoint_and_ordered(features):
    train, test = M.time_split(features, "ts", test_days=7)
    n_train, n_test = train.count(), test.count()
    assert n_train > 0 and n_test > 0 and n_train + n_test == 1000
    max_train = train.agg(F.max("ts")).collect()[0][0]
    min_test = test.agg(F.min("ts")).collect()[0][0]
    assert max_train < min_test


def test_classifier_fit_metrics_and_roundtrip(spark, features, tmp_path):
    w = TS.series_window("user_id", ["ts", "event_id"])
    labeled = M.add_binary_label_and_weights(features, "value", w).na.drop(
        subset=["value_lag_1", "ma5"]
    )
    train, test = M.time_split(labeled, "ts", test_days=7)
    pipe = M.classifier_pipeline(M.DEFAULT_FEATURES, max_iter=3, max_depth=3)
    model = pipe.fit(train)
    metrics = M.binary_metrics(model.transform(test))
    assert 0.0 <= metrics["auc"] <= 1.0
    assert metrics["tp"] + metrics["tn"] + metrics["fp"] + metrics["fn"] == test.count()
    # M13-style persistence round trip
    path = str(tmp_path / "clf")
    model.write().overwrite().save(path)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(path)
    a = model.transform(test).select("prediction").collect()
    b = reloaded.transform(test).select("prediction").collect()
    assert a == b


def test_rolling_origin_search_picks_and_refits(spark, features):
    w = TS.series_window("user_id", ["ts", "event_id"])
    labeled = TS.with_lead(features, "pct_change", "target", w).filter(
        F.col("target").isNotNull()
    ).na.drop(subset=M.DEFAULT_FEATURES)

    def build(max_depth):
        return M.regression_pipeline(M.DEFAULT_FEATURES, max_iter=2, max_depth=max_depth)

    grid = [{"max_depth": 2}, {"max_depth": 3}]
    best, model, log = M.rolling_origin_search(
        labeled, build, grid, ts_col="ts", n_folds=2
    )
    assert best in grid and len(log) == 2
    for rec in log:
        # every candidate evaluated on time-ordered folds, never the future
        assert len(rec["folds"]) >= 1 and rec["avg"] > 0
    assert model.transform(labeled.limit(10)).select("prediction").count() == 10


def test_regressor_fit_and_directional_accuracy(spark, features):
    w = TS.series_window("user_id", ["ts", "event_id"])
    labeled = TS.with_lead(features, "pct_change", "target", w).filter(
        F.col("target").isNotNull()
    ).na.drop(subset=M.DEFAULT_FEATURES)
    train, test = M.time_split(labeled, "ts", test_days=7)
    pipe = M.regression_pipeline(M.DEFAULT_FEATURES, max_iter=3, max_depth=3)
    model = pipe.fit(train)
    preds = model.transform(test)
    metrics = M.regression_metrics(preds)
    assert metrics["rmse"] > 0 and not math.isnan(metrics["r2"])
    da = M.directional_accuracy(preds)
    assert 0.0 <= da <= 1.0
    scored = M.score_with_price_reconstruction(model, test.limit(50), price="value")
    assert "predicted_price" in scored.columns
    assert scored.count() == 50
