"""End-to-end assertions for examples/reference_tour.py — the
reference-shaped prices/financials pipeline (FIXTURES.md §1-§2):
sanitized ingest → date recovery → financials join with guarded ratios
→ weighted GBT classifier → alert filter → NaN-scrubbed JSON serving."""

from __future__ import annotations

import math
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

import reference_tour as RT  # noqa: E402


def test_fixtures_carry_documented_edge_cases(spark):
    prices = RT.make_prices(spark)
    # FIXTURES.md §1: a single-row symbol and series shorter than the
    # longest window (14)
    per_sym = prices.groupBy("symbol").count()
    assert per_sym.filter(F.col("count") == 1).count() >= 1
    assert per_sym.filter(F.col("count") < 14).count() >= 5
    # a NaN (not NULL) double, zero volumes, and the .csv date suffix
    assert prices.filter(F.isnan("turnover")).count() == 1
    assert prices.filter(F.col("tradevolume") == 0).count() > 0
    assert prices.filter(~F.col("Date").endswith(".csv")).count() == 0
    fin = RT.make_financials(spark)
    # §2: zero AND null Total_Revenue, zero Basic_EPS, coverage gaps
    assert fin.filter(F.col("Total_Revenue") == 0).count() > 0
    assert fin.filter(F.col("Total_Revenue").isNull()).count() > 0
    assert fin.filter(F.col("Basic_EPS") == 0).count() > 0
    assert fin.count() < prices.select("symbol").distinct().count()


def test_enrich_guards_and_allowlist(spark):
    prices, fin = RT.make_prices(spark), RT.make_financials(spark)
    out = RT.enrich(prices, fin).cache()
    try:
        # semi-join allow-list: only symbols present in financials survive
        allowed = {r[0] for r in fin.select("Symbol").collect()}
        assert {r[0] for r in out.select("symbol").distinct().collect()} <= allowed
        # /0 guards: zero Basic_EPS / Total_Revenue yield NULL, never inf
        assert out.filter(F.col("PE_Ratio").isNull()).count() > 0
        for col in ("PE_Ratio", "Profit_Margin"):
            bad = out.filter(
                F.col(col).isNotNull() & (F.isnan(col) | (F.abs(F.col(col)) == float("inf")))
            )
            assert bad.count() == 0, col
        # date recovery: yyyyMMdd.csv → real DATE, no NULLs
        assert out.filter(F.col("trade_date").isNull()).count() == 0
    finally:
        out.unpersist()


def test_classifier_alerts_and_serving(spark):
    prices, fin = RT.make_prices(spark), RT.make_financials(spark)
    enriched = RT.enrich(prices, fin)
    _model, m = RT.train_classifier(enriched)
    assert m["tp"] + m["tn"] + m["fp"] + m["fn"] > 0
    assert 0.0 <= m["auc"] <= 1.0 and 0.0 <= m["accuracy"] <= 1.0
    # alert filter fires on the engineered >5% gap days only
    al = RT.alerts(enriched)
    assert al.count() > 0
    assert al.filter(F.abs(F.col("percentageChange")) <= 5.0).count() == 0
    # serving: NaN turnover must serialize as 0, not NaN/null
    served = RT.serve(enriched)
    nan_rows = [r["json"] for r in served.collect() if '"turnover":0.0' in r["json"]]
    assert nan_rows, "NaN turnover row should be scrubbed to 0.0"
    assert not any(math.isnan(0) or "NaN" in r["json"] for r in served.collect())
