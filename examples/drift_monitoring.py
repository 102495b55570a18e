"""Drift & anomaly monitoring tour — the sequential-detector family
and the distribution drift tests, all oracle-checked queries.

    python examples/drift_monitoring.py [sf_dir]

1. CUSUM        — Lindley reflected walk per series (sustained small
                  shifts; the fastest detector for them).
2. EWMA chart   — Roberts control chart: exact closed-form EMA line
                  with steady-state 3-sigma limits.
3. Page-Hinkley — running-mean innovation walk minus its running
                  minimum (the streaming-ML standard), computed in
                  exact int64 micro-units.
4. Seasonal z   — 'is this Monday weird FOR A MONDAY' (day-of-week
                  baselines — what a global z-score cannot see).
5. Distribution drift — KS (sup-norm), Cramer-von Mises (integrated),
                  and PSI (binned) on the 1995-vs-1996 price
                  distributions: three lenses on the same question.
6. Forecast band — Holt next-step forecast with its 95% empirical-
                  residual interval (a point forecast is half an
                  answer).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.queries import QUERIES  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("drift-tour")

    print("== CUSUM drift alerts (per-series summary) ==")
    QUERIES["w_cusum_drift_alerts"](spark, sf_dir).orderBy(
        F.desc("n_alerts"), "user_id"
    ).show(5)

    print("== EWMA control chart (series 0, latest) ==")
    QUERIES["w_ewma_control_chart"](spark, sf_dir).filter(
        F.col("user_id") == 0
    ).orderBy(F.desc("ts")).show(5)

    print("== Page-Hinkley statistic (series 0, latest) ==")
    QUERIES["w_page_hinkley_drift"](spark, sf_dir).filter(
        F.col("user_id") == 0
    ).orderBy(F.desc("ts")).show(5)

    print("== Day-of-week seasonal z-score: the anomalous days ==")
    QUERIES["w_zscore_seasonal_dow"](spark, sf_dir).filter(
        F.col("is_anomaly") == 1
    ).orderBy(F.desc(F.abs(F.col("z_dow")))).show(5)

    print("== Distribution drift, three lenses on 1995 vs 1996 prices ==")
    QUERIES["agg_ks_price_drift"](spark, sf_dir).show()
    QUERIES["agg_cvm_price_drift"](spark, sf_dir).show()
    QUERIES["agg_psi_price_drift"](spark, sf_dir).show(5)

    print("== Holt next-step forecast with 95% residual band ==")
    QUERIES["w_holt_forecast_interval"](spark, sf_dir).show(10)


if __name__ == "__main__":
    main()
