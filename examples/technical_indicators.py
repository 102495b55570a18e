"""Technical-analysis & forecasting tour over the per-series tick
stream (the reference's stock domain: user_id <-> symbol, value <->
price).

    python examples/technical_indicators.py [sf_dir]

1. bars       — tick fold to daily OHLC (open/close pinned by
                (ts, event_id) rank; values pass through exactly).
2. indicators — ATR-14 (SMA + Wilder-alpha legs), stochastic %K/%D,
                on-balance volume — all window expressions, no UDFs.
3. forecast   — Holt level/trend/one-step forecast as the EXACT
                closed form (eigen-split into two block-rebased
                geometric sums; see tswindow.with_holt_linear).
4. evaluate   — walk-forward MAE/RMSE/MASE of yesterday's forecast
                against today's close; MASE < 1 beats persistence.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.queries.windows_q import (  # noqa: E402
    w_atr_14,
    w_atr_wilder,
    w_holt_forecast,
    w_holt_forecast_eval,
    w_obv_daily,
    w_stochastic_oscillator,
)
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ta-tour")

    print("== ATR-14 (SMA leg), last bars of series 0 ==")
    w_atr_14(spark, sf_dir).filter(F.col("user_id") == 0).orderBy(
        F.desc("day")
    ).show(5, truncate=False)

    print("== Wilder-alpha ATR, same series ==")
    w_atr_wilder(spark, sf_dir).filter(F.col("user_id") == 0).orderBy(
        F.desc("day")
    ).show(5, truncate=False)

    print("== Stochastic %K/%D, most recent ticks of series 0 ==")
    w_stochastic_oscillator(spark, sf_dir).filter(
        F.col("user_id") == 0
    ).orderBy(F.desc("ts")).show(5)

    print("== On-balance volume ==")
    w_obv_daily(spark, sf_dir).filter(F.col("user_id") == 0).orderBy(
        F.desc("day")
    ).show(5)

    print("== Holt level/trend/one-step forecast ==")
    w_holt_forecast(spark, sf_dir).filter(F.col("user_id") == 0).orderBy(
        F.desc("day")
    ).show(5)

    print("== Walk-forward evaluation (MASE < 1 beats persistence) ==")
    ev = w_holt_forecast_eval(spark, sf_dir)
    ev.orderBy("mase").show(10)
    beat = ev.filter(F.col("mase") < 1).count()
    total = ev.count()
    print(f"Holt beats naive persistence on {beat}/{total} series")


if __name__ == "__main__":
    main()
