from .pipeline import (
    bronze_ingest,
    content_dedup_stream,
    dedup_against_history,
    enrich_stream,
    expectations_on_stream,
    ingest_file_stream,
    inverted_index_stream,
    interval_join,
    run_audited_to_memory_sink,
    run_to_memory_sink,
    session_aggregate,
    sketch_rollup_stream,
    threshold_alerts,
    ohlc_aggregate,
    windowed_aggregate,
)
from .stateful import (
    cusum_alerts_stream,
    holt_forecast_stream,
    running_zscore_anomalies,
)
from .tws import running_distinct_types

__all__ = [
    "content_dedup_stream",
    "running_distinct_types",
    "ingest_file_stream",
    "bronze_ingest",
    "dedup_against_history",
    "enrich_stream",
    "threshold_alerts",
    "ohlc_aggregate",
    "windowed_aggregate",
    "session_aggregate",
    "run_to_memory_sink",
    "run_audited_to_memory_sink",
    "interval_join",
    "expectations_on_stream",
    "running_zscore_anomalies",
    "cusum_alerts_stream",
    "holt_forecast_stream",
]
