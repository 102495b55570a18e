"""Structured Streaming tour: the T-series pipeline end to end on real
readStream/writeStream queries — file-source micro-batch ingest, bronze
exactly-once dedup, tumbling aggregation, OHLC candle bars, and
stateless threshold alerts — each materialized through the memory sink
the tests use. Every stage's semantics has a batch twin (the
oracle-checked t_* / w_ohlc_* queries); the stream/batch parity tests
in tests/test_streaming.py are the proof they agree.

Run: python examples/streaming_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cse_datapipeline_and_mls_spark import streaming as ST  # noqa: E402
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-tour")
    spark.sparkContext.setLogLevel("ERROR")

    # land the events table as the streaming source directory (a stand-in
    # for the poller's landing zone; TESTDATA's nanos timestamps are
    # normalized by load_table)
    land = tempfile.mkdtemp(prefix="stream_land_")
    try:
        load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(land)
        stream = ST.ingest_file_stream(spark, land)
        print("source isStreaming:", stream.isStreaming)

        print("== bronze ingest (exactly-once event_id dedup) ==")
        bronze = ST.run_to_memory_sink(ST.bronze_ingest(stream), "tour_bronze")
        print("rows:", bronze.count(), "distinct ids:",
              bronze.select("event_id").distinct().count())

        print("== tumbling 5-minute aggregation (watermarked) ==")
        ST.run_to_memory_sink(
            ST.windowed_aggregate(stream, size="5 minutes"),
            "tour_tumbling",
            output_mode="complete",
        ).orderBy("window_start", "event_type").show(6, truncate=False)

        print("== OHLC candle bars (mergeable min_by/max_by) ==")
        ST.run_to_memory_sink(
            ST.ohlc_aggregate(stream, size="6 hours"),
            "tour_ohlc",
            output_mode="complete",
        ).orderBy("user_id", "bucket").show(6, truncate=False)

        print("== threshold alerts (stateless filter) ==")
        alerts = ST.run_to_memory_sink(
            ST.threshold_alerts(stream, threshold=90.0), "tour_alerts"
        )
        print("alerts fired:", alerts.count())
        alerts.orderBy("ts").show(5, truncate=False)
    finally:
        shutil.rmtree(land, ignore_errors=True)


if __name__ == "__main__":
    main()
