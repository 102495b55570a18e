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


def run(spark, k_events: int, k_docs: int) -> dict:
    out: dict = {}

    def case(name, mk_df, n_rows_fn=None):
        res = {}
        for label, kk in (("1x", 1), (f"{k_events if 'window' in name or 'events' in name else k_docs}x", None)):
            df = mk_df(1 if label == "1x" else None)
            n = df.count()
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

    return out


def main() -> None:
    k_events = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    k_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("scale_smoke")
    out = run(spark, k_events, k_docs)
    print(json.dumps({"sf_dir": SF_DIR, "k_events": k_events, "k_docs": k_docs, "cases": out}))


if __name__ == "__main__":
    main()
