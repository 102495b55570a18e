"""Custom stateful streaming operator — ``applyInPandasWithState``.

The reference's stream consumer keeps no state at all (each Firebase
event is processed statelessly, spark_stream.py:29-49); its z-score
anomaly flag (spark_stream.py:134-142) is recomputed from the FULL
snapshot on every API call. The streaming-native equivalent is a
per-key running mean/variance maintained incrementally — O(1) state per
key (Welford counters), never a buffered history. That state shape is
what survives 100 TB: state size is #keys × 3 doubles regardless of
stream length.

Batch twin (for oracle parity): cumulative ``avg``/``stddev_pop`` over
``rowsBetween(unboundedPreceding, 0)`` — registered as the
``w_running_zscore`` query; the streaming path is asserted equal to it
in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("running_z", DoubleType()),
        StructField("anomaly", StringType()),
    ]
)

# Welford accumulator: observation count, running mean, sum of squared
# deviations (M2). Merged incrementally — one tuple per key, ever.
STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)


def _whole_batch(
    pdfs: Iterator[pd.DataFrame], sort_cols: tuple = ("ts", "event_id")
) -> "pd.DataFrame | None":
    """Concatenate ALL Arrow chunks of a key's micro-batch, then sort
    once globally (ADVICE r9): Spark may split one key's micro-batch
    across several chunks in the ``pdfs`` iterator, and sorting each
    chunk independently is only globally event-time-ordered when chunk
    boundaries happen to align with event-time order. One concat per
    key per micro-batch keeps the documented stream==batch parity
    contracts exact regardless of Arrow chunking. Memory: a single
    key's micro-batch slice — the same bound the per-chunk path already
    assumed, since Spark buffers the key's rows to group them."""
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return None
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    return pdf.sort_values(list(sort_cols), kind="stable")


def _score_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    z_threshold: float,
) -> Iterator[pd.DataFrame]:
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        zs = []
        for v in pdf["value"].astype(float):
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
            std = (m2 / n) ** 0.5  # population, ddof=0 — matches stddev_pop
            zs.append((v - mean) / std if std > 0 else 0.0)
        out = pdf[["user_id", "event_id", "ts", "value"]].copy()
        out["running_z"] = zs
        out["anomaly"] = ["Anomaly" if abs(z) > z_threshold else "Normal" for z in zs]
        yield out
    state.update((n, mean, m2))


def running_zscore_anomalies(
    stream: DataFrame,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key running z-score + anomaly flag over a stream.

    Within a micro-batch rows are scored in event-time order; across
    micro-batches the Welford state carries forward. (Cross-batch
    event-time ordering is the source's contract — enforce with a
    watermark + ordered delivery upstream when it matters.)
    """

    def fn(key, pdfs, state):
        return _score_batches(key, pdfs, state, z_threshold)

    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("cusum", DoubleType()),
        StructField("alert", StringType()),
    ]
)

# CUSUM state: the single reflected-walk value. O(1) per key, ever.
CUSUM_STATE_SCHEMA = StructType([StructField("s", DoubleType())])


def _cusum_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    target: float,
    slack: float,
    threshold: float,
) -> Iterator[pd.DataFrame]:
    (s,) = state.get if state.exists else (0.0,)
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        stats = []
        for v in pdf["value"].astype(float):
            s = max(0.0, s + (v - target - slack))
            stats.append(s)
        out = pdf[["user_id", "event_id", "ts", "value"]].copy()
        out["cusum"] = stats
        out["alert"] = ["Alert" if x > threshold else "Normal" for x in stats]
        yield out
    state.update((s,))


def cusum_alerts_stream(
    stream: DataFrame,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Streaming one-sided CUSUM change-point detector: the literal
    Page recurrence s = max(0, s + (x - target - slack)) carried across
    micro-batches as ONE double per key — the streaming counterpart of
    the batch Lindley closed form (tswindow.with_cusum; the batch
    w_cusum_drift_alerts query derives target/slack from the key's own
    full history, which is non-causal — a live detector takes them as
    known baselines, e.g. from the previous day's batch job). Within a
    micro-batch rows are scored in event-time order; cross-batch
    ordering is the source's contract, as with running_zscore_anomalies.
    State size is #keys x 1 double regardless of stream length — the
    100 TB-safe shape."""

    def fn(key, pdfs, state):
        return _cusum_batches(key, pdfs, state, target, slack, threshold)

    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_1", DoubleType()),
    ]
)

# Holt state: level, trend, and an init flag (0 until the first
# observation seeds l=x1, b=0). O(1) per key, ever.
HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("seen", LongType()),
    ]
)


def _holt_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    alpha: float,
    beta: float,
) -> Iterator[pd.DataFrame]:
    l, b, seen = state.get if state.exists else (0.0, 0.0, 0)
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        levels, trends = [], []
        for v in pdf["value"].astype(float):
            if seen == 0:
                l, b = v, 0.0
            else:
                lp = l
                l = alpha * v + (1.0 - alpha) * (l + b)
                b = beta * (l - lp) + (1.0 - beta) * b
            seen += 1
            levels.append(l)
            trends.append(b)
        out = pdf[["user_id", "event_id", "ts", "value"]].copy()
        out["level"] = levels
        out["trend"] = trends
        out["forecast_1"] = [lv + tr for lv, tr in zip(levels, trends)]
        yield out
    state.update((l, b, seen))


def holt_forecast_stream(
    stream: DataFrame,
    alpha: float = 0.8,
    beta: float = 0.2,
) -> DataFrame:
    """Streaming Holt double exponential smoothing: the literal
    two-equation recurrence carried across micro-batches as THREE
    scalars per key (level, trend, init flag) — the live counterpart
    of the batch closed form (tswindow.with_holt_linear, query
    w_holt_forecast), with the same pinned init l1=x1, b1=0, so the
    two paths agree to float precision on identical input order
    (asserted in tests/test_streaming.py). The batch form exists
    because history REPLAYS need no state store; this form exists
    because a live forecaster must not re-derive a century of ticks —
    state is #keys x 3 doubles regardless of stream length, the
    100 TB-safe shape. Within a micro-batch rows are scored in
    event-time order; cross-batch ordering is the source's contract,
    as with running_zscore_anomalies."""

    def fn(key, pdfs, state):
        return _holt_batches(key, pdfs, state, alpha, beta)

    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


ATTRIBUTION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("touch_type", StringType()),
    ]
)

# Last-touch state: the most recent touch's event_type. One string per
# key, ever — O(1) regardless of stream length, like the CUSUM walk.
ATTRIBUTION_STATE_SCHEMA = StructType([StructField("touch", StringType())])


def _attribution_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    touch_types: tuple,
    convert_type: str,
) -> Iterator[pd.DataFrame]:
    (touch,) = state.get if state.exists else (None,)
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        rows = []
        for eid, ts, et, v in zip(
            pdf["event_id"], pdf["ts"], pdf["event_type"], pdf["value"]
        ):
            if et in touch_types:
                touch = et
            elif et == convert_type:
                rows.append(
                    (
                        int(key[0]),
                        int(eid),
                        ts,
                        float(v),
                        touch if touch is not None else "none",
                    )
                )
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "ts", "value", "touch_type"]
            )
    state.update((touch,))


def attribution_stream(
    stream: DataFrame,
    touch_types: tuple = ("view", "click"),
    convert_type: str = "purchase",
) -> DataFrame:
    """Streaming last-touch attribution (VERDICT r7 #6, the stateful
    twin of the batch t_attribution_last_touch query): per user, keep
    the most recent preceding touch's type and emit one credited row
    per conversion — (user, event, ts, value, touch_type), 'none' when
    no touch precedes the purchase.

    The batch query needs a running-count window + a self-join to name
    the last touch; the stream needs neither — the state IS the last
    touch. One string per key, carried across micro-batches; within a
    micro-batch rows apply in event-time order (same source-ordering
    contract as the z-score/CUSUM operators). Output is append-mode
    conversion credits, ready for the same groupBy(touch_type) rollup
    the batch query ends with — run downstream or on the sink table."""

    def fn(key, pdfs, state):
        return _attribution_batches(key, pdfs, state, tuple(touch_types), convert_type)

    return (
        stream.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=ATTRIBUTION_OUTPUT_SCHEMA,
            stateStructType=ATTRIBUTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


MARKOV_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("cur", StringType()),
        StructField("nxt", StringType()),
    ]
)

# Markov state: the previous event's type. One string per key, ever.
MARKOV_STATE_SCHEMA = StructType([StructField("prev", StringType())])


def _markov_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
) -> Iterator[pd.DataFrame]:
    (prev,) = state.get if state.exists else (None,)
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        rows = []
        for eid, ts, et in zip(pdf["event_id"], pdf["ts"], pdf["event_type"]):
            if prev is not None:
                rows.append((int(key[0]), int(eid), ts, prev, et))
            prev = et
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "event_id", "ts", "cur", "nxt"]
            )
    state.update((prev,))


def markov_transitions_stream(stream: DataFrame) -> DataFrame:
    """Streaming first-order transition events (VERDICT r7 #6, the
    stateful twin of t_markov_transitions' lead-window pair build): per
    user, emit (cur=previous type, nxt=this type) for every event after
    the first, keyed by the ARRIVING event's id — exactly the pair set
    the batch lead() window produces, but with one string of state per
    user instead of a sort. Aggregate downstream with the batch query's
    groupBy(cur, nxt) + per-cur normalization (counts are mergeable, so
    the rollup can run per-micro-batch or on the sink table)."""
    return (
        stream.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _markov_batches,
            outputStructType=MARKOV_OUTPUT_SCHEMA,
            stateStructType=MARKOV_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


PH_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("ph", DoubleType()),
        StructField("alert", LongType()),
    ]
)

# Page-Hinkley state: count, exact-integer micro-unit running sum, the
# cumulative test statistic m_t, and its running minimum. Four int64s
# per key, ever — O(1) like the CUSUM walk, and EXACT: the quantities
# the batch query keeps in order-independent int64 are precisely what
# crosses micro-batch boundaries here, so stream == batch to the bit.
PH_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("mt", LongType()),
        StructField("m_min", LongType()),
    ]
)


def _page_hinkley_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    delta_micro: float,
    threshold: float,
) -> Iterator[pd.DataFrame]:
    import math

    n, s, mt, m_min = state.get if state.exists else (0, 0, 0, None)
    if state.exists and n == 0:
        m_min = None  # sentinel round-trips as 0-count ⇒ min not yet seeded
    pdf = _whole_batch(pdfs)
    if pdf is not None:
        phs, alerts = [], []
        for v in pdf["value"].astype(float):
            vi = int(math.floor(v * 1000000 + 0.5))
            n += 1
            s += vi
            ti = int(math.floor((vi - s / n - delta_micro) + 0.5))
            mt += ti
            m_min = mt if m_min is None else min(m_min, mt)
            ph = (mt - m_min) / 1000000.0
            phs.append(ph)
            alerts.append(1 if ph > threshold else 0)
        out = pdf[["user_id", "event_id", "ts", "value"]].copy()
        out["ph"] = phs
        out["alert"] = alerts
        yield out
    state.update((n, s, mt, 0 if m_min is None else m_min))


AUC_BINS = 1024

AUC_OUTPUT_SCHEMA = StructType(
    [
        StructField("segment", StringType()),
        StructField("n_seen", LongType()),
        StructField("n_pos", LongType()),
        StructField("n_neg", LongType()),
        StructField("auc", DoubleType()),
        StructField("gini", DoubleType()),
    ]
)

# AUC monitor state: two int64[AUC_BINS] histograms per segment —
# per-bin row count and per-bin positive count. Bounded (16 KiB per
# segment) regardless of stream length, and ORDER-INDEPENDENT: folding
# histograms over any micro-batch split reproduces the batch-on-binned-
# scores result to the bit, the strongest parity class in this module
# (the detectors above need event-time order; this needs none).
AUC_STATE_SCHEMA = StructType(
    [
        StructField("n", ArrayType(LongType())),
        StructField("np", ArrayType(LongType())),
    ]
)


def _auc_from_hist(n_hist, np_hist) -> tuple:
    """ml_auc_rank_exact's midrank rank-sum identity applied to the
    binned histogram, in exact Python ints: ascending-bin prefix sum
    supplies each bin's strictly-below count; doubled midranks keep
    every accumulant integral."""
    n1 = sum(np_hist)
    ntot = sum(n_hist)
    n2 = ntot - n1
    cum = 0
    r1x2 = 0
    for nb, pb in zip(n_hist, np_hist):
        r1x2 += pb * (2 * cum + nb + 1)
        cum += nb
    if n1 == 0 or n2 == 0:
        return ntot, n1, n2, None, None
    auc = (r1x2 - n1 * (n1 + 1)) / (2.0 * n1 * n2)
    gini = (r1x2 - n1 * (n1 + 1)) / (1.0 * n1 * n2) - 1.0
    return ntot, n1, n2, auc, gini


def _auc_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.exists:
        n_hist, np_hist = (list(a) for a in state.get)
    else:
        n_hist, np_hist = [0] * AUC_BINS, [0] * AUC_BINS
    for pdf in pdfs:
        if not len(pdf):
            continue
        # no sort: histogram accumulation is order-independent
        bins = np.minimum(
            np.floor(pdf["s"].to_numpy(dtype=float) * AUC_BINS).astype(np.int64),
            AUC_BINS - 1,
        )
        y = pdf["y"].to_numpy(dtype=np.int64)
        add_n = np.bincount(bins, minlength=AUC_BINS)
        add_p = np.bincount(bins, weights=y, minlength=AUC_BINS)
        for b in np.nonzero(add_n)[0]:
            n_hist[b] += int(add_n[b])
            np_hist[b] += int(add_p[b])
    state.update((n_hist, np_hist))
    ntot, n1, n2, auc, gini = _auc_from_hist(n_hist, np_hist)
    yield pd.DataFrame(
        [(str(key[0]), ntot, n1, n2, auc, gini)],
        columns=["segment", "n_seen", "n_pos", "n_neg", "auc", "gini"],
    )


def auc_monitor_stream(stream: DataFrame) -> DataFrame:
    """Streaming running-AUC monitor per segment (VERDICT r9 #6) — the
    live counterpart of the batch evaluation family: per event_type it
    maintains two int64[1024] score histograms and emits, after every
    micro-batch, the segment's running (n_seen, n_pos, n_neg, auc,
    gini) computed by ml_auc_rank_exact's exact midrank rank-sum
    identity over the binned scores.

    Parity contract (asserted in tests/test_streaming.py): the final
    emission per segment equals the batch ml_auc_monitor_segments query
    on the same rows BIT-for-bit, under ANY micro-batch split and ANY
    within-batch arrival order — histogram folds commute, so this
    monitor needs no ordered-delivery assumption at all (unlike the
    detector family above). State: 16 KiB per segment regardless of
    stream length — the 100 TB-safe shape; a model monitor tracking
    1M segments holds 16 GB of state across the cluster's state
    stores.

    Input must carry (event_type, y, s) — build them with
    queries.mleval_q.scored_columns for the deterministic-score twin,
    or from a real model's scores in production."""
    return (
        stream.select(F.col("event_type"), "y", "s")
        .groupBy("event_type")
        .applyInPandasWithState(
            _auc_batches,
            outputStructType=AUC_OUTPUT_SCHEMA,
            stateStructType=AUC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("segment", StringType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("n_seen", LongType()),
        StructField("max_undercount", LongType()),
    ]
)

# Misra-Gries state: up to k (item, counter) pairs + the processed-row
# count per segment. Bounded at k entries regardless of stream length
# or item cardinality — the point of the sketch.
HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _hh_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    k: int,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        items, counts, n = state.get
        counters = dict(zip(items, counts))
    else:
        counters, n = {}, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        # batched (mergeable-summary) form: fold the micro-batch's exact
        # item counts in, then if more than k counters survive, subtract
        # the (k+1)-st largest from all and drop non-positives — the
        # vectorized equivalent of per-arrival decrements, same
        # n/(k+1) undercount guarantee (Agarwal et al., 2013).
        vc = pdf["item"].astype(str).value_counts()
        n += int(vc.sum())
        for it, c in vc.items():
            counters[it] = counters.get(it, 0) + int(c)
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {it: c - cut for it, c in counters.items() if c > cut}
    state.update((list(counters), [counters[i] for i in counters], n))
    bound = n // (k + 1)
    rows = [
        (str(key[0]), it, int(c), n, bound)
        for it, c in sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    yield pd.DataFrame(
        rows, columns=["segment", "item", "est_count", "n_seen", "max_undercount"]
    )


def heavy_hitters_stream(stream: DataFrame, k: int = 16) -> DataFrame:
    """Streaming per-segment heavy hitters via a Misra–Gries summary —
    the bounded-state answer to "top values right now" that an exact
    streaming groupBy count cannot give (its state grows with item
    cardinality; at 100 TB of high-cardinality items the state store
    IS the problem). State: ≤ k counters per segment, folded with the
    mergeable-summaries batch update, so the summary after any
    micro-batch split equals a single-pass summary's GUARANTEES (not
    its exact counter values — MG summaries are split-dependent, the
    bounds are not):

    * every item with true frequency > n/(k+1) is present;
    * est_count never exceeds the true count;
    * the undercount is at most n/(k+1) (emitted as max_undercount).

    Asserted against exact batch counts in tests/test_streaming.py —
    the bracket-verdict pattern (bounds checked, not bit equality),
    matching how the ANN/recall family is verified. Emissions are the
    running summary after each micro-batch, append-mode; the final
    emission per segment (max n_seen) is the current belief.

    Input must carry (event_type, item); derive `item` from whatever
    column matters (the tests bucket `value`)."""

    def fn(key, pdfs, state):
        return _hh_batches(key, pdfs, state, k)

    return (
        stream.select(F.col("event_type"), F.col("item").cast("string").alias("item"))
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def page_hinkley_stream(
    stream: DataFrame,
    delta: float = 0.5,
    threshold: float = 50.0,
) -> DataFrame:
    """Streaming Page–Hinkley drift detector — the stateful twin of the
    batch w_page_hinkley_drift query, completing the detector family's
    streaming coverage (CUSUM, Holt, and now PH). Per key it carries
    the batch query's EXACT invariants across micro-batches: the int64
    micro-unit running sum (the running mean's numerator), the int64
    cumulative statistic m_t, and its running minimum — so the stream
    reproduces the batch output bit-for-bit (ph is a division of
    identical integers), asserted in tests/test_streaming.py. Unlike
    the CUSUM twin (whose batch query self-baselines non-causally, so
    the stream takes target/slack as knowns), PH's running mean IS
    causal — the streaming twin needs no externally supplied baseline
    at all. State: 4 int64s per key regardless of stream length."""
    delta_micro = delta * 1000000.0

    def fn(key, pdfs, state):
        return _page_hinkley_batches(key, pdfs, state, delta_micro, threshold)

    return (
        stream.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=PH_OUTPUT_SCHEMA,
            stateStructType=PH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


MSPRT_OUTPUT_SCHEMA = StructType(
    [
        StructField("day", DateType()),
        StructField("n_treat", LongType()),
        StructField("n_ctrl", LongType()),
        StructField("s_treat_cents", LongType()),
        StructField("s_ctrl_cents", LongType()),
        StructField("diff_musd", DoubleType()),
        StructField("log_lambda", DoubleType()),
        StructField("reject", BooleanType()),
    ]
)

# mSPRT monitor state: the four cumulative int64s the whole statistic
# is a pure function of — exact integer folds, so cross-batch carrying
# cannot drift. O(1) per experiment, ever.
MSPRT_STATE_SCHEMA = StructType(
    [
        StructField("n_t", LongType()),
        StructField("n_c", LongType()),
        StructField("s_t", LongType()),
        StructField("s_c", LongType()),
    ]
)


def _msprt_batches(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: "GroupState",
    sigma0_sq: float,
    tau_sq: float,
    log_reject: float,
) -> Iterator[pd.DataFrame]:
    import math

    n_t, n_c, s_t, s_c = state.get if state.exists else (0, 0, 0, 0)
    pdf = _whole_batch(pdfs, sort_cols=("day",))
    if pdf is not None and len(pdf):
        d = (
            pdf.groupby("day", sort=True)
            .agg(
                nt_d=("t", "sum"),
                n_d=("t", "count"),
                st_d=("tc", "sum"),
                sa_d=("cents", "sum"),
            )
            .reset_index()
        )
        rows = []
        for r in d.itertuples(index=False):
            n_t += int(r.nt_d)
            n_c += int(r.n_d) - int(r.nt_d)
            s_t += int(r.st_d)
            s_c += int(r.sa_d) - int(r.st_d)
            if n_t > 0 and n_c > 0:
                # EXACTLY the batch query's op order (pinned IEEE chain)
                diff = s_t / n_t / 100000000.0 - s_c / n_c / 100000000.0
                v = sigma0_sq * (1.0 / n_t + 1.0 / n_c)
                ll = 0.5 * math.log(v / (v + tau_sq)) + (diff * diff * tau_sq) / (
                    2.0 * v * (v + tau_sq)
                )
                rows.append((r.day, n_t, n_c, s_t, s_c, diff, ll, ll > log_reject))
        if rows:
            yield pd.DataFrame(
                rows, columns=[f.name for f in MSPRT_OUTPUT_SCHEMA.fields]
            )
    state.update((n_t, n_c, s_t, s_c))


def msprt_columns(df: DataFrame) -> DataFrame:
    """Project order-shaped rows to the monitor's input: day, the
    md5-hash arm flag t, its cents product tc (so the pandas fold is a
    plain sum), and exact int64 cents — the SAME Spark expressions as
    the batch ab_msprt_sequential query, so arm assignment and cents
    rounding are engine-identical by construction."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    t = F.when(bucket == 0, 1).otherwise(0)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    return df.select(
        F.lit("default").alias("experiment"),
        F.col("o_orderdate").cast("date").alias("day"),
        t.alias("t"),
        cents.alias("cents"),
        (t * cents).cast("long").alias("tc"),
    )


def msprt_monitor_stream(
    stream: DataFrame,
    sigma0_sq: float = 0.01,
    tau_sq: float = 0.0001,
    log_reject: float = 2.995732273553991,
) -> DataFrame:
    """Streaming always-valid experiment monitor — the live twin of the
    batch ab_msprt_sequential query: after each day it emits the
    cumulative per-arm counts/sums and the mixture-SPRT log-likelihood
    ratio, rejecting when it crosses ln(1/alpha).

    Parity contract (tests/test_msprt_stream.py): with day-aligned
    micro-batches arriving in day order (the ingest contract of a daily
    experiment feed, same stance as t_ingest_dedup_daily), every
    emitted row equals the batch query's row for that day — the state
    is four cumulative int64s (exact folds), and the float chain copies
    the batch op order, so the only cross-engine slack is the <=1-ulp
    libm-vs-JVM ln difference, far below q6.

    Scale: state is O(1) per experiment; the per-batch pandas work is
    one day-grain groupby of that batch's rows. A platform monitoring
    10k concurrent experiments holds 10k x 32 bytes of state. The
    single-key-per-experiment funnel is real but bounded: the input
    should be pre-aggregated to (day, arm) partials upstream if one
    experiment's raw feed exceeds a task (documented, not yet needed at
    this scale)."""

    def fn(key, pdfs, state):
        return _msprt_batches(key, pdfs, state, sigma0_sq, tau_sq, log_reject)

    return stream.groupBy("experiment").applyInPandasWithState(
        fn,
        outputStructType=MSPRT_OUTPUT_SCHEMA,
        stateStructType=MSPRT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
