"""Model-evaluation + leakage-safe feature-engineering queries.

The reference evaluates its classifier with accuracy computed
driver-side on collected predictions (ml-algorithms/classifier.py:
89-90); this module re-expresses the whole evaluation
toolbox as DISTRIBUTED, hash-checkable queries — the shapes every
training-data pipeline needs between "features built" and "model
shipped": calibration curves, Brier decomposition, exact rank-AUC,
lift/gain deciles, threshold sweeps, leave-one-out target encoding,
split-conformal intervals, feature hashing, and k-fold assignment.

Determinism design (what makes these ORACLE-checkable where the GBT
queries had to fall back to bracket verdicts): the score column is not
a fitted model but a FIXED closed-form — a rational squash
``s = 0.5 + z/(2(1+|z|))`` of ``z = (value-50)/30 + noise`` with the
noise an md5-derived integer bucket. Every op in that chain (add, sub,
mul, div, abs) is a correctly-rounded IEEE-754 primitive, so Spark and
DuckDB produce BIT-IDENTICAL doubles — no transcendentals, no
rounding-boundary class (tools/lint_oracles.py header). Downstream,
counts stay int64 and ratios are single divisions of exact integers,
so most outputs need no quantization at all; only float AVERAGES
(summation-order-sensitive) go through the engine-wide q6.

The evaluation shapes themselves then work unchanged on a real model's
score column — the score build is the only line a user swaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.numeric import q6 as _q6
from ..operators.relational import distributed_prefix_sum
from ..sources import load_table
from . import register

# Shared deterministic (label, score) build — SQL text and the Spark
# twin below MUST stay in lockstep (same discipline as numeric.q6).
_SCORED_CTE = """
    WITH z0 AS (
      SELECT event_id, event_type, user_id, value,
             CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y,
             (value - 50.0) / 30.0
               + ((('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2001) - 1000) / 1000.0 AS z
      FROM events
    ), scored AS (
      SELECT event_id, event_type, user_id, value, CAST(y AS BIGINT) AS y,
             0.5 + z / (2.0 * (1.0 + abs(z))) AS s
      FROM z0
    )"""


def scored_columns(ev: DataFrame) -> DataFrame:
    """Apply the deterministic (y, s) build to ANY frame carrying
    (event_id, event_type, user_id, value) — shared by the batch
    queries (via :func:`_scored`) and the streaming AUC monitor
    (streaming/stateful.auc_monitor_stream), so stream and batch score
    the same rows BIT-identically (same engine, same expressions)."""
    h = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
    )
    z = (F.col("value") - 50.0) / 30.0 + ((h % 2001) - 1000) / F.lit(1000.0)
    return ev.select(
        "event_id",
        "event_type",
        "user_id",
        "value",
        F.when(F.col("value") >= 50.0, 1).otherwise(0).cast("long").alias("y"),
        (F.lit(0.5) + z / (2.0 * (1.0 + F.abs(z)))).alias("s"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, event_type, user_id, value, y, s) — the Spark twin of
    _SCORED_CTE. y = value ≥ 50 (≈45% positive at every SF); s is the
    rational squash of the noised margin, strictly inside (0, 1), AUC
    ≈ 0.95 — separable enough that calibration bins, lift deciles and
    threshold sweeps all have non-degenerate structure."""
    return scored_columns(load_table(spark, sf_dir, "events"))


@register(
    "ml_calibration_bins",
    oracle=f"""{_SCORED_CTE}
    SELECT CAST(floor(s * 10) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(y) AS BIGINT) AS n_pos,
           floor(avg(s) * 1000000 + 0.5) / 1000000 AS avg_score,
           CAST(sum(y) AS BIGINT) * 1.0 / count(*) AS pos_rate
    FROM scored GROUP BY 1 ORDER BY bin
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-curve bins: scores cut into 10 equal-width bins,
    each reporting mean predicted probability vs realized positive
    rate — the standard calibration diagnostic the reference's
    driver-side metrics step (ml-algorithms/classifier.py:89-90)
    never distributes. ONE map-side bin assignment + ONE 10-group agg: at
    100 TB this is a single partial-aggregating shuffle of 10 keys.
    pos_rate is an exact int/int division (bit-identical everywhere);
    only avg_score (float sum order) needs q6."""
    sc = _scored(spark, sf_dir)
    return (
        sc.groupBy(F.floor(F.col("s") * 10).cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            _q6(F.avg("s")).alias("avg_score"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            "avg_score",
            (F.col("n_pos") * 1.0 / F.col("n")).alias("pos_rate"),
        )
        .orderBy("bin")
    )


@register(
    "ml_brier_decomposition",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT CAST(floor(s * 10) AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS np,
             sum(s) AS ss
      FROM scored GROUP BY 1
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(np) AS BIGINT) AS nptot
      FROM g
    ), br AS (
      SELECT sum((s - y) * (s - y)) AS sq FROM scored
    ), parts AS (
      SELECT n, ss / n AS sb, np * 1.0 / n AS yb FROM g
    ), rel AS (
      SELECT sum(n * (sb - yb) * (sb - yb)) AS rel_num FROM parts
    ), res AS (
      SELECT sum(p.n * (p.yb - t.nptot * 1.0 / t.ntot)
                     * (p.yb - t.nptot * 1.0 / t.ntot)) AS res_num
      FROM parts p CROSS JOIN t
    )
    SELECT t.ntot AS n,
           floor(br.sq / t.ntot * 1000000 + 0.5) / 1000000 AS brier,
           floor(rel.rel_num / t.ntot * 1000000 + 0.5) / 1000000 AS reliability,
           floor(res.res_num / t.ntot * 1000000 + 0.5) / 1000000 AS resolution,
           floor((t.nptot * 1.0 / t.ntot) * (1.0 - t.nptot * 1.0 / t.ntot)
                 * 1000000 + 0.5) / 1000000 AS uncertainty
    FROM t CROSS JOIN br CROSS JOIN rel CROSS JOIN res
    """,
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over the 10 calibration
    bins: brier ≈ reliability − resolution + uncertainty (exact for
    the binned score). Reliability punishes miscalibration, resolution
    rewards bins whose outcome rate departs from the base rate,
    uncertainty = ȳ(1−ȳ) is the data's irreducible floor. Everything
    reduces to the same 10-row bin aggregate as ml_calibration_bins
    plus one global sum — two passes over the fact table, both
    map-side partial-aggregated; nothing driver-side."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy(F.floor(F.col("s") * 10).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
        F.sum("s").alias("ss"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum("np").cast("long").alias("nptot"),
    )
    br = sc.agg(F.sum((F.col("s") - F.col("y")) * (F.col("s") - F.col("y"))).alias("sq"))
    parts = g.select(
        "n",
        (F.col("ss") / F.col("n")).alias("sb"),
        (F.col("np") * 1.0 / F.col("n")).alias("yb"),
    )
    rel = parts.agg(
        F.sum(
            F.col("n") * (F.col("sb") - F.col("yb")) * (F.col("sb") - F.col("yb"))
        ).alias("rel_num")
    )
    ybar = F.col("nptot") * 1.0 / F.col("ntot")
    res = (
        parts.crossJoin(F.broadcast(t))
        .agg(F.sum(F.col("n") * (F.col("yb") - ybar) * (F.col("yb") - ybar)).alias("res_num"))
    )
    return (
        t.crossJoin(F.broadcast(br))
        .crossJoin(F.broadcast(rel))
        .crossJoin(F.broadcast(res))
        .select(
            F.col("ntot").alias("n"),
            _q6(F.col("sq") / F.col("ntot")).alias("brier"),
            _q6(F.col("rel_num") / F.col("ntot")).alias("reliability"),
            _q6(F.col("res_num") / F.col("ntot")).alias("resolution"),
            _q6(ybar * (1.0 - ybar)).alias("uncertainty"),
        )
    )


@register(
    "ml_auc_rank_exact",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1
    ), c AS (
      SELECT s, n, np,
             CAST(coalesce(sum(n) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_n
      FROM g
    ), t AS (
      SELECT CAST(sum(np) AS BIGINT)                       AS n1,
             CAST(sum(n) AS BIGINT)                        AS ntot,
             CAST(sum(np * (2 * cum_n + n + 1)) AS BIGINT) AS r1x2
      FROM c
    )
    SELECT n1 AS n_pos, ntot - n1 AS n_neg,
           (r1x2 - n1 * (n1 + 1)) / (2.0 * n1 * (ntot - n1)) AS auc,
           (r1x2 - n1 * (n1 + 1)) / (1.0 * n1 * (ntot - n1)) - 1.0 AS gini
    FROM t
    """,
)
def ml_auc_rank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT AUC via the rank-sum identity AUC = (R₁ − n₁(n₁+1)/2)/
    (n₁n₂) with midrank tie handling — the complement to the
    bracket-verdict GBT AUC (ml_gbt_classifier_metrics): given ANY
    deterministic score column, AUC itself is hash-checkably exact.
    Same skew-proof spine as agg_mann_whitney_u: group by score value
    (ties collapse), relational.distributed_prefix_sum supplies each
    value's strictly-less count — two distributed exchanges, never a
    data-sized ``sum() OVER (ORDER BY …)`` single task. Doubled
    midranks keep every accumulant int64 (bound 2n², documented to
    ~10⁹ rows like the Mann-Whitney), so AUC and Gini are single
    divisions of exact integers — no rounding step at all."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    c = distributed_prefix_sum(g, ["s"], ["n"])
    t = c.agg(
        F.sum("np").cast("long").alias("n1"),
        F.sum("n").cast("long").alias("ntot"),
        F.sum(F.col("np") * (2 * F.col("cum_n") + F.col("n") + 1))
        .cast("long")
        .alias("r1x2"),
    )
    n1, ntot, r1x2 = F.col("n1"), F.col("ntot"), F.col("r1x2")
    return t.select(
        n1.alias("n_pos"),
        (ntot - n1).alias("n_neg"),
        ((r1x2 - n1 * (n1 + 1)) / (2.0 * n1 * (ntot - n1))).alias("auc"),
        ((r1x2 - n1 * (n1 + 1)) / (1.0 * n1 * (ntot - n1)) - 1.0).alias("gini"),
    )


@register(
    "ml_auc_monitor_segments",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT event_type AS segment, CAST(floor(s * 1024) AS BIGINT) AS b,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1, 2
    ), c AS (
      SELECT segment, b, n, np,
             CAST(coalesce(sum(n) OVER (PARTITION BY segment ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_n
      FROM g
    ), t AS (
      SELECT segment,
             CAST(sum(np) AS BIGINT)                       AS n1,
             CAST(sum(n) AS BIGINT)                        AS ntot,
             CAST(sum(np * (2 * cum_n + n + 1)) AS BIGINT) AS r1x2
      FROM c GROUP BY segment
    )
    SELECT segment, n1 AS n_pos, ntot - n1 AS n_neg,
           (r1x2 - n1 * (n1 + 1)) / (2.0 * n1 * (ntot - n1)) AS auc,
           (r1x2 - n1 * (n1 + 1)) / (1.0 * n1 * (ntot - n1)) - 1.0 AS gini
    FROM t ORDER BY segment
    """,
)
def ml_auc_monitor_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment AUC on the 1024-bin QUANTIZED score — the batch twin
    of the streaming monitor (streaming/stateful.auc_monitor_stream,
    VERDICT r9 #6). A live monitor cannot keep the full score
    distribution per segment, so it bins scores into 1024 fixed buckets
    (two int64[1024] histograms per segment — bounded state); this
    query applies ml_auc_rank_exact's midrank rank-sum identity to the
    SAME binned scores, so stream state folded over any micro-batch
    split reproduces this output bit-for-bit (histogram accumulation is
    order-independent; parity asserted in tests/test_streaming.py).
    Binned AUC differs from exact AUC only by within-bin tie
    collapsing — at 1024 bins the difference is below monitoring
    resolution, and the exact variant stays available in batch
    (ml_auc_rank_exact).

    Scale: one map-side bin assignment, one (segment, bin) partial-agg
    shuffle (≤ 1024 rows per segment after it), and a per-segment
    window over ≤ 1024 rows — every exchange keys on segment."""
    sc = _scored(spark, sf_dir)
    from pyspark.sql import Window

    g = sc.groupBy(
        F.col("event_type").alias("segment"),
        F.floor(F.col("s") * 1024).cast("long").alias("b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    w = Window.partitionBy("segment").orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    c = g.withColumn("cum_n", F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long"))
    t = c.groupBy("segment").agg(
        F.sum("np").cast("long").alias("n1"),
        F.sum("n").cast("long").alias("ntot"),
        F.sum(F.col("np") * (2 * F.col("cum_n") + F.col("n") + 1))
        .cast("long")
        .alias("r1x2"),
    )
    n1, ntot, r1x2 = F.col("n1"), F.col("ntot"), F.col("r1x2")
    return t.select(
        "segment",
        n1.alias("n_pos"),
        (ntot - n1).alias("n_neg"),
        ((r1x2 - n1 * (n1 + 1)) / (2.0 * n1 * (ntot - n1))).alias("auc"),
        ((r1x2 - n1 * (n1 + 1)) / (1.0 * n1 * (ntot - n1)) - 1.0).alias("gini"),
    ).orderBy("segment")


@register(
    "ml_lift_gain_deciles",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1
    ), c AS (
      SELECT s, n, np,
             CAST(coalesce(sum(n) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_n
      FROM g
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(np) AS BIGINT) AS nptot
      FROM g
    ), d AS (
      SELECT CAST(floor(c.cum_n * 10.0 / t.ntot) AS BIGINT) AS decile,
             CAST(sum(c.n) AS BIGINT) AS n, CAST(sum(c.np) AS BIGINT) AS np
      FROM c CROSS JOIN t GROUP BY 1
    ), cd AS (
      SELECT decile, n, np,
             CAST(sum(np) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_pos
      FROM d
    )
    SELECT cd.decile, cd.n, cd.np,
           (cd.np * 1.0 / cd.n) / (t.nptot * 1.0 / t.ntot) AS lift,
           cd.cum_pos * 1.0 / t.nptot AS cum_gain
    FROM cd CROSS JOIN t ORDER BY decile
    """,
)
def ml_lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lift and cumulative-gain table by score decile — the campaign-
    targeting readout (top decile should hold ≫10% of positives).
    Equal-count deciles WITHOUT the single-task ntile(): group by
    score value, distributed_prefix_sum in descending-score order
    (order key −s), then decile = floor(10·cum/N) on exact integers —
    score ties stay in one decile (documented; boundary deciles can be
    uneven). Final lift/gain math runs on the 10-row decile frame;
    divisions are written identically in both engines so the chained
    ratios are bit-identical."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum("np").cast("long").alias("nptot"),
    )
    c = distributed_prefix_sum(
        g.withColumn("neg_s", -F.col("s")), ["neg_s"], ["n"]
    )
    d = (
        c.crossJoin(F.broadcast(t))
        .groupBy(
            F.floor(F.col("cum_n") * 10.0 / F.col("ntot")).cast("long").alias("decile")
        )
        .agg(F.sum("n").cast("long").alias("n"), F.sum("np").cast("long").alias("np"))
    )
    cd = distributed_prefix_sum(d, ["decile"], ["np"])
    return (
        cd.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n",
            "np",
            ((F.col("np") * 1.0 / F.col("n")) / (F.col("nptot") * 1.0 / F.col("ntot"))).alias(
                "lift"
            ),
            ((F.col("cum_np") + F.col("np")) * 1.0 / F.col("nptot")).alias("cum_gain"),
        )
        .orderBy("decile")
    )


@register(
    "ml_threshold_sweep",
    oracle=f"""{_SCORED_CTE}, b AS (
      SELECT CAST(floor(s * 10) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(np) AS BIGINT) AS nptot
      FROM b
    ), thr AS (
      SELECT unnest(range(1, 10)) AS i
    ), m AS (
      SELECT thr.i,
             CAST(coalesce(sum(CASE WHEN b.bucket >= thr.i THEN b.np END), 0)
                  AS BIGINT) AS tp,
             CAST(coalesce(sum(CASE WHEN b.bucket >= thr.i THEN b.n - b.np END), 0)
                  AS BIGINT) AS fp
      FROM thr CROSS JOIN b GROUP BY 1
    )
    SELECT m.i / 10.0 AS threshold, m.tp, m.fp,
           t.nptot - m.tp AS fn, (t.ntot - t.nptot) - m.fp AS tn,
           m.tp * 1.0 / nullif(m.tp + m.fp, 0) AS prec,
           m.tp * 1.0 / t.nptot AS recall,
           2.0 * m.tp / nullif(2 * m.tp + m.fp + (t.nptot - m.tp), 0) AS f1
    FROM m CROSS JOIN t ORDER BY threshold
    """,
)
def ml_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 at thresholds 0.1…0.9 —
    the operating-point sweep behind every threshold choice. The trick
    that keeps it one-pass at 100 TB: thresholds align with the
    equal-width score buckets (s ≥ i/10 ⟺ floor(10s) ≥ i, exactly), so
    the fact table collapses to the SAME 10-row bucket aggregate as
    the calibration bins and the 9-threshold sweep is a broadcast join
    over 10×9 rows — never a 9× fact-table explode. F1 in the integer
    form 2tp/(2tp+fp+fn) avoids chaining the precision/recall floats."""
    sc = _scored(spark, sf_dir)
    b = sc.groupBy(F.floor(F.col("s") * 10).cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    t = b.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum("np").cast("long").alias("nptot"),
    )
    thr = spark.range(1, 10).select(F.col("id").cast("long").alias("i"))
    m = (
        F.broadcast(thr)
        .crossJoin(b)
        .groupBy("i")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bucket") >= F.col("i"), F.col("np"))), F.lit(0)
            )
            .cast("long")
            .alias("tp"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") >= F.col("i"), F.col("n") - F.col("np"))),
                F.lit(0),
            )
            .cast("long")
            .alias("fp"),
        )
    )
    tp, fp = F.col("tp"), F.col("fp")
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            (F.col("i") / 10.0).alias("threshold"),
            "tp",
            "fp",
            (F.col("nptot") - tp).alias("fn"),
            ((F.col("ntot") - F.col("nptot")) - fp).alias("tn"),
            (tp * 1.0 / F.nullif(tp + fp, F.lit(0))).alias("prec"),
            (tp * 1.0 / F.col("nptot")).alias("recall"),
            (
                2.0
                * tp
                / F.nullif(2 * tp + fp + (F.col("nptot") - tp), F.lit(0))
            ).alias("f1"),
        )
        .orderBy("threshold")
    )


@register(
    "ml_target_encoding_loo",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_t,
             CAST(sum(y) AS BIGINT) AS np_t
      FROM scored GROUP BY 1
    ), t AS (
      SELECT CAST(count(*) AS BIGINT) AS ntot, CAST(sum(y) AS BIGINT) AS nptot
      FROM scored
    )
    SELECT s.event_id, s.event_type, s.y,
           coalesce((g.np_t - s.y) * 1.0 / nullif(g.n_t - 1, 0),
                    t.nptot * 1.0 / t.ntot) AS te_loo
    FROM scored s JOIN g USING (event_type) CROSS JOIN t
    """,
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of the categorical event_type —
    each row's encoded value is the positive rate of its category
    EXCLUDING itself, the standard leakage guard (plain target
    encoding leaks the row's own label and inflates offline metrics).
    Formulated as aggregate-then-broadcast-join, NOT a window over the
    category: (Σy_type − y)/(n_type − 1) needs only the tiny per-type
    totals, so there is no per-category partition to skew at 100 TB —
    one map-side agg + one broadcast join. Singleton categories fall
    back to the global rate (nullif + coalesce, both engines)."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t"),
        F.sum("y").cast("long").alias("np_t"),
    )
    t = sc.agg(
        F.count(F.lit(1)).cast("long").alias("ntot"),
        F.sum("y").cast("long").alias("nptot"),
    )
    return (
        sc.join(F.broadcast(g), "event_type")
        .crossJoin(F.broadcast(t))
        .select(
            "event_id",
            "event_type",
            "y",
            F.coalesce(
                (F.col("np_t") - F.col("y")) * 1.0 / F.nullif(F.col("n_t") - 1, F.lit(0)),
                F.col("nptot") * 1.0 / F.col("ntot"),
            ).alias("te_loo"),
        )
    )


@register(
    "ml_conformal_interval",
    oracle=f"""{_SCORED_CTE}, sp AS (
      SELECT event_id, event_type, value,
             ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 2
               AS grp
      FROM scored
    ), cal AS (
      SELECT * FROM sp WHERE grp = 0
    ), tst AS (
      SELECT * FROM sp WHERE grp = 1
    ), gv AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS n
      FROM cal GROUP BY 1, 2
    ), gc AS (
      SELECT event_type, value, n,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_t
      FROM gv
    ), med AS (
      SELECT event_type, min(value) AS med FROM gc
      WHERE cum >= CAST(floor((n_t + 1) / 2.0) AS BIGINT) GROUP BY 1
    ), res AS (
      SELECT abs(c.value - m.med) AS r FROM cal c JOIN med m USING (event_type)
    ), rg AS (
      SELECT r, CAST(count(*) AS BIGINT) AS n FROM res GROUP BY 1
    ), rc AS (
      SELECT r, n,
             CAST(sum(n) OVER (ORDER BY r
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM rg
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal
    ), qh AS (
      SELECT min(r) AS q FROM rc CROSS JOIN tot
      WHERE cum >= least(
        CAST(floor((9 * (n_cal + 1) + 9) / 10.0) AS BIGINT), n_cal)
    ), cov AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tst,
             CAST(sum(CASE WHEN abs(t.value - m.med) <= q.q THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM tst t JOIN med m USING (event_type) CROSS JOIN qh q
    )
    SELECT tot.n_cal, cov.n_tst, qh.q AS q_hat,
           cov.covered * 1.0 / cov.n_tst AS coverage
    FROM cov CROSS JOIN qh CROSS JOIN tot
    """,
)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval: md5-hash 50/50 calibration/
    test split (deterministic, repartition-proof), a per-event_type
    median predictor, conformal radius q̂ = the ⌈0.9(n+1)⌉-th smallest
    calibration |residual| (the finite-sample-valid split-conformal
    quantile), and the empirical test coverage of predictor ± q̂ —
    which the conformal guarantee puts at ≥ 0.9 in expectation.

    Everything float-sensitive is an ORDER STATISTIC, not an
    interpolated quantile: the median is the ⌈n/2⌉-th sample and q̂ the
    k-th sample, both selected by exact integer rank (group-by-value +
    cumulative counts), so residuals and the coverage comparison run
    on bit-identical doubles in both engines — no interpolation-
    formula ulp class. The global residual rank rides
    distributed_prefix_sum; per-type medians window over |distinct
    values per type| rows. k caps at n_cal (q̂ = max residual) on tiny
    calibration sets rather than going undefined."""
    sc = _scored(spark, sf_dir)
    grp = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    sp = sc.select("event_id", "event_type", "value", grp.alias("grp"))
    cal = sp.filter(F.col("grp") == 0)
    tst = sp.filter(F.col("grp") == 1)
    from pyspark.sql import Window

    gv = cal.groupBy("event_type", "value").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("event_type")
    gc = gv.select(
        "event_type",
        "value",
        F.sum("n").over(w_cum).cast("long").alias("cum"),
        F.sum("n").over(w_all).cast("long").alias("n_t"),
    )
    med = (
        gc.filter(F.col("cum") >= F.floor((F.col("n_t") + 1) / 2.0).cast("long"))
        .groupBy("event_type")
        .agg(F.min("value").alias("med"))
    )
    res = cal.join(F.broadcast(med), "event_type").select(
        F.abs(F.col("value") - F.col("med")).alias("r")
    )
    rg = res.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n"))
    rc = distributed_prefix_sum(rg, ["r"], ["n"])  # cum_n is EXCLUSIVE
    tot = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    k = F.least(
        F.floor((9 * (F.col("n_cal") + 1) + 9) / 10.0).cast("long"), F.col("n_cal")
    )
    qh = (
        rc.crossJoin(F.broadcast(tot))
        .filter(F.col("cum_n") + F.col("n") >= k)
        .agg(F.min("r").alias("q"))
    )
    cov = (
        tst.join(F.broadcast(med), "event_type")
        .crossJoin(F.broadcast(qh))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tst"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) <= F.col("q"), 1).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return (
        cov.crossJoin(F.broadcast(qh))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_cal",
            "n_tst",
            F.col("q").alias("q_hat"),
            (F.col("covered") * 1.0 / F.col("n_tst")).alias("coverage"),
        )
    )


@register(
    "ml_feature_hashing",
    oracle="""
    WITH f AS (
      SELECT unnest(['et:' || event_type,
                     'u:' || CAST(user_id % 50 AS VARCHAR)]) AS feat
      FROM events
    ), h AS (
      SELECT feat,
             ('0x' || substring(md5(feat), 1, 8))::BIGINT % 64 AS bucket
      FROM f
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT feat) AS BIGINT) AS n_feats
    FROM h GROUP BY 1 ORDER BY bucket
    """,
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: categorical features (event type + a 50-way
    user bucket) hashed into a fixed 64-dim space — the unbounded-
    vocabulary feature encoder (no fitted dictionary to ship, new
    categories land deterministically). md5-derived buckets so both
    engines agree; n_feats per bucket makes hash collisions a measured
    quantity instead of silent signal loss. Map-side explode of 2
    features per row + one 64-key agg — the whole thing partial-
    aggregates before the shuffle at any scale."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.select(
        F.explode(
            F.array(
                F.concat(F.lit("et:"), F.col("event_type")),
                F.concat(F.lit("u:"), (F.col("user_id") % 50).cast("string")),
            )
        ).alias("feat")
    )
    h = f.select(
        "feat",
        (F.conv(F.substring(F.md5("feat"), 1, 8), 16, 10).cast("bigint") % 64).alias(
            "bucket"
        ),
    )
    return (
        h.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("feat").cast("long").alias("n_feats"),
        )
        .orderBy("bucket")
    )


@register(
    "ml_kfold_assignment",
    oracle=f"""{_SCORED_CTE}, f AS (
      SELECT ('0x' || substring(md5('fold:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold,
             y
      FROM scored
    )
    SELECT fold, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
           CAST(sum(y) AS BIGINT) * 1.0 / count(*) AS pos_rate
    FROM f GROUP BY 1 ORDER BY fold
    """,
)
def ml_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation assignment via seeded md5
    buckets ('fold:'‖id — a different hash stream than the conformal
    split, so folds and splits compose independently). Folds are
    disjoint and exhaustive BY CONSTRUCTION (a partition of the hash
    range), repartition/rerun-proof, and need no stored assignment
    table — the property randomSplit() lacks (it reshuffles with the
    partitioning). Output is the per-fold size + label-balance audit a
    CV harness checks before fitting."""
    sc = _scored(spark, sf_dir)
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("event_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 5
    )
    return (
        sc.select(fold.alias("fold"), "y")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
        .select(
            "fold",
            "n",
            "n_pos",
            (F.col("n_pos") * 1.0 / F.col("n")).alias("pos_rate"),
        )
        .orderBy("fold")
    )


@register(
    "ml_average_precision",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1
    ), c AS (
      SELECT s, n, np,
             CAST(coalesce(sum(n) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_n,
             CAST(coalesce(sum(np) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_np
      FROM g
    ), t AS (
      SELECT CAST(sum(n) AS BIGINT) AS ntot, CAST(sum(np) AS BIGINT) AS n1
      FROM g
    ), ap AS (
      SELECT sum((c.np * 1.0 / t.n1)
                 * ((c.cum_np + c.np) * 1.0 / (c.cum_n + c.n))) AS ap
      FROM c CROSS JOIN t
    )
    SELECT t.n1 AS n_pos, t.ntot - t.n1 AS n_neg,
           floor(ap.ap * 1000000 + 0.5) / 1000000 AS avg_prec,
           floor(ap.ap / (t.n1 * 1.0 / t.ntot) * 1000000 + 0.5) / 1000000
             AS ap_lift
    FROM ap CROSS JOIN t
    """,
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve, the
    step-interpolation sklearn uses): AP = Σ_thresholds ΔR·P, one term
    per DISTINCT score descending — the ranking metric that, unlike
    AUC, weights the head of the ranking, which is what matters for
    retrieval-style tasks with rare positives. Completes the ranking
    family (exact AUC + lift/gain + AP). Ties are handled by treating
    each distinct score as one threshold block (deterministic, unlike
    per-row formulations that depend on tie order).

    Same distributed spine as ml_auc_rank_exact: group by score,
    distributed_prefix_sum for the descending cumulative (n, np) —
    never a data-sized ordered window. Each term is a product of two
    exact-integer ratios; only the cross-term SUM (float, summation
    order) needs the q6, with ap_lift = AP over the random baseline
    n_pos/N."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    t = g.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum("np").cast("long").alias("n1"),
    )
    c = distributed_prefix_sum(
        g.withColumn("neg_s", -F.col("s")), ["neg_s"], ["n", "np"]
    )
    ap = (
        c.crossJoin(F.broadcast(t))
        .agg(
            F.sum(
                (F.col("np") * 1.0 / F.col("n1"))
                * (
                    (F.col("cum_np") + F.col("np"))
                    * 1.0
                    / (F.col("cum_n") + F.col("n"))
                )
            ).alias("ap")
        )
    )
    return (
        ap.crossJoin(F.broadcast(t))
        .select(
            F.col("n1").alias("n_pos"),
            (F.col("ntot") - F.col("n1")).alias("n_neg"),
            _q6(F.col("ap")).alias("avg_prec"),
            _q6(F.col("ap") / (F.col("n1") * 1.0 / F.col("ntot"))).alias("ap_lift"),
        )
    )


@register(
    "ml_mrr_by_segment",
    oracle=f"""{_SCORED_CTE}, best AS (
      SELECT event_type, max(CASE WHEN y = 1 THEN s END) AS s_best
      FROM scored GROUP BY 1
    ), rnk AS (
      SELECT s.event_type,
             CAST(sum(CASE WHEN s.s > b.s_best THEN 1 ELSE 0 END) + 1 AS BIGINT)
               AS first_pos_rank,
             CAST(count(*) AS BIGINT) AS n_ranked
      FROM scored s JOIN best b USING (event_type)
      WHERE b.s_best IS NOT NULL
      GROUP BY 1
    )
    SELECT event_type, n_ranked, first_pos_rank,
           1.0 / first_pos_rank AS reciprocal_rank
    FROM rnk ORDER BY event_type
    """,
)
def ml_mrr_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first relevant result per segment (the
    per-query half of MRR, with event_type as the query key): rank of
    the best-scored positive = 1 + count of rows scored strictly
    above it. Computed WITHOUT ranking anything — two aggregates and
    a broadcast join (max positive score per segment, then one
    conditional count against it), so no per-segment sort exists to
    skew at 100 TB; the standard window formulation would funnel each
    segment through one task. Exact integers + one exact division —
    no rounding step. Segments with no positive drop (rank undefined),
    mirrored by the oracle's IS NOT NULL guard."""
    sc = _scored(spark, sf_dir)
    best = sc.groupBy("event_type").agg(
        F.max(F.when(F.col("y") == 1, F.col("s"))).alias("s_best")
    )
    rnk = (
        sc.join(F.broadcast(best.filter(F.col("s_best").isNotNull())), "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum(F.when(F.col("s") > F.col("s_best"), 1).otherwise(0)) + 1)
            .cast("long")
            .alias("first_pos_rank"),
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
        )
    )
    return rnk.select(
        "event_type",
        "n_ranked",
        "first_pos_rank",
        (F.lit(1.0) / F.col("first_pos_rank")).alias("reciprocal_rank"),
    ).orderBy("event_type")


@register(
    "ml_ks_discrimination",
    oracle=f"""{_SCORED_CTE}, g AS (
      SELECT s, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS np
      FROM scored GROUP BY 1
    ), c AS (
      SELECT s,
             CAST(sum(np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum_pos,
             CAST(sum(n - np) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT) AS cum_neg
      FROM g
    ), t AS (
      SELECT CAST(sum(np) AS BIGINT) AS n1, CAST(sum(n - np) AS BIGINT) AS n0
      FROM g
    ), d AS (
      SELECT c.s,
             abs(c.cum_pos * 1.0 / t.n1 - c.cum_neg * 1.0 / t.n0) AS diff
      FROM c CROSS JOIN t
    )
    SELECT t.n1 AS n_pos, t.n0 AS n_neg,
           m.diff AS ks_stat, m.s AS at_score
    FROM (SELECT s, diff FROM d ORDER BY diff DESC, s LIMIT 1) m CROSS JOIN t
    """,
)
def ml_ks_discrimination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov discrimination statistic between the positive
    and negative SCORE distributions — credit scoring's standard
    separation metric (KS ≈ 0 → the model can't tell the classes
    apart; the existing agg_ks_price_drift compares two TIME windows,
    this compares the two LABEL classes). D = max |ECDF₁ − ECDF₀| over
    distinct scores, each ECDF value a single division of exact int64
    cumulative counts (bit-identical across engines), the max taken
    with a smallest-score tiebreak so the argmax row hashes too.

    Same distributed spine as the rank-AUC: group by score,
    distributed_prefix_sum over BOTH class counts, one 1-row totals
    broadcast — never a data-sized ordered window. INCLUSIVE
    cumulatives (dps's exclusive prefix + the row's own count) in both
    engines."""
    sc = _scored(spark, sf_dir)
    g = sc.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    g = g.withColumn("nn", F.col("n") - F.col("np"))
    c = distributed_prefix_sum(g, ["s"], ["np", "nn"])
    t = g.agg(
        F.sum("np").cast("long").alias("n1"),
        F.sum("nn").cast("long").alias("n0"),
    )
    d = (
        c.crossJoin(F.broadcast(t))
        .select(
            "s",
            F.abs(
                (F.col("cum_np") + F.col("np")) * 1.0 / F.col("n1")
                - (F.col("cum_nn") + F.col("nn")) * 1.0 / F.col("n0")
            ).alias("diff"),
        )
    )
    m = d.orderBy(F.desc("diff"), "s").limit(1)
    return (
        m.crossJoin(F.broadcast(t))
        .select(
            F.col("n1").alias("n_pos"),
            F.col("n0").alias("n_neg"),
            F.col("diff").alias("ks_stat"),
            F.col("s").alias("at_score"),
        )
    )
