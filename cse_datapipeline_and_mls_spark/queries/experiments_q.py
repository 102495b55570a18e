"""Experimentation / causal-inference queries: the A/B-testing surface a
production analytics engine sits under (the reference pipeline feeds
dashboards and model scores; the natural next consumer is an experiment
readout on the same fact tables).

Family members:

* ``ab_srm_check`` — sample-ratio-mismatch audit of a deterministic
  50/50 hash assignment (the first gate of any experiment readout).
* ``ab_diff_in_diff`` — two-period, two-arm difference-in-differences
  estimate on order value.
* ``ab_cuped_adjusted`` — CUPED variance reduction (Deng et al., WSDM
  2013): pre-period covariate regression adjustment, theta from exact
  integer moment sums.
* ``ab_msprt_sequential`` — daily always-valid sequential monitor
  (mixture-SPRT log-likelihood ratio, normal mixture prior).

Determinism rules (FIXTURES.md §6) applied throughout: arm assignment
is the registry's md5-hex-prefix hash (x_hash_split_train_test
convention) so the split is identical across engines and repartitions;
monetary sums ride exact int64 cents; every order-sensitive float
reduction lands in q6; scalar ratios are single IEEE divisions of
exact integers wherever possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.numeric import q6 as _q6
from ..operators.tswindow import spine_window
from ..sources import load_table
from . import register

# The SQL twin of the engine-wide quantizer (must be used verbatim; the
# placeholder is parenthesized so expressions with top-level +/- can't
# rebind against the * 1000000).
_Q6 = "floor(({}) * 1000000 + 0.5) / 1000000"

# Deterministic 50/50 arm assignment from the unit key — md5 hex prefix
# like x_hash_split_train_test, so the assignment never moves under
# repartitioning and both engines agree bit-for-bit.
_ARM_SQL = (
    "CASE WHEN ('0x' || substring(md5(CAST({k} AS VARCHAR)), 1, 8))::BIGINT % 2 = 0"
    " THEN 'treatment' ELSE 'control' END"
)


def _arm(key) -> F.Column:
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 2
    )
    return F.when(bucket == 0, "treatment").otherwise("control")


@register(
    "ab_srm_check",
    oracle=f"""
    WITH a AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN {_ARM_SQL.format(k="c_custkey")} = 'treatment'
                  THEN 1 ELSE 0 END AS t
      FROM customer
    )
    SELECT segment,
           CAST(sum(t) AS BIGINT) AS n_treatment,
           CAST(sum(1 - t) AS BIGINT) AS n_control,
           {_Q6.format("CAST((sum(t) - sum(1 - t)) * (sum(t) - sum(1 - t)) AS DOUBLE) / count(*)")}
             AS chi2,
           {_Q6.format("CAST((sum(t) - sum(1 - t)) * (sum(t) - sum(1 - t)) AS DOUBLE) / count(*)")}
             > 3.841459 AS srm_flag
    FROM a GROUP BY segment ORDER BY segment
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch audit per market segment: a 1-df chi-square
    goodness-of-fit of the observed treatment/control unit counts
    against the designed 50/50 split — for two equal cells the statistic
    collapses to (n_t - n_c)^2 / n, which here is ONE division of exact
    int64 counts (bit-identical across engines; q6 is belt-and-braces).
    flag at the 5% critical value 3.841459.

    Scale: one map-side projection (the hash assignment) + one 5-group
    aggregation — the cheapest possible shape; at 100 TB the cost is
    the customer scan, full stop."""
    cust = load_table(spark, sf_dir, "customer")
    t = (_arm("c_custkey") == "treatment").cast("int")
    g = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.sum(t).cast("long").alias("n_treatment"),
        F.sum(1 - t).cast("long").alias("n_control"),
        F.count(F.lit(1)).alias("n"),
    )
    d = F.col("n_treatment") - F.col("n_control")
    chi2 = (d * d).cast("double") / F.col("n")
    return g.select(
        "segment",
        "n_treatment",
        "n_control",
        _q6(chi2).alias("chi2"),
        (_q6(chi2) > 3.841459).alias("srm_flag"),
    ).orderBy("segment")


@register(
    "ab_diff_in_diff",
    oracle=f"""
    WITH o AS (
      SELECT CASE WHEN {_ARM_SQL.format(k="o_custkey")} = 'treatment'
                  THEN 1 ELSE 0 END AS t,
             CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END AS post,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    ), cell AS (
      SELECT
        CAST(sum(CASE WHEN t = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat_pre,
        CAST(sum(CASE WHEN t = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat_post,
        CAST(sum(CASE WHEN t = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl_pre,
        CAST(sum(CASE WHEN t = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl_post,
        CAST(sum(CASE WHEN t = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
        CAST(sum(CASE WHEN t = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_tq,
        CAST(sum(CASE WHEN t = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
        CAST(sum(CASE WHEN t = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_cq
      FROM o
    )
    SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
           {_Q6.format("CAST(s_tp AS DOUBLE) / n_treat_pre / 100.0")} AS mean_treat_pre,
           {_Q6.format("CAST(s_tq AS DOUBLE) / n_treat_post / 100.0")} AS mean_treat_post,
           {_Q6.format("CAST(s_cp AS DOUBLE) / n_ctrl_pre / 100.0")} AS mean_ctrl_pre,
           {_Q6.format("CAST(s_cq AS DOUBLE) / n_ctrl_post / 100.0")} AS mean_ctrl_post,
           {_Q6.format(
               "(CAST(s_tq AS DOUBLE) / n_treat_post / 100.0"
               " - CAST(s_tp AS DOUBLE) / n_treat_pre / 100.0)"
               " - (CAST(s_cq AS DOUBLE) / n_ctrl_post / 100.0"
               " - CAST(s_cp AS DOUBLE) / n_ctrl_pre / 100.0)"
           )} AS did_estimate
    FROM cell
    """,
)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on average order value: pre period
    1995, post period 1996, arms by the customer-key hash. The
    parallel-trends counterfactual gives
    DiD = (T_post - T_pre) - (C_post - C_pre).

    Determinism: the four cell sums are exact int64 cents; each mean is
    two pinned IEEE divisions (sum/n/100); the estimate is arithmetic
    on those four deterministic doubles — q6 output as convention.

    Scale: one orders scan with the year filter pushed down, one
    4-cell conditional aggregation (map-side partial into a single
    reduce) — no join, no window. The 100 TB cost is the scan."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    t = (_arm("o_custkey") == "treatment").cast("int")
    post = (F.year("o_orderdate") == 1996).cast("int")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    o = o.select(t.alias("t"), post.alias("post"), cents.alias("cents"))

    def _cell(tv: int, pv: int, col, zero):
        return F.sum(
            F.when((F.col("t") == tv) & (F.col("post") == pv), col).otherwise(zero)
        ).cast("long")

    cell = o.agg(
        _cell(1, 0, F.lit(1), F.lit(0)).alias("n_treat_pre"),
        _cell(1, 1, F.lit(1), F.lit(0)).alias("n_treat_post"),
        _cell(0, 0, F.lit(1), F.lit(0)).alias("n_ctrl_pre"),
        _cell(0, 1, F.lit(1), F.lit(0)).alias("n_ctrl_post"),
        _cell(1, 0, F.col("cents"), F.lit(0)).alias("s_tp"),
        _cell(1, 1, F.col("cents"), F.lit(0)).alias("s_tq"),
        _cell(0, 0, F.col("cents"), F.lit(0)).alias("s_cp"),
        _cell(0, 1, F.col("cents"), F.lit(0)).alias("s_cq"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n) / F.lit(100.0)  # noqa: E731
    return cell.select(
        "n_treat_pre",
        "n_treat_post",
        "n_ctrl_pre",
        "n_ctrl_post",
        _q6(mean("s_tp", "n_treat_pre")).alias("mean_treat_pre"),
        _q6(mean("s_tq", "n_treat_post")).alias("mean_treat_post"),
        _q6(mean("s_cp", "n_ctrl_pre")).alias("mean_ctrl_pre"),
        _q6(mean("s_cq", "n_ctrl_post")).alias("mean_ctrl_post"),
        _q6(
            (mean("s_tq", "n_treat_post") - mean("s_tp", "n_treat_pre"))
            - (mean("s_cq", "n_ctrl_post") - mean("s_cp", "n_ctrl_pre"))
        ).alias("did_estimate"),
    )


@register(
    "ab_cuped_adjusted",
    oracle=f"""
    WITH u AS (
      SELECT c.c_custkey,
             CASE WHEN {_ARM_SQL.format(k="c.c_custkey")} = 'treatment'
                  THEN 'treatment' ELSE 'control' END AS arm,
             CAST(floor(CAST(coalesce(sum(CASE WHEN year(o.o_orderdate) = 1995
                 THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                 ELSE 0 END), 0) AS DOUBLE) / 10000) AS BIGINT) AS x,
             CAST(floor(CAST(coalesce(sum(CASE WHEN year(o.o_orderdate) = 1996
                 THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                 ELSE 0 END), 0) AS DOUBLE) / 10000) AS BIGINT) AS y
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND year(o.o_orderdate) IN (1995, 1996)
      GROUP BY 1
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM u
    ), th AS (
      SELECT n, CAST(sx AS DOUBLE) / n AS mean_x,
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta
      FROM m
    ), adj AS (
      SELECT u.arm, u.y,
             CAST(u.y AS DOUBLE) - th.theta * (CAST(u.x AS DOUBLE) - th.mean_x)
               AS y_adj,
             th.theta AS theta
      FROM u, th
    )
    SELECT arm,
           CAST(count(*) AS BIGINT) AS n_units,
           {_Q6.format("CAST(sum(y) AS DOUBLE) / count(*)")} AS mean_y,
           {_Q6.format("sum(y_adj) / count(*)")} AS mean_y_cuped,
           {_Q6.format("any_value(theta)")} AS theta,
           {_Q6.format(
               "1.0 - (sum(y_adj * y_adj) / count(*)"
               " - (sum(y_adj) / count(*)) * (sum(y_adj) / count(*)))"
               " / (CAST(sum(y * y) AS DOUBLE) / count(*)"
               " - (CAST(sum(y) AS DOUBLE) / count(*))"
               " * (CAST(sum(y) AS DOUBLE) / count(*)))"
           )} AS var_reduction
    FROM adj GROUP BY arm ORDER BY arm
    """,
)
def ab_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et
    al. WSDM 2013): per-customer post-period metric Y (1996 revenue,
    hundreds of dollars) adjusted by the pre-period covariate X (1995
    revenue) — Y' = Y - theta (X - mean X) with theta = cov(X,Y)/var(X).
    Reports per-arm raw and adjusted means plus the achieved variance
    reduction.

    Determinism: X and Y are exact int64 (cents floored to hundreds of
    dollars — the estimator's documented unit), so the moment sums
    (sx, sy, sxy, sxx) are exact int64. The cross products n*sxy and
    sx*sy would overflow int64 near sf10 (n~1.5e6, E[x^2]~2.6e7 gives
    n*sxx ~ 6e19 > 2^63), so both engine and oracle cast each moment
    to double BEFORE multiplying: theta is then the same short IEEE
    sequence (two multiplies, one subtract, one divide) of exactly
    representable inputs on both sides — deterministic across engines
    at every SF. Only the adjusted-value reductions are float sums,
    landed in q6.

    Scale: one shuffle to the per-customer grain (join + groupBy on
    o_custkey), one 5-number global moment reduce (broadcast back),
    one per-arm aggregation. No data-sized window, no driver loop."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    per = (
        cust.join(o, cust["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.floor(
                F.coalesce(
                    F.sum(F.when(F.year("o_orderdate") == 1995, cents).otherwise(0)),
                    F.lit(0),
                ).cast("double")
                / 10000
            )
            .cast("long")
            .alias("x"),
            F.floor(
                F.coalesce(
                    F.sum(F.when(F.year("o_orderdate") == 1996, cents).otherwise(0)),
                    F.lit(0),
                ).cast("double")
                / 10000
            )
            .cast("long")
            .alias("y"),
        )
        .withColumn("arm", _arm("c_custkey"))
    )
    m = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    ).select(
        "n",
        (F.col("sx").cast("double") / F.col("n")).alias("mean_x"),
        (
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("theta"),
    )
    adj = per.crossJoin(F.broadcast(m)).select(
        "arm",
        "y",
        (
            F.col("y").cast("double")
            - F.col("theta") * (F.col("x").cast("double") - F.col("mean_x"))
        ).alias("y_adj"),
        "theta",
    )
    cnt = F.count(F.lit(1))
    mean_adj = F.sum("y_adj") / cnt
    var_adj = F.sum(F.col("y_adj") * F.col("y_adj")) / cnt - mean_adj * mean_adj
    mean_y = F.sum("y").cast("double") / cnt
    var_y = F.sum(F.col("y") * F.col("y")).cast("double") / cnt - mean_y * mean_y
    return (
        adj.groupBy("arm")
        .agg(
            cnt.cast("long").alias("n_units"),
            _q6(mean_y).alias("mean_y"),
            _q6(mean_adj).alias("mean_y_cuped"),
            _q6(F.first("theta")).alias("theta"),
            _q6(1.0 - var_adj / var_y).alias("var_reduction"),
        )
        .orderBy("arm")
    )


# mSPRT monitoring configuration — pinned literals, like the RSI epsilon:
# metric is order value in M$ (values ~0.15), sigma0^2 the assumed known
# per-observation variance, tau^2 the normal mixture prior on the effect.
_SIGMA0_SQ = 0.01
_TAU_SQ = 0.0001
_LOG_REJECT = 2.995732273553991  # ln(20) <=> always-valid p < 0.05


@register(
    "ab_msprt_sequential",
    oracle=f"""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CASE WHEN {_ARM_SQL.format(k="o_custkey")} = 'treatment'
                  THEN 1 ELSE 0 END AS t,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) = 1995
    ), d AS (
      SELECT day,
             CAST(sum(t) AS BIGINT) AS nt_d,
             CAST(sum(1 - t) AS BIGINT) AS nc_d,
             CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT) AS st_d,
             CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT) AS sc_d
      FROM o GROUP BY day
    ), c AS (
      SELECT day,
             CAST(sum(nt_d) OVER w AS BIGINT) AS n_treat,
             CAST(sum(nc_d) OVER w AS BIGINT) AS n_ctrl,
             CAST(sum(st_d) OVER w AS BIGINT) AS s_treat,
             CAST(sum(sc_d) OVER w AS BIGINT) AS s_ctrl
      FROM d WINDOW w AS (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT day, n_treat, n_ctrl,
             CAST(s_treat AS DOUBLE) / n_treat / 100000000.0
               - CAST(s_ctrl AS DOUBLE) / n_ctrl / 100000000.0 AS diff,
             {_SIGMA0_SQ!r} * (1.0 / n_treat + 1.0 / n_ctrl) AS v
      FROM c WHERE n_treat > 0 AND n_ctrl > 0
    )
    SELECT day, n_treat, n_ctrl,
           {_Q6.format("diff")} AS diff_musd,
           {_Q6.format(
               f"0.5 * ln(v / (v + {_TAU_SQ!r}))"
               f" + (diff * diff * {_TAU_SQ!r}) / (2.0 * v * (v + {_TAU_SQ!r}))"
           )} AS log_lambda,
           {_Q6.format(
               f"0.5 * ln(v / (v + {_TAU_SQ!r}))"
               f" + (diff * diff * {_TAU_SQ!r}) / (2.0 * v * (v + {_TAU_SQ!r}))"
           )} > {_LOG_REJECT!r} AS reject
    FROM s ORDER BY day
    """,
)
def ab_msprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential experiment monitor: the mixture-SPRT
    (Johari et al., 'Peeking at A/B tests', KDD 2017) log-likelihood
    ratio after each 1995 day, for the treatment-vs-control difference
    in mean order value (M$) under a N(0, tau^2) effect prior with
    known per-observation variance sigma0^2:

        log Lambda_t = 1/2 ln(V/(V+tau^2)) + d_t^2 tau^2 / (2V(V+tau^2)),
        V = sigma0^2 (1/n_t + 1/n_c).

    Rejecting when Lambda > 1/alpha (log > ln 20) is an always-valid
    5% test — the peeking-proof replacement for a daily fixed-horizon
    t-test — UNDER ITS MODEL: independent observations with known
    variance. On this data the null split stays under the boundary at
    sf0.001 but CROSSES it from late 1995 at sf0.01+ (diff ~ -14.5 k$,
    z ~ -3.8), and that is the textbook failure the monitor is kept
    here to illustrate: randomization is per CUSTOMER while the
    observations are ORDERS, so the iid variance V understates the
    cluster-randomized truth (between-customer spend heterogeneity
    never averages out within an arm). A production readout feeds the
    monitor CUSTOMER-GRAIN increments (ab_cuped_adjusted's unit
    frame) or inflates V by the design effect; the statistic machinery
    is unchanged either way.

    Determinism: daily and cumulative sums are exact int64 cents over a
    bounded calendar spine (≤365 rows — spine_window names the bound);
    diff and V are pinned IEEE divisions; ln is the only transcendental
    and its ≤1-ulp libm variation sits ~1e-10 below the q6 step.

    Scale: one orders scan (year filter pushed down), one day-grain
    aggregation, one ≤365-row spine window. 100 TB cost = the scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    t = (_arm("o_custkey") == "treatment").cast("int")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    d = (
        o.select(
            F.col("o_orderdate").cast("date").alias("day"),
            t.alias("t"),
            cents.alias("cents"),
        )
        .groupBy("day")
        .agg(
            F.sum("t").cast("long").alias("nt_d"),
            F.sum(1 - F.col("t")).cast("long").alias("nc_d"),
            F.sum(F.when(F.col("t") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("st_d"),
            F.sum(F.when(F.col("t") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sc_d"),
        )
    )
    d, w0 = spine_window(d, ["day"], max_rows=4096, label="msprt_day_spine")
    w = w0.rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "day",
        F.sum("nt_d").over(w).cast("long").alias("n_treat"),
        F.sum("nc_d").over(w).cast("long").alias("n_ctrl"),
        F.sum("st_d").over(w).cast("long").alias("s_treat"),
        F.sum("sc_d").over(w).cast("long").alias("s_ctrl"),
    ).filter((F.col("n_treat") > 0) & (F.col("n_ctrl") > 0))
    diff = (
        F.col("s_treat").cast("double") / F.col("n_treat") / F.lit(100000000.0)
        - F.col("s_ctrl").cast("double") / F.col("n_ctrl") / F.lit(100000000.0)
    )
    v = F.lit(_SIGMA0_SQ) * (1.0 / F.col("n_treat") + 1.0 / F.col("n_ctrl"))
    s = c.select("day", "n_treat", "n_ctrl", diff.alias("diff"), v.alias("v"))
    log_lambda = 0.5 * F.log(F.col("v") / (F.col("v") + _TAU_SQ)) + (
        F.col("diff") * F.col("diff") * F.lit(_TAU_SQ)
    ) / (2.0 * F.col("v") * (F.col("v") + _TAU_SQ))
    return s.select(
        "day",
        "n_treat",
        "n_ctrl",
        _q6(F.col("diff")).alias("diff_musd"),
        _q6(log_lambda).alias("log_lambda"),
        (_q6(log_lambda) > _LOG_REJECT).alias("reject"),
    ).orderBy("day")


# Customer-grain monitor config: per-customer revenue-to-date in M$
# (year-end mean ~0.35, cross-customer variance ~0.09).
_SIGMA0_SQ_CUST = 0.09
_TAU_SQ_CUST = 0.001


@register(
    "ab_msprt_customer_grain",
    oracle=f"""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day, o_custkey,
             CASE WHEN {_ARM_SQL.format(k="o_custkey")} = 'treatment'
                  THEN 1 ELSE 0 END AS t,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders WHERE year(o_orderdate) = 1995
    ), firsts AS (
      SELECT o_custkey, t, min(day) AS first_day FROM o GROUP BY 1, 2
    ), daily_units AS (
      SELECT first_day AS day,
             CAST(sum(t) AS BIGINT) AS ut_d,
             CAST(sum(1 - t) AS BIGINT) AS uc_d
      FROM firsts GROUP BY 1
    ), daily_rev AS (
      SELECT day,
             CAST(sum(CASE WHEN t = 1 THEN cents ELSE 0 END) AS BIGINT) AS st_d,
             CAST(sum(CASE WHEN t = 0 THEN cents ELSE 0 END) AS BIGINT) AS sc_d
      FROM o GROUP BY 1
    ), spine AS (
      SELECT coalesce(u.day, r.day) AS day,
             coalesce(u.ut_d, 0) AS ut_d, coalesce(u.uc_d, 0) AS uc_d,
             coalesce(r.st_d, 0) AS st_d, coalesce(r.sc_d, 0) AS sc_d
      FROM daily_units u FULL OUTER JOIN daily_rev r ON u.day = r.day
    ), c AS (
      SELECT day,
             CAST(sum(ut_d) OVER w AS BIGINT) AS nc_treat,
             CAST(sum(uc_d) OVER w AS BIGINT) AS nc_ctrl,
             CAST(sum(st_d) OVER w AS BIGINT) AS s_treat,
             CAST(sum(sc_d) OVER w AS BIGINT) AS s_ctrl
      FROM spine WINDOW w AS (ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT day, nc_treat, nc_ctrl,
             CAST(s_treat AS DOUBLE) / nc_treat / 100000000.0
               - CAST(s_ctrl AS DOUBLE) / nc_ctrl / 100000000.0 AS diff,
             {_SIGMA0_SQ_CUST!r} * (1.0 / nc_treat + 1.0 / nc_ctrl) AS v
      FROM c WHERE nc_treat > 0 AND nc_ctrl > 0
    )
    SELECT day, nc_treat, nc_ctrl,
           floor((diff) * 1000000 + 0.5) / 1000000 AS diff_musd,
           floor((0.5 * ln(v / (v + {_TAU_SQ_CUST!r}))
                  + (diff * diff * {_TAU_SQ_CUST!r})
                    / (2.0 * v * (v + {_TAU_SQ_CUST!r}))) * 1000000 + 0.5)
             / 1000000 AS log_lambda,
           (floor((0.5 * ln(v / (v + {_TAU_SQ_CUST!r}))
                   + (diff * diff * {_TAU_SQ_CUST!r})
                     / (2.0 * v * (v + {_TAU_SQ_CUST!r}))) * 1000000 + 0.5)
              / 1000000) > {_LOG_REJECT!r} AS reject
    FROM s ORDER BY day
    """,
)
def ab_msprt_customer_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster-robust twin of ab_msprt_sequential: the analysis
    unit matches the RANDOMIZATION unit. Each day's estimate is the
    per-CUSTOMER revenue-to-date difference (cumulative arm revenue /
    cumulative exposed customers, a customer counting from its first
    1995 order), with V = sigma0^2 (1/N_t + 1/N_c) over CUSTOMER
    counts. Where the order-grain monitor crosses the boundary on the
    null split at sf0.01+ (the documented clustered-variance artifact),
    this one stays under it — the pair is the measured argument for
    unit-of-analysis discipline in experiment readouts.

    Determinism and scale: identical shape to the order-grain monitor —
    exact int64 daily/cumulative sums (revenue at order grain, units at
    first-order grain, FULL-OUTER-merged onto one bounded day spine),
    pinned IEEE chain, one orders scan."""
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    t = (_arm("o_custkey") == "treatment").cast("int")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    base = o.select(
        F.col("o_orderdate").cast("date").alias("day"),
        F.col("o_custkey").alias("cust"),
        t.alias("t"),
        cents.alias("cents"),
    )
    firsts = base.groupBy("cust", "t").agg(F.min("day").alias("first_day"))
    daily_units = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.sum("t").cast("long").alias("ut_d"),
        F.sum(1 - F.col("t")).cast("long").alias("uc_d"),
    )
    daily_rev = base.groupBy("day").agg(
        F.sum(F.when(F.col("t") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("st_d"),
        F.sum(F.when(F.col("t") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("sc_d"),
    )
    spine = (
        daily_units.join(daily_rev, "day", "full_outer")
        .select(
            "day",
            F.coalesce("ut_d", F.lit(0)).alias("ut_d"),
            F.coalesce("uc_d", F.lit(0)).alias("uc_d"),
            F.coalesce("st_d", F.lit(0)).alias("st_d"),
            F.coalesce("sc_d", F.lit(0)).alias("sc_d"),
        )
    )
    spine, w0 = spine_window(
        spine, ["day"], max_rows=4096, label="msprt_cust_day_spine"
    )
    w = w0.rowsBetween(Window.unboundedPreceding, 0)
    c = spine.select(
        "day",
        F.sum("ut_d").over(w).cast("long").alias("nc_treat"),
        F.sum("uc_d").over(w).cast("long").alias("nc_ctrl"),
        F.sum("st_d").over(w).cast("long").alias("s_treat"),
        F.sum("sc_d").over(w).cast("long").alias("s_ctrl"),
    ).filter((F.col("nc_treat") > 0) & (F.col("nc_ctrl") > 0))
    diff = (
        F.col("s_treat").cast("double") / F.col("nc_treat") / F.lit(100000000.0)
        - F.col("s_ctrl").cast("double") / F.col("nc_ctrl") / F.lit(100000000.0)
    )
    v = F.lit(_SIGMA0_SQ_CUST) * (1.0 / F.col("nc_treat") + 1.0 / F.col("nc_ctrl"))
    s = c.select("day", "nc_treat", "nc_ctrl", diff.alias("diff"), v.alias("v"))
    log_lambda = 0.5 * F.log(F.col("v") / (F.col("v") + _TAU_SQ_CUST)) + (
        F.col("diff") * F.col("diff") * F.lit(_TAU_SQ_CUST)
    ) / (2.0 * F.col("v") * (F.col("v") + _TAU_SQ_CUST))
    return s.select(
        "day",
        "nc_treat",
        "nc_ctrl",
        _q6(F.col("diff")).alias("diff_musd"),
        _q6(log_lambda).alias("log_lambda"),
        (_q6(log_lambda) > _LOG_REJECT).alias("reject"),
    ).orderBy("day")
