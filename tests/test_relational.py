"""Relational operator unit tests (SURVEY §2.2-2.4)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import relational as R


def test_null_nan_audit_distinguishes_null_and_nan(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (float("nan"), "b"), (None, None), (2.0, "d")],
        "x double, s string",
    )
    row = R.null_nan_audit(df).collect()[0]
    assert row["x"] == 2  # one NULL + one NaN
    assert row["s"] == 1  # NULLs only for non-fractional


def test_salted_group_count_matches_plain(spark, sf_dir):
    from cse_datapipeline_and_mls_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = {r["event_type"]: r["n"] for r in R.group_count(ev, ["event_type"]).collect()}
    salted = {r["event_type"]: r["n"] for r in R.salted_group_count(ev, "event_type").collect()}
    assert plain == salted


def test_dedup_by_key_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only")],
        "k string, seq int, tag string",
    )
    out = R.dedup_by_key(df, ["k"], order=[F.asc("seq")]).collect()
    got = {r["k"]: r["tag"] for r in out}
    assert got == {"k1": "early", "k2": "only"}


def test_semi_and_anti_partition_rows(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    keep = spark.createDataFrame([(2,), (3,), (4,)], "id int")
    semi = {r["id"] for r in R.semi_filter(df, keep, "id").collect()}
    anti = {r["id"] for r in R.anti_filter(df, keep, "id").collect()}
    assert semi == {2, 3}
    assert anti == {1}
    assert semi | anti == {1, 2, 3}


def test_balanced_weights_inverse_to_frequency(spark):
    df = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "label string")
    out = R.with_balanced_weights(df, "label").collect()
    w = {r["label"]: r["class_weight"] for r in out}
    # total=8, k=2: a -> 8/(2*6)=2/3, b -> 8/(2*2)=2
    assert math.isclose(w["a"], 8 / 12)
    assert math.isclose(w["b"], 2.0)
    # weighted total balances classes
    assert math.isclose(6 * w["a"], 2 * w["b"])


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i, float(i)) for i in range(5)] + [("g2", i, float(-i)) for i in range(3)],
        "g string, id int, v double",
    )
    out = R.top_k_per_group(df, ["g"], [F.desc("v"), F.asc("id")], 2)
    got = {(r["g"], r["rn"]): r["id"] for r in out.collect()}
    assert got == {("g1", 1): 4, ("g1", 2): 3, ("g2", 1): 0, ("g2", 2): 1}


def test_approx_count_distinct_within_error_bound(spark, sf_dir):
    """HLL++ at rsd=0.01 must land within ±5% of the exact distinct count
    per group — turns the rows-only agg_approx_distinct registration into
    a verified estimate (VERDICT r1 item 10)."""
    from cse_datapipeline_and_mls_spark.queries import QUERIES
    from cse_datapipeline_and_mls_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    approx = {
        r["l_returnflag"]: r["n_approx"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.01).alias("n_approx"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["n_exact"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n_exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, n in exact.items():
        rel_err = abs(approx[flag] - n) / n
        assert rel_err <= 0.05, f"{flag}: approx {approx[flag]} vs exact {n} ({rel_err:.1%})"
    # the registered bracket-verdict query must agree: exact side matches,
    # every group's sketch inside the ±2% bracket
    for r in QUERIES["agg_approx_distinct"](spark, sf_dir).collect():
        assert r["n_parts_exact"] == exact[r["l_returnflag"]]
        assert r["within_2pct"], f"{r['l_returnflag']}: sketch outside ±2% bracket"


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """GK sketch at accuracy 10000 must return values whose true RANK is
    within ±0.5% of the requested quantile per group — verifies the
    rows-only agg_approx_percentile registration."""
    from cse_datapipeline_and_mls_spark.queries import QUERIES
    from cse_datapipeline_and_mls_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem")
    qexpr = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)), 10000
    )
    approx = {
        r["l_returnflag"]: list(r["_q"])
        for r in li.groupBy("l_returnflag").agg(qexpr.alias("_q")).collect()
    }
    # the registered bracket-verdict query must report every sketch in-bracket
    for r in QUERIES["agg_approx_percentile"](spark, sf_dir).collect():
        assert r["within_5pct"], f"{r['l_returnflag']}: sketch outside ±5% bracket"
    vals = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        vals.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    assert set(approx) == set(vals)
    for flag, qs in approx.items():
        xs = sorted(vals[flag])
        n = len(xs)
        for q, got in zip([0.25, 0.5, 0.95], qs):
            # rank of the returned value in the exact sorted list
            import bisect

            lo = bisect.bisect_left(xs, got) / n
            hi = bisect.bisect_right(xs, got) / n
            assert lo - 0.005 <= q <= hi + 0.005, (
                f"{flag} q={q}: value {got} spans ranks [{lo:.4f}, {hi:.4f}]"
            )


def _lev(x, y):
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


# adversarial set: position-0 edits ('red'→'ted'), double-endpoint edits
# ('abc' vs 'bd' — one edit at EACH end, the case endpoint blocking can
# never catch), single-char and empty strings, endpoint indels
FUZZY_NAMES = ["red widget", "red widgets", "red widget ", "blue bolt", "blue boltz",
               "small gear", "smal gear", "big gizmo", "red gizmo", "tiny bolt",
               "ted widget", "abc", "bd", "ab", "cd", "a", "b", "", "x gear",
               "smallgear", "bolt", "olt", "oltz", "zbolt", "boltx"]


def test_fuzzy_join_segment_exact_parity_with_brute_force(spark):
    """Segment (PassJoin pigeonhole) blocking == exhaustive levenshtein,
    with NO blocking-contract carve-out — exact parity at distance ≤ 2
    including position-0 and double-endpoint edits (VERDICT r3 task 7)."""
    import itertools

    from cse_datapipeline_and_mls_spark.operators.relational import fuzzy_join_blocked

    df = spark.createDataFrame([(n,) for n in FUZZY_NAMES], "name string")
    a = df.select(F.col("name").alias("name_a"))
    b = df.select(F.col("name").alias("name_b"))
    for tau in (1, 2):
        got = {
            (r["name_a"], r["name_b"], r["edit_distance"])
            for r in fuzzy_join_blocked(a, b, "name_a", "name_b", max_distance=tau)
            .filter(F.col("name_a") < F.col("name_b"))
            .collect()
        }
        want = set()
        for x, y in itertools.combinations(sorted(FUZZY_NAMES), 2):
            d = _lev(x.lower().strip(), y.lower().strip())
            if d <= tau:
                want.add((x, y, d))
        assert got == want, (
            f"tau={tau}: missing={want - got} extra={got - want}"
        )
    assert any(d == 1 for *_, d in got)  # real near-misses exist


def test_fuzzy_join_prefix_mode_contract(spark):
    """Prefix mode (cheap heuristic): the added last-char second pass
    catches single position-0 edits; the documented residual gap is the
    double-endpoint case; the length-band guard still raises; duplicate
    input rows keep their multiplicity (ADVICE r3: no full-row distinct)."""
    import pytest

    from cse_datapipeline_and_mls_spark.operators.relational import fuzzy_join_blocked

    df = spark.createDataFrame([(n,) for n in FUZZY_NAMES], "name string")
    a = df.select(F.col("name").alias("name_a"))
    b = df.select(F.col("name").alias("name_b"))
    got = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_join_blocked(a, b, "name_a", "name_b", max_distance=2,
                                    method="prefix")
        .filter(F.col("name_a") < F.col("name_b"))
        .collect()
    }
    assert ("red widget", "ted widget") in got  # position-0 edit, last-char pass
    assert ("abc", "bd") not in got  # documented double-endpoint gap

    with pytest.raises(ValueError, match="length_band"):
        fuzzy_join_blocked(a, b, "name_a", "name_b", max_distance=5, length_band=4,
                           method="prefix")

    # multiplicity: two identical left rows each match
    dup = spark.createDataFrame([("bolt",), ("bolt",)], "name_a string")
    one = spark.createDataFrame([("bolts",)], "name_b string")
    out = fuzzy_join_blocked(dup, one, "name_a", "name_b", max_distance=2)
    assert out.count() == 2


def test_robust_outlier_stats_flags_planted_outlier(spark):
    """MAD-based modified z-score: a planted extreme value is flagged,
    the bulk is not, and the median/MAD are unmoved by the outlier
    (robustness — the property the mean/stddev z-score lacks)."""
    from cse_datapipeline_and_mls_spark.operators.relational import robust_outlier_stats

    rows = [("g", float(v)) for v in range(1, 20)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = robust_outlier_stats(df, "v", ["k"], z_cut=3.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 20 and r["n_outliers"] == 1
    assert r["med"] == 10.5  # median of 1..19 + outlier barely moves it
    assert r["mad"] == 5.0


def test_linear_trend_recovers_planted_line(spark):
    """regr_* trend agg: a perfect planted line comes back with its
    exact slope/intercept and r2 == 1; a constant series gets slope 0."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [("lin", base + dt.timedelta(days=i), 2.5 * i + 7.0) for i in range(10)]
    rows += [("flat", base + dt.timedelta(days=i), 4.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r["event_type"]: r
        for r in df.groupBy("event_type")
        .agg(
            F.round(F.regr_slope("value", F.unix_timestamp("ts") / 86400.0), 6).alias("slope"),
            F.round(F.regr_r2("value", F.unix_timestamp("ts") / 86400.0), 6).alias("r2"),
        )
        .collect()
    }
    assert out["lin"]["slope"] == 2.5 and out["lin"]["r2"] == 1.0
    assert out["flat"]["slope"] == 0.0


def test_assign_dense_ids_dense_unique_ordered(spark):
    from cse_datapipeline_and_mls_spark.operators.relational import assign_dense_ids

    import pytest as _pytest

    df = spark.createDataFrame(
        [(x,) for x in [50, 3, 99, 1, 42, 7, 68, 21]], "k bigint"
    ).repartition(5)
    out = assign_dense_ids(df, ["k"]).collect()
    ids = sorted(r["dense_id"] for r in out)
    assert ids == list(range(8))
    by_k = {r["k"]: r["dense_id"] for r in out}
    ordered = sorted(by_k)
    assert [by_k[k] for k in ordered] == list(range(8))
    with _pytest.raises(ValueError):
        assign_dense_ids(df, [])


# -- interval_overlap_join ---------------------------------------------------


def _overlap_bruteforce(lefts, rights):
    out = set()
    for li, (ls, le) in lefts:
        for ri, (rs, re) in rights:
            if ls <= re and rs <= le:
                out.add((li, ri))
    return out


def test_interval_overlap_join_matches_bruteforce(spark):
    import datetime as dt
    import random

    rng = random.Random(11)
    base = dt.datetime(2024, 1, 1)

    def mk(n):
        rows = []
        for i in range(n):
            s = base + dt.timedelta(seconds=rng.randrange(0, 86400))
            # interval lengths from instant to multi-bucket (0..2h; bucket=30min)
            e = s + dt.timedelta(seconds=rng.randrange(0, 7200))
            rows.append((i, s, e))
        return rows

    lrows, rrows = mk(60), mk(60)
    left = spark.createDataFrame(lrows, "lid long, a_t0 timestamp, a_t1 timestamp")
    right = spark.createDataFrame(rrows, "rid long, b_t0 timestamp, b_t1 timestamp")
    got = {
        (r["lid"], r["rid"])
        for r in R.interval_overlap_join(
            left, right, "a_t0", "a_t1", "b_t0", "b_t1", 1800
        ).collect()
    }
    expected = _overlap_bruteforce(
        [(i, (s, e)) for i, s, e in lrows], [(i, (s, e)) for i, s, e in rrows]
    )
    assert got == expected


def test_interval_overlap_join_emits_each_pair_once(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    # both intervals span many shared buckets -> would dup without the
    # first-shared-bucket ownership rule
    left = spark.createDataFrame(
        [(1, base, base + dt.timedelta(hours=6))], "lid long, a_t0 timestamp, a_t1 timestamp"
    )
    right = spark.createDataFrame(
        [(2, base + dt.timedelta(hours=1), base + dt.timedelta(hours=9))],
        "rid long, b_t0 timestamp, b_t1 timestamp",
    )
    rows = R.interval_overlap_join(
        left, right, "a_t0", "a_t1", "b_t0", "b_t1", 1800
    ).collect()
    assert len(rows) == 1


def test_interval_overlap_join_touching_endpoints_inclusive(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base, base + dt.timedelta(hours=1))], "lid long, a_t0 timestamp, a_t1 timestamp"
    )
    right = spark.createDataFrame(
        [
            (2, base + dt.timedelta(hours=1), base + dt.timedelta(hours=2)),  # touches
            (3, base + dt.timedelta(hours=1, seconds=1), base + dt.timedelta(hours=2)),
        ],
        "rid long, b_t0 timestamp, b_t1 timestamp",
    )
    got = {
        r["rid"]
        for r in R.interval_overlap_join(
            left, right, "a_t0", "a_t1", "b_t0", "b_t1", 1800
        ).collect()
    }
    assert got == {2}


def test_topn_per_group_uses_window_group_limit(spark):
    """The rank<=N filter must push a WindowGroupLimit below the
    shuffle (map tasks forward only local top-N per group) — the plan
    guarantee the o_topn_per_group query documents."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(g, i, float((i * 37) % 100)) for g in ("a", "b") for i in range(50)],
        "grp string, id long, price double",
    )
    w = Window.partitionBy("grp").orderBy(F.desc("price"), F.asc("id"))
    top = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = top.collect()
    assert len(rows) == 6
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["grp"], []).append(r["price"])
    for g, prices in by_grp.items():
        want = sorted((float((i * 37) % 100) for i in range(50)), reverse=True)[:3]
        assert sorted(prices, reverse=True) == want


def test_distributed_prefix_sum_matches_serial_cumsum(spark):
    """Exclusive running totals over a shuffled input equal the serial
    exclusive cumsum in key order, for two sum columns at once, and
    the first row's prefix is 0 (not NULL)."""
    import random

    from cse_datapipeline_and_mls_spark.operators.relational import (
        distributed_prefix_sum,
    )

    vals = [(k, (k * 7) % 13 + 1, (k * 3) % 5) for k in range(200)]
    shuffled = vals[:]
    random.Random(42).shuffle(shuffled)
    df = spark.createDataFrame(shuffled, "k long, n long, m long")
    out = {
        r["k"]: (r["cum_n"], r["cum_m"])
        for r in distributed_prefix_sum(df, ["k"], ["n", "m"], num_partitions=7).collect()
    }
    run_n = run_m = 0
    for k, n, m in vals:
        assert out[k] == (run_n, run_m)
        run_n += n
        run_m += m


def test_distributed_prefix_sum_requires_cols(spark):
    import pytest as _pytest

    from cse_datapipeline_and_mls_spark.operators.relational import (
        distributed_prefix_sum,
    )

    df = spark.createDataFrame([(1, 1)], "k long, n long")
    with _pytest.raises(ValueError):
        distributed_prefix_sum(df, [], ["n"])
    with _pytest.raises(ValueError):
        distributed_prefix_sum(df, ["k"], [])


def test_mann_whitney_query_matches_numpy_midranks(spark, sf_dir):
    """Independent replay of agg_mann_whitney_u at sf0.001: numpy
    midranks over the raw parquet (argsort-free: strictly-less count +
    half the tie count), textbook U / tie-corrected z — no shared code
    with the engine's grouped prefix-sum formulation."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import (
        agg_mann_whitney_u,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice", "l_returnflag"]
    )
    v = np.asarray(t["l_extendedprice"], dtype=float)
    is_r = np.asarray([f == "R" for f in t["l_returnflag"].to_pylist()])
    order = np.sort(v)
    less = np.searchsorted(order, v, side="left")
    upto = np.searchsorted(order, v, side="right")
    midrank = less + (upto - less + 1) / 2.0
    n1, n2 = int(is_r.sum()), int((~is_r).sum())
    n = n1 + n2
    r1 = float(midrank[is_r].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    _, counts = np.unique(v, return_counts=True)
    ties = float((counts.astype(np.int64) ** 3 - counts).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)

    row = agg_mann_whitney_u(spark, sf_dir).collect()[0]
    assert (row["n_r"], row["n_o"]) == (n1, n2)
    assert row["u_stat"] == u1
    assert abs(row["z_stat"] - z) < 1e-6


def test_spearman_query_matches_numpy(spark, sf_dir):
    """Independent numpy replay of agg_spearman_rank_corr at sf0.001:
    searchsorted midranks for both columns, plain Pearson over them."""
    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import (
        agg_spearman_rank_corr,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )

    def midranks(v):
        order = np.sort(v)
        less = np.searchsorted(order, v, side="left")
        upto = np.searchsorted(order, v, side="right")
        return less + (upto - less + 1) / 2.0

    rx = midranks(np.asarray(t["l_quantity"], dtype=float))
    ry = midranks(np.asarray(t["l_extendedprice"], dtype=float))
    want = float(np.corrcoef(rx, ry)[0, 1])

    row = agg_spearman_rank_corr(spark, sf_dir).collect()[0]
    assert row["n"] == len(rx)
    assert abs(row["spearman_rho"] - want) < 1e-6


def test_ols_price_model_matches_numpy_lstsq(spark, sf_dir):
    """Independent numpy replay of agg_ols_price_model at sf0.001:
    raw least squares via numpy.linalg.lstsq on the dollar-scale
    design matrix — no shared moment/Cramer code with the engine."""
    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import (
        agg_ols_price_model,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount"],
    )
    q = np.asarray(t["l_quantity"], dtype=float)
    y = np.asarray(t["l_extendedprice"], dtype=float)
    d = np.asarray(t["l_discount"], dtype=float) * 100.0  # pct points
    X = np.column_stack([np.ones_like(q), q, d])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    yhat = X @ beta
    r2 = 1.0 - ((y - yhat) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    row = agg_ols_price_model(spark, sf_dir).collect()[0]
    assert row["n"] == len(y)
    assert abs(row["intercept"] - beta[0]) < 1e-5
    assert abs(row["slope_qty"] - beta[1]) < 1e-6
    assert abs(row["slope_disc_pct"] - beta[2]) < 1e-5
    assert abs(row["r2"] - r2) < 5.1e-7  # q6 half-step


def test_hill_tail_index_matches_numpy(spark, sf_dir):
    """Independent numpy replay of agg_hill_tail_index at sf0.001:
    sort prices, take the 500 largest over the 501st as reference."""
    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import (
        agg_hill_tail_index,
    )

    x = np.sort(
        np.asarray(
            pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])[
                "l_extendedprice"
            ],
            dtype=float,
        )
    )[::-1]
    top, ref = x[:500], x[500]
    want = 500.0 / np.log(top / ref).sum()
    row = agg_hill_tail_index(spark, sf_dir).collect()[0]
    assert row["k"] == 500
    assert abs(row["x_ref"] - ref) < 1e-6
    assert abs(row["hill_alpha"] - want) < 1e-6


def test_theilsen_matches_numpy(spark, sf_dir):
    """Independent numpy replay of w_theilsen_daily_trend at sf0.001:
    q6 daily means, all span<=90 pairwise slopes, interpolating
    median."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.windows_q import (
        w_theilsen_daily_trend,
    )

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).to_pandas()
    if t["ts"].dtype.kind in "iu":
        t["ts"] = pd.to_datetime(t["ts"], unit="ns")
    t["x"] = (t["ts"].dt.floor("D") - pd.Timestamp("2024-01-01")).dt.days
    d = t.groupby(["user_id", "x"])["value"].mean().reset_index()
    d["v"] = np.floor(d["value"] * 1e6 + 0.5) / 1e6
    want = {}
    for uid, g in d.groupby("user_id"):
        xs = g["x"].to_numpy()
        vs = g["v"].to_numpy()
        slopes = [
            (vs[j] - vs[i]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
            if 0 < xs[j] - xs[i] <= 90
        ]
        want[uid] = (len(slopes), float(np.median(slopes)))
    rows = w_theilsen_daily_trend(spark, sf_dir).collect()
    assert len(rows) == len(want)
    for r in rows:
        n, med = want[r["user_id"]]
        assert r["n_pairs"] == n
        assert abs(r["theilsen_slope"] - med) < 1e-6


def test_burstiness_matches_numpy(spark, sf_dir):
    """Independent numpy replay of agg_burstiness_hourly at sf0.001:
    full hour spine with zeros, population moments, Fano + (σ−μ)/(σ+μ)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import (
        agg_burstiness_hourly,
    )

    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    ).to_pandas()
    if t["ts"].dtype.kind in "iu":
        t["ts"] = pd.to_datetime(t["ts"], unit="ns")
    t["hour"] = t["ts"].dt.floor("h")
    spine = pd.date_range(t["hour"].min(), t["hour"].max(), freq="h")
    rows = agg_burstiness_hourly(spark, sf_dir).collect()
    assert len(rows) == t["event_type"].nunique()
    for r in rows:
        c = (
            t[t["event_type"] == r["event_type"]]
            .groupby("hour")
            .size()
            .reindex(spine, fill_value=0)
            .to_numpy(dtype=float)
        )
        mu, v = c.mean(), c.var()
        assert r["n_hours"] == len(spine)
        assert r["n_events"] == int(c.sum())
        assert abs(r["fano"] - v / mu) < 1e-6
        assert abs(r["burstiness"] - (np.sqrt(v) - mu) / (np.sqrt(v) + mu)) < 1e-6


def test_lorenz_curve_matches_numpy(spark, sf_dir):
    """Independent numpy replay of agg_lorenz_curve at sf0.001: sort
    customer cent-revenues ascending, prefix-share at each decile."""
    import numpy as np
    import pyarrow.parquet as pq

    from cse_datapipeline_and_mls_spark.queries.analytics_q import agg_lorenz_curve

    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    t["rc"] = np.round(t["o_totalprice"] * 100).astype("int64")
    cr = t.groupby("o_custkey")["rc"].sum().sort_values(kind="stable")
    # tiebreak on custkey: sort by (rc, custkey)
    cr = cr.reset_index().sort_values(["rc", "o_custkey"])["rc"].to_numpy()
    n, tot = len(cr), cr.sum()
    cum = np.concatenate([[0], np.cumsum(cr)])
    rows = agg_lorenz_curve(spark, sf_dir).collect()
    assert [r["pct"] for r in rows] == list(range(10, 100, 10))
    for r in rows:
        k = int(np.floor(n * r["pct"] / 100.0))
        assert r["k_customers"] == k
        assert abs(r["cum_revenue_share"] - cum[k] / tot) < 1e-12
    shares = [r["cum_revenue_share"] for r in rows]
    assert all(a <= b for a, b in zip(shares, shares[1:]))  # monotone
    assert shares[-1] <= 1.0


def test_two_phase_topk_equals_plain_window(spark):
    """two_phase_topk (the hub-skew escape for per-group top-k) must
    equal the plain row_number window on any TOTAL order — exercised on
    a skewed synthetic with a hub group holding most rows, k smaller
    and larger than some group sizes, and duplicate order values broken
    by the id tiebreak."""
    from pyspark.sql import Window, functions as F

    from cse_datapipeline_and_mls_spark.operators.relational import two_phase_topk

    df = spark.range(20000).select(
        F.when(F.col("id") % 4 < 2, F.lit(0))
        .otherwise(F.pmod(F.col("id") * 7919, F.lit(50)) + 1)
        .alias("g"),
        F.pmod(F.col("id") * 104729, F.lit(97)).alias("score"),
        F.col("id"),
    ).localCheckpoint(eager=True)
    order = [F.desc("score"), F.asc("id")]
    for k in (3, 25):
        w = Window.partitionBy("g").orderBy(*order)
        plain = (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
        two = two_phase_topk(df, ["g"], order, k=k, salt_on="id", buckets=8)
        want = sorted(plain.collect())
        got = sorted(two.collect())
        assert got == want, f"k={k}: {len(got)} vs {len(want)}"


def test_two_phase_topk_validates_params(spark):
    import pytest

    from cse_datapipeline_and_mls_spark.operators.relational import two_phase_topk

    df = spark.range(5).select(F.lit(1).alias("g"), F.col("id"))
    with pytest.raises(ValueError, match="k must be"):
        two_phase_topk(df, ["g"], [F.asc("id")], k=0, salt_on="id")
    with pytest.raises(ValueError, match="buckets"):
        two_phase_topk(df, ["g"], [F.asc("id")], k=1, salt_on="id", buckets=1)


def test_mergeable_rollup_states_property(spark):
    """Algebraic-aggregate mergeability on a frame with a FORCED split:
    partial states over arbitrary row subsets merge to exactly the
    full-frame states (count/sum/min/max/sumsq are all int64-exact)."""
    from pyspark.sql import functions as F

    rows = [(i % 3, i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, part long, v long")

    def states(d, by):
        return d.groupBy(*by).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("long").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
        )

    partial = states(df.withColumn("split", F.col("part") % 7), ["k", "split"])
    merged = partial.groupBy("k").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast("long").alias("s"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("ss").cast("long").alias("ss"),
    )
    full = states(df, ["k"])
    a, b = merged.select(*full.columns), full
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
