"""Independent replays of the experimentation family (experiments_q.py):
each test recomputes the estimator from the raw parquet with pandas /
numpy (no Spark, no shared SQL) and compares against the engine's
output, so a bug that lands symmetrically in the Spark and DuckDB
texts still gets caught.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from cse_datapipeline_and_mls_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _arm_treat(key: int) -> bool:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 2 == 0


@pytest.fixture(scope="module")
def orders() -> pd.DataFrame:
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["year"] = o["o_orderdate"].dt.year
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype("int64")
    o["treat"] = o["o_custkey"].map(_arm_treat)
    return o


def test_srm_counts_replay(spark):
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust["treat"] = cust["c_custkey"].map(_arm_treat)
    got = QUERIES["ab_srm_check"](spark, SF).toPandas().set_index("segment")
    for seg, grp in cust.groupby("c_mktsegment"):
        nt = int(grp["treat"].sum())
        nc = int((~grp["treat"]).sum())
        row = got.loc[seg]
        assert (row["n_treatment"], row["n_control"]) == (nt, nc)
        chi2 = (nt - nc) ** 2 / (nt + nc)
        assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
        assert bool(row["srm_flag"]) == (chi2 > 3.841459)


def test_diff_in_diff_replay(spark, orders):
    o = orders[orders["year"].isin([1995, 1996])]
    cells = {}
    for (t, yr), grp in o.groupby(["treat", "year"]):
        cells[(t, yr)] = grp["cents"].sum() / len(grp) / 100.0
    want = (cells[(True, 1996)] - cells[(True, 1995)]) - (
        cells[(False, 1996)] - cells[(False, 1995)]
    )
    row = QUERIES["ab_diff_in_diff"](spark, SF).toPandas().iloc[0]
    assert row["did_estimate"] == pytest.approx(want, abs=1e-5)
    assert row["mean_treat_pre"] == pytest.approx(cells[(True, 1995)], abs=1e-5)
    assert row["mean_ctrl_post"] == pytest.approx(cells[(False, 1996)], abs=1e-5)


def test_cuped_theta_and_variance_replay(spark, orders):
    cust = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey"]]
    o = orders[orders["year"].isin([1995, 1996])]
    pre = o[o["year"] == 1995].groupby("o_custkey")["cents"].sum()
    post = o[o["year"] == 1996].groupby("o_custkey")["cents"].sum()
    u = cust.assign(
        x=(cust["c_custkey"].map(pre).fillna(0) // 10000).astype("int64"),
        y=(cust["c_custkey"].map(post).fillna(0) // 10000).astype("int64"),
        treat=cust["c_custkey"].map(_arm_treat),
    )
    n = len(u)
    sx, sy = u["x"].sum(), u["y"].sum()
    sxy, sxx = (u["x"] * u["y"]).sum(), (u["x"] * u["x"]).sum()
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    u["y_adj"] = u["y"] - theta * (u["x"] - sx / n)

    got = QUERIES["ab_cuped_adjusted"](spark, SF).toPandas().set_index("arm")
    for arm, is_treat in (("treatment", True), ("control", False)):
        grp = u[u["treat"] == is_treat]
        row = got.loc[arm]
        assert row["n_units"] == len(grp)
        assert row["theta"] == pytest.approx(theta, abs=1e-6)
        assert row["mean_y"] == pytest.approx(grp["y"].mean(), abs=1e-5)
        assert row["mean_y_cuped"] == pytest.approx(grp["y_adj"].mean(), abs=1e-4)
        var_red = 1.0 - grp["y_adj"].var(ddof=0) / grp["y"].var(ddof=0)
        assert row["var_reduction"] == pytest.approx(var_red, abs=1e-6)
        # CUPED with the pooled-OLS theta cannot increase pooled variance;
        # per-arm it should still reduce on a null split of this size.
        assert row["var_reduction"] > 0.0


def test_msprt_replay_and_null_behavior(spark, orders):
    o = orders[orders["year"] == 1995].copy()
    o["day"] = o["o_orderdate"].dt.date
    d = (
        o.groupby(["day", "treat"])["cents"]
        .agg(["sum", "count"])
        .unstack("treat", fill_value=0)
        .sort_index()
    )
    st = d[("sum", True)].cumsum()
    sc = d[("sum", False)].cumsum()
    nt = d[("count", True)].cumsum()
    nc = d[("count", False)].cumsum()
    mask = (nt > 0) & (nc > 0)
    diff = st / nt / 1e8 - sc / nc / 1e8
    v = 0.01 * (1.0 / nt + 1.0 / nc)
    tau2 = 0.0001
    ll = 0.5 * np.log(v / (v + tau2)) + diff**2 * tau2 / (2 * v * (v + tau2))

    got = QUERIES["ab_msprt_sequential"](spark, SF).toPandas()
    assert len(got) == int(mask.sum())
    want = ll[mask].to_numpy()
    np.testing.assert_allclose(got["log_lambda"].to_numpy(), want, atol=1e-5)
    # At sf0.001's n the null split stays under ln(20). (At sf0.01+ it
    # crosses — the documented cluster-randomization illustration:
    # per-customer assignment with per-order observations understates
    # V. This assertion is therefore pinned to THIS fixture, not a
    # general null-behavior claim.)
    assert not got["reject"].any()
    # And it must reject under a real effect: replay with +50% lift on
    # the treatment arm (sf0.001 has ~115 orders/arm in 1995, so the
    # detectable-effect floor is high; 50% clears it with margin).
    diff_l = (st * 1.5) / nt / 1e8 - sc / nc / 1e8
    ll_l = 0.5 * np.log(v / (v + tau2)) + diff_l**2 * tau2 / (2 * v * (v + tau2))
    assert (ll_l[mask] > np.log(20.0)).any()


def test_msprt_unit_of_analysis_pair(spark):
    """The documented clustered-variance illustration, asserted: on the
    SAME null split at sf0.01, the order-grain monitor crosses the
    always-valid boundary (randomization is per customer, observations
    per order -> V understated) while the customer-grain twin stays
    under it. If data regeneration ever changes this, both docstrings
    need rewording — that's what this test is for."""
    sf = "/root/testdata/sf0.01"
    order_grain = QUERIES["ab_msprt_sequential"](spark, sf).toPandas()
    cust_grain = QUERIES["ab_msprt_customer_grain"](spark, sf).toPandas()
    assert order_grain["reject"].any()
    assert not cust_grain["reject"].any()
    assert (cust_grain["log_lambda"] < 0).all()
