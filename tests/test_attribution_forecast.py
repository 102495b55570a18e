"""Independent replays for the Markov removal-effect attribution and
the Croston forecaster: both are recomputed from the raw parquet with
pandas/numpy — the attribution one solves the absorption probabilities
EXACTLY with a linear solve (not the engine's T^128 squaring), so the
test also bounds the squaring truncation, not just engine parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cse_datapipeline_and_mls_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
CHANNELS = ["click", "error", "signup", "view"]


def _journeys():
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    # 30-min sessionization in whole epoch seconds (engine convention);
    # pandas loads this parquet as datetime64[us], so int64 is MICROseconds
    sec = (ev["ts"].astype("int64") // 1_000_000).astype("int64")
    new_sess = (
        sec.groupby(ev["user_id"]).diff().isna()
        | (sec.groupby(ev["user_id"]).diff() > 1800)
    ).astype(int)
    ev["sid"] = new_sess.groupby(ev["user_id"]).cumsum()
    paths = []
    for _, grp in ev.groupby(["user_id", "sid"]):
        states = []
        for t in grp["event_type"]:
            if t == "purchase":
                states.append("CONV")
                break
            states.append(t)
        paths.append(states)
    return paths


def _transition_matrix(paths, removed=None):
    states = ["START", *CHANNELS, "CONV", "NULL"]
    idx = {s: i for i, s in enumerate(states)}
    n = np.zeros((len(states), len(states)), dtype=np.int64)
    for p in paths:
        prev = "START"
        for s in p:
            n[idx[prev], idx[s]] += 1
            prev = s
        if prev != "CONV":
            n[idx[prev], idx["NULL"]] += 1
    T = np.zeros_like(n, dtype=float)
    rs = n.sum(axis=1)
    for i in range(len(states)):
        if rs[i] > 0:
            T[i] = n[i] / rs[i]
    T[idx["CONV"], :] = 0.0
    T[idx["CONV"], idx["CONV"]] = 1.0
    T[idx["NULL"], :] = 0.0
    T[idx["NULL"], idx["NULL"]] = 1.0
    if removed is not None:
        r = idx[removed]
        T[:, idx["NULL"]] += T[:, r]
        T[:, r] = 0.0
        T[r, :] = 0.0
        T[r, idx["NULL"]] = 1.0
    return T, idx


def _absorption_p_conv(T, idx):
    """Exact absorption probability into CONV from START via linear
    solve on the transient block — the ground truth the engine's T^128
    squaring approximates (residual <= survival^128, far below 1e-6)."""
    transient = [i for s, i in idx.items() if s not in ("CONV", "NULL")]
    Q = T[np.ix_(transient, transient)]
    r = T[np.ix_(transient, [idx["CONV"]])]
    p = np.linalg.solve(np.eye(len(transient)) - Q, r)
    return float(p[transient.index(idx["START"])])


def test_markov_removal_matches_exact_linear_solve(spark):
    paths = _journeys()
    T, idx = _transition_matrix(paths)
    p_full = _absorption_p_conv(T, idx)
    got = (
        QUERIES["t_attribution_markov_removal"](spark, SF)
        .toPandas()
        .set_index("channel")
    )
    effects = {}
    for c in CHANNELS:
        Tc, idxc = _transition_matrix(paths, removed=c)
        p_c = _absorption_p_conv(Tc, idxc)
        effects[c] = 1.0 - p_c / p_full
        row = got.loc[c]
        assert row["p_conv_full"] == pytest.approx(p_full, abs=2e-6)
        assert row["p_conv_removed"] == pytest.approx(p_c, abs=2e-6)
        assert row["removal_effect"] == pytest.approx(effects[c], abs=2e-5)
    tot = sum(effects.values())
    for c in CHANNELS:
        assert got.loc[c]["attribution_share"] == pytest.approx(
            effects[c] / tot, abs=2e-5
        )
    # shares are a proper distribution
    assert got["attribution_share"].sum() == pytest.approx(1.0, abs=1e-4)


def test_croston_matches_pandas_replay(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    df = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    df["day"] = df["l_shipdate"].dt.date
    df["q"] = np.floor(df["l_quantity"] + 0.5).astype("int64")
    d = df.groupby(["p_brand", "day"])["q"].sum().reset_index()
    got = QUERIES["w_croston_forecast"](spark, SF).toPandas().set_index("brand")
    a, L = 0.2, 64
    for brand, grp in d.groupby("p_brand"):
        grp = grp.sort_values("day").reset_index(drop=True)
        gaps = pd.Series(pd.to_datetime(grp["day"])).diff().dt.days
        tail = grp.iloc[-L:].reset_index(drop=True)
        gtail = gaps.iloc[-L:].reset_index(drop=True)
        w = (1 - a) ** np.arange(len(tail) - 1, -1, -1)
        z_hat = float((w * tail["q"]).sum() / w.sum())
        m = gtail.notna().to_numpy()
        p_hat = float((w[m] * gtail[m]).sum() / w[m].sum())
        row = got.loc[brand]
        assert row["n_demand_days"] == len(grp)
        assert row["z_hat"] == pytest.approx(z_hat, abs=1e-5)
        assert row["p_hat"] == pytest.approx(p_hat, abs=1e-5)
        assert row["croston_forecast"] == pytest.approx(z_hat / p_hat, abs=1e-5)
        assert row["sb_forecast"] == pytest.approx(0.9 * z_hat / p_hat, abs=1e-5)


def test_session_touches_closed_form_matches_brute_force(spark, tmp_path):
    """r11 rewrote _session_touches from joins to closed-form window
    arithmetic (k = conv_rn - 1, first_rn = 1, last_rn = conv_rn - 1,
    all riding one user_id exchange). This pins the rewrite against a
    pandas brute force over RANDOM event streams covering every edge:
    purchase-opens-session (zero-touch), multiple purchases per
    session, sessions with no purchase, single-event sessions."""
    import numpy as np
    import pandas as pd

    from cse_datapipeline_and_mls_spark.queries.attribution_q import (
        _session_touches,
    )

    rng = np.random.default_rng(23)
    rows = []
    eid = 0
    base = pd.Timestamp("2024-01-01")
    for user in range(12):
        t = base + pd.Timedelta(minutes=int(rng.integers(0, 600)))
        for _ in range(int(rng.integers(1, 40))):
            # gaps straddle the 30-min session boundary
            t = t + pd.Timedelta(seconds=int(rng.integers(60, 3600)))
            etype = rng.choice(
                ["view", "click", "search", "purchase"], p=[0.4, 0.25, 0.15, 0.2]
            )
            rows.append((eid, t, user, str(etype), float(rng.integers(1, 100))))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )

    touches, none_convs = _session_touches(spark, str(tmp_path))
    got = (
        touches.select("user_id", "sid", "rn", "channel", "k", "first_rn", "last_rn")
        .orderBy("user_id", "sid", "rn")
        .toPandas()
    )
    got_none = sorted(r["conv_value"] for r in none_convs.collect())

    # brute force: sessionize, find first purchase, everything before it
    want_rows, want_none = [], []
    for user, grp in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        sid, last_ts = 0, None
        sessions: dict[int, list] = {}
        for _, r in grp.iterrows():
            if last_ts is None or (r["ts"] - last_ts).total_seconds() > 1800:
                sid += 1
            last_ts = r["ts"]
            sessions.setdefault(sid, []).append(r)
        for s, evs in sessions.items():
            conv_rn = next(
                (i + 1 for i, r in enumerate(evs) if r["event_type"] == "purchase"),
                None,
            )
            if conv_rn is None:
                continue
            if conv_rn == 1:
                want_none.append(float(evs[0]["value"]))
                continue
            k = conv_rn - 1
            for i in range(k):
                want_rows.append(
                    (user, s, i + 1, evs[i]["event_type"], k, 1, k)
                )
    want = pd.DataFrame(
        want_rows,
        columns=["user_id", "sid", "rn", "channel", "k", "first_rn", "last_rn"],
    ).sort_values(["user_id", "sid", "rn"]).reset_index(drop=True)

    assert len(got) == len(want)
    got_r = got.reset_index(drop=True)
    for col in ["user_id", "sid", "rn", "channel", "k", "first_rn", "last_rn"]:
        assert (got_r[col].astype(want[col].dtype) == want[col]).all(), col
    assert got_none == sorted(want_none)
