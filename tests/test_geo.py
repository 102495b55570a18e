"""Structural-completeness proofs for the geo operators: the grid-
bucketed radius join and k-NN must equal brute force on seeded random
points (not just on the registry's hash-derived ones), and the 3x3
probe contract must reject an under-sized cell.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import geo as G
from cse_datapipeline_and_mls_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _random_points(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "k": np.arange(1, n + 1, dtype=np.int64),
            "lat": rng.uniform(-90, 90, n),
            "lon": rng.uniform(-180, 180, n),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def _brute_pairs(pdf, r):
    lat = pdf["lat"].to_numpy()
    lon = pdf["lon"].to_numpy()
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    ii, jj = np.where((d2 < r * r) & (np.arange(len(pdf))[:, None] < np.arange(len(pdf))[None, :]))
    ks = pdf["k"].to_numpy()
    return {(int(ks[i]), int(ks[j])) for i, j in zip(ii, jj)}


def _pairs_from_coords(spark, pdf, r, cell=None):
    """Run radius_pairs on explicit coordinates by monkey-patching the
    cell attach step: build the (key, lat, lon, cx, cy) frame directly."""
    df = spark.createDataFrame(pdf)
    cdeg = cell if cell is not None else r
    pts = df.select(
        F.col("k"),
        F.col("lat"),
        F.col("lon"),
        F.floor((F.col("lon") + 180.0) / cdeg).cast("long").alias("cx"),
        F.floor((F.col("lat") + 90.0) / cdeg).cast("long").alias("cy"),
    )
    a = G._nine_cells(pts).select(
        F.col("k").alias("a_key"),
        F.col("lat").alias("a_lat"),
        F.col("lon").alias("a_lon"),
        "px",
        "py",
    )
    b = pts.select(
        F.col("k").alias("b_key"),
        F.col("lat").alias("b_lat"),
        F.col("lon").alias("b_lon"),
        F.col("cx").alias("px"),
        F.col("cy").alias("py"),
    )
    d2 = (F.col("a_lat") - F.col("b_lat")) * (F.col("a_lat") - F.col("b_lat")) + (
        F.col("a_lon") - F.col("b_lon")
    ) * (F.col("a_lon") - F.col("b_lon"))
    out = (
        a.join(b, [a["px"] == b["px"], a["py"] == b["py"]])
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", d2.alias("d2"))
        .filter(F.col("d2") < r * r)
        .collect()
    )
    return {(r_.a_key, r_.b_key) for r_ in out}


@pytest.mark.parametrize("r,cell", [(5.0, None), (5.0, 7.5), (12.0, None)])
def test_bucketed_radius_join_equals_brute_force(spark, r, cell):
    pdf, _ = _random_points(spark)
    got = _pairs_from_coords(spark, pdf, r, cell)
    want = _brute_pairs(pdf, r)
    assert got == want
    assert len(want) > 0  # non-vacuous at these radii


def test_radius_pairs_rejects_undersized_cell(spark):
    df = spark.range(1, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        G.radius_pairs(df, "k", radius_deg=3.0, cell_deg=1.0)


def test_knn_matches_brute_force_on_registry_points(spark):
    got = QUERIES["geo_knn_within_radius"](spark, SF).toPandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey"]]

    def h(k, salt, mod):
        return int(hashlib.md5(f"{k}{salt}".encode()).hexdigest()[:8], 16) % mod

    cust["lat"] = cust["c_custkey"].map(lambda k: h(k, "-lat", 1800000) / 10000.0 - 90.0)
    cust["lon"] = cust["c_custkey"].map(lambda k: h(k, "-lon", 3600000) / 10000.0 - 180.0)
    lat = cust["lat"].to_numpy()
    lon = cust["lon"].to_numpy()
    ks = cust["c_custkey"].to_numpy()
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    want_rows = []
    for i in range(len(ks)):
        nbrs = [(d2[i, j], ks[j]) for j in np.where(d2[i] < 9.0)[0]]
        for rank, (dd, kk) in enumerate(sorted(nbrs)[:3], start=1):
            want_rows.append((int(ks[i]), int(kk), rank))
    want = pd.DataFrame(want_rows, columns=["query_key", "neighbor_key", "rank"])
    got_t = got[["query_key", "neighbor_key", "rank"]].sort_values(
        ["query_key", "rank"]
    )
    pd.testing.assert_frame_equal(
        got_t.reset_index(drop=True),
        want.sort_values(["query_key", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )


def test_rect_join_zone_totals_replay(spark):
    got = QUERIES["geo_point_in_rect_join"](spark, SF).toPandas()
    assert len(got) == 25  # every zone survives, including empty ones
    assert (got["n_inside"] == 0).any() or True  # empties allowed, not required
    cust = pd.read_parquet(f"{SF}/customer.parquet")

    def h(k, salt, mod):
        return int(hashlib.md5(f"{k}{salt}".encode()).hexdigest()[:8], 16) % mod

    cust["lat"] = cust["c_custkey"].map(lambda k: h(k, "-lat", 1800000) / 10000.0 - 90.0)
    cust["lon"] = cust["c_custkey"].map(lambda k: h(k, "-lon", 3600000) / 10000.0 - 180.0)
    cust["cents"] = np.floor(cust["c_acctbal"] * 100 + 0.5).astype("int64")
    for nk in range(25):
        lat0 = (nk * 7919) % 150 - 75
        lat1 = lat0 + 10 + (nk % 7) * 5
        lon0 = (nk * 104729) % 300 - 150
        lon1 = lon0 + 15 + (nk % 5) * 10
        inside = cust[
            (cust["lat"] >= lat0)
            & (cust["lat"] < lat1)
            & (cust["lon"] >= lon0)
            & (cust["lon"] < lon1)
        ]
        row = got[got["zone_key"] == nk].iloc[0]
        assert row["n_inside"] == len(inside)
        assert row["acctbal_total"] == pytest.approx(
            inside["cents"].sum() / 100.0, abs=1e-6
        )


def test_dbscan_matches_pure_python_replay(spark):
    """Independent DBSCAN replay at sf0.01 (sf0.001 is all-noise at
    eps=3): brute-force neighbors in numpy, python union-find-free
    8-round capped min-label propagation — the same estimator contract,
    none of the same code."""
    sf = "/root/testdata/sf0.01"
    cust = pd.read_parquet(f"{sf}/customer.parquet")[["c_custkey"]]

    def h(k, salt, mod):
        return int(hashlib.md5(f"{k}{salt}".encode()).hexdigest()[:8], 16) % mod

    ks = cust["c_custkey"].to_numpy()
    lat = np.array([h(k, "-lat", 1800000) / 10000.0 - 90.0 for k in ks])
    lon = np.array([h(k, "-lon", 3600000) / 10000.0 - 180.0 for k in ks])
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    adj = d2 < 9.0
    deg = adj.sum(axis=1)
    is_core = deg >= 3  # min_pts=4 including self
    # capped 8-round min-label propagation on the core-core graph
    label = {int(ks[i]): int(ks[i]) for i in range(len(ks)) if is_core[i]}
    core_idx = np.where(is_core)[0]
    for _ in range(8):
        new = dict(label)
        for i in core_idx:
            nbr_labels = [
                label[int(ks[j])] for j in np.where(adj[i] & is_core)[0]
            ]
            if nbr_labels:
                new[int(ks[i])] = min(label[int(ks[i])], min(nbr_labels))
        label = new
    want = {}
    for i in range(len(ks)):
        k = int(ks[i])
        if is_core[i]:
            want[k] = ("core", label[k])
        else:
            core_nbrs = [label[int(ks[j])] for j in np.where(adj[i] & is_core)[0]]
            if core_nbrs:
                want[k] = ("border", min(core_nbrs))
            else:
                want[k] = ("noise", None)

    got = QUERIES["geo_dbscan_clusters"](spark, sf).toPandas()
    assert len(got) == len(ks)
    n_roles = got["role"].value_counts().to_dict()
    assert n_roles.get("core", 0) == int(is_core.sum())
    for r in got.itertuples(index=False):
        w_role, w_cluster = want[int(r.custkey)]
        assert r.role == w_role, (r.custkey, r.role, w_role)
        if w_cluster is None:
            assert pd.isna(r.cluster_id)
        else:
            assert int(r.cluster_id) == w_cluster
