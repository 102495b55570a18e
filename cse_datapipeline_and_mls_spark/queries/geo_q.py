"""Geospatial queries over deterministic pseudo-coordinates
(operators/geo.py): grid hot-spots, bucketed radius self-join, k-NN
within radius, and rectangle containment via broadcast non-equi join.

Why this family: a 100 TB pipeline over customer/event data routinely
carries lat/lon (stores, delivery addresses, device pings); the
operators that matter at that scale are exactly the ones that must NOT
be written as cross joins — radius joins, spatial k-NN, containment.
Each query's Spark plan is the bucketed/broadcast form; each oracle is
the brute-force twin, so the correctness gate proves the bucketed
candidate structure loses no pairs.

Coordinates are derived from integer keys by exact int64 modular
arithmetic (geo.pseudo_lat/lon — x_hash_split_train_test stance), and
the metric is planar squared degrees: +,-,* only, bit-identical across
engines, no libm trig in the hash-checked path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import geo as G
from ..operators.numeric import q6 as _q6
from ..sources import load_table
from . import register

_LAT = G.PSEUDO_LAT_SQL.format(k="c_custkey")
_LON = G.PSEUDO_LON_SQL.format(k="c_custkey")


@register(
    "geo_grid_hotspots",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(floor((({_LON}) + 180.0) / 10.0) AS BIGINT) AS cx,
             CAST(floor((({_LAT}) + 90.0) / 10.0) AS BIGINT) AS cy
      FROM customer
    ), cells AS (
      SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY cx, cy
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS total FROM cells
    ), nbr AS (
      SELECT a.cx, a.cy, a.n,
             CAST(sum(b.n) AS BIGINT) AS nbr_sum
      FROM cells a JOIN cells b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
      GROUP BY a.cx, a.cy, a.n
    )
    SELECT nbr.cx AS cell_x, nbr.cy AS cell_y, nbr.n, nbr.nbr_sum,
           floor((CAST(nbr.nbr_sum AS DOUBLE) / tot.total) * 1000000 + 0.5)
             / 1000000 AS nbr_share
    FROM nbr, tot
    ORDER BY nbr.nbr_sum DESC, nbr.cx, nbr.cy LIMIT 15
    """,
)
def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial hot-spot screen: customer points on a 10-degree grid,
    each occupied cell scored by its 3x3 neighborhood count (the
    Getis-Ord Gi* numerator) — top 15 neighborhoods. The neighbor sum
    is a self-join of the CELL table (|cells| <= 648 rows regardless of
    data size), so the only data-sized work is one groupBy; the range
    join on the tiny cell frame is broadcast.

    Scale: point->cell is map-side; cells are bounded by geometry, not
    data, so every post-aggregation stage is O(1) in the input."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pts = G.with_point_cell(cust, "c_custkey", 10.0)
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("n"))
    total = cells.agg(F.sum("n").cast("long").alias("total"))
    a = cells.select(
        F.col("cx").alias("acx"), F.col("cy").alias("acy"), F.col("n").alias("an")
    )
    b = cells.select(
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"), F.col("n").alias("bn")
    )
    nbr = (
        a.join(
            F.broadcast(b),
            (F.col("bcx") >= F.col("acx") - 1)
            & (F.col("bcx") <= F.col("acx") + 1)
            & (F.col("bcy") >= F.col("acy") - 1)
            & (F.col("bcy") <= F.col("acy") + 1),
        )
        .groupBy("acx", "acy", "an")
        .agg(F.sum("bn").cast("long").alias("nbr_sum"))
    )
    return (
        nbr.crossJoin(F.broadcast(total))
        .select(
            F.col("acx").alias("cell_x"),
            F.col("acy").alias("cell_y"),
            F.col("an").alias("n"),
            "nbr_sum",
            _q6(F.col("nbr_sum").cast("double") / F.col("total")).alias("nbr_share"),
        )
        .orderBy(F.desc("nbr_sum"), "cell_x", "cell_y")
        .limit(15)
    )


@register(
    "geo_radius_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k, {_LAT} AS lat, {_LON} AS lon FROM customer
    )
    SELECT a.k AS a_key, b.k AS b_key,
           floor(((a.lat - b.lat) * (a.lat - b.lat)
                  + (a.lon - b.lon) * (a.lon - b.lon)) * 1000000 + 0.5)
             / 1000000 AS d2
    FROM pts a JOIN pts b ON a.k < b.k
    WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) < 9.0
    ORDER BY a_key, b_key
    """,
)
def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join: every customer pair within 3 planar degrees,
    found by the grid-bucketed candidate join (cell = radius, 3x3
    probe — operators/geo.py:radius_pairs). The ORACLE is the O(n^2)
    brute-force twin, so the hash gate proves the bucketing loses no
    pairs; the ENGINE never builds n^2 — candidates are per-cell
    local density, the one exchange is an equi-join on the cell key.

    Scale: this is the query that separates a spatial engine from a
    cross join at 100 TB — candidate volume tracks density*n, hot
    cells split under AQE, and the same plan serves geodesic metrics
    by swapping the distance expression."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    pairs = G.radius_pairs(cust, "c_custkey", radius_deg=3.0)
    return pairs.select(
        "a_key", "b_key", _q6(F.col("d2")).alias("d2")
    ).orderBy("a_key", "b_key")


@register(
    "geo_knn_within_radius",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS k, {_LAT} AS lat, {_LON} AS lon FROM customer
    ), cand AS (
      SELECT a.k AS query_key, b.k AS neighbor_key,
             (a.lat - b.lat) * (a.lat - b.lat)
             + (a.lon - b.lon) * (a.lon - b.lon) AS d2
      FROM pts a JOIN pts b ON a.k != b.k
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) < 9.0
    )
    SELECT query_key, neighbor_key,
           CAST(row_number() OVER (PARTITION BY query_key
                                   ORDER BY d2, neighbor_key) AS BIGINT) AS rank,
           floor(d2 * 1000000 + 0.5) / 1000000 AS d2
    FROM cand
    QUALIFY row_number() OVER (PARTITION BY query_key
                               ORDER BY d2, neighbor_key) <= 3
    ORDER BY query_key, rank
    """,
)
def geo_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial k-NN (k=3) within a 3-degree radius for every customer
    point — the 'nearest stores / nearest pickup points' shape. Same
    bucketed candidates as geo_radius_pairs (both directions), then a
    per-query-point window ranked by (d2, neighbor key); the window
    frame is the point's radius neighborhood, bounded by local density,
    never data-sized. Ties are impossible to mis-order across engines:
    d2 is exact arithmetic and the key is unique."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    knn = G.knn_within_radius(cust, "c_custkey", radius_deg=3.0, k=3)
    return knn.select(
        "query_key", "neighbor_key", "rank", _q6(F.col("d2")).alias("d2")
    ).orderBy("query_key", "rank")


@register(
    "geo_point_in_rect_join",
    oracle=f"""
    WITH rect AS (
      SELECT n_nationkey,
             CAST((n_nationkey * 7919) % 150 - 75 AS DOUBLE) AS lat0,
             CAST((n_nationkey * 7919) % 150 - 75
                  + 10 + (n_nationkey % 7) * 5 AS DOUBLE) AS lat1,
             CAST((n_nationkey * 104729) % 300 - 150 AS DOUBLE) AS lon0,
             CAST((n_nationkey * 104729) % 300 - 150
                  + 15 + (n_nationkey % 5) * 10 AS DOUBLE) AS lon1
      FROM nation
    ), pts AS (
      SELECT c_custkey, c_acctbal, {_LAT} AS lat, {_LON} AS lon FROM customer
    )
    SELECT rect.n_nationkey AS zone_key,
           CAST(count(pts.c_custkey) AS BIGINT) AS n_inside,
           floor((CAST(coalesce(sum(CAST(floor(pts.c_acctbal * 100 + 0.5) AS BIGINT)), 0)
                  AS DOUBLE) / 100.0) * 1000000 + 0.5) / 1000000 AS acctbal_total
    FROM rect LEFT JOIN pts
      ON pts.lat >= rect.lat0 AND pts.lat < rect.lat1
     AND pts.lon >= rect.lon0 AND pts.lon < rect.lon1
    GROUP BY rect.n_nationkey
    ORDER BY zone_key
    """,
)
def geo_point_in_rect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-rectangle containment join: 25 deterministic zone
    rectangles (derived from nation keys) against all customer points —
    count and account-balance mass per zone. The dim side is tiny, so
    the RIGHT plan is a broadcast non-equi join (BroadcastNestedLoop
    over 25 rows — each point tests 25 rectangles map-side, no
    shuffle); at larger dim cardinality this becomes the grid-bucketed
    form (rectangle -> covered cells, point -> cell, equi-join).
    Zones may overlap and may be empty — LEFT join keeps empty zones
    with n_inside = 0 (count over no rows), exactly as the oracle."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey")
    lat0 = ((F.col("n_nationkey") * 7919) % 150 - 75).cast("double")
    lon0 = ((F.col("n_nationkey") * 104729) % 300 - 150).cast("double")
    rect = nat.select(
        "n_nationkey",
        lat0.alias("lat0"),
        (lat0 + 10 + (F.col("n_nationkey") % 7) * 5).alias("lat1"),
        lon0.alias("lon0"),
        (lon0 + 15 + (F.col("n_nationkey") % 5) * 10).alias("lon1"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    pts = cust.select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("bal_cents"),
        G.pseudo_lat(F.col("c_custkey")).alias("lat"),
        G.pseudo_lon(F.col("c_custkey")).alias("lon"),
    )
    j = pts.join(
        F.broadcast(rect),
        (pts["lat"] >= rect["lat0"])
        & (pts["lat"] < rect["lat1"])
        & (pts["lon"] >= rect["lon0"])
        & (pts["lon"] < rect["lon1"]),
        "inner",
    )
    hit = j.groupBy("n_nationkey").agg(
        F.count("c_custkey").cast("long").alias("n_hit"),
        F.sum("bal_cents").cast("long").alias("cents_hit"),
    )
    # Empty zones survive via the left join back onto the 25-row zone
    # list (the inner BNLJ above broadcasts the rectangle side, which a
    # left-outer plan could not).
    return (
        rect.select("n_nationkey")
        .join(hit, "n_nationkey", "left")
        .select(
            F.col("n_nationkey").alias("zone_key"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_inside"),
            _q6(
                F.coalesce(F.col("cents_hit"), F.lit(0)).cast("double") / 100.0
            ).alias("acctbal_total"),
        )
        .orderBy("zone_key")
    )


def _dbscan_oracle(eps: float, min_pts: int, rounds: int) -> str:
    """Brute-force DBSCAN twin with the SAME capped min-label rounds as
    the engine (the x_label_propagation capped-round contract — a
    recursive closure would explode on a percolating eps-graph)."""
    r2 = eps * eps
    sql = f"""
    WITH pts AS (
      SELECT c_custkey AS k, {_LAT} AS lat, {_LON} AS lon FROM customer
    ), nbr AS MATERIALIZED (
      SELECT a.k AS a_key, b.k AS b_key
      FROM pts a JOIN pts b ON a.k != b.k
      WHERE (a.lat - b.lat) * (a.lat - b.lat)
            + (a.lon - b.lon) * (a.lon - b.lon) < {r2!r}
    ), deg AS (
      SELECT a_key AS k, count(*) AS deg FROM nbr GROUP BY a_key
    ), core AS MATERIALIZED (
      SELECT k FROM deg WHERE deg >= {min_pts - 1}
    ), edges AS MATERIALIZED (
      SELECT n.a_key AS src, n.b_key AS dst FROM nbr n
      JOIN core ca ON ca.k = n.a_key JOIN core cb ON cb.k = n.b_key
    ), l0 AS (
      SELECT k, k AS label FROM core
    )"""
    prev = "l0"
    for i in range(1, rounds + 1):
        sql += f""", l{i} AS MATERIALIZED (
      SELECT l.k,
             least(l.label, coalesce(min(ls.label), l.label)) AS label
      FROM {prev} l
      LEFT JOIN edges e ON e.dst = l.k
      LEFT JOIN {prev} ls ON ls.k = e.src
      GROUP BY l.k, l.label
    )"""
        prev = f"l{i}"
    sql += f"""
    , core_out AS (
      SELECT k AS custkey, 'core' AS role, CAST(label AS BIGINT) AS cluster_id
      FROM {prev}
    ), border_out AS (
      SELECT n.a_key AS custkey, 'border' AS role,
             CAST(min(cl.label) AS BIGINT) AS cluster_id
      FROM nbr n
      JOIN {prev} cl ON cl.k = n.b_key
      WHERE n.a_key NOT IN (SELECT k FROM core)
      GROUP BY n.a_key
    ), noise_out AS (
      SELECT p.k AS custkey, 'noise' AS role, CAST(NULL AS BIGINT) AS cluster_id
      FROM pts p
      WHERE p.k NOT IN (SELECT custkey FROM core_out)
        AND p.k NOT IN (SELECT custkey FROM border_out)
    )
    SELECT custkey, role, cluster_id FROM core_out
    UNION ALL SELECT * FROM border_out
    UNION ALL SELECT * FROM noise_out
    ORDER BY custkey
    """
    return sql


@register("geo_dbscan_clusters", oracle=_dbscan_oracle(eps=3.0, min_pts=4, rounds=8))
def geo_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-accelerated DBSCAN over the customer points (eps = 3
    planar degrees, minPts = 4): density clustering with explicit
    core/border/noise roles — the spatial complement of the embedding
    family's SemDeDup/k-means clustering. Neighborhoods come from the
    3x3 grid-bucketed candidate join (never n^2; the oracle is the
    brute-force twin); cluster ids follow the engine's CAPPED-ROUND
    contract — 8 unrolled min-label rounds on BOTH sides (a recursive
    closure would explode when the eps-graph percolates, exactly as at
    sf0.1 where ~95% of points are core), with
    dedup.connected_components_star as the documented full-closure
    swap at 100 TB. Degrees and labels are exact integer folds, so the
    whole assignment hash-checks with no quantization at all."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    out = G.dbscan_grid(cust, "c_custkey", eps_deg=3.0, min_pts=4, label_rounds=8)
    return out.select(
        F.col("k").alias("custkey"), "role", F.col("cluster_id").cast("long").alias("cluster_id")
    ).orderBy("custkey")
