"""Graph-analytics tour over the part co-purchase graph (edge = two
parts sharing an order).

    python examples/graph_analytics.py [sf_dir]

1. edges      — lineitem self-join per order, canonical a<b, distinct.
2. triangles  — degree-oriented counting (O(|E|^1.5) wedges, hub-safe).
3. clustering — local coefficient 2T/d(d-1), densest neighborhoods.
4. rules      — market-basket support/confidence/lift ("also bought").
5. pagerank   — supplier importance on the customer→supplier graph
                (negated customer key space, collision-free at any SF).
6. diff       — CDC bonus: snapshot_diff of a simulated orders v2,
                replayable through merge_upsert.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cse_datapipeline_and_mls_spark.operators.graph import (  # noqa: E402
    pagerank,
    triangle_counts,
)
from cse_datapipeline_and_mls_spark.operators.relational import (  # noqa: E402
    snapshot_diff,
)
from cse_datapipeline_and_mls_spark.session import get_spark  # noqa: E402
from cse_datapipeline_and_mls_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("graph-analytics-tour")

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("src"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()
    print(f"edges         co-purchase graph: {n_edges} edges")

    t0 = time.time()
    tri = triangle_counts(edges).localCheckpoint(eager=True)
    top = tri.orderBy(F.desc("triangles"), "node").limit(3).collect()
    print(
        f"triangles     {time.time() - t0:5.2f}s  nodes-in-triangles={tri.count()}"
        f"  top={[(r['node'], r['triangles']) for r in top]}"
    )

    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    lcc = tri.join(deg, "node").select(
        "node",
        F.round(
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)), 4
        ).alias("lcc"),
    )
    dense = lcc.orderBy(F.desc("lcc"), "node").limit(3).collect()
    print(f"clustering    densest neighborhoods={[(r['node'], r['lcc']) for r in dense]}")

    from cse_datapipeline_and_mls_spark.queries import QUERIES

    rules = QUERIES["x_association_rules"](spark, sf_dir).limit(3).collect()
    print(
        "rules         top-lift: "
        + ", ".join(f"{r['ant']}→{r['cons']} lift={r['lift']}" for r in rules)
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pe = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select((-F.col("o_custkey")).alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )
    t0 = time.time()
    pr = pagerank(pe, iters=6)
    top_pr = (
        pr.filter(F.col("node") > 0).orderBy(F.desc("rank"), "node").limit(3).collect()
    )
    print(
        f"pagerank      {time.time() - t0:5.2f}s  "
        f"top={[(r['node'], round(r['rank'], 6)) for r in top_pr]}"
    )

    orders = load_table(spark, sf_dir, "orders")
    v2 = orders.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 1.0).otherwise(
            F.col("o_totalprice")
        ),
    )
    d = snapshot_diff(orders, v2, ["o_orderkey"])
    counts = {
        r["change_type"]: r["n"]
        for r in d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"diff          orders v1→v2 changeset: {counts}")


if __name__ == "__main__":
    main()
