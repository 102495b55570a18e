"""Bucketed-table co-located join (SCALE.md join posture): pre-bucketing
both sides on the join key deletes the per-query shuffle entirely —
the recurring-join layout for 100 TB facts."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.sources import load_table
from cse_datapipeline_and_mls_spark.sources.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in the session's default warehouse; DROP TABLE
    # below removes the files again
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        load_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8, "l_orderkey"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    # disable auto-broadcast so the join would otherwise shuffle both sides
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the JOIN itself is exchange-free; the only Exchange is the
        # 5-group aggregation after it
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, f"bucketed join should not shuffle:\n{plan}"
        assert joined.count() == 5
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_unbucketed(spark, bucketed, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    want = sorted(
        map(
            tuple,
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert got == want
