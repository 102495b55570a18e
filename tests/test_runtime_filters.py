"""Runtime Bloom-filter join pruning — the 100 TB shuffle-reduction
mechanism Spark injects for selective shuffle joins: the dimension
side's join keys are folded into a Bloom filter and a
``might_contain`` pre-filter lands directly on the fact scan, cutting
the fact side's shuffle volume BEFORE the exact join runs (false
positives only cost bytes — the join stays exact).

It is on by default in the engine profile; the 10 GB
application-side-scan threshold means it arms exactly at the scale it
pays for, so the test lowers the thresholds to force injection on
local data and asserts (a) the physical plan carries the
bloom_filter_agg → might_contain pair and (b) bloom-on equals
bloom-off row-for-row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.sources import load_table

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _revenue_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hot = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    return (
        li.join(hot, li.l_orderkey == hot.o_orderkey)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


def test_runtime_bloom_filter_injects_and_preserves_results(spark, sf_dir):
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    ), "runtime bloom filtering must stay enabled in the engine profile"

    baseline = _revenue_join(spark, sf_dir).collect()

    old = {k: spark.conf.get(k) for k in _CONFS}
    try:
        for k, v in _CONFS.items():
            spark.conf.set(k, v)
        q = _revenue_join(spark, sf_dir)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        # the pre-filter must sit on the FACT (lineitem) side scan
        fact_side = plan[plan.index("might_contain"):]
        assert "l_orderkey" in fact_side[:300]
        assert q.collect() == baseline  # exact join after the bloom: same rows
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Dynamic partition pruning — the partition-level twin of the Bloom
    filter: when the fact table is PARTITIONED on the join key, the dim
    side's filtered key set prunes whole fact partitions at runtime
    (the scan shows a dynamicpruning subquery instead of reading every
    directory). This is the layout+join contract write_partitioned
    exists for."""
    from cse_datapipeline_and_mls_spark.sources.sinks import write_partitioned

    fact_path = str(tmp_path / "events_by_type")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, fact_path, ["event_type"])

    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 3.0), ("view", 0.5), ("signup", 2.0), ("error", 0.0)],
        "event_type string, weight double",
    ).filter(F.col("weight") >= 3.0)  # selects exactly one partition

    q = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = q.collect()
    assert [r["event_type"] for r in rows] == ["purchase"]
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert rows[0]["n"] == want
