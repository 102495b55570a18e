"""Write-path layout contract (sources/sinks.py): partition pruning,
bounded file sizes, round-trip fidelity."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.sources import load_table
from cse_datapipeline_and_mls_spark.sources.sinks import write_partitioned


def test_write_partitioned_layout_and_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(
        orders,
        path,
        partition_cols=["o_orderstatus"],
        sort_cols=["o_orderdate"],
        max_records_per_file=500,
    )

    # hive-style partition directories, one per status value
    statuses = {r["o_orderstatus"] for r in orders.select("o_orderstatus").distinct().collect()}
    dirs = {os.path.basename(d) for d in glob.glob(f"{path}/o_orderstatus=*")}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    # file sizes bounded: no data file exceeds max_records_per_file
    back = spark.read.parquet(path)
    counts = (
        back.withColumn("_f", F.input_file_name())
        .groupBy("_f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts and all(r["n"] <= 500 for r in counts)

    # round trip loses nothing
    assert back.count() == orders.count()
    a = {tuple(r) for r in orders.select("o_orderkey", "o_totalprice").collect()}
    b = {tuple(r) for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b

    # partition pruning: a status predicate reads only that directory
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    """50-fragment table compacts to the computed file count with
    identical content; sort_cols variant clusters within files."""
    import glob

    from cse_datapipeline_and_mls_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(10_000).selectExpr("id", "id % 7 AS k", "cast(id AS double) AS v")
    df.repartition(50).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 50

    n_files = compact_parquet(spark, src, dst, target_records_per_file=4_000)
    assert n_files == 3
    assert len(glob.glob(f"{dst}/part-*.parquet")) == 3
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").collect()[0][0] == df.selectExpr("sum(id)").collect()[0][0]

    dst2 = str(tmp_path / "clustered")
    compact_parquet(spark, src, dst2, target_records_per_file=4_000, sort_cols=["id"])
    got = [r["id"] for r in spark.read.parquet(dst2).collect()]
    assert sorted(got) == list(range(10_000))


def test_expire_partitions_drops_only_doomed_dirs(spark, tmp_path):
    import glob

    from cse_datapipeline_and_mls_spark.sources.sinks import expire_partitions

    path = str(tmp_path / "retained")
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(["2024-01-01", "2024-01-02", "2024-01-03"])],
        "id long, day string",
    )
    df.write.partitionBy("day").parquet(path)
    dropped = expire_partitions(spark, path, "day", keep_values=["2024-01-03"])
    assert dropped == ["2024-01-01", "2024-01-02"]
    assert len(glob.glob(f"{path}/day=*")) == 1
    back = spark.read.parquet(path).collect()
    assert len(back) == 1 and str(back[0]["day"]) == "2024-01-03"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expire_partitions(spark, path, "day")


def test_write_audit_publish_gates_and_time_travels(spark, tmp_path):
    """WAP contract: a failing audit leaves the published snapshot
    untouched (and removes the poisoned staging dir); a passing audit
    atomically advances the pointer; old versions stay readable."""
    import pytest as _pytest

    from cse_datapipeline_and_mls_spark.operators.expectations import Check
    from cse_datapipeline_and_mls_spark.sources.sinks import (
        AuditFailure,
        read_published,
        read_version,
        write_audit_publish,
    )

    path = str(tmp_path / "wap_table")
    checks = [Check("flag_not_null", "not_null", col="flag")]

    good1 = spark.createDataFrame([(1, "A"), (2, "B")], "pk long, flag string")
    assert write_audit_publish(good1, path, checks) == 1
    assert read_published(spark, path).count() == 2

    bad = spark.createDataFrame([(3, None)], "pk long, flag string")
    with _pytest.raises(AuditFailure) as exc:
        write_audit_publish(bad, path, checks)
    assert exc.value.failures[0][0] == "flag_not_null"
    # publish pointer still at v1; the bad staging dir is gone
    assert read_published(spark, path).count() == 2
    import os

    assert not os.path.exists(f"{path}/v_2")

    good2 = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "pk long, flag string"
    )
    # a new publish lands as v3's predecessor number... the failed v2 slot
    # is reused (pointer-based, not directory-based, versioning)
    v = write_audit_publish(good2, path, checks)
    assert v == 2
    assert read_published(spark, path).count() == 3
    # time travel to the first snapshot
    assert read_version(spark, path, 1).count() == 2


def test_write_audit_publish_concurrent_writers(spark, tmp_path):
    """VERDICT r5 #6: two publishers racing on one table must stage into
    DISJOINT version dirs (O_EXCL claim lease — the loser advances to
    the next number), both versions must be retained, and the pointer
    must land on the max committed version regardless of flip order."""
    import os
    import threading

    from cse_datapipeline_and_mls_spark.operators.expectations import Check
    from cse_datapipeline_and_mls_spark.sources.sinks import (
        read_published,
        read_version,
        write_audit_publish,
    )

    path = str(tmp_path / "wap_race")
    checks = [Check("flag_not_null", "not_null", col="flag")]
    base = spark.createDataFrame([(1, "A")], "pk long, flag string")
    assert write_audit_publish(base, path, checks) == 1

    results: dict[str, int] = {}
    errors: list[BaseException] = []
    barrier = threading.Barrier(2)

    def publish(tag: str, n_rows: int) -> None:
        try:
            df = spark.createDataFrame(
                [(i, tag) for i in range(n_rows)], "pk long, flag string"
            )
            barrier.wait()
            results[tag] = write_audit_publish(df, path, checks)
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    t1 = threading.Thread(target=publish, args=("w1", 2))
    t2 = threading.Thread(target=publish, args=("w2", 3))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors
    # disjoint leases: versions 2 and 3, one each
    assert sorted(results.values()) == [2, 3]
    # both committed versions retained and readable
    assert os.path.isdir(f"{path}/v_2") and os.path.isdir(f"{path}/v_3")
    assert {read_version(spark, path, v).count() for v in (2, 3)} == {2, 3}
    # pointer on the LATER commit even if the lower version flipped last
    with open(f"{path}/_VERSION") as fh:
        assert int(fh.read()) == 3
    winner = [tag for tag, v in results.items() if v == 3][0]
    pub = read_published(spark, path)
    assert pub.count() == (2 if winner == "w1" else 3)
    assert pub.select("flag").distinct().collect()[0][0] == winner
    # the publish lock is released
    assert not os.path.exists(f"{path}/_PUBLISH.lock")


def test_prune_versions_keeps_published_and_recent(spark, tmp_path):
    """Retention never deletes the published snapshot (even when it is
    older than the keep window) and keeps claim files so pruned version
    numbers are never re-leased."""
    import os

    from cse_datapipeline_and_mls_spark.operators.expectations import Check
    from cse_datapipeline_and_mls_spark.sources.sinks import (
        prune_versions,
        read_published,
        write_audit_publish,
    )

    path = str(tmp_path / "wap_prune")
    checks = [Check("flag_not_null", "not_null", col="flag")]
    for i in range(4):
        df = spark.createDataFrame([(i, f"v{i+1}")], "pk long, flag string")
        assert write_audit_publish(df, path, checks) == i + 1
    # roll the pointer back to v1 (time-travel style pin), then prune
    with open(f"{path}/_VERSION", "w") as fh:
        fh.write("1")
    pruned = prune_versions(path, keep_last=2)
    assert pruned == [2]  # v3, v4 recent; v1 published; v2 pruned
    assert os.path.isdir(f"{path}/v_1") and not os.path.isdir(f"{path}/v_2")
    assert read_published(spark, path).count() == 1
    # claim files survive pruning -> the next publish leases v5, not v2
    assert os.path.exists(f"{path}/v_2._claim")
    df = spark.createDataFrame([(9, "v5")], "pk long, flag string")
    assert write_audit_publish(df, path, checks) == 5


def test_wap_releases_claim_on_non_audit_failure(spark, tmp_path):
    """A failure that is NOT an AuditFailure (e.g. the staged write
    itself raising) must still release the version claim and remove the
    partial staged dir — otherwise the slot leaks forever (ADVICE r6)."""
    import pytest as _pytest

    from cse_datapipeline_and_mls_spark.operators.expectations import Check
    from cse_datapipeline_and_mls_spark.sources.sinks import (
        read_published,
        write_audit_publish,
    )

    checks = [Check("id_not_null", "not_null", col="id")]
    root = str(tmp_path / "wap_leak")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    write_audit_publish(df, root, checks)

    # Poison the NEXT staged write: a frame whose evaluation raises.
    bad = spark.createDataFrame([(1,)], "id long").select(
        F.raise_error(F.lit("boom")).alias("id")
    )
    with _pytest.raises(Exception, match="boom"):
        write_audit_publish(bad, root, checks)
    assert not os.path.exists(f"{root}/v_2._claim")  # claim released
    assert not os.path.exists(f"{root}/v_2")  # partial stage removed

    # The slot is reusable: the next good writer takes v_2 and publishes.
    v = write_audit_publish(df, root, checks)
    assert v == 2
    assert read_published(spark, root).count() == 1
