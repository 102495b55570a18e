"""Z-order layout: prefix-rectangle invariant + on-disk skipping effect."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from cse_datapipeline_and_mls_spark.operators import layout as L
from cse_datapipeline_and_mls_spark.sources import load_table

BITS = 8


def test_zorder_prefix_bounds_both_dimensions(spark, sf_dir):
    """Rows sharing a 2k-bit z-prefix agree on the top k bits of both
    bucket values — the exact guarantee parquet min/max skipping needs.
    Checked for every prefix depth k, not just one."""
    li = load_table(spark, sf_dir, "lineitem")
    d = L.add_zorder(
        li,
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")),
        F.col("l_partkey"),
        bits=BITS,
    )
    for k in (2, 3, 4):
        span = 1 << (BITS - k)
        bad = (
            d.groupBy(F.shiftright("zval", 2 * (BITS - k)).alias("chunk"))
            .agg(
                (F.max("bucket_a") - F.min("bucket_a")).alias("sa"),
                (F.max("bucket_b") - F.min("bucket_b")).alias("sb"),
            )
            .filter((F.col("sa") >= span) | (F.col("sb") >= span))
            .count()
        )
        assert bad == 0, f"prefix k={k}: some chunk spans ≥ {span} buckets"


def test_interleave_is_a_bijection_on_buckets(spark):
    """Distinct (a, b) pairs map to distinct z-values (Morton is
    invertible), and z round-trips to the source buckets."""
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("long").alias("b")
    )
    z = df.select("a", "b", L.interleave_bits(F.col("a"), F.col("b"), 4).alias("z"))
    assert z.select("z").distinct().count() == 256
    # decode: gather even bits back into a, odd bits into b
    back = z.select(
        "a",
        "b",
        sum(
            F.shiftleft(F.shiftright("z", 2 * i).bitwiseAND(F.lit(1)), i)
            for i in range(4)
        ).alias("a2"),
        sum(
            F.shiftleft(F.shiftright("z", 2 * i + 1).bitwiseAND(F.lit(1)), i)
            for i in range(4)
        ).alias("b2"),
    )
    assert back.filter((F.col("a") != F.col("a2")) | (F.col("b") != F.col("b2"))).count() == 0


def test_write_zordered_files_prune_two_dimensional_predicates(
    spark, sf_dir, tmp_path
):
    """The written layout's per-file min/max envelopes must let a
    two-dimensional box predicate skip most files — the linear-sort
    layout (sorted by date only) cannot skip on the second dimension."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    zdir = str(tmp_path / "zordered")
    L.write_zordered(
        li,
        zdir,
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")),
        F.col("l_partkey"),
        bits=BITS,
        n_files=16,
    )

    pmax = li.agg(F.max("l_partkey")).collect()[0][0]
    band = (pmax // 10) or 1  # part band ≈ 1/10 of the key space

    def intersecting_files(path: str) -> tuple[int, int]:
        files = sorted(glob.glob(f"{path}/part-*.parquet"))
        hit = 0
        # box predicate: one month (~1/48 of dates) x the part band
        for f in files:
            s = spark.read.parquet(f).agg(
                F.min("l_shipdate").alias("dlo"),
                F.max("l_shipdate").alias("dhi"),
                F.min("l_partkey").alias("plo"),
                F.max("l_partkey").alias("phi"),
            ).collect()[0]
            date_hit = str(s["dlo"]) <= "1995-06-30" and str(s["dhi"]) >= "1995-06-01"
            part_hit = s["plo"] <= band and s["phi"] >= 1
            hit += int(date_hit and part_hit)
        return hit, len(files)

    zhit, ztot = intersecting_files(zdir)
    assert ztot >= 8
    # a date-only sort keeps every file spanning the full part range, so
    # ALL date-matching files are scanned; z-order must skip most files.
    assert zhit <= ztot // 2, f"z-order layout scanned {zhit}/{ztot} files"


def test_plan_file_compaction_quota_and_overflow_bound(spark):
    """Cumulative-quota packing: chunks fill to ~target within each
    group, chunk 0 starts at 0, every chunk's bytes < target + max
    single file, and no file crosses groups."""
    import numpy as np

    from cse_datapipeline_and_mls_spark.operators.layout import (
        plan_file_compaction,
    )

    rng = np.random.default_rng(5)
    rows = [
        (src, int(i), int(rng.integers(50, 400)))
        for src in ("a", "b")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_bytes long")
    out = plan_file_compaction(df, "source", "n_bytes", "doc_id", target_bytes=1000)
    pdf = out.toPandas()
    assert set(pdf.columns) >= {"source", "doc_id", "n_bytes", "_chunk_id"}
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id")
        # chunk ids start at 0 and are non-decreasing in file order
        cids = grp["_chunk_id"].tolist()
        assert cids[0] == 0
        assert all(b - a in (0, 1) for a, b in zip(cids, cids[1:]))
        sizes = grp.groupby("_chunk_id")["n_bytes"].sum()
        mx = grp["n_bytes"].max()
        assert (sizes < 1000 + mx).all()
        # all but the last chunk actually reach the quota (greedy is
        # dense, not sparse)
        assert (sizes.iloc[:-1] + mx >= 1000).all()
