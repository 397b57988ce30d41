"""Sink round-trip: the reference has no write path (client-facing stream
only, SURVEY.md §2.5), but a usable engine needs one — Spark's native
df.write. Round-trip invariants: partitioned write → read-back equals source,
and partition-column filters prune at the source (partition pruning visible
as a fully-filtered scan)."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR

_SCRATCH = "/root/repo/.scratch/sink_roundtrip"


def test_partitioned_parquet_roundtrip(spark):
    li = load_tables(spark, SF_DIR)["lineitem"].select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    shutil.rmtree(_SCRATCH, ignore_errors=True)
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(_SCRATCH)
    back = spark.read.parquet(_SCRATCH)
    src = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.round("l_quantity", 0)).alias("q")
    )
    rt = back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.round("l_quantity", 0)).alias("q")
    )
    assert sorted(map(tuple, src.collect())) == sorted(map(tuple, rt.collect()))
    # partition pruning: filtering on the partition column must not read
    # the other partitions' files
    one = back.filter(F.col("l_returnflag") == "R")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == li.filter(F.col("l_returnflag") == "R").count()
    shutil.rmtree(_SCRATCH, ignore_errors=True)


def test_work_unit_feed_partition_fanout(spark):
    """One InputPartition per discovered work unit: 500 docs / 128-row units
    -> 4 scan partitions (the reference's work-unit -> task mapping)."""
    from datafusion_distributed_spark.sources import register_work_unit_feed

    register_work_unit_feed(spark)
    df = (
        spark.read.format("work_unit_feed")
        .option("path", f"{SF_DIR}/documents.parquet")
        .option("rows_per_unit", "128")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 500


def test_compaction_reduces_file_count(spark):
    """Fragment lineitem into many small files, compact, verify file count
    shrinks and contents round-trip exactly."""
    import glob
    import os

    from datafusion_distributed_spark.sinks import compact_parquet, plan_compaction

    frag = "/root/repo/.scratch/compact_in"
    out = "/root/repo/.scratch/compact_out"
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    li = load_tables(spark, SF_DIR)["lineitem"]
    li.repartition(40).write.mode("overwrite").parquet(frag)
    n_in = len(glob.glob(os.path.join(frag, "part-*.parquet")))
    assert n_in == 40

    n_planned = plan_compaction(frag)  # tiny data -> 1 file at 128 MiB target
    assert n_planned == 1
    n_out = compact_parquet(spark, frag, out)
    assert n_out == 1
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) == 1

    a = sorted(map(tuple, spark.read.parquet(frag).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def test_compaction_partitioned_write_sizes_directories(spark):
    """Partitioned compaction must SIZE files per directory: with a large
    target each directory packs to one file; with a target smaller than a
    directory's bytes, that directory must split into multiple files (range
    partitioning on (partition cols, salt) — a hash on the partition column
    alone would pin every directory to one arbitrarily-large file)."""
    import glob
    import os

    from datafusion_distributed_spark.sinks import compact_parquet

    frag = "/root/repo/.scratch/compact_part_in"
    out = "/root/repo/.scratch/compact_part_out"
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    li = load_tables(spark, SF_DIR)["lineitem"].select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    li.repartition(16).write.mode("overwrite").parquet(frag)

    # Large target -> n_files=1 -> one file per directory.
    compact_parquet(spark, frag, out, partition_by=["l_returnflag"])
    for d in glob.glob(os.path.join(out, "l_returnflag=*")):
        assert len(glob.glob(os.path.join(d, "part-*.parquet"))) == 1
    assert spark.read.parquet(out).count() == li.count()

    # Tiny target (16 KiB) -> n_files >> n_dirs -> the biggest directory
    # must hold MULTIPLE sized files, and contents still round-trip.
    shutil.rmtree(out, ignore_errors=True)
    n_files = compact_parquet(
        spark, frag, out, target_file_bytes=16 * 1024,
        partition_by=["l_returnflag"],
    )
    assert n_files > 3
    per_dir = [
        len(glob.glob(os.path.join(d, "part-*.parquet")))
        for d in glob.glob(os.path.join(out, "l_returnflag=*"))
    ]
    assert max(per_dir) > 1, f"no directory split into sized files: {per_dir}"
    a = sorted(map(tuple, spark.read.parquet(frag).collect()))
    b = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert a == b
    shutil.rmtree(frag, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def test_range_clustered_write_produces_disjoint_file_ranges(spark, tmp_path):
    """write_range_clustered lays files out so their per-file [min, max]
    ranges of the cluster key are non-overlapping (modulo the single
    boundary value shared when a range bound splits a tie) — the property
    that makes footer-stats pruning effective."""
    import pyarrow.parquet as pq

    from datafusion_distributed_spark.sinks import write_range_clustered

    out = str(tmp_path / "clustered")
    # Small target size forces multiple files even at sf0.001.
    write_range_clustered(
        spark,
        f"{SF_DIR}/lineitem.parquet",
        out,
        cluster_by=["l_shipdate"],
        target_file_bytes=16 * 1024,
    )
    ranges = []
    for f in sorted((tmp_path / "clustered").glob("*.parquet")):
        md = pq.read_metadata(str(f))
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                next(
                    i
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
                )
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3, "expected multiple clustered files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        # Adjacent files may share exactly one boundary value; they must
        # never properly interleave.
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # The layout survives a roundtrip with identical data — full multiset
    # equality, not just row count (catches duplicated/dropped/corrupted
    # rows from the range shuffle).
    orig = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    back = spark.read.parquet(out).select(*orig.columns)
    assert back.count() == orig.count()
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_zorder_beats_linear_on_the_other_dimension(spark, tmp_path):
    """The point of the Z-layout: a predicate on the SECOND cluster
    dimension must shrink the candidate file set, where linear clustering
    on the first dimension prunes nothing. Candidates = files whose footer
    [min, max] for the predicate column overlaps the query box."""
    import pyarrow.parquet as pq

    from datafusion_distributed_spark.sinks import (
        write_range_clustered,
        write_zorder_clustered,
    )

    from .conftest import SF_DIR_MED

    src = f"{SF_DIR_MED}/orders.parquet"
    lin, zor = str(tmp_path / "linear"), str(tmp_path / "zorder")
    # force many files so candidate-set sizes are meaningful
    write_range_clustered(spark, src, lin, ["o_custkey"], target_file_bytes=32 * 1024)
    write_zorder_clustered(
        spark, src, zor, ["o_custkey", "o_totalprice"], target_file_bytes=32 * 1024
    )

    def candidates(out_dir: str, col: str, lo: float, hi: float) -> tuple[int, int]:
        total, cand = 0, 0
        for f in sorted((tmp_path / out_dir).glob("*.parquet")):
            md = pq.read_metadata(str(f))
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    if c.path_in_schema == col and c.statistics is not None:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            total += 1
            if mins and not (max(maxs) < lo or min(mins) > hi):
                cand += 1
        return cand, total

    # narrow o_totalprice band — selective in the dimension the linear
    # layout does NOT cluster on
    prices = [
        r.o_totalprice
        for r in spark.read.parquet(src).select("o_totalprice").collect()
    ]
    prices.sort()
    lo, hi = prices[len(prices) // 2], prices[len(prices) // 2 + len(prices) // 20]

    lin_cand, lin_total = candidates("linear", "o_totalprice", lo, hi)
    z_cand, z_total = candidates("zorder", "o_totalprice", lo, hi)
    assert lin_total >= 4 and z_total >= 4, "need multiple files for the claim"
    # linear-by-custkey files all span the full price range
    assert lin_cand == lin_total
    assert z_cand < z_total, "z-order must prune some files on dimension 2"

    # and the rewrite is lossless
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(zor).collect()))
    assert a == b


def test_merge_upsert_semantics(spark, tmp_path):
    """MERGE-by-key: matched keys take delta values, unmatched delta rows
    insert, unmatched base rows survive; duplicate delta keys fail loudly."""
    import pytest as _pytest

    from datafusion_distributed_spark.sinks import merge_upsert

    base_p, delta_p, out_p = (str(tmp_path / n) for n in ("base", "delta", "out"))
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, name string, v int"
    ).write.parquet(base_p)
    spark.createDataFrame(
        [(2, "B2", 200), (4, "d", 40)], "k int, name string, v int"
    ).write.parquet(delta_p)

    stats = merge_upsert(spark, base_p, delta_p, out_p, key=["k"])
    assert stats == {"updated": 1, "inserted": 1, "kept": 2}
    got = sorted(map(tuple, spark.read.parquet(out_p).collect()))
    assert got == [(1, "a", 10), (2, "B2", 200), (3, "c", 30), (4, "d", 40)]

    dup_p = str(tmp_path / "dup")
    spark.createDataFrame(
        [(5, "x", 1), (5, "y", 2)], "k int, name string, v int"
    ).write.parquet(dup_p)
    with _pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(spark, base_p, dup_p, str(tmp_path / "out2"), key=["k"])
