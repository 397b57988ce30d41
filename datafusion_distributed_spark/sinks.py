"""Write-path utilities: sized parquet writes and small-file compaction.

The reference has no write path at all (client-facing RecordBatch stream
only, SURVEY.md §2.5) — but a usable 100 TB pipeline engine needs one, and
the dominant operational failure of long-running pipelines is SMALL FILES:
thousands of KB-scale parquet files per partition turn every downstream scan
into a metadata storm (one task + one footer read per file). Compaction
rewrites a dataset into files of a target size; the file count comes from the
same input-bytes statistic the cost model uses (plans/costing.py), so the
write path and the planner agree about granularity.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .plans.costing import input_bytes

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def plan_compaction(path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES) -> int:
    """Number of output files that packs ``path`` into ~target-size files."""
    return max(1, math.ceil(input_bytes(path) / target_file_bytes))


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite ``in_path`` to ``out_path`` with ~target-size files.

    Uses ``coalesce`` (narrow — no shuffle: at 100 TB re-shuffling the whole
    dataset just to resize files would dwarf the write itself) unless the
    target file count EXCEEDS the current scan parallelism, in which case a
    ``repartition`` is required to fan out. Returns the planned file count.

    With ``partition_by``, files are sized per partition directory via
    ``repartitionByRange`` on (partition columns, deterministic row salt):
    range bounds are SAMPLED from the data, so each directory receives a
    number of output tasks proportional to its row share of ``n_files`` —
    a directory bigger than one target file spans multiple contiguous
    ranges (multiple files), while many small directories pack into one
    task (still one file each, since a task writes one file per directory
    it owns).  A plain ``repartition(n, *partition_by)`` would hash ONLY on
    the partition columns, collapsing every directory to a single task and
    producing one arbitrarily-large file per directory.
    """
    df: DataFrame = spark.read.parquet(in_path)
    n_files = plan_compaction(in_path, target_file_bytes)
    if partition_by:
        # Deterministic salt (hash of the full row) — rand() would re-draw
        # on task retry and range-partitioning over a non-deterministic
        # column can duplicate/drop rows under retries.
        salt = F.pmod(F.hash(*df.columns), F.lit(1 << 20)).alias("_file_salt")
        writer = (
            df.withColumn("_file_salt", salt)
            .repartitionByRange(n_files, *partition_by, "_file_salt")
            .drop("_file_salt")
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    else:
        current = df.rdd.getNumPartitions()
        sized = df.coalesce(n_files) if n_files <= current else df.repartition(n_files)
        writer = sized.write.mode("overwrite")
    writer.parquet(out_path)
    return n_files


def write_range_clustered(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    cluster_by: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> int:
    """Rewrite a dataset RANGE-CLUSTERED on ``cluster_by``: global range
    partitioning (sampled bounds) + an in-partition sort, so each output
    file covers a narrow, near-disjoint range of the cluster key.

    This is the scan-side layout optimization for a 100 TB store: parquet
    footers carry per-file/rowgroup min-max for the cluster columns, so a
    range predicate on them prunes whole files before any IO (the same
    effect the reference gets from splitting scans into file groups at the
    source, /root/reference/src/events/defaults/file_scan_config.rs:36-86 —
    but persisted into the layout instead of recomputed per query). Cost:
    one range shuffle at write time, amortized over every later scan.
    Returns the planned file count.
    """
    df: DataFrame = spark.read.parquet(in_path)
    n_files = plan_compaction(in_path, target_file_bytes)
    cols = [F.col(c) for c in cluster_by]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


def write_zorder_clustered(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    cluster_by: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    bits_per_dim: int = 16,
) -> int:
    """Rewrite a dataset Z-ORDER-CLUSTERED on two-or-more numeric columns:
    each column is scaled to a ``bits_per_dim``-bit rank between its global
    min/max, the ranks are bit-interleaved into one Morton (Z) value, and
    the data is range-partitioned + sorted on that value.

    Why this exists next to write_range_clustered: linear clustering makes
    footer stats tight in ONE dimension — a predicate on any other column
    prunes nothing. The Z-curve keeps files spatially local in EVERY
    cluster dimension at once, so a selective predicate on ANY of them
    shrinks the candidate file set (the Delta/Iceberg OPTIMIZE ZORDER
    layout, applied with plain open-source Spark primitives). The min/max
    fetch is a 1-row aggregate (metadata-scale, like the IVF centroid
    fetch); the interleave is pure integer bit arithmetic in codegen; the
    only data-scale cost is the same single range shuffle the linear
    cluster pays. Returns the planned file count.
    """
    df: DataFrame = spark.read.parquet(in_path)
    n_files = plan_compaction(in_path, target_file_bytes)
    if len(cluster_by) * bits_per_dim > 62:
        raise ValueError(
            f"z-value needs {len(cluster_by) * bits_per_dim} bits, max 62 "
            f"(signed long); lower bits_per_dim for {len(cluster_by)} dims"
        )

    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cluster_by],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cluster_by],
    ).collect()[0]

    top = (1 << bits_per_dim) - 1
    n_dims = len(cluster_by)
    z = F.lit(0).cast("long")
    for d, c in enumerate(cluster_by):
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1.0
        rank = F.floor(
            (F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * top
        ).cast("long")
        rank = F.greatest(F.lit(0), F.least(F.lit(top), rank))
        for i in range(bits_per_dim):
            bit = F.shiftright(rank, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n_dims + d)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    delta_path: str,
    out_path: str,
    key: list[str],
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> dict:
    """MERGE a delta dataset into a base dataset by key (upsert): rows whose
    key appears in the delta take the delta's values ("WHEN MATCHED THEN
    UPDATE"), unmatched delta rows are inserted, unmatched base rows are
    kept. Open-source Spark has no MERGE INTO without a table format; this
    is the same semantics as one full-outer join + per-column precedence,
    written back with compaction-grade file sizing.

    Scale shape: ONE key-hash shuffle join (AQE broadcasts a small delta —
    the common incremental-refresh case — and skew-splits a hot key); the
    rewrite cost is O(base + delta), which is what any copy-on-write MERGE
    pays without file-level pruning metadata. Duplicate keys within the
    delta are rejected loudly rather than resolved arbitrarily — silent
    last-writer-wins across partitions is nondeterministic under retries.
    Returns {"updated": n, "inserted": n, "kept": n}.
    """
    base: DataFrame = spark.read.parquet(base_path)
    delta: DataFrame = spark.read.parquet(delta_path)
    if base.columns != delta.columns:
        raise ValueError(
            f"merge_upsert: schema mismatch base={base.columns} delta={delta.columns}"
        )
    dup = delta.groupBy(*key).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(f"merge_upsert: duplicate key in delta: {dup[0]}")

    value_cols = [c for c in base.columns if c not in key]
    b = base.select(
        *key, *[F.col(c).alias(f"_b_{c}") for c in value_cols], F.lit(1).alias("_in_b")
    )
    d = delta.select(
        *key, *[F.col(c).alias(f"_d_{c}") for c in value_cols], F.lit(1).alias("_in_d")
    )
    merged = b.join(d, key, "full_outer").select(
        *key,
        *[
            F.when(F.col("_in_d").isNotNull(), F.col(f"_d_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in value_cols
        ],
        F.col("_in_b").isNotNull().alias("_was_base"),
        F.col("_in_d").isNotNull().alias("_was_delta"),
    )
    counts = merged.agg(
        F.sum(F.when(F.col("_was_base") & F.col("_was_delta"), 1).otherwise(0)).alias("updated"),
        F.sum(F.when(~F.col("_was_base") & F.col("_was_delta"), 1).otherwise(0)).alias("inserted"),
        F.sum(F.when(F.col("_was_base") & ~F.col("_was_delta"), 1).otherwise(0)).alias("kept"),
    ).collect()[0]
    out = merged.drop("_was_base", "_was_delta")
    n_files = max(
        1,
        plan_compaction(base_path, target_file_bytes),
    )
    sized = out.coalesce(n_files) if n_files <= out.rdd.getNumPartitions() else out
    sized.write.mode("overwrite").parquet(out_path)
    return {"updated": counts["updated"], "inserted": counts["inserted"], "kept": counts["kept"]}
