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

    With ``partition_by``, files are sized per partition directory by
    repartitioning on the partition columns first (each output task then
    writes one file per directory it owns instead of one per directory per
    task — the classic partitioned-write file explosion).
    """
    df: DataFrame = spark.read.parquet(in_path)
    n_files = plan_compaction(in_path, target_file_bytes)
    if partition_by:
        writer = (
            df.repartition(n_files, *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
        )
    else:
        current = df.rdd.getNumPartitions()
        sized = df.coalesce(n_files) if n_files <= current else df.repartition(n_files)
        writer = sized.write.mode("overwrite")
    writer.parquet(out_path)
    return n_files
