"""Cost-based stage sizing: a thin Python estimator feeding Spark confs.

Reference analogue: the distributed planner sizes each stage's task count
from input statistics — bytes per scan partition
(file_scan_config_bytes_per_partition, 16 MiB default,
/root/reference/src/distributed_planner/distributed_config.rs:11-15) and a
CPU-complexity/cardinality factor for shuffle task counts
(/root/reference/src/distributed_planner/statistics/complexity_cpu.rs).

Spark's AQE already re-sizes shuffles AT RUNTIME (the dynamic half of the
reference's SamplerExec); this module is the STATIC half — pick the initial
``spark.sql.shuffle.partitions`` / ``maxPartitionBytes`` from input size
before the first job runs, so the first shuffle is neither a 1-partition
bottleneck (tiny input) nor a 200-partition scheduling storm (the Spark
default on KB-scale stages). AQE then only coalesces DOWN from a sane start.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

# Reference default scan granularity (distributed_config.rs:11-15).
REF_BYTES_PER_SCAN_PARTITION = 16 * 1024 * 1024
# Spark-idiomatic scan split size (we default larger: Spark tasks are
# heavier-weight than the reference's Arrow stream partitions).
DEFAULT_BYTES_PER_SCAN_PARTITION = 128 * 1024 * 1024
# Target post-shuffle partition size — matches AQE's
# advisoryPartitionSizeInBytes default (64 MiB).
DEFAULT_TARGET_SHUFFLE_BYTES = 64 * 1024 * 1024


def input_bytes(*paths: str) -> int:
    """Total on-disk bytes of the given parquet files/directories — the same
    statistic the reference's planner reads from the file-scan config."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith(("_", "."))
                )
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return total


@dataclass
class StageSizing:
    """Advisory stage sizing for one query over the given inputs."""

    total_input_bytes: int
    scan_partitions: int
    shuffle_partitions: int
    max_partition_bytes: int
    target_shuffle_bytes: int

    def confs(self) -> dict[str, str]:
        return {
            "spark.sql.files.maxPartitionBytes": str(self.max_partition_bytes),
            "spark.sql.shuffle.partitions": str(self.shuffle_partitions),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
                self.target_shuffle_bytes
            ),
        }


def advise(
    *paths: str,
    parallelism: int,
    shuffle_selectivity: float = 1.0,
    bytes_per_scan_partition: int = DEFAULT_BYTES_PER_SCAN_PARTITION,
    target_shuffle_bytes: int = DEFAULT_TARGET_SHUFFLE_BYTES,
) -> StageSizing:
    """Size scan + shuffle stages from input bytes.

    - scan_partitions: ceil(bytes / bytes_per_scan_partition) — what Spark's
      file source will produce under ``maxPartitionBytes``.
    - shuffle_partitions: ceil(bytes * selectivity / target_shuffle_bytes),
      floored at the cluster's core count (a narrow shuffle idles executors:
      the complement of the reference's cardinality_task_count_factor
      widening), then rounded up to whole waves.

    ``shuffle_selectivity`` is the estimated fraction of scanned bytes that
    reach the first exchange (projection/filter pruning); 1.0 is the
    conservative upper bound.
    """
    total = input_bytes(*paths)
    scan_parts = max(1, math.ceil(total / bytes_per_scan_partition))
    shuffle_bytes = int(total * shuffle_selectivity)
    by_size = max(1, math.ceil(shuffle_bytes / target_shuffle_bytes))
    shuffle_parts = max(parallelism, by_size)
    # Round UP to a multiple of parallelism so every wave fills all cores
    # (a 1.2x-cores shuffle runs as 2 waves, the second 80% idle).
    shuffle_parts = math.ceil(shuffle_parts / parallelism) * parallelism
    return StageSizing(
        total_input_bytes=total,
        scan_partitions=scan_parts,
        shuffle_partitions=shuffle_parts,
        max_partition_bytes=bytes_per_scan_partition,
        target_shuffle_bytes=target_shuffle_bytes,
    )


def apply_sizing(spark: SparkSession, sizing: StageSizing) -> None:
    """Apply the advisory confs (all runtime-settable) to the session."""
    for key, value in sizing.confs().items():
        spark.conf.set(key, value)
