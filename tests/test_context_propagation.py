"""Request-scoped context propagates from the coordinator to task workers.

The reference forwards selected gRPC metadata headers from the client
through every worker hop so request-scoped context (trace ids, tenant tags)
is visible wherever a task runs
(/root/reference/docs/source/advanced/01-passthrough-headers.md).

Spark's native channel for the same contract is driver-set local properties:
`sc.setLocalProperty` values ride along with every task the action spawns
and are readable on executors via `TaskContext.getLocalProperty` — including
through shuffle stages. Job groups/descriptions (used by the EXPLAIN ANALYZE
listener to attribute stages) travel the same way.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark import TaskContext

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


def test_local_property_reaches_every_task(spark):
    sc = spark.sparkContext
    sc.setLocalProperty("request.trace_id", "trace-xyz")
    try:
        seen = (
            spark.range(0, 8, 1, numPartitions=4)
            .rdd.mapPartitions(
                lambda it: [TaskContext.get().getLocalProperty("request.trace_id")]
            )
            .collect()
        )
        assert seen == ["trace-xyz"] * 4
    finally:
        sc.setLocalProperty("request.trace_id", None)


def test_local_property_survives_shuffle_stage(spark):
    """The property is visible in tasks of a post-shuffle stage, not just the
    scan stage — the analogue of headers crossing worker-to-worker hops."""
    sc = spark.sparkContext
    sc.setLocalProperty("request.tenant", "tenant-42")
    try:
        orders = load_tables(spark, SF_DIR)["orders"]
        agg = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
        seen = set(
            agg.rdd.mapPartitions(
                lambda it: [TaskContext.get().getLocalProperty("request.tenant")]
            ).collect()
        )
        assert seen == {"tenant-42"}
    finally:
        sc.setLocalProperty("request.tenant", None)
