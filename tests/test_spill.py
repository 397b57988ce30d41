"""Spill-aware execution: results must be invariant when operators are
forced to spill to disk.

At 100 TB, window buffers and sort runs WILL exceed executor memory; Spark
degrades to disk-backed buffers instead of failing or corrupting results.
This suite forces that path at test scale (tiny spill thresholds), asserts
the spill actually happened (spillSize metric > 0 on the executed plan),
and that the spilled run is bit-identical to the in-memory run — the
correctness half of SURVEY.md's "spill-aware" sizing discipline.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from datafusion_distributed_spark.plans.explain import build_tree
from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR

_SPILL_CONFS = {
    "spark.sql.windowExec.buffer.spill.threshold": "16",
    "spark.sql.windowExec.buffer.in.memory.threshold": "16",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "16",
}


@pytest.fixture()
def tiny_spill_thresholds(spark):
    saved = {k: spark.conf.get(k) for k in _SPILL_CONFS}
    for k, v in _SPILL_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _running_sum(spark):
    ev = load_tables(spark, SF_DIR)["events"]
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(cents).over(w).alias("run_cents"),
    )


def _total_spill(df) -> int:
    total = 0

    def walk(node):
        nonlocal total
        total += node.metrics.get("spillSize", 0)
        for c in node.children:
            walk(c)

    walk(build_tree(df, with_metrics=True))
    return total


def test_window_spill_is_result_invariant(spark, tiny_spill_thresholds):
    spilled_df = _running_sum(spark)
    spilled = sorted((r.user_id, r.event_id, r.run_cents) for r in spilled_df.collect())
    assert _total_spill(spilled_df) > 0, "expected the window buffer to spill"

    for k in _SPILL_CONFS:
        spark.conf.unset(k)
    try:
        in_memory_df = _running_sum(spark)
        in_memory = sorted(
            (r.user_id, r.event_id, r.run_cents) for r in in_memory_df.collect()
        )
        assert _total_spill(in_memory_df) == 0
    finally:
        for k, v in _SPILL_CONFS.items():
            spark.conf.set(k, v)

    assert spilled == in_memory
