"""Runtime bloom-filter join pruning — the 100 TB shuffle-join scale lever.

When a selective predicate sits on one side of a large shuffle join, Spark
can build a bloom filter over the selective side's join keys at runtime and
inject a `might_contain` pre-filter into the OTHER side's scan stage, so the
bulk side never shuffles rows that cannot match (the runtime analogue of the
reference's static filter pushdown through network boundaries,
/root/reference/src/distributed_planner/distributed_query_planner.rs —
there the planner can only push what it proves statically; Spark adds the
runtime-built filter on top).

At sf0.001 the fact side is far below the default application-side scan
threshold, so the test lowers the thresholds to force injection — the plan
SHAPE under forced thresholds is exactly what the default config produces
once the fact table is cluster-scale. Asserts both the injection (plan
contains might_contain) and result invariance (same rows with the feature
off).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR

_BLOOM_CONFS = {
    # shuffle join required: runtime filters never target broadcast joins
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # creation side must be BELOW this cap; raise it so the tiny filtered
    # orders side qualifies at test scale
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    # application side must be ABOVE this floor; zero it at test scale
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {}
    for k, v in _BLOOM_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _selective_join(spark):
    tt = load_tables(spark, SF_DIR)
    urgent = tt["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
    return tt["lineitem"].join(
        urgent, tt["lineitem"]["l_orderkey"] == urgent["o_orderkey"]
    )


def test_bloom_filter_injected_and_result_invariant(spark, bloom_confs):
    j = _selective_join(spark)
    plan = j._jdf.queryExecution().executedPlan().toString().lower()
    assert "might_contain" in plan, "runtime bloom filter was not injected"
    with_bloom = j.count()

    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        off = _selective_join(spark)
        plan_off = off._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" not in plan_off
        assert off.count() == with_bloom
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")


def test_bloom_filter_prunes_before_shuffle(spark, bloom_confs):
    """The injected filter must sit on the APPLICATION (lineitem) side —
    i.e. appear in the plan subtree below that side's exchange — otherwise
    it prunes nothing before the shuffle."""
    j = _selective_join(spark)
    plan = j._jdf.queryExecution().executedPlan().toString().lower()
    # the filter references the fact side's join key column
    assert "might_contain" in plan and "l_orderkey" in plan.split("might_contain", 1)[1][:400], (
        "bloom filter does not guard the fact-side join key"
    )
