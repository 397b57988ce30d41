"""Bucketed co-located join: pre-bucketing both fact tables on the join key
removes the join shuffle entirely — the 100 TB answer to repeated fact-fact
joins (BASELINE scale discipline: "co-locate joins via bucketing").

The reference gets co-location by hash-partitioning both sides at query time
(NetworkShuffleExec on both inputs); bucketing moves that shuffle to write
time so EVERY subsequent join on the key is shuffle-free. The assertions
check the plan property itself: no Exchange above either bucketed scan."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from datafusion_distributed_spark.plans.explain import stage_summary
from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    tb = load_tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    shutil.rmtree("spark-warehouse/li_bucketed", ignore_errors=True)
    shutil.rmtree("spark-warehouse/ord_bucketed", ignore_errors=True)
    (
        tb["lineitem"]
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        tb["orders"]
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_bucketed")
    )
    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed")
    # hint("merge"): at this toy scale Catalyst would broadcast the small
    # side; the property under test is the fact-fact (both-sides-large) plan,
    # where bucketing makes the SMJ exchange-free
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the join itself must be exchange-free: the only shuffle allowed is the
    # one introduced by the groupBy ABOVE the join
    join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # correctness: same result as the unbucketed join
    expect = (
        tb["lineitem"]
        .join(tb["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    shutil.rmtree("spark-warehouse", ignore_errors=True)
