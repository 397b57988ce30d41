"""SQL join-strategy hints: the user-facing override surface for the
planner's join choice (the reference exposes the same control as its
broadcast-insertion config; Spark spells it /*+ BROADCAST */ etc.).
Asserts each hint actually flips the physical join and results agree."""

from __future__ import annotations

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hints_select_join_strategies(spark):
    load_tables(spark, SF_DIR)
    q = """
    SELECT /*+ {hint} */ n_name, COUNT(*) AS c
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """
    base = sorted(map(tuple, spark.sql(q.format(hint="BROADCAST(nation)")).collect()))

    bhj = spark.sql(q.format(hint="BROADCAST(nation)"))
    assert "BroadcastHashJoin" in _plan(bhj)

    smj = spark.sql(q.format(hint="MERGE(nation)"))
    assert "SortMergeJoin" in _plan(smj)

    shj = spark.sql(q.format(hint="SHUFFLE_HASH(nation)"))
    assert "ShuffledHashJoin" in _plan(shj)

    for df in (smj, shj):
        assert sorted(map(tuple, df.collect())) == base
