"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` enumerate every implemented operator from
SURVEY.md §2 with its DuckDB oracle (the reference's differential-testing
method, /root/reference/tests/tpch_correctness_test.rs).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datafusion_distributed_spark.operators import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H q1-class: scan -> filter -> partial/final hash aggregate — the
    reference's canonical distributed example
    (/root/reference/docs/source/learn/02-how-a-distributed-plan-is-built.md).
    """
    from datafusion_distributed_spark.operators.relational import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return all_oracles()
