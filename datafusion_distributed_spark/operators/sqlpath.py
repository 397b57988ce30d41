"""Queries entering through the SQL surface (``spark.sql`` over the
registered views) — the reference's default entry point
(/root/reference/src/distributed_planner/distributed_query_planner.rs:57-79,
SURVEY.md §3.1). Everything else in the registry uses the DataFrame API
(entry point 2); these prove the SQL path plans identically through Catalyst,
including TPC-DS-style CTE chains referenced multiple times (SURVEY.md §2.3
"deep CTE chains").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ._util import t
from .registry import query

# Year-over-year revenue doublers: a CTE materialized once, self-joined
# across adjacent years (the TPC-DS q74 'year_total' shape).
_CTE_SPARK_SQL = """
WITH yearly AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) AS INT) AS y,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders
  GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
)
SELECT a.o_custkey AS custkey, a.y AS year,
       CAST(a.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(b.cents AS DOUBLE) / 100.0 AS prev_revenue
FROM yearly a
JOIN yearly b ON a.o_custkey = b.o_custkey AND a.y = b.y + 1
WHERE a.cents > 2 * b.cents
"""

_CTE_ORACLE = """
WITH yearly AS (
  SELECT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders
  GROUP BY o_custkey, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)
)
SELECT a.o_custkey AS custkey, a.y AS year,
       CAST(a.cents AS DOUBLE) / 100.0 AS revenue,
       CAST(b.cents AS DOUBLE) / 100.0 AS prev_revenue
FROM yearly a
JOIN yearly b ON a.o_custkey = b.o_custkey AND a.y = b.y + 1
WHERE a.cents > 2 * b.cents
"""


@query("sql_cte_yoy_doublers", oracle=_CTE_ORACLE, tags=("sql-entry", "cte", "tpcds"))
def cte_yoy_doublers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir)  # registers the temp views the SQL references
    return spark.sql(_CTE_SPARK_SQL)
