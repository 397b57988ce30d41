"""Registry entries that execute the LITERAL reference texts.

The literal lane (datafusion_distributed_spark/literal.py, round 6) runs
verbatim benchmark texts over schema-mapped views; its full 48-execution
differential lives in tests/test_literal_sql.py. These registry entries put
a sample of that lane behind the driver's own correctness gate: the Spark
side executes the VERBATIM reference text end-to-end (views + spark.sql);
the oracle re-derives the same result over the identical view derivations
spelled as DuckDB CTEs (``lit_*`` names so the CTE bodies can reference the
driver's bare-named base views without self-reference).

Only integer-exact texts are registered (counts, int sums, avg = exact int
sum / count): the driver's hash gate is bit-exact, and the literal texts
mandate engine-native float summation everywhere else — those run under the
9-significant-digit compare in the pytest lane instead.

Reference parity: the reference's own proof runs the same files
(/root/reference/tests/tpch_correctness_test.rs:24-120,
tests/clickbench_correctness_test.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..literal import run_literal_sql, view_definitions
from .registry import query


def _lit_ctes(*names: str) -> str:
    """WITH-clause body defining lit_<name> CTEs from the shared view
    derivations (DuckDB dialect, referencing the driver's bare views)."""
    defs = view_definitions("duck", lambda n: n)
    return ",\n".join(f"lit_{n} AS ({defs[n]})" for n in names)


_CB_Q0_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT COUNT(*) AS n_hits FROM lit_hits
"""


@query(
    "lit_cb_q0_count",
    oracle=_CB_Q0_ORACLE,
    tags=("literal", "clickbench"),
)
def lit_cb_q0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "clickbench", "q0").toDF("n_hits")


_CB_Q2_ORACLE = f"""
WITH {_lit_ctes("hits")}
SELECT SUM("AdvEngineID") AS sum_adv, COUNT(*) AS n_hits,
       AVG("ResolutionWidth") AS avg_width
FROM lit_hits
"""


@query(
    "lit_cb_q2_simple_aggregates",
    oracle=_CB_Q2_ORACLE,
    tags=("literal", "clickbench"),
)
def lit_cb_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # avg_width = exact int sum / count: both engines divide the same exact
    # integers in double — bit-identical.
    return run_literal_sql(spark, sf_dir, "clickbench", "q2").toDF(
        "sum_adv", "n_hits", "avg_width"
    )


_TPCH_Q4_ORACLE = f"""
WITH {_lit_ctes("lineitem", "orders")}
SELECT o_orderpriority, COUNT(*) AS order_count
FROM lit_orders
WHERE o_orderdate >= DATE '1995-07-01'
  AND o_orderdate < DATE '1995-10-01'
  AND EXISTS (SELECT 1 FROM lit_lineitem
              WHERE l_orderkey = o_orderkey
                AND l_commitdate < l_receiptdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query(
    "lit_tpch_q4_shifted",
    oracle=_TPCH_Q4_ORACLE,
    tags=("literal", "tpch", "exists"),
    order_by="o_orderpriority",
)
def lit_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Verbatim q4 text with date literals shifted +2y into the driver's
    # 1995-2001 range (1993-07-01 -> 1995-07-01); the oracle spells the
    # shifted dates directly.
    return run_literal_sql(spark, sf_dir, "tpch", "q4", date_shift_years=2)


_TPCH_Q12_ORACLE = f"""
WITH {_lit_ctes("lineitem", "orders")}
SELECT l_shipmode,
       SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                THEN 1 ELSE 0 END) AS low_line_count
FROM lit_orders
JOIN lit_lineitem ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND l_shipdate < l_commitdate
  AND l_receiptdate >= DATE '1996-01-01'
  AND l_receiptdate < DATE '1997-01-01'
GROUP BY l_shipmode
ORDER BY l_shipmode
"""


@query(
    "lit_tpch_q12_shifted",
    oracle=_TPCH_Q12_ORACLE,
    tags=("literal", "tpch"),
    order_by="l_shipmode",
)
def lit_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_literal_sql(spark, sf_dir, "tpch", "q12", date_shift_years=2)
