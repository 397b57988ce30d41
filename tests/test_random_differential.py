"""Seeded randomized differential testing: generate scan→filter→group→agg
queries from a fixed-seed spec space, build the SAME query as a Spark
DataFrame and as DuckDB SQL, and require exact parity.

This extends the reference's corpus-based differential method
(/root/reference/tests/tpch_correctness_test.rs) with generated coverage:
random predicates/groupings exercise operator combinations the hand-written
battery misses, while the fixed seed keeps failures reproducible. Aggregates
follow the engine's exactness discipline (counts, integer-quantized sums,
string/int min-max) so parity is bit-exact, never tolerance-based.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR, compare_to_oracle, oracle_views

_N_CASES = 25

_TABLES = {
    "lineitem": {
        "num_cols": ["l_quantity", "l_extendedprice", "l_discount"],
        "str_cols": ["l_returnflag", "l_linestatus"],
        "int_cols": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    },
    "orders": {
        "num_cols": ["o_totalprice"],
        "str_cols": ["o_orderstatus", "o_orderpriority"],
        "int_cols": ["o_orderkey", "o_custkey"],
    },
    "customer": {
        "num_cols": ["c_acctbal"],
        "str_cols": ["c_mktsegment", "c_name"],
        "int_cols": ["c_custkey", "c_nationkey"],
    },
}

_OPS = [(">", "gt"), ("<=", "le")]


def _gen_case(rng: random.Random):
    table = rng.choice(sorted(_TABLES))
    cols = _TABLES[table]
    num = rng.choice(cols["num_cols"])
    op, _ = rng.choice(_OPS)
    threshold = round(rng.uniform(0, 1000), 2)
    n_group = rng.choice([1, 1, 2])
    groups = rng.sample(cols["str_cols"], k=min(n_group, len(cols["str_cols"])))
    int_col = rng.choice(cols["int_cols"])
    return {
        "table": table,
        "num": num,
        "op": op,
        "threshold": threshold,
        "groups": groups,
        "int_col": int_col,
    }


_CASES = [_gen_case(random.Random(1000 + i)) for i in range(_N_CASES)]


def _spark_query(spark, case):
    df = load_tables(spark, SF_DIR)[case["table"]]
    pred = (
        F.col(case["num"]) > case["threshold"]
        if case["op"] == ">"
        else F.col(case["num"]) <= case["threshold"]
    )
    cents = F.round(F.col(case["num"]) * 100, 0).cast("long")
    return (
        df.filter(pred)
        .groupBy(*case["groups"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.min(case["int_col"]).alias("min_int"),
            F.max(case["int_col"]).alias("max_int"),
        )
    )


def _oracle_sql(case):
    groups = ", ".join(case["groups"])
    return f"""
SELECT {groups}, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND({case['num']} * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN({case['int_col']}) AS min_int,
       MAX({case['int_col']}) AS max_int
FROM {case['table']}
WHERE {case['num']} {case['op']} {case['threshold']}
GROUP BY {groups}
"""


@pytest.mark.parametrize("i", range(_N_CASES))
def test_random_query_matches_oracle(spark, duck, i):
    case = _CASES[i]
    oracle_views(duck, SF_DIR)
    compare_to_oracle(
        _spark_query(spark, case), duck, _oracle_sql(case), name=f"rand[{i}]{case}"
    )
