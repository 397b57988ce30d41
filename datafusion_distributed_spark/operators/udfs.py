"""Scalar UDFs participating in the distributed plan — including as the
shuffle/group key.

Reference parity surface: /root/reference/tests/udfs.rs:19-80 proves scalar
UDFs work *through the distribution layer* — ``SELECT test_udf(col) ... GROUP
BY test_udf(col)`` produces ``RepartitionExec: partitioning=Hash([test_udf(...)])``,
i.e. the UDF output IS the hash-partition key crossing the network boundary.

Spark equivalent: a ``pandas_udf`` (Arrow-batched, vectorized — never
row-at-a-time Python) whose output column is the ``groupBy`` key. Catalyst
materializes the UDF column in ``ArrowEvalPython`` below the Exchange, so the
shuffle hashes on the UDF result exactly like the reference plan. The UDF body
is deliberately DuckDB-expressible so the query gets a real differential
oracle instead of a rows-only check.

Scale note: ArrowEvalPython streams Arrow batches through a pooled Python
worker per core — constant memory, partition-parallel; the aggregate above it
is a normal partial/final JVM hash aggregate.
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from ..plans.costing import input_bytes
from ._util import C, t, unscale
from .registry import query

# NB: type objects, not DDL strings — string return types are parsed via the
# active SparkContext at decoration time, which breaks plain module import.


@pandas_udf(LongType())
def acct_bucket(acctbal: pd.Series) -> pd.Series:
    """floor(acctbal / 1000) — same IEEE double ops as the oracle SQL."""
    import numpy as np

    return pd.Series(np.floor(acctbal / 1000.0), dtype="int64")


_UDF_GROUP_ORACLE = f"""
SELECT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_customers,
       CAST(SUM({C('c_acctbal')}) AS DOUBLE) / 100.0 AS total_bal
FROM customer
GROUP BY CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
"""


@query("udf_group_key", oracle=_UDF_GROUP_ORACLE, tags=("udf", "pandas-udf"))
def udf_group_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY a pandas_udf output: the shuffle hash-partitions on the UDF
    column (reference: tests/udfs.rs RepartitionExec Hash([test_udf])).
    Money sums use the exact scaled-int64 discipline (_util)."""
    cust = t(spark, sf_dir)["customer"]
    cents_bal = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    return (
        cust.select(acct_bucket("c_acctbal").alias("bucket"), cents_bal.alias("_cb"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            unscale(F.sum("_cb"), 100).alias("total_bal"),
        )
    )


@pandas_udf(StringType())
def seg_initial(seg: pd.Series) -> pd.Series:
    """First character of the market segment — a string-typed UDF join key."""
    return seg.str.slice(0, 1)


_UDF_JOIN_ORACLE = """
SELECT k, COUNT(*) AS n_pairs
FROM (
  SELECT substring(c.c_mktsegment, 1, 1) AS k, c.c_custkey, o.o_orderkey
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE substring(c.c_mktsegment, 1, 1) IN ('B', 'A')
) p
GROUP BY k
"""


@query("udf_join_filter", oracle=_UDF_JOIN_ORACLE, tags=("udf", "pandas-udf"))
def udf_join_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A pandas_udf column flowing through a join + filter + aggregate —
    UDF output participates across the shuffle boundary like the reference's
    distributed UDF tests."""
    tb = t(spark, sf_dir)
    cust = tb["customer"].select(
        "c_custkey", seg_initial("c_mktsegment").alias("k")
    ).filter(F.col("k").isin("B", "A"))
    orders = tb["orders"]
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Grouped-aggregate pandas UDF (UDAF): a user-defined aggregate running
# per-group in Python over Arrow batches. The reference has no UDAF test
# (SURVEY.md §2.3: DataFusion supports them, the reference adds nothing), so
# this completes the UDF story beyond parity: Catalyst plans
# AggregateInPandas — shuffle on the group key, then the whole group's
# column is handed to the UDF as one pandas Series. Median is deliberately
# chosen as a UDAF that Spark has no builtin exact equivalent for
# (percentile_approx is approximate) yet DuckDB computes exactly: pandas
# interpolates even-sized groups as (a+b)/2 on exact integer cents, DuckDB's
# MEDIAN over BIGINT does the same — bit-identical doubles.
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())
def median_cents(cents: pd.Series) -> float:
    return float(cents.median())


_UDAF_MEDIAN_ORACLE = """
SELECT o_orderpriority,
       CAST(MEDIAN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS median_price
FROM orders
GROUP BY o_orderpriority
"""


@query("udaf_median_price", oracle=_UDAF_MEDIAN_ORACLE, tags=("udf", "udaf", "pandas-udf"))
def udaf_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir)["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.select("o_orderpriority", cents.alias("_cb"))
        .groupBy("o_orderpriority")
        .agg((median_cents("_cb") / 100.0).alias("median_price"))
    )


# ---------------------------------------------------------------------------
# UDF through the SQL ENTRY PATH: spark.udf.register makes the pandas_udf
# callable from SQL text — the reference's registration model
# (tests/udfs.rs registers test_udf into the SessionContext and queries it
# with SQL). Same Arrow-batched execution as the DataFrame path; only the
# binding surface differs. Registration is idempotent per session.
# ---------------------------------------------------------------------------

_UDF_SQL_ENTRY = """
SELECT acct_bucket_sql(c_acctbal) AS bucket,
       COUNT(*) AS n_customers,
       MIN(c_custkey) AS first_cust
FROM customer
GROUP BY acct_bucket_sql(c_acctbal)
"""

_UDF_SQL_ORACLE = """
SELECT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_customers,
       MIN(c_custkey) AS first_cust
FROM customer
GROUP BY CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT)
"""


@query("udf_sql_entry", oracle=_UDF_SQL_ORACLE, tags=("udf", "sql-entry"))
def udf_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    t(spark, sf_dir)
    spark.udf.register("acct_bucket_sql", acct_bucket)
    return spark.sql(_UDF_SQL_ENTRY)


# ---------------------------------------------------------------------------
# Co-grouped custom merge (FlatMapCoGroupsInPandas): the per-key TWO-SIDED
# escape hatch — when a merge's semantics exceed the relational operators,
# Spark co-shuffles both inputs by key and hands each key's pair of Arrow
# batches to one Python function. Here the function re-implements the
# as-of view→purchase carry (pandas merge_asof per user), and the oracle is
# the SAME ASOF LEFT JOIN SQL that checks the window-based
# cb_asof_view_purchase — so the Python path is proven bit-identical to
# both the JVM window formulation and DuckDB. Scale: ONE co-shuffle on a
# hash bucket of user_id (not the raw key: one Python call per BUCKET,
# merge_asof's by= resolves users inside the batch — per-user grouping
# would pay interpreter overhead per user), Arrow-batched. The bucket
# count is INPUT-SIZE-DERIVED (r12 §F; guide §2 scale-adaptive
# partitioning): ~16 MB of events parquet per bucket, floor 8, so the
# per-task envelope |events|/n_buckets stays bounded at 100 TB while the
# bench scales don't pay hundreds of near-empty Python round-trips (the
# previous constant 256 was tuned for neither — measured below). Results
# are bucket-count-invariant: every user lands wholly in one bucket and
# merge_asof resolves per user.
# ---------------------------------------------------------------------------

_ASOF_BUCKET_BYTES = 16 << 20
_ASOF_MIN_BUCKETS = 8
_ASOF_MAX_BUCKETS = 1 << 20

_COGROUP_ASOF_SCHEMA = (
    "event_id long, user_id long, purchase_ts string, last_view_ts string"
)


def _asof_merge_bucket(views: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
    """One call per BUCKET of users, not per user: merge_asof's ``by=``
    handles the per-user grouping inside a single vectorized pass. Grouping
    the cogroup on a hash bucket instead of the raw user_id cuts the Python
    round-trips from |users| to n_buckets (measured 6.5 s -> well under 1 s
    at sf0.1: tiny per-group calls were pure interpreter overhead)."""
    if purchases.empty:
        return pd.DataFrame(
            columns=["event_id", "user_id", "purchase_ts", "last_view_ts"]
        )
    p = purchases.sort_values(["ts", "event_id"]).reset_index(drop=True)
    v = views.sort_values("ts").reset_index(drop=True)
    if v.empty:
        last_view = pd.Series([pd.NaT] * len(p))
    else:
        merged = pd.merge_asof(
            p[["ts", "user_id"]],
            v[["ts", "user_id"]].assign(vts=lambda d: d["ts"]),
            on="ts", by="user_id",
            direction="backward", allow_exact_matches=True,
        )
        last_view = merged["vts"]
    return pd.DataFrame(
        {
            "event_id": p["event_id"],
            "user_id": p["user_id"],
            "purchase_ts": p["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            "last_view_ts": last_view.dt.strftime("%Y-%m-%d %H:%M:%S"),
        }
    )


@query(
    "udf_cogroup_asof",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS last_view_ts
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
""",
    tags=("udf", "cogroup", "asof-join"),
)
def udf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = t(spark, sf_dir)["events"]
    ev_bytes = input_bytes(os.path.join(sf_dir, "events.parquet"))
    n_buckets = max(
        _ASOF_MIN_BUCKETS,
        min(_ASOF_MAX_BUCKETS, -(-ev_bytes // _ASOF_BUCKET_BYTES)),
    )
    bucket = F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("bucket")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", bucket
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", bucket
    )
    return (
        views.groupby("bucket")
        .cogroup(purchases.groupby("bucket"))
        .applyInPandas(_asof_merge_bucket, schema=_COGROUP_ASOF_SCHEMA)
    )
