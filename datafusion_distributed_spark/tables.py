"""Table registry over the driver-provided parquet datasets (TESTDATA.md).

Reference analogue: parquet table registration at session setup
(/root/reference/tests/tpch_correctness_test.rs register_tables;
/root/reference/benchmarks/src/datasets/tpch.rs:17-23). Schemas come from
parquet footers, exactly like the reference (SURVEY.md §1.3).

Normalization applied at load:
- ``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as int64 under
  ``spark.sql.legacy.parquet.nanosAsLong`` and we convert to TIMESTAMP_NTZ at
  microsecond precision (truncation — matches DuckDB's ns→us cast).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .engine import apply_session_confs

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Both the DataFrame cache and the view-ownership token live as attributes ON
# the SparkSession object itself, not in a module dict keyed by applicationId:
# temp views (and DataFrames) are SparkSession-scoped, and two sessions
# sharing one SparkContext (spark.newSession()) share an applicationId — a
# module-level cache hit in the second session would both return frames bound
# to the FIRST session and skip view registration while the second session
# has no (or stale) views. Attributes die with the session wrapper, so there
# is no id()-reuse aliasing either.
_CACHE_ATTR = "_dds_tables_cache"  # dict[sf_dir, dict[name, DataFrame]]
_VIEWS_ATTR = "_dds_active_views"  # sf_dir whose frames own the bare views

# Stamped on every registry table frame so operators/_util._fan_out can
# memoize its scan-partition-count probe per (sf_dir, table) — the split
# count of a fixed file set under fixed session confs is a session constant,
# while df.rdd.getNumPartitions() re-plans the frame on every call.
_SCAN_KEY_ATTR = "_dds_scan_key"

# Which sf_dir's frames currently own the session's bare-named temp views.
# A cache hit alone is NOT enough to return early: if another sf_dir was
# loaded since, the session's views point at THAT data, and every
# spark.sql-path query would silently read the wrong scale. (Found by the
# max-fan-out suite — the first caller to alternate sf_dirs in one session.)


def _normalize(name: str, df: DataFrame) -> DataFrame:
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # int64 nanos -> TIMESTAMP_NTZ at micros (floor division; ts >= 0).
        # With session tz UTC the LTZ->NTZ cast is an identity on the instant.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register: bool = True
) -> dict[str, DataFrame]:
    """Load all testdata tables from ``sf_dir`` and (optionally) register them
    as temp views under their bare names."""
    apply_session_confs(spark)
    dir_key = sf_dir.rstrip("/")
    cache: dict[str, dict[str, DataFrame]] = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    if dir_key in cache:
        tables = cache[dir_key]
        if register and getattr(spark, _VIEWS_ATTR, None) != dir_key:
            for name, df in tables.items():
                df.createOrReplaceTempView(name)
            setattr(spark, _VIEWS_ATTR, dir_key)
        return tables
    tables = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{dir_key}/{name}.parquet")
        df = _normalize(name, df)
        setattr(df, _SCAN_KEY_ATTR, (dir_key, name))
        if register:
            df.createOrReplaceTempView(name)
        tables[name] = df
    cache[dir_key] = tables
    if register:
        setattr(spark, _VIEWS_ATTR, dir_key)
    return tables
