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

# Cache keyed by (applicationId, sf_dir) so repeated queries() calls reuse the
# analyzed DataFrames (and their registered temp views). applicationId is
# unique per SparkContext (unlike id(spark), which can be reused after GC and
# serve frames bound to a stopped session).
_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}

# Which sf_dir's frames currently own the session's bare-named temp views.
# A cache hit alone is NOT enough to return early: if another sf_dir was
# loaded since, the session's views point at THAT data, and every
# spark.sql-path query would silently read the wrong scale. (Found by the
# max-fan-out suite — the first caller to alternate sf_dirs in one session.)
_ACTIVE_VIEWS: dict[str, str] = {}


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
    app = spark.sparkContext.applicationId
    dir_key = sf_dir.rstrip("/")
    key = (app, dir_key)
    if key in _CACHE:
        tables = _CACHE[key]
        if register and _ACTIVE_VIEWS.get(app) != dir_key:
            for name, df in tables.items():
                df.createOrReplaceTempView(name)
            _ACTIVE_VIEWS[app] = dir_key
        return tables
    tables = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{dir_key}/{name}.parquet")
        df = _normalize(name, df)
        if register:
            df.createOrReplaceTempView(name)
        tables[name] = df
    _CACHE[key] = tables
    if register:
        _ACTIVE_VIEWS[app] = dir_key
    return tables
