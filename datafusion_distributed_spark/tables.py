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
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key in _CACHE:
        return _CACHE[key]
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        df = _normalize(name, df)
        if register:
            df.createOrReplaceTempView(name)
        tables[name] = df
    _CACHE[key] = tables
    return tables
