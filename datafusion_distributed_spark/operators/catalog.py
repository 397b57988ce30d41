"""Catalog introspection — SHOW COLUMNS parity.

The reference plans information_schema queries through the distributed planner
(`SHOW COLUMNS` snapshot over StreamingTableExec,
/root/reference/src/distributed_planner/distributed_query_planner.rs:564-578).
Spark's equivalent surface is the catalog API / information-schema metadata;
like the reference, this executes on the coordinator (driver) — it is
metadata-scale by construction, never data-scale.

The oracle cross-checks against DuckDB's information_schema over the same
registered views, so column names and positions are differentially verified.
Types are deliberately excluded: the engines' type-name vocabularies differ
(STRING vs VARCHAR), which is a rendering difference, not a schema one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ._util import t
from .registry import query

_SHOW_COLUMNS_ORACLE = """
SELECT column_name, CAST(ordinal_position AS BIGINT) AS ordinal
FROM information_schema.columns
WHERE table_name = 'nation'
"""


@query("catalog_show_columns", oracle=_SHOW_COLUMNS_ORACLE, tags=("catalog",))
def show_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW COLUMNS for the nation table via the session catalog."""
    tables = t(spark, sf_dir)  # registers temp views, incl. 'nation'
    fields = tables["nation"].schema.fields
    rows = [(f.name, i + 1) for i, f in enumerate(fields)]
    return spark.createDataFrame(rows, "column_name string, ordinal long")


_SHOW_TABLES_ORACLE = """
SELECT table_name
FROM information_schema.tables
WHERE table_name IN ('region','nation','customer','supplier','part',
                     'orders','lineitem','events','documents','embeddings')
"""


@query("catalog_show_tables", oracle=_SHOW_TABLES_ORACLE, tags=("catalog",))
def show_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES over the registered engine tables, via spark.catalog."""
    t(spark, sf_dir)
    from ..tables import TABLE_NAMES

    listed = spark.sql("SHOW VIEWS").select(
        F.col("viewName").alias("table_name")
    )
    return listed.filter(F.col("table_name").isin(*TABLE_NAMES))
