"""Queries over the work-unit-feed source (sources/work_unit_feed.py).

The differential check mirrors the reference's work_unit_feed test: the same
data read through the feed must aggregate identically to reading the files
directly (/root/reference/tests/work_unit_feed.rs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources import register_work_unit_feed
from .registry import query

_WUF_ORACLE = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY source
"""


@query("wuf_documents_stats", oracle=_WUF_ORACLE, tags=("source", "work-unit-feed"))
def wuf_documents_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the documents table read through runtime-discovered work
    units (row-range descriptors enumerated driver-side from parquet footers,
    sub-split to 128-row units so one file fans out to many tasks)."""
    register_work_unit_feed(spark)
    docs = (
        spark.read.format("work_unit_feed")
        .option("path", f"{sf_dir.rstrip('/')}/documents.parquet")
        .option("rows_per_unit", "128")
        .load()
    )
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )
