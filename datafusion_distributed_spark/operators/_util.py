"""Shared helpers for operator implementations (decimal discipline, dates)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

from ..tables import load_tables


def t(spark: SparkSession, sf_dir: str):
    """Load + register the testdata tables; returns name -> DataFrame."""
    return load_tables(spark, sf_dir)


def dec(col: str | Column, p: int = 12, s: int = 4) -> Column:
    """Cast to DECIMAL(p,s). All money arithmetic is decimal so sums are exact
    and independent of partition/summation order — this is what makes Spark
    results hash-identical to the DuckDB oracle (SURVEY.md §7 risk #1)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def dbl(col: Column) -> Column:
    return col.cast("double")


def ts(literal: str) -> Column:
    """Timestamp-NTZ literal for filters against parquet timestamp columns."""
    return F.lit(literal).cast("timestamp_ntz")


def fmt_date(col: str | Column) -> Column:
    """Render a timestamp as yyyy-MM-dd (oracle: strftime(x, '%Y-%m-%d'))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


# revenue = l_extendedprice * (1 - l_discount), exact decimal
def revenue_dec() -> Column:
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(2,0)") - dec("l_discount", 6, 4))


# The same expression in DuckDB SQL (keep in sync with revenue_dec()).
REVENUE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))"
)
