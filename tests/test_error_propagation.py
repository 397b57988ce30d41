"""Error-propagation contract (reference:
/root/reference/tests/error_propagation.rs — a failing plan fragment must
surface the ORIGINAL error message through the distribution layer, not a
generic task-failure wrapper): a raising pandas_udf and a corrupt parquet
scan must each propagate their message through Engine/collect."""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from datafusion_distributed_spark.engine import Engine

from .conftest import SF_DIR

_SCRATCH = "/root/repo/.scratch/corrupt_scan"


def test_raising_pandas_udf_propagates_message(spark):
    @pandas_udf("double")
    def boom(v: pd.Series) -> pd.Series:
        raise ValueError("intentional-udf-failure-7c4e")

    eng = Engine(spark)
    eng.read_parquet("orders_err", f"{SF_DIR}/orders.parquet")
    df = eng.sql("SELECT * FROM orders_err").withColumn(
        "x", boom(F.col("o_totalprice"))
    )
    with pytest.raises(Exception) as excinfo:
        df.collect()
    assert "intentional-udf-failure-7c4e" in str(excinfo.value)


def test_corrupt_parquet_scan_propagates(spark):
    os.makedirs(_SCRATCH, exist_ok=True)
    # a valid footer-less file masquerading as parquet
    with open(os.path.join(_SCRATCH, "part-00000.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet file body")
    try:
        with pytest.raises(Exception) as excinfo:
            spark.read.parquet(_SCRATCH).collect()
        msg = str(excinfo.value).lower()
        assert "parquet" in msg or "footer" in msg or "corrupt" in msg, msg
    finally:
        shutil.rmtree(_SCRATCH, ignore_errors=True)


def test_failing_sql_expression_propagates(spark):
    """ANSI-mode runtime error inside an executor task surfaces its cause."""
    eng = Engine(spark)
    eng.read_parquet("orders_err2", f"{SF_DIR}/orders.parquet")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = eng.sql(
            "SELECT o_orderkey, 1 / (o_orderkey - o_orderkey) AS z FROM orders_err2"
        )
        with pytest.raises(Exception) as excinfo:
            df.collect()
        assert "DIVIDE_BY_ZERO" in str(excinfo.value)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.ansi.enabled", prev)
        else:
            spark.conf.unset("spark.sql.ansi.enabled")
