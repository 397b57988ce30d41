"""Salted-join equivalence on a synthetic hot-key dataset: 90% of left rows
share ONE key (the web-corpus boilerplate shape). The salted plan must return
exactly the unsalted join's result while spreading the hot key across
n_salts partitions."""

from __future__ import annotations

import pyspark.sql.functions as F

from datafusion_distributed_spark.operators.skew import salted_join


def _skewed(spark):
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    left, right = _skewed(spark)
    plain = left.join(right, "k").select("k", "left_id", "payload")
    salted = salted_join(left, right, "k", n_salts=8).select("k", "left_id", "payload")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    left, right = _skewed(spark)
    # drop key 7 from right: hot rows must survive with NULL payload
    right2 = right.filter(F.col("k") != 7)
    plain = left.join(right2, "k", "left").select("k", "left_id", "payload")
    salted = salted_join(left, right2, "k", n_salts=8, how="left").select(
        "k", "left_id", "payload"
    )
    assert sorted(map(tuple, salted.collect()), key=str) == sorted(
        map(tuple, plain.collect()), key=str
    )


def test_salted_join_rejects_unsafe_how(spark):
    """Right/full outer joins are NOT salt-safe: an unmatched right row is
    replicated once per salt value and would surface n_salts times."""
    import pytest

    left, right = _skewed(spark)
    for how in ("right", "full", "right_outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="not salt-safe"):
            salted_join(left, right, "k", n_salts=8, how=how)


def test_salted_join_semi_anti(spark):
    left, right = _skewed(spark)
    right2 = right.filter(F.col("k") != 7)
    for how in ("left_semi", "left_anti"):
        plain = left.join(right2, "k", how).select("k", "left_id")
        salted = salted_join(left, right2, "k", n_salts=8, how=how).select(
            "k", "left_id"
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )
