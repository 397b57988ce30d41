"""Approximate aggregates with bounded-error differentials.

Spark's sketch-backed aggregates can't hash-match an exact oracle, so they
get the next-strongest check: the exact answer computed twice (Spark exact +
DuckDB exact must agree), then the approximation asserted within its
documented error envelope. This is the discipline the oracle battery can't
host (hash equality) applied to the approximate surface:

- approx_count_distinct: HLL++ with relative standard deviation `rsd`
  (default 0.05); asserted within 4*rsd of exact (a ~4-sigma envelope).
- percentile_approx: rank error bounded by 1/accuracy of the row count;
  asserted the returned value's true rank is within that bound.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from datafusion_distributed_spark.tables import load_tables

from .conftest import SF_DIR

_RSD = 0.05
_ACCURACY = 1000


def test_approx_count_distinct_within_bound(spark):
    events = load_tables(spark, SF_DIR)["events"]
    row = events.agg(
        F.count_distinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=_RSD).alias("approx"),
    ).collect()[0]
    duck_exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert row.exact == duck_exact  # exact paths agree engine-to-engine
    assert abs(row.approx - row.exact) <= max(4 * _RSD * row.exact, 1)


def test_percentile_approx_rank_bound(spark):
    orders = load_tables(spark, SF_DIR)["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    df = orders.select(cents.alias("c"))
    n = df.count()
    approx = df.agg(
        F.percentile_approx("c", 0.5, _ACCURACY).alias("p50")
    ).collect()[0].p50
    # true rank of the returned value must sit within n/accuracy of the
    # median rank (the documented guarantee of GK-style sketches)
    below = df.filter(F.col("c") <= approx).count()
    rank_err = abs(below - n / 2)
    assert rank_err <= n / _ACCURACY + 1


def test_sampled_quantile_sketch_merge_property(spark):
    """The hash sample behind cb_sampled_quantiles is a MERGEABLE sketch:
    sampling a union == union of per-partition samples, because membership
    depends only on (salt, event_id). Split the events by an unrelated
    predicate, sample each half independently, and assert the union of the
    halves' sample keys equals the whole-table sample keys."""
    from datafusion_distributed_spark.operators.clickstream import (
        _QSK_PCT,
        _QSK_SALT,
    )
    from datafusion_distributed_spark.operators.sampling import _u32_spark

    ev = load_tables(spark, SF_DIR)["events"]
    h = _u32_spark(F.concat(F.lit(_QSK_SALT), F.col("event_id").cast("string")))
    sampled = ev.select("event_id", "user_id", (h % 100 < _QSK_PCT).alias("s"))
    whole = {r.event_id for r in sampled.filter("s").collect()}
    left = {
        r.event_id
        for r in sampled.filter("s AND user_id % 2 = 0").collect()
    }
    right = {
        r.event_id
        for r in sampled.filter("s AND user_id % 2 != 0").collect()
    }
    assert left | right == whole
    assert left.isdisjoint(right)
    # and the rate is what the sketch claims, within 3 sigma
    n = sampled.count()
    import math

    p = _QSK_PCT / 100.0
    assert abs(len(whole) - n * p) <= 3 * math.sqrt(n * p * (1 - p))
