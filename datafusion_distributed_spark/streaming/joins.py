"""Stream-stream interval join and streaming deduplication.

Completes the Structured Streaming operator surface next to windowed
aggregation (windows.py) and arbitrary state (stateful.py):

- **Stream-stream inner join with event-time bounds**: views joined to the
  same user's purchases that happen within one hour after the view. Both
  sides carry watermarks so join state is bounded — the planner derives the
  state-retention horizon from the watermark plus the time-range condition
  (this is Spark's SymmetricHashJoin-style streaming join; the reference's
  `SymmetricHashJoinExec` is cost-model-only and unreachable on bounded
  inputs, SURVEY.md §2.2 — so this is additive scope proving the unbounded
  path our engine adds on top of the reference's bounded-only semantics).
- **Streaming deduplication**: `dropDuplicates` over a compound key with
  exact batch parity, plus the bounded-state
  `dropDuplicatesWithinWatermark` variant whose state expires with the
  watermark (the 100 TB-scale choice: state holds only one watermark-width
  of keys instead of the whole history).

Batch/streaming parity by construction: identical transformations on both
paths, equality asserted in tests/test_streaming.py — the same differential
discipline as the DuckDB oracle battery.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators._util import cents
from ..tables import load_tables
from .windows import _event_stream, _WATERMARK


def _view_purchase_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Inner join: purchase within [view_ts, view_ts + 1h] for the same user.

    The time-range predicate plus both watermarks is what lets Spark expire
    join state; an equality-only condition would retain state forever.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return joined.select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id"
    )


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    return views, purchases


def batch_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views, purchases = _split(load_tables(spark, sf_dir)["events"])
    return _view_purchase_join(views, purchases)


def streaming_view_purchase_join(
    spark: SparkSession, sf_dir: str, table_name: str = "stream_ss_join"
) -> DataFrame:
    events = _event_stream(spark, sf_dir)  # already watermarked
    views, purchases = _split(events)
    out = _view_purchase_join(views, purchases)
    q = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def batch_distinct_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir)["events"]
    return events.select("user_id", "event_type").distinct()


def streaming_dedup_user_types(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "stream_dedup",
    within_watermark: bool = False,
) -> DataFrame:
    """First-seen (user_id, event_type) pairs from the stream.

    ``within_watermark=False`` keeps all seen keys in state — exact batch
    parity, unbounded state (fine for bounded backfills). ``True`` uses
    dropDuplicatesWithinWatermark: state expires after the watermark delay,
    so keys recurring farther apart than the watermark re-emit — a superset
    of exact distinct, with state bounded for indefinite streams.
    """
    events = _event_stream(spark, sf_dir)
    keys = events.select("user_id", "event_type", "ts")
    if within_watermark:
        deduped = keys.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    else:
        deduped = keys.dropDuplicates(["user_id", "event_type"])
    out = deduped.select("user_id", "event_type")
    q = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)


def _enrich_purchases(purchases: DataFrame, customers: DataFrame) -> DataFrame:
    """Per-segment purchase totals: purchases keyed by user joined to the
    static customer dim (user_id -> c_custkey), aggregated by segment.
    Money in exact integer cents until output."""
    # customer is SF-growing (150k rows x SF), so the static enrichment dim
    # carries no pinned broadcast hint — Spark's stream-static join planner
    # (and AQE on the batch path) picks the strategy (r7 VERDICT item 1).
    joined = purchases.join(
        customers.select("c_custkey", "c_mktsegment"),
        purchases["user_id"] == F.col("c_custkey"),
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(cents(F.coalesce(F.col("value"), F.lit(0.0)))).alias("cents"),
        )
        .select("segment", "n_purchases", "cents")
    )


def batch_purchase_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir)
    purchases = tables["events"].filter(F.col("event_type") == "purchase")
    return _enrich_purchases(purchases, tables["customer"])


def streaming_purchase_segments(
    spark: SparkSession, sf_dir: str, table_name: str = "stream_static_join"
) -> DataFrame:
    """STREAM-STATIC join: the event stream enriched against the static
    customer dimension. The static side is planned as a broadcast per
    micro-batch — no stream state at all (unlike stream-stream joins), which
    is the 100 TB-scale enrichment pattern: dimension updates are picked up
    per batch, the stream never shuffles on the join key."""
    stream = _event_stream(spark, sf_dir)
    purchases = stream.filter(F.col("event_type") == "purchase")
    static_cust = load_tables(spark, sf_dir)["customer"]
    out = _enrich_purchases(purchases, static_cust)
    q = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
