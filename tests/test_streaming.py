"""Streaming/batch differential: the streaming sessionization run to
completion must equal the batch session_window aggregation on the same files
(same comparison discipline as the DuckDB oracle, applied to the streaming
engine)."""

from __future__ import annotations

from datafusion_distributed_spark.streaming import (
    batch_session_counts,
    batch_sliding_counts,
    batch_tumbling_counts,
    batch_user_totals,
    streaming_session_counts,
    streaming_sliding_counts,
    streaming_tumbling_counts,
    streaming_user_totals,
)

from .conftest import SF_DIR


def _key(rows):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.first_event_id)
        for r in rows
    )


def test_streaming_sessions_match_batch(spark):
    batch = batch_session_counts(spark, SF_DIR).collect()
    stream = streaming_session_counts(spark, SF_DIR).collect()
    assert len(batch) > 0
    assert _key(stream) == _key(batch)


def test_stateful_user_totals_match_batch(spark):
    batch = batch_user_totals(spark, SF_DIR).collect()
    stream = streaming_user_totals(spark, SF_DIR).collect()
    assert len(batch) > 0
    b = sorted((r.user_id, r.n_events, r.value_cents) for r in batch)
    s = sorted((r.user_id, r.n_events, r.value_cents) for r in stream)
    assert s == b


def test_streaming_tumbling_matches_batch(spark):
    batch = batch_tumbling_counts(spark, SF_DIR).collect()
    stream = streaming_tumbling_counts(spark, SF_DIR).collect()
    assert len(batch) > 0
    b = sorted((r.win_start, r.event_type, r.n_events, r.first_event_id) for r in batch)
    s = sorted((r.win_start, r.event_type, r.n_events, r.first_event_id) for r in stream)
    assert s == b


def test_streaming_sliding_matches_batch(spark):
    batch = batch_sliding_counts(spark, SF_DIR).collect()
    stream = streaming_sliding_counts(spark, SF_DIR).collect()
    assert len(batch) > 0
    # Sliding windows: each event lands in exactly 2 overlapping hourly
    # windows (1 h window, 30 m slide), so window counts sum to 2x the feed.
    from datafusion_distributed_spark.tables import load_tables

    n_events = load_tables(spark, SF_DIR)["events"].count()
    assert sum(r.n_events for r in batch) == 2 * n_events
    b = sorted((r.win_start, r.n_events) for r in batch)
    s = sorted((r.win_start, r.n_events) for r in stream)
    assert s == b


def test_stream_stream_join_matches_batch(spark):
    from datafusion_distributed_spark.streaming import (
        batch_view_purchase_join,
        streaming_view_purchase_join,
    )

    batch = batch_view_purchase_join(spark, SF_DIR).collect()
    stream = streaming_view_purchase_join(spark, SF_DIR).collect()
    key = lambda rows: sorted((r.user_id, r.view_id, r.purchase_id) for r in rows)
    assert len(batch) > 0
    assert key(stream) == key(batch)


def test_streaming_dedup_matches_batch_distinct(spark):
    from datafusion_distributed_spark.streaming import (
        batch_distinct_user_types,
        streaming_dedup_user_types,
    )

    batch = batch_distinct_user_types(spark, SF_DIR).collect()
    stream = streaming_dedup_user_types(spark, SF_DIR).collect()
    key = lambda rows: sorted((r.user_id, r.event_type) for r in rows)
    assert key(stream) == key(batch)


def test_streaming_dedup_within_watermark_bounds(spark):
    # Bounded-state variant: emits every exact-distinct key at least once
    # (superset semantics when duplicates recur beyond the watermark), never
    # more than the raw row count.
    from datafusion_distributed_spark.streaming import (
        batch_distinct_user_types,
        streaming_dedup_user_types,
    )

    exact = {
        (r.user_id, r.event_type)
        for r in batch_distinct_user_types(spark, SF_DIR).collect()
    }
    rows = streaming_dedup_user_types(
        spark, SF_DIR, table_name="stream_dedup_wm", within_watermark=True
    ).collect()
    got = {(r.user_id, r.event_type) for r in rows}
    assert got == exact  # every key appears
    assert len(rows) >= len(exact)


def test_cents_quantization_matches_batch_round():
    """The stateful fold's cent quantization must be HALF_UP (F.round
    semantics), not pandas banker's rounding: 0.125*100 = 12.5 exactly
    -> 13 cents (banker's would give 12)."""
    import pandas as pd

    from datafusion_distributed_spark.streaming.stateful import _cents_half_up

    assert _cents_half_up(pd.Series([0.125])) == 13
    assert _cents_half_up(pd.Series([0.135])) == 14  # banker's agrees here
    assert _cents_half_up(pd.Series([-0.125])) == -13  # away from zero
    assert _cents_half_up(pd.Series([1.0, None, 2.345])) == 100 + 235


def test_stream_static_join_matches_batch(spark):
    from datafusion_distributed_spark.streaming.joins import (
        batch_purchase_segments,
        streaming_purchase_segments,
    )

    batch = batch_purchase_segments(spark, SF_DIR).collect()
    stream = streaming_purchase_segments(spark, SF_DIR).collect()
    key = lambda rows: sorted((r.segment, r.n_purchases, r.cents) for r in rows)
    assert len(batch) > 0
    assert key(stream) == key(batch)


def test_streaming_foreachbatch_parquet_sink_matches_batch(spark, tmp_path):
    from datafusion_distributed_spark.streaming.windows import (
        batch_tumbling_counts,
        streaming_tumbling_to_parquet,
    )

    result = streaming_tumbling_to_parquet(
        spark,
        SF_DIR,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    batch = batch_tumbling_counts(spark, SF_DIR).collect()
    key = lambda rows: sorted(
        (r.win_start, r.event_type, r.n_events, r.first_event_id) for r in rows
    )
    assert len(batch) > 0
    assert key(result.collect()) == key(batch)


def test_streaming_append_mode_emits_only_closed_windows(spark):
    """Append mode (the production file-sink mode) emits a window only after
    the watermark passes its end. With a bounded availableNow run the final
    watermark stops at max(event_time) - delay, so the tail windows are
    withheld: output must be exactly the batch windows whose end <= final
    watermark — a real semantic difference from complete mode that users of
    durable sinks hit immediately."""
    import datetime as dt

    from datafusion_distributed_spark.streaming.windows import (
        _event_stream,
        _tumbling_agg,
        _WATERMARK,
        batch_tumbling_counts,
    )
    import pyspark.sql.functions as F

    out = _tumbling_agg(_event_stream(spark, SF_DIR)).select(
        F.col("win_start").cast("timestamp_ntz").alias("win_start"),
        "event_type",
        "n_events",
        "first_event_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stream_append_windows")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    appended = spark.table("stream_append_windows").collect()
    batch = batch_tumbling_counts(spark, SF_DIR).collect()

    from datafusion_distributed_spark.tables import load_tables

    max_ts = load_tables(spark, SF_DIR)["events"].agg(F.max("ts")).collect()[0][0]
    assert _WATERMARK == "1 hour"
    watermark = max_ts - dt.timedelta(hours=1)
    closed = [
        r for r in batch
        if r.win_start + dt.timedelta(hours=1) <= watermark
    ]
    key = lambda rows: sorted(
        (r.win_start, r.event_type, r.n_events, r.first_event_id) for r in rows
    )
    assert len(appended) > 0
    assert len(appended) < len(batch), "append mode must withhold tail windows"
    assert key(appended) == key(closed)


def test_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Checkpointed restart is exactly-once: a stream stopped after consuming
    part of its input and restarted with the SAME checkpoint directory must
    (a) skip the already-committed files — the restarted run's input-row
    count covers only the new files — and (b) converge to the same counts a
    batch query computes over everything. This is the durability contract a
    100 TB ingest pipeline leans on when an executor or driver dies
    mid-backfill."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    sink: dict[int, list] = {}

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    half_a.coalesce(1).write.mode("overwrite").parquet(src)

    schema = events.schema

    def run_available(tag: str) -> int:
        """Run the counting stream over whatever files exist now; return the
        total input rows this RUN consumed (from progress, not the sink)."""
        stream = spark.readStream.schema(schema).parquet(src)
        agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

        consumed = 0

        def write_batch(batch_df, batch_id):
            sink[batch_id] = batch_df.collect()

        q = (
            agg.writeStream.foreachBatch(write_batch)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        for p in q.recentProgress:
            consumed += p["numInputRows"]
        return consumed

    n_a = half_a.count()
    n_b = half_b.count()
    consumed_first = run_available("first")
    assert consumed_first == n_a

    # second half arrives while the stream is DOWN; restart from checkpoint
    half_b.coalesce(1).write.mode("append").parquet(src)
    consumed_second = run_available("restart")
    # exactly-once: the restarted run reads ONLY the new file's rows
    assert consumed_second == n_b

    final = {r.event_type: r.n for r in sink[max(sink)]}
    expected = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expected


def test_rocksdb_state_store_matches_batch(spark):
    """Large-state streaming path: the same watermark aggregation under the
    RocksDB state store provider (state spills to local disk instead of
    living in executor heap — the provider a 100 TB stateful stream needs)
    must produce exactly the in-memory provider's results."""
    import pyspark.sql.functions as F

    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        raw_schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        stream = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(SF_DIR)
        )
        agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r.event_type: r.n for r in spark.table("rocksdb_counts").collect()}
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)

    expected = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected
