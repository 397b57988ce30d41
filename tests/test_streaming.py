"""Streaming/batch differential: the streaming sessionization run to
completion must equal the batch session_window aggregation on the same files
(same comparison discipline as the DuckDB oracle, applied to the streaming
engine)."""

from __future__ import annotations

from datafusion_distributed_spark.streaming import (
    batch_session_counts,
    batch_user_totals,
    streaming_session_counts,
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
