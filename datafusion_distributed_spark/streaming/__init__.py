"""Structured Streaming operators (additive scope).

The reference is bounded-only — no watermarks, windows, or stateful streaming
exist anywhere in it (SURVEY.md §2.4: every plan node is
``Boundedness::Bounded``, /root/reference/src/codec/distributed_codec.rs:474).
These modules are therefore *extensions* for the training-data-pipeline use
case: the same event sessionization the batch engine computes, expressed as an
incremental streaming query with watermark-based state cleanup.
"""

from .joins import (
    batch_distinct_user_types,
    batch_view_purchase_join,
    streaming_dedup_user_types,
    streaming_view_purchase_join,
)
from .sessionize import batch_session_counts, streaming_session_counts
from .stateful import batch_user_totals, streaming_user_totals
from .windows import (
    batch_sliding_counts,
    batch_tumbling_counts,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)

__all__ = [
    "batch_distinct_user_types",
    "batch_session_counts",
    "batch_view_purchase_join",
    "streaming_dedup_user_types",
    "streaming_view_purchase_join",
    "batch_sliding_counts",
    "batch_tumbling_counts",
    "batch_user_totals",
    "streaming_session_counts",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "streaming_user_totals",
]
