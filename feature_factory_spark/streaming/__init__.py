"""Structured Streaming support (beyond the reference, which is batch-only
— SURVEY.md §2.3 'Streaming: none').

Design: transformers in this package are lazy plan rewrites, so every
STATELESS operator (and every PRE-FITTED stateful one) applies to a
streaming DataFrame unchanged — `transform` never triggers a job. The
helpers here add the streaming-specific pieces Spark needs on top:
watermarks, windowed/sessionized aggregation, and stream-safe pipeline
application.
"""

from .core import (
    RunningAggregator,
    SessionWindowAggregator,
    StreamingDeduplicator,
    StreamingNotSupportedError,
    WindowedAggregator,
    apply_pipeline_to_stream,
    read_stream,
    run_incremental,
)

__all__ = [
    "WindowedAggregator",
    "SessionWindowAggregator",
    "StreamingDeduplicator",
    "RunningAggregator",
    "apply_pipeline_to_stream",
    "read_stream",
    "run_incremental",
    "StreamingNotSupportedError",
]
