"""Structured Streaming face of the engine.

The reference pipeline IS a streaming system (harvesters tail files and
push events continuously); our batch plan covers the Iceberg-table
north rule, and this package provides the same operator semantics over
``readStream`` sources:

- ``sources``       — rate-source events with the exact batch schema
- ``multiline``     — stateful pattern/count merge with flush timeout
  (``applyInPandasWithState`` = the reader's 5 s timeout flush)
- ``pipeline``      — foreachBatch fan-out with per-batch idempotent
  sink writes + watermarked windowed aggregates
"""

from beats_spark.streaming.multiline import streaming_multiline_pattern
from beats_spark.streaming.pipeline import StreamingLogPipeline, dedup_stream
from beats_spark.streaming.sources import stream_events

__all__ = [
    "StreamingLogPipeline",
    "dedup_stream",
    "stream_events",
    "streaming_multiline_pattern",
]
