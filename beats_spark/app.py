"""LogPipeline: the end-to-end parse → enrich → route → aggregate job.

This is the Spark translation of the reference's whole event path
(``filebeat/beater/filebeat.go:313`` → harvester → processor chain →
queue → output workers → ACK → registrar, SURVEY.md §3.1): one lazy
DataFrame plan per run, with the reference's thread/process boundaries
becoming stage boundaries chosen by Catalyst/AQE.

Scale design notes (100 TB / 10^12 rows):

- The parse + processor chain is pure narrow work — no shuffle until
  the aggregate; Catalyst collapses the whole chain into one
  WholeStageCodegen scan stage.
- Enrichment dims broadcast (they are per-process caches in the
  reference); the fact side never shuffles for enrichment.
- The routed write is a single pass (``partitionBy(sink, run_id)``),
  and the per-sink/window aggregate is a partial+final hash aggregate
  whose only shuffle key includes the window — the skewed ``source``
  key is diluted by (sink, level, window), and AQE skew handling
  covers the rest.
- Checkpoint commit happens strictly after the sink write of the same
  ``run_id`` (ACK-before-registrar ordering), and the sink write itself
  is idempotent per run_id → crash between the two steps replays
  safely.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beats_spark import checkpoint as cp
from beats_spark.metrics import PipelineMetrics
from beats_spark.pipeline import build_pipeline, normalize
from beats_spark.routing import add_sink_column, fanout_counts, fanout_write, sink_window_counts


@dataclass
class LogPipeline:
    """Configured pipeline: processors (SURVEY §3.2 order is the caller's
    list order), routing selector, aggregate window."""

    processors: Sequence[dict | Callable[[DataFrame], DataFrame]]
    routing: dict
    window: str = "1 hour"
    checkpoint_path: str | None = None
    drop_empty_col: str | None = "message"
    files_per_sink: int | None = None  # bound sink file counts (routing.fanout_write)
    _chain: Callable[[DataFrame], DataFrame] = field(init=False, repr=False, default=None)

    def __post_init__(self) -> None:
        self._chain = build_pipeline(self.processors)

    # -- plan builders (lazy, composable) --

    def routed(self, df: DataFrame) -> DataFrame:
        """read → normalize → processor chain → sink column."""
        df = normalize(df, self.drop_empty_col)
        df = self._chain(df)
        return add_sink_column(df, self.routing)

    def aggregates(self, routed: DataFrame) -> DataFrame:
        return sink_window_counts(routed, window=self.window)

    # -- batch runner with checkpoint/resume --

    def run_batch(
        self,
        spark: SparkSession,
        df: DataFrame,
        sink_dir: str,
        run_id: str | None = None,
        agg_dir: str | None = None,
    ) -> dict:
        """Execute one resumable batch run.

        1. resume-filter the input against committed offsets
        2. route; persist the routed frame (single-pass fan-out)
        3. write all sinks in one partitioned write (idempotent per run_id)
        4. write the window aggregates (optional)
        5. commit per-partition offsets + lineage metrics
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        metrics = PipelineMetrics()

        if self.checkpoint_path:
            state = cp.load_state(spark, self.checkpoint_path)
            df = cp.resume_filter(df, state)
        df = metrics.observe_count(df, "events_total")

        routed = self.routed(df)
        routed = metrics.observe_count(routed, "events_published")
        routed.persist()
        try:
            fanout_write(routed, sink_dir, run_id=run_id,
                         files_per_sink=self.files_per_sink)
            if agg_dir:
                self.aggregates(routed).withColumn("run_id", F.lit(run_id)).write.mode(
                    "append"
                ).parquet(agg_dir)
            sink_counts = {r["sink"]: r["events_acked"] for r in fanout_counts(routed).collect()}
            if self.checkpoint_path:
                stats = cp.partition_stats(df, routed, run_id)
                cp.commit(stats, self.checkpoint_path)
        finally:
            routed.unpersist()

        out = {"run_id": run_id, "sink_counts": sink_counts}
        out.update(metrics.get())
        return out
