"""Streaming pipeline: the batch plan on an unbounded source.

The processor chain, routing selector, and enrichment joins are the
SAME objects as the batch path (`LogPipeline.routed` is a pure DF→DF
function; dissect/conditions/fmtstr are column expressions; enrichment
is a stream-static broadcast join). What streaming adds:

- **foreachBatch fan-out** with per-batch idempotent sink writes:
  ``run_id = batch id`` + dynamic partition overwrite makes replays
  after restart rewrite the same partitions — at-least-once delivery
  collapsing to effectively-once, the reference's guaranteed-send +
  dedup-by-identity (``pipeline/retry.go``, stable kafka partitioning
  ``kafka/partition.go:120-138``).
- **checkpointLocation** = the registrar: Spark's offset log persists
  per-source progress; restart resumes from the last committed batch
  (``filebeat/registrar/registrar.go`` analogue, managed by Spark).
- **watermarked windowed aggregates**: the per-sink counts as a
  continuous query (``withWatermark`` bounds state; late events beyond
  the watermark are dropped — the reference has no late-data handling
  at all, §2.9, so this is a strict capability superset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from beats_spark.app import LogPipeline
from beats_spark.routing import fanout_counts, fanout_write, fanout_write_snapshot


def dedup_stream(
    df: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Effectively-once on an at-least-once stream: drop event replays
    by identity within the watermark horizon.

    The reference achieves this with per-item ES dedup (409 handling,
    ``elasticsearch/client.go:370-407``) and stable kafka partitioning;
    Spark's ``dropDuplicatesWithinWatermark`` is the native equivalent —
    state is bounded by the watermark, so 10^12-row streams hold only
    the horizon's keys."""
    keys = keys or ["doc_id"]
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


class StreamingLogPipeline:
    """Run a configured LogPipeline over a streaming source."""

    def __init__(self, pipeline: LogPipeline, sink_dir: str, checkpoint_dir: str,
                 counts_dir: str | None = None):
        self.pipeline = pipeline
        self.sink_dir = sink_dir
        self.checkpoint_dir = checkpoint_dir
        self.counts_dir = counts_dir

    def routed(self, stream_df: DataFrame) -> DataFrame:
        return self.pipeline.routed(stream_df)

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            fanout_write(batch_df, self.sink_dir, run_id=f"b{batch_id:012d}")
            if self.counts_dir:
                # partition by batch_id + dynamic overwrite: a foreachBatch
                # replay after restart rewrites ITS batch's counts instead
                # of appending duplicate events_acked rows — the same
                # idempotency contract as the sink write above.
                (
                    fanout_counts(batch_df)
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.partitionBy("batch_id")
                    .option("partitionOverwriteMode", "dynamic")
                    .mode("overwrite")
                    .parquet(self.counts_dir)
                )
        finally:
            batch_df.unpersist()

    def start(self, stream_df: DataFrame, trigger: dict | None = None) -> StreamingQuery:
        """Route the stream and fan out to per-sink directories, one
        idempotent write per micro-batch."""
        routed = self.routed(stream_df)
        return (
            routed.writeStream.outputMode("append")
            .foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def start_snapshot(self, stream_df: DataFrame, table,
                       trigger: dict | None = None) -> StreamingQuery:
        """Exactly-once streaming fan-out into the snapshot-log table
        (:class:`beats_spark.snapshots.SnapshotTable`) — Iceberg's
        streaming-sink commit semantics: each micro-batch lands as ONE
        atomic snapshot commit (every sink visible together or not at
        all), keyed by batch id, so a foreachBatch replay after
        restart REPLACES its own commit instead of appending
        duplicates. Readers always see a whole number of batches and
        can time-travel to any batch boundary; the one-directory-per-
        batch accumulation folds away with ``table.compact``."""
        routed = self.routed(stream_df)

        def write(batch_df: DataFrame, batch_id: int) -> None:
            fanout_write_snapshot(batch_df, table, run_id=f"b{batch_id:012d}")

        return (
            routed.writeStream.outputMode("append")
            .foreachBatch(write)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )

    def start_window_counts(
        self,
        stream_df: DataFrame,
        agg_dir: str,
        checkpoint_dir: str,
        window: str = "1 minute",
        watermark: str = "2 minutes",
        trigger: dict | None = None,
    ) -> StreamingQuery:
        """Continuous per-(sink, source, level, window) counts with a
        watermark bounding the aggregation state."""
        routed = self.routed(stream_df)
        agg = (
            routed.withWatermark("ts", watermark)
            .groupBy("sink", "source", "level", F.window("ts", window).alias("w"))
            .agg(F.count(F.lit(1)).alias("events"))
            .select("sink", "source", "level", F.col("w.start").alias("window_start"), "events")
        )
        return (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", agg_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
