"""Durable spool: the disk-queue / spool-file analogue as a staging
table (reference: ``libbeat/publisher/queue/diskqueue`` segments +
acked-segment cleanup; the spool decouples producers from consumers and
survives restarts).

The Spark-native shape is a parquet staging directory:

- ``enqueue(df, batch_id)`` writes one batch directory
  ``batches/batch_id=<id>/`` — overwrite mode, so a retried producer
  re-writes its own batch (stable identity = the segment's write
  position in the reference).
- ``pending()`` = batch dirs on disk minus committed markers — the
  queue's unacked segments.
- ``read_pending(spark)`` returns ONE DataFrame over all pending
  batches (with ``_spool_batch`` lineage), so the consumer drains the
  backlog in a single plan instead of per-batch loops.
- ``commit(batch_ids)`` drops marker files under ``consumed/`` — the
  ACK. Ordering contract: commit strictly AFTER the downstream sink
  write of the same batches (the registrar/ACK ordering the pipeline
  uses, ``app.LogPipeline.run_batch``). A crash between sink write and
  commit replays the batch; sinks are idempotent per run_id, so
  at-least-once collapses to effectively-once.
- ``vacuum()`` deletes consumed batch directories — the reference's
  deletion of fully-acked segments (``diskqueue/segments.go``).

Markers use plain file ops (this sandbox's spool lives on local disk);
on HDFS/S3 the same two-directory layout works via the Hadoop
FileSystem API — the commit marker remains a zero-byte file create,
which is atomic on both.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Spool:
    def __init__(self, path: str):
        self.path = path
        self.batches_dir = os.path.join(path, "batches")
        self.consumed_dir = os.path.join(path, "consumed")
        os.makedirs(self.batches_dir, exist_ok=True)
        os.makedirs(self.consumed_dir, exist_ok=True)

    # -- producer side --

    def enqueue(self, df: DataFrame, batch_id: str) -> str:
        """Durably stage one batch; idempotent per ``batch_id``."""
        if "=" in batch_id or "/" in batch_id:
            raise ValueError(f"invalid batch_id {batch_id!r}")
        dest = os.path.join(self.batches_dir, f"batch_id={batch_id}")
        df.write.mode("overwrite").parquet(dest)
        return batch_id

    # -- consumer side --

    def _on_disk(self) -> set[str]:
        return {
            d.split("=", 1)[1]
            for d in os.listdir(self.batches_dir)
            if d.startswith("batch_id=")
        }

    def _consumed(self) -> set[str]:
        return set(os.listdir(self.consumed_dir))

    def pending(self) -> list[str]:
        return sorted(self._on_disk() - self._consumed())

    def read_pending(self, spark: SparkSession) -> DataFrame | None:
        """One DataFrame over every pending batch (``_spool_batch`` =
        originating batch id); None when the spool is drained."""
        ids = self.pending()
        if not ids:
            return None
        paths = [os.path.join(self.batches_dir, f"batch_id={b}") for b in ids]
        df = spark.read.parquet(*paths)
        # recover the batch id from the file path (partition-style dirs
        # are read per-path, so input_file_name carries it)
        return df.withColumn(
            "_spool_batch",
            F.regexp_extract(F.input_file_name(), r"batch_id=([^/]+)/", 1),
        )

    def commit(self, batch_ids: list[str]) -> None:
        """ACK batches — strictly after the downstream write succeeds."""
        for b in batch_ids:
            open(os.path.join(self.consumed_dir, b), "w").close()

    def vacuum(self) -> list[str]:
        """Delete fully-acked batch data (segment cleanup)."""
        removed = []
        for b in sorted(self._on_disk() & self._consumed()):
            shutil.rmtree(os.path.join(self.batches_dir, f"batch_id={b}"))
            removed.append(b)
        return removed
