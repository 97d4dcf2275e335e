"""Streaming sources producing the engine's event schema.

The reference's inputs (``filebeat/input/*``: log tail, tcp, kafka,
...) are all "rows arriving over time". Structured Streaming gives us
the same pluggability for free: any ``readStream`` source whose rows
can be mapped to the event schema slots into the pipeline unchanged.
Provided here:

- ``stream_events``  — rate source → deterministic synthetic events
  (identical rows to ``datagen.generate_events``, keyed off the rate
  source's monotonically increasing ``value``).
- ``stream_parquet_dir`` — file-arrival source over an events
  directory (the "log directory being written to" analogue; new files
  = new harvester work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beats_spark.datagen import event_exprs


def stream_events(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_sources: int = 10,
    parts_per_source: int = 4,
    hot_fraction: float = 0.6,
    garbage_every: int = 50,
) -> DataFrame:
    """Unbounded event stream; row ``i`` is byte-identical to batch row
    ``i`` from ``generate_events`` (same pure-function construction)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            *event_exprs(
                F.col("value"), n_sources, parts_per_source, hot_fraction, garbage_every
            )
        )
    )


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema=None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over parquet events (new files are picked up
    per trigger — the scan-frequency/harvester-spawn analogue of
    ``filebeat/input/log/input.go:204,454``)."""
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)
