"""Kafka sink shape: the reference's kafka output re-expressed as a
Spark kafka-format write — code-complete, gated behind ``execute``.

Mirrors ``libbeat/outputs/kafka``:

- **topic selector** (``kafka.go:52``, topic via the outil selector
  grammar) → the same :func:`beats_spark.routing.compile_selector`
  machinery emits a ``topic`` column.
- **key** (``config.go:53``, an event format string) → the same
  :mod:`beats_spark.fmtstr` compiler emits a ``key`` column; Kafka's
  own murmur2-hash partitioner then gives the reference's stable
  key → partition mapping (``partition.go:64-138`` "hash" strategy).
- **partition.hash.hash fields** → when configured, the key is the
  joined field values, matching ``cfgHashPartitioner`` hashing selected
  fields instead of the event key.
- **value** → the JSON codec (:mod:`beats_spark.codecs` writes the
  same shape); here ``to_json(struct(*))`` on the JVM.

No broker exists in this sandbox, so ``write_kafka(execute=False)``
(the default) returns the configured writer without calling
``save()``; tests validate the produced frame shape + options. On a
real cluster ``execute=True`` performs the write — Spark's kafka sink
handles batching/acks/retries (the reference's sarama client config,
``config.go:60-90``, maps to kafka producer options).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import make_resolver
from beats_spark.fmtstr import compile_fmtstr
from beats_spark.routing import compile_selector

PARTITION_STRATEGIES = ("hash", "random", "round_robin")


def kafka_frame(
    df: DataFrame,
    topics: dict,
    key: str | None = None,
    hash_fields: list[str] | None = None,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Project ``df`` into the kafka sink shape
    ``(key binary, value binary, topic string)``.

    ``topics`` is a selector config (same grammar as index routing);
    ``key`` is an event format string (``%{[field]}``); ``hash_fields``
    overrides the key with joined field values (the reference's
    ``partition.hash.hash`` list, ``partition.go:96-138``).
    """
    resolver = make_resolver(df)
    topic = compile_selector(topics, df, ts_col)
    if hash_fields:
        key_col: Column = F.concat_ws("|", *[resolver(f) for f in hash_fields])
    elif key is not None:
        key_col = compile_fmtstr(key, resolver, ts_col)
    else:
        key_col = F.lit(None).cast("string")
    cols = value_cols or [c for c in df.columns]
    value = F.to_json(F.struct(*[F.col(c) for c in cols]))
    return df.select(
        key_col.cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        topic.alias("topic"),
    )


def write_kafka(
    df: DataFrame,
    bootstrap_servers: str,
    topics: dict,
    key: str | None = None,
    hash_fields: list[str] | None = None,
    partition_strategy: str = "hash",
    ts_col: str = "ts",
    options: dict[str, str] | None = None,
    execute: bool = False,
):
    """Build (and optionally run) the kafka write.

    ``partition_strategy``: "hash" relies on Kafka's key-hash
    partitioner (stable key → partition, the reference default);
    "random"/"round_robin" drop the key so the broker-side partitioner
    spreads messages (the reference's non-consistent modes). Returns
    the configured ``DataFrameWriter``; with ``execute=True`` calls
    ``save()`` (requires a reachable broker — not available in this
    sandbox, documented non-goal).
    """
    if partition_strategy not in PARTITION_STRATEGIES:
        raise ValueError(
            f"partition strategy must be one of {PARTITION_STRATEGIES}, "
            f"got {partition_strategy!r}"
        )
    frame = kafka_frame(df, topics, key=key, hash_fields=hash_fields, ts_col=ts_col)
    if partition_strategy in ("random", "round_robin"):
        frame = frame.withColumn("key", F.lit(None).cast("binary"))
    opts = kafka_writer_options(bootstrap_servers, options)
    writer = frame.write.format("kafka").options(**opts)
    if execute:
        writer.save()
    return writer


def kafka_writer_options(bootstrap_servers: str,
                         options: dict[str, str] | None = None) -> dict[str, str]:
    """The option dict handed to the kafka writer (separate so tests can
    validate it without a broker)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, **(options or {})}
