"""Redis sink shape: the reference's redis output re-expressed for
Spark — code-complete, gated behind ``execute`` (no redis server or
client library in this sandbox).

Mirrors ``libbeat/outputs/redis/redis.go:50`` + ``client.go``:

- **key** via the outil selector grammar (same
  :func:`beats_spark.routing.compile_selector` the ES index / kafka
  topic selectors use — the reference builds all three from one
  machinery).
- **value** = JSON codec (JVM ``to_json``).
- **data_type** list|channel → LPUSH vs PUBLISH
  (``redis/client.go:167-204``).

``redis_frame`` is the testable surface; ``write_redis(execute=True)``
performs per-partition LPUSH pipelining with a real client on a real
cluster (executors each open one connection and pipeline their
partition — the Spark analogue of the reference's connection-per-worker
publish loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.routing import compile_selector

DATA_TYPES = ("list", "channel")


def redis_frame(
    df: DataFrame,
    key: dict | str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Project ``df`` into the redis sink shape ``(key, value)``.

    ``key`` is a selector config (dict) or a bare format string — the
    reference's ``key: "%{[fields.list]:fallback}"`` shape.
    """
    if isinstance(key, str):
        key = {"indices": [], "default": key}
    key_col = compile_selector(key, df, ts_col)
    cols = value_cols or list(df.columns)
    value = F.to_json(F.struct(*[F.col(c) for c in cols]))
    return df.select(key_col.alias("key"), value.alias("value"))


def write_redis(
    df: DataFrame,
    host: str,
    port: int,
    key: dict | str,
    data_type: str = "list",
    ts_col: str = "ts",
    execute: bool = False,
) -> DataFrame:
    """Build (and optionally run) the redis write.

    Returns the ``(key, value)`` frame. With ``execute=True`` each
    partition opens one connection and pipelines LPUSH (data_type
    "list") or PUBLISH ("channel") — requires the ``redis`` client
    package and a reachable server, neither of which exists in this
    sandbox (documented non-goal; the shape and partition-level
    batching are what a real deployment reuses).
    """
    if data_type not in DATA_TYPES:
        raise ValueError(f"data_type must be one of {DATA_TYPES}, got {data_type!r}")
    frame = redis_frame(df, key, ts_col)
    if execute:
        def send(rows):  # pragma: no cover - needs redis server
            try:
                import redis as _redis
            except ImportError as e:
                raise NotImplementedError(
                    "redis client library not available in this environment"
                ) from e
            r = _redis.Redis(host=host, port=port)
            pipe = r.pipeline()
            for row in rows:
                if data_type == "list":
                    pipe.lpush(row["key"], row["value"])
                else:
                    pipe.publish(row["key"], row["value"])
            pipe.execute()

        frame.foreachPartition(send)
    return frame
