"""Gap-based sessionization of event streams.

Not a reference operator (Beats stops at transport); this is the
standard log-analytics step downstream of the pipeline — group a key's
events into sessions separated by silence longer than ``gap``. Two
faces:

- :func:`sessionize` — per-event session assignment: ``lag`` +
  running-sum-of-boundaries over ONE window (one shuffle on the key,
  linear scan within; the textbook scale-sane plan, identical shape to
  the SQL islands-and-gaps idiom the oracle runs).
- :func:`session_agg` — per-session summary built on Spark's native
  ``session_window`` aggregate (the same operator Structured Streaming
  uses for stateful session windows, so the batch and streaming
  plans share semantics). Start/end are min/max event time, so results
  are engine-comparable (Spark's internal window end adds the gap).

Both are deterministic: ties on the timestamp are broken by
``order_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    gap: str = "30 minutes",
    ts_col: str = "ts",
    order_col: str | None = None,
    session_col: str = "session_no",
) -> DataFrame:
    """Assign each event its session ordinal within its key (0-based,
    in time order): a new session starts when the gap since the key's
    previous event exceeds ``gap`` (strictly greater, matching
    ``session_window`` merge semantics where an exactly-``gap`` spacing
    still merges)."""
    order = [ts_col] + ([order_col] if order_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap_expr), 1
    ).otherwise(0)
    cum = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, (F.sum(is_new).over(cum) - 1))


def session_agg(
    df: DataFrame,
    keys: list[str],
    gap: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session summary via the native ``session_window`` aggregate:
    (keys…, session start/end = min/max event time, n_events). One
    shuffle; in Structured Streaming the identical expression runs
    stateful with watermark eviction."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("_sw"), *keys)
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_sw")
    )
