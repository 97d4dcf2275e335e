"""Streaming exact dedup — first-arrival-wins across micro-batches.

Spark-first: the state store behind Structured Streaming's built-in
``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` IS the operator
(no custom state UDF — the JVM state store scales, checkpoints, and
GCs it); this module only standardizes the fingerprint column (same
normalized-md5 key as the batch ``corpus.dedup`` family, so a batch
backfill and the live stream dedupe against the same key space) and
the two state regimes:

- unbounded: exact across the whole stream lifetime; state grows with
  #distinct keys (fine for bounded key spaces — sources, hosts;
  NOT for open-ended 100 TB document streams).
- watermark-bounded (``within=``): duplicates are only suppressed
  while their key is younger than the watermark horizon — state is
  GC'd past it, the standard unbounded-stream tradeoff. This is the
  100 TB regime; compose with the batch ``dedup_incremental`` for
  exactness beyond the horizon.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fingerprint_col(text_col: str = "text", normalize: bool = True):
    """The batch family's normalized fingerprint: md5 of
    lowercased, whitespace-collapsed, trimmed text."""
    c = F.col(text_col)
    if normalize:
        c = F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
    return F.md5(c)


def stream_dedup_exact(
    df: DataFrame,
    key_cols: Sequence[str] | None = None,
    text_col: str = "text",
    fp_col: str = "fp",
    normalize: bool = True,
    ts_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """First occurrence of each key passes; later arrivals drop.

    With ``key_cols`` unset, the key is the normalized text
    fingerprint (added as ``fp_col`` so sinks can audit). ``within``
    (e.g. ``"10 minutes"``) switches to the watermark-bounded state
    regime and requires ``ts_col``. Works on batch DataFrames too
    (dropDuplicates is the same logical op), so batch tests are the
    oracle for the streaming plan.
    """
    if key_cols is None:
        df = df.withColumn(fp_col, fingerprint_col(text_col, normalize))
        key_cols = [fp_col]
    if within is not None:
        if ts_col is None:
            raise ValueError("within= requires ts_col= for the watermark")
        return df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return df.dropDuplicates(list(key_cols))
