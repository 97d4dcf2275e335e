"""Multiline sessionization: merge raw lines into events, set-oriented.

Re-expresses the reference's streaming multiline readers
(``libbeat/reader/multiline/pattern.go:43-160`` pattern mode, defaults
at ``:52-58``; ``counter.go`` count mode) as a windowed DataFrame
program: an ``is_start`` boolean per line → running-sum group id within
each ``(source, part_id)`` stream → group-by concat. The per-stream
window shuffle is keyed on the stream identity, which is exactly the
reference's one-goroutine-per-file ordering guarantee; at 100 TB the
key cardinality is #files × #parts, so the shuffle is wide and even.

Pattern-mode semantics (matching the reference):

- ``m`` = line matches ``pattern``, inverted if ``negate``.
- ``match="after"``: a line with ``m`` true is appended to the previous
  event → a new event starts where ``m`` is false.
- ``match="before"``: a line with ``m`` true is glued to the FOLLOWING
  line → a new event starts where the PREVIOUS line had ``m`` false.
- ``flush_pattern``: a line matching it terminates the event (the next
  line starts a new one).
- ``max_lines`` (default 500): lines beyond the cap are discarded from
  the merged event (the event itself survives).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_LINES = 500


def multiline_pattern(
    df: DataFrame,
    pattern: str,
    negate: bool = False,
    match: str = "after",
    flush_pattern: str | None = None,
    max_lines: int = DEFAULT_MAX_LINES,
    partition_cols: Sequence[str] = ("source", "part_id"),
    order_col: str = "offset",
    line_col: str = "message",
    separator: str = "\n",
    merge: str = "agg",
) -> DataFrame:
    """Merge lines into multiline events; one output row per event.

    Output: partition cols + ``offset`` (first line's order value),
    ``message`` (joined), ``n_lines`` (pre-cap line count).

    ``merge`` picks the second phase (the window phase is shared).
    BOTH are single-shuffle plans — the window's hash partitioning on
    the stream key satisfies the compound-key aggregate's clustered
    distribution, so no second exchange exists (verified in the
    physical plan; bench.py ``multiline_scale`` measures both):

    - ``"agg"`` (default): groupBy(stream, group) + ordered
      ``collect_list`` — ObjectHashAggregate in place, pure JVM, the
      faster mode in-sandbox (no Arrow round-trip).
    - ``"stream"``: one ``mapInPandas`` forward pass over the window's
      (stream, order)-sorted output, carrying the open group across
      Arrow batches. Same rows; trades the JVM object agg for an
      Arrow pass — an alternative when collect_list's per-group struct
      arrays pressure executor memory on pathological group sizes.
    """
    if match not in ("after", "before"):
        raise ValueError(f"match must be after|before, got {match!r}")
    if merge not in ("agg", "stream"):
        raise ValueError(f"merge must be agg|stream, got {merge!r}")

    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    m = F.col(line_col).rlike(pattern)
    if negate:
        m = ~m

    if match == "after":
        is_start = ~m
    else:  # before: new event when the previous line did not match
        prev_m = F.lag(m, 1, False).over(w)
        is_start = ~prev_m

    if flush_pattern:
        flushed_prev = F.lag(F.col(line_col).rlike(flush_pattern), 1, False).over(w)
        is_start = is_start | flushed_prev

    # first line of each stream always starts an event
    rn = F.row_number().over(w)
    is_start = is_start | (rn == 1)

    grouped = df.withColumn(
        "_ml_group", F.sum(is_start.cast("long")).over(w)
    )
    merger = _merge_groups_stream if merge == "stream" else _merge_groups
    return merger(
        grouped, partition_cols, order_col, line_col, separator, max_lines, "_ml_group"
    )


def multiline_count(
    df: DataFrame,
    lines_count: int,
    partition_cols: Sequence[str] = ("source", "part_id"),
    order_col: str = "offset",
    line_col: str = "message",
    separator: str = "\n",
    max_lines: int = DEFAULT_MAX_LINES,
) -> DataFrame:
    """Count mode: merge every ``lines_count`` consecutive lines."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    grouped = df.withColumn(
        "_ml_group", F.floor((F.row_number().over(w) - 1) / lines_count)
    )
    return _merge_groups(
        grouped, partition_cols, order_col, line_col, separator, max_lines, "_ml_group"
    )


def _merge_groups_stream(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    line_col: str,
    separator: str,
    max_lines: int,
    group_col: str,
) -> DataFrame:
    """Shuffle-free merge: the window already leaves each physical
    partition holding whole streams, sorted by (stream, order) — so a
    group's lines are contiguous and one forward pass merges them.
    ``sortWithinPartitions`` re-states the ordering contract; the
    planner elides the sort because the window's output ordering
    already satisfies it. The open group carries across Arrow batches
    (a group can span any number of batches) and flushes at
    end-of-partition."""
    pcols = list(partition_cols)
    df = df.sortWithinPartitions(*pcols, order_col)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in pcols]
        + [f"{order_col} {fields[order_col]}", f"{line_col} string", "n_lines bigint"]
    )
    gcols = pcols + [group_col]

    def runner(batches):
        carry: tuple | None = None  # (key, order, lines, n)

        def finish(c):
            key, order, lines, n = c
            return (*key[:-1], order, separator.join(lines[:max_lines]), n)

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            agg = (
                # dropna=False: null partition keys must form a group,
                # matching merge='agg' (Spark groupBy keeps null keys)
                pdf.groupby(gcols, sort=False, dropna=False)
                .agg(
                    o=(order_col, "min"),
                    n=(order_col, "size"),
                    m=(line_col, list),
                )
                .reset_index()
            )[[*gcols, "o", "n", "m"]]
            nk = len(gcols)
            for tup in agg.itertuples(index=False, name=None):
                key, (o, n, m) = tup[:nk], tup[nk:]
                if carry is not None and carry[0] == key:
                    carry = (key, carry[1], carry[2] + m, carry[3] + n)
                else:
                    if carry is not None:
                        out.append(finish(carry))
                    carry = (key, o, list(m), int(n))
            # hold back the open tail group; emit the closed ones
            if out:
                yield pd.DataFrame(
                    out, columns=[*pcols, order_col, line_col, "n_lines"]
                )
        if carry is not None:
            yield pd.DataFrame(
                [finish(carry)], columns=[*pcols, order_col, line_col, "n_lines"]
            )

    return df.mapInPandas(runner, schema=out_schema)


def _merge_groups(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    line_col: str,
    separator: str,
    max_lines: int,
    group_col: str,
) -> DataFrame:
    # collect_list order is non-deterministic after shuffles → collect
    # (order, line) structs and array_sort; slice applies max_lines.
    lines = F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l"))))
    agg = (
        df.groupBy(*partition_cols, group_col)
        .agg(
            F.min(order_col).alias(order_col),
            lines.alias("_lines"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumn(
            line_col,
            F.concat_ws(
                separator,
                F.transform(F.slice(F.col("_lines"), 1, max_lines), lambda x: x["l"]),
            ),
        )
        .drop("_lines", group_col)
    )
    return agg.select(*partition_cols, order_col, line_col, "n_lines")
