"""Pipeline builder: config → ordered DataFrame-transform chain.

Mirrors the reference's processing-chain construction
(``libbeat/publisher/processing/default.go:78-80,247-365``): a fixed
global order of (1) normalization, (2) tags, (3) constant fields,
(4) input-level processors, (5) builtin fields, (6) global processors.
Each ``processors:`` entry is one dict keyed by the processor name
(looked up in the registry) plus an optional ``when:`` guard;
``if/then/else`` composes (``conditionals.go:113-187``).

The "IR" is the Catalyst logical plan built from the chained
expressions — each processor contributes withColumn/filter/join nodes
and Catalyst collapses adjacent projections into single stages, so a
50-processor chain still compiles to a handful of codegen'd operators.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition
from beats_spark.processors.base import DFProc, Proc, build_processor


class IfThenElse(Proc):
    """``{"if": cond, "then": [procs], "else": [procs]}`` — the rows
    matching ``if`` flow through ``then``, the rest through ``else``,
    results unioned (per-row processor dispatch, set-oriented)."""

    when = None

    def __init__(self, entry: dict):
        self.cond = entry["if"]
        then = entry.get("then") or []
        other = entry.get("else") or []
        self.then_procs = [build_processor(e) for e in (then if isinstance(then, list) else [then])]
        self.else_procs = [
            build_processor(e) for e in (other if isinstance(other, list) else [other])
        ]

    def __call__(self, df: DataFrame) -> DataFrame:
        cond = compile_condition(self.cond, df)
        yes = df.filter(cond)
        no = df.filter(~cond | cond.isNull())
        for p in self.then_procs:
            yes = p(yes)
        for p in self.else_procs:
            no = p(no)
        return yes.unionByName(no, allowMissingColumns=True)


def build_pipeline(
    processors: Sequence[dict | Proc | Callable[[DataFrame], DataFrame]],
) -> Callable[[DataFrame], DataFrame]:
    """Compile a processor config list into one DF → DF function.

    Entries may be config dicts (registry lookup), pre-built processors,
    or bare callables — matching how the reference mixes client and
    global processor lists into one ordered chain.
    """
    procs: list[Callable[[DataFrame], DataFrame]] = []
    for entry in processors:
        if isinstance(entry, dict):
            procs.append(build_processor(entry))
        elif isinstance(entry, Proc) or callable(entry):
            procs.append(entry)
        else:
            raise TypeError(f"bad pipeline entry {entry!r}")

    def run(df: DataFrame) -> DataFrame:
        for p in procs:
            df = p(df)
        return df

    return run


def normalize(df: DataFrame, drop_empty_col: str | None = "message") -> DataFrame:
    """``generalizeEvent`` analogue (``processing/processors.go:45-63``):
    Spark rows are already canonical generic values; the one behavioral
    piece is dropping empty events."""
    if drop_empty_col and drop_empty_col in df.columns:
        return df.filter(
            F.col(drop_empty_col).isNotNull() & (F.col(drop_empty_col) != "")
        )
    return df
