"""Output codecs: how routed events serialize at the sink boundary.

Re-expresses the reference's output codec registry
(``libbeat/outputs/codec/json/json.go`` and
``codec/format/format.go:34``): the ``json`` codec renders the whole
event as one JSON document per row; the ``format`` codec renders a
format-string template (the same ``%{[field]}`` grammar as routing).

Both are pure column expressions — at 10^12 rows the encode happens
inside the write stage's codegen, never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import make_resolver
from beats_spark.fmtstr import compile_fmtstr


def encode_json(
    df: DataFrame,
    target: str = "encoded",
    columns: list[str] | None = None,
    drop_nulls: bool = True,
) -> DataFrame:
    """JSON codec: one JSON document per event (column subset or all).

    ``drop_nulls`` mirrors the reference dropping absent fields from the
    rendered document (a Beats event simply has no such key).
    """
    cols = columns or df.columns
    opts = {"ignoreNullFields": "true" if drop_nulls else "false"}
    return df.withColumn(target, F.to_json(F.struct(*cols), opts))


def encode_format(
    df: DataFrame,
    template: str,
    target: str = "encoded",
    ts_col: str = "ts",
) -> DataFrame:
    """Format-string codec: ``%{[field]}`` / ``%{+yyyy.MM.dd}`` template
    per event (codec/format/format.go:34)."""
    resolver = make_resolver(df)
    return df.withColumn(target, compile_fmtstr(template, resolver, ts_col))


def console_lines(df: DataFrame, columns: list[str] | None = None) -> Column:
    """The console sink's JSON-lines column (console/console.go:54)."""
    return encode_json(df, columns=columns)["encoded"]
