"""Event-format-string compiler: ``"errors-%{[source]}-%{+yyyy.MM.dd}"`` → Column.

Mirrors the reference's format grammar
(``libbeat/common/fmtstr/formatevents.go:36-49``):

- ``%{[field.path]}``          field access (dotted path)
- ``%{[field]:default}``       with fallback when the field is missing
- ``%{+yyyy.MM.dd}``           timestamp format, applied to the event time

Output is a single ``concat`` Column. A missing field without a default
makes the whole result NULL (``concat`` null-propagates) — the Spark
analogue of the reference's "format error → selector yields no value,
fall through" behavior. Constant-only strings fold to a literal at
compile time (the reference's const-folding,
``libbeat/outputs/outil/select.go:192-205``) — Catalyst would fold them
anyway via ConstantFolding.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from beats_spark.conditions import Resolver, make_resolver

_TOKEN = re.compile(r"%\{(?P<body>[^}]*)\}")


def compile_fmtstr(
    fmt: str,
    resolver: Resolver | None = None,
    ts_col: str = "ts",
) -> Column:
    """Compile a format string to a string Column."""
    if resolver is None:
        resolver = make_resolver(None)

    pieces: list[Column] = []
    is_const = True
    pos = 0
    for m in _TOKEN.finditer(fmt):
        if m.start() > pos:
            pieces.append(F.lit(fmt[pos : m.start()]))
        body = m.group("body")
        if body.startswith("+"):
            # timestamp pattern; yyyy/MM/dd/HH/mm/ss are shared between
            # the reference's Joda-style layouts and Java DateTimeFormatter.
            pieces.append(F.date_format(F.col(ts_col), body[1:]))
        else:
            default: str | None = None
            field = body
            if "]:" in body:
                field, _, default = body.partition("]:")
                field = field + "]"
            if field.startswith("[") and field.endswith("]"):
                path = field[1:-1].replace("][", ".")  # [a][b] → a.b
            else:
                path = field
            col = resolver(path).cast("string")
            if default is not None:
                col = F.coalesce(col, F.lit(default))
            pieces.append(col)
        is_const = False
        pos = m.end()
    if pos < len(fmt):
        pieces.append(F.lit(fmt[pos:]))

    if not pieces:
        return F.lit("")
    if is_const:
        return F.lit(fmt)  # const-fold
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)
