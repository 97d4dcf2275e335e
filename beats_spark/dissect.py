"""Vectorized dissect: positional tokenizer parse, Spark-first.

Re-implements the semantics of the reference's dissect processor
(``libbeat/processors/dissect/dissect.go:58-95,104-181`` extract,
``:184-224`` resolve, types ``:250-276``; field kinds
``field.go:190-300``; tests ``testdata/dissect_tests.json``) as a
brand-new compiler with two execution paths:

1. **Static regex path** (default, JVM whole-stage-codegen): the
   tokenizer compiles to ONE anchored, non-backtracking-in-practice
   regex (lazy captures ≡ find-next-delimiter). Each output key is a
   ``regexp_extract`` column + optional cast; appends become ``concat``.
   Used whenever the tokenizer has no indirect (``*``/``&``) keys.
2. **Pandas-UDF path** (Arrow-batched, never per-row Spark UDF): the
   positional algorithm applied per batch, producing a
   ``map<string,string>`` — required for indirect keys where output
   key NAMES are data-dependent.

Tokenizer grammar: ``%{key}``, ``%{}``/``%{?name}`` skip, ``%{+key}``
append (join = preceding delimiter, default ``" "``),``%{+key/N}``
ordered append, ``%{*k}``/``%{&k}`` pointer/indirect, ``%{key->}``
greedy right-padding, ``%{key#N}`` fixed length, ``%{key|type}`` typed
(string/integer/long/float/double/boolean/ip).

Failure semantics match the reference's processor
(``processor.go:93-105``): the row is KEPT, fields are null, and
``dissect_parsing_error`` is appended to the ``log_flags`` array.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

_TOKEN_RE = re.compile(r"%\{([^}]*)\}")
_KEY_RE = re.compile(
    r"^(?P<prefix>[+*&?]?)(?P<name>[^|/#]*?)"
    r"(?:/(?P<ordinal>\d+))?(?:\#(?P<length>\d+))?"
    r"(?:\|(?P<type>\w+))?(?P<greedy>->)?$"
)

SPARK_TYPES = {
    "string": T.StringType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "ip": T.StringType(),
}

DEFAULT_JOIN = " "
PARSE_ERROR_FLAG = "dissect_parsing_error"


@dataclass
class _Field:
    kind: str  # normal | skip | named_skip | pointer | append | indirect
    name: str
    ordinal: int = 0
    length: int | None = None
    greedy: bool = False
    dtype: str | None = None
    delim_before: str = ""
    delim_after: str = ""
    idx: int = 0  # appearance order (stable sort tiebreak)
    group: int = dc_field(default=0)  # regex capture group number


def _parse_key(raw: str, idx: int, delim_before: str) -> _Field:
    if raw == "":
        return _Field(kind="skip", name="", idx=idx, delim_before=delim_before)
    m = _KEY_RE.match(raw)
    if not m:
        raise ValueError(f"invalid dissect key {raw!r}")
    prefix = m.group("prefix")
    # greedy marker may ride on the name when no other suffix present
    name = m.group("name")
    greedy = bool(m.group("greedy"))
    if name.endswith("->"):
        name, greedy = name[:-2], True
    kind = {
        "": "normal",
        "+": "append",
        "*": "pointer",
        "&": "indirect",
        "?": "named_skip",
    }[prefix]
    if kind == "normal" and name == "":
        kind = "skip"
    return _Field(
        kind=kind,
        name=name,
        ordinal=int(m.group("ordinal") or 0),
        length=int(m.group("length")) if m.group("length") else None,
        greedy=greedy,
        dtype=m.group("type"),
        delim_before=delim_before,
        idx=idx,
    )


class DissectPattern:
    """Compiled tokenizer: fields + delimiters + (if possible) one regex."""

    def __init__(self, tokenizer: str):
        self.tokenizer = tokenizer
        matches = list(_TOKEN_RE.finditer(tokenizer))
        if not matches:
            raise ValueError("tokenizer has no %{...} keys")
        self.fields: list[_Field] = []
        pos = 0
        for i, m in enumerate(matches):
            delim_before = tokenizer[pos : m.start()]
            f = _parse_key(m.group(1), i, delim_before)
            self.fields.append(f)
            pos = m.end()
        self.trailing = tokenizer[pos:]
        for i, f in enumerate(self.fields):
            f.delim_after = (
                self.fields[i + 1].delim_before if i + 1 < len(self.fields) else self.trailing
            )
        self.has_indirect = any(f.kind in ("pointer", "indirect") for f in self.fields)
        self._regex = self._build_regex() if not self.has_indirect else None

    # ---------- static regex path ----------

    def _build_regex(self) -> str:
        parts = ["(?s)^", re.escape(self.fields[0].delim_before)]
        g = 0
        for i, f in enumerate(self.fields):
            last = i == len(self.fields) - 1
            if f.length is not None:
                parts.append(f"(.{{{f.length}}})")
            elif f.delim_after:
                parts.append("(.*?)")
            else:
                parts.append("(.*)")
            g += 1
            f.group = g
            if f.delim_after:
                d = re.escape(f.delim_after)
                parts.append(f"(?:{d})+" if f.greedy else d)
            elif last and f.length is not None:
                parts.append("$")  # trailing fixed-length must end the string
            elif last and not f.delim_after:
                parts.append("$")
        return "".join(parts)

    @property
    def regex(self) -> str | None:
        return self._regex

    def output_fields(self) -> list[_Field]:
        """Saveable fields in apply order (ordinal sort, stable)."""
        saveable = [f for f in self.fields if f.kind in ("normal", "append", "indirect")]
        return sorted(saveable, key=lambda f: (f.ordinal, f.idx))

    def output_keys(self) -> list[str]:
        seen: list[str] = []
        for f in self.output_fields():
            if f.name not in seen:
                seen.append(f.name)
        return seen

    def key_dtype(self, key: str) -> str | None:
        for f in self.fields:
            if f.name == key and f.dtype:
                return f.dtype
        return None

    # single-pass capture separator: one regexp_replace rewrites the (anchored,
    # whole-string) match into "\x02$1<SEP>$2<SEP>..." so ALL capture groups AND
    # the match/no-match signal come out of ONE regex evaluation per row (vs
    # rlike + one regexp_extract per key = k+1 evaluations). \x01/\x02 never
    # occur in log text; a captured value containing \x01 would misalign the
    # split (the reference reads raw text lines, where control chars are absent).
    SEP = "\x01"
    MARK = "\x02"

    def marked_column(self, src: Column) -> Column:
        """One regex evaluation → "\\x02" + captures joined by SEP when the
        pattern matches; the input unchanged when it doesn't. Because every
        match is rewritten to start with MARK, ``marked != src`` is exact:
        an unmatched line passes through identical, and a matched line's
        rewrite always differs from itself (it would have to both start
        with MARK and equal its own capture-join to collide)."""
        assert self._regex is not None
        ngroups = max((f.group for f in self.fields if f.group), default=0)
        rep = self.MARK + self.SEP.join(f"${g}" for g in range(1, ngroups + 1))
        # dissect allows (ignores) trailing text after the last delimiter;
        # the replacement form must swallow it so only captures remain.
        pattern = self._regex if self._regex.endswith("$") else self._regex + ".*"
        return F.regexp_replace(src, pattern, rep)

    def parts_column(self, marked: Column) -> Column:
        """Captured group values from ``marked_column`` output (group g =
        element_at(parts, g)); no further regex work. The MARK prefix is
        still on element 1 — ``extract_columns`` strips it there, so only
        the first field is copied, never the whole line."""
        return F.split(marked, self.SEP, -1)

    def extract_columns(self, parts: Column,
                        trim=None) -> dict[str, Column]:
        """Static path: one Column per output key (string-typed; caller
        casts), built from the shared ``parts_column`` array — no further
        regex work per key. ``trim`` (Column → Column) applies to each
        CAPTURED part before append-joins, matching the reference's
        per-capture trim (dissect.go:71-73)."""
        by_key: dict[str, list[_Field]] = {}
        for f in self.output_fields():
            by_key.setdefault(f.name, []).append(f)
        def grp(g: int) -> Column:
            v = F.element_at(parts, g)
            # group 1 carries the match MARK prefix (see parts_column)
            v = F.substring(v, 2, 2**30) if g == 1 else v
            return trim(v) if trim is not None else v

        out: dict[str, Column] = {}
        for key, fs in by_key.items():
            col = grp(fs[0].group)
            for f in fs[1:]:
                join = f.delim_before if f.delim_before else DEFAULT_JOIN
                col = F.concat(col, F.lit(join), grp(f.group))
            out[key] = col
        return out

    # ---------- python reference implementation (UDF + oracle) ----------

    def parse(self, s: str, trim=None) -> dict[str, str] | None:
        """Positional parse of one string; None on failure. ``trim``
        (str → str) applies to each captured part before appends."""
        if s is None:
            return None
        pos = 0
        lead = self.fields[0].delim_before
        if lead:
            if not s.startswith(lead):
                return None
            pos = len(lead)
        captured: list[str] = []
        for i, f in enumerate(self.fields):
            if f.length is not None:
                if pos + f.length > len(s):
                    return None
                val = s[pos : pos + f.length]
                pos += f.length
                if f.delim_after:
                    if not s.startswith(f.delim_after, pos):
                        return None
                    pos += len(f.delim_after)
                    if f.greedy:
                        while s.startswith(f.delim_after, pos):
                            pos += len(f.delim_after)
                elif i == len(self.fields) - 1 and pos != len(s):
                    return None  # remaining data after trailing fixed-length key
            elif f.delim_after:
                nxt = s.find(f.delim_after, pos)
                if nxt < 0:
                    return None
                val = s[pos:nxt]
                pos = nxt + len(f.delim_after)
                if f.greedy:
                    while s.startswith(f.delim_after, pos):
                        pos += len(f.delim_after)
            else:
                val = s[pos:]
                pos = len(s)
            captured.append(trim(val) if trim is not None else val)

        # apply phase (ordinal-sorted, stable), mirrors resolve():
        m: dict[str, str] = {}
        refs: list[str] = []
        order = sorted(range(len(self.fields)), key=lambda i: (self.fields[i].ordinal, i))
        for i in order:
            f, val = self.fields[i], captured[i]
            if f.kind == "skip":
                continue
            if f.kind in ("named_skip", "pointer"):
                m[f.name] = val
                refs.append(f.name)
            elif f.kind == "append":
                if f.name in m:
                    join = f.delim_before if f.delim_before else DEFAULT_JOIN
                    m[f.name] = m[f.name] + join + val
                else:
                    m[f.name] = val
            elif f.kind == "indirect":
                ref = m.get(f.name)
                if ref is not None:
                    m[ref] = val
            else:  # normal
                m[f.name] = val
        for r in refs:
            m.pop(r, None)
        return m


def compile_tokenizer(tokenizer: str) -> DissectPattern:
    return DissectPattern(tokenizer)


TRIM_MODES = ("none", "left", "right", "all", "both")


def _trim_column_fn(trim_values: str, trim_chars: str):
    """Column→Column trimmer for the static path (one regexp_replace;
    anchored alternation handles mode=all in a single pass). Mirrors
    the reference's trimmer (trim.go:31-70, config.go:62-78)."""
    if trim_values in ("", "none"):
        return None
    cls = "[" + re.escape(trim_chars) + "]+"
    pats = {"left": f"^{cls}", "right": f"{cls}$",
            "all": f"^{cls}|{cls}$", "both": f"^{cls}|{cls}$"}
    pat = pats[trim_values]
    return lambda c: F.regexp_replace(c, pat, "")


def _trim_str_fn(trim_values: str, trim_chars: str):
    """str→str trimmer for the pandas-UDF path — same semantics."""
    if trim_values in ("", "none"):
        return None
    if trim_values == "left":
        return lambda s: s.lstrip(trim_chars)
    if trim_values == "right":
        return lambda s: s.rstrip(trim_chars)
    return lambda s: s.strip(trim_chars)


def _convert(col: Column, dtype: str) -> Column:
    """Typed conversion; right-trims spaces first like the reference."""
    t = SPARK_TYPES[dtype]
    trimmed = F.rtrim(col)
    if dtype == "ip":
        return F.when(
            trimmed.rlike(r"^(\d{1,3}\.){3}\d{1,3}$") | trimmed.contains(":"), trimmed
        )
    if dtype == "boolean":
        return F.when(F.lower(trimmed).isin("true", "1"), F.lit(True)).when(
            F.lower(trimmed).isin("false", "0"), F.lit(False)
        )
    return trimmed.cast(t)


def dissect(
    df: DataFrame,
    tokenizer: str,
    field: str = "message",
    target_prefix: str = "dissect",
    convert_types: bool = True,
    flags_col: str = "log_flags",
    trim_values: str = "none",
    trim_chars: str = " ",
    ignore_failure: bool = False,
    overwrite_keys: bool = True,
) -> DataFrame:
    """Apply a dissect tokenizer to ``df[field]``.

    Output keys land as a struct column named ``target_prefix`` (or as
    top-level columns when ``target_prefix == ""`` — the reference's
    keys-under-root). On parse failure the row is kept, outputs are
    null, and ``dissect_parsing_error`` is appended to ``flags_col``
    (suppressed by ``ignore_failure``, processor.go:101-105).

    ``trim_values`` (none|left|right|all, config.go:35-49 +
    trim.go) trims ``trim_chars`` from each CAPTURED part before
    append-joins and type conversion. ``overwrite_keys=False`` keeps an
    existing column instead of overwriting it (mapper,
    processor.go:119-137; keys-under-root mode only — with a
    ``target_prefix`` struct there is no collision).
    """
    if trim_values not in TRIM_MODES:
        raise ValueError(
            f"trim_values must be one of {TRIM_MODES}, got {trim_values!r}"
        )
    pat = compile_tokenizer(tokenizer)
    src = F.col(field)

    if pat.regex is not None:
        # ONE regex evaluation per row total, independent of key count;
        # marked/parts are materialized in temp columns so codegen computes
        # the replace and the split exactly once each.
        marked_col, parts_col = "_dissect_marked", "_dissect_parts"
        df = df.withColumn(marked_col, pat.marked_column(src))
        df = df.withColumn(parts_col, pat.parts_column(F.col(marked_col)))
        ok = src.isNotNull() & (F.col(marked_col) != src)
        raw_cols = pat.extract_columns(
            F.col(parts_col), trim=_trim_column_fn(trim_values, trim_chars)
        )
        out_cols: dict[str, Column] = {}
        for key, col in raw_cols.items():
            dtype = pat.key_dtype(key)
            if convert_types and dtype and dtype != "string":
                col = _convert(col, dtype)
            out_cols[key] = F.when(ok, col)
        if not overwrite_keys:
            out_cols = {k: c for k, c in out_cols.items() if k not in df.columns}
        if target_prefix:
            df = df.withColumn(
                target_prefix,
                F.when(ok, F.struct(*[c.alias(k) for k, c in out_cols.items()])),
            )
        else:
            df = df.withColumns(out_cols)
        drop_cols = [marked_col, parts_col]
    else:
        # indirect keys → data-dependent key names → map<string,string>
        # via an Arrow-batched pandas UDF (no per-row Spark UDF).
        parse = pat.parse
        trim_s = _trim_str_fn(trim_values, trim_chars)

        @pandas_udf(T.MapType(T.StringType(), T.StringType()))
        def dissect_map(s: pd.Series) -> pd.Series:
            return s.map(lambda v: parse(v, trim=trim_s))

        tgt = target_prefix or "dissect"
        df = df.withColumn(tgt, dissect_map(src))
        ok = F.col(tgt).isNotNull()
        drop_cols = []

    # failure flag (reference: processor.go:93-105 / log.flags)
    if not ignore_failure:
        if flags_col in df.columns:
            prev = F.col(flags_col)
        else:
            prev = F.lit(None).cast(T.ArrayType(T.StringType()))
        df = df.withColumn(
            flags_col,
            F.when(ok, prev).otherwise(
                F.array_union(F.coalesce(prev, F.array()),
                              F.array(F.lit(PARSE_ERROR_FLAG)))
            ),
        )
    return df.drop(*drop_cols) if drop_cols else df
