"""String → structured parsers (reference: ``libbeat/processors/{dissect,
decode_csv_fields,decode_xml,extract_array}``, ``actions/decode_json_fields``).
"""

from __future__ import annotations

import csv as _csv
import io as _io
import xml.etree.ElementTree as _ET
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from beats_spark.dissect import dissect as _dissect_df
from beats_spark.processors.base import DFProc, Project, register


@register("dissect")
class Dissect(DFProc):
    """The dissect processor (see :mod:`beats_spark.dissect`).
    Ref: libbeat/processors/dissect/processor.go:63-142, config.go:35-49."""

    def __init__(self, tokenizer: str, field: str = "message",
                 target_prefix: str = "dissect", ignore_failure: bool = False,
                 overwrite_keys: bool = True, trim_values: str = "none"):
        self.kwargs = dict(tokenizer=tokenizer, field=field, target_prefix=target_prefix)

    def transform(self, df: DataFrame) -> DataFrame:
        return _dissect_df(df, **self.kwargs)


@register("decode_json_fields")
class DecodeJsonFields(Project):
    """Parse JSON strings inside fields. With a declared ``schema`` the
    result is a typed struct; without one it is ``map<string,string>``
    (flat documents). Ref: actions/decode_json_fields.go:103."""

    def __init__(self, fields: list[str], target: str | None = None,
                 schema: str | T.StructType | None = None,
                 overwrite_keys: bool = False, max_depth: int = 1,
                 add_error_key: bool = False, document_id: str | None = None):
        self.fields = fields
        self.target = target
        self.schema = schema or T.MapType(T.StringType(), T.StringType())
        self.add_error_key = add_error_key
        self.document_id = document_id

    def assigns(self, df: DataFrame) -> dict[str, Column]:
        out: dict[str, Column] = {}
        for f in self.fields:
            tgt = self.target if self.target is not None else f
            valid = F.try_parse_json(F.col(f)).isNotNull()
            parsed = F.when(valid, F.from_json(F.col(f), self.schema))
            out[tgt] = parsed
            if self.add_error_key:
                out["error_message"] = F.when(
                    F.col(f).isNotNull() & ~valid, F.lit("Error decoding JSON")
                )
            if self.document_id:
                out["meta_id"] = parsed.getItem(self.document_id)
        return out


@register("decode_csv_fields")
class DecodeCsvFields(Project):
    """RFC-4180 CSV line → array<string>. Plain separators compile to a
    JVM split; quoted-field support uses an Arrow-batched csv.reader.
    Ref: decode_csv_fields/decode_csv_fields.go:102."""

    def __init__(self, fields: dict[str, str], separator: str = ",",
                 ignore_missing: bool = False, overwrite_keys: bool = False,
                 fail_on_error: bool = True, quoted: bool = True):
        self.fields = fields
        self.separator = separator
        self.quoted = quoted

    def assigns(self, df: DataFrame) -> dict[str, Column]:
        out: dict[str, Column] = {}
        sep = self.separator
        if not self.quoted:
            import re as _re

            for src, dst in self.fields.items():
                out[dst] = F.split(F.col(src), _re.escape(sep))
            return out

        @pandas_udf(T.ArrayType(T.StringType()))
        def parse_csv(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                try:
                    return next(iter(_csv.reader(_io.StringIO(v), delimiter=sep)), [])
                except _csv.Error:
                    return None

            return s.map(one)

        for src, dst in self.fields.items():
            out[dst] = parse_csv(F.col(src))
        return out


@register("decode_xml")
class DecodeXml(Project):
    """XML → flat map<string,string> of leaf paths (dotted), optionally
    lower-cased keys — Arrow-batched (stdlib ElementTree).
    Ref: decode_xml/decode_xml.go:89."""

    def __init__(self, field: str = "message", target_field: str | None = None,
                 to_lower: bool = True, ignore_missing: bool = False,
                 ignore_failure: bool = False):
        self.field = field
        self.target = target_field or self.field
        self.to_lower = to_lower

    def assigns(self, df: DataFrame) -> dict[str, Column]:
        to_lower = self.to_lower

        @pandas_udf(T.MapType(T.StringType(), T.StringType()))
        def parse_xml(s: pd.Series) -> pd.Series:
            def walk(el, prefix, out):
                tag = el.tag.lower() if to_lower else el.tag
                path = f"{prefix}.{tag}" if prefix else tag
                kids = list(el)
                for k, v in el.attrib.items():
                    out[f"{path}.{k.lower() if to_lower else k}"] = v
                if kids:
                    for kid in kids:
                        walk(kid, path, out)
                elif el.text is not None and el.text.strip():
                    out[path] = el.text.strip()

            def one(v):
                if v is None:
                    return None
                try:
                    root = _ET.fromstring(v)
                except _ET.ParseError:
                    return None
                out: dict[str, str] = {}
                walk(root, "", out)
                return out

            return s.map(one)

        return {self.target: parse_xml(F.col(self.field))}


@register("extract_array")
class ExtractArray(Project):
    """Map array elements to named fields (ref: extract_array/extract_array.go:115)."""

    def __init__(self, field: str, mappings: dict[str, int],
                 fail_on_error: bool = True, omit_empty: bool = False):
        self.field = field
        self.mappings = mappings
        self.omit_empty = omit_empty

    def assigns(self, df: DataFrame) -> dict[str, Column]:
        out = {}
        for name, idx in self.mappings.items():
            col = F.col(self.field).getItem(idx)
            if self.omit_empty:
                col = F.when(col != "", col)
            out[name] = col
        return out


@register("script")
class Script(DFProc):
    """The UDF escape hatch. The reference embeds JavaScript
    (script/processor.go:38-52); our engine takes a Python callable —
    either a ``DataFrame -> DataFrame`` transform (``lang="dataframe"``)
    or a pandas batch function ``pd.DataFrame -> pd.DataFrame`` applied
    via mapInPandas (``lang="pandas"``, Arrow-batched, never per-row)."""

    def __init__(self, source: Callable, lang: str = "dataframe",
                 schema: T.StructType | str | None = None):
        self.source = source
        self.lang = lang
        self.schema = schema

    def transform(self, df: DataFrame) -> DataFrame:
        if self.lang == "dataframe":
            return self.source(df)
        if self.lang == "pandas":
            fn = self.source
            schema = self.schema or df.schema

            def runner(batches):
                for pdf in batches:
                    yield fn(pdf)

            return df.mapInPandas(runner, schema=schema)
        raise ValueError(f"unknown script lang {self.lang!r}")
