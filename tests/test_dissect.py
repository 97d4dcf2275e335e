"""Dissect golden corpus + Spark execution-path tests.

The corpus covers the same feature matrix as the reference's
``libbeat/processors/dissect/testdata/dissect_tests.json`` (delimiters,
greedy padding, append/ordered-append, named-skip/pointer/indirect,
fixed length, typed keys, failure modes) with our own cases.
"""

from __future__ import annotations

import pytest

from beats_spark.dissect import PARSE_ERROR_FLAG, compile_tokenizer, dissect

# (name, tokenizer, message, expected-or-None)
CORPUS = [
    ("single key", "%{key}", "payload", {"key": "payload"}),
    ("two keys", "%{a} %{b}", "x y", {"a": "x", "b": "y"}),
    ("kv line", "lvl=%{level} msg=\"%{msg}\"", 'lvl=warn msg="disk low"',
     {"level": "warn", "msg": "disk low"}),
    ("leading literal", "/srv/%{app}.log", "/srv/api.log", {"app": "api"}),
    ("leading literal mismatch", "/srv/%{app}.log", "nope", None),
    ("delimiter not found", "/srv/%{app}.log", "/srv/api", None),
    ("trailing delim ignores rest", "id=%{id};", "id=42;extra", {"id": "42"}),
    ("greedy right padding", "%{a} %{b->} %{c}", "one two      three",
     {"a": "one", "b": "two", "c": "three"}),
    ("greedy on first key", "%{a->} %{b}", "one      two", {"a": "one", "b": "two"}),
    ("greedy trailing delim", "%{a} %{b->} ", "one two    ", {"a": "one", "b": "two"}),
    ("append with delim join", "%{x}:%{+x}:%{+x}", "a:b:c", {"x": "a:b:c"}),
    ("append ordered", "%{+x/3} %{+x/1} %{+x/2}", "c a b", {"x": "a b c"}),
    ("named skip with indirect", "%{?k} -> %{&k}", "colour -> red", {"colour": "red"}),
    ("pointer with indirect", "%{*k}=%{&k}", "region=eu", {"region": "eu"}),
    ("anonymous skip", "%{}|%{keep}", "junk|gold", {"keep": "gold"}),
    ("named skip dropped", "%{?junk} %{keep}", "trash gold", {"keep": "gold"}),
    ("fixed length", "%{y#4}%{m#2}%{d#2}", "20260816", {"y": "2026", "m": "08", "d": "16"}),
    ("fixed length too short", "%{y#4}%{m#2}%{d#2}", "202608", None),
    ("fixed length remaining data", "%{y#4}%{m#2}", "2026089", None),
    ("fixed length pointer indirect", "%{*k#3}%{&k#3}", "keyval", {"key": "val"}),
    ("multichar delimiter", "%{a} :: %{b}", "left :: right", {"a": "left", "b": "right"}),
    ("empty capture allowed", "%{a},%{b},%{c}", "x,,z", {"a": "x", "b": "", "c": "z"}),
    ("newline inside capture", "head %{body}", "head line1\nline2", {"body": "line1\nline2"}),
    ("typed keys parse as strings", "%{n|long} %{f|float} %{s}", "42 3.5 ok",
     {"n": "42", "f": "3.5", "s": "ok"}),
]


@pytest.mark.parametrize("name,tok,msg,expected", CORPUS, ids=[c[0] for c in CORPUS])
def test_python_reference_parse(name, tok, msg, expected):
    pat = compile_tokenizer(tok)
    assert pat.parse(msg) == expected


@pytest.mark.parametrize(
    "name,tok,msg,expected",
    [c for c in CORPUS if not any(ch in c[1] for ch in "&*|")],
    ids=[c[0] for c in CORPUS if not any(ch in c[1] for ch in "&*|")],
)
def test_static_regex_path_matches_reference_impl(spark, name, tok, msg, expected):
    df = spark.createDataFrame([(msg,)], "message string")
    out = dissect(df, tok, target_prefix="d").select("d.*", "log_flags").collect()[0]
    if expected is None:
        assert out["log_flags"] == [PARSE_ERROR_FLAG]
    else:
        got = {k: out[k] for k in expected}
        assert got == expected
        assert out["log_flags"] is None


def test_indirect_keys_use_map_path(spark):
    df = spark.createDataFrame([("region=eu",), ("bad",)], "message string")
    out = dissect(df, "%{*k}=%{&k}", target_prefix="d")
    got = {r["message"]: (r["d"], r["log_flags"]) for r in out.collect()}
    assert got["region=eu"] == ({"region": "eu"}, None)
    assert got["bad"] == (None, [PARSE_ERROR_FLAG])


def test_typed_conversion(spark):
    df = spark.createDataFrame([("42 3.5 true 10.1.2.3 bogus",)], "message string")
    out = dissect(df, "%{n|long} %{f|double} %{b|boolean} %{ip|ip} %{s}", target_prefix="d")
    row = out.select("d.*").collect()[0]
    assert row["n"] == 42 and abs(row["f"] - 3.5) < 1e-9 and row["b"] is True
    assert row["ip"] == "10.1.2.3" and row["s"] == "bogus"
    types = dict(out.select("d.*").dtypes)
    assert types["n"] == "bigint" and types["f"] == "double" and types["b"] == "boolean"


def test_failure_keeps_row_and_flags(spark):
    df = spark.createDataFrame([("a=1",), ("nope",)], "message string")
    out = dissect(df, "a=%{a}", target_prefix="d")
    assert out.count() == 2  # failed rows survive (processor.go:93-105 semantics)
    flags = {r["message"]: r["log_flags"] for r in out.collect()}
    assert flags["nope"] == [PARSE_ERROR_FLAG] and flags["a=1"] is None


def test_flagship_log_line(spark):
    line = 'level=info ts=2026-08-16T10:00:00Z caller=main.go:42 msg="Starting OK"'
    df = spark.createDataFrame([(line,)], "message string")
    out = dissect(
        df, 'level=%{level} ts=%{timestamp} caller=%{caller} msg="%{msg}"', target_prefix=""
    )
    row = out.collect()[0]
    assert (row["level"], row["timestamp"], row["caller"], row["msg"]) == (
        "info", "2026-08-16T10:00:00Z", "main.go:42", "Starting OK",
    )


def test_apache_common_log_format(spark):
    """Real-world format breadth: Apache/NCSA access-log lines (the
    reference's nasa-50k.log fixture shape), typed status/bytes."""
    tok = ('%{ip} %{ident} %{auth} [%{ts}] "%{verb} %{path} HTTP/%{ver}" '
           "%{code|integer} %{bytes|long}")
    lines = [
        '199.72.81.55 - - [01/Jul/1995:00:00:01 -0400] "GET /history/apollo/ HTTP/1.0" 200 6245',
        'unicomp6.unicomp.net - frank [01/Jul/1995:00:00:06 -0400] "POST /shuttle/countdown/ HTTP/1.0" 404 0',
    ]
    df = spark.createDataFrame([(l,) for l in lines], "message string")
    out = {r["ip"]: r for r in dissect(df, tok, target_prefix="").collect()}
    r = out["199.72.81.55"]
    assert (r["verb"], r["path"], r["code"], r["bytes"]) == ("GET", "/history/apollo/", 200, 6245)
    assert r["ts"] == "01/Jul/1995:00:00:01 -0400" and r["log_flags"] is None
    r2 = out["unicomp6.unicomp.net"]
    assert (r2["auth"], r2["verb"], r2["code"]) == ("frank", "POST", 404)
