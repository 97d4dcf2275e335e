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


# -- trim_values / ignore_failure / overwrite_keys (processor_test.go:80-126,
#    trim.go, config.go:35-49) -------------------------------------------------

TRIM_CASES = [
    # (name, trim_values, trim_chars, message, expected)
    ("trimming trailing spaces", "right", " \t", "hello world\t super ",
     {"key": "world", "key2": "super"}),
    ("not trimming by default", "none", " ", "hello world\t super ",
     {"key": "world\t", "key2": "super "}),
    ("trim leading space", "left", " \t", "hello \tworld\t \tsuper ",
     {"key": "world\t", "key2": "super "}),
    ("trim all space", "all", " \t", "hello \tworld\t \tsuper ",
     {"key": "world", "key2": "super"}),
]


@pytest.mark.parametrize("name,mode,chars,msg,expected", TRIM_CASES,
                         ids=[c[0] for c in TRIM_CASES])
def test_trim_values_static_path(spark, name, mode, chars, msg, expected):
    df = spark.createDataFrame([(msg,)], "message string")
    out = dissect(df, "hello %{key} %{key2}", target_prefix="",
                  trim_values=mode, trim_chars=chars)
    row = out.collect()[0]
    assert {k: row[k] for k in expected} == expected


@pytest.mark.parametrize("name,mode,chars,msg,expected", TRIM_CASES,
                         ids=[c[0] for c in TRIM_CASES])
def test_trim_values_python_parse(name, mode, chars, msg, expected):
    from beats_spark.dissect import _trim_str_fn

    pat = compile_tokenizer("hello %{key} %{key2}")
    assert pat.parse(msg, trim=_trim_str_fn(mode, chars)) == expected


def test_trim_applies_before_append_join(spark):
    # reference trims CAPTURES, then appends join the trimmed parts
    df = spark.createDataFrame([("a :b ",)], "message string")
    out = dissect(df, "%{x}:%{+x}", target_prefix="", trim_values="all")
    assert out.collect()[0]["x"] == "a:b"


def test_invalid_trim_mode_raises(spark):
    df = spark.createDataFrame([("x",)], "message string")
    with pytest.raises(ValueError, match="trim_values"):
        dissect(df, "%{a}", trim_values="sideways")


def test_ignore_failure_suppresses_flag(spark):
    df = spark.createDataFrame([("nope",)], "message string")
    out = dissect(df, "a=%{a}", target_prefix="d", ignore_failure=True)
    assert "log_flags" not in out.columns
    assert out.count() == 1


def test_overwrite_keys_false_keeps_existing_column(spark):
    df = spark.createDataFrame([("hello world x", "orig")], "message string, key string")
    kept = dissect(df, "hello %{key} %{key2}", target_prefix="",
                   overwrite_keys=False).collect()[0]
    assert kept["key"] == "orig" and kept["key2"] == "x"
    clobbered = dissect(df, "hello %{key} %{key2}", target_prefix="",
                        overwrite_keys=True).collect()[0]
    assert clobbered["key"] == "world"


def test_dissect_processor_passes_knobs_through(spark):
    from beats_spark.processors.base import build_processor

    p = build_processor({"dissect": {"tokenizer": "hello %{key}", "target_prefix": "",
                                     "trim_values": "all", "trim_chars": " !"}})
    df = spark.createDataFrame([("hello  world!! ",)], "message string")
    assert p(df).collect()[0]["key"] == "world"
    with pytest.raises(TypeError):
        build_processor({"dissect": {"tokenizer": "%{a}", "no_such_knob": 1}})
