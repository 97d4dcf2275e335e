"""ES ingest-pipeline compiler (`beats_spark/ingest.py`).

Reference behavior: elasticsearch ingest node processors as installed by
filebeat modules (`filebeat/fileset/pipelines.go`; pipeline definitions
under `filebeat/module/*/*/ingest/pipeline.yml`). Semantics checked here:
per-document failure threading, on_failure recovery, ignore_failure /
ignore_missing, painless-lite `if` conditions, and the grok/dissect/
convert/set/rename/urldecode/kv/csv processor kernels.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.ingest import (
    IngestCompileError,
    compile_ingest_pipeline,
    painless_condition,
)


def _run(spark, cfg, rows, schema, **kw):
    df = spark.createDataFrame(rows, schema)
    out = compile_ingest_pipeline(cfg, **kw)(df)
    return {r["message"]: r.asDict() for r in out.collect()}, out


def test_grok_on_failure_recovers_document(spark):
    cfg = {
        "processors": [
            {"grok": {
                "field": "message",
                "patterns": ["%{WORD:verb} %{NUMBER:code:int}"],
                "on_failure": [
                    {"set": {"field": "event.outcome", "value": "fail"}}],
            }},
            {"set": {"field": "seen", "value": "yes"}},
        ],
    }
    got, out = _run(spark, cfg, [("GET 200",), ("nope!",)],
                    "message string")
    ok, bad = got["GET 200"], got["nope!"]
    assert ok["verb"] == "GET" and ok["code"] == 200
    assert ok["event.outcome"] is None
    # on_failure ran on the failing row only, and the doc then CONTINUED
    assert bad["event.outcome"] == "fail"
    assert bad["seen"] == "yes" and ok["seen"] == "yes"
    assert bad["error.message"] is None  # handled => recovered
    assert "_ingest_failed" not in out.columns


def test_nested_on_failure_position_zero_no_column_clash(spark):
    # regression: an on_failure sub-chain re-enters the apply step at
    # chain position 0; the scratch flag column must not be shadowed
    cfg = {
        "processors": [
            {"convert": {
                "field": "n", "type": "long",
                "on_failure": [
                    {"set": {"field": "bad", "value": "y"}},
                    {"set": {"field": "n", "value": "-1"}},
                ],
            }},
            {"set": {"field": "done", "value": "y"}},
        ],
    }
    df = spark.createDataFrame([("a", "7"), ("b", "oops")],
                               "message string, n string")
    out = {r["message"]: r.asDict()
           for r in compile_ingest_pipeline(cfg)(df).collect()}
    assert out["a"]["n"] == 7 and out["a"]["bad"] is None
    assert out["b"]["bad"] == "y" and out["b"]["done"] == "y"


def test_unhandled_failure_surfaces_error_message_and_skips_rest(spark):
    cfg = {
        "processors": [
            {"fail": {"message": "boom", "if": "ctx.message == 'x'"}},
            {"set": {"field": "after", "value": "ran"}},
        ],
    }
    got, _ = _run(spark, cfg, [("x",), ("y",)], "message string")
    assert got["x"]["error.message"] == "boom"
    assert got["x"]["after"] is None     # failed doc skips later processors
    assert got["y"]["after"] == "ran"


def test_keep_failed_false_drops_failed_docs(spark):
    cfg = {"processors": [
        {"fail": {"message": "boom", "if": "ctx.message == 'x'"}}]}
    df = spark.createDataFrame([("x",), ("y",)], "message string")
    out = compile_ingest_pipeline(cfg, keep_failed=False)(df)
    assert [r["message"] for r in out.collect()] == ["y"]
    assert "error.message" not in out.columns


def test_painless_lite_conditions(spark):
    df = spark.createDataFrame(
        [("GET", 200, "a b"), ("POST", None, "")],
        "m string, code int, s string")
    cases = {
        "ctx.m == 'GET'": [True, False],
        "ctx?.code != null && ctx.code >= 200": [True, False],
        "ctx.s.isEmpty()": [False, True],
        "ctx.s.contains('b') || ctx.m.startsWith('PO')": [True, True],
        "!(ctx.m.endsWith('T'))": [False, False],
        "ctx.m.length() > 3": [False, True],
    }
    for src, want in cases.items():
        got = [bool(r[0]) for r in df.select(
            F.coalesce(painless_condition(src, df), F.lit(False))).collect()]
        assert got == want, src
    # Painless regex operators: =~ find-anywhere, ==~ whole-string
    regex_cases = {
        "ctx.m =~ /E/": [True, False],
        "ctx.m ==~ /GET/": [True, False],
        "ctx.m ==~ /G/": [False, False],     # full anchor: no substring
        "ctx.m ==~ /^P0?OST$/": [False, True],
    }
    for src, want in regex_cases.items():
        got = [bool(r[0]) for r in df.select(
            F.coalesce(painless_condition(src, df), F.lit(False))).collect()]
        assert got == want, src
    with pytest.raises(IngestCompileError):
        painless_condition("ctx.m =~ 'notaregex'", df)  # needs /literal/


def test_module_shaped_pipeline_kv_csv_date_split(spark):
    cfg = {
        "processors": [
            {"kv": {"field": "message", "field_split": " ",
                    "value_split": "=", "target_field": "kv"}},
            {"csv": {"field": "row",
                     "target_fields": ["user.name", "source.ip"]}},
            {"date": {"field": "ts", "target_field": "@timestamp",
                      "formats": ["yyyy-MM-dd HH:mm:ss"]}},
            {"split": {"field": "tags_raw", "separator": ","}},
            {"append": {"field": "tags_raw", "value": ["extra"]}},
            {"remove": {"field": "row"}},
        ],
    }
    df = spark.createDataFrame(
        [("a=1 b=2", 'bob,"10.0.0.1"', "2026-01-02 03:04:05", "t1,t2")],
        "message string, row string, ts string, tags_raw string")
    r = compile_ingest_pipeline(cfg)(df).collect()[0].asDict()
    assert r["kv"] == {"a": "1", "b": "2"}
    assert r["user.name"] == "bob" and r["source.ip"] == "10.0.0.1"
    assert str(r["@timestamp"]).startswith("2026-01-02 03:04:05")
    assert r["tags_raw"] == ["t1", "t2", "extra"]
    assert r["row"] is None  # remove = null-out (documented: guarded drop)


def test_script_refuses_without_handler_and_runs_with_one(spark):
    cfg = {"processors": [
        {"script": {"source": "ctx.x = 1", "tag": "t1"}}]}
    df = spark.createDataFrame([("m",)], "message string")
    with pytest.raises(IngestCompileError, match="Painless"):
        compile_ingest_pipeline(cfg)(df)
    out = compile_ingest_pipeline(
        cfg, script_handlers={
            "t1": lambda df, act: df.withColumn(
                "x", F.when(act, F.lit(1)))})(df)
    assert out.collect()[0]["x"] == 1


def test_grok_is_search_not_anchored(spark):
    # ES ingest grok is joni matcher.search: a pattern matching a
    # SUBSTRING of the field matches the document (no implicit ^...$)
    cfg = {"processors": [
        {"grok": {"field": "message",
                  "patterns": ["%{WORD:verb} %{NUMBER:code:int}"]}}]}
    got, _ = _run(spark, cfg,
                  [("prefix GET 200 trailing junk",), ("no-match-here",)],
                  "message string")
    ok, bad = got["prefix GET 200 trailing junk"], got["no-match-here"]
    # leftmost occurrence of WORD-then-NUMBER is "GET 200" ("prefix" is
    # not followed by a number); trailing junk doesn't prevent the match
    assert ok["verb"] == "GET" and ok["code"] == 200
    assert ok["error.message"] is None
    assert bad["error.message"] is not None


def test_on_failure_subchain_failure_keeps_inner_diagnostic(spark):
    # a processor inside on_failure that itself fails unhandled must
    # leave the doc failed WITH its message, not error.message=null
    cfg = {"processors": [
        {"convert": {
            "field": "n", "type": "long",
            "on_failure": [{"fail": {"message": "inner boom"}}],
        }},
    ]}
    df = spark.createDataFrame([("a", "7"), ("b", "oops")],
                               "message string, n string")
    out = {r["message"]: r.asDict()
           for r in compile_ingest_pipeline(cfg)(df).collect()}
    assert out["a"]["n"] == 7 and out["a"]["error.message"] is None
    assert out["b"]["error.message"] == "inner boom"


def test_foreach_honors_if_condition(spark):
    cfg = {"processors": [
        {"foreach": {
            "field": "tags",
            "processor": {"uppercase": {"field": "_ingest._value"}},
            "if": "ctx.m == 'a'",
        }},
    ]}
    df = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x", "y"])],
        "m string, tags array<string>")
    out = {r["m"]: r.asDict()
           for r in compile_ingest_pipeline(cfg)(df).collect()}
    assert out["a"]["tags"] == ["X", "Y"]
    assert out["b"]["tags"] == ["x", "y"]  # if=false: untouched


def test_foreach_ignore_failure_and_on_failure(spark):
    # missing field + ignore_failure → doc continues untouched
    cfg = {"processors": [
        {"foreach": {
            "field": "nope",
            "processor": {"trim": {"field": "_ingest._value"}},
            "ignore_failure": True,
        }},
        {"set": {"field": "after", "value": "ran"}},
    ]}
    got, _ = _run(spark, cfg, [("m",)], "message string")
    assert got["m"]["after"] == "ran"
    assert got["m"]["error.message"] is None


def test_mustache_missing_field_renders_empty_string(spark):
    # ES mustache: '{{missing}}' → '' (never nulls the whole template)
    cfg = {"processors": [
        {"set": {"field": "out", "value": "x-{{missing}}-{{m}}"}}]}
    got, _ = _run(spark, cfg, [("hi", "k")], "m string, message string")
    assert got["k"]["out"] == "x--hi"


def test_rename_fails_when_target_exists(spark):
    cfg = {"processors": [
        {"rename": {"field": "a", "target_field": "b"}}]}
    df = spark.createDataFrame(
        [("r1", "v1", None), ("r2", "v2", "occupied")],
        "message string, a string, b string")
    out = {r["message"]: r.asDict()
           for r in compile_ingest_pipeline(cfg)(df).collect()}
    assert out["r1"]["b"] == "v1" and out["r1"]["a"] is None
    assert out["r2"]["b"] == "occupied" and out["r2"]["a"] == "v2"
    assert "already exists" in out["r2"]["error.message"]


def test_single_projection_plan_stays_narrow(spark):
    # the whole compiled chain must be projections over one scan:
    # no shuffle, no UDF, nothing outside whole-stage codegen
    cfg = {"processors": [
        {"grok": {"field": "message", "patterns": ["%{WORD:w}"],
                  "ignore_failure": True}},
        {"set": {"field": "t", "value": "v"}},
        {"lowercase": {"field": "w", "ignore_failure": True}},
        {"rename": {"field": "w", "target_field": "word",
                    "ignore_missing": True}},
    ]}
    df = spark.range(4).select(F.lit("Hello x").alias("message"))
    plan = compile_ingest_pipeline(cfg)(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
