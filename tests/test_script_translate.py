"""JS script → native-processor translation.

Mirrors the reference's script-processor examples
(``libbeat/processors/script/javascript/beatevent_v0.go`` docstrings
and ``docs/processor-script.asciidoc``): straight-line event surgery
plus guards translates; anything needing real code refuses loudly.
"""

import pytest
from pyspark.sql import functions as F

from beats_spark.pipeline import build_pipeline
from beats_spark.processors.script_translate import (
    ScriptTranslationError,
    translate_script,
)


def test_translate_puts_and_copies():
    procs = translate_script("""
        // annotate every event
        function process(event) {
            event.Put("event.action", "process-created");
            event.Put("event.kind", "event");
            event.Put("destination.user", event.Get("winlog.user"));
        }
    """)
    assert procs == [
        {"add_fields": {"fields": {"event.action": "process-created",
                                   "event.kind": "event"},
                        "fields_under_root": True}},
        {"copy_fields": {"fields": [{"from": "winlog.user",
                                     "to": "destination.user"}]}},
    ]


def test_translate_rename_delete_tag_cancel_object():
    procs = translate_script("""
        function process(evt) {
            evt.Rename("src_ip", "source.ip");
            evt.Delete("agent.ephemeral_id");
            evt.Tag("translated");
            evt.AppendTo("tags", "beta");
            evt.Put("geo.location", {lon: -73.61, "lat": 45.5});
            evt.Cancel();
        }
    """)
    assert procs[0] == {"rename": {"fields": [{"from": "src_ip",
                                               "to": "source.ip"}],
                                   "ignore_missing": True}}
    assert procs[1] == {"drop_fields": {"fields": ["agent.ephemeral_id"]}}
    assert procs[2] == {"add_tags": {"tags": ["translated"]}}
    assert procs[3] == {"add_tags": {"tags": ["beta"]}}
    assert procs[4] == {"add_fields": {
        "fields": {"geo.location": {"lon": -73.61, "lat": 45.5}},
        "fields_under_root": True}}
    assert procs[5] == {"drop_event": {}}


def test_translate_if_else_conditions_and_alias():
    procs = translate_script("""
        function process(event) {
            var lvl = event.Get("level");
            if (lvl === "error" && !event.Get("suppress")) {
                event.Tag("alert");
            } else if (lvl == "debug" || event.Get("verbose")) {
                event.Cancel();
            } else {
                event.Put("severity", 3);
            }
        }
    """)
    assert procs == [{
        "if": {"and": [{"equals": {"level": "error"}},
                       {"not": {"has_fields": ["suppress"]}}]},
        "then": [{"add_tags": {"tags": ["alert"]}}],
        "else": [{
            "if": {"or": [{"equals": {"level": "debug"}},
                          {"has_fields": ["verbose"]}]},
            "then": [{"drop_event": {}}],
            "else": [{"add_fields": {"fields": {"severity": 3},
                                     "fields_under_root": True}}],
        }],
    }]


@pytest.mark.parametrize("src,msg", [
    ("function process(e) { for (;;) {} }", "statement"),
    ("function process(e) { e.Put('n', 1 + 2); }", "character"),
    ("function process(e) { e.Fetch('x'); }", "subset"),
    ("function process(e) { var x = e.Get('a'); var x = e.Get('b'); }",
     "single-assignment"),
    ("function process(e) { e.AppendTo('related.ip', '1.2.3.4'); }",
     "tags"),
    ("process = (e) => {};", "character|identifier"),
])
def test_untranslatable_scripts_refuse_loudly(src, msg):
    with pytest.raises(ScriptTranslationError, match=msg):
        translate_script(src)


def test_translated_script_runs_as_native_plan(spark):
    """End-to-end through build_pipeline: the translated script must
    mutate rows exactly as the JS would, with a plan free of any
    Python eval (pure column expressions)."""
    df = spark.createDataFrame(
        [("error", "a"), ("debug", "b"), ("info", "c")],
        "level string, payload string")
    procs = translate_script("""
        function process(event) {
            event.Put("fleet.name", "prod");
            event.Put("orig", event.Get("payload"));
            if (event.Get("level") === "debug") {
                event.Cancel();
            } else {
                event.Tag("kept");
            }
        }
    """)
    out = build_pipeline(procs)(df).orderBy("level")
    rows = out.collect()
    assert [r.level for r in rows] == ["error", "info"]
    assert all(r["fleet.name"] == "prod" and r.orig == r.payload
               and r.tags == ["kept"] for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python at all in the plan


def test_script_processor_lang_javascript(spark):
    """The reference's own config shape — script processor with a JS
    source string — builds and runs via auto-translation."""
    from beats_spark.processors.base import build_processor

    df = spark.createDataFrame([("x",)], "name string")
    p = build_processor({"script": {
        "lang": "javascript",
        "source": "function process(e) { e.Put('ok', true); }",
    }})
    assert p(df).first().ok is True
    with pytest.raises(ScriptTranslationError):
        build_processor({"script": {
            "lang": "javascript",
            "source": "function process(e) { while(1){} }",
        }})
