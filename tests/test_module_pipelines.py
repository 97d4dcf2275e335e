"""Standard-module ingest pipelines vs the reference's own golden fixtures.

Reference: `filebeat/module/<mod>/<fileset>/ingest/pipeline.yml` run
through the compiler (`beats_spark/ingest.py`) with the hand-translated
script handlers (`beats_spark/module_scripts.py`), checked against the
module's shipped fixtures `filebeat/module/<mod>/<fileset>/test/
<name>.log` + `<name>.log-expected.json` — the exact corpus the
reference's own module tests pin (`filebeat/fileset/pipelines.go`,
`tests/system/test_modules.py`).

Field-subset comparison: pipeline-computed fields are compared 1:1;
excluded are (a) harness-added constants the pipeline never touches
(event.module/dataset, fileset.name, service.type, input.type,
log.offset, ecs.version, event.timezone), (b) environment-dependent
enrichments unavailable in-sandbox (source.geo.*, source.as.* — no
MaxMind DB; user_agent.name/os/device/version — ES bundles uap-core,
this repo ships a compact family table), and (c) time-of-run values
(@timestamp for yearless syslog timestamps — ES infers the current
year; event.ingested; event.created). @timestamp IS compared exactly
where the source format carries the full date (nginx HTTPDATE).

Also here: the compile-rate sweep over ALL 63 shipped module pipelines
— pins how many compile today and that every refusal is a loud,
documented one (script-needs-handler), never a silent drop.
"""
from __future__ import annotations

import glob
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from beats_spark.ingest import IngestCompileError, compile_ingest_pipeline
from beats_spark.module_scripts import load_module_pipeline

REF = "/root/reference/filebeat/module"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present")

# fields never compared (see module docstring)
_EXCLUDE = re.compile(
    r"^(@timestamp|event\.(ingested|created|timezone|module|dataset"
    r"|original)|fileset\.name|service\.type|input\.type|log\.(offset"
    r"|file\..*|flags)|ecs\.version|agent\..*|host\.os\..*"
    r"|source\.(geo|as)\..*|destination\.(geo|as)\..*"
    r"|user_agent\.(name|version|os\..*|device\..*)|tags|error\..*"
    r"|related\.hosts)$"
)


def _merge_multiline(lines: list[str], pattern: str = r"^\s") -> list[str]:
    """The module input.yml multiline rule (match: after, negate:
    false): a line matching `pattern` continues the previous event."""
    out: list[str] = []
    rx = re.compile(pattern)
    for ln in lines:
        if out and rx.match(ln):
            out[-1] += "\n" + ln
        else:
            out.append(ln)
    return out


def _run_fixture(spark, module, fileset, log_name, multiline=None):
    log = f"{REF}/{module}/{fileset}/test/{log_name}"
    expected = json.load(open(log + "-expected.json"))
    lines = open(log, errors="replace").read().splitlines()
    lines = [ln for ln in lines if ln != ""]  # the log input skips empties
    if multiline:
        lines = _merge_multiline(lines, multiline)
    # the reference's module test caps each fixture at 100 events
    lines = lines[: len(expected)]
    assert len(lines) == len(expected), "fixture/expected row mismatch"
    tz = next((e.get("event.timezone") for e in expected
               if "event.timezone" in e), None)
    df = spark.createDataFrame(
        [(i, ln, tz, "2030-01-01T00:00:00.000Z") for i, ln in
         enumerate(lines)],
        "row_id long, message string, `event.timezone` string, "
        "`@timestamp` string",
    )
    pipe = load_module_pipeline(module, fileset)
    out = pipe(df)
    got = {r["row_id"]: r.asDict() for r in out.collect()}
    return got, expected


def _check(got, expected, compare_timestamp=False):
    mismatches = []
    for i, exp in enumerate(expected):
        row = got[i]
        for key, want in exp.items():
            if _EXCLUDE.match(key):
                continue
            if key == "@timestamp" and not compare_timestamp:
                continue
            have = row.get(key)
            if key == "@timestamp":
                have = (have.strftime("%Y-%m-%dT%H:%M:%S.") +
                        f"{have.microsecond // 1000:03d}Z") if have else None
            if isinstance(want, float) and have is not None:
                if abs(float(have) - want) < 1e-9:
                    continue
            if have != want:
                mismatches.append((i, key, want, have))
    assert not mismatches, mismatches[:15]


# ---------------------------------------------------------------------------
# nginx access
# ---------------------------------------------------------------------------

def test_nginx_access_golden(spark):
    got, expected = _run_fixture(spark, "nginx", "access", "test.log")
    _check(got, expected, compare_timestamp=True)


def test_nginx_access_golden_access_log(spark):
    got, expected = _run_fixture(spark, "nginx", "access", "access.log")
    _check(got, expected, compare_timestamp=True)


# ---------------------------------------------------------------------------
# system syslog / auth
# ---------------------------------------------------------------------------

def test_system_syslog_golden_darwin(spark):
    got, expected = _run_fixture(
        spark, "system", "syslog", "darwin-syslog.log", multiline=r"^\s")
    _check(got, expected)


def test_system_syslog_golden_suse(spark):
    got, expected = _run_fixture(
        spark, "system", "syslog", "suse-syslog.log", multiline=r"^\s")
    _check(got, expected)


def test_system_auth_golden_test_log(spark):
    got, expected = _run_fixture(spark, "system", "auth", "test.log")
    _check(got, expected)


def test_system_auth_golden_secure_rhel7(spark):
    got, expected = _run_fixture(spark, "system", "auth", "secure-rhel7.log")
    _check(got, expected)


# ---------------------------------------------------------------------------
# compile-rate sweep over every shipped module pipeline
# ---------------------------------------------------------------------------

def test_module_pipeline_compile_sweep(spark):
    paths = sorted(
        glob.glob(f"{REF}/*/*/ingest/*.yml")
        + glob.glob(f"{REF}/*/*/ingest/*.json"))
    assert len(paths) == 63
    df = spark.createDataFrame(
        [("line", None)], "message string, `event.timezone` string")
    compiled, refused = [], []
    for p in paths:
        name = "/".join(p.split("/")[-4:])
        try:
            compile_ingest_pipeline(p)(df).schema
            compiled.append(name)
        except IngestCompileError as e:
            refused.append((name, str(e).split("\n")[0]))
    # every non-compiling pipeline must be a LOUD script refusal —
    # any other failure class is a compiler bug
    bad = [(n, m) for n, m in refused if "Painless" not in m]
    assert not bad, bad
    # pin the rate: 34 of 63 compile handler-free today; the other 29
    # all carry script processors (refuse-loudly policy)
    assert len(compiled) == 34, (len(compiled), refused)


def test_module_pipeline_compile_sweep_with_handlers(spark):
    # the handler registry lifts the script-bearing flagship modules
    df = spark.createDataFrame(
        [("line", None)], "message string, `event.timezone` string")
    for module, fileset in [("nginx", "access"), ("system", "auth"),
                            ("apache", "access"), ("traefik", "access")]:
        load_module_pipeline(module, fileset)(df).schema
