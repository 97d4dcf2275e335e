"""journald JSON-export parsing (beats_spark.journald).

Fixture lines follow `journalctl -o json` serialization: one object per
line, every value a string (reference conversion table:
journalbeat/pkg/journalfield/default.go:25-90).
"""

from __future__ import annotations

import json

import pytest

from beats_spark.journald import journald_matches, journald_reader
from tests.conftest import rows


def _lines(spark):
    mk = lambda **kw: json.dumps(kw)
    data = [
        mk(__CURSOR="c1", __REALTIME_TIMESTAMP="1704067200000000",
           MESSAGE="Started ssh.", PRIORITY="6", SYSLOG_FACILITY="3",
           SYSLOG_IDENTIFIER="systemd", _HOSTNAME="web-1",
           _SYSTEMD_UNIT="ssh.service", _PID="1", _COMM="systemd",
           _TRANSPORT="journal"),
        mk(__CURSOR="c2", __REALTIME_TIMESTAMP="1704067201500000",
           MESSAGE="oom killed", PRIORITY="3", _HOSTNAME="web-1",
           _SYSTEMD_UNIT="app.service", _PID="4242", _COMM="app",
           CONTAINER_ID="abc123def456", CONTAINER_ID_FULL="abc123def456" + "0" * 52,
           CONTAINER_NAME="app-1"),
        "not json at all",
    ]
    return spark.createDataFrame([(l,) for l in data], "message string")


def test_journald_reader_field_table(spark):
    out = {r["cursor"]: r for r in journald_reader(_lines(spark)).collect()}
    r1 = out["c1"]
    assert r1["message"] == "Started ssh."
    assert r1["syslog_priority"] == 6 and r1["syslog_facility"] == 3
    assert r1["systemd_unit"] == "ssh.service"
    assert r1["journald_pid"] == 1
    assert r1["systemd_transport"] == "journal"
    assert r1["ts"].isoformat() == "2024-01-01T00:00:00"
    r2 = out["c2"]
    assert r2["container_name"] == "app-1"
    assert r2["ts"].isoformat() == "2024-01-01T00:00:01.500000"
    # unparseable line → nulls everywhere (cursor None bucket)
    bad = out[None]
    assert bad["syslog_priority"] is None and bad["systemd_unit"] is None


def test_journald_matches_or_within_field_and_across(spark):
    parsed = journald_reader(_lines(spark))
    # same field twice → OR: both units pass
    both = journald_matches(
        parsed, ["_SYSTEMD_UNIT=ssh.service", "_SYSTEMD_UNIT=app.service"]
    )
    assert both.count() == 2
    # different fields → AND: unit AND priority
    one = journald_matches(
        parsed, ["_SYSTEMD_UNIT=app.service", "PRIORITY=3"]
    )
    assert [r["cursor"] for r in one.collect()] == ["c2"]
    none = journald_matches(
        parsed, ["_SYSTEMD_UNIT=ssh.service", "PRIORITY=3"]
    )
    assert none.count() == 0
    with pytest.raises(ValueError, match="invalid match"):
        journald_matches(parsed, ["nope"])
    with pytest.raises(ValueError, match="unknown journal field"):
        journald_matches(parsed, ["BOGUS=1"])
