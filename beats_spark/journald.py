"""journald input: parse systemd journal entries from their JSON export
form (``journalctl -o json``: one JSON object per line, all values
strings) into the event schema.

The reference input (``filebeat/input/journald/input.go`` +
``journalbeat/pkg/journalfield/default.go:25-90``) reads the binary
journal through sdjournal and converts fields via a fixed table; no
systemd journal exists in-sandbox, so this implements the SAME
conversion table over the journal's documented portable serialization
(the export/JSON format every journald ships) — a production deployment
tails ``journalctl -o json --follow`` into any line transport (file,
socket, kafka) and this parser takes it from there.

Field mapping (dots flattened to ``_`` per repo convention):
``MESSAGE``→message, ``PRIORITY``→syslog_priority (int),
``SYSLOG_FACILITY``→syslog_facility (int), ``SYSLOG_IDENTIFIER``,
``SYSLOG_PID``→syslog_pid (int), ``_HOSTNAME``→host_hostname,
``_MACHINE_ID``→host_id, ``_BOOT_ID``→journald_host_boot_id,
``_SYSTEMD_UNIT``→systemd_unit, ``_SYSTEMD_CGROUP``→systemd_cgroup,
``_SYSTEMD_SLICE``→systemd_slice, ``_TRANSPORT``→systemd_transport,
``_PID``→journald_pid (int), ``_UID``/``_GID``→journald_uid/gid (int),
``_COMM``→journald_process_name, ``_EXE``→journald_process_executable,
``_CMDLINE``→journald_process_command_line,
``CONTAINER_ID``→container_id_truncated, ``CONTAINER_ID_FULL``→
container_id, ``CONTAINER_NAME``→container_name
(conversion table: journalfield/default.go:25-90). ``__CURSOR`` is
kept as ``cursor`` lineage and ``__REALTIME_TIMESTAMP`` (decimal
microseconds) becomes the event ``ts`` — the reference stores both in
its registry the same way.

Everything is one ``from_json`` + column casts: JVM-side, codegen,
no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: journal key → (output column, cast) — journalfield/default.go:25-90
FIELD_TABLE: dict[str, tuple[str, str | None]] = {
    "MESSAGE": ("message", None),
    "PRIORITY": ("syslog_priority", "int"),
    "SYSLOG_FACILITY": ("syslog_facility", "int"),
    "SYSLOG_IDENTIFIER": ("syslog_identifier", None),
    "SYSLOG_PID": ("syslog_pid", "int"),
    "_HOSTNAME": ("host_hostname", None),
    "_MACHINE_ID": ("host_id", None),
    "_BOOT_ID": ("journald_host_boot_id", None),
    "_SYSTEMD_UNIT": ("systemd_unit", None),
    "_SYSTEMD_USER_UNIT": ("systemd_user_unit", None),
    "_SYSTEMD_CGROUP": ("systemd_cgroup", None),
    "_SYSTEMD_SLICE": ("systemd_slice", None),
    "_TRANSPORT": ("systemd_transport", None),
    "_PID": ("journald_pid", "int"),
    "_UID": ("journald_uid", "int"),
    "_GID": ("journald_gid", "int"),
    "_COMM": ("journald_process_name", None),
    "_EXE": ("journald_process_executable", None),
    "_CMDLINE": ("journald_process_command_line", None),
    "CONTAINER_ID": ("container_id_truncated", None),
    "CONTAINER_ID_FULL": ("container_id", None),
    "CONTAINER_NAME": ("container_name", None),
}

_JSON_SCHEMA = ", ".join(
    f"`{k}` string" for k in ["__CURSOR", "__REALTIME_TIMESTAMP", *FIELD_TABLE]
)


def journald_reader(
    df: DataFrame, line_col: str = "message", keep_raw: bool = False
) -> DataFrame:
    """Parse ``journalctl -o json`` lines in ``line_col`` into typed
    event columns (see module docstring for the field table). Rows that
    fail to parse keep nulls in every journal column (the reference
    drops unreadable entries with a logged error; keeping the raw line
    under ``raw_journal`` via ``keep_raw=True`` preserves them for a
    dead-letter route instead)."""
    j = F.from_json(F.col(line_col), _JSON_SCHEMA)
    out = {}
    for key, (name, cast) in FIELD_TABLE.items():
        c = j[key]
        out[name] = c.cast(cast) if cast else c
    out["cursor"] = j["__CURSOR"]
    out["ts"] = F.timestamp_micros(j["__REALTIME_TIMESTAMP"].cast("long"))
    if keep_raw:
        out["raw_journal"] = F.col(line_col)
    return df.withColumns(out)


def journald_matches(df: DataFrame, matches: list[str]) -> DataFrame:
    """``include_matches`` filtering (``filebeat/input/journald/
    config.go:48-49`` → sd_journal_add_match): each entry is
    ``JOURNAL_FIELD=value``; matches on the SAME field are ORed,
    matches on different fields ANDed — sd-journal's documented match
    logic, reproduced as one boolean column expression over the parsed
    frame."""
    by_field: dict[str, list[str]] = {}
    for m in matches:
        field, sep, value = m.partition("=")
        if not sep:
            raise ValueError(f"invalid match format: {m}")
        by_field.setdefault(field, []).append(value)
    cond: Column | None = None
    for field, values in by_field.items():
        if field not in FIELD_TABLE:
            raise ValueError(f"unknown journal field {field!r}")
        name, cast = FIELD_TABLE[field]
        col = F.col(name)
        clause = col.isin([int(v) if cast == "int" else v for v in values])
        cond = clause if cond is None else (cond & clause)
    return df if cond is None else df.filter(cond)
