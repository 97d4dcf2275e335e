"""End-to-end pipeline tests: routed-row-set equality vs a pure-python
reference interpreter, token-array invariant, checkpoint resume
(the test_registrar.py analogue), and metrics.
"""

from __future__ import annotations

import re

import pytest

from beats_spark.app import LogPipeline
from beats_spark.datagen import TOKENIZER, generate_events, host_dim

N_ROWS = 400

ROUTING = {
    "indices": [
        {"index": "errors-%{[source]}", "when": {"equals": {"level": "error"}}},
        {"index": "audit", "when": {"contains": {"msg": "login"}}},
        {"index": "%{[env]}", "mappings": {"prod": "hot-logs", "staging": "warm-logs"}},
    ],
    "default": "default-logs",
}

LINE_RE = re.compile(r'^level=(\S+) ts=(\S+) caller=(\S+) msg="(.*)"$')


def python_oracle(rows, dims):
    """Pure-python interpreter of the same pipeline config (SURVEY §7.7)."""
    out = {}
    for r in rows:
        m = LINE_RE.match(r["message"])
        level = m.group(1) if m else None
        msg = m.group(4) if m else None
        if level == "debug":
            continue  # drop_event
        env = dims.get(r["source"], (None, None))[1]
        if level == "error":
            sink = f"errors-{r['source']}"
        elif msg and "login" in msg:
            sink = "audit"
        elif env == "prod":
            sink = "hot-logs"
        elif env == "staging":
            sink = "warm-logs"
        else:
            sink = "default-logs"
        out.setdefault(sink, set()).add(r["doc_id"])
    return out


@pytest.fixture(scope="module")
def events(spark):
    return generate_events(spark, N_ROWS, partitions=4).cache()


@pytest.fixture(scope="module")
def dim(spark):
    return host_dim(spark)


@pytest.fixture(scope="module")
def pipeline(dim):
    return LogPipeline(
        processors=[
            {"dissect": {"tokenizer": TOKENIZER, "field": "message", "target_prefix": ""}},
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
            {"add_host_metadata": {"dim": dim, "prefix": ""}},
            {"add_tags": {"tags": ["beats_spark"]}},
        ],
        routing=ROUTING,
        window="1 hour",
    )


def test_routed_row_sets_match_python_oracle(events, dim, pipeline):
    routed = pipeline.routed(events)
    got = {}
    for r in routed.select("sink", "doc_id").collect():
        got.setdefault(r["sink"], set()).add(r["doc_id"])

    dims = {r["source"]: (r["host_name"], r["env"]) for r in dim.collect()}
    expected = python_oracle(events.collect(), dims)
    assert got == expected


def test_token_array_invariant(events, pipeline):
    """Every surviving row preserves exact token-array equality (north rule)."""
    routed = pipeline.routed(events)
    orig = {r["doc_id"]: r["tokens"] for r in events.select("doc_id", "tokens").collect()}
    for r in routed.select("doc_id", "tokens", "n_tok").collect():
        assert r["tokens"] == orig[r["doc_id"]]
        assert len(r["tokens"]) == r["n_tok"]


def test_parse_failures_survive_with_flag(events, pipeline):
    routed = pipeline.routed(events)
    garbage = routed.filter("message like 'GARBAGE%'")
    n_garbage = garbage.count()
    assert n_garbage > 0
    assert garbage.filter("array_contains(log_flags, 'dissect_parsing_error')").count() == n_garbage
    # unparsed rows have null level → never match error rule, still routed
    assert garbage.filter("sink is null").count() == 0


def test_aggregate_counts_equal_sink_counts(events, pipeline):
    routed = pipeline.routed(events).cache()
    agg = pipeline.aggregates(routed)
    per_sink_from_agg = {
        r["sink"]: r["total"]
        for r in agg.groupBy("sink").sum("events").withColumnRenamed("sum(events)", "total").collect()
    }
    per_sink = {r["sink"]: r["count"] for r in routed.groupBy("sink").count().collect()}
    assert per_sink_from_agg == per_sink
    routed.unpersist()


def test_run_batch_and_resume(spark, events, dim, tmp_path):
    """Kill-between-commits resume: no duplicates, no loss
    (filebeat/tests/system/test_registrar.py analogue)."""
    pipeline = LogPipeline(
        processors=[
            {"dissect": {"tokenizer": TOKENIZER, "field": "message", "target_prefix": ""}},
            {"drop_event": {"when": {"equals": {"level": "debug"}}}},
            {"add_host_metadata": {"dim": dim, "prefix": ""}},
        ],
        routing=ROUTING,
        checkpoint_path=str(tmp_path / "checkpoint"),
    )
    sink_dir = str(tmp_path / "sinks")

    # run 1: first half of the stream reaches the pipeline and commits
    first_half = events.filter("offset < 200")
    m1 = pipeline.run_batch(spark, first_half, sink_dir, run_id="r1")
    assert m1["events_total"] == 200

    # run 2: full stream re-offered (the re-started harvester re-reads the
    # file) — resume filter must skip everything already committed
    m2 = pipeline.run_batch(spark, events, sink_dir, run_id="r2")
    assert m2["events_total"] == 200  # only the second half

    back = spark.read.parquet(sink_dir)
    assert back.count() == back.select("doc_id").distinct().count()  # no dups
    survivors = pipeline.routed(events).count()
    assert back.count() == survivors  # no loss

    # checkpoint carries lineage metrics per (source, part_id)
    cp = spark.read.parquet(str(tmp_path / "checkpoint"))
    assert set(cp.columns) >= {
        "run_id", "source", "part_id", "committed_offset",
        "events_read", "events_dropped", "events_published",
    }
    total_read = cp.groupBy().sum("events_read").collect()[0][0]
    assert total_read == 400


def test_rerun_same_run_id_is_idempotent(spark, events, dim, tmp_path):
    pipeline = LogPipeline(
        processors=[{"dissect": {"tokenizer": TOKENIZER, "target_prefix": ""}}],
        routing=ROUTING,
    )
    sink_dir = str(tmp_path / "sinks")
    pipeline.run_batch(spark, events, sink_dir, run_id="rX")
    n1 = spark.read.parquet(sink_dir).count()
    pipeline.run_batch(spark, events, sink_dir, run_id="rX")  # crash-replay
    assert spark.read.parquet(sink_dir).count() == n1


# -- durable spool (disk-queue analogue, publisher/queue/diskqueue) -----------


def test_spool_enqueue_drain_commit_vacuum(spark, tmp_path):
    from beats_spark.spool import Spool

    sp = Spool(str(tmp_path / "spool"))
    df1 = spark.range(0, 10).withColumnRenamed("id", "offset")
    df2 = spark.range(10, 15).withColumnRenamed("id", "offset")
    sp.enqueue(df1, "b001")
    sp.enqueue(df2, "b002")
    assert sp.pending() == ["b001", "b002"]

    # single-plan drain with batch lineage
    got = sp.read_pending(spark)
    assert got.count() == 15
    per_batch = {r["_spool_batch"]: r["n"] for r in
                 got.groupBy("_spool_batch").agg(__import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")).collect()}
    assert per_batch == {"b001": 10, "b002": 5}

    # idempotent re-enqueue (producer retry) does not duplicate
    sp.enqueue(df1, "b001")
    assert sp.read_pending(spark).count() == 15

    # ack one batch -> only the other remains pending
    sp.commit(["b001"])
    assert sp.pending() == ["b002"]
    assert sp.read_pending(spark).count() == 5

    # segment cleanup removes only acked data
    assert sp.vacuum() == ["b001"]
    assert sp.pending() == ["b002"]
    sp.commit(["b002"])
    sp.vacuum()
    assert sp.read_pending(spark) is None


def test_spool_crash_replay_is_effectively_once(spark, tmp_path):
    """Crash between sink write and spool commit: the batch replays,
    but the idempotent per-run_id sink write absorbs it (ACK ordering
    contract of run_batch)."""
    from beats_spark.app import LogPipeline
    from beats_spark.spool import Spool

    ev = (
        generate_events(spark, 200)
        .select("source", "part_id", "offset", "message", "ts")
    )
    sp = Spool(str(tmp_path / "spool"))
    sp.enqueue(ev, "b1")

    pipe = LogPipeline(
        processors=[{"add_fields": {"fields": {"env": "prod"},
                                    "fields_under_root": True}}],
        routing={"indices": [], "default": "logs-%{[source]}"},
    )
    sinks = str(tmp_path / "sinks")

    # consumer run 1: process pending, sink write succeeds... then CRASH
    # before commit (no sp.commit call)
    batch = sp.read_pending(spark).drop("_spool_batch")
    pipe.run_batch(spark, batch, sinks, run_id="b1")

    # restart: batch still pending -> replay, same run_id, then commit
    assert sp.pending() == ["b1"]
    batch = sp.read_pending(spark).drop("_spool_batch")
    pipe.run_batch(spark, batch, sinks, run_id="b1")
    sp.commit(["b1"])

    out = spark.read.parquet(sinks)
    n = pipe.routed(ev).count()
    assert out.count() == n  # no duplication across the replay
    assert sp.pending() == []
