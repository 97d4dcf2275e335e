"""Routing/selector + fan-out tests (reference: outil selector grammar,
libbeat/outputs/outil/select.go test coverage model)."""

from __future__ import annotations

import pytest

from beats_spark.routing import (
    DEAD_LETTER,
    add_sink_column,
    compile_selector,
    fanout_counts,
    fanout_write,
    sink_window_counts,
)
from tests.conftest import rows

CONFIG = {
    "indices": [
        {"index": "errors-%{[source]}", "when": {"equals": {"level": "error"}}},
        {"index": "audit", "when": {"contains": {"msg": "login"}}},
        {"index": "%{[env]}", "mappings": {"prod": "hot-logs", "staging": "warm-logs"}},
    ],
    "default": "default-logs",
}


@pytest.fixture(scope="module")
def df(spark):
    data = [
        (1, "error", "db timeout", "src0", "prod", "2026-01-02T03:00:00Z"),
        (2, "info", "user login ok", "src1", "prod", "2026-01-02T03:30:00Z"),
        (3, "info", "heartbeat", "src0", "prod", "2026-01-02T04:00:00Z"),
        (4, "info", "heartbeat", "src1", "staging", "2026-01-02T04:10:00Z"),
        (5, "warn", "odd", "src2", "qa", "2026-01-02T05:00:00Z"),
        (6, "error", "disk", "src2", None, "2026-01-02T05:30:00Z"),
    ]
    return spark.createDataFrame(
        data, "id int, level string, msg string, source string, env string, raw string"
    ).selectExpr("id", "level", "msg", "source", "env", "cast(raw as timestamp) ts")


def test_first_match_wins(df):
    out = add_sink_column(df, CONFIG)
    assert rows(out, "id", "sink") == [
        (1, "errors-src0"),
        (2, "audit"),
        (3, "hot-logs"),
        (4, "warm-logs"),
        (5, "default-logs"),  # env=qa misses the mapping, falls to default
        (6, "errors-src2"),
    ]


def test_null_field_falls_through(spark):
    # error row with null source: fmt string null-propagates → rule skipped
    df = spark.createDataFrame(
        [(1, "error", None, "m", "prod", None)],
        "id int, level string, source string, msg string, env string, ts timestamp",
    )
    out = add_sink_column(df, CONFIG)
    assert out.first()["sink"] == "hot-logs"


def test_default_none_routes_dead_letter(spark):
    df = spark.createDataFrame([(1, "x")], "id int, level string")
    out = add_sink_column(df, {"indices": [], "default": None})
    assert out.first()["sink"] == DEAD_LETTER


def test_fmt_default_fallback(spark):
    df = spark.createDataFrame([(None,), ("s1",)], "source string")
    col = compile_selector({"indices": [{"index": "i-%{[source]:unknown}"}]}, df)
    assert rows(df.withColumn("sink", col), "sink") == [("i-s1",), ("i-unknown",)]


def test_const_selector_folds(spark):
    df = spark.createDataFrame([(1,)], "id int")
    col = compile_selector({"indices": [{"index": "fixed"}], "default": "d"}, df)
    assert df.withColumn("s", col).first()["s"] == "fixed"


def test_fanout_single_pass_write(df, tmp_path):
    out = add_sink_column(df, CONFIG)
    fanout_write(out, str(tmp_path / "sinks"))
    import os

    dirs = sorted(
        d.split("=", 1)[1] for d in os.listdir(tmp_path / "sinks") if d.startswith("sink=")
    )
    assert dirs == ["audit", "default-logs", "errors-src0", "errors-src2", "hot-logs", "warm-logs"]
    back = df.sparkSession.read.parquet(str(tmp_path / "sinks"))
    assert back.count() == 6


def test_fanout_run_id_idempotent(df, tmp_path):
    out = add_sink_column(df, CONFIG)
    base = str(tmp_path / "sinks2")
    fanout_write(out, base, run_id="r1")
    fanout_write(out, base, run_id="r1")  # re-run overwrites, no duplication
    back = df.sparkSession.read.parquet(base)
    assert back.count() == 6


def test_fanout_counts(df):
    out = add_sink_column(df, CONFIG)
    got = dict(rows(fanout_counts(out), "sink", "events_acked"))
    assert got == {
        "errors-src0": 1, "errors-src2": 1, "audit": 1,
        "hot-logs": 1, "warm-logs": 1, "default-logs": 1,
    }


def test_sink_window_counts(df):
    out = add_sink_column(df, CONFIG)
    agg = sink_window_counts(out, window="1 hour")
    total = sum(r["events"] for r in agg.collect())
    assert total == 6
    cols = agg.columns
    assert cols == ["sink", "source", "level", "window_start", "events"]


def test_fanout_write_bounds_files_per_sink(spark, tmp_path):
    import glob

    from beats_spark.datagen import generate_events
    from beats_spark.routing import add_sink_column, fanout_write

    ev = generate_events(spark, 2000).repartition(8)
    routed = add_sink_column(ev, {"indices": [], "default": "logs-%{[source]}"})
    out = str(tmp_path / "sinks")
    fanout_write(routed, out, files_per_sink=2)
    for d in glob.glob(f"{out}/sink=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert 1 <= len(files) <= 2, (d, files)
    # content survives the repartition
    assert spark.read.parquet(out).count() == 2000


# -- ES bulk per-item triage (elasticsearch/client.go:390-420) ----------------


def test_triage_status_ladder(spark):
    from beats_spark.routing import (DEAD_LETTER, retryable_rows, triage_counts,
                                     triage_outcomes)

    df = spark.createDataFrame(
        [(i, "s1", st) for i, st in enumerate([200, 201, 299, 409, 429, 400, 404, 500, 503])],
        "id long, sink string, item_status int",
    )
    out = triage_outcomes(df)
    got = {r["item_status"]: (r["outcome"], r["sink"]) for r in out.collect()}
    assert got[200] == ("acked", "s1") and got[299] == ("acked", "s1")
    assert got[409] == ("duplicate", "s1")  # ok class, not retried
    assert got[429] == ("toomany", "s1")
    assert got[400] == ("dropped", DEAD_LETTER)  # non-indexable -> dead letter
    assert got[404] == ("dropped", DEAD_LETTER)
    assert got[500] == ("retry", "s1") and got[503] == ("retry", "s1")

    retry_statuses = sorted(r["item_status"] for r in retryable_rows(out).collect())
    assert retry_statuses == [429, 500, 503]

    counts = {r["sink"]: r.asDict() for r in triage_counts(out).collect()}
    assert counts["s1"]["events_acked"] == 3
    assert counts["s1"]["events_duplicates"] == 1
    assert counts["s1"]["events_toomany"] == 1
    assert counts["s1"]["events_failed"] == 3  # 429 + 500 + 503
    assert counts[DEAD_LETTER]["events_dropped"] == 2


# -- kafka sink shape (outputs/kafka: kafka.go:52, partition.go:64-138) -------


def test_kafka_frame_shape_and_routing(spark):
    import json

    from beats_spark.kafka_sink import kafka_frame

    df = spark.createDataFrame(
        [("error", 7, "2026-01-02 03:00:00"), ("info", 9, "2026-01-02 04:00:00")],
        "level string, uid long, ts_s string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts_s")).drop("ts_s")
    frame = kafka_frame(
        df,
        topics={"indices": [
            {"topic": "alerts-%{[level]}", "when": {"equals": {"level": "error"}}}],
            "default": "logs"},
        key="%{[uid]}",
    )
    assert [f.name for f in frame.schema.fields] == ["key", "value", "topic"]
    types = {f.name: f.dataType.typeName() for f in frame.schema.fields}
    assert types == {"key": "binary", "value": "binary", "topic": "string"}
    rows_ = {r["topic"]: r for r in frame.collect()}
    assert set(rows_) == {"alerts-error", "logs"}
    assert bytes(rows_["alerts-error"]["key"]) == b"7"
    payload = json.loads(bytes(rows_["alerts-error"]["value"]))
    assert payload["level"] == "error" and payload["uid"] == 7


def test_kafka_hash_fields_key_and_writer_options(spark):
    from beats_spark.kafka_sink import kafka_frame, write_kafka

    df = spark.createDataFrame([("a", 1), ("b", 2)], "src string, part long")
    frame = kafka_frame(df, topics={"default": "t"}, hash_fields=["src", "part"])
    keys = sorted(bytes(r["key"]) for r in frame.collect())
    assert keys == [b"a|1", b"b|2"]  # partition.hash.hash joined fields

    from beats_spark.kafka_sink import kafka_writer_options
    from pyspark.sql.readwriter import DataFrameWriter

    writer = write_kafka(df, "broker:9092", topics={"default": "t"},
                         key="%{[src]}", options={"kafka.acks": "all"})
    # code-complete, not executed (no broker in sandbox): the writer is
    # configured and ready for save()
    assert isinstance(writer, DataFrameWriter)
    opts = kafka_writer_options("broker:9092", {"kafka.acks": "all"})
    assert opts == {"kafka.bootstrap.servers": "broker:9092", "kafka.acks": "all"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="strategy"):
        write_kafka(df, "b:9092", topics={"default": "t"}, partition_strategy="zigzag")


def test_kafka_round_robin_drops_key(spark):
    from beats_spark.kafka_sink import kafka_frame, write_kafka

    df = spark.createDataFrame([("a", 1)], "src string, part long")
    w = write_kafka(df, "b:9092", topics={"default": "t"}, key="%{[src]}",
                    partition_strategy="round_robin")
    assert w is not None  # plan builds; key nulled for broker-side spreading


def test_redis_frame_shape(spark):
    import json

    from beats_spark.redis_sink import redis_frame, write_redis

    df = spark.createDataFrame([("error", 1), ("info", 2)], "level string, uid long")
    frame = redis_frame(df, key={"indices": [
        {"key": "hot-%{[level]}", "when": {"equals": {"level": "error"}}}],
        "default": "logs"})
    got = {r["key"]: json.loads(r["value"]) for r in frame.collect()}
    assert set(got) == {"hot-error", "logs"}
    assert got["hot-error"]["uid"] == 1

    # bare format-string key (the reference's key: "%{[f]:fallback}")
    frame2 = redis_frame(df, key="queue")
    assert [r["key"] for r in frame2.collect()] == ["queue", "queue"]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="data_type"):
        write_redis(df, "h", 6379, key="q", data_type="zset")


def test_fanout_write_table_v2_idempotent(spark, tmp_path):
    """DataFrameWriterV2 catalog-table fan-out (the Iceberg sink code
    path, driven here with the parquet provider): create on first
    write, overwritePartitions on replay — same run_id rewrites itself,
    no duplicates; a second run_id appends its partitions."""
    from beats_spark.routing import add_sink_column, fanout_write_table

    ev = spark.createDataFrame(
        [(i, "error" if i % 3 == 0 else "info") for i in range(30)],
        "doc_id long, level string",
    )
    routing = {"indices": [{"index": "errors",
                            "when": {"equals": {"level": "error"}}}],
               "default": "main"}
    routed = add_sink_column(ev, routing)
    table = "spark_catalog.default.fanout_v2_test"
    try:
        fanout_write_table(routed, table, run_id="r1", provider="parquet")
        n1 = spark.table(table).count()
        assert n1 == 30
        # replay same run_id: no dup
        fanout_write_table(routed, table, run_id="r1", provider="parquet")
        assert spark.table(table).count() == 30
        # a second batch lands alongside
        fanout_write_table(routed.limit(5), table, run_id="r2", provider="parquet")
        assert spark.table(table).count() == 35
        sinks = {r["sink"] for r in spark.table(table).select("sink").distinct().collect()}
        assert sinks == {"errors", "main"}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_window_percentiles_exact_vs_approx(spark):
    """Exact interpolated percentiles vs the t-digest approx (the
    10^12-row path): approx must land within its 1/accuracy rank error
    on a smooth distribution, and groups/counts must be identical."""
    from pyspark.sql import functions as F

    from beats_spark.datagen import generate_events
    from beats_spark.routing import sink_window_percentiles

    ev = generate_events(spark, 4000).withColumn(
        "sink", F.when(F.col("offset") % 7 == 0, "errors").otherwise("main")
    ).withColumn("value", (F.col("offset") % 1000).cast("double"))
    exact = {
        (r["sink"], r["window_start"]): r
        for r in sink_window_percentiles(ev, window="1 day").collect()
    }
    approx = {
        (r["sink"], r["window_start"]): r
        for r in sink_window_percentiles(
            ev, window="1 day", exact=False, accuracy=10_000
        ).collect()
    }
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        a = approx[k]
        assert a["events"] == e["events"]
        for p in ("p50", "p95", "p99"):
            # rank error 1/accuracy over a 0..999 uniform support
            assert abs(a[p] - e[p]) <= 5.0, (k, p, a[p], e[p])
    # full-decimal quantile names never collide (0.99 vs 0.995 vs 0.999)
    hi = sink_window_percentiles(ev, window="1 day", qs=(0.99, 0.995, 0.999))
    assert [c for c in hi.columns if c.startswith("p")] == ["p99", "p99_5", "p99_9"]
