"""Output codec tests (libbeat/outputs/codec json + format analogues)."""

from __future__ import annotations

import json

from beats_spark.codecs import encode_format, encode_json


def test_encode_json_round_trips_and_drops_nulls(spark):
    df = spark.createDataFrame(
        [("e1", "error", None), ("e2", "info", 7)],
        "id string, level string, code int",
    )
    out = {r["id"]: json.loads(r["encoded"]) for r in encode_json(df).collect()}
    assert out["e2"] == {"id": "e2", "level": "info", "code": 7}
    assert out["e1"] == {"id": "e1", "level": "error"}  # null key absent


def test_encode_json_column_subset(spark):
    df = spark.createDataFrame([("e1", "x", 1)], "id string, level string, code int")
    got = json.loads(encode_json(df, columns=["id", "code"]).collect()[0]["encoded"])
    assert got == {"id": "e1", "code": 1}


def test_encode_format_template(spark):
    df = spark.createDataFrame(
        [("web", "error", "2026-03-01 10:00:00")],
        "source string, level string, ts_s string",
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["f"]).to_timestamp("ts_s"))
    out = encode_format(df, "%{[source]}-%{[level]}-%{+yyyy.MM.dd}").collect()[0]
    assert out["encoded"] == "web-error-2026.03.01"
