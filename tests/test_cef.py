"""decode_cef golden tests — every case mirrors the reference's
x-pack/filebeat/processors/decode_cef/cef/cef_test.go expectations."""

from __future__ import annotations

import pytest

from beats_spark.processors.cef import (
    CEF_PARSE_ERROR_FLAG,
    decode_cef,
    encode_cef,
)

STANDARD = (
    "CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|"
    "src=10.0.0.192 dst=12.121.122.82 spt=1232 eventId=1"
)


def _decode_one(spark, msg, **kw):
    df = spark.createDataFrame([(msg,)], "message string")
    return decode_cef(df, **kw).collect()[0]


def test_standard_message(spark):
    r = _decode_one(spark, STANDARD)
    c = r["cef"]
    assert c["version"] == 26
    assert c["device_vendor"] == "security"
    assert c["device_product"] == "threatmanager"
    assert c["device_version"] == "1.0"
    assert c["device_event_class_id"] == "100"
    assert c["name"] == "trojan successfully stopped"
    assert c["severity"] == "10"
    # full extension names (TestEventUnpackWithFullExtensionNames)
    assert c["extensions"] == {
        "sourceAddress": "10.0.0.192",
        "destinationAddress": "12.121.122.82",
        "sourcePort": "1232",
        "eventId": "1",
    }
    # ECS-style typed columns
    assert r["source_ip"] == "10.0.0.192"
    assert r["source_port"] == 1232
    assert r["destination_ip"] == "12.121.122.82"
    assert r["cef_event_id"] == 1
    assert r["log_flags"] is None


def test_short_names(spark):
    r = _decode_one(spark, STANDARD, full_names=False, ecs=False)
    assert r["cef"]["extensions"] == {
        "src": "10.0.0.192",
        "dst": "12.121.122.82",
        "spt": "1232",
        "eventId": "1",
    }


def test_header_only_and_empty_device_fields(spark):
    r = _decode_one(
        spark,
        "CEF:26|security|threatmanager|1.0|100|trojan successfully stopped|10|",
    )
    assert r["cef"]["version"] == 26
    assert r["cef"]["extensions"] == {}
    r = _decode_one(
        spark,
        "CEF:0|||1.0|100|trojan successfully stopped|10|src=10.0.0.192",
    )
    assert r["cef"]["device_vendor"] == ""
    assert r["cef"]["device_product"] == ""
    assert r["cef"]["extensions"] == {"sourceAddress": "10.0.0.192"}


def test_escaped_pipe_and_equals_in_header(spark):
    r = _decode_one(
        spark,
        r"CEF:26|security|threat\|->manager|1.0|100|trojan successfully "
        "stopped|10|src=10.0.0.192",
    )
    assert r["cef"]["device_product"] == "threat|->manager"
    r = _decode_one(
        spark,
        "CEF:26|security|threat=manager|1.0|100|trojan successfully "
        "stopped|10|src=10.0.0.192",
    )
    assert r["cef"]["device_product"] == "threat=manager"
    r = _decode_one(
        spark,
        r"CEF:0|secu\\rity|threatmanager|1.0|100|detected a \\ in "
        "packet|10|src=10.0.0.192",
    )
    assert r["cef"]["device_vendor"] == "secu\\rity"
    assert r["cef"]["name"] == "detected a \\ in packet"


def test_leading_data_and_whitespace(spark):
    # syslog prefix before the header is ignored (decode_cef.go:78)
    r = _decode_one(
        spark,
        "<134>1 2019-01-01T00:00:00Z host app - - - "
        "CEF:0|security|threatmanager|1.0|100|x|10| src=10.0.0.192 spt=1232",
    )
    assert r["cef"]["version"] == 0
    assert r["cef"]["extensions"] == {
        "sourceAddress": "10.0.0.192",
        "sourcePort": "1232",
    }


def test_pipe_in_extension_not_escaped(spark):
    # raw pipe is fine in extensions...
    r = _decode_one(
        spark,
        "CEF:0|security|threatmanager|1.0|100|x|10|moo=this|has an pipe",
    )
    assert r["cef"]["extensions"] == {"moo": "this|has an pipe"}
    # ...but an ESCAPED pipe is an invalid escape pair: the pair is
    # malformed and dropped (errorEscapedPipeInExtension)
    r = _decode_one(
        spark,
        r"CEF:0|security|threatmanager|1.0|100|x|10|moo=this\|has an "
        "escaped pipe",
    )
    assert r["cef"]["extensions"] == {}


def test_unescaped_equals_malforms_pair_only(spark):
    # errorEqualsInMessage: everything dropped
    r = _decode_one(
        spark,
        r"CEF:0|security|threatmanager|1.0|100|x|10|moo=this =has = equals\=",
    )
    assert r["cef"]["extensions"] == {}
    # errorMultipleMalformedExtensionValues: recovery keeps msg/error/user
    r = _decode_one(
        spark,
        "CEF:0|vendor|product|version|event_id|name|Very-High| "
        "msg=Hello World error=Failed because id==old_id user=root "
        "angle=106.7<=180",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["severity"] == "Very-High"
    assert r["cef"]["extensions"] == {
        "msg": "Hello World",
        "error": "Failed because",
        "user": "root",
    }


def test_escapes_in_extension(spark):
    r = _decode_one(
        spark,
        r"CEF:0|security|threatmanager|1.0|100|x|10|msg=a+b\=c x=c\\d\=z",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {"msg": "a+b=c", "x": "c\\d=z"}


def test_malformed_extension_escape_recovery(spark):
    r = _decode_one(
        spark,
        "CEF:0|FooBar|Web Gateway|1.2.3.45.67|200|Success|2|"
        "rt=Sep 07 2018 14:50:39 cat=Access Log dst=1.1.1.1 "
        "dhost=foo.example.com suser=redacted src=2.2.2.2 "
        "requestMethod=POST request='https://foo.example.com/bar/bingo/1' "
        "requestClientApplication='Foo-Bar/2018.1.7; "
        "=Email:user@example.com; Guid:test=' cs1= cs1Label=Foo Bar",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {
        "rt": "Sep 07 2018 14:50:39",
        "cat": "Access Log",
        "dst": "1.1.1.1",
        "dhost": "foo.example.com",
        "suser": "redacted",
        "src": "2.2.2.2",
        "requestMethod": "POST",
        "request": "'https://foo.example.com/bar/bingo/1'",
        "cs1": "",
        "cs1Label": "Foo Bar",
    }


def test_whitespace_semantics(spark):
    # paddedMessage: non-final trailing spaces preserved minus the
    # single separator space
    r = _decode_one(
        spark,
        "CEF:0|security|threatmanager|1.0|100|message is padded|10|"
        "spt=1232 msg=Trailing space in non-final extensions is  "
        "preserved    src=10.0.0.192 ",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {
        "spt": "1232",
        "src": "10.0.0.192",
        "msg": "Trailing space in non-final extensions is  preserved   ",
    }
    # crlfMessage: final trailing whitespace trimmed
    r = _decode_one(
        spark,
        "CEF:0|security|threatmanager|1.0|100|message is padded|10|"
        "spt=1232 msg=Trailing space in final extensions is not "
        "preserved\t \r\n",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {
        "spt": "1232",
        "msg": "Trailing space in final extensions is not preserved",
    }
    # tabMessage: internal tabs/CR/LF preserved; \t before the single
    # separator space stays in the value
    r = _decode_one(
        spark,
        "CEF:0|security|threatmanager|1.0|100|message is padded|10|"
        "spt=1232 msg=Tabs\tand\rcontrol\ncharacters are preserved\t "
        "src=127.0.0.1",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {
        "spt": "1232",
        "src": "127.0.0.1",
        "msg": "Tabs\tand\rcontrol\ncharacters are preserved\t",
    }
    # tabNoSepMessage: tab is NOT a separator — src is no extension and
    # the msg pair is malformed (contains raw =)
    r = _decode_one(
        spark,
        "CEF:0|security|threatmanager|1.0|100|message has tabs|10|"
        "spt=1232 msg=Tab is not a separator\tsrc=127.0.0.1",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {"spt": "1232"}


def test_duplicate_keys_last_wins(spark):
    r = _decode_one(
        spark,
        "CEF:0|v|p|1|100|n|10|src=1.1.1.1 src=2.2.2.2",
        full_names=False,
        ecs=False,
    )
    assert r["cef"]["extensions"] == {"src": "2.2.2.2"}


def test_parse_failure_flag(spark):
    df = spark.createDataFrame(
        [("not a cef line",), ("CEF:|bad|version",), (None,)],
        "message string",
    )
    rows = decode_cef(df).collect()
    for r in rows:
        assert r["cef"] is None
        assert r["log_flags"] == [CEF_PARSE_ERROR_FLAG]


def test_encode_decode_round_trip(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "evil|corp\\x", "a=b", 7, "10.0.0.1", "with = and \\ and | ok")],
        "id int, vendor string, name string, sev int, ip string, m string",
    )
    enc = encode_cef(
        df,
        version=1,
        device_vendor=F.col("vendor"),
        device_product="prod",
        device_version="2.0",
        device_event_class_id=F.col("id"),
        name=F.col("name"),
        severity=F.col("sev"),
        extensions={"src": F.col("ip"), "msg": F.col("m"), "eventId": F.col("id")},
    )
    r = decode_cef(enc).collect()[0]
    c = r["cef"]
    assert c["version"] == 1
    assert c["device_vendor"] == "evil|corp\\x"
    assert c["name"] == "a=b"
    assert c["severity"] == "7"
    assert c["extensions"]["sourceAddress"] == "10.0.0.1"
    assert c["extensions"]["message"] == "with = and \\ and | ok"
    assert r["cef_message"] == "with = and \\ and | ok"
    assert r["source_ip"] == "10.0.0.1"


def test_registry_face(spark):
    from beats_spark.processors import build_processor

    proc = build_processor({"decode_cef": {"ecs": False}})
    df = spark.createDataFrame([(STANDARD,)], "message string")
    out = proc(df)
    assert out.collect()[0]["cef"]["version"] == 26
