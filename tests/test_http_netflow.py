"""HTTP inputs (http_endpoint webhook, httpjson poller) and the
NetFlow v5 codec — live-server tests in the same style as the
socket-source tests (real bound ports, stdlib clients)."""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from beats_spark.processors.netflow import (
    IPV4_STR_SQL,
    encode_netflow_v5,
    encode_v5_packet,
    ipv4_str,
    parse_netflow_v5,
)
from beats_spark.streaming.http_source import (
    _split_events,
    httpjson_fetch,
    httpjson_scan,
    stream_http_endpoint,
)


def _post(url: str, obj=None, raw: bytes | None = None, headers=None,
          method: str = "POST"):
    data = raw if raw is not None else json.dumps(obj).encode()
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _free_port() -> int:
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_http_endpoint_end_to_end(spark, tmp_path):
    """POSTed JSON objects become events; the validation ladder
    answers the reference's exact status codes; bad requests publish
    nothing."""
    port = _free_port()
    ev = stream_http_endpoint(
        spark, port, secretheader="X-Secret", secretvalue="s3cr3t"
    )
    q = (
        ev.writeStream.outputMode("append").format("memory")
        .queryName("http_ep").trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        base = f"http://127.0.0.1:{port}/"
        deadline = time.time() + 30
        ok = None
        while time.time() < deadline:
            try:
                ok = _post(base, {"b": 2, "a": 1},
                           headers={"X-Secret": "s3cr3t"})
                break
            except urllib.error.URLError:
                time.sleep(0.3)  # server binds on first microbatch
        assert ok == (200, {"message": "success"})
        # the reference's ladder: secret (401) -> method (405) ->
        # content type (415) -> empty body (406) -> non-object (400)
        assert _post(base, {"a": 1})[0] == 401
        assert _post(base, {"a": 1}, headers={"X-Secret": "s3cr3t"},
                     method="PUT")[0] == 405
        assert _post(base, raw=b'{"a":1}',
                     headers={"X-Secret": "s3cr3t",
                              "Content-Type": "text/plain"})[0] == 415
        assert _post(base, raw=b"",
                     headers={"X-Secret": "s3cr3t"})[0] == 406
        assert _post(base, raw=b"[1,2]",
                     headers={"X-Secret": "s3cr3t"})[0] == 400
        assert _post(f"http://127.0.0.1:{port}/other", {"a": 1},
                     headers={"X-Secret": "s3cr3t"})[0] == 404

        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM http_ep").collect()
            if rows:
                break
            time.sleep(0.5)
        assert len(rows) == 1  # only the valid POST published
        r = rows[0]
        assert r["source"].startswith("http://127.0.0.1:")
        assert r["offset"] is None
        # nested under the prefix key, canonical key order
        assert r["message"] == '{"json":{"a":1,"b":2}}'
    finally:
        q.stop()


class _Pages(BaseHTTPRequestHandler):
    """A paginated API: /items?after=N returns 2 items and a cursor
    until exhausted; /linked uses a Link header instead."""

    DATA = [{"id": i, "v": i * 10} for i in range(5)]

    def log_message(self, *a):
        pass

    def _send(self, obj, headers=None):
        body = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        import urllib.parse as up

        parts = up.urlsplit(self.path)
        q = dict(up.parse_qsl(parts.query))
        after = int(q.get("after", -1))
        items = [d for d in self.DATA if d["id"] > after][:2]
        if parts.path == "/items":
            self._send({"items": items, "total": len(self.DATA)})
        elif parts.path == "/linked":
            headers = {}
            if items and items[-1]["id"] < self.DATA[-1]["id"]:
                nxt = f"http://{self.headers['Host']}/linked?after={items[-1]['id']}"
                headers["Link"] = f'<{nxt}>; rel="next"'
            self._send({"items": items}, headers)
        else:
            self._send({"message": "not found"})


@pytest.fixture()
def pages_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Pages)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_httpjson_url_field_pagination(pages_server):
    got = httpjson_fetch(
        pages_server + "/items",
        json_objects_array="items",
        pagination={"id_field": "id", "url_field": "after"},
    )
    assert [json.loads(v)["id"] for _, v in got] == [0, 1, 2, 3, 4]
    assert [p for p, _ in got] == [0, 0, 1, 1, 2]


def test_httpjson_header_link_pagination(pages_server):
    got = httpjson_fetch(
        pages_server + "/linked",
        json_objects_array="items",
        pagination={"header": {"field_name": "Link",
                               "regex_pattern": r'<(.*)>; *rel="next"'}},
    )
    assert [json.loads(v)["id"] for _, v in got] == [0, 1, 2, 3, 4]


def test_httpjson_no_pagination_single_page(pages_server):
    got = httpjson_fetch(pages_server + "/items",
                         json_objects_array="items")
    assert len(got) == 2  # first page only, chain not followed


def test_split_events_nested():
    ev = {"a": 1, "hits": [{"x": 1}, {"x": 2}]}
    out = _split_events("hits", ev)
    assert [o["hits"]["x"] for o in out] == [1, 2]
    assert all(o["a"] == 1 for o in out)
    # missing / non-array key passes through untouched
    assert _split_events("nope", ev) == [ev]
    assert _split_events("a", ev) == [ev]


def test_httpjson_scan_event_schema(spark, pages_server):
    df = httpjson_scan(
        spark, pages_server + "/items",
        json_objects_array="items",
        pagination={"id_field": "id", "url_field": "after"},
    )
    rows = df.orderBy("offset").collect()
    assert len(rows) == 5
    assert rows[0]["source"].startswith("httpjson://http://127.0.0.1")
    assert [r["offset"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["part_id"] for r in rows] == [0, 0, 1, 1, 2]
    assert json.loads(rows[4]["message"]) == {"id": 4, "v": 40}


def test_netflow_v5_roundtrip_bytes():
    recs = [
        dict(srcaddr=0x0A000001, dstaddr=0xC0A80102, nexthop=0,
             input_if=1, output_if=2, packets=10, octets=840,
             first_uptime=100, last_uptime=200, srcport=51000,
             dstport=443, tcp_flags=0x18, prot=6, tos=0,
             src_as=64512, dst_as=15169, src_mask=24, dst_mask=16),
        dict(srcaddr=0xFFFFFFFF, dstaddr=1, nexthop=2, input_if=3,
             output_if=4, packets=1, octets=64, first_uptime=5,
             last_uptime=6, srcport=53, dstport=53, tcp_flags=0,
             prot=17, tos=184, src_as=0, dst_as=0, src_mask=0,
             dst_mask=32),
    ]
    pkt = encode_v5_packet(
        dict(sys_uptime=7, unix_secs=1700000000, unix_nsecs=0,
             flow_sequence=42, engine_type=1, engine_id=2,
             sampling_interval=0),
        recs,
    )
    assert len(pkt) == 24 + 48 * 2


def test_netflow_parse_spark(spark):
    pkt = encode_v5_packet(
        dict(sys_uptime=7, unix_secs=1700000000, unix_nsecs=9,
             flow_sequence=42, engine_type=1, engine_id=2,
             sampling_interval=0),
        [dict(srcaddr=0x0A000001, dstaddr=0xC0A80102, nexthop=0,
              input_if=1, output_if=2, packets=10, octets=840,
              first_uptime=100, last_uptime=200, srcport=51000,
              dstport=443, tcp_flags=0x18, prot=6, tos=0,
              src_as=64512, dst_as=15169, src_mask=24, dst_mask=16)],
    )
    bad_version = b"\x00\x09" + pkt[2:]
    truncated = pkt[:-10]
    df = spark.createDataFrame(
        [("udp://10.0.0.1", bytearray(pkt)),
         ("udp://10.0.0.2", bytearray(bad_version)),
         ("udp://10.0.0.3", bytearray(truncated))],
        "exporter string, packet binary",
    )
    rows = parse_netflow_v5(df).collect()
    assert len(rows) == 1  # malformed packets dropped
    r = rows[0]
    assert r["exporter"] == "udp://10.0.0.1"
    assert r["version"] == 5 and r["count"] == 1
    assert r["flow_sequence"] == 42 and r["unix_nsecs"] == 9
    assert r["srcaddr"] == 0x0A000001 and r["dstaddr"] == 0xC0A80102
    assert r["srcport"] == 51000 and r["dstport"] == 443
    assert r["tcp_flags"] == 0x18 and r["prot"] == 6
    assert r["src_as"] == 64512 and r["dst_mask"] == 16


def test_netflow_encode_parse_identity_spark(spark):
    """encode ∘ parse = identity over a derived flow frame — the
    same structure the driver query certifies against the oracle."""
    n = 97
    flows = spark.range(n).select(
        (F.col("id") / 8).cast("long").alias("packet_id"),
        (F.col("id") % 8).alias("rec_idx"),
        F.concat(F.lit("udp://10.0.0."),
                 ((F.col("id") / 8).cast("long") % 8).cast("string")
                 ).alias("exporter"),
        ((F.col("id") / 8).cast("long") * 1000).alias("sys_uptime"),
        (F.lit(1700000000) + (F.col("id") / 8).cast("long")
         ).alias("unix_secs"),
        F.lit(0).alias("unix_nsecs"),
        ((F.col("id") / 8).cast("long") * 8).alias("flow_sequence"),
        F.lit(1).alias("engine_type"), F.lit(2).alias("engine_id"),
        F.lit(0).alias("sampling_interval"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                           F.lit("s"))), 1, 8), 16, 10)
         .cast("long")).alias("srcaddr"),
        (F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                           F.lit("d"))), 1, 8), 16, 10)
         .cast("long")).alias("dstaddr"),
        F.lit(0).alias("nexthop"),
        (F.col("id") % 1024).alias("input_if"),
        (F.col("id") % 512).alias("output_if"),
        (F.lit(1) + F.col("id") % 1000).alias("packets"),
        (F.lit(64) + F.col("id") % 100000).alias("octets"),
        (F.col("id") * 3).alias("first_uptime"),
        (F.col("id") * 3 + 1).alias("last_uptime"),
        (F.col("id") % 65536).alias("srcport"),
        (F.col("id") * 7 % 65536).alias("dstport"),
        (F.col("id") % 256).alias("tcp_flags"),
        F.when(F.col("id") % 3 == 0, 6).when(F.col("id") % 3 == 1, 17)
        .otherwise(1).alias("prot"),
        (F.col("id") % 256).alias("tos"),
        (F.col("id") % 65536).alias("src_as"),
        (F.col("id") * 11 % 65536).alias("dst_as"),
        (F.col("id") % 33).alias("src_mask"),
        (F.col("id") * 5 % 33).alias("dst_mask"),
    )
    parsed = parse_netflow_v5(encode_netflow_v5(flows))
    assert parsed.count() == n
    back = {(r["flow_sequence"] + r["rec_idx"]): r
            for r in parsed.collect()}
    orig = {r["packet_id"] * 8 + r["rec_idx"]: r for r in flows.collect()}
    assert set(back) == set(orig)
    for k, o in orig.items():
        b = back[k]
        for f in ("srcaddr", "dstaddr", "srcport", "dstport", "packets",
                  "octets", "prot", "tos", "src_as", "dst_as",
                  "src_mask", "dst_mask", "tcp_flags", "unix_secs"):
            assert b[f] == o[f], (k, f)


def test_ipv4_str_matches_duckdb_spelling(spark):
    import duckdb

    vals = [0, 1, 0x0A000001, 0xC0A80102, 0xFFFFFFFF]
    got = (
        spark.createDataFrame([(v,) for v in vals], "ip long")
        .select(ipv4_str("ip").alias("s")).collect()
    )
    want = duckdb.sql(
        "SELECT " + IPV4_STR_SQL("ip") + " AS s FROM (VALUES (0), (1), "
        "(167772161), (3232235778), (4294967295)) t(ip)"
    ).fetchall()
    assert [r["s"] for r in got] == [w[0] for w in want]
    assert got[2]["s"] == "10.0.0.1" and got[3]["s"] == "192.168.1.2"
