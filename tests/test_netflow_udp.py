"""The netflow input end to end: real v9 datagrams over loopback UDP
→ udp_packets Data Source → streaming per-session templated decode.
Mirrors the reference's input shape (x-pack/filebeat/input/netflow/
input.go: a UDP listener feeding the session-keyed decoder)."""

import socket
import threading
import time

from pyspark.sql import functions as F

from beats_spark.processors.netflow_v9 import encode_netflow_v9

TEMPLATE = [(8, 4), (7, 2), (22, 4)]  # srcaddr, srcport, first_uptime


def test_stream_netflow_udp_end_to_end(spark):
    from beats_spark.streaming.udp_source import stream_netflow_udp

    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    # 3 packets × 10 records; the template rides only packet 0 —
    # packets 1-2 decode via session state (the sender loop re-fires
    # the whole set, so on every pass the template precedes the data).
    flows = spark.range(30).select(
        (F.col("id") / 10).cast("long").alias("packet_id"),
        (F.col("id") % 10).alias("rec_idx"),
        F.lit("x").alias("exporter"),  # overwritten by the wire addr
        ((F.col("id") / 10).cast("long") == 0).alias("send_template"),
        F.lit(3).alias("source_id"),
        (F.col("id") / 10).cast("long").alias("package_sequence"),
        F.lit(1700000000).alias("unix_secs"),
        F.lit(0).alias("sys_uptime"),
        (F.col("id") * 7 + 1).alias("srcaddr"),
        (F.col("id") % 65536).alias("srcport"),
        F.col("id").alias("first_uptime"),
    )
    packets = [r.packet for r in
               encode_netflow_v9(flows, TEMPLATE)
               .orderBy("recv_seq").collect()]
    stop = threading.Event()

    def send_until_stopped():
        snd = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        # ONE bound sender socket = one stable peer address = one
        # session, like a real exporter
        snd.bind(("127.0.0.1", 0))
        while not stop.is_set():
            for p in packets:
                snd.sendto(bytes(p), ("127.0.0.1", port))
            stop.wait(1.0)
        snd.close()

    q = (
        stream_netflow_udp(spark, port)
        .writeStream.outputMode("append")
        .format("memory").queryName("nf_udp")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    t = threading.Thread(target=send_until_stopped, daemon=True)
    t.start()
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql(
                "SELECT count(DISTINCT first_uptime) AS n FROM nf_udp"
            ).first()["n"]
            if n >= 30:
                break
            time.sleep(0.5)
        assert n == 30
        rows = spark.sql(
            "SELECT * FROM nf_udp WHERE first_uptime = 29").collect()
        r = rows[0]
        assert r.srcaddr == 29 * 7 + 1 and r.srcport == 29
        assert r.source_id == 3 and r.exporter.startswith("udp://127.0.0.1:")
        # every record of one run came from ONE session (one sender)
        assert spark.sql(
            "SELECT count(DISTINCT exporter) AS n FROM nf_udp"
        ).first()["n"] == 1
    finally:
        stop.set()
        q.stop()
