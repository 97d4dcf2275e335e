"""NetFlow v5 binary codec — the fixed-layout member of the
reference's netflow input (``x-pack/filebeat/input/netflow/decoder/
v5/v5.go:29-93``: 24-byte packet header + 48-byte flow records,
big-endian; field set and order exactly ``templateV5``).

Spark-first design: packets arrive as an opaque ``binary`` column
(from the UDP source, a kafka topic, or a capture file); decode is a
``mapInPandas`` stage whose Arrow batches are parsed with ONE
``numpy.frombuffer`` per batch — every packet's record bytes are
concatenated and viewed through a big-endian structured dtype, so the
hot path is C-speed with no per-record Python. Encode (the test /
round-trip direction) is the same structured array written with
``tobytes``.

IPv4 fields are emitted as unsigned-32 longs; ``ipv4_str`` renders
the dotted quad JVM-side (shift/mask + concat_ws — stays inside
whole-stage codegen, and is expressible 1:1 in the DuckDB oracle).

Scale note: decode is narrow (no shuffle) and explodes each packet
into ≤30 rows — cost ∝ input bytes, exactly the shape a 100 TB
capture replay needs. Parsers for the templated protocols (v9/IPFIX)
would need a per-exporter template state store; v5 is the stateless
fixed-template subset and is what this module covers.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEADER_DT = np.dtype([
    ("version", ">u2"), ("count", ">u2"), ("sys_uptime", ">u4"),
    ("unix_secs", ">u4"), ("unix_nsecs", ">u4"), ("flow_sequence", ">u4"),
    ("engine_type", "u1"), ("engine_id", "u1"), ("sampling_interval", ">u2"),
])  # 24 bytes

RECORD_DT = np.dtype([
    ("srcaddr", ">u4"), ("dstaddr", ">u4"), ("nexthop", ">u4"),
    ("input_if", ">u2"), ("output_if", ">u2"),
    ("packets", ">u4"), ("octets", ">u4"),
    ("first_uptime", ">u4"), ("last_uptime", ">u4"),
    ("srcport", ">u2"), ("dstport", ">u2"),
    ("pad1", "u1"), ("tcp_flags", "u1"), ("prot", "u1"), ("tos", "u1"),
    ("src_as", ">u2"), ("dst_as", ">u2"),
    ("src_mask", "u1"), ("dst_mask", "u1"), ("pad2", ">u2"),
])  # 48 bytes

assert HEADER_DT.itemsize == 24 and RECORD_DT.itemsize == 48

_HEADER_FIELDS = ["version", "count", "sys_uptime", "unix_secs",
                  "unix_nsecs", "flow_sequence", "engine_type",
                  "engine_id", "sampling_interval"]
_RECORD_FIELDS = [n for n in RECORD_DT.names if not n.startswith("pad")]

PARSED_SCHEMA = (
    "exporter string, rec_idx int, "
    + ", ".join(f"{n} long" for n in _HEADER_FIELDS)
    + ", "
    + ", ".join(f"{n} long" for n in _RECORD_FIELDS)
)


def encode_v5_packet(header: dict, records: list[dict]) -> bytes:
    """One packet from plain dicts (test fixtures / the round-trip
    query). ``count`` and ``version`` are derived, not caller-set."""
    h = np.zeros(1, HEADER_DT)
    h["version"] = 5
    h["count"] = len(records)
    for k in _HEADER_FIELDS[2:]:
        h[k] = header.get(k, 0)
    r = np.zeros(len(records), RECORD_DT)
    for i, rec in enumerate(records):
        for k in _RECORD_FIELDS:
            r[i][k] = rec[k]
    return h.tobytes() + r.tobytes()


def parse_netflow_v5(df: DataFrame, packet_col: str = "packet",
                     exporter_col: str = "exporter") -> DataFrame:
    """Explode v5 packets into one row per flow record (header fields
    repeated, ``rec_idx`` = position within the packet). Malformed
    packets (bad version, truncated) are dropped, as the reference's
    decoder errors them out of the stream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            goods: list[bytes] = []
            exps: list[str] = []
            counts: list[int] = []
            heads: list[np.ndarray] = []
            for exp, raw in zip(pdf[exporter_col], pdf[packet_col]):
                b = bytes(raw)
                if len(b) < 24:
                    continue
                h = np.frombuffer(b, HEADER_DT, count=1)
                n = int(h["count"][0])
                if int(h["version"][0]) != 5 or len(b) < 24 + 48 * n:
                    continue
                goods.append(b[24:24 + 48 * n])
                exps.append(exp)
                counts.append(n)
                heads.append(h)
            if not goods:
                yield pd.DataFrame(
                    {c: pd.Series(dtype="object")
                     for c in ["exporter", "rec_idx",
                               *_HEADER_FIELDS, *_RECORD_FIELDS]}
                )
                continue
            # ONE frombuffer over every record of every packet in the
            # batch — the per-packet loop above only slices bytes.
            recs = np.frombuffer(b"".join(goods), RECORD_DT)
            counts_a = np.asarray(counts)
            out = {
                "exporter": np.repeat(np.asarray(exps, object), counts_a),
                "rec_idx": np.concatenate(
                    [np.arange(n) for n in counts]).astype("int64"),
            }
            hall = np.concatenate(heads)
            for k in _HEADER_FIELDS:
                out[k] = np.repeat(
                    hall[k].astype("int64"), counts_a)
            for k in _RECORD_FIELDS:
                out[k] = recs[k].astype("int64")
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=PARSED_SCHEMA)


def encode_netflow_v5(flows: DataFrame, packet_key: str = "packet_id",
                      rec_idx: str = "rec_idx",
                      exporter_col: str = "exporter") -> DataFrame:
    """Group derived flow rows into wire packets (≤30 records each,
    the v5 convention) — the inverse of ``parse_netflow_v5``, used by
    the round-trip correctness query and capture-replay fixtures.
    Input must carry the header fields (same value within a packet
    group) and all record fields."""

    from beats_spark.processors.netflow_v9 import (
        _encode_batches,
        _packet_bounds,
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        starts, ends = _packet_bounds(pdf, packet_key)
        r = np.zeros(len(pdf), RECORD_DT)
        for k in _RECORD_FIELDS:
            r[k] = pdf[k].to_numpy(dtype="int64")
        rb = r.tobytes()
        sz = RECORD_DT.itemsize
        hs = np.zeros(len(starts), HEADER_DT)
        hs["version"] = 5
        hs["count"] = ends - starts
        for k in _HEADER_FIELDS[2:]:
            hs[k] = pdf[k].to_numpy(dtype="int64")[starts]
        hb = hs.tobytes()
        hsz = HEADER_DT.itemsize
        packets = [hb[i * hsz:(i + 1) * hsz]
                   + rb[starts[i] * sz:ends[i] * sz]
                   for i in range(len(starts))]
        return pd.DataFrame({
            "exporter": pdf[exporter_col].to_numpy(object)[starts],
            "recv_seq": pdf[packet_key].to_numpy(dtype="int64")[starts],
            "packet": packets,
        })

    return _encode_batches(flows, packet_key, rec_idx, build).drop(
        "recv_seq")


def ipv4_str(col: Column | str) -> Column:
    """Unsigned-32 long → dotted quad, pure JVM expressions (matches
    the oracle's arithmetic 1:1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        ".",
        (F.shiftrightunsigned(c, 24) % 256).cast("string"),
        (F.shiftrightunsigned(c, 16) % 256).cast("string"),
        (F.shiftrightunsigned(c, 8) % 256).cast("string"),
        (c % 256).cast("string"),
    )


def IPV4_STR_SQL(expr: str) -> str:
    """The DuckDB spelling of ``ipv4_str`` for oracle queries."""
    return (
        f"(({expr}) // 16777216) % 256 || '.' || "
        f"(({expr}) // 65536) % 256 || '.' || "
        f"(({expr}) // 256) % 256 || '.' || ({expr}) % 256"
    )
