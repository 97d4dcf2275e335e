"""NetFlow v9 + IPFIX — the TEMPLATED decoders the v5 module scoped
out.

Reference: ``x-pack/filebeat/input/netflow/decoder/v9/v9.go`` (20-byte
packet header, flowset walk, ``setID >= 256`` = data, v9.go:124) and
``session.go:17-66`` (template state keyed by (exporter, source_id);
``GetTemplate`` miss ⇒ the data set is DROPPED, not buffered). Wire
layout: header ``version(2) count(2) sys_uptime(4) unix_secs(4)
package_sequence(4) source_id(4)``; then flowsets ``set_id(2)
length(2)`` — set 0 carries templates (``template_id(2) field_count(2)
[type(2) len(2)]*``), set 1 options templates (parsed past, like the
reference's metadata-only path), sets ≥256 carry records laid out by
the template of that id, padded to a 4-byte boundary.

IPFIX (``decoder/ipfix/ipfix.go``; RFC 7011) rides the same session
machinery — the parser dispatches on each packet's version word: a
16-byte header (``length`` in bytes, ``export_time``, ``sequence``,
``observation_domain_id`` → the ``source_id`` slot of the session
key), template set id 2, options set id 3, enterprise-bit fields
(4-byte PEN after the field spec) decoded as dead offsets.
Variable-length fields (len 65535) make a template un-compilable to
a fixed numpy dtype; such templates are remembered as ``None`` and
their data sets drop — the fixed-length subset is what this module
covers, the same scoping the v5 module applied to templates.

Spark-first design. The whole difficulty of v9 over v5 is STATE: a
record is undecodable without the template that an EARLIER packet of
the same (exporter, source_id) session announced. Batch form:
``groupBy(exporter).applyInPandas`` — one shuffle co-locates each
session's packets, a sequence sort inside the group replays them in
arrival order, and the template map lives only for the group's
lifetime. Streaming form: ``applyInPandasWithState`` keyed by
exporter with the serialized template map as state, so templates
announced in micro-batch N decode records in micro-batch N+k —
exactly the reference's long-lived session map.

Per-record work stays C-speed: each template compiles ONCE into a
numpy structured dtype (big-endian fields at their wire offsets), and
every data flowset decodes with a single ``np.frombuffer`` over all
its records. Python touches packets and flowsets (tens of bytes of
header each), never records.

Scale note: the shuffle key is the exporter — sessions are
independent, so a 1000-executor cluster decodes 100 TB of capture
with no cross-session traffic. A single hot exporter is the skew
case; split its capture on ``source_id`` (part of the session key,
so semantics are preserved) before grouping.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

V9_HEADER_DT = np.dtype([
    ("version", ">u2"), ("count", ">u2"), ("sys_uptime", ">u4"),
    ("unix_secs", ">u4"), ("package_sequence", ">u4"),
    ("source_id", ">u4"),
])  # 20 bytes

IPFIX_HEADER_DT = np.dtype([
    ("version", ">u2"), ("length", ">u2"), ("export_time", ">u4"),
    ("sequence", ">u4"), ("observation_domain_id", ">u4"),
])  # 16 bytes (RFC 7011 §3.1; length = whole message in bytes)

#: field-type registry (fields.go names → the v5 module's column
#: vocabulary, so v5 and v9 output join/union cleanly). width = the
#: conventional wire length; other lengths still decode (1/2/4/8).
V9_FIELDS: dict[int, tuple[str, int]] = {
    1: ("octets", 4), 2: ("packets", 4), 4: ("prot", 1), 5: ("tos", 1),
    6: ("tcp_flags", 1), 7: ("srcport", 2), 8: ("srcaddr", 4),
    9: ("src_mask", 1), 10: ("input_if", 2), 11: ("dstport", 2),
    12: ("dstaddr", 4), 13: ("dst_mask", 1), 14: ("output_if", 2),
    15: ("nexthop", 4), 16: ("src_as", 2), 17: ("dst_as", 2),
    21: ("last_uptime", 4), 22: ("first_uptime", 4),
}

_KNOWN_COLS = [name for name, _ in V9_FIELDS.values()]

_HEADER_OUT = ["source_id", "package_sequence", "unix_secs",
               "sys_uptime"]

PARSED_V9_SCHEMA = (
    "exporter string, template_id long, rec_idx long, "
    + ", ".join(f"{c} long" for c in _HEADER_OUT) + ", "
    + ", ".join(f"{c} long" for c in _KNOWN_COLS)
)

_WIDTH_FMT = {1: ">u1", 2: ">u2", 4: ">u4", 8: ">u8"}


def compile_template(fields: list[tuple[int, int]]):
    """[(type, length)] → (numpy structured dtype over one wire
    record, [known column names present]). Unknown field types and
    non-power-of-two widths become dead offsets (skipped bytes) —
    the record still parses, mirroring the reference's tolerance of
    enterprise-specific fields."""
    names, formats, offsets = [], [], []
    pos = 0
    for i, (ftype, flen) in enumerate(fields):
        if ftype in V9_FIELDS and flen in _WIDTH_FMT:
            names.append(V9_FIELDS[ftype][0])
            formats.append(_WIDTH_FMT[flen])
            offsets.append(pos)
        elif flen in _WIDTH_FMT:
            names.append(f"_f{ftype}_{i}")
            formats.append(_WIDTH_FMT[flen])
            offsets.append(pos)
        pos += flen
    dt = np.dtype({"names": names, "formats": formats,
                   "offsets": offsets, "itemsize": pos})
    known = [n for n in names if not n.startswith("_f")]
    return dt, known


def _parse_templates(body: bytes,
                     ipfix: bool = False) -> list[tuple[int, list]]:
    """One template (flow)set body → [(template_id, [(type, len)])].
    IPFIX (RFC 7011 §3.4.1): a field whose ie_id has the enterprise
    bit set is followed by a 4-byte enterprise number — recorded with
    a synthetic out-of-registry type so it decodes as a dead offset.
    A variable-length field (len 65535) makes the whole template
    un-compilable to a fixed dtype → template_id maps to None and its
    data sets drop (documented subset, like v5 scoping out v9)."""
    out, pos = [], 0
    while pos + 4 <= len(body):
        tid, nf = int.from_bytes(body[pos:pos + 2], "big"), \
            int.from_bytes(body[pos + 2:pos + 4], "big")
        pos += 4
        if nf == 0:
            break  # padding — stop the walk
        fields: list[tuple[int, int]] | None = []
        ok = True
        for _ in range(nf):
            if pos + 4 > len(body):
                ok = False
                break
            ftype = int.from_bytes(body[pos:pos + 2], "big")
            flen = int.from_bytes(body[pos + 2:pos + 4], "big")
            pos += 4
            if ipfix and ftype & 0x8000:
                if pos + 4 > len(body):
                    ok = False
                    break
                pos += 4  # enterprise number
                ftype = 0x10000 + (ftype & 0x7FFF)  # never in V9_FIELDS
            if flen == 65535:
                fields = None  # variable-length: not fixed-decodable
                continue
            if fields is not None:
                fields.append((ftype, flen))
        if not ok:
            break  # truncated — stop the walk
        out.append((tid, fields))
    return out


def _decode_packets(
    exporter: str,
    packets: Iterator[bytes],
    templates: dict,
) -> dict[str, list]:
    """Replay packets in order through the session's template map.
    ``templates`` maps (source_id, template_id) → (dtype, known) and
    is MUTATED — the caller owns its lifetime (per-group in batch,
    state-store in streaming)."""
    cols: dict[str, list] = {c: [] for c in
                             ["exporter", "template_id", "rec_idx",
                              *_HEADER_OUT, *_KNOWN_COLS]}
    for raw in packets:
        b = bytes(raw)
        if len(b) < 16:
            continue
        version = int.from_bytes(b[0:2], "big")
        if version == 9:
            if len(b) < 20:
                continue
            h = np.frombuffer(b, V9_HEADER_DT, count=1)
            hdr = {k: int(h[k][0]) for k in _HEADER_OUT}
            pos, tmpl_id, opts_id, ipfix = 20, 0, 1, False
        elif version == 10:  # IPFIX, RFC 7011 §3.1
            h = np.frombuffer(b, IPFIX_HEADER_DT, count=1)
            b = b[:int(h["length"][0])]  # header length bounds the msg
            hdr = {
                "source_id": int(h["observation_domain_id"][0]),
                "package_sequence": int(h["sequence"][0]),
                "unix_secs": int(h["export_time"][0]),
                "sys_uptime": 0,  # IPFIX has no uptime clock
            }
            pos, tmpl_id, opts_id, ipfix = 16, 2, 3, True
        else:
            continue
        sid = hdr["source_id"]
        while pos + 4 <= len(b):
            set_id = int.from_bytes(b[pos:pos + 2], "big")
            set_len = int.from_bytes(b[pos + 2:pos + 4], "big")
            if set_len < 4 or pos + set_len > len(b):
                break  # malformed set — drop the rest of the packet
            body = b[pos + 4:pos + set_len]
            pos += set_len
            if set_id == tmpl_id:
                for tid, fields in _parse_templates(body, ipfix):
                    templates[(sid, tid)] = (
                        compile_template(fields)
                        if fields is not None else None)
            elif set_id == opts_id or set_id < 256:
                continue  # options template: metadata-only, skipped
            else:
                hit = templates.get((sid, set_id))
                if hit is None:
                    continue  # no/uncompilable template → records drop
                dt, known = hit
                n = len(body) // dt.itemsize
                if n == 0:
                    continue
                recs = np.frombuffer(body[:n * dt.itemsize], dt)
                cols["exporter"].extend([exporter] * n)
                cols["template_id"].extend([set_id] * n)
                cols["rec_idx"].extend(range(n))
                for k in _HEADER_OUT:
                    cols[k].extend([hdr[k]] * n)
                kset = set(known)
                for c in _KNOWN_COLS:
                    if c in kset:
                        cols[c].extend(recs[c].astype("int64"))
                    else:
                        cols[c].extend([None] * n)
    return cols


def parse_netflow_v9(df: DataFrame, packet_col: str = "packet",
                     exporter_col: str = "exporter",
                     seq_col: str = "recv_seq") -> DataFrame:
    """Batch decode: one row per flow record. Packets shuffle once on
    the exporter (the session key); ``seq_col`` restores arrival
    order inside each session so templates precede the records they
    describe, whatever partition the packets came from."""

    def decode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        exporter = str(pdf[exporter_col].iloc[0])
        cols = _decode_packets(exporter, pdf[packet_col], {})
        return pd.DataFrame(cols).astype(
            {c: "object" for c in _KNOWN_COLS})

    return df.groupBy(exporter_col).applyInPandas(
        decode_group, schema=PARSED_V9_SCHEMA)


def stream_netflow_v9(df: DataFrame, packet_col: str = "packet",
                      exporter_col: str = "exporter",
                      seq_col: str = "recv_seq",
                      timeout: str = "NoTimeout") -> DataFrame:
    """Streaming decode with the reference's LONG-LIVED session map
    (session.go:119-136): state per exporter is the pickled template
    dict, so a template announced in one micro-batch decodes records
    in every later one. Use on a streaming frame of
    (exporter, recv_seq, packet)."""
    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        if state.exists:
            (blob,) = state.get
            templates = pickle.loads(bytes(blob))
        else:
            templates = {}
        frames = [p for p in pdfs]
        pdf = (pd.concat(frames).sort_values(seq_col)
               if frames else pd.DataFrame(
                   {packet_col: [], seq_col: []}))
        cols = _decode_packets(key[0], pdf[packet_col], templates)
        state.update((pickle.dumps(templates),))
        yield pd.DataFrame(cols).astype(
            {c: "object" for c in _KNOWN_COLS})

    return df.groupBy(exporter_col).applyInPandasWithState(
        fn,
        outputStructType=PARSED_V9_SCHEMA,
        stateStructType="templates binary",
        outputMode="append",
        timeoutConf=timeout,
    )


def _encode_batches(flows: DataFrame, packet_key: str, rec_idx: str,
                    build) -> DataFrame:
    """Shared packet-assembly harness for every encoder: ONE hash
    shuffle on ``packet_key`` co-locates each packet's rows,
    ``sortWithinPartitions`` makes packets contiguous and their
    records ordered, and a mapInPandas generator walks Arrow batches
    carrying the (possibly split) LAST packet of each batch into the
    next — so ``build`` always sees whole packets, whatever the
    batch boundaries. ``build(pdf, starts, ends)`` turns one batch of
    complete packets (slice boundaries precomputed) into the
    (exporter, recv_seq, packet) frame. ~5× over per-group
    applyInPandas: no per-packet pandas frame, just byte slices."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf[packet_key].iloc[-1]
            split_mask = (pdf[packet_key] == last).to_numpy()
            carry = pdf[split_mask]
            emit = pdf[~split_mask]
            if len(emit):
                yield build(emit)
        if carry is not None and len(carry):
            yield build(carry)

    arranged = (flows.repartition(F.col(packet_key))
                .sortWithinPartitions(packet_key, rec_idx))
    return arranged.mapInPandas(
        gen, schema="exporter string, recv_seq long, packet binary")


def _packet_bounds(pdf: pd.DataFrame, packet_key: str):
    pids = pdf[packet_key].to_numpy()
    starts = np.flatnonzero(np.r_[True, pids[1:] != pids[:-1]])
    ends = np.r_[starts[1:], len(pids)]
    return starts, ends


def encode_template_flowset(
        templates: list[tuple[int, list[tuple[int, int]]]]) -> bytes:
    """Template flowset (set 0) from [(template_id, [(type, len)])]."""
    body = b""
    for tid, fields in templates:
        body += tid.to_bytes(2, "big") + len(fields).to_bytes(2, "big")
        for ftype, flen in fields:
            body += ftype.to_bytes(2, "big") + flen.to_bytes(2, "big")
    return (0).to_bytes(2, "big") + (4 + len(body)).to_bytes(2, "big") \
        + body


def encode_netflow_v9(flows: DataFrame,
                      template: list[tuple[int, int]],
                      template_id: int = 256,
                      packet_key: str = "packet_id",
                      rec_idx: str = "rec_idx",
                      exporter_col: str = "exporter",
                      template_flag: str = "send_template") -> DataFrame:
    """Inverse direction (round-trip certification + capture-replay
    fixtures): group flow rows into v9 packets. A packet carries the
    template flowset IFF its ``template_flag`` column is true — so a
    fixture can model the real exporter behavior of announcing the
    template once (or periodically) and then sending data-only
    packets that are undecodable without session state."""
    dt, known = compile_template(template)
    if len(known) != len(template):
        raise ValueError("encode requires all-known template fields")
    tset = encode_template_flowset([(template_id, template)])
    tid_b = template_id.to_bytes(2, "big")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        starts, ends = _packet_bounds(pdf, packet_key)
        r = np.zeros(len(pdf), dt)
        for c in known:
            r[c] = pdf[c].to_numpy(dtype="int64")
        rb = r.tobytes()
        sz = dt.itemsize
        tmpl = pdf[template_flag].to_numpy(dtype=bool)[starts]
        hs = np.zeros(len(starts), V9_HEADER_DT)
        hs["version"] = 9
        for k in ["sys_uptime", "unix_secs", "package_sequence",
                  "source_id"]:
            hs[k] = pdf[k].to_numpy(dtype="int64")[starts]
        hs["count"] = (ends - starts) + tmpl
        hb = hs.tobytes()
        hsz = V9_HEADER_DT.itemsize
        packets = []
        for i in range(len(starts)):
            body = rb[starts[i] * sz:ends[i] * sz]
            pad = (-len(body)) % 4
            packets.append(
                hb[i * hsz:(i + 1) * hsz]
                + (tset if tmpl[i] else b"")
                + tid_b + (4 + len(body) + pad).to_bytes(2, "big")
                + body + b"\x00" * pad)
        return pd.DataFrame({
            "exporter": pdf[exporter_col].to_numpy(object)[starts],
            "recv_seq": pdf[packet_key].to_numpy(dtype="int64")[starts],
            "packet": packets,
        })

    return _encode_batches(flows, packet_key, rec_idx, build)


def encode_ipfix(flows: DataFrame,
                 template: list[tuple[int, int]],
                 template_id: int = 256,
                 packet_key: str = "packet_id",
                 rec_idx: str = "rec_idx",
                 exporter_col: str = "exporter",
                 template_flag: str = "send_template") -> DataFrame:
    """IPFIX (v10) message encoder — same contract as
    :func:`encode_netflow_v9` but the RFC 7011 header (16 bytes,
    ``length`` = whole message in bytes, export_time / sequence /
    observation_domain_id taken from the ``unix_secs`` /
    ``package_sequence`` / ``source_id`` columns) and template set
    id 2. Decode with the same :func:`parse_netflow_v9` (it
    dispatches per packet on the version word)."""
    dt, known = compile_template(template)
    if len(known) != len(template):
        raise ValueError("encode requires all-known template fields")
    t0 = encode_template_flowset([(template_id, template)])
    tset = (2).to_bytes(2, "big") + t0[2:]  # set id 0 → 2
    tid_b = template_id.to_bytes(2, "big")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        starts, ends = _packet_bounds(pdf, packet_key)
        r = np.zeros(len(pdf), dt)
        for c in known:
            r[c] = pdf[c].to_numpy(dtype="int64")
        rb = r.tobytes()
        sz = dt.itemsize
        tmpl = pdf[template_flag].to_numpy(dtype=bool)[starts]
        hs = np.zeros(len(starts), IPFIX_HEADER_DT)
        hs["version"] = 10
        hs["export_time"] = pdf["unix_secs"].to_numpy("int64")[starts]
        hs["sequence"] = pdf["package_sequence"].to_numpy(
            "int64")[starts]
        hs["observation_domain_id"] = pdf["source_id"].to_numpy(
            "int64")[starts]
        packets = []
        for i in range(len(starts)):
            body = rb[starts[i] * sz:ends[i] * sz]
            pad = (-len(body)) % 4
            sets = ((tset if tmpl[i] else b"")
                    + tid_b + (4 + len(body) + pad).to_bytes(2, "big")
                    + body + b"\x00" * pad)
            h = hs[i:i + 1].copy()
            h["length"] = 16 + len(sets)
            packets.append(h.tobytes() + sets)
        return pd.DataFrame({
            "exporter": pdf[exporter_col].to_numpy(object)[starts],
            "recv_seq": pdf[packet_key].to_numpy(dtype="int64")[starts],
            "packet": packets,
        })

    return _encode_batches(flows, packet_key, rec_idx, build)


#: IPFIX decode is the same session machinery — the parser dispatches
#: on each packet's version word, so mixed v9/IPFIX capture works.
parse_ipfix = parse_netflow_v9
stream_ipfix = stream_netflow_v9
