"""Binary token-shard export — the trainer-facing sink of the corpus
pipeline.

Writes packed token sequences into the flat two-file-per-shard layout a
training data loader memory-maps (the public GPT-2 / Megatron-LM
``.bin`` + ``.idx`` convention, re-derived here from its published
description — NOT a copy of any loader code):

- ``<prefix>-NNNNN.bin`` — every sequence's token ids back to back, one
  fixed little-endian unsigned dtype (``uint16`` for vocabs < 65536,
  else ``uint32``);
- ``<prefix>-NNNNN.idx`` — little-endian int64 array laid out as
  ``[n_seqs, count_0..count_{n-1}, offset_0..offset_{n-1}]`` where
  offsets are in TOKENS from the start of the ``.bin``;
- ``manifest.json`` — per-shard row/token/byte counts and checksums,
  written LAST by :func:`write_manifest` so a half-finished job is
  never picked up (the commit point — same contract as
  ``routing.fanout_write``'s run_id idempotency).

Reference analogue: the file output
(``libbeat/outputs/fileout/file.go``) — the sink that makes pipeline
results durable on disk; here the payload is the pre-tokenized
training-sequence table of the north rule instead of NDJSON lines.

Scale notes (the 10^12-sequence layout):

- One shard is written by exactly ONE task: ``repartition(shard)``
  hash-partitions so all of a shard's rows land together, and
  ``sortWithinPartitions(shard, *order_cols)`` makes each shard a
  contiguous, deterministically-ordered run inside its partition. The
  writer streams token bytes to the ``.bin`` as Arrow batches arrive —
  it never holds a shard's tokens in memory; only the int64 per-shard
  count/offset index accumulates (8 bytes/sequence — pick ``n_shards``
  so a shard holds ~10^6-10^7 sequences).
- Files land via write-to-temp + ``os.replace``: a speculative or
  retried task rewrites byte-identical content (the order is a total
  order when ``order_cols`` is a per-shard unique key — REQUIRED), so
  re-runs are idempotent. ``out_dir`` must be a filesystem every
  executor can reach (shared FS / fuse-mounted object store; in
  local[*] any path works).
- The stats DataFrame this returns is the export's ONLY plan output —
  #shards rows — so the triggering action is cheap and the numbers
  feed ``manifest.json`` and the DuckDB oracle without a second scan.

:func:`read_token_shards` is the audit/verification path (whole shard
files through ``binaryFile`` rows); production loaders mmap the
``.bin`` directly and never go through Spark.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {"uint16": np.dtype("<u2"), "uint32": np.dtype("<u4")}

_STATS_SCHEMA = (
    "shard int, n_seqs long, n_tokens long, n_bytes long, "
    "token_sum long, token_min long, token_max long"
)


def _atomic_write(out_dir: str, final_name: str, payload: bytes) -> None:
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, final_name))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def export_token_shards(
    df: DataFrame,
    out_dir: str,
    tokens_col: str = "tokens",
    shard_col: str = "shard",
    order_cols: Sequence[str] = ("doc_id",),
    dtype: str = "uint16",
    prefix: str = "shard",
) -> DataFrame:
    """Write one ``.bin`` + ``.idx`` pair per distinct ``shard_col``
    value under ``out_dir``; return the per-shard stats DataFrame
    (shard, n_seqs, n_tokens, n_bytes, token_sum, token_min,
    token_max) whose evaluation triggers the write.

    ``order_cols`` must totally order rows within a shard (a unique
    key) — that is what makes the file bytes independent of partition
    count, cluster size, and retries. Token ids outside
    ``[0, iinfo(dtype).max]`` raise rather than silently truncate.
    """
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    dt = _DTYPES[dtype]
    limit = int(np.iinfo(dt).max)
    os.makedirs(out_dir, exist_ok=True)

    cols = list(dict.fromkeys([shard_col, tokens_col, *order_cols]))
    src = (
        df.select(*cols)
        .repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, *order_cols)
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur: dict | None = None

        def close(c: dict) -> pd.DataFrame:
            c["fh"].close()
            counts = np.asarray(c["counts"], dtype="<i8")
            offs = np.zeros(len(counts), dtype="<i8")
            if len(counts) > 1:
                offs[1:] = np.cumsum(counts[:-1])
            idx = (
                np.asarray([len(counts)], dtype="<i8").tobytes()
                + counts.tobytes()
                + offs.tobytes()
            )
            base = f"{prefix}-{c['shard']:05d}"
            os.replace(c["tmp"], os.path.join(out_dir, base + ".bin"))
            _atomic_write(out_dir, base + ".idx", idx)
            n_tok = int(counts.sum()) if len(counts) else 0
            return pd.DataFrame(
                [
                    {
                        "shard": c["shard"],
                        "n_seqs": len(counts),
                        "n_tokens": n_tok,
                        "n_bytes": n_tok * dt.itemsize,
                        "token_sum": c["sum"],
                        "token_min": c["min"] if c["min"] is not None else None,
                        "token_max": c["max"] if c["max"] is not None else None,
                    }
                ]
            ).astype({"shard": "int32"})

        def open_shard(shard: int) -> dict:
            fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
            return {
                "shard": int(shard),
                "fh": os.fdopen(fd, "wb"),
                "tmp": tmp,
                "counts": [],
                "sum": 0,
                "min": None,
                "max": None,
            }

        for pdf in batches:
            if not len(pdf):
                continue
            shards = pdf[shard_col].to_numpy()
            arrs = pdf[tokens_col].to_numpy(object)
            bounds = np.flatnonzero(np.diff(shards)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(pdf)]))
            for s, e in zip(starts, ends):
                shard = int(shards[s])
                if cur is not None and cur["shard"] != shard:
                    yield close(cur)
                    cur = None
                if cur is None:
                    cur = open_shard(shard)
                chunk = arrs[s:e]
                lens = np.fromiter(
                    (len(a) for a in chunk), dtype="<i8", count=len(chunk)
                )
                cur["counts"].extend(lens.tolist())
                flat = (
                    np.concatenate([np.asarray(a) for a in chunk])
                    if lens.sum()
                    else np.empty(0, dtype="int64")
                ).astype("int64", copy=False)
                if len(flat):
                    lo, hi = int(flat.min()), int(flat.max())
                    if lo < 0 or hi > limit:
                        raise ValueError(
                            f"token id out of range for {dtype} in shard "
                            f"{shard}: min={lo} max={hi} limit={limit}"
                        )
                    cur["sum"] += int(flat.sum())
                    cur["min"] = lo if cur["min"] is None else min(cur["min"], lo)
                    cur["max"] = hi if cur["max"] is None else max(cur["max"], hi)
                    cur["fh"].write(flat.astype(dt).tobytes())
        if cur is not None:
            yield close(cur)

    return src.mapInPandas(run, schema=_STATS_SCHEMA)


def write_manifest(
    stats_df: DataFrame, out_dir: str, dtype: str, prefix: str = "shard"
) -> dict:
    """Collect the (#shards-sized) stats and commit ``manifest.json``
    atomically — the presence of the manifest IS the export's commit
    marker; readers must ignore directories without one."""
    rows = sorted(
        (r.asDict() for r in stats_df.collect()), key=lambda r: r["shard"]
    )
    man = {
        "dtype": dtype,
        "prefix": prefix,
        "n_shards": len(rows),
        "n_seqs": sum(r["n_seqs"] for r in rows),
        "n_tokens": sum(r["n_tokens"] for r in rows),
        "n_bytes": sum(r["n_bytes"] for r in rows),
        "shards": rows,
    }
    _atomic_write(out_dir, "manifest.json", json.dumps(man, indent=1).encode())
    return man


def read_token_shards(
    spark: SparkSession,
    out_dir: str,
    dtype: str = "uint16",
    prefix: str = "shard",
) -> DataFrame:
    """Audit-path reader: decode every shard back to
    (shard, seq_idx, tokens array<int>) rows via ``binaryFile`` —
    round-trip equality against the export input is the north rule's
    per-row token-array invariant, checked in tests/test_shard_export.
    One whole shard file per Spark row: verification only; trainers
    mmap the ``.bin`` directly."""
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}")
    dt = _DTYPES[dtype]

    def part(suffix: str, alias: str) -> DataFrame:
        return (
            spark.read.format("binaryFile")
            .load(os.path.join(out_dir, f"{prefix}-*.{suffix}"))
            .select(
                F.regexp_extract(F.col("path"), r"-(\d+)\." + suffix + "$", 1)
                .cast("int")
                .alias("shard"),
                F.col("content").alias(alias),
            )
        )

    # drive from the idx side: an all-empty-sequence shard has a
    # zero-byte .bin, which Spark's binaryFile source silently skips —
    # the .idx always carries at least its n_seqs header.
    joined = (
        part("idx", "idx")
        .join(part("bin", "bin"), "shard", "left")
        .withColumn("bin", F.coalesce("bin", F.lit(b"")))
    )

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_shard: list[int] = []
            out_idx: list[int] = []
            out_toks: list[list[int]] = []
            for shard, bb, ib in zip(pdf["shard"], pdf["bin"], pdf["idx"]):
                hdr = np.frombuffer(ib, dtype="<i8")
                n = int(hdr[0])
                counts = hdr[1 : 1 + n]
                offs = hdr[1 + n : 1 + 2 * n]
                toks = np.frombuffer(bb, dtype=dt).astype("int32")
                for i in range(n):
                    out_shard.append(int(shard))
                    out_idx.append(i)
                    out_toks.append(
                        toks[offs[i] : offs[i] + counts[i]].tolist()
                    )
            yield pd.DataFrame(
                {"shard": out_shard, "seq_idx": out_idx, "tokens": out_toks}
            )

    return joined.mapInPandas(
        decode, schema="shard int, seq_idx long, tokens array<int>"
    )
