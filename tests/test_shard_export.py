"""Binary token-shard export: round-trip token-array equality (the
north rule's per-row invariant), layout determinism across partition
counts, overflow guarding, and manifest commit semantics."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from beats_spark.corpus import shard_export as se
from beats_spark.corpus import tokens as toks


def _input(spark, n=60):
    data = [
        (f"doc{i:03d}", [(i * 7 + j) % 50257 for j in range(1 + (i * 13) % 9)])
        for i in range(n)
    ]
    return spark.createDataFrame(data, "doc_id string, tokens array<int>")


def _sharded(spark, n=60, n_shards=4):
    return toks.shuffle_shards(_input(spark, n), n_shards=n_shards)


def test_round_trip_token_equality(spark, tmp_path):
    sh = _sharded(spark)
    out = str(tmp_path / "exp")
    stats = se.export_token_shards(
        sh, out, shard_col="shard", order_cols=("sort_key", "doc_id")
    )
    se.write_manifest(stats, out, dtype="uint16")

    back = se.read_token_shards(spark, out).collect()
    expect = sh.orderBy("shard", "sort_key", "doc_id").collect()
    # seq_idx is the within-shard rank under the export's order_cols
    by_key = {(r["shard"], r["seq_idx"]): list(r["tokens"]) for r in back}
    rank: dict[int, int] = {}
    assert len(back) == len(expect)
    for r in expect:
        i = rank.get(r["shard"], 0)
        rank[r["shard"]] = i + 1
        assert by_key[(r["shard"], i)] == list(r["tokens"]), (r["doc_id"], i)


def test_stats_match_input_aggregates(spark, tmp_path):
    sh = _sharded(spark)
    out = str(tmp_path / "exp")
    stats = se.export_token_shards(
        sh, out, shard_col="shard", order_cols=("sort_key", "doc_id")
    ).collect()
    ref = {
        r["shard"]: r
        for r in sh.select(
            "shard", F.explode("tokens").alias("t")
        )
        .groupBy("shard")
        .agg(
            F.count("t").alias("n_tokens"),
            F.sum("t").alias("token_sum"),
            F.min("t").alias("token_min"),
            F.max("t").alias("token_max"),
        )
        .collect()
    }
    n_seqs = {
        r["shard"]: r["n"]
        for r in sh.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert {r["shard"] for r in stats} == set(ref)
    for r in stats:
        e = ref[r["shard"]]
        assert r["n_seqs"] == n_seqs[r["shard"]]
        assert r["n_tokens"] == e["n_tokens"]
        assert r["n_bytes"] == e["n_tokens"] * 2
        assert r["token_sum"] == e["token_sum"]
        assert (r["token_min"], r["token_max"]) == (e["token_min"], e["token_max"])


def test_bytes_deterministic_across_partition_layouts(spark, tmp_path):
    sh = _sharded(spark)
    files = {}
    for tag, parts in (("a", 1), ("b", 7)):
        out = str(tmp_path / tag)
        stats = se.export_token_shards(
            sh.repartition(parts),
            out,
            shard_col="shard",
            order_cols=("sort_key", "doc_id"),
        )
        se.write_manifest(stats, out, dtype="uint16")
        files[tag] = {
            f: open(os.path.join(out, f), "rb").read()
            for f in sorted(os.listdir(out))
            if not f.endswith(".tmp")
        }
    assert files["a"] == files["b"]


def test_idx_layout_and_bin_size(spark, tmp_path):
    out = str(tmp_path / "exp")
    stats = {
        r["shard"]: r
        for r in se.export_token_shards(
            _sharded(spark), out, shard_col="shard",
            order_cols=("sort_key", "doc_id"),
        ).collect()
    }
    for shard, r in stats.items():
        base = os.path.join(out, f"shard-{shard:05d}")
        assert os.path.getsize(base + ".bin") == r["n_bytes"]
        hdr = np.frombuffer(open(base + ".idx", "rb").read(), dtype="<i8")
        n = int(hdr[0])
        counts, offs = hdr[1 : 1 + n], hdr[1 + n : 1 + 2 * n]
        assert n == r["n_seqs"] and counts.sum() == r["n_tokens"]
        assert offs[0] == 0 and np.all(np.diff(offs) == counts[:-1])


def test_overflow_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", [1, 70000])], "doc_id string, tokens array<int>"
    ).withColumn("shard", F.lit(0))
    stats = se.export_token_shards(
        df, str(tmp_path / "exp"), shard_col="shard", order_cols=("doc_id",)
    )
    with pytest.raises(Exception, match="out of range"):
        stats.collect()
    # uint32 takes the same ids fine
    ok = se.export_token_shards(
        df, str(tmp_path / "exp32"), shard_col="shard",
        order_cols=("doc_id",), dtype="uint32",
    ).collect()
    assert ok[0]["token_max"] == 70000 and ok[0]["n_bytes"] == 8


def test_empty_token_arrays_and_manifest(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", []), ("d2", []), ("d3", [5, 6])],
        "doc_id string, tokens array<int>",
    ).withColumn(
        "shard", F.when(F.col("doc_id") == "d3", 1).otherwise(0)
    )
    out = str(tmp_path / "exp")
    stats = se.export_token_shards(
        df, out, shard_col="shard", order_cols=("doc_id",)
    )
    man = se.write_manifest(stats, out, dtype="uint16")
    by = {s["shard"]: s for s in man["shards"]}
    assert by[0]["n_seqs"] == 2 and by[0]["n_tokens"] == 0
    assert by[0]["token_min"] is None and by[0]["token_max"] is None
    assert os.path.getsize(os.path.join(out, "shard-00000.bin")) == 0
    assert man["n_seqs"] == 3 and man["n_tokens"] == 2 and man["n_bytes"] == 4
    disk = json.load(open(os.path.join(out, "manifest.json")))
    assert disk["n_tokens"] == 2 and disk["dtype"] == "uint16"
    # empty shard still round-trips: two empty sequences come back
    back = se.read_token_shards(spark, out).collect()
    got = sorted((r["shard"], r["seq_idx"], list(r["tokens"])) for r in back)
    assert got == [(0, 0, []), (0, 1, []), (1, 0, [5, 6])]


def test_rerun_is_idempotent(spark, tmp_path):
    sh = _sharded(spark, n=20, n_shards=2)
    out = str(tmp_path / "exp")
    kw = dict(shard_col="shard", order_cols=("sort_key", "doc_id"))
    se.export_token_shards(sh, out, **kw).collect()
    first = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out)) if not f.endswith(".tmp")
    }
    se.export_token_shards(sh, out, **kw).collect()
    second = {
        f: open(os.path.join(out, f), "rb").read()
        for f in sorted(os.listdir(out)) if not f.endswith(".tmp")
    }
    assert first == second
