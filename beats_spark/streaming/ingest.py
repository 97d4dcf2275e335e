"""Streaming corpus ingestion with cross-batch near-dup suppression.

The operational 100 TB shape of ``corpus.dedup.incremental_neardup``
(`dedup.py` keeps the algorithm; this module keeps the STATE): a live
document stream lands micro-batch by micro-batch, each batch checked
against everything already admitted — exact fingerprints plus
one-sided MinHash-LSH — and the admitted corpus AND its dedup index
both persist as snapshot-log tables (`snapshots.SnapshotTable`), so

- the existing side is never re-signed: the index table stores the
  ``(doc_id, fp, band, band_key, sig)`` rows the docstring of
  ``incremental_neardup`` says production precomputes — per-batch cost
  is |batch|·bands joins against an equi-keyed index, never O(corpus);
- batch commits are atomic and keyed by batch id, so a foreachBatch
  replay after restart re-commits ITS OWN batch idempotently — the
  replay reads the index WITH ITS OWN COMMIT EXCLUDED
  (``read(exclude_commit_id=...)``), otherwise every replayed row
  would self-match and vanish;
- corpus and index commit separately (two tables cannot flip one
  pointer): a crash between the two leaves the corpus committed and
  the index not, and the replay recomputes the identical survivor set
  (its decisions never read the corpus table) and repairs both.

Within a batch, exact dups resolve keep-min-id and near-dup pairs
resolve keep-min-id via the band self-join — so a batch containing its
own near-dups admits one representative, and later batches dedup
against that representative through the index.

Replay after the index has been COMPACTED (batch dirs folded into a
maintenance commit) degrades safely: the replayed batch's rows
self-match inside the compacted dir, the survivor set comes back
empty, and the batch body returns without committing — the original
commits already hold its rows, so nothing is lost or duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from beats_spark.corpus.dedup import _band_keys, minhash_signatures


class StreamingCorpusIngest:
    """foreachBatch driver: dedup each micro-batch against the
    accumulated corpus, append survivors + their index rows."""

    def __init__(self, corpus_table, index_table, checkpoint_dir: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_hashes: int = 16, shingle_k: int = 3, bands: int = 4,
                 min_matches: int = 12, tokens_col: str | None = None):
        self.corpus = corpus_table
        self.index = index_table
        self.checkpoint_dir = checkpoint_dir
        self.id_col, self.text_col = id_col, text_col
        self.num_hashes, self.shingle_k = num_hashes, shingle_k
        self.bands, self.min_matches = bands, min_matches
        self.tokens_col = tokens_col

    # -- helpers ---------------------------------------------------------

    def _key(self):
        if self.tokens_col is not None:
            return F.array_join(
                F.col(self.tokens_col).cast("array<string>"), " "
            )
        return F.col(self.text_col)

    def _matches(self, a: str, b: str):
        return F.size(
            F.filter(F.zip_with(a, b, lambda x, y: x == y), lambda eq: eq)
        )

    def _read_index(self, spark, exclude_commit_id: str):
        try:
            return self.index.read(
                spark, exclude_commit_id=exclude_commit_id
            )
        except FileNotFoundError:  # first batch ever
            return None

    # -- the batch body ----------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cid = f"b{batch_id:012d}"
        idc = self.id_col
        b = batch_df.withColumn("_fp", F.md5(self._key())).persist()
        try:
            # within-batch exact: keep-min-id per fingerprint
            wmin = b.groupBy("_fp").agg(F.min(idc).alias("_keep"))
            b1 = b.join(wmin, "_fp").filter(F.col(idc) == F.col("_keep")).drop(
                "_keep"
            )
            sigs = minhash_signatures(
                b1, idc, self.text_col, self.num_hashes, self.shingle_k,
                tokens_col=self.tokens_col,
            )
            nb = _band_keys(sigs, self.num_hashes, self.bands)
            # within-batch near: band self-join, keep-min-id
            near_self = (
                nb.alias("n")
                .join(nb.alias("e"), ["band", "band_key"])
                .filter(F.col("n.doc_id") > F.col("e.doc_id"))
                .select(
                    F.col("n.doc_id").alias("doc_id"),
                    F.col("n.sig").alias("sig_n"),
                    F.col("e.sig").alias("sig_e"),
                )
                .filter(self._matches("sig_n", "sig_e") >= self.min_matches)
                .select("doc_id")
                .distinct()
            )
            b2 = b1.join(
                near_self, b1[idc] == near_self["doc_id"], "left_anti"
            )
            nb2 = nb.join(
                b2.select(F.col(idc).alias("doc_id")), "doc_id", "left_semi"
            )
            # vs the persistent index (own commit excluded for replays)
            idx = self._read_index(spark, exclude_commit_id=cid)
            if idx is not None:
                efp = (
                    idx.filter(F.col("band") == -1)
                    .groupBy("fp")
                    .agg(F.min("doc_id").alias("_eid"))
                )
                b2 = b2.join(
                    efp, b2["_fp"] == efp["fp"], "left_anti"
                )
                eb = idx.filter(F.col("band") >= 0).select(
                    F.col("doc_id").alias("e_id"), "band", "band_key",
                    F.col("sig").alias("sig_e"),
                )
                near_idx = (
                    nb2.join(eb, ["band", "band_key"])
                    .select("doc_id", F.col("sig").alias("sig_n"), "sig_e")
                    .filter(
                        self._matches("sig_n", "sig_e") >= self.min_matches
                    )
                    .select("doc_id")
                    .distinct()
                )
                b2 = b2.join(
                    near_idx, b2[idc] == near_idx["doc_id"], "left_anti"
                )
            b2 = b2.persist()
            try:
                if b2.count() == 0:
                    return
                self.corpus.commit(b2.drop("_fp"), commit_id=cid)
                sids = b2.select(F.col(idc).alias("doc_id"))
                fp_rows = b2.select(
                    F.col(idc).alias("doc_id"), F.col("_fp").alias("fp"),
                    F.lit(-1).alias("band"),
                    F.lit(None).cast("string").alias("band_key"),
                    F.lit(None).cast("array<bigint>").alias("sig"),
                )
                band_rows = (
                    nb2.join(sids, "doc_id", "left_semi")
                    .select(
                        "doc_id",
                        F.lit(None).cast("string").alias("fp"),
                        "band", "band_key",
                        F.col("sig").cast("array<bigint>").alias("sig"),
                    )
                )
                self.index.commit(
                    fp_rows.unionByName(band_rows), commit_id=cid
                )
            finally:
                b2.unpersist()
        finally:
            b.unpersist()

    def start(self, stream_df: DataFrame,
              trigger: dict | None = None) -> StreamingQuery:
        return (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
