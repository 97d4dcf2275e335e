"""Snapshot-log table format: the Iceberg-commit-protocol stand-in.

The north rule's sinks are Iceberg tables; without the runtime jar the
repo's sinks are partitioned parquet with dynamic-overwrite idempotency
(``routing.fanout_write``). This module adds the part of Iceberg that
layout alone cannot give: **atomic snapshot commits** with readers that
only ever see fully-committed data, plus time travel and an append /
overwrite / replace-partitions write contract — the same guarantees at
the same (tiny) metadata granularity, so swapping in real Iceberg is a
config change, not a semantics change.

Layout under the table root::

    data/<commit_id>/part-*.parquet    -- immutable once written
    snapshots/<n>.json                 -- manifest: ordered data dirs
    LATEST                             -- current snapshot number

Commit protocol (reference: Iceberg's snapshot commit — the spec's
atomic metadata swap; also ``libbeat``'s registrar ordering, write THEN
ack):

1. write the batch's parquet files under a fresh ``data/<commit_id>/``
   directory — invisible: no manifest references it yet;
2. write ``snapshots/<n>.json`` listing the new visible set (previous
   dirs ± this commit's change);
3. atomically flip ``LATEST`` to ``n`` (POSIX rename; on an object
   store the same single-pointer swap is the catalog's
   compare-and-swap).

A crash before (3) leaves the table at the previous snapshot with some
orphaned-but-invisible data files (Iceberg's behavior exactly; see
``expire_orphans``). Re-committing the same ``commit_id`` replaces that
commit's directory — retried batches stay idempotent like
``fanout_write``'s run_id contract.

Readers (``read``) resolve a snapshot's manifest ONCE on the driver
(one tiny JSON), then hand Spark the concrete directory list — no
executor-side metadata I/O, and ongoing commits never tear a running
scan (the file set is pinned at plan build, Iceberg's snapshot
isolation).

Scale: a manifest lists data DIRECTORIES (one per commit), not files —
O(commits) bytes, not O(files); file-level pruning stays Spark's job
via partition/parquet statistics. Metadata ops are driver-side only
and millisecond-cheap at any data scale.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Minimal snapshot-log table over parquet (see module docstring)."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.snap_dir = os.path.join(path, "snapshots")
        self.latest_ptr = os.path.join(path, "LATEST")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- metadata ------------------------------------------------------------

    def latest_snapshot(self) -> int | None:
        try:
            with open(self.latest_ptr) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _manifest(self, snapshot: int) -> dict:
        with open(os.path.join(self.snap_dir, f"{snapshot}.json")) as f:
            return json.load(f)

    def snapshots(self) -> list[int]:
        """All committed snapshot ids, oldest first (only ids at or
        below LATEST count as committed — a crash can leave a higher
        manifest file that never got the pointer flip)."""
        latest = self.latest_snapshot()
        if latest is None:
            return []
        ids = sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.snap_dir)
            if f.endswith(".json")
        )
        return [i for i in ids if i <= latest]

    def history(self) -> list[dict]:
        """Commit log: one dict per committed snapshot (id, operation,
        commit_id, dir count) — the audit/debug view."""
        out = []
        for s in self.snapshots():
            m = self._manifest(s)
            out.append(
                {
                    "snapshot": s,
                    "operation": m["operation"],
                    "commit_id": m["commit_id"],
                    "n_dirs": len(m["dirs"]),
                }
            )
        return out

    # -- write side ----------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        commit_id: str,
        mode: str = "append",
        partition_by: list[str] | None = None,
        replace_where: str | None = None,
    ) -> int:
        """Write ``df`` as one atomic snapshot commit; returns the new
        snapshot id.

        Modes: ``append`` adds this commit's directory to the visible
        set; ``overwrite`` makes it the ONLY visible directory (full
        replace); ``replace_partitions`` (requires ``partition_by``)
        drops prior dirs' rows matching this commit's partitions at
        READ time via the manifest's recorded partition values — here
        we implement the simpler, equally-atomic form: re-append with
        the commit carrying a ``replace_where`` predicate that readers
        apply to OLDER dirs (dynamic-overwrite semantics without
        rewriting history).

        Re-running the same ``commit_id`` replaces that commit's data
        directory before manifesting — retried batches are idempotent.
        """
        if mode not in ("append", "overwrite", "replace_partitions"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "replace_partitions" and not replace_where:
            raise ValueError("replace_partitions requires replace_where")
        cdir = os.path.join(self.data_dir, commit_id)
        if os.path.exists(cdir):
            shutil.rmtree(cdir)  # retried commit: replace own files only
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode("overwrite").parquet(cdir)

        latest = self.latest_snapshot()
        if latest is None or mode == "overwrite":
            dirs: list[dict] = []
        else:
            dirs = list(self._manifest(latest)["dirs"])
        # a retried commit_id must not appear twice in the visible set
        dirs = [d for d in dirs if d["commit_id"] != commit_id]
        dirs.append(
            {
                "commit_id": commit_id,
                "path": cdir,
                "replace_where": replace_where,
            }
        )
        snap = (latest or 0) + 1
        manifest = {
            "snapshot": snap,
            "operation": mode,
            "commit_id": commit_id,
            "dirs": dirs,
        }
        mpath = os.path.join(self.snap_dir, f"{snap}.json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mpath + ".tmp", mpath)
        # the atomic visibility flip
        with open(self.latest_ptr + ".tmp", "w") as f:
            f.write(str(snap))
        os.replace(self.latest_ptr + ".tmp", self.latest_ptr)
        return snap

    # -- read side -----------------------------------------------------------

    def read(self, spark: SparkSession, snapshot: int | None = None) -> DataFrame:
        """One DataFrame over the snapshot's visible set (default:
        LATEST) — time travel by passing an older snapshot id. The
        directory list is pinned at plan build: concurrent commits
        never change a running scan."""
        latest = self.latest_snapshot()
        if latest is None:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        snap = latest if snapshot is None else snapshot
        if snapshot is not None and snapshot not in self.snapshots():
            raise FileNotFoundError(f"{self.path}: no snapshot {snapshot}")
        m = self._manifest(snap)
        dirs = m["dirs"]
        out = None
        for i, d in enumerate(dirs):
            part = spark.read.parquet(d["path"])
            # later replace_partitions commits mask matching rows in
            # every OLDER directory (dynamic-overwrite read semantics)
            for newer in dirs[i + 1:]:
                if newer.get("replace_where"):
                    part = part.filter(f"NOT ({newer['replace_where']})")
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    # -- maintenance ---------------------------------------------------------

    def expire_orphans(self) -> list[str]:
        """Delete data directories no committed snapshot references —
        the cleanup for crashes between data write and pointer flip
        (Iceberg's orphan-file removal). Never touches a referenced
        dir, so it is safe to run concurrently with readers of any
        committed snapshot."""
        referenced = {
            d["path"]
            for s in self.snapshots()
            for d in self._manifest(s)["dirs"]
        }
        removed = []
        for name in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, name)
            if p not in referenced:
                shutil.rmtree(p)
                removed.append(p)
        return removed
