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

    data/<commit_id>[.rN]/part-*.parquet  -- immutable once written;
                                             NEVER rewritten or deleted
                                             while any committed
                                             snapshot references it
    snapshots/<n>.json                    -- manifest: dir names +
                                             parent snapshot id
    LATEST                                -- current snapshot number
    COMMIT_LOCK                           -- committer mutex (flock)

Commit protocol (reference: Iceberg's snapshot commit — the spec's
atomic metadata swap; also ``libbeat``'s registrar ordering, write THEN
ack):

1. write the batch's parquet files under a FRESH ``data/`` directory
   (``<commit_id>`` on the first attempt, ``<commit_id>.rN`` on
   retries) — invisible: no manifest references it yet, and no
   existing directory is ever touched;
2. under the committer lock: re-read LATEST, write
   ``snapshots/<n>.json`` listing the new visible set (previous dirs ±
   this commit's change) plus the parent snapshot id;
3. atomically flip ``LATEST`` to ``n`` (POSIX rename), still under the
   lock.

The flock serializes step 2-3 across concurrent committers on a shared
filesystem — each sees the other's manifest before choosing its own
snapshot id, so no acknowledged commit can be clobbered (Iceberg gets
the same guarantee from the catalog's compare-and-swap; swap the lock
for that CAS on an object store). The slow part — step 1's data write —
runs outside the lock.

A crash before (3) leaves the table at the previous snapshot with some
orphaned-but-invisible data files or manifests (Iceberg's behavior
exactly; see ``expire_orphans``). Committed snapshots are the PARENT
CHAIN from LATEST — a crashed manifest that never got the pointer flip
is not on the chain and never becomes visible.

Re-committing the same ``commit_id`` writes a NEW directory and
replaces that commit's entry in the new visible set — retried batches
stay idempotent like ``fanout_write``'s run_id contract, while older
snapshots keep referencing (and time-travel to) the original attempt's
directory untouched.

Readers (``read``) resolve a snapshot's manifest ONCE on the driver
(one tiny JSON), then hand Spark the concrete directory list — no
executor-side metadata I/O, and ongoing commits never tear a running
scan (the file set is pinned at plan build, Iceberg's snapshot
isolation).

Scale: a manifest lists data DIRECTORIES (one per commit), not files —
O(commits) bytes, not O(files); file-level pruning stays Spark's job
via partition/parquet statistics. Metadata ops are driver-side only
and millisecond-cheap at any data scale. Manifests store directory
NAMES, not paths — the table root can move (or be opened via a
different path spelling) without breaking reads or orphan cleanup.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """A concurrent commit flipped LATEST between a maintenance
    operation's pinned read and its pointer flip (Iceberg's commit
    validation failure) — retry against the new base."""


class SnapshotTable:
    """Minimal snapshot-log table over parquet (see module docstring)."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.snap_dir = os.path.join(path, "snapshots")
        self.latest_ptr = os.path.join(path, "LATEST")
        self.lock_path = os.path.join(path, "COMMIT_LOCK")
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

    def _manifest_ids(self) -> list[int]:
        """Every manifest file's id, committed or not (crashed commits
        leave manifests off the parent chain; their ids are still
        reserved so a later commit never reuses one)."""
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.snap_dir)
            if f.endswith(".json")
        )

    def snapshots(self) -> list[int]:
        """Committed snapshot ids, oldest first: the parent chain from
        LATEST. A manifest that never got the pointer flip (crash
        between manifest write and flip) is off the chain and does not
        count."""
        latest = self.latest_snapshot()
        if latest is None:
            return []
        chain = []
        cur: int | None = latest
        while cur is not None:
            chain.append(cur)
            cur = self._manifest(cur).get("parent")
        return chain[::-1]

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

    @contextlib.contextmanager
    def _commit_lock(self):
        fd = os.open(self.lock_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _fresh_dir_name(self, commit_id: str) -> str:
        """First unused ``<commit_id>`` / ``<commit_id>.rN`` name —
        a retry never rewrites a directory an earlier attempt produced
        (committed snapshots may still reference it)."""
        if not os.path.exists(os.path.join(self.data_dir, commit_id)):
            return commit_id
        n = 1
        while os.path.exists(os.path.join(self.data_dir, f"{commit_id}.r{n}")):
            n += 1
        return f"{commit_id}.r{n}"

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
        replace); ``replace_partitions`` (requires ``replace_where``)
        re-appends with a predicate that readers apply to OLDER dirs
        (dynamic-overwrite semantics without rewriting history).

        Re-running the same ``commit_id`` writes a fresh directory and
        replaces that commit's entry in the new visible set — retried
        batches are idempotent, and snapshots that referenced the
        earlier attempt still time-travel to its original rows.
        """
        if mode not in ("append", "overwrite", "replace_partitions"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "replace_partitions" and not replace_where:
            raise ValueError("replace_partitions requires replace_where")
        dname = self._fresh_dir_name(commit_id)
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode("overwrite").parquet(os.path.join(self.data_dir, dname))

        with self._commit_lock():
            latest = self.latest_snapshot()
            if latest is None or mode == "overwrite":
                dirs: list[dict] = []
            else:
                dirs = list(self._manifest(latest)["dirs"])
            # a retried commit_id must not appear twice in the visible
            # set — and it must keep its ORIGINAL position: read()'s
            # replace_where masking is ordered by this list, so
            # re-appending a retry would promote it past commits that
            # landed after the first attempt and mask their rows (a
            # retried replace_partitions batch would swallow newer
            # appends that match its predicate)
            entry = {
                "commit_id": commit_id,
                "dir": dname,
                "replace_where": replace_where,
            }
            idx = next(
                (i for i, d in enumerate(dirs)
                 if d["commit_id"] == commit_id),
                None,
            )
            if idx is None:
                dirs.append(entry)
            else:
                dirs[idx] = entry
            ids = self._manifest_ids()
            snap = (ids[-1] if ids else 0) + 1
            manifest = {
                "snapshot": snap,
                "parent": latest,
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

    def read(self, spark: SparkSession, snapshot: int | None = None,
             exclude_commit_id: str | None = None) -> DataFrame | None:
        """One DataFrame over the snapshot's visible set (default:
        LATEST) — time travel by passing an older committed snapshot
        id. The directory list is pinned at plan build: concurrent
        commits never change a running scan.

        ``exclude_commit_id`` drops that commit's directory from the
        visible set — the replay-idempotency hook: a foreachBatch
        retry that processes batch N against state must see the table
        WITHOUT batch N's own earlier (possibly partial) commit, or
        every row would self-match. Returns None when the visible set
        is empty after exclusion (caller treats as empty table)."""
        latest = self.latest_snapshot()
        if latest is None:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        snap = latest if snapshot is None else snapshot
        if snapshot is not None and snapshot not in self.snapshots():
            raise FileNotFoundError(f"{self.path}: no snapshot {snapshot}")
        m = self._manifest(snap)
        dirs = m["dirs"]
        if exclude_commit_id is not None:
            dirs = [d for d in dirs if d["commit_id"] != exclude_commit_id]
            if not dirs:
                return None
        out = None
        for i, d in enumerate(dirs):
            part = spark.read.parquet(os.path.join(self.data_dir, d["dir"]))
            # later replace_partitions commits mask matching rows in
            # every OLDER directory (dynamic-overwrite read semantics)
            for newer in dirs[i + 1:]:
                if newer.get("replace_where"):
                    part = part.filter(f"NOT ({newer['replace_where']})")
            out = part if out is None else out.unionByName(part)
        assert out is not None
        return out

    # -- maintenance ---------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        commit_id: str,
        partition_by: list[str] | None = None,
        min_dirs: int = 2,
        base_snapshot: int | None = None,
    ) -> int | None:
        """Rewrite the visible set as ONE directory (Iceberg's
        ``rewrite_data_files``): a long-lived append table accumulates
        one directory per batch, and every read pays the
        per-directory open + union + replace_where masking — compaction
        folds the net visible rows (masks applied) into a single
        parquet dir and commits it as a new snapshot. History is
        untouched: older snapshots still time-travel to the original
        directories, so orphan expiry (not compaction) reclaims space.

        Optimistic concurrency, Iceberg-style: the read pins
        ``base_snapshot`` (default: LATEST at call time); if another
        commit flips the pointer between that read and this commit,
        the table raises :class:`SnapshotConflict` INSTEAD of silently
        discarding the concurrent commit — callers retry on the new
        base. Returns the new snapshot id, or None when the visible
        set is already under ``min_dirs`` directories.
        """
        base = self.latest_snapshot() if base_snapshot is None else base_snapshot
        if base is None:
            raise FileNotFoundError(f"{self.path}: no committed snapshot")
        m = self._manifest(base)
        if len(m["dirs"]) < min_dirs:
            return None
        df = self.read(spark, base)
        dname = self._fresh_dir_name(commit_id)
        w = df.write
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.mode("overwrite").parquet(os.path.join(self.data_dir, dname))

        with self._commit_lock():
            if self.latest_snapshot() != base:
                raise SnapshotConflict(
                    f"{self.path}: snapshot {self.latest_snapshot()} "
                    f"committed since compaction read snapshot {base}; "
                    "retry against the new base"
                )
            ids = self._manifest_ids()
            snap = (ids[-1] if ids else 0) + 1
            manifest = {
                "snapshot": snap,
                "parent": base,
                "operation": "compact",
                "commit_id": commit_id,
                "dirs": [
                    {"commit_id": commit_id, "dir": dname,
                     "replace_where": None}
                ],
            }
            mpath = os.path.join(self.snap_dir, f"{snap}.json")
            with open(mpath + ".tmp", "w") as f:
                json.dump(manifest, f)
            os.replace(mpath + ".tmp", mpath)
            with open(self.latest_ptr + ".tmp", "w") as f:
                f.write(str(snap))
            os.replace(self.latest_ptr + ".tmp", self.latest_ptr)
        return snap

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop committed snapshots older than the newest ``keep_last``
        (Iceberg's ``expire_snapshots``): their manifests are removed
        and the oldest kept manifest's parent pointer is cut, so the
        directories only they referenced become orphans —
        :meth:`expire_orphans` then reclaims the space. Time travel to
        an expired snapshot stops working, by design; LATEST and the
        kept history are untouched. Returns the expired snapshot ids.

        Runs under the commit lock: the chain is re-read inside it, so
        a concurrent commit either lands before (and is kept — it is
        newer) or blocks until the expiry finishes."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (LATEST always kept)")
        with self._commit_lock():
            chain = self.snapshots()
            if len(chain) <= keep_last:
                return []
            expired = chain[:-keep_last]
            oldest_kept = chain[-keep_last]
            m = self._manifest(oldest_kept)
            m["parent"] = None
            mpath = os.path.join(self.snap_dir, f"{oldest_kept}.json")
            with open(mpath + ".tmp", "w") as f:
                json.dump(m, f)
            os.replace(mpath + ".tmp", mpath)
            for s in expired:
                os.remove(os.path.join(self.snap_dir, f"{s}.json"))
        return expired

    def expire_orphans(self, min_age_s: float = 86400.0) -> list[str]:
        """Delete data directories (and off-chain manifests) no
        committed snapshot references — cleanup for crashes between
        data write and pointer flip (Iceberg's orphan-file removal,
        including its ``older_than`` guard).

        ``min_age_s`` protects IN-FLIGHT commits: a directory younger
        than the threshold may belong to a commit whose data write
        finished but whose pointer flip hasn't happened yet, so only
        dirs whose mtime is older are removed (Iceberg defaults this
        guard to 3 days for the same reason). Never touches a
        referenced dir, so it is safe to run concurrently with readers
        of any committed snapshot.
        """
        with self._commit_lock():
            committed = set(self.snapshots())
            referenced = {
                d["dir"]
                for s in committed
                for d in self._manifest(s)["dirs"]
            }
            cutoff = time.time() - min_age_s
            removed = []
            for name in sorted(os.listdir(self.data_dir)):
                p = os.path.join(self.data_dir, name)
                if name not in referenced and os.path.getmtime(p) <= cutoff:
                    shutil.rmtree(p)
                    removed.append(p)
            for i in self._manifest_ids():
                mp = os.path.join(self.snap_dir, f"{i}.json")
                if i not in committed and os.path.getmtime(mp) <= cutoff:
                    os.remove(mp)
        return removed
