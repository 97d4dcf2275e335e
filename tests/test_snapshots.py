"""Snapshot-log table format: atomic commits, time travel, idempotent
retries, crash invisibility, orphan cleanup (beats_spark/snapshots.py —
the Iceberg-commit-protocol stand-in)."""

import os

import pytest
from pyspark.sql import functions as F

from beats_spark.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_append_commits_and_time_travel(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    assert t.latest_snapshot() is None
    s1 = t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    s2 = t.commit(_df(spark, [(2, "b")]), commit_id="c2")
    assert (s1, s2) == (1, 2)
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2]
    # time travel: snapshot 1 sees only the first commit
    assert [r["id"] for r in t.read(spark, snapshot=1).collect()] == [1]
    assert [h["commit_id"] for h in t.history()] == ["c1", "c2"]


def test_overwrite_replaces_visible_set_keeps_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    t.commit(_df(spark, [(9, "z")]), commit_id="c2", mode="overwrite")
    assert [r["id"] for r in t.read(spark).collect()] == [9]
    # the pre-overwrite snapshot is still readable
    assert [r["id"] for r in t.read(spark, snapshot=1).collect()] == [1]


def test_retried_commit_id_is_idempotent(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    s2 = t.commit(_df(spark, [(2, "first try")]), commit_id="c2")
    t.commit(_df(spark, [(2, "retry")]), commit_id="c2")  # replayed batch
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {1: "a", 2: "retry"}  # no duplicate row 2
    # the retry wrote a FRESH directory: the snapshot that committed the
    # first attempt still time-travels to the ORIGINAL rows (the retry
    # never rewrites data a committed snapshot references)
    old = {r["id"]: r["v"] for r in t.read(spark, snapshot=s2).collect()}
    assert old == {1: "a", 2: "first try"}


def test_replace_partitions_masks_older_dirs(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(1, "x", "d1"), (2, "y", "d2")],
            "id long, v string, day string",
        ),
        commit_id="day0",
        partition_by=["day"],
    )
    t.commit(
        spark.createDataFrame(
            [(3, "y2", "d2")], "id long, v string, day string"
        ),
        commit_id="day2-fix",
        mode="replace_partitions",
        replace_where="day = 'd2'",
        partition_by=["day"],
    )
    rows = {r["id"]: r["day"] for r in t.read(spark).collect()}
    # day 1 survives; old day-2 row is masked, replaced by the fix
    assert rows == {1: "d1", 3: "d2"}
    with pytest.raises(ValueError):
        t.commit(_df(spark, [(1, "a")]), commit_id="bad",
                 mode="replace_partitions")


def test_retried_replace_partitions_keeps_visibility_order(spark, tmp_path):
    """A retried commit_id keeps its ORIGINAL position in the visible
    set: read()'s replace_where masking is list-ordered, so if the
    retry were re-appended it would mask rows of commits that landed
    AFTER the first attempt (here: c3's day-d2 append would vanish
    under c2's day='d2' predicate)."""
    day_df = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "id long, v string, day string"
    )
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(day_df([(1, "a", "d1"), (2, "b", "d2")]), commit_id="c1")
    t.commit(
        day_df([(3, "fix", "d2")]), commit_id="c2",
        mode="replace_partitions", replace_where="day = 'd2'",
    )
    t.commit(day_df([(4, "later", "d2")]), commit_id="c3")
    before = {r["id"] for r in t.read(spark).collect()}
    assert before == {1, 3, 4}
    # replay batch c2 (same predicate, fresh directory)
    t.commit(
        day_df([(3, "fix-retry", "d2")]), commit_id="c2",
        mode="replace_partitions", replace_where="day = 'd2'",
    )
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    # c3's newer d2 row MUST survive the retried c2's predicate
    assert rows == {1: "a", 3: "fix-retry", 4: "later"}


def test_uncommitted_data_is_invisible_and_expirable(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    # simulate a crash between data write and pointer flip: data files
    # exist but no manifest references them
    _df(spark, [(99, "ghost")]).write.parquet(
        os.path.join(t.data_dir, "crashed")
    )
    assert [r["id"] for r in t.read(spark).collect()] == [1]
    # default min_age_s guards in-flight commits: too young to expire
    assert t.expire_orphans() == []
    removed = t.expire_orphans(min_age_s=0.0)
    assert removed == [os.path.join(t.data_dir, "crashed")]
    assert [r["id"] for r in t.read(spark).collect()] == [1]
    # committed dirs are never expired, even with no age guard
    assert t.expire_orphans(min_age_s=0.0) == []


def test_read_is_snapshot_isolated_from_later_commits(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    df = t.read(spark)  # plan pinned at build
    t.commit(_df(spark, [(2, "b")]), commit_id="c2")
    assert [r["id"] for r in df.collect()] == [1]
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2]


def test_read_missing_snapshot_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(FileNotFoundError):
        t.read(spark)
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    with pytest.raises(FileNotFoundError):
        t.read(spark, snapshot=7)


def test_fanout_write_snapshot_atomic_and_idempotent(spark, tmp_path):
    from beats_spark.routing import add_sink_column, fanout_write_snapshot

    routing = {"indices": [{"index": "errs",
                            "when": {"equals": {"level": "error"}}}],
               "default": "logs"}
    df = spark.createDataFrame(
        [(1, "error"), (2, "info"), (3, "error")], "doc_id long, level string"
    )
    routed = add_sink_column(df, routing)
    t = SnapshotTable(str(tmp_path / "sinks"))
    s1 = fanout_write_snapshot(routed, t, run_id="r1")
    back = t.read(spark)
    per_sink = {r["sink"]: r["n"] for r in
                back.groupBy("sink").count().withColumnRenamed("count", "n").collect()}
    assert per_sink == {"errs": 2, "logs": 1}
    # replayed batch: same run_id -> same visible rows, new snapshot
    s2 = fanout_write_snapshot(routed, t, run_id="r1")
    assert s2 == s1 + 1
    assert t.read(spark).count() == 3
    # a second batch appends atomically alongside the first
    fanout_write_snapshot(routed.withColumn("doc_id", F.col("doc_id") + 10),
                          t, run_id="r2")
    assert t.read(spark).count() == 6
    assert t.read(spark, snapshot=s2).count() == 3



def test_compact_folds_visible_set_keeps_history(spark, tmp_path):
    """compact() rewrites N visible dirs (replace_where masks applied)
    into one; rows identical to the pre-compact read, older snapshots
    still time-travel to the original directories, and a visible set
    already under min_dirs is a no-op."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a"), (2, "b")]), commit_id="c1")
    t.commit(_df(spark, [(3, "c")]), commit_id="c2")
    t.commit(
        _df(spark, [(2, "b2")]), commit_id="c3",
        mode="replace_partitions", replace_where="id = 2",
    )
    before = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert before == {1: "a", 2: "b2", 3: "c"}

    snap = t.compact(spark, commit_id="maint1")
    assert snap == 4
    after = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert after == before
    # one visible directory now; masking is materialized
    assert t.history()[-1]["n_dirs"] == 1 and t.history()[-1]["operation"] == "compact"
    # pre-compact snapshots unchanged (time travel)
    assert {r["id"] for r in t.read(spark, snapshot=2).collect()} == {1, 2, 3}
    assert {r["id"]: r["v"] for r in t.read(spark, snapshot=3).collect()} == before
    # already compact -> no-op
    assert t.compact(spark, commit_id="maint2") is None


def test_compact_conflict_raises_not_discards(spark, tmp_path):
    """Optimistic concurrency: a commit landing between compaction's
    pinned read and its pointer flip must raise SnapshotConflict, and
    the concurrent commit's rows must survive."""
    from beats_spark.snapshots import SnapshotConflict

    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    base = t.commit(_df(spark, [(2, "b")]), commit_id="c2")
    # concurrent writer lands AFTER the compactor pinned its base
    t.commit(_df(spark, [(3, "c")]), commit_id="c3")
    with pytest.raises(SnapshotConflict):
        t.compact(spark, commit_id="maint1", base_snapshot=base)
    # nothing lost, nothing flipped
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3}
    # retry on the new base succeeds
    assert t.compact(spark, commit_id="maint1") is not None
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3}


def test_compact_then_expire_reclaims_old_dirs(spark, tmp_path):
    """After compaction, dropping the old snapshots' manifests is NOT
    how expiry works here — expire_orphans only removes unreferenced
    dirs, so as long as pre-compact snapshots exist their dirs stay;
    the compacted dir itself is referenced and always safe."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    t.commit(_df(spark, [(2, "b")]), commit_id="c2")
    t.compact(spark, commit_id="maint1")
    removed = t.expire_orphans(min_age_s=0.0)
    assert removed == []  # every dir is referenced by some committed snapshot
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}


def test_expire_snapshots_then_orphans_reclaims(spark, tmp_path):
    """The maintenance triad: compact folds the visible set,
    expire_snapshots drops the pre-compact history (time travel to it
    now raises), and expire_orphans reclaims the directories only that
    history referenced. LATEST is untouched throughout."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(_df(spark, [(1, "a")]), commit_id="c1")
    t.commit(_df(spark, [(2, "b")]), commit_id="c2")
    t.compact(spark, commit_id="maint")
    assert len(t.snapshots()) == 3

    # nothing reclaimable while history pins the per-batch dirs
    assert t.expire_orphans(min_age_s=0.0) == []

    expired = t.expire_snapshots(keep_last=1)
    assert expired == [1, 2]
    assert t.snapshots() == [3]
    with pytest.raises(FileNotFoundError):
        t.read(spark, snapshot=1)
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}

    removed = t.expire_orphans(min_age_s=0.0)
    assert len(removed) == 2  # c1 + c2 batch dirs, maint dir survives
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
    # keep_last larger than history is a no-op
    assert t.expire_snapshots(keep_last=5) == []
