"""Time-travel snapshots: keep_versions archives superseded registry
snapshots, their store versions survive sweeps, and at_commit opens a
read-only view of exactly the committed state."""

from __future__ import annotations

import os

import pytest

from summarydb_spark.engine import SummaryDB


def _mkdb(spark, tmp_path, keep_versions):
    db = SummaryDB(spark, str(tmp_path / "db"), keep_versions=keep_versions)
    s = db.new_stream(ops=("count", "sum"))
    s.append_pairs([(i, float(i)) for i in range(1, 33)])
    db.flush()
    return db, s


def test_snapshot_reads_exactly_the_old_state(spark, tmp_path):
    db, s = _mkdb(spark, tmp_path, keep_versions=4)
    v1 = db._commit_seq
    r1 = s.query("count", 1, 32)
    s.append_pairs([(i, float(i)) for i in range(33, 65)])
    db.flush()
    r2 = s.query("count", 1, 64)
    assert r2.value > r1.value

    snap = SummaryDB.open(spark, db.path, at_commit=v1)
    ss = snap.get_stream(s.stream_id)
    assert ss.meta.n == 32  # counters as committed then
    got = ss.query("count", 1, 32)
    assert got.value == r1.value
    # head unaffected and still newer
    head = SummaryDB.open(spark, db.path)
    assert head.get_stream(s.stream_id).meta.n == 64


def test_snapshot_handles_are_read_only(spark, tmp_path):
    db, s = _mkdb(spark, tmp_path, keep_versions=2)
    v1 = db._commit_seq
    s.append_pairs([(100, 1.0)])
    db.flush()
    snap = SummaryDB.open(spark, db.path, at_commit=v1)
    ss = snap.get_stream(s.stream_id)
    with pytest.raises(ValueError, match="read-only"):
        ss.append_pairs([(999, 1.0)])
    with pytest.raises(ValueError, match="read-only"):
        snap.flush()
    with pytest.raises(ValueError, match="read-only"):
        snap.new_stream()


def test_snapshot_close_is_noop_and_preserves_writer_wal(spark, tmp_path):
    """close() on a read-only snapshot must not raise (a handle you
    cannot close cleanly is a bug) and must NOT touch the live writer's
    append.wal — a snapshot that truncated it would silently drop the
    writer's acknowledged-but-unflushed rows."""
    db = SummaryDB(
        spark, str(tmp_path / "db"), durable_appends=True, keep_versions=2
    )
    s = db.new_stream(ops=("count",))
    s.append_pairs([(i, 1.0) for i in range(1, 33)])
    db.flush()
    v1 = db._commit_seq
    s.append_pairs([(100, 1.0)])
    db.flush()
    # live writer now has a journaled-but-unflushed append
    s.append_pairs([(200, 1.0)])
    assert os.path.exists(db._wal_path)

    snap = SummaryDB.open(spark, db.path, at_commit=v1)
    snap.close()  # must not raise, must not flush, must not touch WAL
    assert os.path.exists(db._wal_path)
    # crash-reopen still replays the journaled row
    db2 = SummaryDB.open(spark, db.path, durable_appends=True)
    assert db2.get_stream(s.stream_id).meta.n == 34


def test_history_is_bounded_and_pruned(spark, tmp_path):
    db, s = _mkdb(spark, tmp_path, keep_versions=2)
    for k in range(5):
        s.append_pairs([(1000 + 10 * k, 1.0)])
        db.flush()
    snaps = sorted(os.listdir(db._history_dir))
    assert len(snaps) == 2  # bounded
    commits = SummaryDB.list_commits(db.path)
    assert commits == sorted(commits)
    assert db._commit_seq == commits[-1]
    # the oldest retained snapshot still opens and queries
    old = SummaryDB.open(spark, db.path, at_commit=commits[0])
    assert old.get_stream(s.stream_id).query("count", 1, 10_000).value > 0


def test_unknown_commit_raises_with_available_list(spark, tmp_path):
    db, _ = _mkdb(spark, tmp_path, keep_versions=2)
    with pytest.raises(ValueError, match="available"):
        SummaryDB.open(spark, db.path, at_commit=999)


def test_keep_versions_zero_behaves_as_before(spark, tmp_path):
    db, s = _mkdb(spark, tmp_path, keep_versions=0)
    s.append_pairs([(100, 1.0)])
    db.flush()
    assert not os.path.isdir(db._history_dir)  # no archive dir appears
    # reopening sweeps as before and serves the head
    again = SummaryDB.open(spark, db.path)
    assert again.get_stream(s.stream_id).meta.n == 33


def test_head_reopen_preserves_snapshot_versions(spark, tmp_path):
    """Reopening the head (which runs the orphan sweep) must not delete
    store versions that retained snapshots reference."""
    db, s = _mkdb(spark, tmp_path, keep_versions=3)
    v1 = db._commit_seq
    s.append_pairs([(100, 1.0)])
    db.flush()
    head = SummaryDB.open(spark, db.path, keep_versions=3)  # sweep runs
    snap = SummaryDB.open(spark, db.path, at_commit=v1)
    assert snap.get_stream(s.stream_id).query("count", 1, 32).value == 32.0
    assert head.get_stream(s.stream_id).meta.n == 33


def test_compact_events_preserves_data_and_snapshots(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "db"), keep_versions=4)
    s = db.new_stream(ops=("count", "sum"))
    for k in range(3):  # three flushes -> three event segments
        s.append_pairs([(100 * k + i, float(i)) for i in range(1, 11)])
        db.flush()
    s.start_landmark(1000)
    s.append_pairs([(1001, 5.0), (1002, 6.0)])
    s.end_landmark(1003)
    db.flush()
    s.start_landmark(2000)
    s.append_pairs([(2001, 7.0)])
    s.end_landmark(2002)
    db.flush()
    v_pre = db._commit_seq
    assert len(db._segments["events"]) > 1
    assert len(db._segments["landmarks"]) > 1
    before = s.query("sum", 0, 3000)

    n = db.compact_events()
    assert n >= 4
    assert len(db._segments["events"]) == 1
    assert len(db._segments["landmarks"]) == 1
    after = s.query("sum", 0, 3000)
    assert after.value == before.value
    assert db.events().count() == 30

    # reopen: still one segment, identical answer, sweep kept snapshots
    db2 = SummaryDB.open(spark, db.path, keep_versions=4)
    assert len(db2._segments["events"]) == 1
    assert db2.get_stream(s.stream_id).query("sum", 0, 3000).value == (
        before.value
    )
    snap = SummaryDB.open(spark, db.path, at_commit=v_pre)
    got = snap.get_stream(s.stream_id).query("sum", 0, 3000)
    assert got.value == before.value  # pre-compaction segments survive


def test_compact_events_noop_when_single_segment(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(ops=("count",))
    s.append_pairs([(i, 1.0) for i in range(1, 11)])
    db.flush()
    seq = db._commit_seq
    assert db.compact_events() == 0
    assert db._commit_seq == seq  # no spurious commit
