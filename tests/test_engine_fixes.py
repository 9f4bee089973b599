"""Regression tests for the round-5 engine review findings: registry
commits that stranded buffered appends, bulk-append clamp/empty/double-
evaluation, cross-path clamp consistency, carried-count fallback in the
incremental merges, and streaming checkpoint-reset refusal + snapshot GC.
"""

from __future__ import annotations

import os

import pytest

from summarydb_spark.engine import SummaryDB
from summarydb_spark.windowing import ExpWindowing


def test_registry_commit_does_not_strand_buffered_appends(spark, tmp_path):
    """new_stream() (or any registry write) after append_pairs must flush
    the buffered rows it is committing counters for — previously the
    counters landed in streams.json while the rows sat in the driver
    buffer, so a crash lost acknowledged data and WAL replay skipped it
    (seq < committed next_seq)."""
    db = SummaryDB(spark, str(tmp_path / "db"), durable_appends=True)
    s = db.new_stream(ops=["count", "sum"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    db.new_stream(ops=["count"], windowing=ExpWindowing(2.0))  # registry write

    # simulate a crash: drop the handle WITHOUT flushing, reopen from disk
    db2 = SummaryDB.open(spark, db.path, durable_appends=True)
    s2 = db2.get_stream(s.meta.stream_id)
    assert s2.meta.n == 10
    assert db2.events().where(
        f"stream_id = {s.meta.stream_id}"
    ).count() == 10  # rows are in a committed segment, not lost


def test_bulk_append_empty_dataframe_is_total(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(ops=["count"], windowing=ExpWindowing(2.0))
    s.append_pairs([(5, 1.0)])
    s.append(spark.createDataFrame([], "ts long, value double"))
    assert s.meta.n == 1
    assert s.meta.last_ts == 5


def test_bulk_append_clamps_across_batches(spark, tmp_path):
    """The docstring promise: clamping continues from the stream's last
    timestamp (reference core/pipeline.go:80-84) — a late batch must not
    commit timestamps behind the committed head."""
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(ops=["count"], windowing=ExpWindowing(2.0))
    s.append_pairs([(100, 1.0)])
    s.append(spark.createDataFrame([(50, 2.0), (60, 3.0)], "ts long, value double"))
    ts = sorted(
        r.ts for r in db.events().where(f"stream_id = {s.meta.stream_id}").collect()
    )
    assert ts == [100, 101, 102]  # 50 -> 101, 60 -> 102
    assert s.meta.last_ts == 102


def test_driver_and_columnar_clamp_agree_on_equal_stamps(spark, tmp_path):
    """Engine contract: strictly-increasing timestamps on every ingest
    path (deliberate strengthening of the reference's strict-< clamp so
    batch and streaming ingest of identical data build identical
    windows)."""
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(ops=["count"], windowing=ExpWindowing(2.0))
    s.append_pairs([(5, 1.0), (5, 2.0), (5, 3.0)])
    driver_ts = sorted(
        r.ts for r in db.events().where(f"stream_id = {s.meta.stream_id}").collect()
    )

    from summarydb_spark.operators.summary import clamp_monotonic

    cols = clamp_monotonic(
        spark.createDataFrame(
            [(s.meta.stream_id, i, 5) for i in range(3)],
            "stream_id long, seq long, ts long",
        ),
        order_col="seq",
    )
    columnar_ts = sorted(r.ts for r in cols.collect())
    assert driver_ts == columnar_ts == [5, 6, 7]


def test_incremental_merge_carries_absent_stream_counts(spark):
    """A stream present in the old summary but absent from both the batch
    and base_counts must keep its windows intact (previously _n=0 made
    its carried windows re-bucket at negative rank)."""
    from summarydb_spark.operators.incremental import merge_summary_increment

    ev1 = spark.createDataFrame(
        [(1, t, 1.0) for t in range(8)] + [(2, t, 2.0) for t in range(8)],
        "stream_id long, ts long, value double",
    )
    state1 = merge_summary_increment(None, ev1, ExpWindowing(2.0), base_counts=None)
    # batch touches ONLY stream 1; base_counts covers only stream 1 too
    ev2 = spark.createDataFrame(
        [(1, t, 1.0) for t in range(8, 12)], "stream_id long, ts long, value double"
    )
    counts = spark.createDataFrame([(1, 8)], "stream_id long, n long")
    state2 = merge_summary_increment(
        state1, ev2, ExpWindowing(2.0), base_counts=counts
    )
    s2 = state2.where("stream_id = 2")
    assert s2.agg({"count": "sum"}).first()[0] == 8  # nothing lost
    assert s2.where("count_start < 0 or count_end < 0").count() == 0


def test_streaming_refuses_reset_checkpoint(spark, tmp_path):
    from summarydb_spark.streaming.ingest import StreamingSummarizer

    sdir = str(tmp_path / "state")
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), sdir)
    ev = spark.createDataFrame(
        [(1, t, 1.0) for t in range(8)], "stream_id long, ts long, value double"
    )
    summ.process_batch(ev, 5)  # pretend the checkpoint is at batch 5
    with pytest.raises(RuntimeError, match="checkpoint"):
        summ.process_batch(ev, 0)  # reset checkpoint replays from 0


def test_streaming_prunes_superseded_snapshots(spark, tmp_path):
    from summarydb_spark.streaming.ingest import StreamingSummarizer, _versions

    sdir = str(tmp_path / "state")
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), sdir)
    for b in range(4):
        ev = spark.createDataFrame(
            [(1, b * 4 + i, 1.0) for i in range(4)],
            "stream_id long, ts long, value double",
        )
        summ.process_batch(ev, b)
    vs = _versions(sdir)
    assert max(vs) == 3
    assert len(vs) <= 2  # head + at most one previous
    # state is still correct after pruning
    from summarydb_spark.streaming.ingest import load_state_df

    summary, state = load_state_df(spark, sdir)
    assert summary.agg({"count": "sum"}).first()[0] == 16


# round 6: opt-in single-writer lock (the reference's Badger dir lock)
def test_exclusive_writer_lock(spark, tmp_path):
    import os

    from summarydb_spark.engine import SummaryDB
    from summarydb_spark.windowing import ExpWindowing

    p = str(tmp_path / "locked")
    db = SummaryDB(spark, p, exclusive=True)
    s = db.new_stream(ops=("count",), windowing=ExpWindowing(2.0))
    s.append_pairs([(1, 1.0)])
    db.flush()
    # a second exclusive writer (even in-process: same deployment bug)
    with pytest.raises(ValueError, match="locked by live writer"):
        SummaryDB.open(spark, p, exclusive=True)
    # non-exclusive and read-only handles are unaffected
    SummaryDB.open(spark, p)
    # close releases; the next exclusive writer acquires cleanly (the
    # flock lockfile deliberately stays on disk — the kernel lock state
    # is what was released, and unlinking would reintroduce the
    # unlinked-inode race)
    db.close()
    assert not db._owns_lock
    db2 = SummaryDB.open(spark, p, exclusive=True)
    db2.close()


def test_stale_writer_lock_is_reclaimed(spark, tmp_path):
    """A lockfile left behind by a crashed writer holds no kernel flock
    (fds die with the process) — the next exclusive open acquires it
    without any reclaim protocol."""
    import os

    from summarydb_spark.engine import SummaryDB

    p = str(tmp_path / "stale")
    os.makedirs(p)
    with open(os.path.join(p, ".writer.lock"), "w") as f:
        f.write("999999999")  # a crashed writer's leftover pidfile
    db = SummaryDB(spark, p, exclusive=True)
    assert db._owns_lock
    db.close()


def test_failed_close_defuncts_handle(spark, tmp_path, monkeypatch):
    """A close() whose flush raises must release the lock (the pid
    stays alive — a leak would wedge the process) but also DEFUNCT the
    handle: a retried write/close through it could otherwise race the
    next exclusive writer that legitimately acquired the freed lock."""
    import pytest as _pytest

    from summarydb_spark.engine import SummaryDB
    from summarydb_spark.windowing import ExpWindowing

    p = str(tmp_path / "defunct")
    db = SummaryDB(spark, p, exclusive=True)
    s = db.new_stream(ops=("count",), windowing=ExpWindowing(2.0))
    s.append_pairs([(1, 1.0)])

    def boom(self):
        raise RuntimeError("injected flush failure")

    monkeypatch.setattr(SummaryDB, "flush", boom)
    with _pytest.raises(RuntimeError, match="injected"):
        db.close()
    monkeypatch.undo()
    assert not db._owns_lock
    # the freed lock is acquirable by a new writer...
    db2 = SummaryDB.open(spark, p, exclusive=True)
    # ...and the defunct handle refuses every write path loudly
    with _pytest.raises(ValueError, match="invalidated by a failed close"):
        s.append_pairs([(2, 2.0)])
    with _pytest.raises(ValueError, match="invalidated by a failed close"):
        db.flush()
    db2.close()


def test_writer_lock_cross_process_and_crash_release(tmp_path):
    """The flock design's defining properties, tested across real
    processes (no Spark needed — the lock methods only touch the
    filesystem): a second PROCESS cannot acquire while the holder
    lives, and a SIGKILLed holder's lock evaporates with its fds — the
    kernel releases it, no stale-reclaim protocol required."""
    import os
    import signal
    import subprocess
    import sys
    import time
    from types import SimpleNamespace

    from summarydb_spark.engine import SummaryDB

    import summarydb_spark

    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(summarydb_spark.__file__))
    )
    d = str(tmp_path / "xproc")
    os.makedirs(d)
    ready = os.path.join(d, "ready")
    child = subprocess.Popen(
        [
            sys.executable,
            "-c",
            f"""
import os, time
from types import SimpleNamespace
import sys
sys.path.insert(0, {repo_root!r})
from summarydb_spark.engine import SummaryDB
ns = SimpleNamespace(path={d!r}, _lock_path=os.path.join({d!r}, ".writer.lock"),
                     _owns_lock=False, _lock_fd=None)
SummaryDB._acquire_writer_lock(ns)
open({ready!r}, "w").close()
time.sleep(60)
""",
        ],
        cwd=os.getcwd(),
    )
    try:
        deadline = time.time() + 30
        while not os.path.exists(ready):
            assert child.poll() is None, "child died before acquiring"
            assert time.time() < deadline, "child never signalled ready"
            time.sleep(0.05)
        me = SimpleNamespace(
            path=d,
            _lock_path=os.path.join(d, ".writer.lock"),
            _owns_lock=False,
            _lock_fd=None,
        )
        with pytest.raises(ValueError, match="locked by live writer"):
            SummaryDB._acquire_writer_lock(me)
        # crash the holder: SIGKILL leaves no chance for cleanup code
        child.send_signal(signal.SIGKILL)
        child.wait(timeout=10)
        SummaryDB._acquire_writer_lock(me)  # kernel released the lock
        assert me._owns_lock
        SummaryDB._release_writer_lock(me)
    finally:
        if child.poll() is None:
            child.kill()
