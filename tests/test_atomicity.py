"""Crash-atomicity of store commits (VERDICT r3 item 2).

The engine's commit protocol: immutable event/landmark segment dirs and
versioned summary/sketch store dirs become visible only via the single
atomic os.replace of streams.json.  These tests simulate crashes at the
worst points — after a partial store write, after a segment write but
before its commit — and assert the reopened DB is exactly the pre-crash
committed state (reference contract: storage/badger_backend.go:210-263,
single-transaction window+marker commits).
"""

import os

import pytest
from pyspark.sql.readwriter import DataFrameWriter

from summarydb_spark.engine import QueryParams, SummaryDB
from summarydb_spark.windowing import ExpWindowing

PARAMS = QueryParams(confidence=0.95, sd_multiplier=1.0)


def _mk_db(spark, tmp_path):
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(ops=["count", "sum"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(100)])
    db.flush()
    return db, s


def test_flush_crash_preserves_previous_store(spark, tmp_path, monkeypatch):
    db, s = _mk_db(spark, tmp_path)
    committed_rows = sorted(
        (r["time_start"], r["time_end"]) for r in db.summary_windows().collect()
    )
    s.append_pairs([(i, float(i)) for i in range(100, 200)])

    orig = DataFrameWriter.parquet

    def boom(self, path, *a, **kw):
        if "summary-" in os.path.basename(str(path)):
            # simulate a crash mid-write: partial garbage in the new
            # version dir, then death before the registry commit
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "part-00000-garbage.parquet"), "wb") as f:
                f.write(b"\x00partial")
            raise RuntimeError("simulated crash mid-store-write")
        return orig(self, path, *a, **kw)

    with monkeypatch.context() as mp:
        mp.setattr(DataFrameWriter, "parquet", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            db.flush()

    # reopen: previous committed store intact and readable; the partial
    # version dir was swept
    db2 = SummaryDB.open(spark, db.path)
    assert sorted(
        (r["time_start"], r["time_end"]) for r in db2.summary_windows().collect()
    ) == committed_rows
    leftovers = [d for d in os.listdir(db.path) if d.startswith("summary-")]
    assert leftovers == [db2._stores["summary"]]

    # the events that fed the crashed flush were committed with their
    # counters, the stream is still dirty, and a clean flush recovers all
    s2 = db2.get_stream(s.stream_id)
    assert s2.meta.dirty and s2.meta.n == 200
    r = s2.query("count", 0, 199, PARAMS)
    assert r.value == 200.0 and r.error == 0.0


def test_pending_commit_crash_never_duplicates_seq(spark, tmp_path, monkeypatch):
    db, s = _mk_db(spark, tmp_path)
    s.append_pairs([(i, float(i)) for i in range(100, 150)])

    with monkeypatch.context() as mp:
        mp.setattr(
            SummaryDB,
            "_save_registry",
            lambda self: (_ for _ in ()).throw(OSError("simulated crash")),
        )
        with pytest.raises(OSError, match="simulated crash"):
            db.flush()  # _flush_pending writes the segment, dies at commit

    # reopen: the uncommitted segment is invisible and swept; counters are
    # pre-append, so re-appending cannot produce duplicate (stream, seq)
    db2 = SummaryDB.open(spark, db.path)
    s2 = db2.get_stream(s.stream_id)
    assert s2.meta.n == 100 and s2.meta.next_seq == 100
    assert db2.events().count() == 100
    s2.append_pairs([(i, float(i)) for i in range(100, 150)])
    db2.flush()
    ev = db2.events()
    assert ev.count() == 150
    assert ev.select("stream_id", "seq").distinct().count() == 150
    r = s2.query("count", 0, 149, PARAMS)
    assert r.value == 150.0 and r.error == 0.0


def test_end_landmark_crash_leaves_no_window(spark, tmp_path, monkeypatch):
    db, s = _mk_db(spark, tmp_path)
    s.start_landmark(100)
    s.append_pairs([(i, float(i)) for i in range(100, 110)])

    with monkeypatch.context() as mp:
        mp.setattr(
            SummaryDB,
            "_save_registry",
            lambda self: (_ for _ in ()).throw(OSError("simulated crash")),
        )
        with pytest.raises(OSError, match="simulated crash"):
            s.end_landmark(109)

    db2 = SummaryDB.open(spark, db.path)
    assert db2.landmarks_df() is None
    # the stage root was cleared on reopen: a new landmark starts clean
    s2 = db2.get_stream(s.stream_id)
    s2.start_landmark(200)
    s2.append_pairs([(200, 1.0)])
    s2.end_landmark(201)
    lm = db2.landmarks_df()
    assert lm.where("ts IS NOT NULL").count() == 1
    assert lm.select("time_start").distinct().collect()[0][0] == 200


def test_durable_append_survives_kill(spark, tmp_path):
    """durable_appends=True: every acknowledged append_pairs batch is
    journaled with an fsync before return; a hard kill (no flush/close)
    loses nothing — the WAL contract of core/pipeline.go:97-107."""
    path = str(tmp_path / "db")
    db = SummaryDB(spark, path, durable_appends=True)
    s = db.new_stream(ops=["count", "sum"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(60)])
    s.append_pairs([(i, float(i)) for i in range(60, 100)])
    # hard kill: drop the handle without flush or close
    del db, s

    db2 = SummaryDB.open(spark, path, durable_appends=True)
    s2 = list(db2._streams.values())[0]
    assert s2.meta.n == 100 and s2.meta.next_seq == 100 and s2.meta.dirty
    r = s2.query("count", 0, 99, PARAMS)
    assert r.value == 100.0 and r.error == 0.0
    r = s2.query("sum", 0, 99, PARAMS)
    assert r.value == 4950.0 and r.error == 0.0
    # the flush triggered by query() committed the rows and dropped the WAL
    assert not os.path.exists(db2._wal_path)

    # replay is idempotent across a crash AFTER the segment commit but
    # BEFORE wal truncation: re-create that state artificially
    s2.append_pairs([(100, 100.0)])
    db2._wal_append([(s2.stream_id, s2.meta.next_seq - 1, 100, 100.0)])
    db2.flush()
    with open(db2._wal_path, "w") as f:  # resurrect a stale journal
        f.write('[[%d, %d, 100, 100.0]]\n' % (s2.stream_id, s2.meta.next_seq - 1))
    db3 = SummaryDB.open(spark, path)
    s3 = db3.get_stream(s2.stream_id)
    assert s3.meta.n == 101  # stale row NOT double-applied
    assert db3.events().count() == 101


def test_durable_append_tolerates_torn_tail(spark, tmp_path):
    path = str(tmp_path / "db")
    db = SummaryDB(spark, path, durable_appends=True)
    s = db.new_stream(ops=["count"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    del db, s
    with open(os.path.join(path, "append.wal"), "a") as f:
        f.write('[[0, 10, 10')  # crash mid-write of an unacked batch
    db2 = SummaryDB.open(spark, path)
    s2 = list(db2._streams.values())[0]
    assert s2.meta.n == 10
    r = s2.query("count", 0, 9, PARAMS)
    assert r.value == 10.0


def test_open_refuses_pre_manifest_layout(spark, tmp_path):
    """A registry without 'segments' plus existing event data is the old
    layout: opening must fail loudly, not serve an empty stream set (and
    then destroy the committed summary on the next flush)."""
    import json

    import pytest

    from summarydb_spark.engine import SummaryDB

    d = tmp_path / "legacy"
    (d / "events" / "stream_id=0").mkdir(parents=True)
    (d / "events" / "stream_id=0" / "part-0.parquet").write_bytes(b"x")
    (d / "streams.json").write_text(
        json.dumps(
            {
                "streams": {
                    "0": {
                        "stream_id": 0,
                        "ops": ["count", "sum"],
                        "window_kind": "exp",
                        "window_params": {"base": 2.0},
                    }
                }
            }
        )
    )
    with pytest.raises(ValueError, match="pre-manifest"):
        SummaryDB.open(spark, str(d))


def test_store_write_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the two renames leaves the complete store at .old-*;
    the next writer or reader must heal it (no committed data lost)."""
    import os

    from summarydb_spark.sources.tables import (
        _atomic_store_write,
        _recover_store,
    )

    path = str(tmp_path / "store")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    _atomic_store_write(df, path)
    # simulate the crash window: store renamed away, new tmp half-written
    os.rename(path, path + ".old-deadbeef")
    os.makedirs(path + ".tmp-cafe")
    _recover_store(path)
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    assert not os.path.exists(path + ".tmp-cafe")
    assert spark.read.parquet(path).count() == 5


def test_query_many_sketch_empty_requests(spark, tmp_path):
    from summarydb_spark.engine import SummaryDB
    from summarydb_spark.windowing import ExpWindowing

    db = SummaryDB(spark, str(tmp_path / "emptyreq"))
    s = db.new_stream(ops=["count", "sum", "bloom"], windowing=ExpWindowing(2.0))
    s.append_pairs([(i, float(i)) for i in range(10)])
    db.flush()
    out = db.query_many_sketch([])
    assert out.count() == 0
    assert out.columns == ["stream_id", "qid", "op", "t0", "t1", "value", "error"]
