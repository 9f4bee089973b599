"""RocksDB state-store provider (round-8 VERDICT item 2): the stateful
streaming gates must run — and produce identical results — on the
off-heap RocksDB provider, whose state capacity is bounded by local disk
rather than executor heap (the 100 TB deployment configuration for
stream-stream join and sessionizer state; see streaming/state.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.01"


def _with_env(key, value):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get(key)
            os.environ[key] = value

        def __exit__(self, *a):
            if self.old is None:
                os.environ.pop(key, None)
            else:
                os.environ[key] = self.old

    return _Ctx()


def test_provider_resolution():
    from summarydb_spark.streaming.state import ROCKSDB_PROVIDER, provider_class

    assert provider_class(None) is None
    assert provider_class("") is None
    assert provider_class("rocksdb") == ROCKSDB_PROVIDER
    assert provider_class("RocksDB") == ROCKSDB_PROVIDER
    assert provider_class("com.example.Custom") == "com.example.Custom"


def test_rocksdb_provider_engages_and_dedups(spark, tmp_path):
    """A watermarked streaming dropDuplicates on the RocksDB provider:
    the query's progress metrics must show RocksDB state-store activity
    (proof the provider engaged, not silently fell back), and the
    dedup result must equal the batch distinct."""
    from summarydb_spark.streaming.state import use_state_store

    src = str(tmp_path / "src")
    rows = [(i % 7, 1_000_000_000_000 + i * 1_000_000) for i in range(50)]
    spark.createDataFrame(rows, "id long, t long").coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("id long, t long")
        .parquet(src)
        .select("id", F.timestamp_micros(F.col("t")).alias("ts"))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["id"])
    )
    spark.catalog.dropTempView("rdb_dedup_sink")
    with use_state_store(spark, "rocksdb"):
        q = (
            stream.writeStream.format("memory")
            .queryName("rdb_dedup_sink")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
    progress = str(q.recentProgress[-1] if q.recentProgress else {})
    assert "rocksdb" in progress.lower(), (
        "no RocksDB metrics in query progress — provider did not engage"
    )
    got = {r["id"] for r in spark.table("rdb_dedup_sink").collect()}
    assert got == set(range(7))


def test_rocksdb_checkpoint_restart_preserves_state(spark, tmp_path):
    """The reference's recovery contract (core/pipeline.go:294-335) on
    RocksDB: kill after batch 1, append new data, restart from the SAME
    checkpoint — duplicates from batch 1 must still be suppressed, which
    requires the restored RocksDB state, and the provider class pinned
    in the checkpoint metadata must keep the restart on RocksDB."""
    import os as _os

    from summarydb_spark.streaming.state import use_state_store

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    B = 1_000_000_000_000

    def write_batch(ids, prev_mtime):
        before = set(_os.listdir(src)) if _os.path.isdir(src) else set()
        spark.createDataFrame(
            [(i, B + i * 1_000_000) for i in ids], "id long, t long"
        ).coalesce(1).write.mode("append").parquet(src)
        mt = prev_mtime
        for name in set(_os.listdir(src)) - before:
            if name.endswith(".parquet"):
                p = _os.path.join(src, name)
                if _os.path.getmtime(p) <= mt:
                    _os.utime(p, (mt + 1.0, mt + 1.0))
                mt = max(mt, _os.path.getmtime(p))
        return mt

    out = str(tmp_path / "out")

    def run():
        # parquet sink: fault-tolerant, supports restart from checkpoint
        # (the memory sink refuses recovery)
        stream = (
            spark.readStream.schema("id long, t long")
            .parquet(src)
            .select("id", F.timestamp_micros(F.col("t")).alias("ts"))
            .withWatermark("ts", "1 hour")
            .dropDuplicates(["id"])
        )
        with use_state_store(spark, "rocksdb"):
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", cp)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
        q.awaitTermination()
        return q

    mt = write_batch([1, 2, 3], 0.0)
    run()
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {1, 2, 3}

    write_batch([2, 3, 4], mt)
    q2 = run()
    # only the genuinely-new id is appended: 2 and 3 are suppressed by
    # the RESTORED RocksDB state from the first run (total = 4 rows)
    got = [r["id"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == [1, 2, 3, 4]
    progress = str(q2.recentProgress[-1] if q2.recentProgress else {})
    assert "rocksdb" in progress.lower()


def test_stateful_gates_identical_on_rocksdb(spark):
    """The four Spark-stateful gate queries (custom stateful sessionizer,
    built-in session_window, stream-stream interval + left-outer joins)
    produce the IDENTICAL result set on RocksDB as on the default
    provider at sf0.01."""
    from summarydb_spark.plans.dataframe_queries import (
        q_streaming_interval_join_gate,
        q_streaming_outer_join_gate,
        q_streaming_session_timeout_gate,
        q_streaming_sessionize_gate,
    )

    for fn in (
        q_streaming_session_timeout_gate,
        q_streaming_sessionize_gate,
        q_streaming_interval_join_gate,
        q_streaming_outer_join_gate,
    ):
        default = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        with _with_env("SPARK_GRAFT_STATE_STORE", "rocksdb"):
            rocks = {tuple(r) for r in fn(spark, SF_DIR).collect()}
        assert rocks == default, fn.__name__
        assert rocks, f"vacuous gate result: {fn.__name__}"
