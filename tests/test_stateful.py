"""applyInPandasWithState stream-statistics operator: cross-batch Welford
state equals the single-pass batch computation (the reference's dormant
stats/stream_statistics.go feature, live on streams)."""

import math
import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from summarydb_spark.streaming.stateful import streaming_stream_stats

EVENT_SCHEMA = "idx long, stream_id long, ts long, value double"


def _rows(n_per_stream=97, streams=(0, 1, 2)):
    """(per-stream idx, stream_id, ts, value) with irregular deterministic
    gaps; time-ordered within each stream."""
    rows = []
    for sid in streams:
        t = 0
        for i in range(n_per_stream):
            t += 7 + ((i * 13 + sid) % 29)
            rows.append((i, sid, t, ((i * 31 + sid * 17) % 101) * 0.25))
    return rows


def _expected(rows):
    out = {}
    by_stream = {}
    for _, sid, t, v in rows:
        by_stream.setdefault(sid, []).append((t, v))
    for sid, evs in by_stream.items():
        evs.sort()
        vals = [v for _, v in evs]
        ts = [t for t, _ in evs]
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        n = len(vals)
        mean = sum(vals) / n
        var = sum((x - mean) ** 2 for x in vals) / (n - 1)
        gmean = sum(gaps) / len(gaps)
        gvar = sum((g - gmean) ** 2 for g in gaps) / (len(gaps) - 1)
        out[sid] = (n, mean, var, gmean, gvar)
    return out


def test_stateful_stats_streaming_matches_batch(spark, tmp_path):
    rows = _rows()
    exp = _expected(rows)

    # three time-ordered micro-batch files (uneven splits)
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    cuts = (0, 30, 60, 97)
    for b in range(3):
        chunk = [r for r in rows if cuts[b] <= r[0] < cuts[b + 1]]
        spark.createDataFrame(chunk, EVENT_SCHEMA).select(
            "stream_id", "ts", "value"
        ).coalesce(1).write.parquet(os.path.join(src, f"b{b}"))

    stream = spark.readStream.schema(
        "stream_id long, ts long, value double"
    ).parquet(os.path.join(src, "b*"))
    stats = streaming_stream_stats(stream)
    q = (
        stats.writeStream.format("memory")
        .queryName("stateful_stats")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

    # last emitted row per stream (largest n) = final state
    final = (
        spark.sql("SELECT * FROM stateful_stats")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("stream_id").orderBy(F.col("n").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    assert len(final) == len(exp)
    for r in final:
        n, mean, var, gmean, gvar = exp[r["stream_id"]]
        assert r["n"] == n
        assert math.isclose(r["value_mean"], mean, rel_tol=1e-9)
        assert math.isclose(r["value_m2"] / (n - 1), var, rel_tol=1e-9)
        assert r["gap_n"] == n - 1
        assert math.isclose(r["gap_mean"], gmean, rel_tol=1e-9)
        assert math.isclose(r["gap_m2"] / (n - 2), gvar, rel_tol=1e-9)


def test_sessionize_with_timeout_cross_batch_and_watermark(spark, tmp_path):
    """Hand-built 2-batch stream pinning every semantic of the
    timeout-closing sessionizer: (a) a session SPLIT ACROSS BATCHES
    merges in state (one row, n=2); (b) a session closed by a later
    in-batch event emits without waiting for any timeout; (c) the
    trailing session of a user emits iff its end + gap clears the FINAL
    watermark — u3's never does and must be withheld."""
    import os as _os

    from pyspark.sql import functions as F

    from summarydb_spark.streaming.stateful import sessionize_with_timeout

    H = 3_600_000_000  # 1h in micros
    # base far from the epoch: a row whose event time equals the INITIAL
    # watermark (1970-01-01T00:00) is late-dropped before the operator
    # ever sees it — an epoch-adjacency artifact, not session semantics
    B = 100 * H
    # u5 pins the within-watermark LATE-event merge: batch 2 delivers an
    # event at B+H/4, EARLIER than u5's open-session end B+H/2 held in
    # state (watermark after batch 1 is B-H/2, so it is not late-dropped).
    # The session must keep t_end = B+H/2 — not move it backward — and
    # count 3 events.
    batch1 = [(1, B), (2, B), (5, B), (5, B + H // 2)]
    batch2 = [(1, B + H // 2), (2, B + 2 * H), (3, B + 5 * H), (5, B + H // 4)]
    src = str(tmp_path / "src")
    prev = 0.0
    for i, rows in enumerate((batch1, batch2)):
        df = spark.createDataFrame(rows, "user_id long, t long")
        before = set(_os.listdir(src)) if _os.path.isdir(src) else set()
        df.coalesce(1).write.mode("append").parquet(src)
        for name in set(_os.listdir(src)) - before:
            if name.endswith(".parquet"):
                p = _os.path.join(src, name)
                if _os.path.getmtime(p) <= prev:
                    _os.utime(p, (prev + 1.0, prev + 1.0))
                prev = max(prev, _os.path.getmtime(p))

    stream = (
        spark.readStream.schema("user_id long, t long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select(
            "user_id",
            F.timestamp_micros(F.col("t")).alias("tstamp"),
            "t",
        )
        .withWatermark("tstamp", "1 hour")
    )
    q = (
        sessionize_with_timeout(stream)
        .writeStream.format("memory")
        .queryName("session_timeout_unit_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"], r["t_start"], r["t_end"])
        for r in spark.table("session_timeout_unit_sink").collect()
    }
    # final watermark = B+5H - 1H = B+4H:
    #   u1 [B, B+H/2] n=2 -> merged across batches, times out (B+1.5H <= B+4H)
    #   u2 [B, B]         -> closed by the B+2H event inside batch 2
    #   u2 [B+2H, B+2H]   -> times out (B+3H <= B+4H)
    #   u3 [B+5H, B+5H]   -> B+6H > B+4H: withheld
    #   u5 [B, B+H/2] n=3 -> late B+H/4 merged WITHOUT moving t_end back
    assert got == {
        (1, 2, B, B + H // 2),
        (2, 1, B, B),
        (2, 1, B + 2 * H, B + 2 * H),
        (5, 3, B, B + H // 2),
    }


class _FakeGroupState:
    """Minimal GroupState double for driving _sessionize_update directly —
    the engine test above can't reach the pre-session-singleton branch
    (with watermark delay == gap it is provably unreachable; it guards
    deployments with delay > gap)."""

    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._v = value
        self._wm = watermark_ms
        self.hasTimedOut = timed_out
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms


def test_sessionize_update_late_event_semantics():
    """Direct contract of the update function for within-watermark late
    events: (a) a late event inside the open session's span merges by
    min/max (t_end never moves backward, so the timeout can't fire
    early); (b) a late event more than the gap BEFORE the open session's
    start emits as its own already-expired singleton session and leaves
    the open session untouched."""
    import pandas as pd

    from summarydb_spark.streaming.stateful import (
        SESSION_GAP_MS,
        SESSION_GAP_US,
        _sessionize_update,
    )

    H = SESSION_GAP_US
    B = 100 * H

    # (a) open session [B, B+H/2]; late event at B+H/4
    st = _FakeGroupState(value=(B, B + H // 2, 2), watermark_ms=0)
    out = list(
        _sessionize_update(
            (7,), iter([pd.DataFrame({"t": [B + H // 4]})]), st
        )
    )
    assert out == []  # nothing closed
    assert st.get == (B, B + H // 2, 3)
    assert st.timeout_ts == (B + H // 2) // 1000 + SESSION_GAP_MS

    # (b) open session [B+3H, B+3H]; late event at B+H (> gap before start)
    st = _FakeGroupState(value=(B + 3 * H, B + 3 * H, 1), watermark_ms=0)
    out = list(
        _sessionize_update((7,), iter([pd.DataFrame({"t": [B + H]})]), st)
    )
    assert len(out) == 1
    rows = {tuple(r) for r in out[0].itertuples(index=False)}
    assert rows == {(7, 1, B + H, B + H)}
    assert st.get == (B + 3 * H, B + 3 * H, 1)

    # (c) a late event extending the session START backward within the gap
    st = _FakeGroupState(value=(B, B + H // 2, 2), watermark_ms=0)
    out = list(
        _sessionize_update(
            (7,), iter([pd.DataFrame({"t": [B - H // 2]})]), st
        )
    )
    assert out == []
    assert st.get == (B - H // 2, B + H // 2, 3)


def test_sessionize_update_late_run_gap_merge():
    """Round-9 ADVICE (medium): pre-session late events within the gap of
    EACH OTHER gap-merge into one already-expired session (batch semantics),
    instead of emitting per-event singletons; runs separated by more than
    the gap split; the open session is untouched throughout."""
    import pandas as pd

    from summarydb_spark.streaming.stateful import (
        SESSION_GAP_US,
        _sessionize_update,
    )

    H = SESSION_GAP_US
    B = 100 * H

    # open session far ahead at [B+10H, B+10H]; late events form two runs:
    #   run 1: B, B+H/2, B+H (each within gap of the previous) -> ONE session
    #   run 2: B+3H, B+3.5H                                    -> ONE session
    # plus an in-batch event at B+10H+H/4 merging into the open session.
    st = _FakeGroupState(value=(B + 10 * H, B + 10 * H, 1), watermark_ms=0)
    ts = [B, B + H // 2, B + H, B + 3 * H, B + 3 * H + H // 2,
          B + 10 * H + H // 4]
    out = list(_sessionize_update((9,), iter([pd.DataFrame({"t": ts})]), st))
    rows = {tuple(r) for df in out for r in df.itertuples(index=False)}
    assert rows == {
        (9, 3, B, B + H),
        (9, 2, B + 3 * H, B + 3 * H + H // 2),
    }
    assert st.get == (B + 10 * H, B + 10 * H + H // 4, 2)

    # trailing late run (batch ends while a late run is open) still emits
    st = _FakeGroupState(value=(B + 10 * H, B + 10 * H, 1), watermark_ms=0)
    out = list(
        _sessionize_update(
            (9,), iter([pd.DataFrame({"t": [B, B + H // 2]})]), st
        )
    )
    rows = {tuple(r) for df in out for r in df.itertuples(index=False)}
    assert rows == {(9, 2, B, B + H // 2)}
    assert st.get == (B + 10 * H, B + 10 * H, 1)


def test_sessionize_update_late_run_absorbed_by_min_merge():
    """Round-10 ADVICE (low): a buffered late run must flush INTO the open
    session when a later in-batch event min-merges and shrinks t_start to
    within the gap of the run's end (gap=10, open [100,120], batch
    [89, 91]: 89 buffers as late, 91 min-merges t_start to 91, and 89 is
    now within gap of 91 — batch semantics say ONE session)."""
    import pandas as pd

    from summarydb_spark.streaming.stateful import (
        SESSION_GAP_US,
        _sessionize_update,
    )

    H = SESSION_GAP_US
    B = 100 * H

    # open [B+10H, B+12H]; batch: B+8.5H (late: < t_start - gap), then
    # B+9.1H (min-merges, new t_start within gap of the buffered run)
    st = _FakeGroupState(value=(B + 10 * H, B + 12 * H, 2), watermark_ms=0)
    ts = [B + 8 * H + H // 2, B + 9 * H + H // 10]
    out = list(_sessionize_update((9,), iter([pd.DataFrame({"t": ts})]), st))
    assert out == []  # nothing closed: the run was absorbed
    assert st.get == (B + 8 * H + H // 2, B + 12 * H, 4)

    # a run separated by MORE than the gap from the shrunk t_start still
    # emits on its own (the absorb condition is strict)
    st = _FakeGroupState(value=(B + 10 * H, B + 12 * H, 2), watermark_ms=0)
    ts = [B + 7 * H, B + 9 * H + H // 2]
    out = list(_sessionize_update((9,), iter([pd.DataFrame({"t": ts})]), st))
    rows = {tuple(r) for df in out for r in df.itertuples(index=False)}
    assert rows == {(9, 1, B + 7 * H, B + 7 * H)}
    assert st.get == (B + 9 * H + H // 2, B + 12 * H, 3)


def _has_tws_protocol() -> bool:
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_sessionizer_env_gate(spark):
    """Without protobuf the TWS sessionizer must fail fast driver-side
    with the documented reason (not crash a streaming worker)."""
    import pytest

    from summarydb_spark.streaming.stateful import sessionize_with_tws

    if _has_tws_protocol():
        pytest.skip("protobuf present: covered by the parity test")
    ev = spark.readStream.format("rate").load().selectExpr(
        "value AS user_id",
        "timestamp AS tstamp",
        "unix_micros(timestamp) AS t",
    ).withWatermark("tstamp", "1 hour")
    with pytest.raises(ImportError, match="protobuf"):
        sessionize_with_tws(ev)


def test_tws_sessionizer_parity(spark):
    """Where the TWS protocol is available: both arbitrary-state APIs
    must produce the identical session relation on sf0.001 events (one
    shared merge core, one oracle)."""
    import os

    import pytest

    if not _has_tws_protocol():
        pytest.skip("google.protobuf not installed in this container")

    from pyspark.sql import functions as F

    from summarydb_spark.streaming.stateful import (
        sessionize_with_timeout,
        sessionize_with_tws,
    )

    sf_dir = "/root/testdata/sf0.001"
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema

    def run(sessionize, name):
        stream = (
            spark.readStream.schema(schema)
            .parquet(os.path.join(sf_dir, "events.[p]arquet"))
            .select(
                "user_id",
                F.col("ts").cast("timestamp_ltz").alias("tstamp"),
                F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
            )
            .withWatermark("tstamp", "1 hour")
        )
        q = (
            sessionize(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {tuple(r) for r in spark.table(name).collect()}

    old = run(sessionize_with_timeout, "tws_parity_old")
    new = run(sessionize_with_tws, "tws_parity_new")
    assert old == new and old
