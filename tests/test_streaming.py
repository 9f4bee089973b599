"""Streaming ingest tests: incremental-merge == batch-rebuild equivalence,
file-source end-to-end, checkpoint restart/recovery, idempotent replay,
cross-batch clamp — the Spark equivalents of the reference's pipeline &
recovery test layers (core/pipeline_test.go, core/db_test.go:120-198)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from summarydb_spark.operators.incremental import merge_summary_increment
from summarydb_spark.operators.summary import SUMMARY_COLS, build_summary_windows
from summarydb_spark.streaming.ingest import StreamingSummarizer, load_state
from summarydb_spark.windowing import ExpWindowing, PowerWindowing

EVENT_SCHEMA = "stream_id long, ts long, value double, seq long"


def _events(n_per_stream, streams=(0, 1, 2)):
    rows = []
    for sid in streams:
        for i in range(n_per_stream):
            # halves: float sums are exact, so incremental (sum of partial
            # sums) and batch (sum of raw values) agree bit-for-bit
            rows.append(Row(stream_id=sid, ts=i * 10 + sid, value=i * 0.5, seq=i))
    return rows


def _canon(df):
    return sorted(
        tuple(r[c] for c in SUMMARY_COLS) for r in df.select(*SUMMARY_COLS).collect()
    )


@pytest.mark.parametrize(
    "windowing",
    [ExpWindowing(2.0), ExpWindowing(1.5), PowerWindowing(1, 1, 10, 1)],
    ids=["exp2", "exp1.5", "power"],
)
def test_incremental_equals_batch(spark, windowing):
    rows = _events(137)
    all_df = spark.createDataFrame(rows, EVENT_SCHEMA)
    batch_result = build_summary_windows(all_df, windowing, order_cols=("seq",))

    chunks = [37, 50, 1, 49]  # uneven micro-batches summing to 137
    state, counts, start = None, {}, 0
    for size in chunks:
        part = [r for r in rows if start <= r.seq < start + size]
        bdf = spark.createDataFrame(part, EVENT_SCHEMA)
        state = merge_summary_increment(
            state, bdf, windowing, base_counts=counts, order_cols=("seq",)
        )
        # materialize state (streaming writes parquet here) and roll counts
        state = spark.createDataFrame(state.collect(), state.schema)
        counts = {
            r["stream_id"]: r["n"]
            for r in state.groupBy("stream_id")
            .agg((F.max("count_end") + 1).alias("n"))
            .collect()
        }
        start += size

    assert _canon(state) == _canon(batch_result)


def _write_chunk(spark, dirpath, rows, name):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirpath)


def test_file_stream_end_to_end_and_golden_shape(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(31, streams=(0,))
    for lo, hi in ((0, 10), (10, 24), (24, 31)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")

    source = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), state, order_cols=("seq",))
    q = summ.start(source, cp, available_now=True)
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

    got = summ.summary()
    batch = build_summary_windows(
        spark.createDataFrame(rows, EVENT_SCHEMA), ExpWindowing(2.0), order_cols=("seq",)
    )
    assert _canon(got) == _canon(batch)
    # golden decay shape at N=31, exp(2): oldest->newest {16,8,4,2,1}
    # (reference core/pipeline_test.go:13-45 final state)
    sizes = [
        r["count"]
        for r in got.orderBy("count_start").select("count").collect()
    ]
    assert sizes == [16, 8, 4, 2, 1]


def test_restart_recovery_processes_only_new_data(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(100, streams=(0, 1))

    _write_chunk(spark, src, [r for r in rows if r.seq < 60], "a")
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), state, order_cols=("seq",))
    source = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = summ.start(source, cp, available_now=True)
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    _df, counts, _ = load_state(spark, state)
    assert counts == {0: 60, 1: 60}

    # new data lands while "down"; restart with the same checkpoint
    _write_chunk(spark, src, [r for r in rows if r.seq >= 60], "b")
    summ2 = StreamingSummarizer(spark, ExpWindowing(2.0), state, order_cols=("seq",))
    source2 = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q2 = summ2.start(source2, cp, available_now=True)
    assert q2.awaitTermination(120), "streaming query did not finish in 120s"

    got = summ2.summary()
    batch = build_summary_windows(
        spark.createDataFrame(rows, EVENT_SCHEMA), ExpWindowing(2.0), order_cols=("seq",)
    )
    assert _canon(got) == _canon(batch)


def test_idempotent_batch_replay(spark, tmp_path):
    state = str(tmp_path / "state")
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), state, order_cols=("seq",))
    bdf = spark.createDataFrame(_events(20, streams=(0,)), EVENT_SCHEMA)
    summ.process_batch(bdf, 0)
    _df, counts, _ = load_state(spark, state)
    summ.process_batch(bdf, 0)  # crash-replay of the same batch id
    _df2, counts2, _ = load_state(spark, state)
    assert counts == counts2 == {0: 20}


def test_streaming_session_window_with_watermark(spark, tmp_path):
    """Spark-native event-time operators the reference lacks entirely
    (SURVEY §2.6: no watermarks/session windows; late rows are clamped):
    a streaming session-window aggregation with a watermark over the same
    file-source events, as the engine's late-data-capable mode."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    out: dict = {}
    rows = []
    # two sessions per user: a burst at t=0..4 min, a burst at t=60..62 min
    for u in (1, 2):
        for m in range(5):
            rows.append((u, m))
        for m in (60, 61, 62):
            rows.append((u, m))
    df = spark.createDataFrame(
        [(u, f"2024-01-01 {m // 60:02d}:{m % 60:02d}:00") for u, m in rows],
        "user_id long, ts_str string",
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"))
    df.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id", F.session_window("ts", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def sink(batch, bid):
        for r in batch.collect():
            out.setdefault(r["user_id"], []).append(r["n"])

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    # watermark has passed the first session, so it is finalized: 5 events;
    # the second session (3 events) is still open and unemitted
    assert out == {1: [5], 2: [5]}


def test_clamp_across_batches(spark, tmp_path):
    """Out-of-order input is clamped to ts' = max(ts, prev+1) across batch
    boundaries (reference core/pipeline.go:80-84)."""
    state = str(tmp_path / "state")
    summ = StreamingSummarizer(
        spark,
        ExpWindowing(2.0),
        state,
        order_cols=("seq",),
        clamp_order_col="seq",
    )
    b1 = [Row(stream_id=0, ts=100, value=1.0, seq=0), Row(stream_id=0, ts=5, value=2.0, seq=1)]
    b2 = [Row(stream_id=0, ts=50, value=3.0, seq=2), Row(stream_id=0, ts=200, value=4.0, seq=3)]
    summ.process_batch(spark.createDataFrame(b1, EVENT_SCHEMA), 0)
    summ.process_batch(spark.createDataFrame(b2, EVENT_SCHEMA), 1)
    got = summ.summary().orderBy("count_start").collect()
    # reference clamp: 100, 101, 102, 200
    all_ts = []
    for r in got:
        all_ts.append((r["time_start"], r["time_end"]))
    assert got[-1]["time_end"] == 200
    flat = sorted(t for pair in all_ts for t in pair)
    assert flat[0] == 100
    total = sum(r["count"] for r in got)
    assert total == 4


def test_streaming_dedup_with_watermark(spark, tmp_path):
    """Exactly-once event dedup on (stream_id, seq) with a watermark bounding
    the dedup state — duplicate rows replayed in a later file are dropped,
    and state is evictable (the 100 TB discipline: unbounded-key dedup
    without a watermark OOMs the state store)."""
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    os.makedirs(src)
    first = [Row(stream_id=0, ts=i * 10, value=float(i), seq=i) for i in range(50)]
    # replay of 20 old rows (duplicates) + 10 genuinely new ones
    second = [Row(stream_id=0, ts=i * 10, value=float(i), seq=i) for i in range(30, 60)]
    spark.createDataFrame(first, EVENT_SCHEMA).write.parquet(src + "/b0")
    spark.createDataFrame(second, EVENT_SCHEMA).write.parquet(src + "/b1")

    out: list = []

    def sink(bdf, _bid):
        out.extend(r.asDict() for r in bdf.collect())

    # modern epoch base: near-zero event times make watermark arithmetic
    # (max_event - delay) clamp at/below epoch 0 and drop the first row
    base = 1_700_000_000_000_000
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(src + "/*")
        .withColumn("tstamp", F.timestamp_micros(F.col("ts") + F.lit(base)))
        .withWatermark("tstamp", "1 minute")
        .dropDuplicates(["stream_id", "seq"])
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    seqs = sorted(r["seq"] for r in out)
    assert seqs == list(range(60)), "each (stream,seq) must appear exactly once"


def test_stream_stream_interval_join(spark, tmp_path):
    """Stream-stream inner join with event-time range condition and
    watermarks on both sides (state for both inputs is bounded by the
    interval + watermark).  Click events join follow-up events of the same
    stream within (0, 30us] — validated against the batch join."""
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    cp = str(tmp_path / "cp")
    clicks = [Row(stream_id=i % 3, ts=i * 10, value=float(i), seq=i) for i in range(40)]
    follows = [
        Row(stream_id=i % 3, ts=i * 10 + 15, value=float(i), seq=1000 + i)
        for i in range(40)
    ]
    spark.createDataFrame(clicks, EVENT_SCHEMA).write.parquet(left_dir)
    spark.createDataFrame(follows, EVENT_SCHEMA).write.parquet(right_dir)

    # same modern-epoch shift as the dedup test: near-zero event times fall
    # below the clamped watermark and are dropped as late
    base = 1_700_000_000_000_000

    def stamped(d, alias):
        return (
            spark.readStream.schema(EVENT_SCHEMA)
            .parquet(d)
            .withColumn("tstamp", F.timestamp_micros(F.col("ts") + F.lit(base)))
            .withWatermark("tstamp", "1 minute")
            .alias(alias)
        )

    joined = stamped(left_dir, "l").join(
        stamped(right_dir, "r"),
        F.expr(
            "l.stream_id = r.stream_id AND "
            "r.tstamp > l.tstamp AND r.tstamp <= l.tstamp + INTERVAL 30 MICROSECONDS"
        ),
    )
    out: list = []

    def sink(bdf, _bid):
        out.extend(
            (r["l"]["seq"], r["r"]["seq"])
            for r in bdf.select(F.struct("l.*").alias("l"), F.struct("r.*").alias("r")).collect()
        )

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

    lb = spark.createDataFrame(clicks, EVENT_SCHEMA).alias("l")
    rb = spark.createDataFrame(follows, EVENT_SCHEMA).alias("r")
    expected = {
        (r["ls"], r["rs"])
        for r in lb.join(
            rb,
            F.expr(
                "l.stream_id = r.stream_id AND r.ts > l.ts AND r.ts <= l.ts + 30"
            ),
        )
        .select(F.col("l.seq").alias("ls"), F.col("r.seq").alias("rs"))
        .collect()
    }
    assert expected, "batch reference join must be non-empty"
    assert set(out) == expected


@pytest.mark.parametrize(
    "windowing", [ExpWindowing(2.0), PowerWindowing(1, 1, 10, 1)],
    ids=["exp2", "power"],
)
def test_sketch_incremental_equals_batch(spark, windowing):
    """Incremental sketch maintenance across uneven micro-batches lands on
    the same per-window sketch state as a one-shot build: bloom/cms maps
    and counts exactly (bit-OR / keywise-sum monoids are order-free), HLL
    distinct estimates exactly (register max), KLL quantiles approximately
    (compaction is merge-order dependent)."""
    from summarydb_spark.operators.incremental import merge_sketch_increment
    from summarydb_spark.operators.sketch_windows import build_sketch_windows
    from summarydb_spark.operators.summary import bucketed_events

    ops = ("bloom", "cms", "hll", "kll")
    rows = _events(97, streams=(0, 1))
    all_df = spark.createDataFrame(rows, EVENT_SCHEMA)
    batch_result = build_sketch_windows(
        bucketed_events(all_df, windowing, order_cols=("seq",)), ops
    )

    chunks = [29, 50, 18]
    state, counts, start = None, {}, 0
    for size in chunks:
        part = [r for r in rows if start <= r.seq < start + size]
        bdf = spark.createDataFrame(part, EVENT_SCHEMA)
        state = merge_sketch_increment(
            state, bdf, windowing, ops, counts, order_cols=("seq",)
        )
        state = spark.createDataFrame(state.collect(), state.schema)
        counts = {
            r["stream_id"]: r["n"]
            for r in state.groupBy("stream_id")
            .agg(F.sum("count").alias("n"))
            .collect()
        }
        start += size

    def canon(df):
        out = {}
        est = df.select(
            "*",
            F.hll_sketch_estimate("hll").alias("_nd"),
            F.kll_sketch_get_quantile_double("kll", F.lit(0.5)).alias("_med"),
        )
        for r in est.collect():
            key = (r["stream_id"], r["window_id"])
            out[key] = (
                r["time_start"], r["time_end"], r["count"],
                dict(r["bloom"]), dict(r["cms"]), r["_nd"], r["_med"],
            )
        return out

    got, want = canon(state), canon(batch_result)
    assert set(got) == set(want)
    for key in want:
        g, w = got[key], want[key]
        assert g[:5] == w[:5], (key, g, w)       # bounds, count, bloom, cms exact
        assert g[5] == w[5], (key, "hll estimate")
        assert abs(g[6] - w[6]) <= 5.0, (key, "kll median drift")


def test_streaming_sketch_state_end_to_end(spark, tmp_path):
    """File-source streaming with sketch_ops: after availableNow drains,
    the persisted sketch state answers membership/distinct/frequency
    queries identically to a batch-built sketch table."""
    from summarydb_spark.operators.sketch_windows import (
        build_sketch_windows,
        query_distinct,
        query_frequency,
        query_membership,
    )
    from summarydb_spark.operators.summary import bucketed_events
    from summarydb_spark.streaming.ingest import load_sketches

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(64, streams=(0, 1))
    for lo, hi in ((0, 20), (20, 45), (45, 64)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")

    ops = ("bloom", "cms", "hll")
    source = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    summ = StreamingSummarizer(
        spark, ExpWindowing(2.0), state, order_cols=("seq",), sketch_ops=ops
    )
    q = summ.start(source, cp, available_now=True)
    assert q.awaitTermination(180), "streaming query did not finish in 180s"

    got = load_sketches(spark, state)
    assert got is not None
    batch = build_sketch_windows(
        bucketed_events(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            ExpWindowing(2.0),
            order_cols=("seq",),
        ),
        ops,
    )
    for sid, t0, t1 in ((0, 0, 630), (1, 101, 401)):
        for fn, args in (
            (query_membership, (10.5,)),
            (query_membership, (9999.0,)),
            (query_frequency, (3.0,)),
            (query_distinct, ()),
        ):
            a = fn(got, sid, *args, t0, t1)
            b = fn(batch, sid, *args, t0, t1)
            assert a.value == b.value, (fn.__name__, sid, args, a, b)


def test_streaming_state_query_many_parity(spark, tmp_path):
    """Queries over the live streaming snapshot must agree with the
    driver-side estimator evaluated on the same windows — the uniform
    query surface works mid-ingest (the reference must flush first,
    core/stream.go:156-160)."""
    from summarydb_spark.operators.estimator import (
        QueryParams,
        SummaryWindowRow,
        query_op,
        select_summary_windows,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(60, streams=(0, 1))
    for lo, hi in ((0, 25), (25, 60)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")
    summ = StreamingSummarizer(spark, ExpWindowing(2.0), state)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    summ.start(stream, cp).awaitTermination()

    wins = {
        sid: [
            SummaryWindowRow(
                time_start=r["time_start"],
                time_end=r["time_end"],
                count=float(r["count"]),
                sum=r["sum"],
                max=r["max"],
                min=r["min"],
            )
            for r in summ.summary()
            .where(F.col("stream_id") == sid)
            .collect()
        ]
        for sid in (0, 1)
    }
    triples = [(0, 0, 590), (0, 100, 333), (1, 0, 101), (1, 550, 600), (0, 700, 800)]
    for op in ("count", "sum", "max", "min"):
        got = {r["qid"]: r for r in summ.query_many(op, triples).collect()}
        for qid, (sid, t0, t1) in enumerate(triples):
            want = query_op(
                op,
                select_summary_windows(wins[sid], t0, t1),
                [],
                t0,
                t1,
                QueryParams(),
            )
            assert got[qid]["value"] == pytest.approx(want.value, abs=1e-9), (
                op, sid, t0, t1,
            )


def test_streaming_query_many_sketch_parity(spark, tmp_path):
    """Batched sketch requests over the streaming snapshot must agree with
    the per-op single-query functions evaluated on the same state."""
    from summarydb_spark.operators.sketch_windows import (
        query_distinct,
        query_frequency,
        query_membership,
        query_quantile,
    )
    from summarydb_spark.streaming.ingest import load_sketches

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(64, streams=(0, 1))
    for lo, hi in ((0, 30), (30, 64)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")
    summ = StreamingSummarizer(
        spark,
        ExpWindowing(2.0),
        state,
        order_cols=("seq",),
        sketch_ops=("bloom", "cms", "hll", "kll"),
    )
    summ.start(
        spark.readStream.schema(EVENT_SCHEMA).parquet(src), cp
    ).awaitTermination()

    requests = [
        (0, "membership", 0, 630, 10.5),
        (1, "membership", 0, 630, 9999.0),
        (0, "frequency", 0, 630, 3.0),
        (1, "distinct", 101, 401),
        (0, "quantile", 0, 630, 0.5),
    ]
    got = {r["qid"]: r for r in summ.query_many_sketch(requests).collect()}
    sk = load_sketches(spark, state)
    single = [
        query_membership(sk, 0, 10.5, 0, 630),
        query_membership(sk, 1, 9999.0, 0, 630),
        query_frequency(sk, 0, 3.0, 0, 630),
        query_distinct(sk, 1, 101, 401),
        query_quantile(sk, 0, 0.5, 0, 630),
    ]
    import math

    for qid, want in enumerate(single):
        g = got[qid]
        if isinstance(want.value, float) and math.isnan(want.value):
            assert math.isnan(g["value"]), qid
        elif qid == 4:  # KLL merge randomization tolerance
            assert abs(g["value"] - want.value) <= max(2.0, 0.05 * abs(want.value))
        else:
            assert g["value"] == pytest.approx(want.value), qid


def test_streaming_watermark_gate_withholds_open_day(spark):
    """The append-mode watermark gate emits exactly the closed windows:
    union(emitted, withheld last day) == the plain batch daily counts."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["streaming_watermark_gate"](spark, sf).collect()
    got = {(r.w_start_us, r.event_type): r.n for r in rows}
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
        "event_type",
    )
    day_us = 86_400_000_000
    full = {
        (r.d * day_us, r.event_type): r.n
        for r in ev.groupBy(
            F.floor(F.col("t") / day_us).alias("d"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wm = ev.agg(F.max("t")).collect()[0][0] - 3_600_000_000
    closed = {k: v for k, v in full.items() if k[0] + day_us <= wm}
    withheld = {k for k in full if k not in closed}
    assert got == closed
    assert withheld, "fixture should leave the last day open"
    assert all(k not in got for k in withheld)


def test_streaming_dedup_gate_collapses_duplicate_delivery(spark):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = entry.queries()["streaming_dedup_gate"](spark, sf).collect()
    got = {r.event_type: r.n for r in rows}
    want = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{sf}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want  # doubled delivery, single counting


def test_per_stream_policies_in_one_streaming_job(spark, tmp_path):
    """ONE summarizer over a mixed-policy source: streams 0/2 decay
    exp(2), stream 1 decays power(1,1,10,1).  Each stream's final state
    must equal the single-policy batch rebuild of exactly its events —
    the reference's fixed-policy-per-stream contract (core/db.go:61-80)
    without the one-summarizer-per-policy workaround."""
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(77, streams=(0, 1, 2))
    for lo, hi in ((0, 25), (25, 60), (60, 77)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")

    policies = {
        0: ExpWindowing(2.0),
        1: PowerWindowing(1, 1, 10, 1),
        2: ExpWindowing(2.0),
    }
    source = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    summ = StreamingSummarizer(spark, policies, state, order_cols=("seq",))
    q = summ.start(source, cp, available_now=True)
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

    got = summ.summary()
    for sid, pol in policies.items():
        batch = build_summary_windows(
            spark.createDataFrame(
                [r for r in rows if r.stream_id == sid], EVENT_SCHEMA
            ),
            pol,
            order_cols=("seq",),
        )
        assert _canon(got.where(F.col("stream_id") == sid)) == _canon(batch), sid


def test_unmapped_stream_raises_loudly(spark, tmp_path):
    """A mixed-policy summarizer must refuse a batch containing a stream
    with no policy (silent row drops are corruption)."""
    state = str(tmp_path / "state")
    summ = StreamingSummarizer(
        spark, {0: ExpWindowing(2.0)}, state, order_cols=("seq",)
    )
    bdf = spark.createDataFrame(_events(10, streams=(0, 7)), EVENT_SCHEMA)
    with pytest.raises(ValueError, match="no windowing policy"):
        summ.process_batch(bdf, 0)


def test_uniform_policy_map_equals_single_policy(spark):
    """A {sid: policy} map where every stream shares one policy must be
    bit-identical to passing that policy directly — the routing layer
    cannot perturb the single-policy path."""
    rows = _events(83)
    bdf = spark.createDataFrame(rows, EVENT_SCHEMA)
    single = merge_summary_increment(
        None, bdf, ExpWindowing(2.0), order_cols=("seq",)
    )
    mapped = merge_summary_increment(
        None,
        bdf,
        {0: ExpWindowing(2.0), 1: ExpWindowing(2.0), 2: ExpWindowing(2.0)},
        order_cols=("seq",),
    )
    assert _canon(mapped) == _canon(single)
    # and mixing in a DIFFERENT policy changes only that stream
    mixed = merge_summary_increment(
        None,
        bdf,
        {0: ExpWindowing(2.0), 1: PowerWindowing(1, 1, 10, 1), 2: ExpWindowing(2.0)},
        order_cols=("seq",),
    )
    for sid in (0, 2):
        assert _canon(mixed.where(F.col("stream_id") == sid)) == _canon(
            single.where(F.col("stream_id") == sid)
        ), sid
    assert _canon(mixed.where(F.col("stream_id") == 1)) != _canon(
        single.where(F.col("stream_id") == 1)
    )


def test_rate_source_soak_kill_restart(spark, tmp_path):
    """A LIVE (non-file) source end-to-end: the rate source generates an
    unbounded offset-addressed stream (value = 0, 1, 2, ...), the query
    is KILLED while running — possibly mid-micro-batch — and a fresh
    summarizer restarts from the same checkpoint + state dir and ingests
    more.  Exactly-once accounting makes the final state a pure function
    of how many offsets were committed, so the post-restart summary must
    equal the batch rebuild over range(N) — the reference's WAL-replay
    contract (core/pipeline.go:294-335) under a source that is not a
    static file list (VERDICT r6 missing-item 1)."""
    import time

    from summarydb_spark.streaming.ingest import latest_version, load_state

    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")

    def mk_source():
        # deterministic row content from the offset alone: two streams,
        # strictly increasing ts, exact-half values
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 5000)
            .load()
            .select(
                (F.col("value") % 2).alias("stream_id"),
                F.col("value").alias("ts"),
                ((F.col("value") % 1024) * 0.5).alias("value"),
                F.col("value").alias("seq"),
            )
        )

    def mk_summ():
        return StreamingSummarizer(
            spark, ExpWindowing(2.0), state, order_cols=("seq",)
        )

    # phase 1: run live, kill once state exists (stop may interrupt an
    # in-flight batch — exactly the crash window the _COMMIT protocol
    # plus offset replay must cover)
    q = mk_summ().start(
        mk_source(), cp, available_now=False, processing_time="200 milliseconds"
    )
    deadline = time.time() + 120
    while latest_version(state) is None:
        assert time.time() < deadline, "phase-1 rate query committed no state"
        time.sleep(0.1)
    q.stop()
    _df, counts1, _ = load_state(spark, state)
    n1 = sum(counts1.values())
    assert n1 > 0

    # phase 2: restart from the same checkpoint, ingest strictly more
    summ2 = mk_summ()
    q2 = summ2.start(
        mk_source(), cp, available_now=False, processing_time="200 milliseconds"
    )
    deadline = time.time() + 120
    while True:
        _df, counts2, _ = load_state(spark, state)
        if sum(counts2.values()) > n1:
            break
        assert time.time() < deadline, "restart ingested no new offsets"
        time.sleep(0.1)
    q2.stop()

    # the committed prefix is contiguous: stream 0 holds the even
    # offsets, stream 1 the odd — counts must split N accordingly
    _df, counts, _ = load_state(spark, state)
    n = sum(counts.values())
    assert counts == {0: (n + 1) // 2, 1: n // 2}

    batch_rows = spark.range(n).select(
        (F.col("id") % 2).alias("stream_id"),
        F.col("id").alias("ts"),
        ((F.col("id") % 1024) * 0.5).alias("value"),
        F.col("id").alias("seq"),
    )
    batch = build_summary_windows(batch_rows, ExpWindowing(2.0), order_cols=("seq",))
    assert _canon(summ2.summary()) == _canon(batch)


def test_sketch_state_restart_equals_batch(spark, tmp_path):
    """Sketch-state recovery contract (the sketch twin of
    streaming_restart_gate): batch 0 is folded with its state version
    committed but NO checkpoint offsets (the tightest crash window);
    the restarted streaming query must skip the replayed batch
    idempotently for BOTH the scalar summary and the per-window sketch
    state, and the drained sketches must answer membership/frequency/
    distinct/quantile identically to a batch rebuild over all rows."""
    from summarydb_spark.operators.sketch_windows import (
        build_sketch_windows,
        query_distinct,
        query_frequency,
        query_membership,
        query_quantile,
    )
    from summarydb_spark.operators.summary import bucketed_events

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    cp = str(tmp_path / "cp")
    rows = _events(64, streams=(0, 1))
    for lo, hi in ((0, 20), (20, 45), (45, 64)):
        _write_chunk(spark, src, [r for r in rows if lo <= r.seq < hi], f"{lo}")

    ops = ("bloom", "cms", "hll", "kll")

    def mk_summ():
        return StreamingSummarizer(
            spark, ExpWindowing(2.0), state, order_cols=("seq",), sketch_ops=ops
        )

    # planted crash: fold EXACTLY file 1's rows as batch 0 (state +
    # sketches committed, offsets not)
    mk_summ().process_batch(
        spark.createDataFrame([r for r in rows if r.seq < 20], EVENT_SCHEMA), 0
    )

    summ2 = mk_summ()
    q = summ2.start(
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        cp,
        available_now=True,
    )
    assert q.awaitTermination(180), "restart did not drain"

    from summarydb_spark.streaming.ingest import load_sketches

    got = load_sketches(spark, state)
    batch = build_sketch_windows(
        bucketed_events(
            spark.createDataFrame(rows, EVENT_SCHEMA),
            ExpWindowing(2.0),
            order_cols=("seq",),
        ),
        ops,
    )
    for sid, t0, t1 in ((0, 0, 630), (1, 101, 401), (0, 150, 250)):
        for fn, args in (
            (query_membership, (10.5,)),
            (query_membership, (9999.0,)),
            (query_frequency, (3.0,)),
            (query_distinct, ()),
            (query_quantile, (0.5,)),
        ):
            a = fn(got, sid, *args, t0, t1)
            b = fn(batch, sid, *args, t0, t1)
            assert a.value == b.value, (fn.__name__, sid, args, a, b)
    # the scalar summary restarted identically too
    batch_summary = build_summary_windows(
        spark.createDataFrame(rows, EVENT_SCHEMA),
        ExpWindowing(2.0),
        order_cols=("seq",),
    )
    assert _canon(summ2.summary()) == _canon(batch_summary)


def test_socket_source_ingest_equals_batch(spark, tmp_path):
    """A NETWORK socket source — the in-container analogue of a Kafka
    consumer (non-replayable push ingest, arbitrary micro-batch
    boundaries): a local TCP server streams CSV events, the summarizer
    folds whatever each micro-batch delivers, and once all N events have
    been committed the state must equal the batch rebuild — proving the
    incremental fold is batch-boundary-insensitive under boundaries the
    test does NOT control (the reference's live Append loop,
    core/pipeline.go:80-95, fed from a real network peer)."""
    import socket
    import threading
    import time

    from summarydb_spark.streaming.ingest import load_state

    N = 256
    # integer-valued doubles: exact under any partial-sum split
    rows = [(i % 2, i * 10, float((i % 64) * 2), i) for i in range(N)]
    lines = "\n".join(f"{s},{t},{int(v)},{q}" for s, t, v, q in rows) + "\n"

    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    port = server.getsockname()[1]
    server.listen(1)
    done = threading.Event()

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(lines.encode())
            done.wait(180)  # hold the connection until the query stops

    th = threading.Thread(target=serve, daemon=True)
    th.start()

    src = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
        .select(F.split("value", ",").alias("p"))
        .select(
            F.element_at("p", 1).cast("long").alias("stream_id"),
            F.element_at("p", 2).cast("long").alias("ts"),
            F.element_at("p", 3).cast("double").alias("value"),
            F.element_at("p", 4).cast("long").alias("seq"),
        )
    )
    state = str(tmp_path / "state")
    summ = StreamingSummarizer(
        spark, ExpWindowing(2.0), state, order_cols=("seq",)
    )
    q = summ.start(
        src,
        str(tmp_path / "cp"),
        available_now=False,
        processing_time="200 milliseconds",
    )
    try:
        deadline = time.time() + 120
        while True:
            _df, counts, _ = load_state(spark, state)
            if sum(counts.values()) == N:
                break
            assert time.time() < deadline, (
                f"socket ingest stalled at {sum(counts.values())}/{N}"
            )
            time.sleep(0.2)
    finally:
        q.stop()
        done.set()
        server.close()

    batch = build_summary_windows(
        spark.createDataFrame(rows, EVENT_SCHEMA),
        ExpWindowing(2.0),
        order_cols=("seq",),
    )
    assert _canon(summ.summary()) == _canon(batch)
