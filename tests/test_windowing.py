"""Golden-parity tests for the decay windowing semantics.

All expected values are ported from the reference test suite
(/root/reference/core/pipeline_test.go, core/db_test.go,
window/generic_windowing_test.go, core/summarizer_test.go) — they are
engine-independent semantics, usable as oracles for any implementation.
"""

import pytest

from summarydb_spark.windowing import (
    CanonicalDecay,
    ExpWindowing,
    IdealWindowing,
    PowerWindowing,
    canonical_boundaries,
    carve_buffer,
    exp2_boundaries,
    exp2_sizes,
)

# core/pipeline_test.go:13-45 — 31 steps, exp(2), sizes oldest -> newest.
EXPECTED_EVOLUTION_EXP = [
    [1],
    [1, 1],
    [2, 1],
    [2, 1, 1],
    [2, 2, 1],
    [2, 2, 1, 1],
    [4, 2, 1],
    [4, 2, 1, 1],
    [4, 2, 2, 1],
    [4, 2, 2, 1, 1],
    [4, 4, 2, 1],
    [4, 4, 2, 1, 1],
    [4, 4, 2, 2, 1],
    [4, 4, 2, 2, 1, 1],
    [8, 4, 2, 1],
    [8, 4, 2, 1, 1],
    [8, 4, 2, 2, 1],
    [8, 4, 2, 2, 1, 1],
    [8, 4, 4, 2, 1],
    [8, 4, 4, 2, 1, 1],
    [8, 4, 4, 2, 2, 1],
    [8, 4, 4, 2, 2, 1, 1],
    [8, 8, 4, 2, 1],
    [8, 8, 4, 2, 1, 1],
    [8, 8, 4, 2, 2, 1],
    [8, 8, 4, 2, 2, 1, 1],
    [8, 8, 4, 4, 2, 1],
    [8, 8, 4, 4, 2, 1, 1],
    [8, 8, 4, 4, 2, 2, 1],
    [8, 8, 4, 4, 2, 2, 1, 1],
    [16, 8, 4, 2, 1],
]

# core/pipeline_test.go:48-71 — 22 steps, power(1, 1, 4, 1).
EXPECTED_EVOLUTION_POWER = [
    [1],
    [1, 1],
    [1, 1, 1],
    [1, 1, 1, 1],
    [1, 1, 1, 1, 1],
    [2, 1, 1, 1, 1],
    [2, 1, 1, 1, 1, 1],
    [2, 2, 1, 1, 1, 1],
    [2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    [2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1],
]


def test_evolution_exp2():
    decay = CanonicalDecay(ExpWindowing(2.0))
    for step, expected in enumerate(EXPECTED_EVOLUTION_EXP):
        decay.append(1)
        assert decay.sizes() == expected, f"step {step}"


def test_evolution_power():
    decay = CanonicalDecay(PowerWindowing(p=1, q=1, R=4, S=1))
    for step, expected in enumerate(EXPECTED_EVOLUTION_POWER):
        decay.append(1)
        assert decay.sizes() == expected, f"step {step}"


def test_exp2_closed_form_matches_simulation():
    decay = CanonicalDecay(ExpWindowing(2.0))
    for n in range(1, 600):
        decay.append(1)
        assert exp2_sizes(n) == decay.sizes(), f"n={n}"


def test_exp2_boundaries():
    assert exp2_boundaries(31) == [0, 16, 24, 28, 30, 31]
    assert sum(exp2_sizes(12345)) == 12345


# window/generic_windowing_test.go:14-70
def test_windows_covering_upto():
    ideal = IdealWindowing(ExpWindowing(2.0))
    assert ideal.windows_covering_upto(62) == [1, 2, 4, 8, 16]
    assert ideal.windows_covering_upto(63) == [1, 2, 4, 8, 16, 32]
    assert ideal.windows_covering_upto(0) == []


# core/db_test.go:11-59 — unbuffered, N=100, exp(2) -> 9 windows.
def test_window_count_n100_exp2_unbuffered():
    assert len(exp2_sizes(100)) == 9
    b = canonical_boundaries(ExpWindowing(2.0), 100)
    assert len(b) - 1 == 9
    assert b[-1] == 100


# core/db_test.go:312-340 — buffered (EachBufferSize=32), window counts after
# N and 2N appends (flush between runs replays identically in count space).
@pytest.mark.parametrize(
    "windowing,n,expected1,expected2",
    [
        (PowerWindowing(1, 1, 10, 1), 5000, 442, 598),
        (PowerWindowing(1, 1, 10, 1), 10000, 598, 910),
        (ExpWindowing(2.0), 5000, 16, 18),
        (ExpWindowing(2.0), 10000, 18, 20),
        (ExpWindowing(1.5), 10000, 33, 35),
    ],
)
def test_window_counts_buffered(windowing, n, expected1, expected2):
    lengths = IdealWindowing(windowing).windows_covering_upto(32)
    decay = CanonicalDecay(windowing)
    decay.extend_buffered(n, lengths)
    assert len(decay.sizes()) == expected1
    decay.extend_buffered(n, lengths)
    assert len(decay.sizes()) == expected2


# core/summarizer_test.go:106-131 — carve 20 points with lengths [2,4,6,8].
def test_carve_buffer():
    spans = carve_buffer([2, 4, 6, 8], 20)
    assert spans == [(0, 7), (8, 13), (14, 17), (18, 19)]


def test_carve_buffer_partial():
    # 9 elements against exp(2) lengths [1,2,4,8,16]: consumes 4+2+1,
    # leftover 2 elements are not carved (requeued by the reference).
    spans = carve_buffer([1, 2, 4, 8, 16], 9, full=False)
    assert spans == [(0, 3), (4, 5), (6, 6)]


def test_exp15_lengths_prefix():
    gen = ExpWindowing(1.5).lengths()
    assert [next(gen) for _ in range(8)] == [1, 2, 3, 4, 6, 8, 12, 18]


def test_jvm_boundary_binning_equals_udf(spark):
    """Round-7 VERDICT item 5: the general-base decay build bins via
    literal boundary arrays in pure JVM expressions when the stream-size
    set is driver-enumerable.  Equality with the pandas-UDF binning is
    exact (same searchsorted semantics), and the executed plan carries
    NO Python evaluator."""
    from pyspark.sql import Row

    from summarydb_spark.operators.summary import (
        _bucket_udf_general,
        bucketed_events,
        build_summary_windows,
    )
    from summarydb_spark.windowing import ExpWindowing, PowerWindowing

    rows = [
        Row(stream_id=sid, ts=i * 10 + sid, value=i * 0.5, seq=i)
        for sid in (0, 1, 2)
        for i in range(137 + 11 * sid)  # three DISTINCT sizes
    ]
    df = spark.createDataFrame(rows, "stream_id long, ts long, value double, seq long")
    from pyspark.sql import functions as F

    for windowing, buf in (
        (ExpWindowing(1.5), 0),
        (PowerWindowing(1, 1, 10, 1), 0),
        (ExpWindowing(1.5), 8),
    ):
        ev = bucketed_events(df, windowing, order_cols=("seq",), buffer_size=buf)
        plan = ev._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan, (
            windowing,
            buf,
        )
        udf = _bucket_udf_general(windowing, buf)
        via_udf = ev.drop("bucket").withColumn(
            "bucket", udf(F.col("idx"), F.col("n"))
        )
        got = {(r.stream_id, r.idx, r.bucket) for r in ev.collect()}
        want = {(r.stream_id, r.idx, r.bucket) for r in via_udf.collect()}
        assert got == want, (windowing, buf)
        assert got, "vacuous"
        # end-to-end: the summary build over the JVM path matches the
        # golden property count_end(max) = n-1 per stream
        summ = build_summary_windows(df, windowing, order_cols=("seq",), buffer_size=buf)
        tops = {
            r.stream_id: r.mx
            for r in summ.groupBy("stream_id").agg(F.max("count_end").alias("mx")).collect()
        }
        assert tops == {0: 136, 1: 147, 2: 158}


def test_jvm_binning_falls_back_above_budget(spark, monkeypatch):
    """Past the driver replay budget the general path must fall back to
    the executor-memoized UDF (the plan contains a Python evaluator) —
    never attempt an unbounded driver replay."""
    import summarydb_spark.operators.summary as summ_mod
    from summarydb_spark.operators.summary import bucketed_events
    from summarydb_spark.windowing import ExpWindowing

    monkeypatch.setattr(summ_mod, "JVM_BIN_MAX_TOTAL_REPLAY", 10)
    df = spark.createDataFrame(
        [(0, i, 0.5, i) for i in range(40)],
        "stream_id long, ts long, value double, seq long",
    )
    ev = bucketed_events(df, ExpWindowing(1.5), order_cols=("seq",))
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan or "ArrowEvalPython" in plan
