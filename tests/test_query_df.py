"""Batched query path (operators.query_df) vs the driver-side estimator.

``Stream.query`` evaluates the reference semantics in pure Python per
query; ``Stream.query_many`` runs the identical math as column
expressions over all ranges in one job.  Parity across a grid of ranges
— full span, edges, interior, disjoint, degenerate — is the oracle.
"""

from __future__ import annotations

import math

import pytest

from summarydb_spark.engine import QueryParams, SummaryDB
from summarydb_spark.windowing import ExpWindowing

PARAMS = QueryParams(confidence=0.95, sd_multiplier=1.0)

RANGES = [
    (0, 99),      # full span
    (0, 0),       # single oldest point
    (99, 99),     # single newest point
    (10, 35),     # interior, prorated edges
    (0, 63),      # aligned-ish prefix
    (64, 99),     # suffix
    (200, 300),   # beyond the data: no overlapping windows
    (85, 99),     # overlaps the landmark bracket (when present)
    (90, 95),     # inside the landmark bracket
]


def _close(a: float, b: float) -> bool:
    if math.isinf(a) or math.isinf(b):
        return a == b
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)


def _assert_parity(stream, op: str, with_bounds: bool) -> None:
    batched = {r["qid"]: r for r in stream.query_many(op, RANGES, PARAMS).collect()}
    assert len(batched) == len(RANGES)
    for i, (t0, t1) in enumerate(RANGES):
        single = stream.query(op, t0, t1, PARAMS)
        row = batched[i]
        assert _close(row["value"], single.value), (op, i, row, single)
        assert _close(row["error"], single.error), (op, i, row, single)
        if with_bounds:
            assert _close(row["lower_ci"], single.lower_ci), (op, i)
            assert _close(row["upper_ci"], single.upper_ci), (op, i)
            assert _close(row["lower_bound"], single.lower_bound), (op, i)
            assert _close(row["upper_bound"], single.upper_bound), (op, i)


@pytest.mark.parametrize("op", ["count", "sum", "max", "min"])
def test_query_many_matches_driver_path(spark, tmp_path, op):
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(
        ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0)
    )
    s.append_pairs([(i, float((i * 7) % 23)) for i in range(100)])
    _assert_parity(s, op, with_bounds=op in ("count", "sum"))


@pytest.mark.parametrize("op", ["count", "sum", "max", "min"])
def test_query_many_matches_driver_path_with_landmark(spark, tmp_path, op):
    db = SummaryDB(spark, str(tmp_path / "db"))
    s = db.new_stream(
        ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0)
    )
    s.append_pairs([(i, float(i)) for i in range(88)])
    s.start_landmark(88)
    s.append_pairs([(i, float(i)) for i in range(88, 96)])
    s.end_landmark(95)
    s.append_pairs([(i, float(i)) for i in range(96, 100)])
    _assert_parity(s, op, with_bounds=op in ("count", "sum"))


def test_db_level_query_many_across_streams(spark, tmp_path):
    """DB-level batched queries span streams in one job and agree with the
    per-stream paths (both the single-query estimator and query_many)."""
    from summarydb_spark.engine import QueryParams, SummaryDB
    from summarydb_spark.windowing import ExpWindowing

    db = SummaryDB(spark, str(tmp_path / "db"))
    s0 = db.new_stream(ops=["count", "sum", "max"], windowing=ExpWindowing(2.0))
    s1 = db.new_stream(ops=["count", "sum", "max"], windowing=ExpWindowing(2.0))
    s0.append_pairs([(i, float(i)) for i in range(200)])
    s1.append_pairs([(i, 2.0 * i) for i in range(300)])
    db.flush()

    params = QueryParams(confidence=0.95, sd_multiplier=1.0)
    triples = [
        (s0.stream_id, 0, 199),
        (s1.stream_id, 0, 299),
        (s0.stream_id, 13, 57),
        (s1.stream_id, 100, 250),
        (s1.stream_id, 400, 500),  # empty range
    ]
    for op in ("count", "sum", "max"):
        rows = {
            r["qid"]: r
            for r in db.query_many(
                op, triples, params if op != "max" else None
            ).collect()
        }
        assert len(rows) == len(triples)
        for i, (sid, t0, t1) in enumerate(triples):
            single = db.get_stream(sid).query(op, t0, t1, params)
            got = rows[i]
            if single.value != single.value:  # NaN (empty max)
                assert got["value"] != got["value"], (op, i)
            else:
                assert abs(got["value"] - single.value) <= max(
                    1e-9, 1e-12 * abs(single.value)
                ), (op, i, got["value"], single.value)


def test_query_many_prunes_store_partitions(spark, tmp_path):
    """The batched paths must push the queried stream set into the store
    scan as a PARTITION filter (the store is partitionBy(sid)): at 1M
    streams a 1-stream batch reads one directory, not the whole store."""
    import contextlib
    import io

    db = SummaryDB(spark, str(tmp_path / "db"))
    streams = [
        db.new_stream(ops=["count", "sum"], windowing=ExpWindowing(2.0))
        for _ in range(3)
    ]
    for k, s in enumerate(streams):
        s.append_pairs([(i, float(i + k)) for i in range(40)])
    db.flush()

    out = db.query_many("count", [(streams[0].stream_id, 0, 39)])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    part_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln and "sid" in ln
    ]
    assert any(
        "IN" in ln or "isnotnull" in ln or "=" in ln for ln in part_lines
    ), plan

    # pruned result == unpruned single-stream answer (other streams intact)
    row = out.collect()[0]
    single = streams[0].query("count", 0, 39)
    assert abs(row["value"] - single.value) < 1e-9

    # per-stream delegation keeps the old schema (no stream_id column)
    per_stream = streams[1].query_many("count", [(0, 39)])
    assert "stream_id" not in per_stream.columns
    got = per_stream.collect()[0]
    want = streams[1].query("count", 0, 39)
    assert abs(got["value"] - want.value) < 1e-9
