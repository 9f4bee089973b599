"""SQL-registered approx-query surface (plans/sql_surface.py): the
``SELECT * FROM dsum(sid, t0, t1, conf)`` ergonomics layer must agree with
the engine's programmatic estimator (Stream.query) row for row, including
landmark corrections, CI clamping, and the conf >= 1 hard-bounds path."""

import math

import pytest

from summarydb_spark.engine import SummaryDB
from summarydb_spark.operators.estimator import QueryParams, z_score
from summarydb_spark.windowing import ExpWindowing


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sqlsurface")
    db = SummaryDB(spark, str(d))
    s0 = db.new_stream(
        ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0)
    )
    s1 = db.new_stream(
        ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0)
    )
    s0.append_pairs([(i, float(i % 37) + 0.25) for i in range(400)])
    # stream 1 carries a landmark bracket [100, 140] of exact rows
    s1.append_pairs([(i, float(i)) for i in range(100)])
    s1.start_landmark(100)
    s1.append_pairs([(t, 1000.0 + t) for t in range(100, 141)])
    s1.end_landmark(141)
    s1.append_pairs([(t, float(t)) for t in range(141, 300)])
    db.flush()
    db.register_sql()
    return db


def test_sdb_z_matches_python(db):
    rows = db.spark.sql(
        "SELECT sdb_z(0.5) z50, sdb_z(0.95) z95, sdb_z(0.99) z99, "
        "sdb_z(0.999) z999, sdb_z(1.0) zinf"
    ).collect()[0]
    assert rows["z50"] == pytest.approx(z_score(0.5), rel=1e-12)
    assert rows["z95"] == pytest.approx(z_score(0.95), rel=1e-12)
    assert rows["z99"] == pytest.approx(z_score(0.99), rel=1e-12)
    assert rows["z999"] == pytest.approx(z_score(0.999), rel=1e-12)
    assert math.isinf(rows["zinf"])


@pytest.mark.parametrize("op", ["count", "sum"])
def test_estimator_parity(db, op):
    spark = db.spark
    cases = [
        (0, 0, 399, 0.95),
        (0, 37, 311, 0.95),
        (0, 100, 120, 0.99),
        (0, 380, 399, 0.5),
        (0, 600, 700, 0.95),   # empty overlap
        (1, 0, 299, 0.95),     # spans the landmark bracket
        (1, 90, 150, 0.95),    # edge windows prorated around landmark
        (1, 110, 130, 0.95),   # inside the landmark only
        (1, 0, 299, 1.0),      # infinite z -> hard bounds
    ]
    for sid, t0, t1, conf in cases:
        got = spark.sql(
            f"SELECT * FROM d{op}({sid}, {t0}, {t1}, {conf})"
        ).collect()[0]
        want = db.get_stream(sid).query(
            op, t0, t1, QueryParams(confidence=conf)
        )
        assert got["value"] == pytest.approx(want.value, abs=1e-9), (sid, t0, t1)
        assert got["error"] == pytest.approx(want.error, abs=1e-9), (sid, t0, t1)
        assert got["lower_ci"] == pytest.approx(want.lower_ci, abs=1e-9)
        assert got["upper_ci"] == pytest.approx(want.upper_ci, abs=1e-9)
        assert got["lower_bound"] == pytest.approx(want.lower_bound, abs=1e-9)
        assert got["upper_bound"] == pytest.approx(want.upper_bound, abs=1e-9)


@pytest.mark.parametrize("op", ["max", "min"])
def test_minmax_parity(db, op):
    spark = db.spark
    cases = [
        (0, 0, 399),
        (0, 380, 399),
        (1, 0, 299),      # landmark points inside -> exact (error 0)
        (1, 110, 130),    # inside landmark only
        (1, 0, 99),       # before the landmark -> approximate (error 1)
    ]
    for sid, t0, t1 in cases:
        got = spark.sql(f"SELECT * FROM d{op}({sid}, {t0}, {t1})").collect()[0]
        want = db.get_stream(sid).query(op, t0, t1)
        assert got["value"] == pytest.approx(want.value), (op, sid, t0, t1)
        assert got["error"] == want.error, (op, sid, t0, t1)


def test_nolandmark_specialization_parity(db):
    """Registering with NO landmark views emits the specialized bodies
    (_estimator_body_nolmk / _minmax_body_nolmk); on a landmark-free
    stream they must agree with the programmatic estimator exactly like
    the full bodies do."""
    from summarydb_spark.plans.sql_surface import register_approx_functions

    spark = db.spark
    try:
        register_approx_functions(
            spark, "sdb_summary",
            count_col="count", sum_col="sum", max_col="max", min_col="min",
        )
        for t0, t1, conf in [(0, 399, 0.95), (37, 311, 0.95),
                             (380, 399, 0.5), (600, 700, 0.95),
                             (0, 399, 1.0)]:
            got = spark.sql(
                f"SELECT * FROM dsum(0, {t0}, {t1}, {conf})"
            ).collect()[0]
            want = db.get_stream(0).query(
                "sum", t0, t1, QueryParams(confidence=conf)
            )
            assert got["value"] == pytest.approx(want.value, abs=1e-9)
            assert got["error"] == pytest.approx(want.error, abs=1e-9)
            assert got["lower_bound"] == pytest.approx(want.lower_bound, abs=1e-9)
            assert got["upper_bound"] == pytest.approx(want.upper_bound, abs=1e-9)
        got = spark.sql("SELECT * FROM dmax(0, 0, 399)").collect()[0]
        want = db.get_stream(0).query("max", 0, 399)
        assert got["value"] == pytest.approx(want.value)
        assert got["error"] == want.error
        got = spark.sql("SELECT * FROM dmin(0, 37, 311)").collect()[0]
        want = db.get_stream(0).query("min", 37, 311)
        assert got["value"] == pytest.approx(want.value)
        assert got["error"] == want.error
    finally:
        # restore the full (landmark-aware) registration for later tests
        db.register_sql()


def test_lateral_batches_many_calls(db):
    """Q calls via LATERAL compile into one statement — the SQL analogue of
    query_many; results must match the per-call path."""
    spark = db.spark
    out = spark.sql(
        """
        WITH qr AS (
          SELECT 0 AS sid, 0 AS qid, CAST(0 AS BIGINT) t0, CAST(399 AS BIGINT) t1
          UNION ALL SELECT 0, 1, 37, 311
          UNION ALL SELECT 1, 2, 90, 150
        )
        SELECT q.qid, f.value, f.error
        FROM qr q, LATERAL dsum(q.sid, q.t0, q.t1, 0.95) f
        ORDER BY q.qid
        """
    ).collect()
    singles = [
        db.get_stream(0).query("sum", 0, 399),
        db.get_stream(0).query("sum", 37, 311),
        db.get_stream(1).query("sum", 90, 150),
    ]
    for row, want in zip(out, singles):
        assert row["value"] == pytest.approx(want.value, abs=1e-9)
        assert row["error"] == pytest.approx(want.error, abs=1e-9)


def test_multi_bracket_landmark_parity(spark, tmp_path):
    """Three separate landmark brackets: the floor/ceiling candidate
    selection (lead/lag row-wise filter) must agree with the driver-side
    select_landmark_windows across ranges that touch zero, one, several,
    or all brackets — including the reference quirk where a window
    starting after t1 survives as the ceiling candidate."""
    db = SummaryDB(spark, str(tmp_path / "multibr"))
    s = db.new_stream(ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0))
    t = 0
    for i in range(400):
        if t in (80, 200, 320):  # bracket starts
            s.start_landmark(t)
            s.append_pairs([(u, 500.0 + u) for u in range(t, t + 21)])
            s.end_landmark(t + 21)
            t += 21
        else:
            s.append_pairs([(t, float(t % 31))])
            t += 1
    db.flush()
    db.register_sql()

    cases = [
        (0, 60),      # before all brackets (ceiling quirk: bracket 1 may
                      # be selected but has no points in range)
        (0, t - 1),   # all three brackets
        (85, 95),     # inside bracket 1
        (60, 230),    # brackets 1 and 2, prorated edges
        (150, 190),   # between brackets
        (330, 399),   # tail spanning bracket 3's end
        (95, 325),    # straddles all three
    ]
    for op in ("count", "sum"):
        for t0, t1 in cases:
            got = spark.sql(f"SELECT * FROM d{op}(0, {t0}, {t1}, 0.95)").collect()[0]
            want = db.get_stream(0).query(op, t0, t1, QueryParams())
            assert got["value"] == pytest.approx(want.value, abs=1e-9), (op, t0, t1)
            assert got["lower_bound"] == pytest.approx(want.lower_bound, abs=1e-9), (op, t0, t1)
            assert got["upper_bound"] == pytest.approx(want.upper_bound, abs=1e-9), (op, t0, t1)
            assert got["error"] == pytest.approx(want.error, abs=1e-9), (op, t0, t1)
    for op in ("max", "min"):
        for t0, t1 in cases:
            got = spark.sql(f"SELECT * FROM d{op}(0, {t0}, {t1})").collect()[0]
            want = db.get_stream(0).query(op, t0, t1)
            assert got["value"] == pytest.approx(want.value), (op, t0, t1)
            assert got["error"] == want.error, (op, t0, t1)
