"""Golden tests for the query estimator, ported from
core/sum_estimator_test.go and core/count_op_test.go."""

import math

import pytest

from summarydb_spark.operators.estimator import (
    AggResult,
    LandmarkWindowRow,
    QueryParams,
    SummaryWindowRow,
    query_op,
    select_landmark_windows,
    select_summary_windows,
    stats_to_ci,
    sum_stats,
    z_score,
)


def unit_windows(skip=None):
    wins = []
    for i in range(5):
        if i == skip:
            continue
        wins.append(SummaryWindowRow(time_start=i * 5, time_end=(i + 1) * 5 - 1, count=1.0))
    return wins


def landmark_fixture():
    lw1 = LandmarkWindowRow(time_start=2, time_end=5, points=[(3, 1.0)])
    lw2 = LandmarkWindowRow(time_start=5, time_end=9, points=[(6, 1.0), (7, 1.0), (8, 1.0)])
    return [lw1, lw2]


# core/sum_estimator_test.go:16-32
def test_sum_stats_no_landmarks():
    bounds, stats = sum_stats(3, 21, unit_windows(), [], lambda w: w.count, lambda v: v)
    assert bounds == (3.0, 5.0)
    assert stats[0] == pytest.approx(3.8)
    assert stats[1] == pytest.approx(0.48)


# core/sum_estimator_test.go:34-65
def test_sum_stats_landmarks():
    bounds, stats = sum_stats(
        1, 21, unit_windows(skip=2), landmark_fixture(), lambda w: w.count, lambda v: v
    )
    assert bounds == (6.0, 8.0)
    assert stats[0] == pytest.approx(6.9)
    assert stats[1] == pytest.approx(0.49)


# core/count_op_test.go:33-67
def test_count_op_query_ci():
    agg = query_op(
        "count",
        unit_windows(skip=2),
        landmark_fixture(),
        1,
        21,
        QueryParams(confidence=0.5, sd_multiplier=1.0),
    )
    assert agg.value == pytest.approx(6.9, rel=1e-6)
    assert agg.error == pytest.approx(9.442857e-1, rel=1e-7)


def test_ci_clamps_to_bounds_at_full_confidence():
    mean, lo, hi = stats_to_ci((3.0, 5.0), (3.8, 0.48), 1.0, 1.0)
    assert (mean, lo, hi) == (3.8, 3.0, 5.0)
    assert math.isinf(z_score(1.0))


# core/max_op.go:32-63 + FIXTURES 2.6
def test_max_landmark_exactness():
    wins = [SummaryWindowRow(0, 9, count=10, sum=45, max=9.0)]
    lms = [LandmarkWindowRow(10, 12, points=[(11, 100.0)])]
    # no landmark overlap -> error flag 1.0
    r = query_op("max", wins, [], 0, 9)
    assert r.value == 9.0 and r.error == 1.0
    # landmark point in range -> exact, error 0.0
    r = query_op("max", wins, lms, 0, 11)
    assert r.value == 100.0 and r.error == 0.0
    # landmark window selected but point outside range -> inexact
    r = query_op("max", wins, lms, 0, 10)
    assert r.value == 9.0 and r.error == 1.0


def test_min_symmetric():
    wins = [SummaryWindowRow(0, 9, min=-3.0), SummaryWindowRow(10, 19, min=2.0)]
    r = query_op("min", wins, [], 0, 19)
    assert r.value == -3.0 and r.error == 1.0
    lms = [LandmarkWindowRow(20, 22, points=[(21, -50.0)])]
    r = query_op("min", wins, lms, 0, 21)
    assert r.value == -50.0 and r.error == 0.0


def test_selectors():
    wins = [
        SummaryWindowRow(0, 4),
        SummaryWindowRow(5, 9),
        SummaryWindowRow(10, 14),
    ]
    assert [w.time_start for w in select_summary_windows(wins, 6, 12)] == [5, 10]
    assert [w.time_start for w in select_summary_windows(wins, 20, 30)] == []

    lms = [
        LandmarkWindowRow(2, 5),
        LandmarkWindowRow(8, 12),
        LandmarkWindowRow(20, 25),
    ]
    # ceiling(t1=13) = 20: the window starting after t1 is still a candidate
    # (storage/query_index.go quirk), and survives the time_end >= t0 filter.
    sel = select_landmark_windows(lms, 3, 13)
    assert [w.time_start for w in sel] == [2, 8, 20]
    # time_end < t0 dropped
    sel = select_landmark_windows(lms, 6, 13)
    assert [w.time_start for w in sel] == [8, 20]
