"""Property-based tests (hypothesis) for the pure-Python core.

The example-based golden tests pin the reference's exact values
(core/pipeline_test.go, core/db_test.go); these generalize the same
invariants over randomized inputs — the closed forms must agree with the
merge-cascade simulation for EVERY n, and the estimator's statistical
outputs must respect their structural guarantees for every window layout.
All pure Python — no SparkSession."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from summarydb_spark.operators.estimator import (
    QueryParams,
    SummaryWindowRow,
    query_op,
    select_summary_windows,
    sum_stats,
)
from summarydb_spark.windowing import (
    CanonicalDecay,
    ExpWindowing,
    PowerWindowing,
    canonical_boundaries,
    exp2_boundaries,
    exp2_sizes,
)

# ---------------------------------------------------------------------------
# windowing closed forms vs the merge-cascade simulation
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=3000))
def test_exp2_closed_form_equals_simulation(n):
    decay = CanonicalDecay(ExpWindowing(2.0))
    decay.extend(n)
    assert exp2_sizes(n) == decay.sizes()
    b = exp2_boundaries(n)
    assert b[0] == 0 and b[-1] == n
    assert all(b[i] < b[i + 1] for i in range(len(b) - 1))


@settings(max_examples=15, deadline=None)
@given(
    st.sampled_from([ExpWindowing(2.0), ExpWindowing(1.5), ExpWindowing(3.0)]),
    st.integers(min_value=1, max_value=1500),
)
def test_canonical_boundaries_partition_and_coarsen(w, n):
    b = canonical_boundaries(w, n)
    # boundaries tile [0, n) exactly, strictly increasing
    assert b[0] == 0 and b[-1] == n
    sizes = [b[i + 1] - b[i] for i in range(len(b) - 1)]
    assert all(s > 0 for s in sizes)
    # decay invariant: sizes never increase from oldest to newest
    assert all(sizes[i] >= sizes[i + 1] for i in range(len(sizes) - 1))


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=1, max_value=1000),
)
def test_power_boundaries_partition(p, q, r, n):
    w = PowerWindowing(p=p, q=q, R=r, S=1)
    b = canonical_boundaries(w, n)
    assert b[0] == 0 and b[-1] == n
    assert all(b[i] < b[i + 1] for i in range(len(b) - 1))


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=800), st.integers(min_value=1, max_value=800))
def test_decay_is_prefix_consistent(n1, n2):
    """Appending in two chunks lands in the same canonical state as one
    chunk — the closed-form recompute's core assumption (the post-cascade
    state is a function of N alone, core/pipeline_test.go:13-45)."""
    a = CanonicalDecay(ExpWindowing(2.0))
    a.extend(n1)
    a.extend(n2)
    b = CanonicalDecay(ExpWindowing(2.0))
    b.extend(n1 + n2)
    assert a.sizes() == b.sizes()


# ---------------------------------------------------------------------------
# estimator invariants over random window layouts
# ---------------------------------------------------------------------------


@st.composite
def window_layouts(draw):
    """Contiguous summary windows over [0, T) with per-window count=length
    (ts = 0..T-1, value = 1.0 each), plus a random query range."""
    sizes = draw(
        st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=12)
    )
    t = 0
    wins = []
    for s in sizes:
        wins.append(
            SummaryWindowRow(
                time_start=t,
                time_end=t + s - 1,
                count=float(s),
                sum=float(s),
                max=1.0,
                min=1.0,
            )
        )
        t += s
    total = t
    t0 = draw(st.integers(min_value=-5, max_value=total + 5))
    t1 = draw(st.integers(min_value=t0, max_value=total + 10))
    return wins, total, t0, t1


@settings(max_examples=200, deadline=None)
@given(window_layouts(), st.sampled_from([0.5, 0.9, 0.95, 0.99, 1.0]))
def test_estimator_bounds_bracket_mean_and_truth(layout, conf):
    wins, total, t0, t1 = layout
    sel = select_summary_windows(wins, t0, t1)
    res = query_op("count", sel, [], t0, t1, QueryParams(confidence=conf))
    # hard bounds bracket both the mean and the exact answer
    exact = float(max(0, min(t1, total - 1) - max(t0, 0) + 1))
    eps = 1e-9
    assert res.lower_bound - eps <= res.value <= res.upper_bound + eps
    assert res.lower_bound - eps <= exact <= res.upper_bound + eps
    # the CI is clamped inside the hard bounds and contains the mean
    assert res.lower_bound - eps <= res.lower_ci <= res.value + eps
    assert res.value - eps <= res.upper_ci <= res.upper_bound + eps
    assert res.error >= -eps


@settings(max_examples=100, deadline=None)
@given(window_layouts())
def test_estimator_full_range_is_exact(layout):
    """A query covering every window exactly has zero variance: mean ==
    lower == upper == the true total (core/sum_estimator.go: ratio 1 on
    fully-covered edges)."""
    wins, total, _t0, _t1 = layout
    res = query_op("count", wins, [], 0, total - 1, QueryParams())
    assert res.value == float(total)
    assert res.lower_bound == res.upper_bound == float(total)
    assert res.error == 0.0


@settings(max_examples=100, deadline=None)
@given(window_layouts())
def test_estimator_variance_decomposition(layout):
    """sum_stats' mean/var come only from the two prorated edge windows:
    var <= first_sum * 1/4 + last_sum * 1/4 (x*(1-x) <= 1/4)."""
    wins, total, t0, t1 = layout
    sel = select_summary_windows(wins, t0, t1)
    bounds, stats = sum_stats(
        t0, t1, sel, [], lambda w: w.count, lambda v: 1.0
    )
    mean, var = stats
    cap = 0.0
    if sel:
        cap = sel[0].count / 4.0 + (sel[-1].count / 4.0 if len(sel) > 1 else 0.0)
    assert var <= cap + 1e-9
    assert bounds[0] - 1e-9 <= mean <= bounds[1] + 1e-9


@settings(max_examples=100, deadline=None)
@given(window_layouts())
def test_max_query_merges_overlapping(layout):
    wins, total, t0, t1 = layout
    sel = select_summary_windows(wins, t0, t1)
    res = query_op("max", sel, [], t0, t1)
    if sel:
        assert res.value == 1.0
        assert res.error == 1.0  # no landmark -> approximate flag
    else:
        assert math.isinf(res.value) or res.value == -1.7976931348623157e308
