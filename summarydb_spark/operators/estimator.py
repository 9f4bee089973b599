"""Error-bounded approximate range-query estimator.

Pure-Python implementation of the reference's query-time statistics,
operating on the (tiny — O(log N)) set of summary windows overlapping a
query range.  This is the *semantic reference* used by ``Stream.query`` and
the golden tests; ``summarydb_spark.operators.query_df`` implements the same
math as Spark column expressions for batched query evaluation at scale.

Parity sources (file:line into /root/reference):
- proration estimator: core/sum_estimator.go:34-118
- overlap math: stats/utils.go:15-22
- CI conversion: stats/utils.go:40-56 (z = InvCDF((1+confidence)/2),
  infinite z clamps to the hard bounds)
- count/sum query dispatch: core/count_op.go:39-67, core/sum_op.go:40-68
- max query + landmark exactness: core/max_op.go:32-63
- landmark window selection quirk: storage/query_index.go:48-74 candidates
  are ids in [floor(t0), ceiling(t1)] and the landmark post-filter only
  drops windows with time_end < t0 (core/stream_window_manager.go:115-130).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from statistics import NormalDist
from typing import Callable, List, Optional, Sequence, Tuple

MAX_FLOAT = 1.7976931348623157e308
NEG_INF_INIT = -MAX_FLOAT  # reference inits Max to -MaxFloat64 (core/data.go:19)


@dataclass
class QueryParams:
    confidence: float = 0.95
    sd_multiplier: float = 1.0


@dataclass
class AggResult:
    value: float
    error: float
    lower_ci: float = 0.0
    upper_ci: float = 0.0
    # Hard proration bounds (stats.Bounds): always bracket the exact answer;
    # the z-interval [lower_ci, upper_ci] is statistical and need not.
    lower_bound: float = 0.0
    upper_bound: float = 0.0


@dataclass
class SummaryWindowRow:
    time_start: int
    time_end: int
    count: float = 0.0
    sum: float = 0.0
    max: float = NEG_INF_INIT
    min: float = MAX_FLOAT


@dataclass
class LandmarkWindowRow:
    time_start: int
    time_end: int
    points: List[Tuple[int, float]] = field(default_factory=list)


def window_length(l: int, r: int) -> int:
    return r - l + 1


def window_overlap(l1: int, r1: int, l2: int, r2: int) -> int:
    return max(min(r1, r2) - max(l1, l2) + 1, 0)


def z_score(confidence: float) -> float:
    """z = InvCDF((1 + confidence) / 2); inf at confidence >= 1."""
    p = (1.0 + confidence) / 2.0
    if p >= 1.0:
        return math.inf
    return NormalDist().inv_cdf(p)


class _WindowInfo:
    __slots__ = ("start", "end", "sum", "overlap", "length")

    def __init__(self) -> None:
        self.start = 0
        self.end = 0
        self.sum = 0.0
        self.overlap = 1
        self.length = 1

    def set_values(self, w: SummaryWindowRow, value: float) -> None:
        self.start = w.time_start
        self.end = w.time_end
        self.sum = value

    def set_length_and_overlap(self, t0: int, t1: int) -> None:
        self.overlap = window_overlap(self.start, self.end, t0, t1)
        self.length = window_length(self.start, self.end)


def sum_stats(
    t0: int,
    t1: int,
    summary_windows: Sequence[SummaryWindowRow],
    landmark_windows: Sequence[LandmarkWindowRow],
    get_summary: Callable[[SummaryWindowRow], float],
    get_landmark: Callable[[float], float],
) -> Tuple[Tuple[float, float], Tuple[float, float]]:
    """Returns ((lower, upper), (mean, var)) — core/sum_estimator.go:34-118."""
    first = _WindowInfo()
    last = _WindowInfo()
    middle = _WindowInfo()
    landmark = _WindowInfo()

    n = len(summary_windows)
    total = 0.0
    for i, w in enumerate(summary_windows):
        v = get_summary(w)
        if i == 0:
            first.set_values(w, v)
        if i == n - 1:
            last.set_values(w, v)
        total += v

    if n == 1:
        last.sum = 0.0
    middle.sum = total - (first.sum + last.sum)

    first.set_length_and_overlap(t0, t1)
    last.set_length_and_overlap(t0, t1)

    lm_sum = 0.0
    for lw in landmark_windows:
        if first.start < lw.time_end:
            first.length -= window_overlap(lw.time_start, lw.time_end, first.start, first.end)
            first.overlap -= window_overlap(lw.time_start, lw.time_end, t0, first.end)
        if last.end > lw.time_start:
            last.length -= window_overlap(lw.time_start, lw.time_end, last.start, last.end)
            last.overlap -= window_overlap(lw.time_start, lw.time_end, last.start, t1)
        for ts, value in lw.points:
            if t0 <= ts <= t1:
                lm_sum += get_landmark(value)
    landmark.sum = lm_sum

    lower = upper = 0.0
    mean = var = 0.0
    for info in (landmark, first, middle, last):
        upper += info.sum
        if info.overlap == info.length:
            lower += info.sum
        if info.overlap > 0:
            ratio = float(info.overlap) / float(info.length)
            mean += info.sum * ratio
            var += info.sum * ratio * (1.0 - ratio)

    return (lower, upper), (mean, var)


def stats_to_ci(
    bounds: Tuple[float, float],
    stats: Tuple[float, float],
    sd_multiplier: float,
    confidence: float,
) -> Tuple[float, float, float]:
    """Returns (mean, lower_ci, upper_ci) — stats/utils.go:40-56."""
    mean, var = stats
    lower, upper = bounds
    z = z_score(confidence)
    if math.isinf(z):
        return mean, lower, upper
    # the proration var term sum*ratio*(1-ratio) goes negative when a
    # window's sum is negative; Go's math.Sqrt propagates NaN there
    # (stats/utils.go ConvertStatsBoundsToCI) where math.sqrt raises —
    # match the reference instead of crashing the query
    sd = sd_multiplier * (math.sqrt(var) if var >= 0.0 else float("nan"))
    return mean, max(mean - z * sd, lower), min(mean + z * sd, upper)


def select_landmark_windows(
    landmark_windows: Sequence[LandmarkWindowRow], t0: int, t1: int
) -> List[LandmarkWindowRow]:
    """Index-based candidate selection (storage/query_index.go:48-74) plus
    the landmark post-filter (core/stream_window_manager.go:124-126).

    Candidates are windows whose time_start lies in [floor(t0), ceiling(t1)]
    over the set of starts (falling back to min/max when absent); then only
    ``time_end < t0`` is dropped — a window starting after t1 can survive.
    """
    if not landmark_windows:
        return []
    starts = sorted(w.time_start for w in landmark_windows)
    floors = [s for s in starts if s <= t0]
    lo = floors[-1] if floors else starts[0]
    ceils = [s for s in starts if s >= t1]
    hi = ceils[0] if ceils else starts[-1]
    return [
        w
        for w in landmark_windows
        if lo <= w.time_start <= hi and w.time_end >= t0
    ]


def select_summary_windows(
    summary_windows: Sequence[SummaryWindowRow], t0: int, t1: int
) -> List[SummaryWindowRow]:
    """True-overlap filter; equivalent to the reference's floor/ceiling scan
    plus post-filter because summary windows tile time contiguously
    (core/stream_window_manager.go:78-93)."""
    return sorted(
        (w for w in summary_windows if w.time_end >= t0 and w.time_start <= t1),
        key=lambda w: w.time_start,
    )


_ESTIMATOR_OPS = {
    "count": (lambda w: w.count, lambda v: 1.0),
    "sum": (lambda w: w.sum, lambda v: v),
}


def query_op(
    op: str,
    summary_windows: Sequence[SummaryWindowRow],
    landmark_windows: Sequence[LandmarkWindowRow],
    t0: int,
    t1: int,
    params: Optional[QueryParams] = None,
) -> AggResult:
    """Evaluate one op over pre-selected overlapping windows.

    ``summary_windows`` must already be the overlap-filtered, time-ordered
    set; ``landmark_windows`` the index-selected set (see the two selectors).
    """
    params = params or QueryParams()

    if op in _ESTIMATOR_OPS:
        get_summary, get_landmark = _ESTIMATOR_OPS[op]
        bounds, stats = sum_stats(
            t0, t1, summary_windows, landmark_windows, get_summary, get_landmark
        )
        mean, lo, hi = stats_to_ci(bounds, stats, params.sd_multiplier, params.confidence)
        return AggResult(
            value=mean,
            error=hi - lo,
            lower_ci=lo,
            upper_ci=hi,
            lower_bound=bounds[0],
            upper_bound=bounds[1],
        )

    if op in ("max", "min"):
        sign = 1.0 if op == "max" else -1.0
        best = NEG_INF_INIT
        for w in summary_windows:
            v = w.max if op == "max" else -w.min
            best = max(best, v)
        error = 1.0
        for lw in landmark_windows:
            for ts, value in lw.points:
                if t0 <= ts <= t1:
                    best = max(best, sign * value)
                    error = 0.0
        return AggResult(value=sign * best, error=error)

    raise ValueError(f"unknown operator: {op}")
