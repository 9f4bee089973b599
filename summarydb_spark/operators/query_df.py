"""Batched range-query evaluation as Spark column expressions.

``operators.estimator`` evaluates ONE query driver-side over its O(log N)
overlapping windows — the right plan for a single lookup, mirroring the
reference's read path (core/stream.go:156-192).  This module evaluates
*many* (stream_id, t0, t1) ranges in ONE Spark job: the query batch joins
the summary store on interval overlap and the whole proration estimator —
edge-window proration, landmark length/overlap corrections, exact landmark
point sums, CI clamping (core/sum_estimator.go:34-118, stats/utils.go:40-56)
— runs as column math, one row per query.

Scale shape: with Q queries and W summary windows, the overlap join is
`broadcast(ranges) JOIN summary` (Q rows vs W rows — millions of queries
still broadcast in MBs), every subsequent step is a hash aggregate keyed on
the query id, and per-query cost is O(log N) joined rows.  This amortizes
Spark's per-job overhead across the whole batch — the same reason the
reference keeps query compilation lazy (SURVEY §7 "What's hard" #4).

Float caveat: the driver path accumulates parts in a fixed order; Spark's
aggregation order is nondeterministic, so results match the driver path to
~1 ulp (tests assert rel 1e-12), not bit-for-bit.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from summarydb_spark.operators.estimator import (
    NEG_INF_INIT,
    QueryParams,
    z_score,
)

_KEY = ["stream_id", "qid", "t0", "t1"]


def _overlap(l1: Column, r1: Column, l2: Column, r2: Column) -> Column:
    """Inclusive interval overlap, clamped at 0 (stats/utils.go:15-22)."""
    return F.greatest(
        F.least(r1, r2) - F.greatest(l1, l2) + F.lit(1), F.lit(0).cast("long")
    )


def _selected_landmarks(ranges: DataFrame, lwin: DataFrame) -> DataFrame:
    """Per query, the index-selected landmark windows: candidates with
    time_start in [floor(t0), ceiling(t1)] over the set of starts (min/max
    fallback), then only ``time_end < t0`` dropped — the reference's
    floor/ceiling scan + post-filter quirk (storage/query_index.go:48-74,
    core/stream_window_manager.go:115-130)."""
    j = ranges.join(F.broadcast(lwin), "stream_id")
    bounds = j.groupBy(*_KEY).agg(
        F.coalesce(
            F.max(F.when(F.col("time_start") <= F.col("t0"), F.col("time_start"))),
            F.min("time_start"),
        ).alias("lm_lo"),
        F.coalesce(
            F.min(F.when(F.col("time_start") >= F.col("t1"), F.col("time_start"))),
            F.max("time_start"),
        ).alias("lm_hi"),
    )
    return (
        j.join(F.broadcast(bounds), _KEY)
        .where(
            F.col("time_start").between(F.col("lm_lo"), F.col("lm_hi"))
            & (F.col("time_end") >= F.col("t0"))
        )
        .select(*_KEY, "window_id", "time_start", "time_end")
    )


def _parts(ranges: DataFrame, summary: DataFrame, val: Column) -> DataFrame:
    """First/middle/last decomposition of each query's overlapping summary
    windows (core/sum_estimator.go:34-64): one row per query with the edge
    windows' bounds and the three partial sums."""
    sel = (
        F.broadcast(ranges)
        .join(
            summary,
            (ranges.stream_id == summary.stream_id)
            & (summary.time_end >= ranges.t0)
            & (summary.time_start <= ranges.t1),
        )
        .select(
            ranges.stream_id, "qid", "t0", "t1",
            summary.time_start, summary.time_end, val.alias("val"),
        )
    )
    w = Window.partitionBy(*_KEY).orderBy("time_start")
    ranked = sel.withColumn("rn", F.row_number().over(w)).withColumn(
        "nw", F.count(F.lit(1)).over(Window.partitionBy(*_KEY))
    )
    parts = ranked.groupBy(*_KEY).agg(
        F.max("nw").alias("nw"),
        F.max(F.when(F.col("rn") == 1, F.col("val"))).alias("first_sum"),
        F.max(F.when(F.col("rn") == 1, F.col("time_start"))).alias("first_start"),
        F.max(F.when(F.col("rn") == 1, F.col("time_end"))).alias("first_end"),
        F.max(F.when(F.col("rn") == F.col("nw"), F.col("val"))).alias("last_sum_raw"),
        F.max(F.when(F.col("rn") == F.col("nw"), F.col("time_start"))).alias("last_start"),
        F.max(F.when(F.col("rn") == F.col("nw"), F.col("time_end"))).alias("last_end"),
        F.sum("val").alias("total_sum"),
    )
    # n == 1: the single window is "first"; last contributes 0
    # (core/sum_estimator.go: if n == 1 { last.sum = 0 })
    return parts.withColumn(
        "last_sum",
        F.when(F.col("nw") == 1, F.lit(0.0)).otherwise(F.col("last_sum_raw")),
    ).withColumn(
        "middle_sum", F.col("total_sum") - (F.col("first_sum") + F.col("last_sum"))
    )


def approx_range_frame(
    summary: DataFrame,
    ranges: DataFrame,
    op: str,
    params: Optional[QueryParams] = None,
    landmark_windows: Optional[DataFrame] = None,
    landmark_points: Optional[DataFrame] = None,
) -> DataFrame:
    """Evaluate ``op`` ("count" | "sum") for every range in one job.

    ``summary``: (stream_id, time_start, time_end, count, sum, ...);
    ``ranges``: (stream_id, qid, t0, t1);
    ``landmark_windows``: (stream_id, window_id, time_start, time_end);
    ``landmark_points``: (stream_id, window_id, ts, value).

    Returns (stream_id, qid, t0, t1, value, error, lower_ci, upper_ci,
    lower_bound, upper_bound) with the exact semantics of
    ``estimator.query_op`` — queries with no overlapping windows included
    (landmark-only contributions still apply).
    """
    if op not in ("count", "sum"):
        raise ValueError(f"approx_range_frame handles count/sum, got {op}")
    params = params or QueryParams()
    val = F.col("count") if op == "count" else F.col("sum")

    # join back on the FULL query key: two streams may legitimately carry
    # the same (qid, t0, t1) — e.g. callers issuing per-stream qid=0 like
    # the portable_sql twin — and a 3-column join would cross-match them
    parts = _parts(ranges, summary, val)
    base = ranges.join(parts, _KEY, "left")

    zero = F.lit(0).cast("long")
    # no-overlap queries flow through the Python defaults: a zero-sum
    # pseudo window at [0, 0] (estimator._WindowInfo)
    for c, d in (
        ("first_sum", F.lit(0.0)), ("last_sum", F.lit(0.0)),
        ("middle_sum", F.lit(0.0)),
        ("first_start", zero), ("first_end", zero),
        ("last_start", zero), ("last_end", zero),
    ):
        base = base.withColumn(c, F.coalesce(F.col(c), d))

    base = (
        base.withColumn("first_len", F.col("first_end") - F.col("first_start") + 1)
        .withColumn(
            "first_ov",
            _overlap(F.col("first_start"), F.col("first_end"), F.col("t0"), F.col("t1")),
        )
        .withColumn("last_len", F.col("last_end") - F.col("last_start") + 1)
        .withColumn(
            "last_ov",
            _overlap(F.col("last_start"), F.col("last_end"), F.col("t0"), F.col("t1")),
        )
    )

    if landmark_windows is not None:
        lsel = _selected_landmarks(ranges, landmark_windows)
        # length/overlap corrections against the edge windows
        # (core/sum_estimator.go:66-87)
        edges = base.select(
            *_KEY, "first_start", "first_end", "last_start", "last_end"
        )
        corr = (
            edges.join(lsel.withColumnRenamed("time_start", "lw_start")
                       .withColumnRenamed("time_end", "lw_end"), _KEY)
            .groupBy(*_KEY)
            .agg(
                F.sum(
                    F.when(
                        F.col("first_start") < F.col("lw_end"),
                        _overlap(F.col("lw_start"), F.col("lw_end"),
                                 F.col("first_start"), F.col("first_end")),
                    ).otherwise(zero)
                ).alias("first_len_corr"),
                F.sum(
                    F.when(
                        F.col("first_start") < F.col("lw_end"),
                        _overlap(F.col("lw_start"), F.col("lw_end"),
                                 F.col("t0"), F.col("first_end")),
                    ).otherwise(zero)
                ).alias("first_ov_corr"),
                F.sum(
                    F.when(
                        F.col("last_end") > F.col("lw_start"),
                        _overlap(F.col("lw_start"), F.col("lw_end"),
                                 F.col("last_start"), F.col("last_end")),
                    ).otherwise(zero)
                ).alias("last_len_corr"),
                F.sum(
                    F.when(
                        F.col("last_end") > F.col("lw_start"),
                        _overlap(F.col("lw_start"), F.col("lw_end"),
                                 F.col("last_start"), F.col("t1")),
                    ).otherwise(zero)
                ).alias("last_ov_corr"),
            )
        )
        base = base.join(corr, _KEY, "left")
        for c in ("first_len", "first_ov", "last_len", "last_ov"):
            base = base.withColumn(
                c, F.col(c) - F.coalesce(F.col(f"{c}_corr"), zero)
            )
        # exact landmark point contributions within [t0, t1], but only
        # from index-selected windows (query_op's selection contract)
        if landmark_points is not None:
            lp_val = F.lit(1.0) if op == "count" else F.col("value")
            lm = (
                lsel.join(
                    landmark_points.select("stream_id", "window_id", "ts", "value"),
                    ["stream_id", "window_id"],
                )
                .where(F.col("ts").between(F.col("t0"), F.col("t1")))
                .groupBy(*_KEY)
                .agg(F.sum(lp_val).alias("lm_sum"))
            )
            base = base.join(lm, _KEY, "left")
    base = base.withColumn("lm_sum", F.coalesce(
        F.col("lm_sum") if "lm_sum" in base.columns else F.lit(None).cast("double"),
        F.lit(0.0),
    ))

    def part_terms(s: Column, ov: Column, ln: Column):
        ratio = ov.cast("double") / ln.cast("double")
        lower = F.when(ov == ln, s).otherwise(F.lit(0.0))
        mean = F.when(ov > 0, s * ratio).otherwise(F.lit(0.0))
        var = F.when(ov > 0, s * ratio * (F.lit(1.0) - ratio)).otherwise(F.lit(0.0))
        return lower, mean, var

    one = F.lit(1).cast("long")
    f_lower, f_mean, f_var = part_terms(
        F.col("first_sum"), F.col("first_ov"), F.col("first_len")
    )
    l_lower, l_mean, l_var = part_terms(
        F.col("last_sum"), F.col("last_ov"), F.col("last_len")
    )
    # middle + landmark parts have overlap == length == 1 (ratio 1, var 0)
    m_lower, m_mean, _ = part_terms(F.col("middle_sum"), one, one)
    lm_lower, lm_mean, _ = part_terms(F.col("lm_sum"), one, one)

    est = (
        base.withColumn(
            "upper_bound",
            F.col("lm_sum") + F.col("first_sum") + F.col("middle_sum") + F.col("last_sum"),
        )
        .withColumn("lower_bound", lm_lower + f_lower + m_lower + l_lower)
        .withColumn("mean", lm_mean + f_mean + m_mean + l_mean)
        .withColumn("var", f_var + l_var)
    )

    z = z_score(params.confidence)
    if math.isinf(z):
        lo, hi = F.col("lower_bound"), F.col("upper_bound")
    else:
        sd = F.lit(params.sd_multiplier) * F.sqrt(F.col("var"))
        lo = F.greatest(F.col("mean") - F.lit(z) * sd, F.col("lower_bound"))
        hi = F.least(F.col("mean") + F.lit(z) * sd, F.col("upper_bound"))
    return est.select(
        "stream_id", "qid", "t0", "t1",
        F.col("mean").alias("value"),
        (hi - lo).alias("error"),
        lo.alias("lower_ci"),
        hi.alias("upper_ci"),
        "lower_bound",
        "upper_bound",
    )


def minmax_range_frame(
    summary: DataFrame,
    ranges: DataFrame,
    op: str,
    landmark_windows: Optional[DataFrame] = None,
    landmark_points: Optional[DataFrame] = None,
) -> DataFrame:
    """Batched max/min: merge all overlapping windows; landmark points in
    range answer exactly (error 0), else the 0/1 error flag stays 1
    (core/max_op.go:32-63)."""
    if op not in ("max", "min"):
        raise ValueError(f"minmax_range_frame handles max/min, got {op}")
    sign = 1.0 if op == "max" else -1.0
    val = F.col("max") if op == "max" else (F.lit(-1.0) * F.col("min"))

    sel = (
        F.broadcast(ranges)
        .join(
            summary,
            (ranges.stream_id == summary.stream_id)
            & (summary.time_end >= ranges.t0)
            & (summary.time_start <= ranges.t1),
        )
        .select(ranges.stream_id, "qid", "t0", "t1", val.alias("v"))
        .groupBy(*_KEY)
        .agg(F.max("v").alias("win_best"))
    )
    # full-key join: per-stream-constant qids must not cross-match streams
    base = ranges.join(sel, _KEY, "left")

    if landmark_windows is not None and landmark_points is not None:
        lsel = _selected_landmarks(ranges, landmark_windows)
        lm = (
            lsel.join(
                landmark_points.select("stream_id", "window_id", "ts", "value"),
                ["stream_id", "window_id"],
            )
            .where(F.col("ts").between(F.col("t0"), F.col("t1")))
            .groupBy(*_KEY)
            .agg(F.max(F.lit(sign) * F.col("value")).alias("lm_best"))
        )
        base = base.join(lm, _KEY, "left")
    else:
        base = base.withColumn("lm_best", F.lit(None).cast("double"))

    best = F.greatest(
        F.coalesce(F.col("win_best"), F.lit(NEG_INF_INIT)),
        F.coalesce(F.col("lm_best"), F.lit(NEG_INF_INIT)),
    )
    return base.select(
        "stream_id", "qid", "t0", "t1",
        (F.lit(sign) * best).alias("value"),
        F.when(F.col("lm_best").isNotNull(), F.lit(0.0))
        .otherwise(F.lit(1.0))
        .alias("error"),
    )
