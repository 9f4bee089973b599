"""SQL-registered approximate-query surface: ``dsum(...)``-style functions.

SURVEY §4.1 item 3 — the thin SQL ergonomics layer over the §2.4 estimator
(``SELECT * FROM dsum(stream, q_t0, q_t1, 0.95)``).  The reference exposes its
query API only programmatically (core/stream.go:156-192); this module
registers the same semantics as *SQL-defined* functions — Spark 4 SQL UDFs
(``CREATE TEMPORARY FUNCTION ... RETURNS TABLE ... RETURN SELECT``) — so the
whole estimator inlines into Catalyst at parse time: pure relational algebra
over the summary store, no Python anywhere in the hot path, and N calls in
one statement (via ``LATERAL``) compile into one distributed plan.

Registered surface (table functions unless noted):

- ``dcount(q_sid, q_t0, q_t1, q_conf)`` / ``dsum(q_sid, q_t0, q_t1, q_conf)`` →
  (value, error, lower_ci, upper_ci, lower_bound, upper_bound) with the
  proration estimator + landmark corrections + CI clamp of
  core/sum_estimator.go:34-118 and stats/utils.go:40-56.
- ``dmax(q_sid, q_t0, q_t1)`` / ``dmin(q_sid, q_t0, q_t1)`` → (value, error) with the
  merge-all-overlapping + landmark-exactness model of core/max_op.go:39-63.
- ``sdb_z(q_conf)`` (scalar) — z = InvCDF((1+q_conf)/2) via Wichura's AS241
  (the same rational approximation CPython's ``NormalDist.inv_cdf`` uses),
  so SQL-surface CIs agree with the engine's Python estimator to the last
  ulp.  ``q_conf >= 1`` yields +inf, which the query functions clamp to the
  hard proration bounds exactly like stats/utils.go:47-49.
- ``sdb_ov(l1, r1, l2, r2)`` (scalar) — inclusive interval overlap,
  stats/utils.go:15-22.

Scale shape: a function call is a filter + one single-pass aggregate over the
summary store (O(log N) rows hit via parquet min-max pruning on
time_start/time_end) plus a broadcast-size landmark lookup; ``LATERAL`` over
a ranges relation batches Q calls into one plan, same as
``operators.query_df``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

MAX_FLOAT = "1.7976931348623157e308"

# --------------------------------------------------------------------------
# z-score: Wichura AS241 (Algorithm AS 241: The Percentage Points of the
# Normal Distribution, Applied Statistics 37, 1988) — coefficient-for-
# coefficient the rational approximations in CPython's statistics module,
# evaluated in the same Horner order so the SQL result matches
# NormalDist().inv_cdf bit-for-bit (modulo 1-ulp libm log differences).
# --------------------------------------------------------------------------

_AS241_CENTRAL_NUM = (
    "2.5090809287301226727e+3", "3.3430575583588128105e+4",
    "6.7265770927008700853e+4", "4.5921953931549871457e+4",
    "1.3731693765509461125e+4", "1.9715909503065514427e+3",
    "1.3314166789178437745e+2", "3.3871328727963666080e0",
)
_AS241_CENTRAL_DEN = (
    "5.2264952788528545610e+3", "2.8729085735721942674e+4",
    "3.9307895800092710610e+4", "2.1213794301586595867e+4",
    "5.3941960214247511077e+3", "6.8718700749205790830e+2",
    "4.2313330701600911252e+1", "1.0",
)
_AS241_MID_NUM = (
    "7.74545014278341407640e-4", "2.27238449892691845833e-2",
    "2.41780725177450611770e-1", "1.27045825245236838258e0",
    "3.64784832476320460504e0", "5.76949722146069140550e0",
    "4.63033784615654529590e0", "1.42343711074968357734e0",
)
_AS241_MID_DEN = (
    "1.05075007164441684324e-9", "5.47593808499534494600e-4",
    "1.51986665636164571966e-2", "1.48103976427480074590e-1",
    "6.89767334985100004550e-1", "1.67638483018380384940e0",
    "2.05319162663775882187e0", "1.0",
)
_AS241_FAR_NUM = (
    "2.01033439929228813265e-7", "2.71155556874348757815e-5",
    "1.24266094738807843860e-3", "2.65321895265761230930e-2",
    "2.96560571828504891230e-1", "1.78482653991729133580e0",
    "5.46378491116411436990e0", "6.65790464350110377720e0",
)
_AS241_FAR_DEN = (
    "2.04426310338993978564e-15", "1.42151175831644588870e-7",
    "1.84631831751005468180e-5", "7.86869131145613259100e-4",
    "1.48753612908506148525e-2", "1.36929880922735805310e-1",
    "5.99832206555887937690e-1", "4.38568698292030222960e0",
)


def _horner(coeffs, var: str) -> str:
    expr = coeffs[0]
    for c in coeffs[1:]:
        expr = f"({expr} * {var} + {c})"
    return expr


def _z_sql() -> list:
    """Scalar helpers: central / intermediate / far branches + dispatcher."""
    c = (
        "CREATE OR REPLACE TEMPORARY FUNCTION sdb_z_central(q DOUBLE) "
        "RETURNS DOUBLE RETURN q * "
        f"{_horner(_AS241_CENTRAL_NUM, '(0.180625 - q * q)')} / "
        f"{_horner(_AS241_CENTRAL_DEN, '(0.180625 - q * q)')}"
    )
    m = (
        "CREATE OR REPLACE TEMPORARY FUNCTION sdb_z_mid(r DOUBLE) "
        "RETURNS DOUBLE RETURN "
        f"{_horner(_AS241_MID_NUM, '(r - 1.6)')} / "
        f"{_horner(_AS241_MID_DEN, '(r - 1.6)')}"
    )
    f = (
        "CREATE OR REPLACE TEMPORARY FUNCTION sdb_z_far(r DOUBLE) "
        "RETURNS DOUBLE RETURN "
        f"{_horner(_AS241_FAR_NUM, '(r - 5.0)')} / "
        f"{_horner(_AS241_FAR_DEN, '(r - 5.0)')}"
    )
    # p = (1+q_conf)/2 >= 0.5 for q_conf >= 0, so q = p - 0.5 >= 0 and the
    # tail argument is r = 1 - p, mirroring CPython's branch structure
    z = (
        "CREATE OR REPLACE TEMPORARY FUNCTION sdb_z(q_conf DOUBLE) "
        "RETURNS DOUBLE RETURN CASE "
        "WHEN q_conf >= 1.0 THEN double('inf') "
        "WHEN abs((1.0 + q_conf) / 2.0 - 0.5) <= 0.425 "
        "  THEN sdb_z_central((1.0 + q_conf) / 2.0 - 0.5) "
        "WHEN sqrt(-ln(1.0 - (1.0 + q_conf) / 2.0)) <= 5.0 "
        "  THEN sdb_z_mid(sqrt(-ln(1.0 - (1.0 + q_conf) / 2.0))) "
        "ELSE sdb_z_far(sqrt(-ln(1.0 - (1.0 + q_conf) / 2.0))) END"
    )
    return [c, m, f, z]


_OV_FN = (
    "CREATE OR REPLACE TEMPORARY FUNCTION "
    "sdb_ov(l1 BIGINT, r1 BIGINT, l2 BIGINT, r2 BIGINT) RETURNS BIGINT "
    "RETURN greatest(least(r1, r2) - greatest(l1, l2) + CAST(1 AS BIGINT), "
    "CAST(0 AS BIGINT))"
)


def _parts_cte(sv: str, val: str) -> str:
    """First/middle/last decomposition of the overlapping summary windows as
    ONE single-pass aggregate (min_by/max_by on the unique-per-stream
    time_start), replacing a row_number/count window pair: the decorrelated
    LATERAL plan loses two Window nodes and their sort exchange per call
    group.  middle_sum is recovered as total - first - last downstream
    (exact for count — integer-valued doubles — and within ~1 ulp of the
    direct middle fold for sum, inside the estimator's 1e-9 parity
    tolerance)."""
    return f"""parts AS (
  SELECT count(*) AS nw,
         coalesce(min_by(CAST({val} AS DOUBLE), time_start), 0.0) AS first_sum,
         coalesce(min(time_start), CAST(0 AS BIGINT)) AS first_start,
         coalesce(min_by(time_end, time_start), CAST(0 AS BIGINT)) AS first_end,
         coalesce(max_by(CAST({val} AS DOUBLE), time_start), 0.0) AS last_sum_raw,
         coalesce(max(time_start), CAST(0 AS BIGINT)) AS last_start,
         coalesce(max_by(time_end, time_start), CAST(0 AS BIGINT)) AS last_end,
         coalesce(sum(CAST({val} AS DOUBLE)), 0.0) AS total_sum
  FROM {sv}
  WHERE stream_id = q_sid AND time_end >= q_t0 AND time_start <= q_t1
)"""


def _estimator_body_nolmk(sv: str, val: str) -> str:
    """Landmark-free specialization of :func:`_estimator_body`.

    When the engine registers the surface with no landmark views (the
    common case: streams without landmark brackets), every landmark CTE
    would join an empty relation — semantically zero, but the decorrelated
    LATERAL plan still pays a join subtree + stage wave per CTE (Catalyst's
    PropagateEmptyRelation does not reach inside the decorrelated
    correlated-subquery subtrees).  Emitting the specialized body at
    registration time halves the per-call stage waves; numerics of the
    shared CTEs are untouched (same expressions, same fold order)."""
    return f"""WITH {_parts_cte(sv, val)},
est AS (
  SELECT p.first_sum,
         CASE WHEN p.nw <= 2 THEN 0.0
              ELSE p.total_sum - p.first_sum - p.last_sum_raw END AS middle_sum,
         CASE WHEN p.nw <= 1 THEN 0.0 ELSE p.last_sum_raw END AS last_sum,
         0.0 AS lm_sum,
         p.first_end - p.first_start + 1 AS first_len,
         sdb_ov(p.first_start, p.first_end, q_t0, q_t1) AS first_ov,
         p.last_end - p.last_start + 1 AS last_len,
         sdb_ov(p.last_start, p.last_end, q_t0, q_t1) AS last_ov
  FROM parts p
),
acc AS (
  SELECT lm_sum + first_sum + middle_sum + last_sum AS ub,
         lm_sum + middle_sum
           + CASE WHEN first_ov = first_len THEN first_sum ELSE 0.0 END
           + CASE WHEN last_ov = last_len THEN last_sum ELSE 0.0 END AS lb,
         lm_sum + middle_sum
           + CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS mean,
         CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) * (1.0 - CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) * (1.0 - CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS var
  FROM est
)
SELECT mean AS value,
       CASE WHEN q_conf >= 1.0 THEN ub - lb
            ELSE least(mean + sdb_z(q_conf) * sqrt(var), ub)
               - greatest(mean - sdb_z(q_conf) * sqrt(var), lb) END AS error,
       CASE WHEN q_conf >= 1.0 THEN lb
            ELSE greatest(mean - sdb_z(q_conf) * sqrt(var), lb) END AS lower_ci,
       CASE WHEN q_conf >= 1.0 THEN ub
            ELSE least(mean + sdb_z(q_conf) * sqrt(var), ub) END AS upper_ci,
       lb AS lower_bound,
       ub AS upper_bound
FROM acc"""


def _minmax_body_nolmk(sv: str, val: str, sign: str) -> str:
    """Landmark-free specialization of :func:`_minmax_body` — no landmark
    point can make the answer exact, so error is constantly 1.0."""
    return f"""SELECT {sign}coalesce(max({val}), -{MAX_FLOAT}) AS value,
       1.0 AS error
FROM {sv}
WHERE stream_id = q_sid AND time_end >= q_t0 AND time_start <= q_t1"""


def _estimator_body(
    sv: str, val: str, lm_val: str, lwv: str, lpv: str
) -> str:
    """Function body: the full proration estimator for one (q_sid, q_t0, q_t1,
    q_conf).  ``val`` extracts the per-window aggregate, ``lm_val`` the
    per-landmark-point contribution (1.0 for count, p.value for sum).

    The landmark candidate selection reproduces the reference's index
    quirk (storage/query_index.go:48-74 + the post-filter at
    core/stream_window_manager.go:124-126): candidates are windows whose
    time_start lies in [floor(q_t0), ceiling(q_t1)] over the set of starts,
    then only time_end < q_t0 is dropped.  Edge-window length/overlap
    corrections follow core/sum_estimator.go:66-87 exactly (guards
    first.start < lw.end / last.end > lw.start, inclusive overlap math).
    """
    return f"""WITH {_parts_cte(sv, val)},
-- floor/ceiling candidate selection (storage/query_index.go:48-74) as a
-- PURE row-wise filter: the view carries precomputed next_start/prev_start
-- (lead/lag of time_start per stream).  "w.start is the maximal start
-- <= t0" == "the next start is absent or > t0"; symmetric for the
-- ceiling.  Row-wise predicates are the only landmark-selection shape
-- Catalyst can decorrelate under a LATERAL call — self-joins, aggregates,
-- and subquery expressions over function parameters all fail analysis.
lwsel AS (
  SELECT window_id, time_start AS ls, time_end AS le
  FROM {lwv}
  WHERE stream_id = q_sid AND time_end >= q_t0
    AND (time_start > q_t0 OR next_start IS NULL OR next_start > q_t0)
    AND (time_start < q_t1 OR prev_start IS NULL OR prev_start < q_t1)
),
-- per-landmark-window correction terms are projected row-wise FIRST (a
-- Project may mix parameter and local references; an aggregate argument
-- may not), then summed over pure-local columns
corr0 AS (
  SELECT
    CASE WHEN p.first_start < w.le
      THEN sdb_ov(w.ls, w.le, p.first_start, p.first_end)
      ELSE CAST(0 AS BIGINT) END AS c_first_len,
    CASE WHEN p.first_start < w.le
      THEN sdb_ov(w.ls, w.le, q_t0, p.first_end)
      ELSE CAST(0 AS BIGINT) END AS c_first_ov,
    CASE WHEN p.last_end > w.ls
      THEN sdb_ov(w.ls, w.le, p.last_start, p.last_end)
      ELSE CAST(0 AS BIGINT) END AS c_last_len,
    CASE WHEN p.last_end > w.ls
      THEN sdb_ov(w.ls, w.le, p.last_start, q_t1)
      ELSE CAST(0 AS BIGINT) END AS c_last_ov
  FROM parts p JOIN lwsel w ON true
),
corr AS (
  SELECT coalesce(sum(c_first_len), CAST(0 AS BIGINT)) AS d_first_len,
         coalesce(sum(c_first_ov), CAST(0 AS BIGINT)) AS d_first_ov,
         coalesce(sum(c_last_len), CAST(0 AS BIGINT)) AS d_last_len,
         coalesce(sum(c_last_ov), CAST(0 AS BIGINT)) AS d_last_ov
  FROM corr0
),
lm AS (
  SELECT coalesce(sum({lm_val}), 0.0) AS lm_sum
  FROM {lpv} p JOIN lwsel w ON p.window_id = w.window_id
  WHERE p.stream_id = q_sid AND p.ts >= q_t0 AND p.ts <= q_t1
),
est AS (
  SELECT p.first_sum,
         CASE WHEN p.nw <= 2 THEN 0.0
              ELSE p.total_sum - p.first_sum - p.last_sum_raw END AS middle_sum,
         CASE WHEN p.nw <= 1 THEN 0.0 ELSE p.last_sum_raw END AS last_sum,
         l.lm_sum,
         (p.first_end - p.first_start + 1) - c.d_first_len AS first_len,
         sdb_ov(p.first_start, p.first_end, q_t0, q_t1) - c.d_first_ov AS first_ov,
         (p.last_end - p.last_start + 1) - c.d_last_len AS last_len,
         sdb_ov(p.last_start, p.last_end, q_t0, q_t1) - c.d_last_ov AS last_ov
  FROM parts p, corr c, lm l
),
acc AS (
  SELECT lm_sum + first_sum + middle_sum + last_sum AS ub,
         lm_sum + middle_sum
           + CASE WHEN first_ov = first_len THEN first_sum ELSE 0.0 END
           + CASE WHEN last_ov = last_len THEN last_sum ELSE 0.0 END AS lb,
         lm_sum + middle_sum
           + CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS mean,
         CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) * (1.0 - CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) * (1.0 - CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS var
  FROM est
)
SELECT mean AS value,
       CASE WHEN q_conf >= 1.0 THEN ub - lb
            ELSE least(mean + sdb_z(q_conf) * sqrt(var), ub)
               - greatest(mean - sdb_z(q_conf) * sqrt(var), lb) END AS error,
       CASE WHEN q_conf >= 1.0 THEN lb
            ELSE greatest(mean - sdb_z(q_conf) * sqrt(var), lb) END AS lower_ci,
       CASE WHEN q_conf >= 1.0 THEN ub
            ELSE least(mean + sdb_z(q_conf) * sqrt(var), ub) END AS upper_ci,
       lb AS lower_bound,
       ub AS upper_bound
FROM acc"""


def _minmax_body(sv: str, val: str, sign: str, lwv: str, lpv: str) -> str:
    """max/min body (core/max_op.go:39-63): fold overlapping windows, then
    landmark points in [q_t0, q_t1] — a hit makes the answer exact (error 0).
    ``val``/``sign`` flip min into max-space (min = -max(-v))."""
    return f"""WITH base AS (
  SELECT coalesce(max({val}), -{MAX_FLOAT}) AS best
  FROM {sv}
  WHERE stream_id = q_sid AND time_end >= q_t0 AND time_start <= q_t1
),
lwsel AS (
  SELECT window_id
  FROM {lwv}
  WHERE stream_id = q_sid AND time_end >= q_t0
    AND (time_start > q_t0 OR next_start IS NULL OR next_start > q_t0)
    AND (time_start < q_t1 OR prev_start IS NULL OR prev_start < q_t1)
),
lpts AS (
  SELECT coalesce(max({sign}p.value), -{MAX_FLOAT}) AS lbest,
         count(*) AS np
  FROM {lpv} p JOIN lwsel w ON p.window_id = w.window_id
  WHERE p.stream_id = q_sid AND p.ts >= q_t0 AND p.ts <= q_t1
)
SELECT {sign}greatest(base.best, lpts.lbest) AS value,
       CASE WHEN lpts.np > 0 THEN 0.0 ELSE 1.0 END AS error
FROM base, lpts"""


#: last registration signature per SparkSession applicationId — see
#: register_approx_functions: identical re-registrations are skipped,
#: any different signature re-registers (late-bound view names make the
#: skip always safe)
_LAST_REGISTRATION: dict = {}

EMPTY_LANDMARK_WINDOWS_SCHEMA = (
    "stream_id long, window_id long, time_start long, time_end long, "
    "next_start long, prev_start long"
)
EMPTY_LANDMARK_POINTS_SCHEMA = (
    "stream_id long, window_id long, ts long, value double"
)


def register_approx_functions(
    spark: SparkSession,
    summary_view: str,
    *,
    count_col: str = "count",
    sum_col: str = "sum",
    max_col: str = "max",
    min_col: str = "min",
    landmark_windows_view: Optional[str] = None,
    landmark_points_view: Optional[str] = None,
) -> None:
    """Register the SQL approx-query surface over ``summary_view``.

    ``summary_view`` must expose (stream_id, time_start, time_end) plus the
    four aggregate columns.  ``landmark_windows_view`` needs (stream_id,
    window_id, time_start, time_end, next_start, prev_start) — the lead/lag
    of time_start per stream, precomputed so the floor/ceiling candidate
    selection stays a row-wise filter (see ``SummaryDB.register_sql`` for
    the materialization).  ``landmark_points_view`` needs (stream_id,
    window_id, ts, value).  If NEITHER landmark view is given, the
    landmark-free specialized bodies are registered instead — same
    numerics, half the per-call stage waves (see _estimator_body_nolmk).
    If exactly one is given, empty stand-ins fill the other.

    Idempotent re-registrations are SKIPPED (round 10): the ~7
    ``CREATE OR REPLACE TEMPORARY FUNCTION`` statements cost ~0.6 s of
    driver parse/analysis per call, and a repeat call with the identical
    argument signature re-creates byte-identical function bodies.  One
    last-signature slot per SparkSession is kept, and ANY caller with a
    different signature re-registers (so interleaving the engine's
    ``register_sql`` with the bench surface stays correct); the function
    bodies late-bind their view names (verified: a swapped temp view is
    picked up by the already-registered function), so skipping an
    identical re-registration can never pin stale data.
    """
    sig = (
        summary_view, count_col, sum_col, max_col, min_col,
        landmark_windows_view, landmark_points_view,
    )
    app_id = spark.sparkContext.applicationId
    if _LAST_REGISTRATION.get(app_id) == sig:
        return
    lwv = landmark_windows_view
    lpv = landmark_points_view
    no_landmarks = lwv is None and lpv is None
    if lwv is None and not no_landmarks:
        spark.createDataFrame([], EMPTY_LANDMARK_WINDOWS_SCHEMA) \
            .createOrReplaceTempView("sdb_empty_lmk_windows")
        lwv = "sdb_empty_lmk_windows"
    if lpv is None and not no_landmarks:
        spark.createDataFrame([], EMPTY_LANDMARK_POINTS_SCHEMA) \
            .createOrReplaceTempView("sdb_empty_lmk_points")
        lpv = "sdb_empty_lmk_points"

    for stmt in _z_sql():
        spark.sql(stmt)
    spark.sql(_OV_FN)

    head = (
        "CREATE OR REPLACE TEMPORARY FUNCTION {name}"
        "(q_sid BIGINT, q_t0 BIGINT, q_t1 BIGINT, q_conf DOUBLE) RETURNS TABLE "
        "(value DOUBLE, error DOUBLE, lower_ci DOUBLE, upper_ci DOUBLE, "
        "lower_bound DOUBLE, upper_bound DOUBLE) RETURN "
    )
    if no_landmarks:
        est = {
            "dcount": _estimator_body_nolmk(summary_view, f"`{count_col}`"),
            "dsum": _estimator_body_nolmk(summary_view, f"`{sum_col}`"),
        }
        mm = {
            "dmax": _minmax_body_nolmk(summary_view, f"`{max_col}`", ""),
            "dmin": _minmax_body_nolmk(summary_view, f"-`{min_col}`", "-"),
        }
    else:
        est = {
            "dcount": _estimator_body(
                summary_view, f"`{count_col}`", "1.0", lwv, lpv
            ),
            "dsum": _estimator_body(
                summary_view, f"`{sum_col}`", "p.value", lwv, lpv
            ),
        }
        mm = {
            "dmax": _minmax_body(summary_view, f"`{max_col}`", "", lwv, lpv),
            "dmin": _minmax_body(summary_view, f"-`{min_col}`", "-", lwv, lpv),
        }
    for name, body in est.items():
        spark.sql(head.format(name=name) + body)
    mm_head = (
        "CREATE OR REPLACE TEMPORARY FUNCTION {name}"
        "(q_sid BIGINT, q_t0 BIGINT, q_t1 BIGINT) RETURNS TABLE "
        "(value DOUBLE, error DOUBLE) RETURN "
    )
    for name, body in mm.items():
        spark.sql(mm_head.format(name=name) + body)
    _LAST_REGISTRATION[app_id] = sig
