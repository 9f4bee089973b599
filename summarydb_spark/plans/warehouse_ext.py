"""Warehouse / temporal-modeling coverage: SCD2, CDC compaction+merge,
attribution, sequence validation, and exact-arithmetic smoothing.

These extend the engine beyond the reference's time-decayed summaries
(core/summarizer.go, window/*) into the surrounding warehouse workflows a
user of the reference would otherwise hand-roll: versioned dimensions from
an append-only stream, changelog compaction, marketing attribution, and
transition-rule auditing.  Same one-template-two-dialects scheme as
portable_sql; all aggregates follow the BIGINT/DOUBLE normalization
contract (driver hashes are dtype-sensitive).

Determinism notes (cross-engine hash-match discipline):
- every window ORDER BY is a total order (``ts, event_id``);
- EWMA weights are exact powers of two joined from a literal relation (no
  libm pow), terms are integer-cents times dyadic weights, so every partial
  sum is exact in DOUBLE and summation order cannot matter;
- rolling medians interpolate only integer counts (midpoints are x.5,
  exact in DOUBLE on both engines);
- all day buckets go through explicit floor() (DuckDB's ``/`` is float
  division and its double->BIGINT cast rounds where Spark truncates).

Scale notes (100 TB discipline):
- scd2 / changelog compaction: one hash exchange on the entity key, then
  linear window work per partition; output is bounded by version count,
  not event count.
- attribution: the carry-forward last-touch is a single window pass (no
  self-join on the events fact); the aggregate output is O(#channels).
- state-machine audit: lag() over the same (user, time) partitioning the
  sessionizer uses; the allowed-transition relation is a literal
  broadcast.
- ewma: daily pre-aggregation first (shuffle bounded by #days), then a
  20-row-per-day range self-join on the tiny daily relation.
"""

from __future__ import annotations

import os

from summarydb_spark.plans.portable_sql import dsum, epoch_us

DAY_US = 86_400_000_000


def _ign_nulls(expr: str, dialect: str) -> str:
    """last_value(... IGNORE NULLS) — syntax placement differs."""
    if dialect == "spark":
        return f"last_value({expr}) IGNORE NULLS"
    return f"last_value({expr} IGNORE NULLS)"


def q_scd2_user_state(dialect: str) -> str:
    """SCD Type-2 dimension build from the append-only events stream: per
    user, collapse consecutive identical event_type rows into versioned
    validity intervals (valid_from/valid_to, is_current).  The reference
    persists only decayed numeric summaries (core/summarizer.go:38-53);
    this is the warehouse-side versioned-dimension twin over the same
    ingest ordering contract (strictly increasing per-stream time,
    core/pipeline.go:80-84).

    Gaps-and-islands via the rn-difference trick: grp = rn_user - rn_state
    is constant exactly within a run of equal states.  One shuffle on
    user_id; versions per user << events per user.
    """
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type AS state
  FROM events
  WHERE user_id % 7 = 0
),
r AS (
  SELECT user_id, t, state,
         row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
           - row_number() OVER (PARTITION BY user_id, state
                                ORDER BY t, event_id) AS grp
  FROM e
),
runs AS (
  SELECT user_id, state, grp,
         CAST(min(t) AS BIGINT) AS valid_from_us,
         CAST(count(*) AS BIGINT) AS n_events
  FROM r
  GROUP BY user_id, state, grp
),
v AS (
  SELECT user_id, state, valid_from_us, n_events,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY valid_from_us) AS BIGINT)
           AS version,
         lead(valid_from_us) OVER (PARTITION BY user_id
                                   ORDER BY valid_from_us) AS valid_to_us
  FROM runs
)
SELECT user_id, version, state, valid_from_us,
       CAST(coalesce(valid_to_us, -1) AS BIGINT) AS valid_to_us,
       CAST(CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END AS INT)
         AS is_current,
       n_events
FROM v"""


def q_attribution_last_touch(dialect: str) -> str:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent prior view/click within a 7-day lookback, else
    'direct'.  Single window pass with an IGNORE NULLS carry-forward — no
    self-join on the events fact, so the only exchange is the user_id
    hash partitioning and the output is O(#channels)."""
    t = epoch_us("ts", dialect)
    lt_type = _ign_nulls(
        "CASE WHEN event_type IN ('view','click') THEN event_type END",
        dialect,
    )
    lt_t = _ign_nulls(
        "CASE WHEN event_type IN ('view','click') THEN t END", dialect
    )
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type, value FROM events
),
w AS (
  SELECT user_id, t, event_type, value,
         {lt_type} OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type,
         {lt_t} OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_t
  FROM e
),
p AS (
  SELECT CASE WHEN touch_type IS NOT NULL
                   AND t - touch_t <= 7 * {DAY_US}
              THEN touch_type ELSE 'direct' END AS channel,
         value
  FROM w
  WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       {dsum('value')} AS revenue
FROM p
GROUP BY channel"""


def q_state_machine_violations(dialect: str) -> str:
    """Event-sequence audit: count observed per-user transitions that are
    not in the declared allowed-transition relation.  lag() over the same
    (user, time) total order the sessionizer uses; the rule set is a
    literal relation (broadcast at scale).  First event per user has no
    predecessor and is exempt."""
    t = epoch_us("ts", dialect)
    allowed = " UNION ALL ".join(
        f"SELECT '{p}' AS p, '{c}' AS c"
        for p, c in [
            ("signup", "view"),
            ("view", "view"),
            ("view", "click"),
            ("click", "view"),
            ("click", "click"),
            ("click", "purchase"),
            ("purchase", "view"),
            ("view", "error"),
            ("error", "view"),
        ]
    )
    return f"""
WITH allowed AS ({allowed}),
e AS (
  SELECT user_id, {t} AS t, event_id, event_type FROM events
),
tr AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY t, event_id) AS prev_type,
         event_type AS curr_type
  FROM e
)
SELECT tr.prev_type, tr.curr_type,
       CAST(count(*) AS BIGINT) AS n_violations,
       CAST(count(DISTINCT tr.user_id) AS BIGINT) AS n_users
FROM tr
LEFT JOIN allowed a ON a.p = tr.prev_type AND a.c = tr.curr_type
WHERE tr.prev_type IS NOT NULL AND a.p IS NULL
GROUP BY tr.prev_type, tr.curr_type"""


def q_changelog_compact_merge(dialect: str) -> str:
    """CDC changelog compaction + snapshot merge: compact the events
    changelog into a per-user latest-state snapshot at T0, compact the
    post-T0 delta the same way, then merge (delta wins — upsert
    semantics).  This is the batch twin of the engine's incremental merge
    (operators/incremental.py; reference core/merger.go merges window
    state the same last-writer way).  Both compactions are rank-1 window
    prunes on the entity key — one exchange each, and the merge joins two
    user-sized relations, not the fact."""
    t = epoch_us("ts", dialect)
    t0 = "1705363200000000"  # 2024-01-16 00:00:00 UTC in epoch micros
    compact = """
  SELECT user_id, event_type, value, t, n_versions FROM (
    SELECT user_id, event_type, value, t,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t DESC, event_id DESC) AS rk,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
             AS n_versions
    FROM {src}
  ) x WHERE rk = 1"""
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type, value FROM events
),
base_src AS (SELECT * FROM e WHERE t < {t0}),
delta_src AS (SELECT * FROM e WHERE t >= {t0}),
base AS ({compact.format(src='base_src')}),
delta AS ({compact.format(src='delta_src')}),
merged AS (
  SELECT coalesce(d.user_id, b.user_id) AS user_id,
         CASE WHEN d.user_id IS NOT NULL THEN 'delta' ELSE 'base' END
           AS src,
         coalesce(d.event_type, b.event_type) AS state_type,
         coalesce(d.value, b.value) AS state_value,
         coalesce(d.t, b.t) AS state_t,
         CAST(coalesce(b.n_versions, 0) + coalesce(d.n_versions, 0)
              AS BIGINT) AS n_versions
  FROM base b
  FULL OUTER JOIN delta d ON d.user_id = b.user_id
)
SELECT user_id, src, state_type,
       round(state_value, 2) AS state_value,
       CAST(state_t AS BIGINT) AS state_t_us,
       n_versions
FROM merged"""


def q_rolling_median_daily(dialect: str) -> str:
    """Trailing 7-observation rolling median of daily event counts per
    event type.  Median interpolates only integer counts (midpoints are
    exact .5 doubles), so the value hashes identically across engines.
    Daily pre-aggregation bounds the window input to #days rows per type —
    the window never sees the raw fact."""
    t = epoch_us("ts", dialect)
    med = (
        "percentile(n, 0.5)"
        if dialect == "spark"
        else "quantile_cont(n, 0.5)"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / {DAY_US}.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type, CAST(floor(({t}) / {DAY_US}.0) AS BIGINT)
)
SELECT event_type, d, n,
       CAST({med} OVER (PARTITION BY event_type ORDER BY d
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS med7
FROM daily"""


def q_ewma_halflife_daily(dialect: str) -> str:
    """EWMA of daily order revenue with a 1-day half-life over a 20-day
    lookback, in exact integer arithmetic: weights are 2^(19-k) joined
    from a literal relation (never libm pow), revenue is integer cents,
    so the weighted sum is an exact BIGINT (dominant term is daily
    rev_cents * 2^19 summed over 20 days — near 1e15 at sf0.1, so well
    inside BIGINT but NOT safely inside the 2^53 double-exact window at
    sf1+; the final floor-division therefore runs as pure INTEGER
    division, never through a double).  Normalized by the weights
    actually present, so missing days don't bias the level.

    Scale: the self-join runs on the daily aggregate (#days rows), not
    the fact; each row joins at most 20 partners."""
    weights = " UNION ALL ".join(
        f"SELECT {k} AS k, CAST({1 << (19 - k)} AS BIGINT) AS w"
        for k in range(20)
    )
    # ws, wt > 0, so floor(ws/wt) == integer division — exact in both
    # engines at any scale (Spark `DIV`, DuckDB `//`), no 2^53 ceiling
    idiv = "ws DIV wt" if dialect == "spark" else "ws // wt"
    return f"""
WITH wts AS ({weights}),
daily AS (
  SELECT CAST(floor(epoch_us / {DAY_US}.0) AS BIGINT) AS d,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,10))) * 100, 0)
              AS BIGINT) AS rev_cents
  FROM (
    SELECT {epoch_us('CAST(o_orderdate AS TIMESTAMP)', dialect)}
             AS epoch_us,
           o_totalprice
    FROM orders
  ) o
  GROUP BY CAST(floor(epoch_us / {DAY_US}.0) AS BIGINT)
),
win AS (
  SELECT a.d, a.rev_cents,
         CAST(sum(b.rev_cents * w.w) AS BIGINT) AS ws,
         CAST(sum(w.w) AS BIGINT) AS wt,
         CAST(count(*) AS BIGINT) AS n_days_in_window
  FROM daily a
  JOIN daily b ON b.d BETWEEN a.d - 19 AND a.d
  JOIN wts w ON w.k = a.d - b.d
  GROUP BY a.d, a.rev_cents
)
SELECT d, rev_cents,
       CAST({idiv} AS BIGINT) AS ewma_cents,
       n_days_in_window
FROM win"""


def q_salted_join_skew(dialect: str) -> str:
    """Skew-mitigated dimension join: the Spark side salts the (heavily
    skewed, 5-value) event_type key — facts get salt = event_id % 16, the
    dimension is exploded 16x — so no single reducer owns a whole hot key.
    The DuckDB oracle runs the plain unsalted join: salting must be
    answer-invariant, and the hash-match proves it.

    Here the dimension is literal-sized (it would broadcast anyway); the
    query pins the *pattern* used when the dimension is too large to
    broadcast and AQE's skew-join splitting isn't available (e.g. a
    bucketed pre-partitioned join at 100 TB)."""
    dim = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, {w} AS weight"
        for t, w in [
            ("click", 2),
            ("error", 0),
            ("purchase", 10),
            ("signup", 5),
            ("view", 1),
        ]
    )
    if dialect == "spark":
        salts = " UNION ALL ".join(f"SELECT {s} AS salt" for s in range(16))
        return f"""
WITH dim AS ({dim}),
salts AS ({salts}),
dim_x AS (SELECT d.event_type, d.weight, s.salt FROM dim d CROSS JOIN salts s),
e AS (
  SELECT event_type, value, CAST(pmod(event_id, 16) AS INT) AS salt
  FROM events
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {dsum('e.value * d.weight')} AS weighted_revenue
FROM e
JOIN dim_x d ON d.event_type = e.event_type AND d.salt = e.salt
GROUP BY e.event_type"""
    return f"""
WITH dim AS ({dim})
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {dsum('e.value * d.weight')} AS weighted_revenue
FROM events e
JOIN dim d ON d.event_type = e.event_type
GROUP BY e.event_type"""


def _poisson_thresholds() -> list[int]:
    """Cumulative Poisson(1) CDF thresholds scaled to 2^60, as exact
    integer literals (computed once here, identical text in both
    dialects — no engine libm involved)."""
    import math

    cum, out = 0.0, []
    for k in range(6):
        cum += math.exp(-1.0) / math.factorial(k)
        out.append(int(cum * (1 << 60)))
    return out


def q_bootstrap_mean_ci(dialect: str) -> str:
    """Poisson bootstrap CI for the mean purchase value: 64 resamples,
    each row weighted by an independent Poisson(1) draw derived from an
    md5 uniform (deterministic across engines, retries, and partitionings
    — the same PRNG-free discipline as weighted_sample_ares).  The per-
    resample mean is exact integer micro-units (decimal accumulation,
    then a sub-2^53 floor division); the CI is exact order statistics
    (ranks 2 and 63 of 64), not interpolated percentiles.

    Scale: resampling is a 64-way fanout of a single scan (pure column
    math, no shuffle until the per-resample aggregate, which is bounded
    by #resamples); the Poisson trick is how production bootstraps run on
    data too large to resample by index."""
    th = _poisson_thresholds()
    cast_s = "STRING" if dialect == "spark" else "VARCHAR"
    fan32 = (
        "LATERAL VIEW explode(sequence(0, 31)) AS r"
        if dialect == "spark"
        else ", unnest(range(32)) AS u32(r)"
    )
    if dialect == "spark":

        def hex60(pos: int) -> str:
            return f"CAST(conv(substring(h, {pos}, 15), 16, 10) AS BIGINT)"

    else:

        def hex60(pos: int) -> str:
            return f"CAST(concat('0x', substr(h, {pos}, 15)) AS BIGINT)"

    w = (
        f"CASE WHEN u < {th[0]} THEN 0 WHEN u < {th[1]} THEN 1 "
        f"WHEN u < {th[2]} THEN 2 WHEN u < {th[3]} THEN 3 "
        f"WHEN u < {th[4]} THEN 4 WHEN u < {th[5]} THEN 5 ELSE 6 END"
    )
    # Spark side: the testdata events table is a single-row-group file,
    # so the whole 32-way md5 fanout would run in ONE scan task (guide
    # §2.5 input skew — measured 2.5 s of the query's 2.8 s wall in a
    # single task at sf0.1).  Repartition the FILTERED purchases (two
    # narrow columns) before the fanout so the hash work spreads across
    # the cluster; the exchange moves kilobytes per thousand events.
    # The count must be EXPLICIT: the bytes feeding the exchange are far
    # below the AQE advisory size, so a keyed hint without a count is
    # coalesced straight back to one partition — the fanout is
    # compute-bound, not byte-bound, so it is sized to cluster width
    # (the same env the session master uses), not to data volume.
    # DuckDB text unchanged — its intra-file parallelism has no such
    # cliff, and the oracle must stay byte-identical.
    n_part = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    src = (
        f"(SELECT /*+ REPARTITION({n_part}, event_id) */ value, event_id"
        " FROM events"
        " WHERE value IS NOT NULL AND event_type = 'purchase') e"
        if dialect == "spark"
        else "events e"
    )
    where = (
        ""
        if dialect == "spark"
        else "\n  WHERE e.value IS NOT NULL AND e.event_type = 'purchase'"
    )
    return f"""
WITH sides AS (SELECT 0 AS i UNION ALL SELECT 1),
hs AS (
  SELECT r, e.value,
         md5(concat('boot:', CAST(r AS {cast_s}), ':',
                    CAST(e.event_id AS {cast_s}))) AS h
  FROM {src} {fan32}{where}
),
draws AS (
  -- one md5 yields two independent 60-bit uniforms (hex chars 1-15 and
  -- 17-31), so 32 hash rows serve 64 resamples — half the hash work
  SELECT 2 * hs.r + s.i AS r, value,
         CASE WHEN s.i = 0 THEN {hex60(1)} ELSE {hex60(17)} END AS u
  FROM hs CROSS JOIN sides s
),
weighted AS (
  SELECT r, value, {w} AS w FROM draws
),
means AS (
  SELECT r,
         CAST(floor(
           CAST(CAST(round(sum(CAST(value AS DECIMAL(38,10)) * w)
                           * 1000000, 0) AS BIGINT) AS DOUBLE)
           / sum(w)) AS BIGINT) AS mean_micro
  FROM weighted
  GROUP BY r
  HAVING sum(w) > 0
),
ranked AS (
  SELECT mean_micro,
         row_number() OVER (ORDER BY mean_micro, r) AS rk,
         count(*) OVER () AS n
  FROM means
)
SELECT CAST(max(n) AS BIGINT) AS n_resamples,
       CAST(floor(avg(mean_micro)) AS BIGINT) AS mean_of_means_micro,
       CAST(max(CASE WHEN rk = 2 THEN mean_micro END) AS BIGINT)
         AS ci_lo_micro,
       CAST(max(CASE WHEN rk = 63 THEN mean_micro END) AS BIGINT)
         AS ci_hi_micro
FROM ranked"""


def q_customer_rfm(dialect: str) -> str:
    """RFM segmentation: per-customer Recency (days before the corpus max
    order date), Frequency (order count), Monetary (exact decimal
    revenue), each scored into quintiles by ntile(5) over a total order
    (metric, custkey — deterministic across engines), then rolled up by
    the 3-digit RFM segment.  Two exchanges total: the per-customer
    aggregate, then the tiny segment rollup (ntile over #customers rows).
    """
    t = epoch_us("CAST(o_orderdate AS TIMESTAMP)", dialect)
    return f"""
WITH pc AS (
  SELECT o_custkey,
         max({t}) AS last_t,
         CAST(count(*) AS BIGINT) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(38,10))) AS monetary
  FROM orders
  GROUP BY o_custkey
),
mx AS (SELECT max(last_t) AS mt FROM pc),
c AS (
  -- global max via a 1-row aggregate cross join (broadcast), NOT an
  -- unpartitioned window — max() OVER () would force all customers
  -- into a single window partition at scale
  SELECT o_custkey,
         CAST(floor(mx.mt / {DAY_US}.0) AS BIGINT)
           - CAST(floor(last_t / {DAY_US}.0) AS BIGINT) AS recency_days,
         frequency, monetary
  FROM pc, mx
),
scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
  FROM c
)
SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(max(recency_days) AS BIGINT) AS max_recency_days,
       CAST(sum(frequency) AS BIGINT) AS total_orders,
       CAST(round(sum(monetary), 2) AS DOUBLE) AS total_revenue
FROM scored
GROUP BY r_score * 100 + f_score * 10 + m_score"""


def q_session_path_trigrams(dialect: str) -> str:
    """Top-20 within-session event-type trigram paths: sessionize (1h
    gap, the engine's session definition), then window leads give each
    3-step path without a self-join.  Complements the global bigram
    transition matrix (stats_ext markov_event_transitions) with
    session-scoped sequential patterns.  One exchange on user_id; the
    top-k runs on the tiny path-count relation."""
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type FROM events
),
d AS (
  SELECT user_id, t, event_id, event_type,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 3600000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t, event_id, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
),
tri AS (
  SELECT user_id,
         concat(event_type, '>',
                lead(event_type, 1) OVER w2, '>',
                lead(event_type, 2) OVER w2) AS path,
         lead(sid, 2) OVER w2 AS sid2, sid
  FROM s
  WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY t, event_id)
),
p AS (SELECT user_id, path FROM tri WHERE sid2 = sid AND path IS NOT NULL)
SELECT path,
       CAST(count(*) AS BIGINT) AS n_paths,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM p
GROUP BY path
ORDER BY n_paths DESC, path
LIMIT 20"""


def q_seasonal_naive_backtest(dialect: str) -> str:
    """Seasonal-naive forecast backtest: predict each day's per-type
    event count with the count 7 days earlier (the weekly-seasonality
    baseline every real forecaster must beat), then score MAE and WAPE
    in exact integer units.  The lag joins on the day INDEX (d-7), so
    calendar gaps never misalign the season; all error arithmetic is
    integer (WAPE = floor(sum|err| * 1e6 / sum(actual))).

    Scale: daily pre-aggregation bounds everything downstream to
    #days x #types rows; the backtest join is a self-join on that tiny
    relation."""
    t = epoch_us("ts", dialect)
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / {DAY_US}.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  GROUP BY event_type, CAST(floor(({t}) / {DAY_US}.0) AS BIGINT)
),
j AS (
  SELECT a.event_type, a.d, a.n, b.n AS fc,
         abs(a.n - b.n) AS abs_err
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type AND b.d = a.d - 7
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(sum(abs_err) AS BIGINT) AS total_abs_err,
       CAST(floor(sum(abs_err) * 1000000.0 / sum(n)) AS BIGINT)
         AS wape_ppm,
       CAST(floor(sum(abs_err) * 1000.0 / count(*)) AS BIGINT)
         AS mae_milli
FROM j
GROUP BY event_type"""


def q_rolling_ols_slope(dialect: str) -> str:
    """Trailing 14-observation OLS trend slope of daily per-type counts,
    in exact integer arithmetic: with x = day index and y = integer
    counts, every windowed power sum (Sx, Sy, Sxy, Sxx) is an exact
    BIGINT, so slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is an exact
    integer ratio reported in milli-units via integer division.
    Complements the global OLS (stats_ext linreg) with the windowed
    trend detector a monitoring pipeline actually runs.

    Magnitudes: d ~ 2e4 (epoch days), so n*Sxx ~ 14^2 * 4e8 ~ 8e10 and
    the milli-scaled numerator stays far inside BIGINT."""
    idiv = "div" if dialect == "spark" else "//"
    t = epoch_us("ts", dialect)
    w = (
        "OVER (PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / {DAY_US}.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events
  GROUP BY event_type, CAST(floor(({t}) / {DAY_US}.0) AS BIGINT)
),
win AS (
  SELECT event_type, d, y,
         count(*) {w} AS n,
         sum(d) {w} AS sx,
         sum(y) {w} AS sy,
         sum(d * y) {w} AS sxy,
         sum(d * d) {w} AS sxx
  FROM daily
)
SELECT event_type, d, y,
       CAST(n AS BIGINT) AS n_window,
       CAST(CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                 ELSE ((n * sxy - sx * sy) * 1000)
                      {idiv} (n * sxx - sx * sx) END AS BIGINT)
         AS slope_milli
FROM win"""


def q_snapshot_diff_counts(dialect: str) -> str:
    """Snapshot diff (the CDC audit twin of changelog_compact_merge):
    compare the per-user compacted state BEFORE T0 against the state
    over ALL events, classifying each user as added (first seen after
    T0), state_changed, value_changed, or unchanged, rolled up by final
    state type.  Two rank-1 compactions + one join of user-sized
    relations — the diff never touches the fact twice."""
    t = epoch_us("ts", dialect)
    t0 = "1705363200000000"  # 2024-01-16 00:00:00 UTC
    compact = """
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t DESC, event_id DESC) AS rk
    FROM {src}
  ) x WHERE rk = 1"""
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type, value FROM events
),
old_src AS (SELECT * FROM e WHERE t < {t0}),
old AS ({compact.format(src='old_src')}),
new AS ({compact.format(src='e')}),
diff AS (
  SELECT n.user_id, n.event_type AS state,
         CASE WHEN o.user_id IS NULL THEN 'added'
              WHEN o.event_type <> n.event_type THEN 'state_changed'
              WHEN o.value <> n.value THEN 'value_changed'
              ELSE 'unchanged' END AS change
  FROM new n LEFT JOIN old o ON o.user_id = n.user_id
)
SELECT state, change, CAST(count(*) AS BIGINT) AS n_users
FROM diff
GROUP BY state, change"""


def q_variant_props_profile(dialect: str) -> str:
    """Semi-structured profiling through Spark 4's native VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` paths — the
    shredded-at-parse representation that replaces repeated
    ``get_json_object`` string walks at scale (one parse per row, typed
    access after).  DuckDB oracle uses its JSON extraction; both
    aggregate the extracted integer into a decile profile joined with
    the numeric value stats."""
    if dialect == "spark":
        k = "CAST(variant_get(parse_json(props), '$.k', 'bigint') AS BIGINT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    return f"""
WITH x AS (
  SELECT {k} AS k, value, user_id FROM events
)
SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       {dsum('value')} AS value_sum
FROM x
GROUP BY CAST(floor(k / 10.0) AS BIGINT)"""


def q_peak_concurrency_daily(dialect: str) -> str:
    """Peak concurrent sessions per day via the interval sweep: each 1h-gap
    session contributes +1 at its start and -1 just after its end; the
    running sum over the global (time, delta) order is the live-session
    count, and its per-day max is the capacity-planning number.  The sweep
    runs over 2 rows per session (not per event), and ties order
    (+1 before -1 at equal timestamps? NO — ends sort FIRST via delta
    ascending, so back-to-back sessions at the same microsecond don't
    inflate the peak).

    Scale note: the running sum is a global-order window — at 100 TB the
    sweep would range-partition by time with per-partition offsets (the
    standard parallel prefix-sum); session endpoints are ~1e-4 of events,
    so the windowed relation is tiny relative to the fact."""
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id FROM events
),
d AS (
  SELECT user_id, t, event_id,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 3600000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
),
sess AS (
  SELECT user_id, sid, min(t) AS t_start, max(t) AS t_end
  FROM s GROUP BY user_id, sid
),
pts AS (
  SELECT t_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT t_end + 1, -1 FROM sess
),
sweep AS (
  SELECT t,
         sum(delta) OVER (ORDER BY t, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM pts
)
SELECT CAST(floor(t / {DAY_US}.0) AS BIGINT) AS d,
       CAST(max(live) AS BIGINT) AS peak_concurrent,
       CAST(count(*) AS BIGINT) AS n_endpoints
FROM sweep
GROUP BY CAST(floor(t / {DAY_US}.0) AS BIGINT)"""


def q_attribution_linear(dialect: str) -> str:
    """Linear (equal-split) multi-touch attribution: every view/click in
    the 7-day lookback shares a purchase's credit equally, in EXACT
    integer micro-units — each touch gets value_micro div k and the
    division remainder goes to the most recent touch, so per-purchase
    credit conserves to the cent by construction (the test asserts the
    global conservation identity).  Purchases with no touches credit
    'direct'.

    Unlike last-touch (one window pass), linear attribution inherently
    needs the purchases x touches interval join; it stays bounded
    because the join is equi on user_id with a 7-day band — per-user
    touch lists, never a cross join."""
    idiv = "div" if dialect == "spark" else "//"
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id, event_type, value FROM events
),
p AS (
  SELECT user_id, t AS pt, event_id AS pid,
         CAST(round(value * 1000000, 0) AS BIGINT) AS vmicro
  FROM e WHERE event_type = 'purchase' AND value IS NOT NULL
),
tch AS (
  SELECT user_id, t AS tt, event_id AS tid, event_type AS channel
  FROM e WHERE event_type IN ('view', 'click')
),
j AS (
  SELECT p.pid, p.vmicro, tch.channel, tch.tt, tch.tid
  FROM p JOIN tch
    ON tch.user_id = p.user_id
   AND tch.tt < p.pt AND tch.tt >= p.pt - 7 * {DAY_US}
),
split AS (
  SELECT pid, vmicro, channel,
         count(*) OVER (PARTITION BY pid) AS k,
         row_number() OVER (PARTITION BY pid
                            ORDER BY tt DESC, tid DESC) AS rn
  FROM j
),
credits AS (
  SELECT channel, pid,
         (vmicro {idiv} k)
           + CASE WHEN rn = 1 THEN vmicro - k * (vmicro {idiv} k)
                  ELSE 0 END AS credit
  FROM split
  UNION ALL
  SELECT 'direct', p.pid, p.vmicro
  FROM p LEFT JOIN j ON j.pid = p.pid
  WHERE j.pid IS NULL
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
       CAST(sum(credit) AS BIGINT) AS credited_micro
FROM credits
GROUP BY channel"""


def q_active_time_union_daily(dialect: str) -> str:
    """Covered-time union per day: total microseconds during which at
    least one session was live — the interval-UNION aggregate (distinct
    from peak_concurrency_daily's max): overlapping sessions must not
    double-count.  Same endpoint sweep; each inter-endpoint gap counts
    when the running live count is positive, attributed to the day the
    gap starts in (documented convention — gaps are minutes, days are
    the rollup).  Integer microsecond arithmetic throughout."""
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, {t} AS t, event_id FROM events
),
d AS (
  SELECT user_id, t, event_id,
         CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 3600000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
s AS (
  SELECT user_id, t,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
),
sess AS (
  SELECT user_id, sid, min(t) AS t_start, max(t) + 1 AS t_end
  FROM s GROUP BY user_id, sid
),
pts AS (
  SELECT t_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT t_end, -1 FROM sess
),
sweep AS (
  SELECT t,
         sum(delta) OVER (ORDER BY t, delta
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live,
         lead(t) OVER (ORDER BY t, delta) AS t_next
  FROM pts
)
SELECT CAST(floor(t / {DAY_US}.0) AS BIGINT) AS d,
       CAST(sum(CASE WHEN live > 0 THEN t_next - t ELSE 0 END) AS BIGINT)
         AS covered_us,
       CAST(count(*) AS BIGINT) AS n_endpoints
FROM sweep
WHERE t_next IS NOT NULL
GROUP BY CAST(floor(t / {DAY_US}.0) AS BIGINT)"""


WAREHOUSE_EXT_QUERIES = {
    "scd2_user_state_history": q_scd2_user_state,
    "attribution_last_touch": q_attribution_last_touch,
    "attribution_linear_multitouch": q_attribution_linear,
    "state_machine_violations": q_state_machine_violations,
    "changelog_compact_merge": q_changelog_compact_merge,
    "rolling_median_daily_count": q_rolling_median_daily,
    "ewma_halflife_daily": q_ewma_halflife_daily,
    "session_path_trigrams": q_session_path_trigrams,
    "seasonal_naive_backtest": q_seasonal_naive_backtest,
    "rolling_ols_slope_14d": q_rolling_ols_slope,
    "snapshot_diff_counts": q_snapshot_diff_counts,
    "variant_props_profile": q_variant_props_profile,
    "peak_concurrency_daily": q_peak_concurrency_daily,
    "active_time_union_daily": q_active_time_union_daily,
    "salted_join_skew": q_salted_join_skew,
    "bootstrap_mean_ci_poisson": q_bootstrap_mean_ci,
    "customer_rfm_segments": q_customer_rfm,
}
