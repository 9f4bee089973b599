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
    so the weighted sum is an exact BIGINT (bounded ~1e14 << 2^63; the
    final double floor-division operates below 2^53 — at much larger
    daily volumes the division would move to DECIMAL).  Normalized by the
    weights actually present, so missing days don't bias the level.

    Scale: the self-join runs on the daily aggregate (#days rows), not
    the fact; each row joins at most 20 partners."""
    weights = " UNION ALL ".join(
        f"SELECT {k} AS k, CAST({1 << (19 - k)} AS BIGINT) AS w"
        for k in range(20)
    )
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
       CAST(floor(CAST(ws AS DOUBLE) / wt) AS BIGINT) AS ewma_cents,
       n_days_in_window
FROM win"""


WAREHOUSE_EXT_QUERIES = {
    "scd2_user_state_history": q_scd2_user_state,
    "attribution_last_touch": q_attribution_last_touch,
    "state_machine_violations": q_state_machine_violations,
    "changelog_compact_merge": q_changelog_compact_merge,
    "rolling_median_daily_count": q_rolling_median_daily,
    "ewma_halflife_daily": q_ewma_halflife_daily,
}
