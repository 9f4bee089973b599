"""Ingest-semantics parity and statistical-aggregate coverage.

``ingest_clamp_monotonic`` reproduces the reference's out-of-order handling
exactly: a late append is clamped forward to ``lastTimestamp + 1``
(core/pipeline.go:80-84).  The clamp is a recursive prefix definition
``t'_i = max(t_i, t'_{i-1} + 1)``, which has the closed form
``t'_i = i + running_max(t_j - j)`` — an ordinary running-max window
function, so the whole ingest transform stays in whole-stage codegen with a
single shuffle on ``stream_id`` (no per-row state, no UDF).

The moment-based statistics family (corr/covar, histogram) extends the
reference's dormant ``stats`` package (stats/welford.go:19-25,
stats/stream_statistics.go:21-33 — declared but wired nowhere): every
statistic is derived from order-independent decimal power sums, so the
result is bit-identical across partitionings, engines, and retries.

Same one-template-two-dialects scheme as portable_sql; all aggregates
follow the BIGINT/DOUBLE normalization contract (driver hashes are
dtype-sensitive).

Scale notes (100 TB discipline):
- clamp: one hash exchange on stream_id; window + running max are linear
  per partition, output is one row per stream;
- q13/q15/q18: fact-side group-by first (partial aggregation bounds the
  shuffle by group count), dimension joins after reduction — the join
  inputs are orders-of-magnitude smaller than the scan;
- moments: single pass, one shuffle keyed by the (low-cardinality) group
  column; derived statistics are per-group scalar math on the tiny output;
- histogram: bucket id is pure column math (no UDF); cardinality = #buckets.
"""

from __future__ import annotations

from summarydb_spark.plans.portable_sql import dsum, epoch_us


def q_ingest_clamp(dialect: str) -> str:
    """Monotonic ingest clamp (reference parity, core/pipeline.go:80-84) in
    closed form: t'_i = rn_i + max_{j<=i}(t_j - rn_j), per stream in arrival
    (event_id) order.  Reports per-stream clamp accounting."""
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id AS stream_id, {t} AS t, event_id FROM events
),
r AS (
  SELECT stream_id, t,
         CAST(row_number() OVER (PARTITION BY stream_id ORDER BY event_id)
              AS BIGINT) AS rn
  FROM e
),
c AS (
  SELECT stream_id, t, rn,
         rn + max(t - rn) OVER (PARTITION BY stream_id ORDER BY rn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_adj
  FROM r
)
SELECT stream_id,
       count(*) AS n_events,
       CAST(sum(CASE WHEN t_adj > t THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
       CAST(max(t_adj - t) AS BIGINT) AS max_clamp_us,
       CAST(sum(t_adj - t) AS BIGINT) AS total_clamp_us,
       CAST(max(t_adj) AS BIGINT) AS last_ts
FROM c
GROUP BY stream_id"""


def q_custdist(dialect: str) -> str:
    """TPC-H Q13 shape: distribution of per-customer order counts via a
    LEFT OUTER join with an ON-clause filter (customers with zero qualifying
    orders land in the c_count=0 bucket), then a second aggregation over the
    first's output — the classic two-level group-by."""
    return """
WITH oc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM oc
GROUP BY c_count"""


def q_large_orders(dialect: str) -> str:
    """TPC-H Q18 shape: orders whose summed line quantity exceeds 250
    (~top 1%), re-joined to orders/customer and rolled up by market
    segment.  The HAVING runs on the pre-join aggregate, so the join input
    is already reduced to the qualifying orders."""
    return f"""
WITH big AS (
  SELECT l_orderkey, {dsum('l_quantity')} AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,10))) > 250
)
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       {dsum('b.total_qty')} AS qty_sum,
       {dsum('o.o_totalprice')} AS revenue
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment"""


def q_top_supplier(dialect: str) -> str:
    """TPC-H Q15 shape: supplier(s) achieving the maximum 3-month revenue —
    an aggregate CTE consumed twice (join + scalar-max subquery).  Revenue
    accumulates in DECIMAL so the MAX equality is exact, not
    float-ordering-dependent."""
    return f"""
WITH rev AS (
  SELECT l_suppkey, {dsum('l_extendedprice * (1 - l_discount)')} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= CAST(DATE '1996-01-01' AS TIMESTAMP)
    AND l_shipdate <  CAST(DATE '1996-04-01' AS TIMESTAMP)
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM rev)"""


def q_corr_quantity_price(dialect: str) -> str:
    """Pearson correlation and sample covariance of (quantity, price) per
    return flag, derived from order-independent decimal power sums — the
    distributed-safe formulation of the reference's Welford machinery
    (stats/welford.go:19-25)."""
    return f"""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         {dsum('l_quantity')} AS sx,
         {dsum('l_extendedprice')} AS sy,
         {dsum('l_quantity * l_quantity')} AS sxx,
         {dsum('l_extendedprice * l_extendedprice', 2)} AS syy,
         {dsum('l_quantity * l_extendedprice', 2)} AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(round((sxy - sx * sy / n) / nullif(n - 1, 0), 4) AS DOUBLE)
         AS covar_qp,
       CAST(round((n * sxy - sx * sy)
             / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0.0),
             6) AS DOUBLE) AS corr_qp,
       CAST(round(sqrt((sxx - sx * sx / n) / nullif(n - 1, 0)), 6) AS DOUBLE)
         AS std_qty
FROM m"""


def q_value_histogram(dialect: str) -> str:
    """20-bucket equi-width histogram of event values over [0, 500) —
    bucket assignment is pure column math (floor division), aggregated per
    event type.  Output cardinality = types x buckets regardless of input
    size."""
    return f"""
WITH b AS (
  SELECT event_type,
         CAST(least(floor(value / 25.0), 19) AS BIGINT) AS bucket,
         value
  FROM events
)
SELECT event_type, bucket,
       count(*) AS n,
       {dsum('value')} AS sum_v,
       CAST(round(min(value), 6) AS DOUBLE) AS min_v,
       CAST(round(max(value), 6) AS DOUBLE) AS max_v
FROM b
GROUP BY event_type, bucket"""


def q_percent_rank_balance(dialect: str) -> str:
    """percent_rank / cume_dist of customer balances within nation, then
    per-decile rollup (rank functions feed a second aggregation, so the
    output is 25 nations x <=10 deciles, not one row per customer)."""
    return f"""
WITH p AS (
  SELECT c_nationkey, c_acctbal,
         percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
           AS pr,
         cume_dist() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
           AS cd
  FROM customer
)
SELECT c_nationkey,
       CAST(least(floor(pr * 10), 9) AS BIGINT) AS decile,
       count(*) AS n,
       {dsum('c_acctbal')} AS bal_sum,
       CAST(round(max(cd), 6) AS DOUBLE) AS cd_max
FROM p
GROUP BY c_nationkey, least(floor(pr * 10), 9)"""


def q_first_last_day_value(dialect: str) -> str:
    """first_value / last_value (explicit full frame) of the event value per
    stream-day, with the day's range — the frame-boundary window functions
    missing from the lead/lag coverage.  Tie-broken on event_id so both
    engines pick the same row."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    win = (
        "OVER (PARTITION BY stream_id, day ORDER BY t, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    return f"""
WITH e AS (
  SELECT user_id AS stream_id, ({t} {idiv} 86400000000) AS day,
         {t} AS t, event_id, value
  FROM events
),
w AS (
  SELECT stream_id, day,
         first_value(value) {win} AS first_v,
         last_value(value) {win} AS last_v
  FROM e
)
SELECT stream_id, day, count(*) AS n,
       CAST(round(min(first_v), 6) AS DOUBLE) AS first_v,
       CAST(round(max(last_v), 6) AS DOUBLE) AS last_v
FROM w
GROUP BY stream_id, day"""


def q_cohort_retention(dialect: str) -> str:
    """Daily cohort retention matrix over the events stream: users are
    cohorted by the epoch day of their first event; retention(age) =
    active users at cohort_day + age / cohort size.  (Daily, not monthly:
    the synthetic stream spans one month, so day cohorts give a full
    30x30 triangle.)

    ONE pass: distinct (user, day) -> min-day window per user (the
    cohort) -> hash aggregate by (cohort, age) -> cohort size recovered
    from the age-0 cell via a window over the (tiny) matrix.  Day ids are
    pure epoch integer division, no calendar functions.  Scale shape: the
    only data-sized shuffles are the distinct and the per-user window,
    both keyed by user_id — linear, skew-free."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH e AS (
  SELECT DISTINCT user_id, ({t} {idiv} 86400000000) AS d FROM events
),
w AS (
  SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS cd FROM e
),
matrix AS (
  SELECT cd AS cohort_day, d - cd AS age_days, count(*) AS n_active
  FROM w
  GROUP BY cd, d - cd
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(age_days AS BIGINT) AS age_days,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(max(CASE WHEN age_days = 0 THEN n_active END)
              OVER (PARTITION BY cohort_day) AS BIGINT) AS cohort_size,
       round(CAST(n_active AS DOUBLE)
             / max(CASE WHEN age_days = 0 THEN n_active END)
                 OVER (PARTITION BY cohort_day), 6) AS retention
FROM matrix"""


def q_funnel_conversion(dialect: str) -> str:
    """Ordered funnel (view -> click -> purchase) per user with strict
    timestamp ordering: the first click must FOLLOW the user's first view,
    the first purchase must follow that click — the event-sequence shape
    session analytics runs.

    ONE shuffle on user_id: three chained min-CASE windows over the same
    partitioning (Spark reuses the exchange; each stage is an in-partition
    pass), then a per-user rollup and a 7-row day-of-week report of
    conversion rates.  No joins, no re-scans, no per-user loops."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH e AS (
  SELECT user_id, event_type, {t} AS t FROM events
),
w1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
              OVER (PARTITION BY user_id) AS tv
  FROM e
),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND t > tv THEN t END)
              OVER (PARTITION BY user_id) AS tc
  FROM w1
),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND t > tc THEN t END)
              OVER (PARTITION BY user_id) AS tp
  FROM w2
),
u AS (
  SELECT user_id, max(tv) AS tv, max(tc) AS tc, max(tp) AS tp
  FROM w3 GROUP BY user_id
)
SELECT CAST(((tv {idiv} 86400000000) + 3) % 7 AS BIGINT) AS view_dow_mon0,
       count(*) AS n_view,
       count(tc) AS n_click_after_view,
       count(tp) AS n_purchase_after_click,
       round(CAST(count(tc) AS DOUBLE) / count(*), 6) AS view_to_click,
       round(CAST(count(tp) AS DOUBLE)
             / nullif(count(tc), 0), 6) AS click_to_purchase
FROM u
WHERE tv IS NOT NULL
GROUP BY ((tv {idiv} 86400000000) + 3) % 7"""


def q_linreg_price_vs_quantity(dialect: str) -> str:
    """Per-group ordinary least squares (slope / intercept / r^2) of
    extendedprice on quantity, from the same order-independent decimal
    power sums as q_corr_quantity_price — regr_slope/regr_intercept/
    regr_r2 semantics without relying on either engine's regr_*
    builtins agreeing bit-for-bit.  One hash aggregate; the closed-form
    expression tree is written identically in both dialects."""
    return f"""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         {dsum('l_quantity')} AS sx,
         {dsum('l_extendedprice')} AS sy,
         {dsum('l_quantity * l_quantity')} AS sxx,
         {dsum('l_extendedprice * l_extendedprice', 2)} AS syy,
         {dsum('l_quantity * l_extendedprice', 2)} AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0), 6)
            AS DOUBLE) AS slope,
       CAST(round((sy - (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)
                        * sx) / n, 4) AS DOUBLE) AS intercept,
       CAST(round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                  / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0.0),
                  6) AS DOUBLE) AS r2
FROM m"""


def q_markov_event_transitions(dialect: str) -> str:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | cur_type) in exact ppm (integer division —
    engine-identical), counts per (cur, next) pair.  One window (lead
    over the user partition, ordered by event time) then one hash
    aggregate; the row-probability normalizer is a window over the
    already-aggregated transition matrix (25 rows), not the event
    stream."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH s AS (
  SELECT event_type AS cur_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY {t}, event_id) AS next_type
  FROM events
),
tr AS (
  SELECT cur_type, next_type, count(*) AS n_trans
  FROM s WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
)
SELECT cur_type, next_type, n_trans,
       CAST(n_trans * 1000000 {idiv}
            sum(n_trans) OVER (PARTITION BY cur_type) AS BIGINT)
         AS prob_ppm
FROM tr"""


def q_cusum_drift_daily(dialect: str) -> str:
    """CUSUM drift detection: per event type, the running sum of each
    day's deviation from the type's all-time daily-mean value — the
    classic changepoint monitor for data-quality drift.  All state is
    exact decimal (daily sums recovered at scale 4, the mean rounded to
    a scale-6 decimal once, deviations and the cumulative sum exact
    thereafter); the output is integer micro-units so no round-half tie
    can split the engines.  Shuffle carries (type x day) rows only."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH d AS (
  SELECT event_type, ({t} {idiv} 86400000000) AS day,
         CAST({dsum("value")} AS DECIMAL(18,4)) AS sum_v,
         count(*) AS n
  FROM events
  GROUP BY event_type, ({t} {idiv} 86400000000)
),
g AS (
  SELECT event_type,
         CAST(round(CAST(sum(CAST(sum_v AS DECIMAL(38,4))) AS DOUBLE)
                    / sum(n), 6) AS DECIMAL(18,6)) AS mean_per_event
  FROM d GROUP BY event_type
),
dev AS (
  SELECT d.event_type, d.day, d.n,
         CAST(d.sum_v AS DECIMAL(38,6)) - d.n * g.mean_per_event AS dev
  FROM d JOIN g ON g.event_type = d.event_type
)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,
       CAST(CAST(dev * 1000000 AS DECIMAL(38,0)) AS BIGINT) AS dev_micro,
       CAST(CAST(sum(dev) OVER (PARTITION BY event_type ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) * 1000000
                 AS DECIMAL(38,0)) AS BIGINT) AS cusum_micro,
       CASE WHEN abs(sum(dev) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW))
                 > 2000.0 THEN 1 ELSE 0 END AS drift_flag
FROM dev"""


def q_ab_test_conversion(dialect: str) -> str:
    """Two-proportion z-test between deterministic md5-assigned user
    cohorts (the A/B assignment every experimentation system derives
    from a user-id hash): per-cohort converters (users with >= 14
    purchase events — every user purchases at least once in this data,
    so raw has-purchased is degenerate at p=1), exposed users,
    conversion rate, and the pooled z statistic with a |z| > 1.96
    significance flag.  The pooled variance is nullif-guarded (a
    degenerate cohort yields NULL z, never a divide-by-zero under ANSI).
    Rates and z round to 6 before output (double quotients — tie-free);
    the per-user reduction is one aggregate, cohort stats are 2 rows."""
    key = ("CAST(user_id AS STRING)" if dialect == "spark"
           else "CAST(user_id AS VARCHAR)")
    from summarydb_spark.plans.portable_dedup import md560

    h = md560(f"concat('ab:', {key})", dialect)
    pmod = "pmod(h, 2)" if dialect == "spark" else "((h % 2) + 2) % 2"
    return f"""
WITH u AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS converted,
         {h} AS h
  FROM events
  GROUP BY user_id
),
c AS (
  SELECT {pmod} AS cohort,
         count(*) AS n_users,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM u GROUP BY {pmod}
),
w AS (
  SELECT
    max(CASE WHEN cohort = 0 THEN n_users END) AS na,
    max(CASE WHEN cohort = 0 THEN n_converted END) AS ca,
    max(CASE WHEN cohort = 1 THEN n_users END) AS nb,
    max(CASE WHEN cohort = 1 THEN n_converted END) AS cb
  FROM c
),
z AS (
  SELECT na, ca, nb, cb,
         (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
         / nullif(sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 / na + 1.0 / nb)), 0.0) AS zval
  FROM w
)
SELECT na AS n_a, ca AS conv_a, nb AS n_b, cb AS conv_b,
       CAST(round(CAST(ca AS DOUBLE) / na, 6) AS DOUBLE) AS rate_a,
       CAST(round(CAST(cb AS DOUBLE) / nb, 6) AS DOUBLE) AS rate_b,
       CAST(round(zval, 6) AS DOUBLE) AS z_stat,
       CASE WHEN abs(zval) > 1.96 THEN 1 ELSE 0 END AS significant
FROM z"""


def q_time_to_conversion(dialect: str) -> str:
    """View-to-purchase latency distribution: per user, the first
    'view' and the first 'purchase' at or after it; latencies (whole
    seconds — integer floor division, engine-exact) summarize to
    min / p50 / p90 / max per user-id parity cohort.  percentile_cont
    interpolation runs on integer seconds, so the interpolated value is
    a short dyadic fraction — exactly representable, no 1-ulp drift.
    Scale: one aggregate to (user, first_view), one conditional
    aggregate for the first qualifying purchase (no self-join of the
    raw stream), percentiles over #users rows."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    pc = ("percentile(lat_s, {q})" if dialect == "spark"
          else "quantile_cont(lat_s, {q})")
    return f"""
WITH fv AS (
  SELECT user_id, min({t}) AS first_view
  FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
fp AS (
  SELECT e.user_id,
         min(CASE WHEN {t} >= f.first_view THEN {t} END) AS first_purchase,
         min(f.first_view) AS first_view
  FROM events e JOIN fv f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY e.user_id
),
lat AS (
  SELECT user_id, user_id % 2 AS cohort,
         (first_purchase - first_view) {idiv} 1000000 AS lat_s
  FROM fp WHERE first_purchase IS NOT NULL
)
SELECT cohort,
       count(*) AS n_users,
       CAST(min(lat_s) AS BIGINT) AS min_s,
       CAST(round({pc.format(q='0.5')}, 6) AS DOUBLE) AS p50_s,
       CAST(round({pc.format(q='0.9')}, 6) AS DOUBLE) AS p90_s,
       CAST(max(lat_s) AS BIGINT) AS max_s
FROM lat
GROUP BY cohort"""


def q_winsorized_mean_by_type(dialect: str) -> str:
    """Robust location estimates per event type: the winsorized mean
    (values clipped to [p05, p95]) next to the raw mean — the outlier-
    resistant metric a monitoring pipeline tracks when heavy tails make
    the plain mean jumpy.  The percentile bounds round to 6 BEFORE
    clipping so a 1-ulp interpolation difference between engines cannot
    flip a clip decision; all sums are exact decimals.  Plan: one
    percentile aggregate (tiny output), broadcast back over the scan,
    one clipped aggregate."""
    pc = ("percentile(value, {q})" if dialect == "spark"
          else "quantile_cont(value, {q})")
    return f"""
WITH b AS (
  SELECT event_type,
         round({pc.format(q='0.05')}, 6) AS lo,
         round({pc.format(q='0.95')}, 6) AS hi
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type,
         e.value,
         least(greatest(e.value, b.lo), b.hi) AS wv
  FROM events e JOIN b ON b.event_type = e.event_type
)
SELECT event_type,
       count(*) AS n,
       {dsum("value")} AS sum_raw,
       {dsum("wv")} AS sum_winsorized,
       CAST(round({dsum("value")} / count(*), 6) AS DOUBLE) AS mean_raw,
       CAST(round({dsum("wv")} / count(*), 6) AS DOUBLE) AS mean_winsorized
FROM clipped
GROUP BY event_type"""


def q_mad_outliers_by_type(dialect: str) -> str:
    """Median-absolute-deviation outlier detection per event type: count
    of values beyond median +/- 3 * 1.4826 * MAD (the robust z-score
    rule immune to the outliers it hunts).  Both the median and the MAD
    round to 6 before the threshold compare, so the boundary decision is
    engine-identical; two percentile aggregates (each over already-
    grouped relations), no window over the raw stream."""
    pc = ("percentile({col}, 0.5)" if dialect == "spark"
          else "quantile_cont({col}, 0.5)")
    return f"""
WITH med AS (
  SELECT event_type, round({pc.format(col='value')}, 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m ON m.event_type = e.event_type
),
mad AS (
  SELECT event_type, max(med) AS med,
         round({pc.format(col='adev')}, 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       count(*) AS n,
       CAST(max(d.med) AS DOUBLE) AS median_v,
       CAST(max(m.mad) AS DOUBLE) AS mad_v,
       CAST(sum(CASE WHEN abs(d.value - d.med)
                          > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type"""


STATS_EXT_QUERIES = {
    "time_to_conversion": q_time_to_conversion,
    "winsorized_mean_by_type": q_winsorized_mean_by_type,
    "mad_outliers_by_type": q_mad_outliers_by_type,
    "linreg_price_vs_quantity": q_linreg_price_vs_quantity,
    "markov_event_transitions": q_markov_event_transitions,
    "cusum_drift_daily": q_cusum_drift_daily,
    "ab_test_conversion": q_ab_test_conversion,
    "ingest_clamp_monotonic": q_ingest_clamp,
    "tpch_q13_like_custdist": q_custdist,
    "tpch_q18_like_large_orders": q_large_orders,
    "tpch_q15_like_top_supplier": q_top_supplier,
    "corr_quantity_price": q_corr_quantity_price,
    "value_histogram_events": q_value_histogram,
    "percent_rank_balance_decile": q_percent_rank_balance,
    "first_last_day_value": q_first_last_day_value,
    "cohort_retention_daily": q_cohort_retention,
    "funnel_view_click_purchase": q_funnel_conversion,
}
