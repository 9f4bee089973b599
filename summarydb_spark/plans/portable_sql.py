"""Portable SQL plans: one logical query, two dialects (Spark SQL + DuckDB).

Every core-engine query the driver verifies is defined here ONCE as a
template and rendered for both engines; the DuckDB rendering *is* the
correctness oracle, the Spark rendering is executed by ``queries()`` in
``__spark_entry__.py``.  Rules that keep results bit-comparable:

- double aggregation is order-dependent, so every SUM/AVG goes through
  DECIMAL(38,10) (exact, associative) and is cast back to DOUBLE;
- scalar expression trees are written identically, so IEEE arithmetic
  produces identical doubles in both engines;
- double -> BIGINT casts round differently (Spark truncates, DuckDB rounds),
  so they are always written CAST(floor(x) AS BIGINT);
- timestamps surface as epoch micros (unix_micros / epoch_us) or DATE.

The decayed-window queries compile the closed-form exp(2) canonical bucket
(summarydb_spark.windowing.exp2_bucket_sql — same string in both dialects,
pure integer/bit arithmetic).
"""

from __future__ import annotations


Z_95 = 1.959963984540054  # z = InvCDF((1+0.95)/2), embedded as a literal

DIALECTS = ("spark", "duckdb")


def epoch_us(col: str, dialect: str) -> str:
    """Timestamp column -> epoch micros (BIGINT).

    The testdata parquet stores TIMESTAMP(MICROS): Spark reads it as
    TIMESTAMP_NTZ, DuckDB as naive TIMESTAMP.  Both sides are naive-UTC, so
    ``unix_micros`` after an NTZ->LTZ cast under the UTC session timezone
    (summarydb_spark.session sets it) equals DuckDB's ``epoch_us`` exactly —
    integer micros, no double rounding."""
    return (
        f"unix_micros(CAST({col} AS TIMESTAMP_LTZ))"
        if dialect == "spark"
        else f"epoch_us({col})"
    )


def to_timestamp_col(col: str, dialect: str) -> str:
    """Micro-precision timestamp column -> dialect-native TIMESTAMP.

    Every testdata timestamp (events.ts included, since the micros
    migration) is TIMESTAMP(MICROS), arriving as TIMESTAMP_NTZ in Spark /
    naive TIMESTAMP in DuckDB — usable as-is in both dialects."""
    return col


def dsum(expr: str, scale: int = 4) -> str:
    """Order-independent double sum via exact decimal accumulation.

    The final round-to-``scale`` keeps the integer mantissa below 2^53 before
    the DOUBLE cast: DuckDB converts int128-scaled decimals through double
    division, which differs from Spark's correctly-rounded BigDecimal cast by
    1 ulp once the scaled value exceeds 2^53."""
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(38,10))), {scale}) AS DOUBLE)"


def _events_base(dialect: str, stream_col: str = "user_id") -> str:
    """Per-stream insertion index + size over the events table.

    The reference's stream is (stream_id, ts, value) with ts monotone
    (core/stream.go:104-119); event_id breaks timestamp ties
    deterministically.
    """
    t = epoch_us("ts", dialect)
    return f"""
  SELECT {stream_col} AS stream_id,
         {t} AS t,
         value AS v,
         row_number() OVER (PARTITION BY {stream_col} ORDER BY {t}, event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY {stream_col}) AS n
  FROM events"""


def _bucketed(dialect: str, ev_sql: str | None = None) -> str:
    """events + canonical exp(2) bucket, staged as a CTE chain.

    ``ev_sql`` overrides the default whole-table ``ev`` CTE; it must yield
    (stream_id, t, v, idx, n) with idx the 0-based per-stream insertion
    index and n the stream size — used by the landmark variant, which
    excludes bracketed rows from the summary build before indexing.

    The single-expression closed form (windowing.exp2_bucket_sql)
    macro-expands to ~22KB of SQL; both engines then pay seconds just
    *optimizing* that tree per query, and Spark's codegen can overflow on
    it.  Staging each sub-term (rank/t/m/a/k) as a named CTE column keeps
    every expression level small — the alias is multiply-referenced and
    non-trivial, so neither optimizer re-inlines the full tree.  Logic is
    identical to the one-expression form (and to
    operators/summary.with_exp2_bucket); the oracle runs this verbatim.
    """
    p2 = "CAST(pow(2, {k}) AS BIGINT)"

    def cume(k: str) -> str:  # C_k using the staged m_ column
        return f"(({p2.format(k=f'({k}) + 1')} - 1) + (m_ & ({p2.format(k=f'({k}) + 1')} - 1)))"

    k_case = f"""CASE WHEN rank_ < {cume('a_')} THEN a_
              WHEN rank_ < {cume('a_ + 1')} THEN a_ + 1
              WHEN rank_ < {cume('a_ + 2')} THEN a_ + 2
              WHEN rank_ < {cume('a_ + 3')} THEN a_ + 3
              ELSE a_ + 4 END"""
    return f"""
WITH ev AS ({ev_sql if ev_sql is not None else _events_base(dialect)}),
s1 AS (
  SELECT *, (n - 1 - idx) AS rank_,
         CAST(floor(log2(CAST(n + 1 AS DOUBLE))) AS BIGINT) AS t0_
  FROM ev
),
s2 AS (  -- log2-at-power-of-two off-by-one fixup
  SELECT *, CASE WHEN {p2.format(k='t0_ + 1')} <= n + 1 THEN t0_ + 1
                 WHEN {p2.format(k='t0_')} > n + 1 THEN t0_ - 1
                 ELSE t0_ END AS t_
  FROM s1
),
s3 AS (
  SELECT *, (n - {p2.format(k='t_')} + 1) AS m_,
         greatest(CAST(ceil(log2(CAST(rank_ + 2 AS DOUBLE))) AS BIGINT) - 3,
                  CAST(0 AS BIGINT)) AS a_
  FROM s2
),
s4 AS (SELECT *, {k_case} AS k_ FROM s3),
s5 AS (
  SELECT *, CASE WHEN k_ = 0 THEN 0 ELSE {cume('k_ - 1')} END AS cprev_
  FROM s4
),
b AS (
  SELECT stream_id, t, v, idx, n,
         (k_ + bit_count(m_ & ({p2.format(k='k_')} - 1))
          + CAST(floor((rank_ - cprev_) / CAST({p2.format(k='k_')} AS DOUBLE)) AS BIGINT)) AS bucket
  FROM s5
)"""


# ---------------------------------------------------------------------------
# Materialized summary store (Spark side only)
#
# In the reference, summary windows are PERSISTED state: the pipeline writes
# them to the KV store and queries scan stored windows through the time index
# (storage/query_index.go:48-74) — queries never re-derive windows from raw
# events.  The Spark engine mirrors that: the canonical summary table is
# built ONCE per sf_dir, written to the parquet store, and exposed as a
# temp view over the files; the ten summary-consuming queries read the
# view.  (Parquet, not .persist(): cache-manager substitution cannot
# replace a plan inside a WITH CTE, and these queries all bind the store
# behind CTEs — a cached view silently rebuilds from raw events.)  The
# DuckDB oracle keeps the full inline recompute, so every value is still
# verified end-to-end from raw events.
# ---------------------------------------------------------------------------

SW_FULL_VIEW = "sw_exp2_full"
SW_LMK_VIEW = "sw_exp2_lmk"
# per-stream bounds + landmark bracket, and the exact landmark rows —
# landmark windows are persisted exact state in the reference
# (core/stream.go:112-114: landmark appends bypass the decay pipeline and
# are stored raw), so the store holds them alongside the summary windows
SW_META_VIEW = "sw_stream_meta"
SW_LMKROWS_VIEW = "sw_lmk_rows"

_SW_AGG = """SELECT stream_id,
       min(idx) AS window_id,
       min(t)   AS time_start,
       max(t)   AS time_end,
       min(idx) AS count_start,
       max(idx) AS count_end,
       count(*) AS cnt,
       {dsum} AS sum_v,
       max(v) AS max_v,
       min(v) AS min_v"""

_LMK_PREFIX = """ev0 AS (
  SELECT user_id AS stream_id, {t} AS t, value AS v, event_id FROM events
),
raw_b AS (
  SELECT stream_id, min(t) AS tmin, max(t) AS tmax FROM ev0 GROUP BY stream_id
),
lmk AS (
  SELECT stream_id,
         tmin + CAST(floor((tmax - tmin) * 0.05) AS BIGINT) AS l0,
         tmin + CAST(floor((tmax - tmin) * 0.15) AS BIGINT) AS l1
  FROM raw_b
)"""

_LMK_EV_SQL = """
  SELECT e.stream_id, e.t, e.v,
         row_number() OVER (PARTITION BY e.stream_id ORDER BY e.t, e.event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY e.stream_id) AS n
  FROM ev0 e JOIN lmk ON lmk.stream_id = e.stream_id
  WHERE e.t < lmk.l0 OR e.t > lmk.l1"""


def summary_view_sql(kind: str) -> str:
    """Spark SQL building one table of the persisted summary store.

    ``full``: summary windows over every event; ``lmk``: windows with the
    landmark-bracketed rows excluded from the decayed build
    (core/stream.go:112-114); ``meta``: per-stream time bounds + landmark
    bracket; ``lmk_rows``: the exact raw rows inside the landmark bracket."""
    lmk_prefix = _LMK_PREFIX.format(t=epoch_us("ts", "spark"))
    if kind == "meta":
        return f"""WITH {lmk_prefix}
SELECT b.stream_id, b.tmin, b.tmax, k.l0, k.l1
FROM raw_b b JOIN lmk k ON k.stream_id = b.stream_id"""
    if kind == "lmk_rows":
        return f"""WITH {lmk_prefix}
SELECT e.stream_id, e.t, e.v
FROM ev0 e JOIN lmk k ON k.stream_id = e.stream_id
WHERE e.t >= k.l0 AND e.t <= k.l1"""
    agg = _SW_AGG.format(dsum=dsum("v"))
    if kind == "full":
        return f"{_bucketed('spark')}\n{agg}\nFROM b\nGROUP BY stream_id, bucket"
    # nested WITH inside the bkt CTE body is valid SQL in both engines (the
    # landmark query templates below use the same construction)
    return (
        f"WITH {lmk_prefix},\n"
        f"bkt AS ({_bucketed('spark', _LMK_EV_SQL)}\n"
        f"SELECT stream_id, t, v, idx, bucket FROM b)\n"
        f"{agg}\nFROM bkt\nGROUP BY stream_id, bucket"
    )


def q_decay_summary_exp2(dialect: str) -> str:
    """The canonical decayed summary_windows table (exp base 2, unbuffered),
    one row per window per stream — the engine's core data product.  Spark
    reads the materialized summary store; the oracle recomputes inline."""
    if dialect == "spark":
        return f"SELECT * FROM {SW_FULL_VIEW}"
    return f"""{_bucketed(dialect)}
SELECT stream_id,
       min(idx) AS window_id,
       min(t)   AS time_start,
       max(t)   AS time_end,
       min(idx) AS count_start,
       max(idx) AS count_end,
       count(*) AS cnt,
       {dsum('v')} AS sum_v,
       max(v) AS max_v,
       min(v) AS min_v
FROM b
GROUP BY stream_id, bucket"""


def q_compaction_exp2(dialect: str) -> str:
    """Compaction ratio: raw rows vs canonical summary windows per stream
    (the reference's headline storage metric, core/db_test.go:55-57).
    On Spark, derived from the materialized summary store: raw row count
    = max(count_end) + 1, window count = view rows per stream."""
    if dialect == "spark":
        return f"""
SELECT stream_id,
       max(count_end) + 1 AS raw_rows,
       count(*) AS summary_windows,
       CAST(max(count_end) + 1 AS DOUBLE) / count(*) AS compaction_ratio
FROM {SW_FULL_VIEW}
GROUP BY stream_id"""
    return f"""{_bucketed(dialect)}
SELECT stream_id,
       max(n) AS raw_rows,
       count(DISTINCT bucket) AS summary_windows,
       CAST(max(n) AS DOUBLE) / count(DISTINCT bucket) AS compaction_ratio
FROM b
GROUP BY stream_id"""


def _query_ranges() -> str:
    """Four deterministic time ranges per stream over [tmin, tmax]:
    full, middle half, newest tenth (decayed-fine region), oldest third
    (decayed-coarse region)."""
    f = "CAST(floor((tmax - tmin) * {frac}) AS BIGINT)"
    return f"""
qr AS (
  SELECT stream_id, 1 AS qid, tmin AS t0, tmax AS t1 FROM sb
  UNION ALL
  SELECT stream_id, 2, tmin + {f.format(frac=0.25)}, tmin + {f.format(frac=0.75)} FROM sb
  UNION ALL
  SELECT stream_id, 3, tmax - {f.format(frac=0.10)}, tmax FROM sb
  UNION ALL
  SELECT stream_id, 4, tmin, tmin + {f.format(frac=0.33)} FROM sb
)"""


def q_approx_range(dialect: str, op: str) -> str:
    """Time-range approximate aggregate with proration bounds + CI.

    Implements GetSumStats (core/sum_estimator.go:34-118) and
    ConvertStatsBoundsToCI (stats/utils.go:40-56) as relational algebra:
    summary windows overlapping [t0, t1]; first/last windows prorated by
    time overlap, middle windows counted fully; z-interval clamped to the
    hard bounds.  ``op`` is "count" or "sum".  (No landmarks in the oracle
    tables, so landmark corrections are exercised by the pytest layer.)
    """
    val = "CAST(cnt AS DOUBLE)" if op == "count" else "sum_v"
    if dialect == "spark":
        head = f"""
WITH sw AS (
  SELECT stream_id, time_start, time_end, cnt, sum_v FROM {SW_FULL_VIEW}
)"""
    else:
        head = f"""{_bucketed(dialect)},
sw AS (
  SELECT stream_id, min(t) AS time_start, max(t) AS time_end,
         count(*) AS cnt, {dsum('v')} AS sum_v
  FROM b GROUP BY stream_id, bucket
)"""
    return f"""{head},
sb AS (SELECT stream_id, min(time_start) AS tmin, max(time_end) AS tmax
       FROM sw GROUP BY stream_id),
{_query_ranges()},
sel AS (
  SELECT q.stream_id, q.qid, q.t0, q.t1,
         s.time_start, s.time_end, {val} AS val
  FROM qr q JOIN sw s
    ON s.stream_id = q.stream_id AND s.time_end >= q.t0 AND s.time_start <= q.t1
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY stream_id, qid ORDER BY time_start) AS rn,
         count(*) OVER (PARTITION BY stream_id, qid) AS nw
  FROM sel
),
parts AS (
  SELECT stream_id, qid, t0, t1, max(nw) AS nw,
         max(CASE WHEN rn = 1 THEN val END) AS first_sum,
         max(CASE WHEN rn = 1 THEN time_start END) AS first_start,
         max(CASE WHEN rn = 1 THEN time_end END) AS first_end,
         max(CASE WHEN rn = nw THEN val END) AS last_sum_raw,
         max(CASE WHEN rn = nw THEN time_start END) AS last_start,
         max(CASE WHEN rn = nw THEN time_end END) AS last_end,
         {dsum('CASE WHEN rn > 1 AND rn < nw THEN val ELSE 0 END')} AS middle_sum
  FROM ranked GROUP BY stream_id, qid, t0, t1
),
est AS (
  SELECT stream_id, qid, t0, t1,
         first_sum, middle_sum,
         CASE WHEN nw = 1 THEN 0.0 ELSE last_sum_raw END AS last_sum,
         (first_end - first_start + 1) AS first_len,
         greatest(least(first_end, t1) - greatest(first_start, t0) + 1, CAST(0 AS BIGINT)) AS first_ov,
         (last_end - last_start + 1) AS last_len,
         greatest(least(last_end, t1) - greatest(last_start, t0) + 1, CAST(0 AS BIGINT)) AS last_ov
  FROM parts
),
acc AS (
  SELECT stream_id, qid, t0, t1,
         first_sum + middle_sum + last_sum AS upper_bound,
         middle_sum
           + CASE WHEN first_ov = first_len THEN first_sum ELSE 0.0 END
           + CASE WHEN last_ov = last_len THEN last_sum ELSE 0.0 END AS lower_bound,
         middle_sum
           + CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS mean,
         CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) * (1.0 - CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) * (1.0 - CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS var
  FROM est
)
SELECT stream_id, qid, t0, t1,
       round(mean, 6) AS estimate,
       round(greatest(mean - {Z_95} * sqrt(var), lower_bound), 6) AS lower_ci,
       round(least(mean + {Z_95} * sqrt(var), upper_bound), 6) AS upper_ci,
       round(lower_bound, 6) AS lower_bound,
       round(upper_bound, 6) AS upper_bound
FROM acc"""


def q_approx_range_landmark(dialect: str, op: str) -> str:
    """Landmark-corrected approximate range aggregate — the reference's full
    error model (core/sum_estimator.go:34-118): per stream, one bracketed
    landmark interval [tmin+5%span, tmin+15%span] holds exact raw rows that
    are EXCLUDED from the decayed summary build (core/stream.go:112-114:
    landmark appends bypass the pipeline); at query time the landmark
    contributes exactly (ratio 1), and the prorated edge windows subtract
    the landmark's span from both their length and their overlap
    (core/sum_estimator.go:66-87, guards ``first.Start < lw.End`` /
    ``last.End > lw.Start``), with WindowOverlap/WindowLength inclusive
    (+1) semantics (stats/utils.go:15-22).  Query ranges: full span (hits
    the corrections) and newest tenth (landmark out of range — guard path).
    """
    val = "CAST(cnt AS DOUBLE)" if op == "count" else "sum_v"
    lmv = "1.0" if op == "count" else "r.v"
    ov = "greatest(least({r1}, {b1}) - greatest({l1}, {a1}) + 1, CAST(0 AS BIGINT))"
    ev_sql = f"""
  SELECT e.stream_id, e.t, e.v,
         row_number() OVER (PARTITION BY e.stream_id ORDER BY e.t, e.event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY e.stream_id) AS n
  FROM ev0 e JOIN lmk ON lmk.stream_id = e.stream_id
  WHERE e.t < lmk.l0 OR e.t > lmk.l1"""
    t = epoch_us("ts", dialect)
    if dialect == "spark":
        # everything comes from the persisted store: summary windows,
        # stream bounds, landmark bracket, and exact landmark rows — no
        # raw-events scan at query time
        head = f"""
WITH raw_b AS (SELECT stream_id, tmin, tmax FROM {SW_META_VIEW}),
lmk AS (SELECT stream_id, l0, l1 FROM {SW_META_VIEW}),
lmr AS (SELECT stream_id, t, v FROM {SW_LMKROWS_VIEW}),
sw AS (
  SELECT stream_id, time_start, time_end, cnt, sum_v FROM {SW_LMK_VIEW}
)"""
    else:
        head = f"""
WITH ev0 AS (
  SELECT user_id AS stream_id, {t} AS t, value AS v, event_id FROM events
),
raw_b AS (
  SELECT stream_id, min(t) AS tmin, max(t) AS tmax FROM ev0 GROUP BY stream_id
),
lmk AS (
  SELECT stream_id,
         tmin + CAST(floor((tmax - tmin) * 0.05) AS BIGINT) AS l0,
         tmin + CAST(floor((tmax - tmin) * 0.15) AS BIGINT) AS l1
  FROM raw_b
),
lmr AS (
  SELECT e.stream_id, e.t, e.v
  FROM ev0 e JOIN lmk k ON k.stream_id = e.stream_id
  WHERE e.t >= k.l0 AND e.t <= k.l1
),
bkt AS ({_bucketed(dialect, ev_sql)}
SELECT stream_id, t, v, bucket FROM b),
sw AS (
  SELECT stream_id, min(t) AS time_start, max(t) AS time_end,
         count(*) AS cnt, {dsum('v')} AS sum_v
  FROM bkt
  GROUP BY stream_id, bucket
)"""
    return f"""{head},
sb AS (SELECT stream_id, tmin, tmax FROM raw_b),
qr AS (
  SELECT stream_id, 1 AS qid, tmin AS t0, tmax AS t1 FROM sb
  UNION ALL
  SELECT stream_id, 3, tmax - CAST(floor((tmax - tmin) * 0.10) AS BIGINT), tmax FROM sb
),
sel AS (
  SELECT q.stream_id, q.qid, q.t0, q.t1,
         s.time_start, s.time_end, {val} AS val
  FROM qr q JOIN sw s
    ON s.stream_id = q.stream_id AND s.time_end >= q.t0 AND s.time_start <= q.t1
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY stream_id, qid ORDER BY time_start) AS rn,
         count(*) OVER (PARTITION BY stream_id, qid) AS nw
  FROM sel
),
parts AS (
  SELECT stream_id, qid, t0, t1, max(nw) AS nw,
         max(CASE WHEN rn = 1 THEN val END) AS first_sum,
         max(CASE WHEN rn = 1 THEN time_start END) AS first_start,
         max(CASE WHEN rn = 1 THEN time_end END) AS first_end,
         max(CASE WHEN rn = nw THEN val END) AS last_sum_raw,
         max(CASE WHEN rn = nw THEN time_start END) AS last_start,
         max(CASE WHEN rn = nw THEN time_end END) AS last_end,
         {dsum('CASE WHEN rn > 1 AND rn < nw THEN val ELSE 0 END')} AS middle_sum
  FROM ranked GROUP BY stream_id, qid, t0, t1
),
lsum AS (
  SELECT p.stream_id, p.qid,
         {dsum(f'CASE WHEN r.t >= p.t0 AND r.t <= p.t1 THEN {lmv} ELSE 0 END')} AS lm_sum
  FROM parts p
  JOIN lmk ON lmk.stream_id = p.stream_id
  JOIN lmr r ON r.stream_id = p.stream_id
  WHERE least(lmk.l1, p.t1) >= greatest(lmk.l0, p.t0)
  GROUP BY p.stream_id, p.qid
),
est AS (
  SELECT p.stream_id, p.qid, p.t0, p.t1,
         p.first_sum, p.middle_sum,
         CASE WHEN p.nw = 1 THEN 0.0 ELSE p.last_sum_raw END AS last_sum,
         coalesce(l.lm_sum, 0.0) AS lm_sum,
         (p.first_end - p.first_start + 1)
           - CASE WHEN least(k.l1, p.t1) >= greatest(k.l0, p.t0) AND p.first_start < k.l1
                  THEN {ov.format(r1='k.l1', b1='p.first_end', l1='k.l0', a1='p.first_start')}
                  ELSE 0 END AS first_len,
         {ov.format(r1='p.first_end', b1='p.t1', l1='p.first_start', a1='p.t0')}
           - CASE WHEN least(k.l1, p.t1) >= greatest(k.l0, p.t0) AND p.first_start < k.l1
                  THEN {ov.format(r1='k.l1', b1='p.first_end', l1='k.l0', a1='p.t0')}
                  ELSE 0 END AS first_ov,
         (p.last_end - p.last_start + 1)
           - CASE WHEN least(k.l1, p.t1) >= greatest(k.l0, p.t0) AND p.last_end > k.l0
                  THEN {ov.format(r1='k.l1', b1='p.last_end', l1='k.l0', a1='p.last_start')}
                  ELSE 0 END AS last_len,
         {ov.format(r1='p.last_end', b1='p.t1', l1='p.last_start', a1='p.t0')}
           - CASE WHEN least(k.l1, p.t1) >= greatest(k.l0, p.t0) AND p.last_end > k.l0
                  THEN {ov.format(r1='k.l1', b1='p.t1', l1='k.l0', a1='p.last_start')}
                  ELSE 0 END AS last_ov
  FROM parts p
  LEFT JOIN lsum l ON l.stream_id = p.stream_id AND l.qid = p.qid
  JOIN lmk k ON k.stream_id = p.stream_id
),
acc AS (
  SELECT stream_id, qid, t0, t1,
         lm_sum + first_sum + middle_sum + last_sum AS upper_bound,
         lm_sum + middle_sum
           + CASE WHEN first_ov = first_len THEN first_sum ELSE 0.0 END
           + CASE WHEN last_ov = last_len THEN last_sum ELSE 0.0 END AS lower_bound,
         lm_sum + middle_sum
           + CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS mean,
         CASE WHEN first_ov > 0 THEN first_sum * (CAST(first_ov AS DOUBLE) / first_len) * (1.0 - CAST(first_ov AS DOUBLE) / first_len) ELSE 0.0 END
           + CASE WHEN last_ov > 0 THEN last_sum * (CAST(last_ov AS DOUBLE) / last_len) * (1.0 - CAST(last_ov AS DOUBLE) / last_len) ELSE 0.0 END AS var
  FROM est
)
SELECT stream_id, qid, t0, t1,
       round(mean, 6) AS estimate,
       round(greatest(mean - {Z_95} * sqrt(var), lower_bound), 6) AS lower_ci,
       round(least(mean + {Z_95} * sqrt(var), upper_bound), 6) AS upper_ci,
       round(lower_bound, 6) AS lower_bound,
       round(upper_bound, 6) AS upper_bound
FROM acc"""


def _decay_summary_replayed(dialect: str, windowing) -> str:
    """Canonical decayed summary windows for sequences WITHOUT a closed-form
    bucket (power, non-2 exponential bases) over the first 10k events as one
    stream.

    The canonical count-space boundaries are replayed driver-side
    (windowing.canonical_boundaries — the same merge-process replay the
    golden evolution tests verify) and shipped into the SQL as a literal
    inline table; bucketing is then a range join of the insertion index
    against O(log-ish n) boundary rows.  Both dialects run the identical
    text, so this is a full hash-match oracle for the replayed decay paths.

    Window counts at n=10000: power(1,1,10,1) -> 598 (equal to the
    reference's golden count after 10k appends, core/db_test.go:318-322),
    exp(1.5) -> 34 unbuffered (the reference's buffered run gives 33,
    core/db_test.go:336-340 — buffering coarsens by at most one window;
    tests/test_windowing.py pins the buffered counts exactly).
    """
    from summarydb_spark.windowing import canonical_boundaries

    n = 10_000
    bnd = canonical_boundaries(windowing, n)
    rows = ",".join(f"({k},{bnd[k]},{bnd[k + 1]})" for k in range(len(bnd) - 1))
    t = epoch_us("ts", dialect)
    return f"""
WITH pre AS (
  SELECT {t} AS t, value AS v, event_id
  FROM events ORDER BY 1, 3 LIMIT {n}
),
ev AS (
  SELECT t, v, row_number() OVER (ORDER BY t, event_id) - 1 AS idx FROM pre
),
bnd AS (SELECT * FROM (VALUES {rows}) AS x(window_id, lo, hi)),
b AS (
  SELECT bnd.window_id, ev.t, ev.v, ev.idx
  FROM ev JOIN bnd ON ev.idx >= bnd.lo AND ev.idx < bnd.hi
)
SELECT window_id,
       min(idx) AS count_start,
       max(idx) AS count_end,
       min(t) AS time_start,
       max(t) AS time_end,
       count(*) AS cnt,
       {dsum('v')} AS sum_v,
       max(v) AS max_v,
       min(v) AS min_v
FROM b GROUP BY window_id"""


def q_decay_summary_power(dialect: str) -> str:
    from summarydb_spark.windowing import PowerWindowing

    return _decay_summary_replayed(dialect, PowerWindowing(p=1, q=1, R=10, S=1))


def q_decay_summary_exp15(dialect: str) -> str:
    from summarydb_spark.windowing import ExpWindowing

    return _decay_summary_replayed(dialect, ExpWindowing(1.5))


def q_approx_minmax_range_landmark(dialect: str, op: str) -> str:
    """Landmark-corrected max/min range query — the reference's max error
    model (core/max_op.go:39-63): merge ALL overlapping summary windows,
    then fold in landmark values inside [t0, t1]; any landmark hit forces
    error to 0 (exact), otherwise error stays 1 (approximate flag).
    Landmark rows are EXCLUDED from the decayed build (core/stream.go:112-114).
    Ranges: full span (landmark hit -> exact) and newest tenth (no landmark
    -> approximate path)."""
    agg = "max" if op == "max" else "min"
    comb = "greatest" if op == "max" else "least"
    t = epoch_us("ts", dialect)
    ev_sql = """
  SELECT e.stream_id, e.t, e.v,
         row_number() OVER (PARTITION BY e.stream_id ORDER BY e.t, e.event_id) - 1 AS idx,
         count(*) OVER (PARTITION BY e.stream_id) AS n
  FROM ev0 e JOIN lmk ON lmk.stream_id = e.stream_id
  WHERE e.t < lmk.l0 OR e.t > lmk.l1"""
    if dialect == "spark":
        # store-only: summary windows, bounds, and exact landmark rows all
        # come from persisted state — no raw-events scan at query time
        head = f"""
WITH raw_b AS (SELECT stream_id, tmin, tmax FROM {SW_META_VIEW}),
lmr AS (SELECT stream_id, t, v FROM {SW_LMKROWS_VIEW}),
sw AS (
  SELECT stream_id, time_start, time_end, {op}_v AS wv FROM {SW_LMK_VIEW}
)"""
    else:
        head = f"""
WITH ev0 AS (
  SELECT user_id AS stream_id, {t} AS t, value AS v, event_id FROM events
),
raw_b AS (
  SELECT stream_id, min(t) AS tmin, max(t) AS tmax FROM ev0 GROUP BY stream_id
),
lmk AS (
  SELECT stream_id,
         tmin + CAST(floor((tmax - tmin) * 0.05) AS BIGINT) AS l0,
         tmin + CAST(floor((tmax - tmin) * 0.15) AS BIGINT) AS l1
  FROM raw_b
),
lmr AS (
  SELECT e.stream_id, e.t, e.v
  FROM ev0 e JOIN lmk k ON k.stream_id = e.stream_id
  WHERE e.t >= k.l0 AND e.t <= k.l1
),
bkt AS ({_bucketed(dialect, ev_sql)}
SELECT stream_id, t, v, bucket FROM b),
sw AS (
  SELECT stream_id, min(t) AS time_start, max(t) AS time_end,
         {agg}(v) AS wv
  FROM bkt GROUP BY stream_id, bucket
)"""
    return f"""{head},
qr AS (
  SELECT stream_id, 1 AS qid, tmin AS t0, tmax AS t1 FROM raw_b
  UNION ALL
  SELECT stream_id, 3, tmax - CAST(floor((tmax - tmin) * 0.10) AS BIGINT), tmax
  FROM raw_b
),
wsel AS (
  SELECT q.stream_id, q.qid, q.t0, q.t1, {agg}(s.wv) AS win_val
  FROM qr q JOIN sw s
    ON s.stream_id = q.stream_id AND s.time_end >= q.t0 AND s.time_start <= q.t1
  GROUP BY q.stream_id, q.qid, q.t0, q.t1
),
lm AS (
  SELECT q.stream_id, q.qid, {agg}(r.v) AS lm_val, count(*) AS lm_n
  FROM qr q
  JOIN lmr r ON r.stream_id = q.stream_id
   AND r.t >= q.t0 AND r.t <= q.t1
  GROUP BY q.stream_id, q.qid
)
SELECT w.stream_id, w.qid, w.t0, w.t1,
       CASE WHEN coalesce(l.lm_n, 0) > 0 THEN {comb}(w.win_val, l.lm_val)
            ELSE w.win_val END AS {op}_value,
       CASE WHEN coalesce(l.lm_n, 0) > 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(1 AS DOUBLE) END AS error_flag
FROM wsel w LEFT JOIN lm l ON l.stream_id = w.stream_id AND l.qid = w.qid"""


def q_approx_minmax_range(dialect: str, op: str) -> str:
    """Max/min over the overlapping canonical windows (core/max_op.go:39-63;
    min is the README-promised symmetric op the reference never built)."""
    agg = "max" if op == "max" else "min"
    if dialect == "spark":
        head = f"""
WITH sw AS (
  SELECT stream_id, time_start, time_end, max_v, min_v FROM {SW_FULL_VIEW}
)"""
    else:
        head = f"""{_bucketed(dialect)},
sw AS (
  SELECT stream_id, min(t) AS time_start, max(t) AS time_end,
         max(v) AS max_v, min(v) AS min_v
  FROM b GROUP BY stream_id, bucket
)"""
    return f"""{head},
sb AS (SELECT stream_id, min(time_start) AS tmin, max(time_end) AS tmax
       FROM sw GROUP BY stream_id),
{_query_ranges()}
SELECT q.stream_id, q.qid, q.t0, q.t1, {agg}({agg}_v) AS {agg}_value
FROM qr q JOIN sw s
  ON s.stream_id = q.stream_id AND s.time_end >= q.t0 AND s.time_start <= q.t1
GROUP BY q.stream_id, q.qid, q.t0, q.t1"""


def q_stream_stats(dialect: str) -> str:
    """Welford-style stream statistics (values + inter-arrival gaps) the
    reference declares but never wires (stats/stream_statistics.go:21-33) —
    implemented exactly, from order-independent decimal moments."""
    t = epoch_us("ts", dialect)
    return f"""
WITH ev AS (
  SELECT user_id AS stream_id, {t} AS t, value AS v,
         lag({t}) OVER (PARTITION BY user_id ORDER BY {t}, event_id) AS prev_t
  FROM events
),
g AS (
  SELECT stream_id, v,
         CASE WHEN prev_t IS NULL THEN CAST(NULL AS DOUBLE)
              ELSE CAST(t - prev_t AS DOUBLE) / 3600000000.0 END AS gap_h
  FROM ev
),
m AS (
  SELECT stream_id,
         count(*) AS n,
         {dsum('v')} AS sum_v,
         {dsum('v * v')} AS sum_v2,
         {dsum('coalesce(gap_h, 0.0)', 6)} AS sum_gap,
         {dsum('coalesce(gap_h * gap_h, 0.0)', 6)} AS sum_gap2
  FROM g GROUP BY stream_id
)
SELECT stream_id, n,
       round(sum_v / n, 6) AS value_mean,
       round((sum_v2 - sum_v * sum_v / n) / (n - 1), 6) AS value_var,
       round(sum_gap / (n - 1), 6) AS gap_mean_h,
       round((sum_gap2 - sum_gap * sum_gap / (n - 1)) / greatest(n - 2, 1), 6) AS gap_var_h
FROM m"""


# ---------------------------------------------------------------------------
# Relational coverage (absent from the reference — §2.6 — but table stakes
# for an analytics engine; all built-in Spark SQL).
# ---------------------------------------------------------------------------


def q_tpch_q1_like(dialect: str) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity')} AS sum_qty,
       {dsum('l_extendedprice')} AS sum_base_price,
       {dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       round({dsum('l_quantity')} / count(*), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""


def q_join_enrich(dialect: str) -> str:
    """Star join: revenue by region/month (broadcast-able dims)."""
    od = to_timestamp_col("o.o_orderdate", dialect)
    return f"""
SELECT r.r_name AS region, CAST(date_trunc('month', {od}) AS DATE) AS order_month,
       {dsum('o.o_totalprice')} AS revenue,
       count(*) AS orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, CAST(date_trunc('month', {od}) AS DATE)"""


def q_topk_per_group(dialect: str) -> str:
    """Top-3 parts by revenue per brand (window-function top-k)."""
    return f"""
WITH pr AS (
  SELECT p.p_brand, p.p_partkey,
         {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, p.p_partkey
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rk
  FROM pr
)
SELECT p_brand, p_partkey, round(revenue, 6) AS revenue, rk
FROM rk WHERE rk <= 3"""


def q_asof_join(dialect: str) -> str:
    """As-of join (events to most recent order at-or-before the event, per
    user) — an operator Spark has no native primitive for.

    Implementation: union both sides tagged by kind, one running-max window
    per user recovers the as-of order timestamp (max ignores the NULLs from
    event rows), then an equi-join pins the order row.  This shape scales:
    one shuffle on user, no range-join blowup; DuckDB runs the identical
    SQL (its native ASOF JOIN would also work but the portable plan is the
    point).
    """
    et = epoch_us("ts", dialect)
    # o_orderdate is micro-precision: a real TIMESTAMP in both dialects
    # (unlike events.ts which Spark reads as LONG nanos)
    # NTZ -> LTZ cast is value-preserving under the UTC session timezone,
    # matching DuckDB's epoch_us of the naive timestamp
    ot = (
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
        if dialect == "spark"
        else "epoch_us(o_orderdate)"
    )
    return f"""
WITH u AS (
  SELECT user_id, {et} AS t, 1 AS kind, event_id, CAST(NULL AS BIGINT) AS o_t
  FROM events
  UNION ALL
  SELECT o_custkey AS user_id, {ot} AS t, 0 AS kind, CAST(NULL AS BIGINT) AS event_id, {ot} AS o_t
  FROM orders
),
w AS (
  SELECT user_id, t, kind, event_id,
         max(o_t) OVER (PARTITION BY user_id ORDER BY t, kind
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_t
  FROM u
),
ev AS (SELECT user_id, t AS event_t, event_id, asof_t FROM w WHERE kind = 1),
ob AS (
  SELECT o_custkey, {ot} AS o_t, max(o_totalprice) AS best_price
  FROM orders GROUP BY o_custkey, {ot}
)
SELECT ev.event_id, ev.user_id, ev.event_t, ev.asof_t,
       ob.best_price AS asof_totalprice
FROM ev LEFT JOIN ob ON ob.o_custkey = ev.user_id AND ob.o_t = ev.asof_t"""


def q_sessionize(dialect: str) -> str:
    """Gap-based sessionization (1h inactivity) of the events stream via
    lag + running sum — per-session rows with bounds and sizes."""
    et = epoch_us("ts", dialect)
    gap = 3_600_000_000  # 1h in micros
    return f"""
WITH e AS (SELECT user_id, event_id, {et} AS t FROM events),
d AS (
  SELECT user_id, event_id, t,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > {gap}
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, t,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM d
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(t) AS t_start,
       max(t) AS t_end,
       max(t) - min(t) AS duration_us
FROM s
GROUP BY user_id, session_id"""


def q_tpch_q5_like(dialect: str) -> str:
    """Multi-join revenue rollup (lineitem-orders-customer-nation-region):
    the deep-join shape; small dims broadcast on the Spark side."""
    return f"""
SELECT r.r_name AS region, n.n_name AS nation,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name"""


def q_tpch_q6_like(dialect: str) -> str:
    """Pure scan-filter-aggregate (TPC-H Q6 shape): the predicate-pushdown /
    column-pruning showcase — at scale the parquet scan should read only the
    four referenced columns and skip row groups on l_shipdate min/max."""
    return f"""
SELECT {dsum('l_extendedprice * l_discount')} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= CAST(DATE '1996-01-01' AS TIMESTAMP)
  AND l_shipdate <  CAST(DATE '1997-01-01' AS TIMESTAMP)
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24"""


def q_rollup_revenue(dialect: str) -> str:
    """Hierarchical ROLLUP (region -> nation -> grand total) — grouping-sets
    coverage (absent from the reference, SURVEY §2.6).  GROUPING() makes the
    subtotal rows deterministic labels instead of bare NULLs."""
    return f"""
SELECT CASE WHEN GROUPING(r.r_name) = 1 THEN 'ALL' ELSE r.r_name END AS region,
       CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
       GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS grouping_level,
       {dsum('o.o_totalprice')} AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)"""


def q_distinct_agg(dialect: str) -> str:
    """Distinct aggregation per group (partial-agg + expand under the hood):
    distinct customers and ship-months per order priority."""
    return f"""
SELECT o.o_orderpriority,
       count(DISTINCT o.o_custkey) AS n_customers,
       count(DISTINCT CAST(date_trunc('month', l.l_shipdate) AS DATE)) AS n_ship_months,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority"""


def q_percentiles(dialect: str) -> str:
    """Exact interpolated percentiles per group (median + p95 of quantity,
    median extended price).  Spark ``percentile`` and DuckDB
    ``quantile_cont`` both compute the linear-interpolated continuous
    quantile, so values agree to rounding."""
    q = "percentile" if dialect == "spark" else "quantile_cont"
    return f"""
SELECT l_returnflag,
       round({q}(l_quantity, 0.5), 6) AS median_qty,
       round({q}(l_quantity, 0.95), 6) AS p95_qty,
       round({q}(l_extendedprice, 0.5), 6) AS median_price,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag"""


def q_set_ops_daily(dialect: str) -> str:
    """Set operation (EXCEPT) at (user, day) grain: days on which a user
    clicked but never purchased — classic funnel-leak set difference."""
    t = epoch_us("ts", dialect)
    day = f"CAST(floor({t} / 86400000000) AS BIGINT)"
    return f"""
WITH e AS (SELECT user_id, {day} AS day, event_type FROM events)
SELECT user_id, day FROM e WHERE event_type = 'click'
EXCEPT
SELECT user_id, day FROM e WHERE event_type = 'purchase'"""


def q_tumbling_window(dialect: str) -> str:
    """Fixed tumbling event-time windows (1 day) per stream — the uniform
    special case of the decayed windowing, and the Structured Streaming
    window-agg shape run as batch."""
    t = epoch_us("ts", dialect)
    return f"""
SELECT user_id AS stream_id,
       CAST(floor({t} / 86400000000) AS BIGINT) AS window_day,
       count(*) AS cnt,
       {dsum('value')} AS sum_v,
       max(value) AS max_v,
       min(value) AS min_v
FROM events
GROUP BY user_id, CAST(floor({t} / 86400000000) AS BIGINT)"""


def q_hopping_window(dialect: str) -> str:
    """Hopping (sliding) event-time windows — size 2 days, hop 1 day: each
    event contributes to exactly two overlapping windows, materialized by
    exploding per-event hop ids (the scalable pattern: expansion factor =
    size/hop, no self-join)."""
    t = epoch_us("ts", dialect)
    day = f"CAST(floor({t} / 86400000000) AS BIGINT)"
    if dialect == "spark":
        src = f"""
  SELECT user_id, value, hop
  FROM events LATERAL VIEW explode(sequence({day} - 1, {day})) x AS hop"""
    else:
        src = f"""
  SELECT user_id, value, hop
  FROM events, unnest(generate_series({day} - 1, {day})) AS x(hop)"""
    return f"""
WITH h AS ({src})
SELECT user_id AS stream_id,
       hop AS window_start_day,
       count(*) AS cnt,
       {dsum('value')} AS sum_v,
       max(value) AS max_v
FROM h
GROUP BY user_id, hop"""


def q_range_join_events(dialect: str) -> str:
    """Bounded range join: for every click, aggregate the same user's events
    in the following 6 hours.  Implemented bucket-wise (bucket width = range
    width, probe side explodes to 2 adjacent buckets, equi-join on
    (user, bucket), then the exact range filter) — the shape that avoids the
    O(n^2) interval-join blowup and shuffles once on (user, bucket)."""
    t = epoch_us("ts", dialect)
    w = 21_600_000_000  # 6h in micros
    bkt = f"CAST(floor({t} / {w}) AS BIGINT)"
    if dialect == "spark":
        probe = f"""
  SELECT user_id, event_id, {t} AS t0, b
  FROM events LATERAL VIEW explode(sequence({bkt}, {bkt} + 1)) x AS b
  WHERE event_type = 'click'"""
    else:
        probe = f"""
  SELECT user_id, event_id, {t} AS t0, b
  FROM events, unnest(generate_series({bkt}, {bkt} + 1)) AS x(b)
  WHERE event_type = 'click'"""
    return f"""
WITH probe AS ({probe}),
build AS (
  SELECT user_id, {t} AS t, value, {bkt} AS b FROM events
)
SELECT p.event_id, p.user_id, p.t0,
       count(*) AS n_follow,
       {dsum('e.value')} AS sum_follow,
       max(e.value) AS max_follow
FROM probe p JOIN build e
  ON e.user_id = p.user_id AND e.b = p.b
 AND e.t > p.t0 AND e.t <= p.t0 + {w}
GROUP BY p.event_id, p.user_id, p.t0"""


def q_ingest_synthetic_10m(dialect: str) -> str:
    """Ingest-throughput probe: the full decayed-summary build over 10M
    synthetic events (64 interleaved streams), generated identically in both
    engines by ``range()`` — independent of sf_dir, so the oracle
    hash-checks the build at ~100x the sf0.1 events volume.

    The interleaving (stream = id mod 64, global time = id) makes the
    per-stream insertion index a closed form (id div 64), so the probe
    measures exactly the scan -> bucket math -> partial/final aggregation
    pipeline — the engine's ingest hot path (the Spark analogue of the
    reference's append benchmark, core/db_test.go:402-502) — with no
    window-function preprocessing.  Output is 64 streams x O(log 156k)
    windows = ~1.2k rows."""
    n = 10_000_000
    streams = 64
    per = n // streams
    if dialect == "spark":
        src = f"SELECT id FROM range({n})"
        idiv = "div"
    else:
        src = f"SELECT range AS id FROM range({n})"
        idiv = "//"
    ev_sql = f"""
  SELECT (id % {streams}) AS stream_id,
         id AS t,
         ((id % 1000) * CAST(0.5 AS DOUBLE)) AS v,
         (id {idiv} {streams}) AS idx,
         CAST({per} AS BIGINT) AS n
  FROM ({src})"""
    return f"""{_bucketed(dialect, ev_sql)}
SELECT stream_id,
       min(idx) AS window_id,
       min(t) AS time_start,
       max(t) AS time_end,
       count(*) AS cnt,
       {dsum('v')} AS sum_v,
       max(v) AS max_v,
       min(v) AS min_v
FROM b
GROUP BY stream_id, bucket"""


def q_cube_events(dialect: str) -> str:
    """Full CUBE over (event_type, day): all four grouping sets in one pass
    (Spark expands via a single Expand node feeding one hash aggregate —
    no per-set rescans).  GROUPING() labels keep subtotal rows
    deterministic."""
    t = epoch_us("ts", dialect)
    day = f"CAST(floor({t} / 86400000000) AS BIGINT)"
    return f"""
WITH e AS (SELECT event_type, {day} AS day, value FROM events)
SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
       CASE WHEN GROUPING(day) = 1 THEN CAST(-1 AS BIGINT) ELSE day END AS day,
       GROUPING(event_type) * 2 + GROUPING(day) AS grouping_level,
       count(*) AS cnt,
       {dsum('value')} AS sum_v
FROM e
GROUP BY CUBE(event_type, day)"""


def q_semi_anti_join(dialect: str) -> str:
    """Correlated EXISTS / NOT EXISTS — compiled by Spark to left-semi and
    left-anti hash joins (no subquery re-execution): customers who ordered
    in 1995 but never placed a high-priority order."""
    return """
SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= CAST(DATE '1995-01-01' AS TIMESTAMP)
    AND o.o_orderdate <  CAST(DATE '1996-01-01' AS TIMESTAMP)
)
AND NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)"""


def q_json_props(dialect: str) -> str:
    """JSON scalar-function coverage: extract the numeric field from the
    events ``props`` JSON payload and aggregate it per event type.  At scale
    the extraction is a codegen'd row expression — no UDF, full pushdown of
    the surrounding scan."""
    if dialect == "spark":
        k = "CAST(get_json_object(props, '$.k') AS BIGINT)"
    else:
        k = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    return f"""
SELECT event_type,
       count(*) AS cnt,
       CAST(sum({k}) AS BIGINT) AS sum_k,
       min({k}) AS min_k,
       max({k}) AS max_k,
       count(DISTINCT {k}) AS distinct_k
FROM events
GROUP BY event_type"""


def q_array_embedding_stats(dialect: str) -> str:
    """Array scalar-function coverage over the embedding column: dimension,
    L2 norm, max component — per-row higher-order-function math, no UDF.
    Both dialects fold the squared components left-to-right in list order,
    so the IEEE double sums are bit-identical."""
    if dialect == "spark":
        dim = "cardinality(embedding)"
        l2sq = (
            "aggregate(embedding, CAST(0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
        mx = "CAST(array_max(embedding) AS DOUBLE)"
    else:
        dim = "len(embedding)"
        l2sq = (
            "list_reduce(list_prepend(0.0, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)"
        )
        mx = "CAST(list_max(embedding) AS DOUBLE)"
    return f"""
SELECT vec_id, label,
       {dim} AS dim,
       round(sqrt({l2sq}), 6) AS l2_norm,
       round({mx}, 6) AS max_component
FROM embeddings"""



def q_weighted_quantiles(dialect: str) -> str:
    """Quantity-WEIGHTED lower quantiles of price per return flag (the
    inventory-mass median, not the line-count median) — entirely in
    integers: weights are rounded quantities, the quantile predicate is
    the cross-multiplied 2*cumw >= total (no division anywhere), and the
    picked value is an exact cents amount.  Scale shape: one hash agg to
    the (flag, price) spine, then a per-flag cumulative window over that
    bounded spine — never a window over raw lineitem rows."""
    return """
WITH x AS (
  SELECT l_returnflag AS flag,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         CAST(round(l_quantity) AS BIGINT) AS wt
  FROM lineitem
),
c AS (SELECT flag, price_c, sum(wt) AS w FROM x GROUP BY flag, price_c),
cum AS (
  SELECT flag, price_c,
         sum(w) OVER (PARTITION BY flag ORDER BY price_c) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM c
)
SELECT flag,
       CAST(min(CASE WHEN 2 * cw >= tw THEN price_c END) AS BIGINT)
         AS wmedian_price_c,
       CAST(min(CASE WHEN 10 * cw >= 9 * tw THEN price_c END) AS BIGINT)
         AS wp90_price_c,
       CAST(max(tw) AS BIGINT) AS total_weight
FROM cum
GROUP BY flag
ORDER BY flag"""


def q_benford_profile(dialect: str) -> str:
    """Benford first-significant-digit profile of order totals — the
    classic synthetic-data / fraud DQ screen.  Digit extraction is string
    math on the exact integer cents (no log10 floats); the per-digit
    share is exact integer ppm.  One scan + 9-group agg."""
    idiv = "DIV" if dialect == "spark" else "//"
    stype = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                        AS {stype}), 1, 1) AS INTEGER) AS digit
  FROM orders
  WHERE o_totalprice > 0
),
t AS (SELECT count(*) AS n_total FROM d)
SELECT d.digit,
       CAST(count(*) AS BIGINT) AS n,
       CAST((count(*) * 1000000) {idiv} t.n_total AS BIGINT) AS ppm
FROM d, t
GROUP BY d.digit, t.n_total
ORDER BY d.digit"""

CORE_QUERIES = {
    "decay_summary_exp2": q_decay_summary_exp2,
    "decay_compaction_exp2": q_compaction_exp2,
    "approx_count_range": lambda d: q_approx_range(d, "count"),
    "approx_sum_range": lambda d: q_approx_range(d, "sum"),
    "approx_sum_range_landmark": lambda d: q_approx_range_landmark(d, "sum"),
    "approx_count_range_landmark": lambda d: q_approx_range_landmark(d, "count"),
    "approx_max_range": lambda d: q_approx_minmax_range(d, "max"),
    "approx_min_range": lambda d: q_approx_minmax_range(d, "min"),
    "approx_max_range_landmark": lambda d: q_approx_minmax_range_landmark(d, "max"),
    "approx_min_range_landmark": lambda d: q_approx_minmax_range_landmark(d, "min"),
    "decay_summary_power": q_decay_summary_power,
    "decay_summary_exp15": q_decay_summary_exp15,
    "stream_stats": q_stream_stats,
    "tpch_q1_like": q_tpch_q1_like,
    "join_enrich_region_month": q_join_enrich,
    "topk_parts_per_brand": q_topk_per_group,
    "asof_join_events_orders": q_asof_join,
    "sessionize_events": q_sessionize,
    "tpch_q5_like_revenue": q_tpch_q5_like,
    "tpch_q6_like_filter": q_tpch_q6_like,
    "rollup_revenue_region_nation": q_rollup_revenue,
    "distinct_agg_priority": q_distinct_agg,
    "percentiles_by_returnflag": q_percentiles,
    "set_ops_click_no_purchase": q_set_ops_daily,
    "tumbling_window_daily": q_tumbling_window,
    "hopping_window_2d1d": q_hopping_window,
    "range_join_click_follow": q_range_join_events,
    "ingest_synthetic_10m": q_ingest_synthetic_10m,
    "cube_events_type_day": q_cube_events,
    "semi_anti_join_customers": q_semi_anti_join,
    "json_props_extract": q_json_props,
    "array_embedding_stats": q_array_embedding_stats,
    "weighted_quantiles_by_flag": q_weighted_quantiles,
    "benford_first_digit": q_benford_profile,
}


def render(name: str, dialect: str) -> str:
    assert dialect in DIALECTS
    return CORE_QUERIES[name](dialect)
