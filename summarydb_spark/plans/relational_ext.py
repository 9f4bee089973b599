"""Relational coverage extensions: pivot, analytic window functions,
grouping sets, decorrelated scalar-subquery shapes, classic TPC-H-like
join-agg-topk plans, token vocabulary, fuzzy matching, and deterministic
stratified sampling.

Same one-template-two-dialects scheme as portable_sql (the DuckDB rendering
is the oracle).  All of these are absent from the reference engine
(SURVEY.md §2.6 lists the absences explicitly) but are table stakes for the
analytics surface this engine exposes on top of the summary store.

Scale notes (100 TB discipline):
- every query is scan -> (broadcastable dim joins) -> one or two hash
  aggregates; no cross joins, no per-row Python;
- top-k queries sort only the aggregated output (ORDER BY + LIMIT after
  GROUP BY => Spark's TakeOrderedAndProject, no full sort of the fact);
- the fuzzy-match pair space is blocked on (brand, size) so the quadratic
  verify runs inside ~16-row buckets exactly like the LSH family;
- the stratified sample hashes the key (md5-portable) instead of rand() —
  reproducible across engines, retries, and partitionings.
"""

from __future__ import annotations

from summarydb_spark.plans.portable_dedup import md560
from summarydb_spark.plans.portable_sql import dsum, epoch_us

PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
PRIORITY_ALIASES = ("urgent", "high", "medium", "notspec", "low")


def q_pivot_priority_revenue(dialect: str) -> str:
    """Order revenue pivoted to one column per priority class.

    Spark side uses the native PIVOT clause (compiles to a single hash
    aggregate with pivot-first aggregation, one pass); the oracle spells the
    same thing as conditional aggregation with matching column aliases."""
    if dialect == "spark":
        in_list = ", ".join(
            f"'{p}' AS {a}" for p, a in zip(PRIORITIES, PRIORITY_ALIASES)
        )
        return f"""
SELECT * FROM (
  SELECT o_orderstatus, o_orderpriority, o_totalprice FROM orders
)
PIVOT (
  {dsum('o_totalprice')} FOR o_orderpriority IN ({in_list})
)"""
    cols = ",\n       ".join(
        f"CAST(round(sum(CASE WHEN o_orderpriority = '{p}' "
        f"THEN CAST(o_totalprice AS DECIMAL(38,10)) END), 4) AS DOUBLE) AS {a}"
        for p, a in zip(PRIORITIES, PRIORITY_ALIASES)
    )
    return f"""
SELECT o_orderstatus,
       {cols}
FROM orders
GROUP BY o_orderstatus"""


def q_window_lead_lag_monthly(dialect: str) -> str:
    """Month-over-month revenue per nation: lag/lead analytics over an
    aggregated frame plus a deterministic in-nation revenue rank."""
    return f"""
WITH m AS (
  SELECT n.n_name AS nation,
         year(o.o_orderdate) * 100 + month(o.o_orderdate) AS ym,
         {dsum('o.o_totalprice')} AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY n.n_name, year(o.o_orderdate) * 100 + month(o.o_orderdate)
)
SELECT nation, ym, revenue,
       lag(revenue) OVER (PARTITION BY nation ORDER BY ym) AS prev_revenue,
       lead(revenue) OVER (PARTITION BY nation ORDER BY ym) AS next_revenue,
       CAST(floor((revenue - coalesce(lag(revenue) OVER (PARTITION BY nation ORDER BY ym),
                                      CAST(0 AS DOUBLE))) * 100) AS BIGINT) AS delta_cents,
       CAST(row_number() OVER (PARTITION BY nation ORDER BY revenue DESC, ym) AS BIGINT) AS rev_rank
FROM m"""


def q_ntile_acctbal_quartiles(dialect: str) -> str:
    """ntile(4) balance quartiles per nation, then per-quartile stats —
    ranking-function coverage with a deterministic tie-break."""
    return f"""
WITH q AS (
  SELECT c_nationkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT c_nationkey, CAST(quartile AS BIGINT) AS quartile,
       count(*) AS n_customers,
       {dsum('c_acctbal')} AS bal_sum,
       min(c_acctbal) AS bal_min,
       max(c_acctbal) AS bal_max
FROM q
GROUP BY c_nationkey, quartile"""


def q_small_quantity_revenue(dialect: str) -> str:
    """TPC-H Q17 shape: revenue of line items below 20% of their part's
    average quantity.

    The correlated scalar subquery is decorrelated into a pre-aggregated
    join (what Catalyst does internally), and the 20%-of-average predicate
    is compared in exact integer ten-thousandths — `5*q*cnt < sum_q` is
    the same inequality with no engine-dependent double division."""
    return f"""
WITH lq AS (
  SELECT l_partkey, l_extendedprice,
         CAST(floor(l_quantity * 10000 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS qc
  FROM lineitem
),
pa AS (
  SELECT l_partkey, count(*) AS cnt, sum(qc) AS sum_qc
  FROM lq GROUP BY l_partkey
)
SELECT p.p_brand,
       count(*) AS n_items,
       {dsum('l.l_extendedprice')} AS total_price,
       CAST(round({dsum('l.l_extendedprice')} / CAST(7 AS DOUBLE), 4) AS DOUBLE) AS avg_yearly
FROM lq l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * l.qc * pa.cnt < pa.sum_qc
GROUP BY p.p_brand"""


def q_tpch_q3_like(dialect: str) -> str:
    """TPC-H Q3 shape: top-10 unshipped BUILDING-segment orders by revenue.
    ORDER BY + LIMIT over the aggregated output only (TakeOrderedAndProject
    in Spark — never a full sort of lineitem)."""
    return f"""
SELECT o.o_orderkey, o.o_orderdate,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < CAST(DATE '1995-03-15' AS TIMESTAMP)
  AND l.l_shipdate > CAST(DATE '1995-03-15' AS TIMESTAMP)
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10"""


def q_tpch_q10_like(dialect: str) -> str:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in one
    quarter; four-way join, aggregate, top-k."""
    return f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= CAST(DATE '1995-01-01' AS TIMESTAMP)
  AND o.o_orderdate <  CAST(DATE '1995-04-01' AS TIMESTAMP)
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20"""


def q_token_vocab_top50(dialect: str) -> str:
    """Corpus vocabulary build: explode normalized tokens, global term and
    document frequencies, deterministic top-50.  The explode -> hash-agg
    shape is the canonical distributed wordcount (map-side partial agg)."""
    if dialect == "spark":
        norm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
        tk = f"""
tk AS (
  SELECT doc_id, tok
  FROM documents LATERAL VIEW explode(split({norm}, ' ')) AS tok
)"""
    else:
        norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
        tk = f"""
tk AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS tok
  FROM documents
)"""
    return f"""
WITH {tk},
cnt AS (
  SELECT tok, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq
  FROM tk GROUP BY tok
),
rk AS (
  SELECT tok, term_freq, doc_freq,
         CAST(row_number() OVER (ORDER BY term_freq DESC, tok) AS BIGINT) AS rnk
  FROM cnt
)
SELECT tok, term_freq, doc_freq, rnk FROM rk WHERE rnk <= 50"""


def q_dow_histogram(dialect: str) -> str:
    """Events histogram by day-of-week x event_type.  Day-of-week comes from
    pure epoch integer arithmetic ((epoch_days + 3) % 7, 0 = Monday) — no
    engine/locale/timezone DOW conventions involved."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH e AS (
  SELECT ({t} {idiv} 86400000000) AS epoch_day, event_type, value FROM events
)
SELECT CAST((epoch_day + 3) % 7 AS BIGINT) AS dow_mon0, event_type,
       count(*) AS cnt,
       {dsum('value')} AS sum_v
FROM e
GROUP BY (epoch_day + 3) % 7, event_type"""


def q_fuzzy_part_names(dialect: str) -> str:
    """Fuzzy self-match of part names: block on (brand, size) — bounded
    ~16-row buckets at any scale factor — then verify pairs with exact
    Levenshtein distance <= 12; aggregate per brand."""
    return f"""
WITH p AS (SELECT p_partkey, p_brand, p_size, p_name FROM part),
pairs AS (
  SELECT a.p_brand, levenshtein(a.p_name, b.p_name) AS dist
  FROM p a JOIN p b
    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
   AND a.p_partkey < b.p_partkey
)
SELECT p_brand,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN dist <= 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_close,
       min(dist) AS min_dist
FROM pairs
GROUP BY p_brand"""


def q_stratified_sample(dialect: str) -> str:
    """Deterministic 10% stratified sample per order priority via a
    portable key hash (md5) — reproducible across engines, retries, and
    partitionings, unlike rand()-based sampling."""
    key = "CAST(o_orderkey AS STRING)" if dialect == "spark" else "CAST(o_orderkey AS VARCHAR)"
    return f"""
WITH s AS (
  SELECT o_orderpriority, o_totalprice,
         {md560(key, dialect)} % 100 AS bucket
  FROM orders
)
SELECT o_orderpriority,
       count(*) AS n_sampled,
       {dsum('o_totalprice')} AS sampled_revenue,
       min(bucket) AS min_bucket,
       max(bucket) AS max_bucket
FROM s
WHERE bucket < 10
GROUP BY o_orderpriority"""


def q_grouping_sets_region(dialect: str) -> str:
    """Explicit GROUPING SETS ((region), (region, nation), ()) — the third
    member of the rollup/cube family, with GROUPING() labels."""
    return f"""
SELECT CASE WHEN GROUPING(r.r_name) = 1 THEN 'ALL' ELSE r.r_name END AS region,
       CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
       GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS grouping_level,
       count(*) AS n_customers,
       {dsum('c.c_acctbal')} AS bal_sum
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY GROUPING SETS ((r.r_name), (r.r_name, n.n_name), ())"""


def q_unpivot_priority_revenue(dialect: str) -> str:
    """UNPIVOT (melt) of the pivoted per-priority revenue back to long form
    — the reshape-operator pair with q_pivot_priority_revenue.  The oracle
    states the same result directly as a labeled GROUP BY."""
    if dialect == "spark":
        in_list = ", ".join(PRIORITY_ALIASES)
        return f"""
SELECT o_orderstatus, priority, revenue
FROM ({q_pivot_priority_revenue('spark')})
UNPIVOT (revenue FOR priority IN ({in_list}))"""
    label = " ".join(
        f"WHEN '{p}' THEN '{a}'" for p, a in zip(PRIORITIES, PRIORITY_ALIASES)
    )
    return f"""
SELECT o_orderstatus,
       CASE o_orderpriority {label} END AS priority,
       {dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY o_orderstatus, CASE o_orderpriority {label} END"""


def q_gap_fill_locf(dialect: str) -> str:
    """Time-series gap filling: generate the full per-stream daily calendar
    spine, left-join observed daily sums, forward-fill missing days with
    last-observation-carried-forward (IGNORE NULLS window).

    The spine explode is O(streams x span-days) — rows, not raw events —
    and the fill is one window pass; the classic TSDB densify operator the
    reference cannot express (SURVEY §2.6: no window functions)."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    if dialect == "spark":
        spine = """
spine AS (
  SELECT stream_id, d0 + x AS day
  FROM bounds LATERAL VIEW explode(sequence(CAST(0 AS BIGINT), d1 - d0)) AS x
)"""
        locf = (
            "last_value(raw_sum) IGNORE NULLS OVER "
            "(PARTITION BY stream_id ORDER BY day "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:
        spine = """
spine AS (
  SELECT stream_id, unnest(range(0, d1 - d0 + 1)) + d0 AS day
  FROM bounds
)"""
        locf = (
            "last_value(raw_sum IGNORE NULLS) OVER "
            "(PARTITION BY stream_id ORDER BY day "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    return f"""
WITH d AS (
  SELECT user_id AS stream_id, ({t} {idiv} 86400000000) AS day,
         {dsum('value')} AS sum_v, count(*) AS cnt
  FROM events GROUP BY user_id, ({t} {idiv} 86400000000)
),
bounds AS (SELECT stream_id, min(day) AS d0, max(day) AS d1 FROM d GROUP BY stream_id),
{spine},
j AS (
  SELECT s.stream_id, s.day, d.sum_v AS raw_sum,
         CASE WHEN d.stream_id IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM spine s LEFT JOIN d ON d.stream_id = s.stream_id AND d.day = s.day
)
SELECT stream_id, day, raw_sum,
       {locf} AS locf_sum,
       is_gap
FROM j"""


def q_exists_late_ship(dialect: str) -> str:
    """TPC-H Q4 shape: orders per priority having at least one line item
    shipped more than 60 days after the order date — correlated EXISTS,
    which both engines decorrelate to a left-semi join on l_orderkey (no
    per-row subquery execution; Spark shows BroadcastHashJoin/SortMergeJoin
    LeftSemi)."""
    return """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= CAST(DATE '1995-01-01' AS TIMESTAMP)
  AND o.o_orderdate <  CAST(DATE '1995-07-01' AS TIMESTAMP)
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o.o_orderpriority"""


def q_correlated_max_order(dialect: str) -> str:
    """Correlated scalar subquery: orders matching their customer's maximum
    order value, counted per order status.  Both engines decorrelate the
    subquery into a pre-aggregated max-per-customer join (Catalyst's
    RewriteCorrelatedScalarSubquery) — the plan is scan -> partial-agg ->
    join, never a per-row subquery."""
    return f"""
SELECT o.o_orderstatus,
       count(*) AS n_top_orders,
       {dsum('o.o_totalprice')} AS top_revenue
FROM orders o
WHERE o.o_totalprice = (
    SELECT max(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
GROUP BY o.o_orderstatus"""


def q_moving_avg_7d(dialect: str) -> str:
    """7-day (7-row) trailing moving average of per-stream daily event sums
    — the analytic window-frame operator (ROWS BETWEEN 6 PRECEDING AND
    CURRENT ROW).  The frame runs over the pre-aggregated daily table
    (streams x days rows), not raw events; the frame sum accumulates in
    DECIMAL so it is order-independent and engine-portable."""
    t = epoch_us("ts", dialect)
    idiv = "div" if dialect == "spark" else "//"
    frame = (
        "OVER (PARTITION BY stream_id ORDER BY day "
        "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
    )
    return f"""
WITH d AS (
  SELECT user_id AS stream_id, ({t} {idiv} 86400000000) AS day,
         {dsum('value')} AS sum_v
  FROM events GROUP BY user_id, ({t} {idiv} 86400000000)
)
SELECT stream_id, day, sum_v,
       CAST(round(
         CAST(sum(CAST(sum_v AS DECIMAL(38,10))) {frame} AS DOUBLE)
           / CAST(count(*) {frame} AS DOUBLE), 6) AS DOUBLE) AS ma7,
       CAST(count(*) {frame} AS BIGINT) AS frame_n
FROM d"""


def q_regexp_source_buckets(dialect: str) -> str:
    """Regex extraction: pull the numeric id out of the document source tag
    ('src17' -> 17), bucket by id % 10, aggregate char counts — scalar
    regexp_extract coverage with an identical call shape in both engines."""
    return """
WITH x AS (
  SELECT CAST(nullif(regexp_extract(source, '[0-9]+', 0), '') AS BIGINT)
           AS src_id,
         n_chars
  FROM documents
)
SELECT src_id % 10 AS src_bucket,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(min(src_id) AS BIGINT) AS min_src,
       CAST(max(src_id) AS BIGINT) AS max_src
FROM x
GROUP BY src_id % 10"""


def q_window_zoo_acctbal(dialect: str) -> str:
    """Coverage for the remaining SQL window functions in one query:
    cume_dist, nth_value, first_value, frame-spanning last_value, and
    IGNORE NULLS (a nullable positive-balance column) — per-nation windows
    over customers with a (acctbal, custkey) total order, so every
    function's answer is deterministic.  cume_dist is an exact k/n integer
    ratio, floor-scaled to micros."""
    if dialect == "spark":
        lv_ignore = "last_value(pos_bal) IGNORE NULLS OVER wfull"
    else:
        lv_ignore = "last_value(pos_bal IGNORE NULLS) OVER wfull"
    return f"""
WITH c AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CASE WHEN c_acctbal > 0 THEN c_custkey ELSE NULL END AS pos_bal
  FROM customer
)
SELECT c_nationkey, c_custkey,
       CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_dist_micro,
       nth_value(c_custkey, 3) OVER w AS third_cust_so_far,
       first_value(c_custkey) OVER w AS poorest_cust,
       last_value(c_custkey) OVER wfull AS richest_cust,
       {lv_ignore} AS richest_positive_cust
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
       wfull AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""


def q_event_type_islands(dialect: str) -> str:
    """Gaps-and-islands over value CHANGES (vs sessionize's time gaps):
    per user, consecutive runs of the same event type collapse to one
    island via the row_number-difference trick (two windows, zero joins);
    output profiles run lengths per event type — longest run, runs seen,
    average length as an exact integer ratio rounded to 4.  One shuffle
    on user_id; island ids are per-user integers so the grouping is
    deterministic under the (t, event_id) total order."""
    t = epoch_us("ts", dialect)
    return f"""
WITH e AS (
  SELECT user_id, event_type, {t} AS t, event_id FROM events
),
r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
           - row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY t, event_id) AS grp
  FROM e
),
islands AS (
  SELECT user_id, event_type, grp, count(*) AS run_len
  FROM r GROUP BY user_id, event_type, grp
)
SELECT event_type,
       count(*) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS longest_run,
       CAST(sum(run_len) AS BIGINT) AS n_events,
       CAST(round(sum(run_len) * 1.0 / count(*), 4) AS DOUBLE) AS avg_run_len
FROM islands
GROUP BY event_type"""


RELATIONAL_EXT_QUERIES = {
    "window_zoo_acctbal": q_window_zoo_acctbal,
    "event_type_islands": q_event_type_islands,
    "exists_late_ship_orders": q_exists_late_ship,
    "correlated_max_order": q_correlated_max_order,
    "moving_avg_7d_daily": q_moving_avg_7d,
    "regexp_source_buckets": q_regexp_source_buckets,
    "gap_fill_locf_daily": q_gap_fill_locf,
    "unpivot_priority_revenue": q_unpivot_priority_revenue,
    "pivot_priority_revenue": q_pivot_priority_revenue,
    "window_lead_lag_monthly": q_window_lead_lag_monthly,
    "ntile_acctbal_quartiles": q_ntile_acctbal_quartiles,
    "small_quantity_revenue_q17": q_small_quantity_revenue,
    "tpch_q3_like_topk": q_tpch_q3_like,
    "tpch_q10_like_returns": q_tpch_q10_like,
    "token_vocab_top50": q_token_vocab_top50,
    "dow_histogram_events": q_dow_histogram,
    "fuzzy_part_names": q_fuzzy_part_names,
    "stratified_sample_orders": q_stratified_sample,
    "grouping_sets_region_nation": q_grouping_sets_region,
}
