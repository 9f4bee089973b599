"""Advanced relational + LLM-pipeline coverage, batch 2.

Same one-template-two-dialects scheme as portable_sql (DuckDB rendering is
the oracle): conditional-aggregation revenue share (TPC-H Q14 shape),
disjunctive OR-of-ANDs pushdown (Q19), multi-EXISTS self-join (Q21),
uncorrelated scalar subquery + anti join (Q22), min-within-group-then-join
(Q2 shape via lineitem unit prices — the testdata has no partsupp table),
null-aware NOT IN (Q16 shape), rational TF-IDF term ranking, and positional
token statistics via a lateral positions join.

Scale notes (100 TB discipline):
- Q14/Q19/Q16 are scan -> broadcast(part/supplier) join -> one hash agg;
  the disjunctive Q19 predicate stays a single codegen'd filter, and the
  p_size/p_brand conjuncts push into the part-side parquet scan;
- Q21's two correlated subqueries compile to one left-semi and one
  left-anti hash join against the same lineitem scan (no re-execution);
  at scale both shuffle on l_orderkey — the same key as the main join, so
  AQE reuses the exchange;
- TF-IDF is explode -> two hash aggs (term-per-doc, then doc-freq) and a
  broadcast-sized idf table at any corpus size where vocab << corpus;
  the idf weight is exact integer arithmetic (ppm rational instead of
  ln()) so both engines agree bit-for-bit — swap in log() idf at scale if
  cross-engine bit equality is not required.
"""

from __future__ import annotations

from summarydb_spark.plans.portable_sql import dsum


def q_tpch_q14_like_promo(dialect: str) -> str:
    """Promo revenue share per month (TPC-H Q14 shape): conditional
    aggregation over a fact-dim join; `part` is broadcast on the Spark
    side.  Share = promo / total from the two decimal-exact sums."""
    rev = "l.l_extendedprice * (1 - l.l_discount)"
    promo = f"CASE WHEN p.p_type = 'PROMO' THEN {rev} ELSE CAST(0 AS DOUBLE) END"
    return f"""
SELECT year(l.l_shipdate) * 100 + month(l.l_shipdate) AS ym,
       {dsum(promo)} AS promo_revenue,
       {dsum(rev)} AS total_revenue,
       round({dsum(promo)} / nullif({dsum(rev)}, 0.0), 6) AS promo_share,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY year(l.l_shipdate) * 100 + month(l.l_shipdate)"""


def q_tpch_q19_like_disjunctive(dialect: str) -> str:
    """Disjunctive OR-of-ANDs predicate (TPC-H Q19 shape): one global
    aggregate whose filter is three brand/size/quantity conjunct groups.
    Catalyst keeps this a single codegen'd filter over the broadcast join;
    the common `p_size >= 1` and brand-set conjuncts are pushed to the
    part scan."""
    return f"""
SELECT {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)"""


def q_tpch_q21_like_late_suppliers(dialect: str) -> str:
    """Suppliers who alone shipped late on a multi-supplier order (TPC-H
    Q21 shape): EXISTS + NOT EXISTS correlated self-joins on lineitem,
    compiled to left-semi and left-anti hash joins on l_orderkey — the
    same shuffle key as the driving join, so the exchange is reused.
    'Late' = shipped more than a year after the order date."""
    late = "l{i}.l_shipdate > o.o_orderdate + INTERVAL 365 DAY"
    if dialect == "duckdb":
        late = "l{i}.l_shipdate > o.o_orderdate + INTERVAL 365 DAYS"
    return f"""
SELECT s.s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE {late.format(i=1)}
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND {late.format(i=3)}
  )
GROUP BY s.s_name"""


def q_tpch_q22_like_idle_customers(dialect: str) -> str:
    """Well-funded customers with no orders, per nation (TPC-H Q22 shape):
    an uncorrelated scalar subquery (global positive-balance average,
    broadcast as a literal at runtime) filters the customer scan, and a
    NOT EXISTS anti join removes customers with recent orders (every
    customer in the testdata has *some* order, so 'idle' = nothing since
    1998).  The average is decimal-exact so both engines cut at the
    identical threshold."""
    avg_pos = (
        "SELECT CAST(round(sum(CAST(c_acctbal AS DECIMAL(38,10))), 4) AS DOUBLE)"
        " / count(*) FROM customer WHERE c_acctbal > 0.0"
    )
    return f"""
SELECT c.c_nationkey,
       count(*) AS numcust,
       {dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > ({avg_pos})
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= CAST(DATE '1998-01-01' AS TIMESTAMP)
  )
GROUP BY c.c_nationkey"""


def q_min_cost_supplier(dialect: str) -> str:
    """Cheapest supplier per small part (TPC-H Q2 shape without partsupp:
    unit price observed on lineitem stands in for ps_supplycost).
    Min-within-group via rank over (part), then join back to the dims —
    the two-phase 'aggregate then re-join winners' plan; part and
    supplier broadcast on the Spark side."""
    return """
WITH up AS (
  SELECT l_partkey, l_suppkey,
         min(round(l_extendedprice / l_quantity, 4)) AS unit_price
  FROM lineitem
  WHERE l_quantity > 0.0
  GROUP BY l_partkey, l_suppkey
),
rk AS (
  SELECT l_partkey, l_suppkey, unit_price,
         CAST(row_number() OVER (PARTITION BY l_partkey
                                 ORDER BY unit_price, l_suppkey) AS BIGINT) AS rnk
  FROM up
)
SELECT p.p_partkey, p.p_brand, p.p_type,
       s.s_suppkey, s.s_name, n.n_name AS nation,
       rk.unit_price
FROM rk
JOIN part p ON p.p_partkey = rk.l_partkey
JOIN supplier s ON s.s_suppkey = rk.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE rk.rnk = 1 AND p.p_size <= 5 AND p.p_type = 'SMALL'"""


def q_supplier_count_not_in(dialect: str) -> str:
    """Distinct-supplier counts by part attributes excluding flagged
    suppliers (TPC-H Q16 shape): NOT IN compiles to Spark's null-aware
    anti join (single broadcast-able exclusion set), then a
    count(DISTINCT) hash aggregate."""
    return """
SELECT p.p_brand, p.p_type,
       count(DISTINCT l.l_suppkey) AS supplier_cnt,
       count(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size BETWEEN 1 AND 15
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p.p_brand, p.p_type"""


def _tokens_cte(dialect: str) -> str:
    """Normalized (doc_id, tok) exploded tokens — same normalization as
    q_token_vocab_top50."""
    if dialect == "spark":
        norm = "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"
        return f"""
tk AS (
  SELECT doc_id, tok
  FROM documents LATERAL VIEW explode(split({norm}, ' ')) AS tok
)"""
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    return f"""
tk AS (
  SELECT doc_id, unnest(string_split({norm}, ' ')) AS tok
  FROM documents
)"""


def q_tfidf_top_terms(dialect: str) -> str:
    """Top-3 characteristic terms per document by TF-IDF rank.

    idf weight = 1e6 div doc_freq (exact integer rational — monotone in
    1/df like ln(N/df), chosen so both engines agree bit-for-bit; at
    scale swap the score expression for tf * ln(N/df) if cross-engine
    bit equality is not needed).  Plan: explode -> hash agg (tf); doc_freq
    is then a count window BY token over the per-(doc, tok) relation —
    each tf row is one distinct containing doc, so no second pass over
    the exploded tokens and no idf join (Spark inlines CTEs: a
    group-then-join formulation would tokenize the corpus twice)."""
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH {_tokens_cte(dialect)},
tf AS (
  SELECT doc_id, tok, count(*) AS term_freq
  FROM tk GROUP BY doc_id, tok
),
scored AS (
  SELECT doc_id, tok, term_freq,
         count(*) OVER (PARTITION BY tok) AS doc_freq
  FROM tf
),
rk AS (
  SELECT doc_id, tok, term_freq, doc_freq,
         CAST(term_freq * (1000000 {idiv} doc_freq) AS BIGINT) AS score_ppm,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY term_freq * (1000000 {idiv} doc_freq) DESC, tok)
              AS BIGINT) AS rnk
  FROM scored
)
SELECT doc_id, tok, term_freq, doc_freq, score_ppm, rnk
FROM rk WHERE rnk <= 3"""


def q_token_position_stats(dialect: str) -> str:
    """Token statistics by sentence position (0..5): a lateral positions
    join (constant VALUES relation, broadcast) indexing into the token
    array — guarded element access so out-of-range positions drop out
    under ANSI mode in Spark and as NULLs in DuckDB."""
    if dialect == "spark":
        tok_at = "CASE WHEN p.pos < size(toks) THEN element_at(toks, p.pos + 1) END"
        toks = "split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')"
    else:
        tok_at = "CASE WHEN p.pos < len(toks) THEN toks[p.pos + 1] END"
        toks = "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
    return f"""
WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
pos_tok AS (
  SELECT CAST(p.pos AS BIGINT) AS pos, {tok_at} AS tok
  FROM d CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5)) AS p(pos)
)
SELECT pos,
       count(tok) AS n_docs,
       count(DISTINCT tok) AS n_distinct,
       min(tok) AS first_tok,
       max(tok) AS last_tok,
       round(CAST(round(sum(CAST(length(tok) AS DECIMAL(38,10))), 4) AS DOUBLE)
             / count(tok), 6) AS avg_len
FROM pos_tok
WHERE tok IS NOT NULL
GROUP BY pos"""


def q_calendar_rollup_orders(dialect: str) -> str:
    """Date/time scalar-function coverage (date_trunc / last_day / year /
    quarter / month grouping) over the orders timeline — one hash
    aggregate; the month key comes from date_trunc so partition pruning on
    a date-partitioned fact would apply at scale."""
    return f"""
WITH o AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(last_day(o_orderdate) AS DATE) AS month_end,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(day(last_day(o_orderdate)) AS BIGINT) AS days_in_month,
         o_totalprice
  FROM orders
)
SELECT yr, qtr, month_start, month_end, days_in_month,
       count(*) AS n_orders,
       {dsum('o_totalprice')} AS revenue
FROM o
GROUP BY yr, qtr, month_start, month_end, days_in_month"""


def q_string_functions_parts(dialect: str) -> str:
    """String scalar-function coverage (upper/lower/left/reverse/lpad/
    replace/split_part/position) aggregated per part type with
    order-independent min/max/sum reductions."""
    if dialect == "spark":
        size_str = "CAST(p_size AS STRING)"
        pos_a = "CAST(position('a', lower(p_name)) AS BIGINT)"
    else:
        size_str = "CAST(p_size AS VARCHAR)"
        pos_a = "CAST(strpos(lower(p_name), 'a') AS BIGINT)"
    return f"""
SELECT p_type,
       count(*) AS n_parts,
       min(upper(left(p_name, 8))) AS min_prefix,
       max(reverse(lower(p_brand))) AS max_rev_brand,
       min(lpad({size_str}, 4, '0')) AS min_size_pad,
       max(replace(p_name, ' ', '_')) AS max_name_snake,
       min(split_part(p_name, ' ', 1)) AS min_first_word,
       CAST(sum({pos_a}) AS BIGINT) AS sum_pos_a
FROM part
GROUP BY p_type"""


def q_tpch_q12_like_late_lines(dialect: str) -> str:
    """Shipping-delay priority split (TPC-H Q12 shape): join lineitem to
    orders, bucket lines by ship delay, and count high- vs low-priority
    orders per bucket with conditional aggregation.  (The testdata carries
    no shipmode/commitdate; o_orderdate -> l_shipdate delay is the
    equivalent dual-CASE-count-over-join shape.)"""
    dd = (
        "datediff(l.l_shipdate, o.o_orderdate)"
        if dialect == "spark"
        else "datediff('day', o.o_orderdate, l.l_shipdate)"
    )
    return f"""
SELECT CASE WHEN {dd} > 90 THEN 'late' WHEN {dd} > 30 THEN 'slow'
            ELSE 'fast' END AS delay_bucket,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY CASE WHEN {dd} > 90 THEN 'late' WHEN {dd} > 30 THEN 'slow'
              ELSE 'fast' END"""


def q_tpch_q11_like_value_parts(dialect: str) -> str:
    """High-value parts (TPC-H Q11 shape): per-part shipped value kept
    only when it exceeds a fraction of the GLOBAL total — group-by with a
    HAVING against an uncorrelated scalar subquery.  Catalyst evaluates
    the subquery once and broadcasts the scalar; the outer aggregate stays
    one hash agg."""
    val = "l_extendedprice * (1 - l_discount)"
    # threshold = 1.4x the average per-part share, so the HAVING keeps the
    # top ~1-2% of parts at any scale factor (a fixed share cutoff goes
    # vacuous when the part count changes)
    return f"""
SELECT l_partkey, {dsum(val)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING {dsum(val)} > (
  SELECT {dsum(val)} * 1.4 / count(DISTINCT l_partkey) FROM lineitem
)"""


def q_tpch_q20_like_heavy_suppliers(dialect: str) -> str:
    """Nested-IN + correlated HAVING (TPC-H Q20 shape): suppliers who ship
    more than 12% of some PROMO part's total quantity.  Inner:
    per-(supplier, part) quantity with a correlated scalar subquery in
    HAVING; outer: IN-subquery semi-join on supplier.  Both engines
    decorrelate to joins — Spark compiles the chain to broadcast
    semi-joins over two aggregations of lineitem."""
    return f"""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_type = 'PROMO'
  )
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING CAST(sum(l.l_quantity) AS DOUBLE) > (
    SELECT 0.12 * sum(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
)"""


def q_tpch_q7_like_nation_volume(dialect: str) -> str:
    """Nation-pair trade volume (TPC-H Q7 shape): lineitem joined through
    supplier AND through orders->customer to two nation dims, revenue per
    ordered (supp_nation, cust_nation, year) with the pair-asymmetry
    filter.  Both nation joins broadcast on the Spark side; the fact table
    shuffles once for the aggregate."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       {dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       count(*) AS n_lines
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)"""


def q_tpch_q9_like_nation_profit(dialect: str) -> str:
    """Product-line profit by nation and year (TPC-H Q9 shape): part-name
    filter pushed to the broadcast part dim, profit = revenue minus a cost
    model (no partsupp table here, so cost = retailprice * quantity / 10),
    grouped by supplier nation x order year."""
    profit = (
        "l.l_extendedprice * (1 - l.l_discount) "
        "- p.p_retailprice * l.l_quantity * 0.1"
    )
    return f"""
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       {dsum(profit)} AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%a%'
GROUP BY n.n_name, year(o.o_orderdate)"""


ADVANCED_QUERIES = {
    "tpch_q14_like_promo": q_tpch_q14_like_promo,
    "tpch_q12_like_late_lines": q_tpch_q12_like_late_lines,
    "tpch_q7_like_nation_volume": q_tpch_q7_like_nation_volume,
    "tpch_q9_like_nation_profit": q_tpch_q9_like_nation_profit,
    "tpch_q11_like_value_parts": q_tpch_q11_like_value_parts,
    "tpch_q20_like_heavy_suppliers": q_tpch_q20_like_heavy_suppliers,
    "tpch_q19_like_disjunctive": q_tpch_q19_like_disjunctive,
    "tpch_q21_like_late_suppliers": q_tpch_q21_like_late_suppliers,
    "tpch_q22_like_idle_customers": q_tpch_q22_like_idle_customers,
    "min_cost_supplier_q2_like": q_min_cost_supplier,
    "supplier_count_not_in_q16_like": q_supplier_count_not_in,
    "tfidf_top_terms": q_tfidf_top_terms,
    "token_position_stats": q_token_position_stats,
    "calendar_rollup_orders": q_calendar_rollup_orders,
    "string_functions_parts": q_string_functions_parts,
}
