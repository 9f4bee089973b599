"""Pattern-mining extensions: association rules over order baskets,
resource-allocation link prediction on the co-purchase graph, and
token-window document chunking for retrieval pipelines.

Same one-template-two-dialects scheme as portable_sql (the DuckDB
rendering is the oracle).  All exact integer arithmetic where a value
ranks or compares (ppm/ppb scaling with integer division — a double on
a rounding boundary diverges per engine); ties broken by total key
order so LIMIT is deterministic.

Scale notes (100 TB discipline):
- the basket self-join is bounded by per-order fan-out (same shape as
  copurchase_similarity_topk); support pruning happens in the first
  aggregate, before any scoring;
- the two-hop link-prediction enumeration costs sum(deg^2) over the
  support-pruned edge set — at web scale you would cap hub degrees
  first (the standard practice); the shape itself is two co-partitioned
  equi-joins + one aggregate, no cross join;
- chunking is pure per-row arithmetic + a sequence explode: chunk
  count, not text, rides the explode, and the aggregate is one
  hash-agg on lang.
"""

from __future__ import annotations


def q_association_rules(dialect: str, basket_source: str | None = None) -> str:
    """Directed association rules A -> B over order baskets (distinct
    parts per order), support >= 2 co-occurrences (the same pruning
    copurchase_similarity_topk uses — the part keyspace grows with the
    order count at larger SFs, so absolute counts dilute): confidence =
    n_ab / n_a and lift = n_ab * N / (n_a * n_b), both in exact ppm
    (integer division), top-20 by lift.  The classic market-basket
    mining surface one level above copurchase_similarity_topk's
    symmetric cosine: rules are DIRECTED (conf(A->B) != conf(B->A)) and
    lift normalizes by both marginals.  Beyond-reference operator
    (SURVEY.md §2.6; the reference has no relational surface).

    Overflow bound: lift's numerator nab*nb*1e6 stays in int64 while
    nab*nb < 9.2e12 — safe through ~15M baskets unless one pair
    co-occurs in > 0.6M of them; past that, cast the product to
    DECIMAL(38,0) (both engines) before the division.

    ``basket_source`` overrides the basket CTE body (the Spark DF
    builder points it at a localCheckpoint-shared view; the DuckDB
    oracle text never passes it)."""
    idiv = "div" if dialect == "spark" else "//"
    basket = (
        basket_source
        or "SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem"
    )
    return f"""
WITH b AS ({basket}),
n AS (SELECT count(DISTINCT o) AS nb FROM b),
item AS (SELECT p, count(*) AS np FROM b GROUP BY p),
pair AS (
  SELECT x.p AS pa, y.p AS pb, count(*) AS nab
  FROM b x JOIN b y ON x.o = y.o AND x.p <> y.p
  GROUP BY x.p, y.p
  HAVING count(*) >= 2
)
SELECT pair.pa AS ante_part, pair.pb AS cons_part,
       CAST(pair.nab AS BIGINT) AS n_ab,
       CAST(pair.nab * 1000000 {idiv} ia.np AS BIGINT) AS conf_ppm,
       CAST(pair.nab * n.nb * 1000000 {idiv} (ia.np * ib.np) AS BIGINT)
         AS lift_ppm
FROM pair
JOIN item ia ON ia.p = pair.pa
JOIN item ib ON ib.p = pair.pb
CROSS JOIN n
ORDER BY lift_ppm DESC, ante_part, cons_part
LIMIT 20"""


#: Two-hop enumeration routes only through middles with degree <= this
#: cap.  It bounds hop2 at cap x |V| instead of sum(deg^2), and an
#: excluded middle of degree d > cap contributes <= 1e9/d < 10^4 ppb
#: (= 10 ppm) per common neighbor to any score — negligible against the
#: >= 1e9/cap scores that survive.  tests/test_mining_ext.py plants a
#: super-cap hub and pins both bounds.
RA_HUB_CAP = 100_000


#: body of the support>=2 co-purchase edge CTE, shared by the template
#: and the Spark DF builder that pre-materializes it
RA_EDGE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS a, b.l_partkey AS b
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING count(*) >= 2"""


def _ra_cte(dialect: str, hub_cap: int, edge_source: str | None = None) -> str:
    """Shared CTE prefix of the RA link-prediction family: support>=2
    co-purchase edges, symmetric adjacency, degrees, cap-filtered
    middles, two-hop paths, and the existing-edge anti-join.
    ``edge_source`` overrides the edge CTE body (the Spark DF builder
    points it at a localCheckpoint-shared view; the oracle never passes
    it — its rendered text is byte-identical to every prior round)."""
    if edge_source is not None:
        head = f"""
WITH e AS ({edge_source}),"""
    else:
        head = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= 2
),"""
    return f"""{head}
u AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT a AS nd, count(*) AS d FROM u GROUP BY a),
mid AS (SELECT nd FROM deg WHERE d <= {hub_cap}),
hop2 AS (
  SELECT e1.a AS x, e2.b AS y, e1.b AS z
  FROM u e1
  JOIN mid m ON e1.b = m.nd
  JOIN u e2 ON e1.b = e2.a AND e1.a < e2.b
),
cand AS (
  SELECT h.x, h.y, h.z
  FROM hop2 h LEFT JOIN e ON e.a = h.x AND e.b = h.y
  WHERE e.a IS NULL
)"""


def q_link_prediction_ra(
    dialect: str,
    hub_cap: int = RA_HUB_CAP,
    limit: int = 20,
    edge_source: str | None = None,
) -> str:
    """Resource-allocation link prediction (Zhou/Lu/Zhang 2009) on the
    support>=2 co-purchase graph: for NON-adjacent part pairs reachable
    in two hops, RA(x,y) = sum over common neighbors z of 1/deg(z) —
    here in exact parts-per-billion (1e9 integer-divided by the degree,
    summed), so ranking is engine-portable.  Top-20 predicted links by RA
    score (>= 1 common neighbor; the score itself already weights
    neighbor count).  The existing-edge exclusion is an
    anti-join BEFORE scoring; two-hop enumeration routes ONLY through
    middles with degree <= RA_HUB_CAP (the standard hub cap — it bounds
    hop2 at cap x |V| instead of sum(deg^2), and an excluded middle of
    degree d > 1e5 contributes <= 1e9/d < 10^4 ppb = 10 ppm per common
    neighbor; no gate-scale node comes near the cap, so gate results
    are the uncapped relation — tests plant a super-cap hub and pin
    both the hop2 bound and the score-error bound)."""
    return f"""{_ra_cte(dialect, hub_cap, edge_source)}
SELECT c.x AS part_a, c.y AS part_b,
       CAST(count(*) AS BIGINT) AS common_neighbors,
       CAST(sum(1000000000 {{idiv}} d.d) AS BIGINT) AS ra_ppb
FROM cand c JOIN deg d ON d.nd = c.z
GROUP BY c.x, c.y
ORDER BY ra_ppb DESC, part_a, part_b
LIMIT {limit}""".replace("{idiv}", "div" if dialect == "spark" else "//")


def ra_hop2_count_sql(dialect: str, hub_cap: int = RA_HUB_CAP) -> str:
    """Diagnostic: the two-hop path count the cap actually enumerates
    (the quantity bounded by cap x |V|)."""
    return f"{_ra_cte(dialect, hub_cap)}\nSELECT count(*) AS n FROM hop2"


def q_chunk_overlap_windows(dialect: str) -> str:
    """Token-window document chunking (window 32, stride 24 — the RAG
    ingestion shape): every document becomes ceil((n-32)/24)+1 chunks
    (1 if n <= 32); chunk i spans tokens [24i, 24i + 32).  Per-lang
    rollup: documents, chunks, chunk-token sum, and the duplicated
    (overlap) token count = chunk-token sum - document-token sum — the
    storage-amplification number a chunking config implies.  Chunk
    indices ride a sequence explode (arithmetic only, never text); the
    per-chunk length is closed-form least(32, n - 24i)."""
    if dialect == "spark":
        ntok = "size(split(text, ' '))"
        explode = (
            "SELECT lang, n, ci FROM c "
            "LATERAL VIEW explode(sequence(0, n_chunks - 1)) t AS ci"
        )
    else:
        ntok = "len(string_split(text, ' '))"
        explode = (
            "SELECT lang, n, u.ci FROM c, "
            "unnest(range(0, n_chunks)) AS u(ci)"
        )
    return f"""
WITH d AS (
  SELECT doc_id, lang, CAST({ntok} AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, lang, n,
         CASE WHEN n <= 32 THEN CAST(1 AS BIGINT)
              ELSE CAST(ceil((n - 32) / 24.0) AS BIGINT) + 1 END AS n_chunks
  FROM d
),
x AS ({explode}),
per_chunk AS (
  SELECT lang,
         CASE WHEN n - ci * 24 < 32 THEN n - ci * 24 ELSE 32 END AS chunk_tokens
  FROM x
),
doc_tokens AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS sum_doc_tokens
  FROM c GROUP BY lang
),
chunk_tokens AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(chunk_tokens) AS BIGINT) AS sum_chunk_tokens
  FROM per_chunk GROUP BY lang
)
SELECT dt.lang, dt.n_docs, ct.n_chunks, ct.sum_chunk_tokens,
       ct.sum_chunk_tokens - dt.sum_doc_tokens AS overlap_tokens
FROM doc_tokens dt JOIN chunk_tokens ct ON ct.lang = dt.lang
ORDER BY dt.lang"""


def q_stl_lite_decomposition(dialect: str) -> str:
    """STL-lite seasonal decomposition of daily per-type event counts,
    in EXACT integer arithmetic: trend = centered 7-row moving sum
    (x7-scaled, full windows only), detrended_x7 = 7n - trend_x7,
    weekly seasonal component per (type, day-of-week) as the rational
    (seas_num / seas_den) over detrended days, and the residual
    magnitude sum |detrended_x7 * seas_den - seas_num| (x7*seas_den
    scaled) — every division deferred so both engines produce identical
    integers.  The trend window is POSITION-based (7 consecutive
    observed days per type), which is the documented convention under
    calendar gaps.  This is the decomposition a forecaster runs before
    choosing a model: seasonal strength vs residual noise per series.

    Scale: daily pre-aggregation bounds everything to #days x #types
    rows; one partitioned window pass + two hash aggregates."""
    t = (
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ))"
        if dialect == "spark"
        else "epoch_us(ts)"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / 86400000000.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(floor(({t}) / 86400000000.0) AS BIGINT)
),
t7 AS (
  SELECT event_type, d, n,
         sum(n) OVER w AS trend_x7,
         count(*) OVER w AS wn
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT event_type, d, 7 * n - trend_x7 AS det_x7, d % 7 AS dow
  FROM t7 WHERE wn = 7
),
seas AS (
  SELECT event_type, dow,
         CAST(sum(det_x7) AS BIGINT) AS seas_num,
         CAST(count(*) AS BIGINT) AS seas_den
  FROM det GROUP BY event_type, dow
),
resid AS (
  SELECT det.event_type, det.dow,
         CAST(sum(abs(det.det_x7 * seas.seas_den - seas.seas_num)) AS BIGINT)
           AS abs_resid_scaled,
         CAST(count(*) AS BIGINT) AS n_days
  FROM det JOIN seas
    ON seas.event_type = det.event_type AND seas.dow = det.dow
  GROUP BY det.event_type, det.dow
)
SELECT s.event_type, CAST(s.dow AS BIGINT) AS dow, s.seas_num, s.seas_den,
       r.abs_resid_scaled, r.n_days
FROM seas s JOIN resid r
  ON r.event_type = s.event_type AND r.dow = s.dow
ORDER BY s.event_type, dow"""


def q_conformal_interval_width(dialect: str) -> str:
    """Split-conformal prediction intervals for the seasonal-naive
    forecaster (Vovk et al.; the distribution-free guarantee every
    production forecaster should ship): per event type, the 90%
    conformal half-width is the ceil(0.9*(n+1))-th order statistic of
    the absolute calibration errors |actual - prediction| where the
    prediction is the count 7 days earlier (the same day-INDEX lag as
    seasonal_naive_backtest).  Errors are exact integers (daily counts)
    and the quantile is exact order-statistic SELECTION, not
    interpolation — engine-identical by construction; ranking ties on
    equal errors cannot change the selected value.

    Scale: daily pre-aggregation bounds the calibration set to
    #days x #types rows; the selection is one partitioned window pass."""
    t = (
        "unix_micros(CAST(ts AS TIMESTAMP_LTZ))"
        if dialect == "spark"
        else "epoch_us(ts)"
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / 86400000000.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(floor(({t}) / 86400000000.0) AS BIGINT)
),
fc AS (
  SELECT a.event_type, abs(a.n - b.n) AS e
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.d = a.d - 7
),
rk AS (
  SELECT event_type, e,
         row_number() OVER (PARTITION BY event_type ORDER BY e) AS r,
         count(*) OVER (PARTITION BY event_type) AS n_cal
  FROM fc
)
SELECT event_type, CAST(n_cal AS BIGINT) AS n_cal,
       CAST(e AS BIGINT) AS q90_abs_err
FROM rk
WHERE r = least(n_cal, CAST(ceil((n_cal + 1) * 0.9) AS BIGINT))
ORDER BY event_type"""


def q_association_rules_df(spark, sf_dir: str):
    """Spark-side association rules with the distinct-basket relation
    computed ONCE and shared across its four plan legs (pair self-join
    x/y, item marginals, basket count) via a lazy ``localCheckpoint``
    view — the curation-pipeline RDD-identity share (round 10 item 7).
    AQE exchange reuse already dedupes the identical shuffles inside
    the composed template plan (round-10 item 6 measured CacheManager
    persist a wash), but the checkpoint additionally collapses the
    repeated lineitem scan + distinct STAGE WAVES into one
    materialization: measured same-window interleaved A/B at sf0.1,
    2.56->1.88 s and 3.25->2.33 s across two order-reversed rounds
    (guide §5; round-11 item 6).  The rendered SQL downstream of the
    view is the oracle template verbatim, so results are identical by
    construction (also proven by collect-equality and the oracle gate
    at both SFs)."""
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    b = spark.sql(
        "SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem"
    ).localCheckpoint(eager=False)
    b.createOrReplaceTempView("ar_baskets_v")
    return spark.sql(
        q_association_rules("spark", basket_source="SELECT o, p FROM ar_baskets_v")
    )


def q_link_prediction_ra_df(spark, sf_dir: str):
    """Spark-side RA link prediction with the support>=2 edge relation
    (the most expensive CTE: distinct + self-join + agg) materialized
    once behind a lazy ``localCheckpoint`` view; it feeds both UNION
    legs of the symmetric adjacency AND the existing-edge anti-join.
    Measured same-window interleaved A/B at sf0.1: 2.55->2.29 s and
    2.76->2.33 s (order-reversed rounds).  Downstream SQL is the oracle
    template verbatim (see q_association_rules_df)."""
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    e = spark.sql(RA_EDGE_SQL).localCheckpoint(eager=False)
    e.createOrReplaceTempView("ra_edges_v")
    return spark.sql(
        q_link_prediction_ra("spark", edge_source="SELECT a, b FROM ra_edges_v")
    )


MINING_EXT_QUERIES = {
    "association_rules_lift": q_association_rules,
    "link_prediction_ra": q_link_prediction_ra,
    "chunk_overlap_windows": q_chunk_overlap_windows,
    "stl_lite_decomposition": q_stl_lite_decomposition,
    "conformal_interval_width": q_conformal_interval_width,
}

#: Spark sides overridden by DataFrame builders (registered into
#: DF_QUERIES by plans.dataframe_queries); the oracle stays the
#: template's DuckDB rendering, byte-identical to prior rounds.
MINING_EXT_DF_QUERIES = {
    "association_rules_lift": (
        q_association_rules_df,
        lambda: q_association_rules("duckdb"),
    ),
    "link_prediction_ra": (
        q_link_prediction_ra_df,
        lambda: q_link_prediction_ra("duckdb"),
    ),
}
