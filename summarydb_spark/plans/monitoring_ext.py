"""Distribution-monitoring and information-theoretic coverage: PSI feature
drift, chi-square independence, and per-document token entropy.

Same one-template-two-dialects scheme as portable_sql.  Determinism: every
ln()/quotient input is an exact integer or an exact-decimal count ratio, and
every published statistic is floor-scaled to micro-units (floor of identical
doubles agrees across engines; round() half-cases don't — the unigram_nll
discipline).

Scale notes (100 TB discipline):
- psi_feature_drift: bucket id is pure column math (equi-width, no
  quantile pass); ONE hash aggregation keyed (event_type, bucket, half)
  bounds the shuffle by #types x #buckets x 2; the PSI fold runs on that
  tiny relation.
- chi2_lang_source: one (lang, source) hash agg; marginals and the
  statistic fold over the O(langs x sources) output.
- token_entropy: per-doc token histogram via one explode + one
  (doc_id, token) agg, entropy folds per doc — linear, no window over the
  raw stream, output one row per doc.
"""

from __future__ import annotations

from summarydb_spark.plans.portable_sql import epoch_us

PSI_BUCKETS = 20
PSI_LO, PSI_HI = 0.0, 500.0


def q_psi_feature_drift(dialect: str) -> str:
    """Population Stability Index of the event value distribution, first
    time-half (reference) vs second (current), per event type — the
    standard train/serve drift gate (PSI > 0.1 = investigate, > 0.25 =
    block).  Equi-width buckets over [0, 500) with clamp buckets at the
    edges; Laplace +1 smoothing keeps the ln total on empty buckets.
    p/q are exact integer-count ratios; psi floor-scales to micros."""
    t = epoch_us("ts", dialect)
    return f"""
WITH bounds AS (
  SELECT min({t}) AS lo, max({t}) AS hi FROM events
),
b AS (
  SELECT event_type,
         CAST(least(greatest(floor(value / {(PSI_HI - PSI_LO) / PSI_BUCKETS}),
                             0), {PSI_BUCKETS - 1}) AS BIGINT) AS bucket,
         CASE WHEN {t} * 2 <= (SELECT lo + hi FROM bounds)
              THEN 0 ELSE 1 END AS half
  FROM events
),
cnt AS (
  SELECT event_type, bucket, half, count(*) AS c
  FROM b GROUP BY event_type, bucket, half
),
spine AS (
  SELECT DISTINCT e.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM cnt) e
  CROSS JOIN (SELECT DISTINCT bucket FROM cnt) g
),
filled AS (
  SELECT s.event_type, s.bucket,
         coalesce(max(CASE WHEN c.half = 0 THEN c.c END), 0) + 1 AS c_ref,
         coalesce(max(CASE WHEN c.half = 1 THEN c.c END), 0) + 1 AS c_cur
  FROM spine s
  LEFT JOIN cnt c ON c.event_type = s.event_type AND c.bucket = s.bucket
  GROUP BY s.event_type, s.bucket
),
tot AS (
  SELECT event_type,
         sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
  FROM filled GROUP BY event_type
),
terms AS (
  SELECT f.event_type,
         (CAST(f.c_ref AS DOUBLE) / t.n_ref
          - CAST(f.c_cur AS DOUBLE) / t.n_cur)
         * ln((CAST(f.c_ref AS DOUBLE) / t.n_ref)
              / (CAST(f.c_cur AS DOUBLE) / t.n_cur)) AS term,
         t.n_ref, t.n_cur
  FROM filled f JOIN tot t ON t.event_type = f.event_type
)
SELECT event_type,
       CAST(floor(sum(term) * 1000000) AS BIGINT) AS psi_micro,
       CAST(max(n_ref) AS BIGINT) AS n_ref,
       CAST(max(n_cur) AS BIGINT) AS n_cur,
       CASE WHEN sum(term) > 0.25 THEN 'block'
            WHEN sum(term) > 0.1 THEN 'investigate'
            ELSE 'stable' END AS verdict
FROM terms
GROUP BY event_type"""


def q_chi2_lang_source(dialect: str) -> str:
    """Chi-square test of independence between document language and
    source — the label-vs-shard skew check run before any stratified
    training split.  Observed counts are integers; expected = row*col/n is
    an exact double (< 2^53); the statistic floor-scales to micros.
    Output: one row with the statistic, degrees of freedom, and the
    largest standardized residual cell."""
    return """
WITH o AS (
  SELECT lang, source, count(*) AS obs FROM documents GROUP BY lang, source
),
spine AS (
  -- zero cells carry (0-e)^2/e mass: the statistic needs the FULL
  -- lang x source grid, not just observed combinations
  SELECT l.lang, s.source, coalesce(o.obs, 0) AS obs
  FROM (SELECT DISTINCT lang FROM o) l
  CROSS JOIN (SELECT DISTINCT source FROM o) s
  LEFT JOIN o ON o.lang = l.lang AND o.source = s.source
),
m AS (
  SELECT o.lang, o.source, o.obs,
         sum(o.obs) OVER (PARTITION BY o.lang) AS row_tot,
         sum(o.obs) OVER (PARTITION BY o.source) AS col_tot,
         sum(o.obs) OVER () AS n
  FROM spine o
),
cells AS (
  SELECT lang, source, obs,
         CAST(row_tot AS DOUBLE) * col_tot / n AS expected
  FROM m
),
resid AS (
  SELECT lang, source,
         (obs - expected) * (obs - expected) / expected AS chi_term,
         abs(obs - expected) / sqrt(expected) AS std_resid
  FROM cells
),
dims AS (
  SELECT count(DISTINCT lang) AS n_lang, count(DISTINCT source) AS n_src
  FROM o
)
SELECT CAST(floor(sum(chi_term) * 1000000) AS BIGINT) AS chi2_micro,
       CAST((max(d.n_lang) - 1) * (max(d.n_src) - 1) AS BIGINT) AS dof,
       CAST(floor(max(std_resid) * 1000000) AS BIGINT) AS max_std_resid_micro
FROM resid CROSS JOIN dims d"""


def q_token_entropy(dialect: str) -> str:
    """Per-document token (Shannon) entropy in nats and its ratio to the
    maximum ln(n_distinct) — the repetitiveness score complementing
    unigram NLL (low entropy = template/boilerplate text, a standard
    pre-training quality signal).  H = ln(n) - (1/n) * sum c_w ln c_w
    folds from the per-doc token histogram; both H and the ratio
    floor-scale to micros."""
    if dialect == "spark":
        un = "explode(split(text, ' '))"
    else:
        un = "unnest(string_split(text, ' '))"
    return f"""
WITH ex AS (
  SELECT doc_id, {un} AS w FROM documents
),
hist AS (
  SELECT doc_id, w, count(*) AS c FROM ex GROUP BY doc_id, w
),
per_doc AS (
  SELECT doc_id,
         sum(c) AS n_tokens,
         count(*) AS n_distinct,
         ln(CAST(sum(c) AS DOUBLE))
           - sum(c * ln(CAST(c AS DOUBLE))) / sum(c) AS entropy
  FROM hist GROUP BY doc_id
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(floor(entropy * 1000000) AS BIGINT) AS entropy_micro,
       CASE WHEN n_distinct = 1 THEN 1000000
            ELSE CAST(floor(entropy / ln(CAST(n_distinct AS DOUBLE))
                            * 1000000) AS BIGINT) END AS entropy_ratio_micro
FROM per_doc"""


def q_embedding_quantize_int8(dialect: str) -> str:
    """Symmetric int8 quantization audit over the embedding column: each
    vector quantizes with its own scale amax/127 (the standard
    inference-serving compression), and the query reports per-label
    reconstruction error — mean MSE and mean max-abs-error in scaled
    units.  All element math is higher-order-function column work (no
    UDF, no explode); folds run left-to-right in list order so the IEEE
    sums are bit-identical across engines (array_embedding_stats
    discipline); per-label means go through exact-decimal sums.  q_i uses
    floor(x/scale + 0.5), never round(), so half-cases are engine-free.
    Zero vectors quantize to zeros with zero error (nullif guard)."""
    if dialect == "spark":
        amax = (
            "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        )
        dim = "cardinality(embedding)"
        sqerr = (
            "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + "
            "power(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / sc + 0.5)"
            " * sc, 2))"
        )
        maxerr = (
            "array_max(transform(embedding, x -> "
            "abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / sc + 0.5)"
            " * sc)))"
        )
    else:
        amax = (
            "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
        )
        dim = "len(embedding)"
        sqerr = (
            "list_reduce(list_prepend(0.0, list_transform(embedding, x -> "
            "power(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / sc + 0.5)"
            " * sc, 2))), (a, b) -> a + b)"
        )
        maxerr = (
            "list_max(list_transform(embedding, x -> "
            "abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / sc + 0.5)"
            " * sc)))"
        )
    from summarydb_spark.plans.portable_sql import dsum

    return f"""
WITH s AS (
  SELECT vec_id, label, embedding,
         nullif({amax}, 0.0) / 127.0 AS sc,
         {dim} AS dim
  FROM embeddings
),
per_vec AS (
  SELECT vec_id, label, dim,
         CASE WHEN sc IS NULL THEN 0.0 ELSE {sqerr} / dim END AS mse,
         CASE WHEN sc IS NULL THEN 0.0 ELSE {maxerr} END AS max_err
  FROM s
)
SELECT label,
       count(*) AS n_vecs,
       CAST(max(dim) AS BIGINT) AS dim,
       CAST(round({dsum("mse * 1000000000000")} / count(*), 2) AS DOUBLE)
         AS avg_mse_e12,
       CAST(round({dsum("max_err * 1000000")} / count(*), 2) AS DOUBLE)
         AS avg_max_err_micro
FROM per_vec
GROUP BY label"""


def q_bitmap_distinct_daily(dialect: str) -> str:
    """EXACT distinct users per day via two-level bitmap aggregation
    (Spark 4's bitmap_construct_agg family): level 1 ORs each day's user
    ids into one 4096-bit bitmap per 32k-id bucket, level 2 sums popcounts
    — the count-distinct rewrite that replaces an expensive
    (day, user_id) distinct shuffle with fixed-size bitmap state per
    (day, bucket).  Bitmaps are exact, so the DuckDB oracle is a plain
    COUNT(DISTINCT) — the same answer through a completely different
    physical strategy."""
    t = epoch_us("ts", dialect)
    day = f"CAST(floor(({t}) / 86400000000.0) AS BIGINT)"
    if dialect == "spark":
        return f"""
WITH e AS (SELECT {day} AS day, user_id FROM events),
b AS (
  SELECT day, bitmap_bucket_number(user_id) AS bkt,
         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
  FROM e GROUP BY day, bitmap_bucket_number(user_id)
)
SELECT day, CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_users
FROM b GROUP BY day"""
    return f"""
SELECT {day} AS day, count(DISTINCT user_id) AS n_users
FROM events GROUP BY {day}"""


def q_approx_percentile_check(dialect: str) -> str:
    """percentile_approx rank-accuracy audit: Spark computes its approx
    p50 (accuracy 1000) per event type, then verifies IN-PLAN that the
    returned value's exact rank lies within the documented bound
    (|rank/n - 0.5| <= 1/1000 at the value's rank interval).  The oracle
    carries the exact median and row counts; the approx value itself never
    leaves the plan (it is engine-specific), only the verified boolean
    does — the sketch-family pattern where a hash match IS a checked
    error bound."""
    if dialect == "spark":
        return """
WITH ap AS (
  SELECT event_type, percentile_approx(value, 0.5, 1000) AS p50a
  FROM events GROUP BY event_type
),
ranked AS (
  SELECT e.event_type,
         count(*) AS n,
         sum(CASE WHEN e.value < a.p50a THEN 1 ELSE 0 END) AS n_below,
         sum(CASE WHEN e.value <= a.p50a THEN 1 ELSE 0 END) AS n_at_or_below,
         round(percentile(e.value, 0.5), 6) AS p50_exact
  FROM events e JOIN ap a ON a.event_type = e.event_type
  GROUP BY e.event_type
)
SELECT event_type, n,
       CAST(p50_exact AS DOUBLE) AS p50_exact,
       -- integer-rank contract: the value's covered rank interval
       -- [n_below+1, n_at_or_below] must reach the floor((p +/- err)*n)
       -- window (Spark returns an actual data point, so interval-vs-
       -- window containment is the documented guarantee)
       (n_at_or_below >= CAST(floor((0.5 - 0.001) * n) AS BIGINT)
        AND n_below + 1 <= CAST(ceil((0.5 + 0.001) * n) AS BIGINT)) AS rank_ok
FROM ranked"""
    return """
SELECT event_type, count(*) AS n,
       CAST(round(quantile_cont(value, 0.5), 6) AS DOUBLE) AS p50_exact,
       TRUE AS rank_ok
FROM events GROUP BY event_type"""


MONITORING_EXT_QUERIES = {
    "psi_feature_drift": q_psi_feature_drift,
    "chi2_lang_source": q_chi2_lang_source,
    "token_entropy": q_token_entropy,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "bitmap_distinct_daily": q_bitmap_distinct_daily,
    "approx_percentile_check": q_approx_percentile_check,
}
