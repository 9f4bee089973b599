"""Driver-facing sketch queries (DataFrame-built Spark side + exact-SQL
DuckDB oracle).

Approximate answers can't hash-match an exact oracle directly, so each
query is phrased as something deterministic the oracle CAN reproduce:

- ``bloom_membership``: membership booleans for a fixed probe set.  The
  bloom is sized so the (deterministic) false-positive count at the gate's
  scale is zero, making the result identical to SQL ``EXISTS``.
- ``sketch_cms_heavy_hitters``: top-k keys with a boolean asserting the CMS
  estimate sits in [true_count, true_count + eps*N] — the CMS guarantee.
- ``sketch_hll_distinct_bound`` / ``sketch_kll_quantile_bound``: exact value
  plus a boolean asserting the sketch estimate is within tolerance.

So a hash-match here *is* a verified error bound, not a vacuous compare.
These run the real mergeable-sketch path: per-window sketches merged at
query time (mirroring how count/sum/max merge in the reference's
``core/op_set.go:44-60``; the reference only *declares* these sketch ops in
``protos/summarydb.capnp:6-13``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from summarydb_spark.functions import sketch

N_PROBES = 400
BLOOM_M = 1 << 16
BLOOM_K = 5
CMS_DEPTH = 4
CMS_WIDTH = 8192


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # widen=True: sketch updates are per-row-heavy and every sketch output
    # here is reorder-safe (exact ints, booleans with slack)
    from summarydb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events", widen=True).select(
        "user_id", "event_type", "value"
    )


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    blooms = sketch.bloom_aggregate(
        ev, ["event_type"], "user_id", m_bits=BLOOM_M, k=BLOOM_K
    )
    probes = spark.range(N_PROBES).select(F.col("id").alias("probe"))
    return (
        blooms.crossJoin(F.broadcast(probes))
        .select(
            "event_type",
            "probe",
            sketch.bloom_contains(
                F.col("bloom"), F.col("probe"), m_bits=BLOOM_M, k=BLOOM_K
            ).alias("present"),
        )
    )


ORACLE_BLOOM = f"""
WITH et AS (SELECT DISTINCT event_type FROM events),
p AS (SELECT range AS probe FROM range({N_PROBES}))
SELECT et.event_type, p.probe,
       EXISTS(SELECT 1 FROM events e
              WHERE e.event_type = et.event_type AND e.user_id = p.probe) AS present
FROM et CROSS JOIN p"""


def q_bloom_membership_generic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership over GENERIC data (strings), the reference
    README's never-built promise (/root/reference/README.md:27-28): one
    bloom per language over its document TOKENS (string values hashed
    directly — xxhash64 is type-generic, no numeric encoding involved),
    probed with every global token plus guaranteed-miss literals.

    Deterministic vs the EXISTS oracle because the filter is sized so the
    expected false-positive count at gate scale is ~2e-9 (n<=~31 tokens
    per lang against m=2^13) — a hash-match therefore verifies real bloom
    semantics over non-numeric data.  Scale shape identical to
    q_bloom_membership: one explode + two map-side-combining aggregates;
    probes broadcast."""
    from summarydb_spark.plans.portable_dedup import _norm
    from summarydb_spark.sources.tables import load_table

    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    toks = spark.sql(
        f"""SELECT lang, explode(split({_norm("spark")}, ' ')) AS tok
            FROM documents"""
    )
    blooms = sketch.bloom_aggregate(
        toks, ["lang"], "tok", m_bits=BLOOM_M, k=BLOOM_K
    )
    misses = spark.range(6).select(
        F.concat(F.lit("~~miss"), F.col("id")).alias("probe")
    )
    probes = (
        toks.select(F.col("tok").alias("probe")).distinct().unionByName(misses)
    )
    return blooms.crossJoin(F.broadcast(probes)).select(
        "lang",
        "probe",
        sketch.bloom_contains(
            F.col("bloom"), F.col("probe"), m_bits=BLOOM_M, k=BLOOM_K
        ).alias("present"),
    )


def _oracle_bloom_generic() -> str:
    from summarydb_spark.plans.portable_dedup import _norm

    return f"""
WITH t AS (
  SELECT lang,
         unnest(string_split({_norm("duckdb")}, ' ')) AS tok
  FROM documents
),
langs AS (SELECT DISTINCT lang FROM t),
probes AS (
  SELECT DISTINCT tok AS probe FROM t
  UNION ALL SELECT concat('~~miss', range) FROM range(6)
)
SELECT l.lang, p.probe,
       EXISTS(SELECT 1 FROM t
              WHERE t.lang = l.lang AND t.tok = p.probe) AS present
FROM langs l CROSS JOIN probes p"""


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn("g", F.lit(1))
    counters = sketch.cms_aggregate(
        ev, ["g"], "user_id", depth=CMS_DEPTH, width=CMS_WIDTH
    )
    exact = ev.groupBy("g", "user_id").count()
    topk = (
        exact.withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("g").orderBy(
                    F.col("count").desc(), F.col("user_id")
                )
            ),
        )
        .where("rnk <= 20")
    )
    probes = topk.select("g", F.col("user_id").alias("probe"))
    est = sketch.cms_estimate(
        counters, probes, ["g"], depth=CMS_DEPTH, width=CMS_WIDTH
    )
    # the CMS overcount bound needs the total item count — computed IN the
    # plan from the exact per-key counts (1-row broadcast), not via a
    # separate blocking ev.count() job per call
    tot = exact.groupBy().agg(F.sum("count").alias("n_total"))
    bound = (
        F.floor(F.lit(2.718281828) * F.col("n_total") / F.lit(CMS_WIDTH)) + 1
    ).cast("long")
    t2 = topk.select(
        F.col("user_id").alias("uid"), F.col("count").alias("true_count"), "rnk"
    )
    return (
        est.join(t2, est["_probe"] == t2["uid"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("uid").alias("user_id"),
            "true_count",
            "rnk",
            (
                (F.col("estimate") >= F.col("true_count"))
                & (F.col("estimate") <= F.col("true_count") + bound)
            ).alias("within_cms_bound"),
        )
    )


ORACLE_CMS = """
WITH c AS (SELECT user_id, count(*) AS true_count FROM events GROUP BY user_id),
rk AS (SELECT user_id, true_count,
              row_number() OVER (ORDER BY true_count DESC, user_id) AS rnk
       FROM c)
SELECT user_id, true_count, rnk, TRUE AS within_cms_bound
FROM rk WHERE rnk <= 20"""


def q_hll_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # per-(event_type, value-decile) window sketches merged up to event_type:
    # the decayed-window range-query shape
    wnd = sketch.hll_window_sketches(
        ev.withColumn("w", (F.col("value") / 10).cast("int")),
        ["event_type", "w"],
        "user_id",
    )
    est = sketch.hll_estimate_over(wnd, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("nd_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "nd_exact",
        (
            F.abs(F.col("approx_distinct") - F.col("nd_exact"))
            / F.col("nd_exact")
            < 0.05
        ).alias("within_5pct"),
    )


ORACLE_HLL = """
SELECT event_type, count(DISTINCT user_id) AS nd_exact, TRUE AS within_5pct
FROM events GROUP BY event_type"""


def q_kll_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    wnd = sketch.kll_window_sketches(
        ev.withColumn("w", F.pmod("user_id", F.lit(8)).cast("int")),
        ["event_type", "w"],
        "value",
    )
    q = sketch.kll_quantiles_over(wnd, ["event_type"], quantiles=(0.5, 0.9))
    exact = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.9)).alias("e90"),
    )
    return q.join(exact, "event_type").select(
        "event_type",
        # nullif: an all-zero value distribution (|exact| = 0) reports NULL
        # rather than an ANSI divide-by-zero
        (
            F.abs(F.col("q0_5") - F.col("e50"))
            / F.nullif(F.abs(F.col("e50")), F.lit(0.0))
            < 0.1
        ).alias("q50_within_10pct"),
        (
            F.abs(F.col("q0_9") - F.col("e90"))
            / F.nullif(F.abs(F.col("e90")), F.lit(0.0))
            < 0.1
        ).alias("q90_within_10pct"),
    )


ORACLE_KLL = """
SELECT event_type, TRUE AS q50_within_10pct, TRUE AS q90_within_10pct
FROM events GROUP BY event_type"""


def q_hll_set_ops_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: distinct-user union and intersection between
    every event-type pair, from merged per-window HLL sketches — union
    via the mergeable union (exact HLL semantics), intersection via
    inclusion-exclusion (|A|+|B|-|A∪B|, the standard HLL recipe; its
    error compounds, hence the looser bound).  Exact values come from a
    distinct-pair self-join; the booleans assert the sketch estimates
    hold their error budgets, so the hash-match verifies the bounds.

    Scale: per-type sketches are O(2^lgk) bytes regardless of user
    count; the pair stage runs on #types^2 sketch rows, never on users."""
    ev = _events(spark, sf_dir)
    wnd = sketch.hll_window_sketches(
        ev.withColumn("w", (F.col("value") / 10).cast("int")),
        ["event_type", "w"],
        "user_id",
    )
    per = wnd.groupBy("event_type").agg(
        F.expr("hll_union_agg(hll)").alias("h")
    )
    a, b = per.alias("a"), per.alias("b")
    est = (
        a.join(
            F.broadcast(b), F.col("a.event_type") < F.col("b.event_type")
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.expr("hll_sketch_estimate(a.h)").alias("est_a"),
            F.expr("hll_sketch_estimate(b.h)").alias("est_b"),
            F.expr("hll_sketch_estimate(hll_union(a.h, b.h))").alias(
                "est_u"
            ),
        )
        .withColumn("est_i", F.col("est_a") + F.col("est_b") - F.col("est_u"))
    )
    du = ev.select("event_type", "user_id").distinct()
    nd = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd")
    )
    inter = (
        du.alias("x")
        .join(
            du.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("nd_inter"))
    )
    out = (
        est.join(
            F.broadcast(nd.select(F.col("event_type").alias("type_a"),
                                  F.col("nd").alias("nd_a"))),
            "type_a",
        )
        .join(
            F.broadcast(nd.select(F.col("event_type").alias("type_b"),
                                  F.col("nd").alias("nd_b"))),
            "type_b",
        )
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .withColumn("nd_inter", F.coalesce("nd_inter", F.lit(0)).cast("long"))
        .withColumn("nd_union", F.col("nd_a") + F.col("nd_b") - F.col("nd_inter"))
    )
    return out.select(
        "type_a",
        "type_b",
        F.col("nd_a").cast("long").alias("nd_a"),
        F.col("nd_b").cast("long").alias("nd_b"),
        "nd_inter",
        F.col("nd_union").cast("long").alias("nd_union"),
        (
            F.abs(F.col("est_u") - F.col("nd_union")) / F.col("nd_union")
            < 0.02
        ).alias("union_within_2pct"),
        (
            F.abs(F.col("est_i") - F.col("nd_inter"))
            / F.col("nd_union")  # union-relative: exact inter may be 0
            < 0.10
        ).alias("inter_within_10pct"),
    )


ORACLE_HLL_SET_OPS = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
nd AS (SELECT event_type, count(*) AS nd FROM du GROUP BY event_type),
inter AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         count(*) AS nd_inter
  FROM du x JOIN du y
    ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY x.event_type, y.event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.nd AS nd_a, b.nd AS nd_b
  FROM nd a JOIN nd b ON a.event_type < b.event_type
)
SELECT p.type_a, p.type_b,
       CAST(p.nd_a AS BIGINT) AS nd_a,
       CAST(p.nd_b AS BIGINT) AS nd_b,
       CAST(coalesce(i.nd_inter, 0) AS BIGINT) AS nd_inter,
       CAST(p.nd_a + p.nd_b - coalesce(i.nd_inter, 0) AS BIGINT)
         AS nd_union,
       TRUE AS union_within_2pct,
       TRUE AS inter_within_10pct
FROM pairs p
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b"""


# name -> (spark_builder, oracle_sql | None)
SKETCH_QUERIES = {
    "bloom_membership": (q_bloom_membership, ORACLE_BLOOM),
    "bloom_membership_generic": (
        q_bloom_membership_generic,
        _oracle_bloom_generic(),
    ),
    "sketch_cms_heavy_hitters": (q_cms_heavy_hitters, ORACLE_CMS),
    "sketch_hll_distinct_bound": (q_hll_distinct_bound, ORACLE_HLL),
    "sketch_kll_quantile_bound": (q_kll_quantile_bound, ORACLE_KLL),
    "hll_set_ops_bound": (q_hll_set_ops_bound, ORACLE_HLL_SET_OPS),
}
