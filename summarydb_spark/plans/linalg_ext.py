"""Iterative distributed linear algebra over the embeddings table:
deterministic power-iteration PCA.

Extends the iterative-algorithm family (plans/pipeline_ext.py k-means
Lloyd) with a second algorithm class: the dominant principal component
via 3 power-iteration steps, matrix-free (the Gram trick — C·w computed
as sum_i x_i (x_i · w), two linear passes per step, never a d x d
covariance explosion).

Exactness discipline (the kmeans lessons applied):
- components quantize to integer milli-units via round(double*1000, 0) —
  a float32 times 1000 is an EXACT double (34 significand bits), and
  round-to-integer ties (exactly representable k.5) round away from zero
  under both Spark's BigDecimal HALF_UP and DuckDB's C++ round;
- centering subtracts the FLOORED per-dim mean (deterministic integer),
  so every xc, projection s_i and update z_j is exact BIGINT arithmetic
  with worst-case magnitudes ~2e14 at sf0.1 — far below both 2^63 and
  2^53 (the DOUBLE-exact window the normalization division needs; a
  corpus 100x larger moves the accumulation to DECIMAL(38,0));
- per-step normalization is max-abs (not L2): the component at
  argmax|z| (ties: smallest idx) becomes exactly +1000, fixing both the
  scale and the eigenvector's sign — no sqrt, no sign ambiguity.

Scale notes: each step is two hash exchanges (by vec_id for the
projections, by idx for the update) over the exploded-dim relation; the
d-row weight vector broadcasts.  On a bucketed-by-vec_id layout the
projection join is co-located and a step costs one exchange of n rows.
"""

from __future__ import annotations

_ITERS = 3


def _vm(dialect: str) -> str:
    """(vec_id, idx, vm): embedding components as exact integer
    milli-units."""
    if dialect == "spark":
        return (
            "SELECT vec_id, idx,"
            " CAST(round(CAST(v AS DOUBLE) * 1000.0, 0) AS BIGINT) AS vm"
            " FROM embeddings LATERAL VIEW posexplode(embedding) t AS idx, v"
        )
    return (
        "SELECT vec_id, t.i AS idx,"
        " CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * 1000.0, 0)"
        " AS BIGINT) AS vm"
        " FROM embeddings, unnest(range(0, len(embedding))) AS t(i)"
    )


def q_embedding_pca_power_oracle(dialect: str) -> str:
    """Unrolled 3-step power iteration (DuckDB oracle for the Spark
    DataFrame loop below; identical arithmetic)."""
    steps = []
    prev = "w0"
    for k in range(1, _ITERS + 1):
        steps.append(
            f"""
s{k} AS (
  SELECT x.vec_id, CAST(sum(x.xc * w.w) AS BIGINT) AS s
  FROM xc x JOIN {prev} w ON w.idx = x.idx
  GROUP BY x.vec_id
),
z{k} AS (
  SELECT x.idx, CAST(sum(x.xc * s.s) AS BIGINT) AS z
  FROM xc x JOIN s{k} s ON s.vec_id = x.vec_id
  GROUP BY x.idx
),
p{k} AS (SELECT z FROM z{k} ORDER BY abs(z) DESC, idx LIMIT 1),
w{k} AS (
  SELECT idx,
         CASE WHEN (SELECT z FROM p{k}) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(round(CAST(z AS DOUBLE) / (SELECT z FROM p{k})
                              * 1000.0, 0) AS BIGINT) END AS w
  FROM z{k}
)"""
        )
        prev = f"w{k}"
    body = ",".join(steps)
    return f"""
WITH e AS ({_vm(dialect)}),
m AS (
  SELECT idx,
         CAST(floor(CAST(sum(vm) AS DOUBLE) / count(*)) AS BIGINT)
           AS mean_milli
  FROM e GROUP BY idx
),
xc AS (
  SELECT e.vec_id, e.idx, e.vm - m.mean_milli AS xc
  FROM e JOIN m ON m.idx = e.idx
),
w0 AS (SELECT DISTINCT idx, CAST(1000 AS BIGINT) AS w FROM e),
{body}
SELECT m.idx, m.mean_milli, f.w AS w_milli
FROM m JOIN {prev} f ON f.idx = m.idx"""


def q_embedding_pca_power_df(spark, sf_dir: str):
    """Spark side as a genuine iterative DataFrame loop (the unrolled SQL
    runs only as the DuckDB oracle — on Spark it would inline every CTE
    and re-execute the upstream subtree per reference, the same finding
    as kmeans_lloyd).  The exploded centered relation persists once; each
    step broadcasts the d-row weight vector, computes projections
    (shuffle by vec_id), and the update (shuffle by idx)."""
    from pyspark.sql import functions as F

    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    e = spark.sql(_vm("spark"))
    m = e.groupBy("idx").agg(
        F.floor(
            F.sum("vm").cast("double") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("mean_milli")
    )
    xc = (
        e.join(F.broadcast(m), "idx")
        .select("vec_id", "idx", (F.col("vm") - F.col("mean_milli")).alias("xc"))
        .persist()
    )
    w = m.select("idx", F.lit(1000).cast("long").alias("w"))
    for _ in range(_ITERS):
        s = (
            xc.join(F.broadcast(w), "idx")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xc") * F.col("w")).cast("long").alias("s"))
        )
        z = (
            xc.join(s, "vec_id")
            .groupBy("idx")
            .agg(F.sum(F.col("xc") * F.col("s")).cast("long").alias("z"))
        )
        zref = (
            z.orderBy(F.abs(F.col("z")).desc(), F.col("idx"))
            .limit(1)
            .select(F.col("z").alias("zref"))
        )
        w = z.crossJoin(F.broadcast(zref)).select(
            "idx",
            F.when(F.col("zref") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.round(
                    F.col("z").cast("double") / F.col("zref") * 1000.0, 0
                ).cast("long")
            )
            .alias("w"),
        )
        # the tiny d-row weight vector is referenced twice next step
        # (broadcast join + the following z); persist it, not the fact
        w = w.persist()
    return m.join(w, "idx").select(
        "idx", "mean_milli", F.col("w").alias("w_milli")
    )


def q_theil_sen_oracle(dialect: str) -> str:
    """Pairwise-median oracle for the Theil-Sen slope: all C(n,2) day
    pairs per event type, slope médian via the engine's continuous
    quantile.  Slopes are IEEE divisions of identical integers, so both
    engines compute bit-identical doubles; the median of identical
    multisets (exact element for odd counts, mean of two identical
    doubles for even) matches numpy's median."""
    med = (
        "percentile(slope, 0.5)"
        if dialect == "spark"
        else "quantile_cont(slope, 0.5)"
    )
    if dialect == "spark":
        t = "unix_micros(CAST(ts AS TIMESTAMP_LTZ))"
    else:
        t = "epoch_us(ts)"
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(({t}) / 86400000000.0) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events
  GROUP BY event_type, CAST(floor(({t}) / 86400000000.0) AS BIGINT)
),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type
),
pairs AS (
  SELECT a.event_type,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.d > a.d
)
SELECT p.event_type,
       CAST(max(nd.n_days) AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(round({med} * 1000, 0) AS BIGINT) AS sen_slope_milli
FROM pairs p JOIN nd ON nd.event_type = p.event_type
GROUP BY p.event_type"""


def q_theil_sen_df(spark, sf_dir: str):
    """Theil-Sen robust trend slope of daily event counts per type, as a
    grouped ``applyInPandas`` operator: each (small) per-type daily
    series ships to Python once, numpy computes the C(n,2) pairwise
    slopes and their median.  This is the estimator to reach for when a
    few anomalous days would wreck OLS (rolling_ols_slope_14d) — its
    breakdown point is 29%.

    Scale: the quadratic work is per GROUP (n = #days per type, so
    C(n,2) is tiny and bounded by retention, never by corpus rows); the
    shuffle is one hash exchange of the daily aggregate.  The SQL oracle
    replays the pairwise median relationally."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    daily = (
        spark.table("events")
        .select(
            "event_type",
            F.floor(
                F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))")
                / 86_400_000_000.0
            )
            .cast("long")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )

    def sen(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                columns=["event_type", "n_days", "n_pairs", "sen_slope_milli"]
            )
        d = pdf["d"].to_numpy(dtype=np.int64)
        y = pdf["y"].to_numpy(dtype=np.int64)
        i, j = np.triu_indices(len(d), k=1)
        slopes = (y[j] - y[i]).astype(np.float64) / (d[j] - d[i]).astype(
            np.float64
        )
        med = float(np.median(slopes))
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(d)],
                "n_pairs": [len(slopes)],
                "sen_slope_milli": [
                    int(np.sign(med * 1000) * np.floor(abs(med * 1000) + 0.5))
                ],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        sen,
        "event_type string, n_days long, n_pairs long, sen_slope_milli long",
    )


LINALG_DF_QUERIES = {
    "theil_sen_daily_trend": (
        q_theil_sen_df,
        q_theil_sen_oracle("duckdb"),
    ),
    "embedding_pca_power": (
        q_embedding_pca_power_df,
        q_embedding_pca_power_oracle("duckdb"),
    ),
}
