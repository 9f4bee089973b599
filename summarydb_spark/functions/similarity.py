"""Similarity search over embedding columns.

Two tiers, both shaped for 100 TB / billion-vector corpora:

- ``brute_force_topk``: exact cosine top-k.  The query set is broadcast
  (it is small by definition), the corpus streams through one scan — no
  shuffle of the corpus at all; per-row work is JVM column math.  This is
  the correctness baseline and perfectly adequate up to ~10^7 x 10^3.
- ``lsh_topk``: random-hyperplane bucketed ANN.  Corpus is signed into
  2^n_planes buckets once (linear scan); each query probes its own bucket
  plus Hamming<=probe buckets, so per-query candidate sets are
  corpus/2^planes-sized.  Recall tunable via n_planes/probe.

An IVF (k-means coarse quantizer) variant can reuse the same
bucket-join shape with pyspark.ml KMeans centroids as the bucketer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from summarydb_spark.functions.dedup import _hyperplanes, cosine


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Plan shape: broadcast(queries) nested-loop join over one corpus scan,
    then a per-query top-k window.  Returns (query_id, neighbor_id, cosine,
    rnk).
    """
    query_id_col = query_id_col or id_col
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(emb_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(emb_col)).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def _signature(col: Column, planes: np.ndarray) -> Column:
    """Packed sign-bit signature of an array<double> column against fixed
    hyperplanes.

    The plane matrix is a literal array<array<double>> and the dot products
    run through higher-order functions (zip_with/aggregate), which evaluate
    as runtime loops: the generated code stays small and compilable.  A
    fully unrolled sum-of-products (planes x dim multiply terms inline)
    blows past the JVM 64KB method limit and drops the whole stage to
    interpreted mode.
    """
    n_planes, dim = planes.shape
    mat = F.array(
        *[
            F.array(*[F.lit(float(planes[i, j])) for j in range(dim)])
            for i in range(n_planes)
        ]
    )
    dots = F.transform(
        mat,
        lambda p: F.aggregate(
            F.zip_with(col, p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    pow2 = F.array(*[F.lit(1 << i).cast("long") for i in range(n_planes)])
    return F.aggregate(
        F.zip_with(
            dots,
            pow2,
            lambda d, b: F.when(d > 0, b).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _centroid_dots(col: Column, centroids: np.ndarray) -> Column:
    """Array of dot products of ``col`` with each centroid (literal matrix
    + HOF loops — compact codegen, same pattern as _signature)."""
    n_c, dim = centroids.shape
    mat = F.array(
        *[
            F.array(*[F.lit(float(centroids[i, j])) for j in range(dim)])
            for i in range(n_c)
        ]
    )
    return F.transform(
        mat,
        lambda c: F.aggregate(
            F.zip_with(col, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_fraction: float = 1.0,
    max_iter: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) coarse quantizer.

    Centroids are trained driver-side with a few numpy Lloyd iterations on
    a collected corpus sample (at 100 TB you sample ~1M rows — centroid
    quality for coarse *bucketing* converges long before that, and the
    sample fits comfortably on the driver).  Everything distributed is pure
    column math: every corpus vector is assigned to its nearest centroid
    (one linear scan, no shuffle), queries probe their ``n_probe`` nearest
    centroid lists, and exact cosine runs only inside probed lists.
    Candidate volume per query ~ corpus * n_probe / n_centroids.
    """

    # L2-normalize so max-dot == max-cosine and KMeans partitions by angle
    def norm(col):
        nrm = F.sqrt(
            F.aggregate(col, F.lit(0.0), lambda a, v: a + v * v)
        )
        return F.transform(col, lambda x: x / nrm)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        norm(_as_double(F.col(emb_col))).alias("cv"),
    )
    train = c.sample(sample_fraction, seed=seed) if sample_fraction < 1.0 else c
    # Arrow-path transfer (toPandas) is ~10x cheaper than Row collect for
    # wide array columns
    sample = np.array(
        train.select("cv").limit(1_000_000).toPandas()["cv"].tolist()
    )
    rng = np.random.RandomState(seed)
    centroids = sample[rng.choice(len(sample), size=n_centroids, replace=False)]
    for _ in range(max_iter):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for j in range(n_centroids):
            pts = sample[assign == j]
            if len(pts):
                m = pts.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 0:
                    centroids[j] = m / nm

    def argmax_idx(dots: Column) -> Column:
        return F.array_position(dots, F.array_max(dots)).cast("int") - 1

    c = c.withColumn("list_id", argmax_idx(_centroid_dots(F.col("cv"), centroids)))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        norm(_as_double(F.col(emb_col))).alias("qv"),
    ).withColumn("_dots", _centroid_dots(F.col("qv"), centroids))
    # top-n_probe centroid ids: sort (dot, idx) structs descending
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.zip_with(
                    F.col("_dots"),
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                )
            )
        ),
        1,
        n_probe,
    )
    qp = q.withColumn("probe", F.explode(ranked)).select(
        "query_id", "qv", F.col("probe.i").alias("list_id")
    )

    scored = (
        qp.join(c, ["list_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    ``n_tables`` independent signatures (different hyperplane sets) are the
    classic recall lever: a true neighbor missed by one table is caught by
    another (recall ~ 1-(1-p)^L).  The corpus is bucketed once per table in
    a single linear pass (explode over table structs); queries additionally
    multi-probe buckets within Hamming ``probe_hamming`` of their own.
    Exact cosine is computed only on in-bucket candidates, once per distinct
    (query, neighbor).  Returns (query_id, neighbor_id, cosine, rnk).
    """
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def sig_structs(col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"), _signature(col, tables[t]).alias("sig")
                )
                for t in range(n_tables)
            ]
        )

    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _as_double(F.col(emb_col)).alias("cv")
        )
        .withColumn("ts", F.explode(sig_structs(F.col("cv"))))
        .select("neighbor_id", "cv", "ts.tbl", "ts.sig")
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(emb_col)).alias("qv")
    ).withColumn("tsig", sig_structs(F.col("qv")))

    def probes_of(sig: Column) -> list:
        out = [sig]
        if probe_hamming >= 1:
            out += [
                sig.bitwiseXOR(F.shiftleft(F.lit(1).cast("long"), i))
                for i in range(n_planes)
            ]
        if probe_hamming >= 2:
            out += [
                sig.bitwiseXOR(F.lit((1 << i) | (1 << j)).cast("long"))
                for i in range(n_planes)
                for j in range(i + 1, n_planes)
            ]
        return out

    qp = (
        q.withColumn("ts", F.explode("tsig"))
        .withColumn(
            "probe", F.explode(F.array(*probes_of(F.col("ts.sig"))))
        )
        .select("query_id", "qv", F.col("ts.tbl").alias("tbl"), "probe")
    )

    scored = (
        qp.alias("q")
        .join(
            c.alias("c"),
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.probe") == F.col("c.sig"))
            & (F.col("q.query_id") != F.col("c.neighbor_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
