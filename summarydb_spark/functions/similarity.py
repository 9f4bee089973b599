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
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from summarydb_spark.functions.dedup import _hyperplanes, cosine


def _mat_dots_udf(mat: np.ndarray):
    """Arrow-batched dot products against a fixed matrix: array<double> col
    -> array<double> of ``mat.shape[0]`` dots.

    One numpy matmul per Arrow batch replaces per-element HOF lambda
    evaluation (runtime-interpreted, ~100x slower per row); the matrix rides
    into executors inside the serialized UDF closure — at scale this is a
    few KB broadcast once, not a join side."""
    M = np.ascontiguousarray(mat.T, dtype=np.float64)  # dim x rows(mat)

    @pandas_udf("array<double>")
    def dots(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())  # batch x dim
        D = V @ M  # batch x n_rows
        return pd.Series(list(D))

    return dots


def _sigs_all_tables_udf(tables: list[np.ndarray]):
    """Arrow-batched packed sign-bit signatures for every LSH table at once:
    array<double> col -> array<long> of ``len(tables)`` signatures (one
    matmul across the concatenated plane sets per batch)."""
    n_planes = tables[0].shape[0]
    P = np.ascontiguousarray(np.vstack(tables).T, dtype=np.float64)
    bits = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<long>")
    def sigs(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())
        S = (V @ P) > 0  # batch x (tables*planes)
        out = [
            (S[:, t * n_planes : (t + 1) * n_planes] @ bits).astype(np.int64)
            for t in range(len(tables))
        ]
        return pd.Series(list(np.stack(out, axis=1)))

    return sigs


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


#: Driver-memory budget for train-once sample collection (IVF/PQ).  A
#: fixed ROW cap is dimension-blind: 1M rows at dim 768 float64 is ~6 GB
#: on the driver.  Budgeting BYTES keeps the collect bounded at any dim.
TRAIN_SAMPLE_BYTE_BUDGET = 512 << 20  # 512 MiB

#: Never collect more rows than this even at tiny dims — beyond ~1M
#: training vectors extra Lloyd input buys nothing for <=1024 centroids.
TRAIN_SAMPLE_MAX_ROWS = 1_000_000


def _train_row_cap(
    dim: int, byte_budget: int = TRAIN_SAMPLE_BYTE_BUDGET
) -> int:
    """Rows collectable for quantizer training under ``byte_budget``:
    rows = budget // (8 bytes * dim), clamped to [1, 1M].  At dim 2048
    / 512 MiB that is 32768 rows — plenty for k-means on <=1024
    centroids, and the driver collect stays flat as dims grow."""
    return max(1, min(TRAIN_SAMPLE_MAX_ROWS, byte_budget // (8 * max(1, dim))))


def adaptive_lsh_planes(
    n: int, target_bucket: int = 32, floor: int = 16, cap: int = 28
) -> int:
    """Hyperplane count for corpus size ``n``: enough planes that the
    EXPECTED bucket occupancy stays ~``target_bucket`` — planes =
    ceil(log2(n / target_bucket)), floored at the measured-good gate
    value (16 keeps 2^p >= corpus up to ~2M vectors, so buckets stay
    sparse there) and capped at 28 (2^28 buckets; beyond that more
    TABLES, not more planes, is the recall-preserving move).  Grows
    ~log(N): the BASELINE.md round-6 watch item — a fixed plane count
    lets bucket size grow linearly with the corpus, degrading the
    candidate join quadratically within hot buckets."""
    import math

    if n <= 0:
        return floor
    return max(floor, min(cap, int(math.ceil(math.log2(max(2, n / max(1, target_bucket)))))))


def adaptive_ivf_centroids(n: int, floor: int = 8, cap: int = 65536) -> int:
    """IVF list count for corpus size ``n``: ceil(sqrt(n)) clamped to
    [floor, cap] — the canonical FAISS sizing.  With a FIXED probe
    count, candidate volume per query is ~n_probe * n / nlist =
    n_probe * sqrt(n): sublinear in the corpus, vs linear when nlist is
    a constant (the measured 5x-at-10x ann_ivf_topk curve this
    replaces).  Training cost is nlist * sample — still bounded by the
    byte-budgeted sample."""
    import math

    if n <= 0:
        return floor
    return max(floor, min(cap, int(math.ceil(math.sqrt(n)))))


def _embedding_dim(df: DataFrame, emb_col: str) -> int:
    """Dimension of the embedding column — one single-row probe job
    (training runs once per index build; the probe is noise)."""
    row = df.where(F.col(emb_col).isNotNull()).select(
        F.size(emb_col).alias("d")
    ).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from column {emb_col!r}")
    return int(row["d"])


def _nrm2(col: Column) -> Column:
    """Squared L2 norm of an array<double> column."""
    return F.aggregate(col, F.lit(0.0), lambda a, v: a + v * v)


def _l2norm(col: Column) -> Column:
    """L2-normalized copy of an array<double> column.  Zero-norm vectors
    normalize to NULL components (nullif guard) instead of an ANSI
    DIVIDE_BY_ZERO crash — cosine geometry is undefined at zero.  Callers
    whose output feeds an Arrow UDF (encode/search paths) must drop zero
    vectors first with ``_nrm2(col) > 0``; NULLs would crash the numpy
    matmul executor-side."""
    nrm = F.nullif(F.sqrt(_nrm2(col)), F.lit(0.0))
    return F.transform(col, lambda x: x / nrm)


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


def train_ivf_centroids(
    corpus: DataFrame,
    emb_col: str = "embedding",
    n_centroids: int = 16,
    sample_fraction: float = 1.0,
    max_iter: int = 8,
    seed: int = 42,
    byte_budget: int = TRAIN_SAMPLE_BYTE_BUDGET,
    distributed: bool = False,
) -> np.ndarray:
    """Train the IVF coarse quantizer: a few numpy Lloyd iterations on a
    driver-collected, L2-normalized corpus sample (Arrow path).

    Index build and search are separate phases by design — at 100 TB you
    train once on a bounded sample, persist the centroids, and amortize
    them over every subsequent search (the FAISS build/search split).
    The sample is capped in BYTES, not rows (``byte_budget`` // 8*dim,
    <=1M rows), so the driver collect stays ~512 MB at any embedding
    dimension — a row-only cap would be ~6 GB at dim 768.

    ``distributed=True`` removes the driver sample entirely: pyspark.ml
    KMeans (k-means|| init, seeded) trains over the FULL corpus with
    executor-side Lloyd iterations — the path for corpora whose sample
    would under-represent the tail even at the byte budget.  Centroids
    are L2-normalized either way, so the returned array is a drop-in for
    ``ivf_encode``/search regardless of trainer."""

    train = corpus.where(_nrm2(_as_double(F.col(emb_col))) > 0).select(
        _l2norm(_as_double(F.col(emb_col))).alias("cv")
    )
    if distributed:
        return _train_ivf_distributed(train, n_centroids, max_iter, seed)
    if sample_fraction < 1.0:
        train = train.sample(sample_fraction, seed=seed)
    cap = _train_row_cap(_embedding_dim(corpus, emb_col), byte_budget)
    sample = np.array(train.limit(cap).toPandas()["cv"].tolist())
    if len(sample) < n_centroids:
        raise ValueError(
            f"IVF training needs >= n_centroids={n_centroids} non-zero "
            f"vectors, got {len(sample)}; lower n_centroids or grow the "
            "corpus"
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
    return centroids


def _train_pq_distributed(
    corpus: DataFrame,
    emb_col: str,
    m: int,
    k: int,
    max_iter: int,
    seed: int,
) -> np.ndarray:
    """Full-corpus PQ codebook training: per-subspace pyspark.ml KMeans
    over the L2-normalized corpus, each subspace fit on a ``slice`` of
    the embedding array (column pruning keeps only d/m values per row in
    flight).  Driver memory: the (m, k, d/m) codebooks only."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = _embedding_dim(corpus, emb_col)
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    base = corpus.where(_nrm2(_as_double(F.col(emb_col))) > 0).select(
        _l2norm(_as_double(F.col(emb_col))).alias("cv")
    )
    books = np.empty((m, k, sub))
    for j in range(m):
        feats = base.select(
            array_to_vector(F.slice("cv", j * sub + 1, sub)).alias("features")
        )
        model = KMeans(
            k=k, maxIter=max_iter, seed=seed + j, initMode="k-means||"
        ).fit(feats)
        books[j] = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    return books


def _train_ivf_distributed(
    train: DataFrame, n_centroids: int, max_iter: int, seed: int
) -> np.ndarray:
    """Full-corpus quantizer training with pyspark.ml KMeans: Lloyd
    iterations run executor-side (treeAggregate of per-partition partial
    sums — the classic distributed k-means), so NO training vectors ever
    reach the driver; only the (k, d) centroid matrix does.  Seeded
    k-means|| init keeps a fixed corpus + seed reproducible."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = train.select(array_to_vector(F.col("cv")).alias("features"))
    model = KMeans(
        k=n_centroids, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(feats)
    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    norms = np.linalg.norm(centers, axis=1, keepdims=True)
    return centers / np.where(norms > 0, norms, 1.0)


def ivf_encode(
    corpus: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Index-build half of IVF: assign every corpus vector to its nearest
    centroid in one Arrow-batched linear scan (no shuffle).  Returns
    (neighbor_id, cv [L2-normalized], list_id) — the persistable inverted
    file.  At 100 TB this runs once and is written partitioned by
    ``list_id`` so searches scan only probed lists."""
    cdots = _mat_dots_udf(centroids)

    def argmax_idx(dots: Column) -> Column:
        return F.array_position(dots, F.array_max(dots)).cast("int") - 1

    # zero vectors are excluded from the index (same contract as training:
    # cosine-undefined, and a NULL cv would crash the assignment matmul)
    return (
        corpus.where(_nrm2(_as_double(F.col(emb_col))) > 0)
        .select(
            F.col(id_col).alias("neighbor_id"),
            _l2norm(_as_double(F.col(emb_col))).alias("cv"),
        )
        .withColumn("list_id", argmax_idx(cdots(F.col("cv"))))
    )


def ivf_list_skew(
    encoded: DataFrame, nlist: int
) -> tuple[int, float, float]:
    """Occupancy skew of an inverted file: ``(max_list_size, mean_size,
    ratio)`` with mean = total/nlist (EMPTY lists count — a quantizer
    whose lists have emptied out is as stale as one with a hot list).
    One tiny hash aggregate + a single-row collect (bounded scalar).

    This is the re-train TRIGGER for append-batch maintenance: assigning
    new vectors to existing lists (:func:`ivf_encode` with the persisted
    centroids) keeps the index valid for any data, but a drifted batch
    piles into few lists and candidate volume per probe degrades toward
    n_probe * max_list.  When ratio passes the caller's bound, re-train
    the quantizer on the full corpus — the exact analogue of
    dedup_pairs_banded_delta's append-only contract with its rebuild
    boundary."""
    row = (
        encoded.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .head()
    )
    mx = int(row["mx"] or 0)
    mean = float(row["tot"] or 0) / max(1, nlist)
    return mx, mean, (mx / mean if mean > 0 else float("inf"))


def ivf_needs_retrain(
    encoded: DataFrame, nlist: int, bound: float = 8.0
) -> bool:
    """True when the inverted file's max/mean list-occupancy ratio passes
    ``bound`` (see :func:`ivf_list_skew`)."""
    return ivf_list_skew(encoded, nlist)[2] > bound


def ivf_topk(
    corpus: Optional[DataFrame],
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_fraction: float = 1.0,
    max_iter: int = 8,
    seed: int = 42,
    centroids: Optional[np.ndarray] = None,
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) coarse quantizer.

    The quantizer is trained by :func:`train_ivf_centroids` and the corpus
    assigned by :func:`ivf_encode` (pass ``centroids`` + ``encoded`` to
    reuse a prebuilt, persisted index — the production path; otherwise both
    are built inline from ``corpus``).  Everything distributed is
    Arrow-batched numpy: every corpus vector is assigned to its nearest
    centroid (one linear scan, no shuffle), queries probe their ``n_probe``
    nearest centroid lists, and exact cosine runs only inside probed lists.
    Candidate volume per query ~ corpus * n_probe / n_centroids.
    """
    if encoded is not None and centroids is None:
        raise ValueError("encoded corpus requires the centroids it was built with")
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus,
            emb_col=emb_col,
            n_centroids=n_centroids,
            sample_fraction=sample_fraction,
            max_iter=max_iter,
            seed=seed,
        )
    c = (
        encoded
        if encoded is not None
        else ivf_encode(corpus, centroids, emb_col=emb_col, id_col=id_col)
    )

    qp = ivf_probe_lists(
        queries, centroids, n_probe, emb_col=emb_col, id_col=id_col
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


def ivf_probe_lists(
    queries: DataFrame,
    centroids: np.ndarray,
    n_probe: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query-side half of IVF search, exposed as a CANDIDATE-GENERATION
    primitive: each query's ``n_probe`` nearest centroid lists, as
    (query_id, qv [L2-normalized], list_id) — join it against the
    persisted inverted file on ``list_id`` to get the candidate set,
    then score/rerank however the consumer needs (top-k, radius, kNN
    label vote).  Factored out of :func:`ivf_topk` so index-routed
    operators (knn_label_noise_indexed) share the exact probing plan."""
    cdots = _mat_dots_udf(centroids)
    # L2-normalize so max-dot == max-cosine; zero-norm probes have no
    # defined neighbors and are dropped (vs an ANSI divide crash)
    q = (
        queries.where(_nrm2(_as_double(F.col(emb_col))) > 0)
        .select(
            F.col(id_col).alias("query_id"),
            _l2norm(_as_double(F.col(emb_col))).alias("qv"),
        )
        .withColumn("_dots", cdots(F.col("qv")))
    )
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
    return q.withColumn("probe", F.explode(ranked)).select(
        "query_id", "qv", F.col("probe.i").alias("list_id")
    )


def ivf_cogroup_scores(
    probe_lists: DataFrame,
    encoded: DataFrame,
    m: int = 16,
    emb_col: str = "cv",
    id_col: str = "neighbor_id",
    carry: tuple = (),
) -> DataFrame:
    """Candidate SCORING half of IVF search as a cogrouped Arrow matmul:
    join-free — probes (query_id, qv, list_id from
    :func:`ivf_probe_lists`) and inverted-file members cogroup on
    ``list_id``, and each group computes the full probe x member dot
    matrix with ONE numpy matmul, emitting only each probe's top-``m``
    (query_id, neighbor_id, score) per list.

    Why not a join + per-row expression: the candidate relation is
    |probes| x list_width rows, and a 64-dim dot as a higher-order SQL
    expression is INTERPRETED per element (never codegen'd) — measured
    123x wall at 10x data on the knn rerank.  Cogrouping moves each
    member and each probe over Arrow exactly ONCE (no pair
    materialization), and the per-group matmul is BLAS.  Scores are
    selection-only (float-order differs from a sequential SQL fold by
    ulps): consumers needing oracle-exact values re-rank the survivors
    with the exact expression — the top-m margin makes displacement of
    a true top-k candidate require >= m-k ulp-ties, impossible in
    practice and pinned by the oracle gates.

    ``carry``: optional ((name, ddl_type), ...) of ``encoded`` columns to
    pass through onto each emitted candidate row (e.g. the member's label
    and raw embedding).  The member row already crosses Arrow INTO the
    scorer; carrying its payload back out on the <= m survivors per
    (probe, list) lets the consumer skip a re-join of the full inverted
    file against the top-m ids — one join and one store scan fewer."""
    carry_names = [c[0] for c in carry]

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            # carried cols must be OBJECT dtype when empty: a default
            # float64 empty column cannot Arrow-convert to list<double>
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "score": [],
                 **{c: pd.Series([], dtype=object) for c in carry_names}}
            ).astype({"query_id": "int64", "neighbor_id": "int64",
                      "score": "float64"})
        Q = np.array(left["qv"].tolist(), dtype=np.float64)
        M = np.array(right[emb_col].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        S = Q @ (M / nrm[:, None]).T  # qv is already L2-normalized
        qids = left["query_id"].to_numpy()
        nids = right[id_col].to_numpy()
        out_q, out_n, out_s, out_sel = [], [], [], []
        k = min(m + 1, S.shape[1])  # +1 headroom for self-exclusion
        for i in range(S.shape[0]):
            row = S[i]
            # top-k by (score desc, neighbor asc): lexsort on (-score, id)
            idx = np.lexsort((nids, -row))[:k]
            keep = nids[idx] != qids[i]
            # trim back to m: the +1 headroom exists only so a probe whose
            # own id sits in the top-(m+1) still yields m true neighbors
            sel = idx[keep][:m]
            out_q.extend([qids[i]] * len(sel))
            out_n.extend(nids[sel])
            out_s.extend(row[sel])
            out_sel.append(sel)
        out = {"query_id": out_q, "neighbor_id": out_n, "score": out_s}
        if carry_names:
            all_sel = (
                np.concatenate(out_sel)
                if out_sel
                else np.array([], dtype=np.int64)
            )
            for c in carry_names:
                out[c] = right[c].to_numpy()[all_sel]
        return pd.DataFrame(out)

    schema = "query_id long, neighbor_id long, score double"
    if carry:
        schema += ", " + ", ".join(f"{n} {t}" for n, t in carry)
    return (
        probe_lists.groupBy("list_id")
        .cogroup(encoded.groupBy("list_id"))
        .applyInPandas(lambda l, r: score(l, r), schema=schema)
    )


def _require_dim(corpus: DataFrame, emb_col: str, dim: int) -> None:
    """Fail fast (driver-side, one-row lookup) when the corpus vectors do
    not match the planes' dimensionality — a deep executor-side numpy
    shape error otherwise.  FAISS-style contract: the index is built for
    a fixed dim; pass ``dim=`` to match the data."""
    row = corpus.select(F.size(F.col(emb_col)).alias("d")).head()
    if row is not None and row["d"] != dim:
        raise ValueError(
            f"embedding dim {row['d']} != index dim {dim}; pass dim="
            f"{row['d']} when building/searching this index"
        )


def lsh_encode(
    corpus: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Index-build half of multi-table LSH: one Arrow-batched linear pass
    signs every corpus vector into all ``n_tables`` signature sets at once.
    Returns (neighbor_id, cv, sigs array<long>) — the persistable index
    (un-exploded: one row per vector; searches explode JVM-side).  The
    hyperplanes are derived deterministically from ``seed``, so a search
    session reconstructs the same planes without storing them."""
    _require_dim(corpus, emb_col, dim)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    sigsf = _sigs_all_tables_udf(tables)
    return corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(emb_col)).alias("cv")
    ).withColumn("sigs", sigsf(F.col("cv")))


def lsh_topk(
    corpus: Optional[DataFrame],
    queries: DataFrame,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 1,
    seed: int = 42,
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """Approximate cosine top-k via multi-table random-hyperplane LSH.

    ``n_tables`` independent signatures (different hyperplane sets) are the
    classic recall lever: a true neighbor missed by one table is caught by
    another (recall ~ 1-(1-p)^L).  The corpus is bucketed once per table in
    a single linear pass (:func:`lsh_encode`; pass ``encoded`` to reuse a
    persisted index — the production path); queries additionally
    multi-probe buckets within Hamming ``probe_hamming`` of their own.
    Exact cosine is computed only on in-bucket candidates, once per distinct
    (query, neighbor).  Returns (query_id, neighbor_id, cosine, rnk).
    """
    scored = _lsh_scored_candidates(
        corpus, queries, emb_col, id_col, dim, n_planes, n_tables,
        probe_hamming, seed, encoded,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def lsh_radius(
    corpus: Optional[DataFrame],
    queries: DataFrame,
    tau: float,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    probe_hamming: int = 1,
    seed: int = 42,
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """Radius (range) similarity search: ALL corpus vectors with cosine >=
    ``tau`` per query — the dedup/recall-set twin of :func:`lsh_topk`
    (top-k bounds the result count; radius bounds the similarity).  Shares
    the multi-table candidate machinery; the only difference is the final
    predicate, so no per-query window/sort is needed at all — the result
    is a pure filter over verified candidates.  Returns (query_id,
    neighbor_id, cosine)."""
    scored = _lsh_scored_candidates(
        corpus, queries, emb_col, id_col, dim, n_planes, n_tables,
        probe_hamming, seed, encoded,
    )
    return scored.where(F.col("cosine") >= tau)


def _lsh_scored_candidates(
    corpus: Optional[DataFrame],
    queries: DataFrame,
    emb_col: str,
    id_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    probe_hamming: int,
    seed: int,
    encoded: Optional[DataFrame],
) -> DataFrame:
    """Shared candidate stage of lsh_topk / lsh_radius: sign queries, probe
    every table's buckets (multi-probe), exact-cosine each distinct
    (query, neighbor) candidate exactly once."""
    # fail fast on the PRODUCTION path too: with a prebuilt `encoded` index
    # lsh_encode's driver-side dim check never runs, and a query/index
    # mismatch otherwise dies as a numpy shape error on executors mid-job
    _require_dim(queries, emb_col, dim)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    sigsf = _sigs_all_tables_udf(tables)

    enc = (
        encoded
        if encoded is not None
        else lsh_encode(
            corpus,
            emb_col=emb_col,
            id_col=id_col,
            dim=dim,
            n_planes=n_planes,
            n_tables=n_tables,
            seed=seed,
        )
    )
    # narrow banding relation: the 64-double corpus vectors do NOT ride
    # the 6x table explode and the bucket join (same reattach-to-candidates
    # shape as dedup.minhash_lsh_pairs)
    c = enc.select("neighbor_id", F.posexplode("sigs").alias("tbl", "sig"))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(emb_col)).alias("qv")
    ).withColumn("sigs", sigsf(F.col("qv")))

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
        q.select("query_id", F.posexplode("sigs").alias("tbl", "sig"))
        .withColumn("probe", F.explode(F.array(*probes_of(F.col("sig")))))
        .select("query_id", "tbl", "probe")
    )

    # the probe side is the (tiny) query batch x tables x probes — explicit
    # broadcasts keep every join here a build-on-probe BroadcastHashJoin
    # (the UDF/explode subtrees carry no size estimates, so the planner
    # would otherwise shuffle the corpus banding relation and AQE would
    # only repair it with extra stage waves); the corpus side (c, enc) is
    # never broadcast — it is the scale-bearing relation
    cand = (
        F.broadcast(qp).alias("q")
        .join(
            c.alias("c"),
            (F.col("q.tbl") == F.col("c.tbl"))
            & (F.col("q.probe") == F.col("c.sig"))
            & (F.col("q.query_id") != F.col("c.neighbor_id")),
        )
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    # candidates are bounded by |queries| x tables x probes x bucket size —
    # tiny next to the corpus — so broadcast THEM into the payload join:
    # the corpus vectors are scanned once in place instead of shuffled
    # (a sort-merge here exchanges every cv to pair with a few thousand
    # candidate rows).  A query batch large enough to break this broadcast
    # should use repartition + the plain join — at that point the shuffle
    # is amortized over the batch.
    return (
        enc.select("neighbor_id", "cv")
        .join(
            F.broadcast(
                cand.join(
                    F.broadcast(q.select("query_id", "qv")), "query_id"
                )
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with exact re-ranking
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    emb_col: str = "embedding",
    m: int = 4,
    k: int = 32,
    max_iter: int = 10,
    seed: int = 42,
    byte_budget: int = TRAIN_SAMPLE_BYTE_BUDGET,
    distributed: bool = False,
    normalize: bool = True,
) -> np.ndarray:
    """Train PQ codebooks: per-subspace k-means on a driver-collected,
    L2-normalized sample (the same bounded build/search split as
    :func:`train_ivf_centroids` — train once on a byte-budgeted sample
    [``byte_budget`` // 8*dim rows, <=1M], persist, reuse).

    ``normalize=False`` trains on the raw column values — required when
    the input is IVF residuals (x - centroid), which must NOT be
    re-normalized (sample-path only; the distributed trainer always
    normalizes).

    Returns an ``(m, k, d//m)`` array: ``m`` subspaces, ``k`` codes each.
    Memory per corpus vector after encoding is ``m`` small ints instead of
    ``d`` floats — the canonical billion-vector footprint reduction
    (IVF+PQ); ADC scoring costs ``m`` table lookups per pair instead of a
    ``d``-wide dot product.

    ``distributed=True`` trains each subspace's codebook with pyspark.ml
    KMeans over the FULL corpus (no driver sample at all) — ``m``
    sequential executor-side fits over sliced features; centroids are
    the only thing the driver ever holds.
    """
    if distributed:
        if not normalize:
            raise ValueError(
                "distributed PQ training always normalizes; train residual "
                "codebooks with the sample path (normalize=False)"
            )
        return _train_pq_distributed(corpus, emb_col, m, k, max_iter, seed)

    cap = _train_row_cap(_embedding_dim(corpus, emb_col), byte_budget)
    if normalize:
        src = corpus.where(_nrm2(_as_double(F.col(emb_col))) > 0).select(
            _l2norm(_as_double(F.col(emb_col))).alias("cv")
        )
    else:
        src = corpus.select(_as_double(F.col(emb_col)).alias("cv"))
    sample = np.array(src.limit(cap).toPandas()["cv"].tolist())
    if len(sample) < k:
        raise ValueError(
            f"PQ training needs >= k={k} non-zero vectors per codebook, "
            f"got {len(sample)}; lower k or grow the corpus"
        )
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub))
    for j in range(m):
        X = sample[:, j * sub : (j + 1) * sub]
        C = X[rng.choice(len(X), size=k, replace=False)]
        for _ in range(max_iter):
            # L2 assignment: argmin ||x - c||^2 = argmax (x.c - ||c||^2/2)
            scores = X @ C.T - 0.5 * (C * C).sum(axis=1)
            assign = np.argmax(scores, axis=1)
            for c_i in range(k):
                pts = X[assign == c_i]
                if len(pts):
                    C[c_i] = pts.mean(axis=0)
        books[j] = C
    return books


def _pq_encode_udf(codebooks: np.ndarray):
    """Arrow-batched PQ encoder: normalized array<double> -> array<int>
    of ``m`` code ids (per-subspace nearest centroid, one matmul per
    subspace per batch)."""
    m, k, sub = codebooks.shape
    mats = [np.ascontiguousarray(codebooks[j].T) for j in range(m)]
    halves = [0.5 * (codebooks[j] * codebooks[j]).sum(axis=1) for j in range(m)]

    @pandas_udf("array<int>")
    def enc(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())
        codes = [
            np.argmax(V[:, j * sub : (j + 1) * sub] @ mats[j] - halves[j], axis=1)
            for j in range(m)
        ]
        return pd.Series(list(np.stack(codes, axis=1).astype(np.int32)))

    return enc


def _pq_lut_udf(codebooks: np.ndarray):
    """Per-query ADC lookup table: normalized query array<double> ->
    flat array<double> of m*k entries, T[j*k + c] = q_j . codebook[j][c]
    (dot-product/cosine metric on normalized vectors)."""
    m, k, sub = codebooks.shape
    mats = [np.ascontiguousarray(codebooks[j].T) for j in range(m)]

    @pandas_udf("array<double>")
    def lut(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())
        parts = [V[:, j * sub : (j + 1) * sub] @ mats[j] for j in range(m)]
        return pd.Series(list(np.concatenate(parts, axis=1)))

    return lut


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Index-build half of PQ: encode every corpus vector to its ``m``
    subspace code ids in one Arrow-batched pass.  Returns (neighbor_id, cv
    [L2-normalized], codes array<int>) — the persistable encoded corpus.
    At billion-vector scale only (neighbor_id, codes) need stay hot; cv is
    cold storage fetched for the exact re-rank of ~``rerank`` rows/query."""
    enc = _pq_encode_udf(codebooks)

    # zero vectors excluded, as in ivf_encode
    return (
        corpus.where(_nrm2(_as_double(F.col(emb_col))) > 0)
        .select(
            F.col(id_col).alias("neighbor_id"),
            _l2norm(_as_double(F.col(emb_col))).alias("cv"),
        )
        .withColumn("codes", enc(F.col("cv")))
    )


def pq_topk(
    corpus: Optional[DataFrame],
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank: int = 32,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    encoded: Optional[DataFrame] = None,
) -> DataFrame:
    """Approximate cosine top-k via product quantization with exact
    re-ranking (the standard PQ pipeline): ADC-score every (query,
    candidate) pair with ``m`` table lookups, keep the top ``rerank``
    candidates per query, then re-score those exactly and emit the top
    ``k``.

    Plan shape: encode the corpus once (Arrow-batched argmax per
    subspace), broadcast the (tiny) query+LUT relation, score with pure
    JVM column math (element_at lookups — no Python in the pair loop),
    top-``rerank`` window, exact cosine on ``rerank`` rows per query.
    At scale this composes with IVF (scan only probed lists) and the
    encoded corpus is ``m`` bytes-ish per vector instead of ``4d``;
    citation shape: FAISS IVFADC (Jegou et al., PAMI'11).
    """
    m, kk, _sub = codebooks.shape

    lut = _pq_lut_udf(codebooks)

    c = (
        encoded
        if encoded is not None
        else pq_encode(corpus, codebooks, emb_col=emb_col, id_col=id_col)
    )

    # zero-norm probes dropped, as in ivf_topk
    q = (
        queries.where(_nrm2(_as_double(F.col(emb_col))) > 0)
        .select(
            F.col(id_col).alias("query_id"),
            _l2norm(_as_double(F.col(emb_col))).alias("qv"),
        )
        .withColumn("lut", lut(F.col("qv")))
    )

    # ADC score = sum_j lut[j*k + codes[j]] — m element_at lookups per
    # pair, JVM-side
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.element_at(
                F.col("lut"), (j * kk + code + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc", adc)
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cands = scored.withColumn("adc_rnk", F.row_number().over(w_adc)).where(
        F.col("adc_rnk") <= rerank
    )
    rescored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rescored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )


def _centroid_table(spark, centroids: np.ndarray) -> DataFrame:
    """(list_id, cent array<double>) relation of the coarse quantizer —
    nlist rows, always broadcast."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, cent array<double>",
    )


def ivfpq_encode(
    spark,
    corpus: DataFrame,
    centroids: np.ndarray,
    m: int = 4,
    k: int = 32,
    max_iter: int = 10,
    seed: int = 42,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, np.ndarray]:
    """Index-build half of IVFADC (FAISS IVF+PQ, Jegou et al. PAMI'11):
    assign every corpus vector to its nearest coarse centroid, then PQ-encode
    the RESIDUAL (x - centroid).  On clustered corpora (the regime IVF
    exists for) residual magnitudes are much smaller than the vectors, so
    the same codebook budget quantizes far more precisely than raw-vector
    PQ; on ISOTROPIC vectors the centroids sit near the origin and the
    advantage vanishes (measured on the driver embeddings —
    tests/test_functions.py::test_ivfpq_residual_quantizes_tighter...).
    The exact re-rank stage makes emitted values exact either way; ADC
    quality only affects recall at a given rerank budget.  Returns (encoded DataFrame with
    (neighbor_id, cv, list_id, codes), residual codebooks (m, k, d//m)).

    The residual is pure JVM column math (zip_with subtract against the
    broadcast nlist-row centroid table); codebook training samples residuals
    WITHOUT re-normalizing (normalize=False).  At 100 TB the hot index is
    (neighbor_id, list_id, codes) — m small ints per vector — partitioned by
    list_id; cv stays cold for the exact re-rank fetches."""
    enc = ivf_encode(corpus, centroids, emb_col=emb_col, id_col=id_col)
    cent_df = _centroid_table(spark, centroids)
    with_res = enc.join(F.broadcast(cent_df), ["list_id"]).withColumn(
        "rv", F.zip_with(F.col("cv"), F.col("cent"), lambda a, b: a - b)
    )
    books = train_pq_codebooks(
        with_res, emb_col="rv", m=m, k=k, max_iter=max_iter, seed=seed,
        normalize=False,
    )
    coder = _pq_encode_udf(books)
    encoded = with_res.withColumn("codes", coder(F.col("rv"))).select(
        "neighbor_id", "cv", "list_id", "codes"
    )
    return encoded, books


def ivfpq_topk(
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    encoded: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    rerank: int = 32,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search half of IVFADC: probe the ``n_probe`` nearest coarse lists,
    ADC-score only candidates inside probed lists, exact-rerank the ADC
    top-``rerank``.

    The dot product decomposes over the residual:
    ``q . x  ~  q . c_list + q . r``, where ``q . c_list`` is the probe dot
    already computed during list ranking and ``q . r`` is ``m`` LUT lookups
    (LUT[j*k+c] = q_j . codebook[j][c]).  So the per-candidate score is pure
    JVM arithmetic — no Python in the pair loop — and candidate volume per
    query is ~ n_probe/nlist of the corpus, with ADC making each candidate
    O(m) instead of O(d).  The exact re-rank stage emits true cosines, so
    approximation error can only cost recall, never values."""
    m, kk, _sub = codebooks.shape
    cdots = _mat_dots_udf(centroids)
    lut = _pq_lut_udf(codebooks)

    q = (
        queries.where(_nrm2(_as_double(F.col(emb_col))) > 0)
        .select(
            F.col(id_col).alias("query_id"),
            _l2norm(_as_double(F.col(emb_col))).alias("qv"),
        )
        .withColumn("_dots", cdots(F.col("qv")))
        .withColumn("lut", lut(F.col("qv")))
    )
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
        "query_id",
        "qv",
        "lut",
        F.col("probe.i").alias("list_id"),
        F.col("probe.d").alias("cdot"),
    )

    adc_res = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, j: F.element_at(
                F.col("lut"), (j * kk + code + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        qp.join(encoded, ["list_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", F.col("cdot") + adc_res)
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id")
    )
    cands = scored.withColumn("adc_rnk", F.row_number().over(w_adc)).where(
        F.col("adc_rnk") <= rerank
    )
    rescored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return rescored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
