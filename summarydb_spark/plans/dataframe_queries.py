"""DataFrame-built driver queries for the LSH operator family.

MinHash/SimHash/hyperplane band collisions are hash-function-specific, so
no portable SQL oracle exists; these are registered with ``None`` oracle
(driver records rows-only).  Where an exact-SQL equivalent *is* feasible
(embedding near-dups verified at a high threshold over a blocked candidate
space), an oracle is provided.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from summarydb_spark.functions import dedup, similarity


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from summarydb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from summarydb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def _emb_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 ANN probe vectors, read UN-widened: the query side is tiny
    by definition, and the widening repartition would smear 20 rows over
    32 partitions — every downstream pandas-UDF stage then pays 32 Python
    worker round-trips to process 20 rows."""
    from summarydb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings", widen=False).where(
        "vec_id < 20"
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (true Jaccard >= 0.8) surfaced by banded
    MinHash LSH.

    Full-oracle: the output is the set of pairs whose TRUE shingle Jaccard
    is >= 0.8 (verification is exact), so the oracle is the exact all-pairs
    Jaccard computed portably in SQL (blocked on shared shingles).  This is
    a live recall gate on the xxhash64 LSH path: a pair at J >= 0.8 that
    never collides in any of the 16 bands would drop from the Spark result
    and the row counts diverge.  P(miss) <= (1 - 0.8^4)^16 ~ 2e-4 per pair,
    and the concrete dataset is deterministic — verified to match exactly.

    Signatures come from a persisted store (ensure_store, fingerprint-
    keyed): the shingle + 64-hash fold runs once per source dataset, and
    every call pays only the banding join + candidate verification — the
    incremental-signature-store lifecycle of a production dedup service.
    (The store keeps the string shingle arrays for byte-exact verify at
    test scale; at 100 TB store the hashed shingles instead.)
    """
    from summarydb_spark.sources.tables import ensure_store

    def build(s):
        # the content digest (_ck, hot-bucket-guard collapse key) is
        # computed ONCE here and rides the store — probes and pair
        # builds read it instead of re-digesting the shingle arrays
        sigs = dedup.minhash_signatures(
            _docs(s, sf_dir), "text", num_hashes=64, shingle_k=3, seed=42
        ).select(
            F.col("doc_id").alias("_id"),
            "_shingles",
            "minhash",
            dedup._content_digest(F.col("_shingles")).alias("_ck"),
        )
        return sigs, None

    path = ensure_store(spark, sf_dir, "dedup_minhash_sigs", build, coalesce=0)
    out = dedup.minhash_lsh_pairs(
        None, num_hashes=64, bands=16, threshold=0.8,
        sigs=spark.read.parquet(path),
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


# Exact shingle-Jaccard >= 0.8, blocked on shared shingles (a pair with
# J >= 0.8 shares a shingle a fortiori, so blocking loses nothing).  The
# shingle construction mirrors functions/dedup.py::shingles exactly:
# lowercase/trim/collapse-whitespace, split on ' ', distinct 3-token
# shingles (whole text if < 3 tokens).
ORACLE_DEDUP_MINHASH = r"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks)-1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    ELSE [array_to_string(toks, ' ')] END AS shl
  FROM docs
),
ex AS (SELECT doc_id, len(shl) AS n, unnest(shl) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb, count(*) AS c
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1,2,3,4
)
SELECT id_a, id_b, round(c::DOUBLE / (na + nb - c), 6) AS jaccard
FROM inter
WHERE c::DOUBLE / (na + nb - c) >= 0.8
ORDER BY id_a, id_b"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup recall gate: plant a token-REVERSED copy of every
    doc_id < 25 (different text, identical token multiset => identical
    SimHash for ANY hash function, Hamming distance exactly 0), run the
    full banded SimHash pipeline over the union corpus at max_hamming=3,
    and emit the planted self-pairs.

    The planted pairs' membership and hamming values are hash-independent,
    so the oracle is closed-form — while still exercising signature,
    banding, candidate join and Hamming verify end-to-end (a banding or
    verify bug drops planted rows and the driver flags it).  Natural
    near-dup pairs at hamming 1-3 have xxhash64-dependent distances (not
    portable SQL); that surface is hash-match-verified by the md5-based
    twin ``dedup_simhash_portable`` (plans/portable_dedup.py)."""
    from summarydb_spark.functions.text import normalize_text
    from summarydb_spark.sources.tables import ensure_store

    def build(s):
        docs = _docs(s, sf_dir).select("doc_id", "text")
        toks = F.split(normalize_text(F.col("text")), " ")
        planted = docs.where("doc_id < 25").select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat_ws(" ", F.reverse(toks)).alias("text"),
        )
        union = docs.unionByName(planted)
        sigs = union.select(
            F.col("doc_id").alias("_id"),
            dedup.simhash(F.col("text")).alias("sh"),
        )
        return sigs, None

    # persisted signature store: the 63-bit simhash aggregate (the
    # expensive per-token fold) runs once per source dataset; calls pay
    # only banding + Hamming verify
    path = ensure_store(spark, sf_dir, "dedup_simhash_sigs", build, coalesce=0)
    out = dedup.simhash_pairs(
        None, max_hamming=3, sigs=spark.read.parquet(path)
    )
    return out.where(F.col("id_b") == F.col("id_a") + 1000000).orderBy(
        "id_a", "id_b"
    )


ORACLE_DEDUP_SIMHASH = """
SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents WHERE doc_id < 25 ORDER BY id_a, id_b"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dups (cosine >= 0.99) via hyperplane LSH + exact
    verify.  Rows-only check (LSH recall is probabilistic by design).

    The synthetic embeddings have no natural near-dups (max pairwise cosine
    ~0.51 at sf0.01), so the query plants one deterministic perturbed copy
    of every vec_id < 25 (element i scaled by 1 + 0.002*((i%7)-3)); cosine
    (orig, copy) ~0.99999, so the expected output is exactly those 25
    planted pairs — a live recall check, not a vacuous empty result.

    Hyperplane signatures come from a persisted store (ensure_store):
    the Arrow matmul over the corpus runs once per source dataset, calls
    pay only the multi-probe join + exact cosine verify.  The plane
    count is ADAPTIVE (~log2(n/32), floored at the gate-scale-good 12)
    and persisted in the store's _params.json sidecar, so the probe
    signatures always match the stored ones — the round-6 watch item
    (fixed planes let bucket size grow linearly with the corpus)."""
    import json as _json

    from summarydb_spark.sources.tables import ensure_store, store_sidecar

    def build(s):
        from summarydb_spark.functions.dedup import _hyperplanes
        from summarydb_spark.functions.similarity import (
            _require_dim,
            _sigs_all_tables_udf,
            adaptive_lsh_planes,
        )

        embs = _embs(s, sf_dir)
        _require_dim(embs, "embedding", 64)
        idx = F.expr(
            "transform(embedding, (x, i) -> x * cast(1.0 + 0.002 * ((i % 7) - 3) as float))"
        )
        planted = embs.where("vec_id < 25").select(
            (F.col("vec_id") + 1000000).alias("vec_id"),
            idx.alias("embedding"),
            "label",
        )
        union = embs.unionByName(planted)
        planes = adaptive_lsh_planes(union.count(), floor=12)
        sigf = _sigs_all_tables_udf([_hyperplanes(64, planes, 42)])
        vecs = union.select(
            F.col("vec_id").alias("_id"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        )
        return vecs.withColumn("sig", F.element_at(sigf(F.col("v")), 1)), {
            "_params.json": _json.dumps({"n_planes": planes}).encode()
        }

    path = ensure_store(
        spark, sf_dir, "near_dup_emb_sigs_adaptive", build, coalesce=0
    )
    params = _json.loads(store_sidecar(path, "_params.json"))
    out = dedup.embedding_near_dups(
        None, threshold=0.99, n_planes=params["n_planes"], probe_hamming=1,
        sigs=spark.read.parquet(path),
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


# The planted-copy construction above is deterministic, so the exact
# expected output IS SQL-expressible: reproduce the per-element float32
# perturbation (REAL*REAL multiply matches Spark's float*float bit-exactly),
# then the cosine of each (original, planted) pair.  This turns the LSH
# query into a live recall check — if multi-probe ever misses a planted
# pair, the row counts diverge and the driver flags it.
ORACLE_EMBEDDING_NEAR_DUPS = """
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 25
),
planted AS (
  SELECT vec_id AS orig_id, vec_id + 1000000 AS vec_id_b,
         list_transform(range(0, len(embedding)),
           i -> CAST(embedding[i + 1]
                * CAST(1.0 + 0.002 * ((i % 7) - 3) AS REAL) AS REAL)) AS emb_b
  FROM base
)
SELECT b.vec_id AS id_a, p.vec_id_b AS id_b,
       round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                    CAST(p.emb_b AS DOUBLE[])), 6) AS cosine
FROM base b JOIN planted p ON p.orig_id = b.vec_id"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (functions.dedup.semantic_dedup):
    sign-pattern clustering, intra-cluster exact cosine, greedy min-id
    keeper.  The synthetic embeddings have no natural near-dups (max
    pairwise cosine ~0.51), so the query plants one deterministic perturbed
    copy of every vec_id < 40 (same float32 perturbation as
    embedding_near_dups).  The positive scale factors preserve every
    component's sign, so each copy lands in its original's cluster; the
    expected output is exactly the 40 (planted -> original) drops — a live
    end-to-end check of clustering + verify + keeper selection."""
    embs = _embs(spark, sf_dir)
    perturbed = F.expr(
        "transform(embedding, (x, i) -> "
        "x * cast(1.0 + 0.002 * ((i % 7) - 3) as float))"
    )
    planted = embs.where("vec_id < 40").select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )
    union = embs.unionByName(planted)
    out = dedup.semantic_dedup(union, threshold=0.95, n_sign_dims=8)
    return out.select(
        "vec_id", "keeper_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("vec_id")


_SIGN_BUCKET_DUCK = " + ".join(
    f"{1 << i} * (CASE WHEN embedding[{i + 1}] >= 0 THEN 1 ELSE 0 END)"
    for i in range(8)
)

ORACLE_DEDUP_SEMANTIC = f"""
WITH planted AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(0, len(embedding)),
           i -> CAST(embedding[i + 1]
                * CAST(1.0 + 0.002 * ((i % 7) - 3) AS REAL) AS REAL))
           AS embedding
  FROM embeddings WHERE vec_id < 40
),
u AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id, embedding FROM planted
),
b AS (
  SELECT vec_id, embedding, {_SIGN_BUCKET_DUCK} AS bucket FROM u
),
p AS (
  SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b2.embedding AS DOUBLE[])) AS cos
  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
)
SELECT id_b AS vec_id, min(id_a) AS keeper_id,
       round(arg_min(cos, id_a), 6) AS cosine
FROM p WHERE cos >= 0.95
GROUP BY id_b
ORDER BY vec_id"""


# Planted-neighbor recall harness for the ANN queries: the synthetic
# embeddings have no natural near-dups (max pairwise cosine ~0.51), so for
# each probe vector we plant three deterministic perturbed copies at
# increasing distance.  Cosines land ~0.9996+, far above any natural
# neighbor, so the exact top-3 per query is known in closed form — the ANN
# result is oracle-checkable (a live recall gate: a missed planted copy
# surfaces a ~0.5-cosine natural row instead and the hash diverges).
_PLANT_SCALES = (0.001, 0.004, 0.012)

# 16 hyperplanes = 65536 buckets/table: with 6 tables and Hamming-2
# multiprobe, a tau=0.999 pair (theta 0.045 rad; expected differing planes
# 16*theta/pi ~ 0.23/table) misses a table only when >2 planes flip —
# P ~ 1.6e-3/table, ~1e-17 across 6 tables — while the candidate set drops
# from ~37/256 of the corpus per table (8 planes: ~87% overall, near brute
# force) to ~137/65536 (~1% overall).  The planted-truth oracles hash-check
# recall end-to-end, so the margin is verified, not assumed.
_LSH_PLANES = 16


def _planted_corpus(embs: DataFrame) -> DataFrame:
    out = embs
    for m, s in enumerate(_PLANT_SCALES, start=1):
        perturbed = F.expr(
            "transform(embedding, (x, i) -> "
            f"x * cast(1.0 + {s} * ((i % 7) - 3) as float))"
        )
        out = out.unionByName(
            embs.where("vec_id < 20").select(
                (F.col("vec_id") + 1000000 * m).alias("vec_id"),
                perturbed.alias("embedding"),
                "label",
            )
        )
    return out


def _ann_oracle() -> str:
    scales = ", ".join(
        f"({m}, {s})" for m, s in enumerate(_PLANT_SCALES, start=1)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20
),
planted AS (
  SELECT b.vec_id AS orig_id, b.vec_id + 1000000 * s.m AS neighbor_id,
         list_transform(range(0, len(b.embedding)),
           i -> CAST(b.embedding[i + 1]
                * CAST(1.0 + s.sc * ((i % 7) - 3) AS REAL) AS REAL)) AS emb_p
  FROM base b CROSS JOIN (VALUES {scales}) s(m, sc)
),
scored AS (
  SELECT b.vec_id AS query_id, p.neighbor_id,
         list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                CAST(p.emb_p AS DOUBLE[])) AS cos_raw
  FROM base b JOIN planted p ON p.orig_id = b.vec_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rnk,
       neighbor_id, round(cos_raw, 6) AS cosine
FROM scored"""


def _np_bytes(arr) -> bytes:
    import io

    import numpy as np

    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _np_from_bytes(blob: bytes):
    import io

    import numpy as np

    return np.load(io.BytesIO(blob))


def _ensure_ann_index(spark: SparkSession, sf_dir: str, method: str):
    """Persisted ANN index over the planted corpus, built once per source
    fingerprint and reused across calls AND sessions (ensure_store): the
    encoded corpus parquet plus — for ivf/pq — the trained model as a
    ``_model.npy`` sidecar committed atomically with it, so a search always
    decodes with exactly the model that encoded the store.  This is the
    FAISS build/search lifecycle: train + encode once, amortize over every
    query batch; per-call work is only the (tiny) query-side signatures and
    the bucketed candidate join.  Returns (encoded DataFrame, model|None,
    params dict from the _params.json sidecar — the adaptive
    n_centroids/n_planes the store was built with)."""
    import json as _json

    from summarydb_spark.sources.tables import ensure_store, store_sidecar

    def build(spark):
        embs = _embs(spark, sf_dir)
        corpus = _planted_corpus(embs)
        # adaptive index sizing from the corpus count (one job, build
        # time only — the count never runs on the per-query read path;
        # the derived values persist in the _params.json sidecar so
        # query-side signatures/probes always match THIS store even if
        # the derivation formula changes later)
        n = corpus.count()
        if method == "ivf":
            nlist = similarity.adaptive_ivf_centroids(n)
            cent = similarity.train_ivf_centroids(embs, n_centroids=nlist)
            return similarity.ivf_encode(corpus, cent), {
                "_model.npy": _np_bytes(cent),
                "_params.json": _json.dumps(
                    {"n": n, "n_centroids": nlist}
                ).encode(),
            }
        if method == "pq":
            books = similarity.train_pq_codebooks(embs, m=4, k=32)
            return similarity.pq_encode(corpus, books), {"_model.npy": _np_bytes(books)}
        if method == "ivfpq":
            nlist = similarity.adaptive_ivf_centroids(n)
            cent = similarity.train_ivf_centroids(embs, n_centroids=nlist)
            enc, books = similarity.ivfpq_encode(spark, corpus, cent, m=4, k=32)
            return enc, {
                "_model.npy": _np_bytes(cent),
                "_books.npy": _np_bytes(books),
                "_params.json": _json.dumps(
                    {"n": n, "n_centroids": nlist}
                ).encode(),
            }
        planes = similarity.adaptive_lsh_planes(n)
        enc = similarity.lsh_encode(
            corpus, dim=64, n_planes=planes, n_tables=6, seed=42
        )
        return enc, {
            "_params.json": _json.dumps({"n": n, "n_planes": planes}).encode()
        }

    path = ensure_store(spark, sf_dir, f"ann_{method}_adaptive_index", build)
    if method in ("ivf", "pq"):
        model = _np_from_bytes(store_sidecar(path, "_model.npy"))
    elif method == "ivfpq":
        model = (
            _np_from_bytes(store_sidecar(path, "_model.npy")),
            _np_from_bytes(store_sidecar(path, "_books.npy")),
        )
    else:
        model = None
    try:
        params = _json.loads(store_sidecar(path, "_params.json"))
    except FileNotFoundError:
        params = {}
    return spark.read.parquet(path), model, params


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors for 20 probe vectors via multi-table
    hyperplane LSH over the planted-neighbor corpus.  The oracle knows the
    exact expected top-3 (the planted copies), so this checks recall, rank
    order, and cosine values end-to-end.  The signed corpus is a persisted
    index (_ensure_ann_index) — per-call work is query-side only."""
    encoded, _, params = _ensure_ann_index(spark, sf_dir, "lsh")
    queries = _emb_probes(spark, sf_dir)
    out = similarity.lsh_topk(
        None, queries, k=3, n_planes=params["n_planes"], n_tables=6,
        probe_hamming=2, encoded=encoded,
    )
    return out.select(
        "query_id", "rnk", "neighbor_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rnk")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (coarse-quantizer) approximate top-3 for 20 probe vectors over
    the planted-neighbor corpus; same closed-form oracle as the LSH twin.
    The quantizer is trained on the ORIGINAL embeddings and the assigned
    corpus persisted with it (build/search split — the production IVF
    lifecycle); searches read the inverted file and probe 4 of the
    adaptive nlist = ceil(sqrt(corpus)) lists (the sidecar records the
    trained count), so candidate volume per query is ~4*sqrt(n)."""
    encoded, cent, _params = _ensure_ann_index(spark, sf_dir, "ivf")
    queries = _emb_probes(spark, sf_dir)
    out = similarity.ivf_topk(
        None, queries, k=3, n_probe=4, centroids=cent, encoded=encoded
    )
    return out.select(
        "query_id", "rnk", "neighbor_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rnk")


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-3 (ADC scoring + exact
    re-ranking, the FAISS IVFADC shape) for 20 probe vectors over the
    planted-neighbor corpus; same closed-form oracle as the LSH/IVF twins.
    Codebooks are trained on the ORIGINAL embeddings and the encoded corpus
    persisted with them (build/search split); the exact re-rank stage
    makes the emitted cosines exact, so the oracle checks recall, rank
    order, and values — a planted copy pushed out of the ADC top-rerank
    would surface a ~0.5-cosine natural row and the hash diverges."""
    encoded, books, _params = _ensure_ann_index(spark, sf_dir, "pq")
    queries = _emb_probes(spark, sf_dir)
    out = similarity.pq_topk(
        None, queries, books, k=3, rerank=32, encoded=encoded
    )
    return out.select(
        "query_id", "rnk", "neighbor_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rnk")


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — the canonical billion-vector index (FAISS IVF+PQ): coarse
    quantizer restricts each probe to 4 of the adaptive sqrt(n) lists, PQ
    codes quantize the RESIDUAL (x - centroid) to m=4 bytes-ish ids, ADC
    scores candidates with q.c_list + m LUT lookups (pure JVM), and the
    ADC top-32 re-rank exactly — same closed-form planted oracle as the
    IVF/PQ singles, so recall, rank order, AND values are hash-checked.
    Index is persisted (build/search split); per-call work is the 20
    query signatures + the probed-list candidate join."""
    encoded, model, _params = _ensure_ann_index(spark, sf_dir, "ivfpq")
    cent, books = model
    queries = _emb_probes(spark, sf_dir)
    out = similarity.ivfpq_topk(
        queries, cent, books, encoded, k=3, n_probe=4, rerank=32
    )
    return out.select(
        "query_id", "rnk", "neighbor_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "rnk")


def q_ann_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: every corpus vector with cosine >=
    0.999 of each of the 20 probes, via the SAME persisted multi-table LSH
    index the top-k query reads — range semantics (variable-size result
    sets: all three planted copies qualify) instead of a fixed k.  The
    oracle is the planted closed form filtered to the radius, so recall,
    membership, and cosine values are all hash-checked."""
    encoded, _, params = _ensure_ann_index(spark, sf_dir, "lsh")
    queries = _emb_probes(spark, sf_dir)
    out = similarity.lsh_radius(
        None, queries, tau=0.999, n_planes=params["n_planes"], n_tables=6,
        probe_hamming=2,
        encoded=encoded,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine")
    ).orderBy("query_id", "neighbor_id")


def _ann_radius_oracle(tau: float = 0.999) -> str:
    scales = ", ".join(
        f"({m}, {s})" for m, s in enumerate(_PLANT_SCALES, start=1)
    )
    return f"""
WITH base AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20
),
planted AS (
  SELECT b.vec_id AS orig_id, b.vec_id + 1000000 * s.m AS neighbor_id,
         list_transform(range(0, len(b.embedding)),
           i -> CAST(b.embedding[i + 1]
                * CAST(1.0 + s.sc * ((i % 7) - 3) AS REAL) AS REAL)) AS emb_p
  FROM base b CROSS JOIN (VALUES {scales}) s(m, sc)
),
scored AS (
  SELECT b.vec_id AS query_id, p.neighbor_id,
         list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                CAST(p.emb_p AS DOUBLE[])) AS cos_raw
  FROM base b JOIN planted p ON p.orig_id = b.vec_id
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine
FROM scored WHERE cos_raw >= {tau}
ORDER BY query_id, neighbor_id"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup probe: near-dup pairs between an ARRIVING batch
    (doc_id % 7 = 0, signed fresh at call time) and the EXISTING corpus
    signature store (everything else, read from the persisted
    dedup_minhash_sigs store; never re-signed) — the per-ingest path of a
    production dedup service.  True Jaccard >= 0.8 with exact verify, so
    the oracle is the exact asymmetric all-pairs Jaccard and the query is
    a live recall gate on the banded probe, exactly like
    ``dedup_minhash_lsh``."""
    from summarydb_spark.sources.tables import ensure_store

    def build(s):
        sigs = dedup.minhash_signatures(
            _docs(s, sf_dir), "text", num_hashes=64, shingle_k=3, seed=42
        ).select(
            F.col("doc_id").alias("_id"),
            "_shingles",
            "minhash",
            dedup._content_digest(F.col("_shingles")).alias("_ck"),
        )
        return sigs, None

    path = ensure_store(spark, sf_dir, "dedup_minhash_sigs", build, coalesce=0)
    corpus_sigs = spark.read.parquet(path).where("_id % 7 != 0")
    batch_sigs = dedup.minhash_signatures(
        _docs(spark, sf_dir).where("doc_id % 7 = 0"),
        "text", num_hashes=64, shingle_k=3, seed=42,
    ).select(F.col("doc_id").alias("_id"), "_shingles", "minhash")
    out = dedup.minhash_lsh_join(
        batch_sigs, corpus_sigs, num_hashes=64, bands=16, threshold=0.8
    )
    return out.select(
        "batch_id", "corpus_id", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("batch_id", "corpus_id")


# Exact asymmetric Jaccard >= 0.8 between the batch slice and the rest of
# the corpus; same shingle construction and shared-shingle blocking as
# ORACLE_DEDUP_MINHASH.
ORACLE_DEDUP_INCREMENTAL = r"""
WITH docs AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3 THEN
      list_distinct(list_transform(range(1, len(toks)-1),
        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
    ELSE [array_to_string(toks, ' ')] END AS shl
  FROM docs
),
ex AS (SELECT doc_id, len(shl) AS n, unnest(shl) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS batch_id, b.doc_id AS corpus_id,
         a.n AS na, b.n AS nb, count(*) AS c
  FROM ex a JOIN ex b
    ON a.s = b.s AND a.doc_id % 7 = 0 AND b.doc_id % 7 != 0
  GROUP BY 1,2,3,4
)
SELECT batch_id, corpus_id, round(c::DOUBLE / (na + nb - c), 6) AS jaccard
FROM inter
WHERE c::DOUBLE / (na + nb - c) >= 0.8
ORDER BY batch_id, corpus_id"""


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata (size, container sniff, chunk accounting)
    over deterministic fake media payloads derived from documents.  The
    DuckDB oracle reproduces the byte arithmetic on encode(text)."""
    from summarydb_spark.functions import multimodal

    media = multimodal.fake_media_from_text(_docs(spark, sf_dir))
    return multimodal.media_metadata(media).select(
        "doc_id", "n_bytes", "format", "n_chunks"
    )


ORACLE_MEDIA_META = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) + CASE WHEN doc_id % 7 = 0 THEN 8 ELSE 0 END AS n_bytes,
         CASE WHEN doc_id % 7 = 0 THEN 'png' ELSE 'unknown' END AS format
  FROM documents
)
SELECT doc_id, n_bytes, format,
       CAST(ceil(n_bytes / 256.0) AS BIGINT) AS n_chunks
FROM m"""


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling accounting: per payload, frame count and summed frame
    bytes (offset arithmetic reproduced exactly by the oracle)."""
    from summarydb_spark.functions import multimodal

    media = multimodal.fake_media_from_text(_docs(spark, sf_dir))
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame")).alias("frame_bytes_total"),
    )


ORACLE_MEDIA_FRAMES = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) + CASE WHEN doc_id % 7 = 0 THEN 8 ELSE 0 END AS n
  FROM documents
),
fr AS (
  SELECT doc_id, n, i,
         CAST(floor(i * greatest(n - 64, 0) / 3.0) AS BIGINT) AS off
  FROM m CROSS JOIN (SELECT range AS i FROM range(4)) idx
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(least(64, n - off)) AS BIGINT) AS frame_bytes_total
FROM fr GROUP BY doc_id"""


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 16x16 resize over fake media payloads (Arrow-batched
    mapInPandas).  The oracle replays the shape arithmetic (raster dims,
    output byte count); the resized byte values themselves are unit-tested
    against a numpy reference in tests/test_multimodal.py."""
    from summarydb_spark.functions import multimodal

    media = multimodal.fake_media_from_text(_docs(spark, sf_dir))
    out = multimodal.resize_image(media, out_h=16, out_w=16)
    return out.select("doc_id", "in_bytes", "in_h", "in_w", "out_bytes")


ORACLE_MEDIA_RESIZE = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) + CASE WHEN doc_id % 7 = 0 THEN 8 ELSE 0 END AS in_bytes
  FROM documents
)
SELECT doc_id, in_bytes,
       CAST(floor(sqrt(in_bytes)) AS BIGINT) AS in_h,
       CAST(floor(sqrt(in_bytes)) AS BIGINT) AS in_w,
       CASE WHEN in_bytes > 0 THEN 256 ELSE 0 END AS out_bytes
FROM m"""


def q_media_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-histogram featurization (mapInPandas path).
    The oracle replays the exposed bins per byte (ord-explode, the audio
    oracle's trick), so the Arrow featurization is value-checked."""
    from summarydb_spark.functions import multimodal

    media = multimodal.fake_media_from_text(_docs(spark, sf_dir))
    feats = multimodal.byte_histogram_features(media, bins=16)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 6).alias("bin0"),
        F.round(F.element_at("features", 8), 6).alias("bin7"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, v: a + v), 6
        ).alias("mass"),
    ).orderBy("doc_id")


# Per-byte replay: the fake payload is encode(text) (+ the 8-byte PNG
# magic for doc_id % 7 == 0), so DuckDB can count bytes per 16-wide bin
# with ord(substring(...)) over an index range — bin0 = [0,16), bin7 =
# [112,128).  mass = sum over bins of h_i/n; both engines compute the same
# float divisions, and round(...,6) absorbs summation-order ulps.
ORACLE_MEDIA_HISTOGRAM = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB || encode(text)
              ELSE encode(text) END AS data
  FROM documents
),
sized AS (
  SELECT doc_id, hex(data) AS hx, octet_length(data) AS n FROM m
),
b AS (
  -- byte i of a BLOB via its hex string (BLOBs aren't sliceable in
  -- DuckDB): two hex chars -> '0x..'::INT
  SELECT doc_id, n,
         ('0x' || substring(hx, CAST(2 * i + 1 AS INTEGER), 2))::INTEGER // 16 AS bin
  FROM sized, LATERAL (SELECT unnest(range(n)) AS i) ix
),
h AS (
  SELECT doc_id, n,
         count(*) FILTER (bin = 0) AS c0,
         count(*) FILTER (bin = 7) AS c7
  FROM b GROUP BY doc_id, n
)
SELECT s.doc_id, s.n AS n_bytes,
       round(coalesce(h.c0, 0) / greatest(s.n, 1), 6) AS bin0,
       round(coalesce(h.c7, 0) / greatest(s.n, 1), 6) AS bin7,
       CASE WHEN s.n > 0 THEN 1.0 ELSE 0.0 END AS mass
FROM sized s LEFT JOIN h ON h.doc_id = s.doc_id"""


def q_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window`` (1h gap) over the events stream —
    the engine-level session operator (works identically under Structured
    Streaming with a watermark).  The oracle replays the same sessions with
    the portable lag + running-sum formulation, proving the built-in agrees
    with the first-principles SQL definition."""
    from summarydb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # TIMESTAMP_NTZ micros -> epoch micros (UTC session tz)
        F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
        F.col("ts").cast("timestamp_ltz").alias("tstamp"),
    )
    out = ev.groupBy("user_id", F.session_window("tstamp", "1 hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("t_start"),
        F.max("t").alias("t_end"),
    )
    return out.select("user_id", "n_events", "t_start", "t_end")


def q_streaming_sessionize_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming twin of session_window_builtin: the SAME 1h
    gap sessions, computed by a real ``readStream`` over the events
    parquet with an availableNow trigger and a memory sink — so the
    correctness gate exercises the streaming engine itself, not just the
    batch plan the streaming path shares.  One micro-batch processes the
    whole source (availableNow), complete output mode (no watermark
    needed; the state store holds one row per open session, O(active
    sessions) exactly as in a live deployment).  Session merging is
    order-independent, so the result is deterministic and the batch
    lag+running-sum oracle (ORACLE_SESSION_WINDOW) verifies it
    value-for-value."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the testdata table is a single file; FileStreamSource needs a
    # directory-rooted source, so address it through a glob (basePath
    # resolves to the parent directory)
    glob = os.path.join(sf_dir, "events.[p]arquet")
    stream = (
        spark.readStream.schema(schema)
        .parquet(glob)
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ltz").alias("tstamp"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
        )
        .groupBy("user_id", F.session_window("tstamp", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("t").alias("t_start"),
            F.max("t").alias("t_end"),
        )
    )
    return _run_stream_to_memory(
        stream,
        "streaming_sessionize_gate_sink",
        spark,
        sources=(path,),
        output_mode="complete",
    ).select("user_id", "n_events", "t_start", "t_end")


def q_streaming_watermark_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation under REAL Structured
    Streaming semantics: daily event counts per type with a 1-hour
    watermark in APPEND output mode — only windows the final watermark
    (max event time - 1h) has closed are emitted; the last open day is
    withheld, exactly as a live deployment would withhold it.  The
    availableNow trigger processes the (single-file) source in one
    micro-batch and then runs the no-data batch that advances the
    watermark and flushes the closed windows, so the memory sink holds
    the deterministic final append set.  The oracle replays the
    watermark predicate in batch SQL: windows with
    end <= max(ts) - 1h.  State is O(open windows), not O(events)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    glob = os.path.join(sf_dir, "events.[p]arquet")
    stream = (
        spark.readStream.schema(schema)
        .parquet(glob)
        .select(
            F.col("ts").cast("timestamp_ltz").alias("tstamp"), "event_type"
        )
        .withWatermark("tstamp", "1 hour")
        .groupBy(F.window("tstamp", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_stream_to_memory(
        stream,
        "streaming_watermark_gate_sink",
        spark,
        sources=(path,),
    ).select(
        F.expr("unix_micros(w.start)").alias("w_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )


_MIXED_N = 512  # events fed to the mixed-policy gate (256 per stream)

# memoized source dirs for the summarizer gates: prep is a deterministic
# pure function of (sf_dir, n, ranges) over immutable testdata, so one
# session never rebuilds the same chunk files — only the streaming
# machinery (fresh checkpoint/state/query) re-runs per call
_GATE_SRC_CACHE: dict = {}


def _ordered_event_source(
    spark: SparkSession, sf_dir: str, n: int, ranges
) -> str:
    """Build (once per session) the 2-stream ordered event source the
    summarizer gates stream from: the first ``n`` events (ordered by ts,
    event_id; stream_id = idx%2, values scaled to exact integers) written
    as one parquet file per idx-range with strictly increasing mtimes.
    Returns the source directory path; callers must NOT mutate it."""
    import tempfile

    from summarydb_spark.plans.portable_sql import epoch_us
    from summarydb_spark.sources.tables import register_tables

    from summarydb_spark.sources.tables import _source_fingerprint

    # fingerprint the SOURCE CONTENT, not the path: the harness
    # regenerates the testdata between rounds, and a path-only key would
    # silently stream last round's events against this round's oracle
    # (same hazard the store layer documents at tables._store_path)
    key = (_source_fingerprint(sf_dir), n, tuple(ranges))
    src = _GATE_SRC_CACHE.get(key)
    if src and os.path.isdir(src):
        return src
    register_tables(spark, sf_dir)
    prep = spark.sql(
        f"""
SELECT idx % 2 AS stream_id, idx, t, v
FROM (
  SELECT t, v, row_number() OVER (ORDER BY t, event_id) - 1 AS idx
  FROM (
    SELECT {epoch_us('ts', 'spark')} AS t,
           CAST(round(value * 100) AS DOUBLE) AS v, event_id
    FROM events ORDER BY 1, 3 LIMIT {n}
  )
)"""
    ).cache()
    work = tempfile.mkdtemp(prefix="gate_src_")
    src = os.path.join(work, "src")
    _write_ordered_chunks(prep, src, ranges)
    prep.unpersist()
    _GATE_SRC_CACHE[key] = src
    return src


def _write_ordered_chunks(prep: DataFrame, src: str, ranges) -> None:
    """Write each idx-range of ``prep`` as one parquet file under
    ``src`` with STRICTLY INCREASING mtimes.  FileStreamSource orders
    micro-batches by modification time with an arbitrary (path)
    tie-break; back-to-back writes can tie on coarse mtime granularity,
    and a reversed batch order would misassign per-stream indices
    against the running-count state — so each batch's data files are
    bumped one second past the previous batch's newest."""
    prev_mtime = 0.0
    for lo, hi in ranges:
        before = set(os.listdir(src)) if os.path.isdir(src) else set()
        prep.where(
            (F.col("idx") >= lo) & (F.col("idx") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
        batch_mtime = prev_mtime + 1.0
        for name in set(os.listdir(src)) - before:
            if name.endswith(".parquet"):
                p = os.path.join(src, name)
                batch_mtime = max(batch_mtime, os.path.getmtime(p))
                if os.path.getmtime(p) <= prev_mtime:
                    os.utime(p, (prev_mtime + 1.0, prev_mtime + 1.0))
                    batch_mtime = max(batch_mtime, prev_mtime + 1.0)
        prev_mtime = batch_mtime


# per-(prefix) work dirs issued by _gate_workdir, reclaimed on the NEXT
# call with the same prefix and at interpreter exit — the returned gate
# DataFrame reads the state dir lazily, so the dir must outlive the
# caller's action and cannot be deleted inside the gate itself
_GATE_WORKDIRS: dict = {}


def _gate_workdir(prefix: str) -> str:
    """Per-run state+checkpoint dir for the summarizer gates, on tmpfs
    where available: both die with the query, and the checkpoint WAL
    fsyncs per micro-batch (streaming/state.ephemeral_checkpoint_base
    rationale).  The PREVIOUS run's dir for the same gate is reclaimed
    here (its lazy readers are gone by the time the gate re-runs), and
    an atexit hook sweeps whatever the process end leaves behind —
    tmpfs is RAM, so unlike the old /tmp mkdtemp the dirs must not
    accumulate."""
    import atexit
    import shutil
    import tempfile

    from summarydb_spark.streaming.state import ephemeral_checkpoint_base

    old = _GATE_WORKDIRS.pop(prefix, None)
    if old:
        shutil.rmtree(old, ignore_errors=True)
    base = ephemeral_checkpoint_base()
    os.makedirs(base, exist_ok=True)
    work = tempfile.mkdtemp(prefix=prefix, dir=base)
    if not _GATE_WORKDIRS:
        atexit.register(
            lambda: [
                shutil.rmtree(d, ignore_errors=True)
                for d in _GATE_WORKDIRS.values()
            ]
        )
    _GATE_WORKDIRS[prefix] = work
    return work


def q_streaming_mixed_policy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO windowing policies in ONE Structured-Streaming summarizer job:
    the first 512 events (ordered by ts, event_id) split into stream 0
    (idx%2=0, exp(2) decay) and stream 1 (idx%2=1, power(1,1,10,1)
    decay), ingested through a single ``StreamingSummarizer`` with a
    per-stream policy map ({stream_id: windowing},
    streaming/ingest.py) over two micro-batches.  The oracle replays
    both policies' canonical count-space boundaries driver-side
    (windowing.canonical_boundaries) and buckets by range join — so a
    hash-match proves the per-stream routing produces exactly each
    policy's canonical windows, not a blend.

    Values are scaled to integers (round(value*100)) so double sums are
    exact in any merge order — the cross-batch fold is order-insensitive
    bit-for-bit.  The reference fixes policy per stream at creation
    (core/db.go:61-80) but runs one pipeline per DB; this is that
    semantics with one streaming job for the whole mixed-policy DB."""
    import tempfile

    from summarydb_spark.streaming.ingest import StreamingSummarizer
    from summarydb_spark.windowing import ExpWindowing, PowerWindowing

    # two uneven micro-batches: enough to exercise merge-into-existing
    # per-policy state (the 3+-batch path is pinned by
    # tests/test_streaming.py) while keeping the gate's fixed cost down
    src = _ordered_event_source(
        spark, sf_dir, _MIXED_N, ((0, 192), (192, _MIXED_N))
    )
    work = _gate_workdir("mixed_policy_gate_")
    source = (
        spark.readStream.schema("stream_id long, idx long, t long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    summ = StreamingSummarizer(
        spark,
        {0: ExpWindowing(2.0), 1: PowerWindowing(1, 1, 10, 1)},
        os.path.join(work, "state"),
        ts_col="t",
        value_col="v",
        order_cols=("idx",),
    )
    from summarydb_spark.streaming.state import (
        scoped_shuffle_partitions,
        stream_shuffle_partitions,
    )

    # stream-sized partitions (scale-adaptive, streaming/state.py): the
    # per-micro-batch fold aggregations and snapshot files at the session
    # default (32) are pure fixed cost for a 512-event stream
    with scoped_shuffle_partitions(
        spark, stream_shuffle_partitions(spark, src)
    ):
        q = summ.start(source, os.path.join(work, "cp"), available_now=True)
        q.awaitTermination()
    return summ.summary().select(
        "stream_id",
        F.col("window_id").cast("long").alias("window_id"),
        F.col("count_start").cast("long").alias("count_start"),
        F.col("count_end").cast("long").alias("count_end"),
        F.col("time_start").cast("long").alias("time_start"),
        F.col("time_end").cast("long").alias("time_end"),
        F.col("count").cast("long").alias("cnt"),
        F.col("sum").cast("long").alias("sum_v"),
        F.col("max").cast("long").alias("max_v"),
        F.col("min").cast("long").alias("min_v"),
    )


def _oracle_mixed_policy() -> str:
    from summarydb_spark.windowing import (
        ExpWindowing,
        PowerWindowing,
        canonical_boundaries,
    )

    half = _MIXED_N // 2
    rows = []
    for sid, pol in ((0, ExpWindowing(2.0)), (1, PowerWindowing(1, 1, 10, 1))):
        bnd = canonical_boundaries(pol, half)
        rows += [
            f"({sid},{bnd[k]},{bnd[k]},{bnd[k + 1]})"
            for k in range(len(bnd) - 1)
        ]
    vals = ",".join(rows)
    return f"""
WITH pre AS (
  SELECT epoch_us(ts) AS t, CAST(round(value * 100) AS DOUBLE) AS v, event_id
  FROM events ORDER BY 1, 3 LIMIT {_MIXED_N}
),
ev AS (
  SELECT t, v, row_number() OVER (ORDER BY t, event_id) - 1 AS idx FROM pre
),
sev AS (SELECT t, v, idx % 2 AS stream_id, idx // 2 AS sidx FROM ev),
bnd AS (SELECT * FROM (VALUES {vals}) AS x(stream_id, window_id, lo, hi)),
b AS (
  SELECT bnd.stream_id, bnd.window_id, sev.t, sev.v, sev.sidx
  FROM sev JOIN bnd
    ON sev.stream_id = bnd.stream_id
   AND sev.sidx >= bnd.lo AND sev.sidx < bnd.hi
)
SELECT stream_id,
       CAST(window_id AS BIGINT) AS window_id,
       CAST(min(sidx) AS BIGINT) AS count_start,
       CAST(max(sidx) AS BIGINT) AS count_end,
       min(t) AS time_start,
       max(t) AS time_end,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(max(v) AS BIGINT) AS max_v,
       CAST(min(v) AS BIGINT) AS min_v
FROM b GROUP BY stream_id, window_id"""


_RESTART_N = 384


def q_streaming_restart_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KILL + checkpoint-restart mid-stream, then state equality: the
    first 384 events split into 2 streams ingest through a
    ``StreamingSummarizer`` (exp(2) decay) from a 2-file source; the
    crash is planted in the TIGHTEST recovery window: batch 0 is folded
    and its state version committed, but the source offsets are NOT
    (the checkpoint is fresh) — exactly the crash between state write
    and offset commit.  The restarted streaming query re-delivers batch
    0, which the _COMMIT marker must skip idempotently, then drains the
    remaining file.  The oracle replays the canonical count-space
    boundaries in batch SQL, so a hash-match proves the post-restart
    state equals the batch rebuild over ALL events — the reference's
    WAL-replay recovery contract (core/pipeline.go:294-335); a
    double-fold (marker ignored) or a skip-without-fold both change the
    sums and fail the hash.  The kill-while-actually-running variant
    (stop() racing an in-flight rate-source micro-batch) is pinned by
    tests/test_streaming.py::test_rate_source_soak_kill_restart; this
    gate keeps the per-round cost to ONE streaming query startup."""
    import tempfile

    from summarydb_spark.streaming.ingest import StreamingSummarizer
    from summarydb_spark.windowing import ExpWindowing

    src = _ordered_event_source(
        spark, sf_dir, _RESTART_N, ((0, 128), (128, _RESTART_N))
    )
    # same tmpfs-backed per-run dir as the mixed-policy gate; the
    # kill+restart sequence is contained in this one call, so nothing
    # here weakens the recovery semantics under test (the _COMMIT
    # marker protocol is filesystem-agnostic)
    work = _gate_workdir("restart_gate_")

    def mk_summ() -> StreamingSummarizer:
        return StreamingSummarizer(
            spark,
            ExpWindowing(2.0),
            os.path.join(work, "state"),
            ts_col="t",
            value_col="v",
            order_cols=("idx",),
        )

    from summarydb_spark.streaming.state import (
        scoped_shuffle_partitions,
        stream_shuffle_partitions,
    )

    # the whole kill+restart sequence runs at the stream-sized partition
    # count (scale-adaptive, streaming/state.py) — the summarizer's
    # per-micro-batch fold aggregations and snapshot files at the
    # session default (32) are pure fixed cost for a 384-event stream
    with scoped_shuffle_partitions(
        spark, stream_shuffle_partitions(spark, src)
    ):
        # phase 1 (the planted crash): fold batch 0 — the first file's
        # rows, exactly what the streaming query's batch 0 will
        # re-deliver — and commit its state version, but leave NO
        # checkpoint offsets behind
        summ = mk_summ()
        summ.process_batch(
            spark.read.schema("stream_id long, idx long, t long, v double")
            .parquet(src)
            .where(F.col("idx") < 128),
            0,
        )

        # phase 2 (the restart): fresh summarizer, FRESH checkpoint ->
        # batch 0 replays the already-folded file (one file per trigger,
        # mtime order) and must be skipped by the _COMMIT marker; batch 1
        # drains the rest
        summ2 = mk_summ()
        q2 = summ2.start(
            spark.readStream.schema(
                "stream_id long, idx long, t long, v double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            os.path.join(work, "cp"),
            available_now=True,
        )
        q2.awaitTermination()
    return summ2.summary().select(
        "stream_id",
        F.col("window_id").cast("long").alias("window_id"),
        F.col("count_start").cast("long").alias("count_start"),
        F.col("count_end").cast("long").alias("count_end"),
        F.col("time_start").cast("long").alias("time_start"),
        F.col("time_end").cast("long").alias("time_end"),
        F.col("count").cast("long").alias("cnt"),
        F.col("sum").cast("long").alias("sum_v"),
        F.col("max").cast("long").alias("max_v"),
        F.col("min").cast("long").alias("min_v"),
    )


def _oracle_restart_gate() -> str:
    from summarydb_spark.windowing import ExpWindowing, canonical_boundaries

    half = _RESTART_N // 2
    rows = []
    for sid in (0, 1):
        bnd = canonical_boundaries(ExpWindowing(2.0), half)
        rows += [
            f"({sid},{bnd[k]},{bnd[k]},{bnd[k + 1]})"
            for k in range(len(bnd) - 1)
        ]
    vals = ",".join(rows)
    return f"""
WITH pre AS (
  SELECT epoch_us(ts) AS t, CAST(round(value * 100) AS DOUBLE) AS v, event_id
  FROM events ORDER BY 1, 3 LIMIT {_RESTART_N}
),
ev AS (
  SELECT t, v, row_number() OVER (ORDER BY t, event_id) - 1 AS idx FROM pre
),
sev AS (SELECT t, v, idx % 2 AS stream_id, idx // 2 AS sidx FROM ev),
bnd AS (SELECT * FROM (VALUES {vals}) AS x(stream_id, window_id, lo, hi)),
b AS (
  SELECT bnd.stream_id, bnd.window_id, sev.t, sev.v, sev.sidx
  FROM sev JOIN bnd
    ON sev.stream_id = bnd.stream_id
   AND sev.sidx >= bnd.lo AND sev.sidx < bnd.hi
)
SELECT stream_id,
       CAST(window_id AS BIGINT) AS window_id,
       CAST(min(sidx) AS BIGINT) AS count_start,
       CAST(max(sidx) AS BIGINT) AS count_end,
       min(t) AS time_start,
       max(t) AS time_end,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(sum(v) AS BIGINT) AS sum_v,
       CAST(max(v) AS BIGINT) AS max_v,
       CAST(min(v) AS BIGINT) AS min_v
FROM b GROUP BY stream_id, window_id"""


def q_streaming_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup state: the same events source is read
    by TWO stream readers and unioned — every event arrives twice — then
    ``dropDuplicates("event_id")`` reduces it back before a per-type
    aggregate.  The memory-sink result must equal the plain batch counts
    (the oracle), proving the dedup state admits each key exactly once
    across duplicate deliveries — the at-least-once -> exactly-once
    repair every real ingest pipeline needs.  State is O(distinct keys)
    (bounded here; production bounds it with
    dropDuplicatesWithinWatermark)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema

    def src(glob: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(glob)
            .select("event_id", "event_type")
        )

    # two distinct globs of the same file = duplicate delivery
    stream = (
        src(os.path.join(sf_dir, "events.[p]arquet"))
        .unionByName(src(os.path.join(sf_dir, "events.[pq]arquet")))
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_stream_to_memory(
        stream,
        "streaming_dedup_gate_sink",
        spark,
        sources=(path, path),
        output_mode="complete",
    ).select("event_type", F.col("n").cast("long").alias("n"))


def q_streaming_dedup_wm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BOUNDED-STATE production variant of streaming_dedup_gate:
    ``dropDuplicatesWithinWatermark`` keeps a key's dedup state only
    until the watermark passes (event_time + delay), so state is
    O(keys within the horizon) instead of O(all keys ever) — the API a
    real at-least-once ingest runs forever.  Duplicate delivery is the
    same two-readers-union construction; the delay is sized to cover
    the corpus's full event-time span (744 h > the 31-day synthetic
    range), so no duplicate's state can expire between its deliveries
    regardless of micro-batch split and the result provably equals the
    batch relation (production sizes the delay to the max duplicate
    lag instead — that is the entire point of the bounded variant).
    Same oracle as the unbounded gate."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema

    def src(glob: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(glob)
            .select(
                "event_id",
                "event_type",
                F.col("ts").cast("timestamp_ltz").alias("tstamp"),
            )
        )

    stream = (
        src(os.path.join(sf_dir, "events.[p]arquet"))
        .unionByName(src(os.path.join(sf_dir, "events.[pq]arquet")))
        .withWatermark("tstamp", "744 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_stream_to_memory(
        stream,
        "streaming_dedup_wm_gate_sink",
        spark,
        sources=(path, path),
        output_mode="complete",
        # COMPLETE-mode aggregate: the no-data batch rewrites the sink
        # with the identical result (it exists to evict dedup state the
        # terminating query discards) — sink provably unchanged
        no_data_batch=False,
    ).select("event_type", F.col("n").cast("long").alias("n"))


ORACLE_STREAMING_DEDUP = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY event_type"""


ORACLE_STREAMING_WATERMARK = """
WITH e AS (SELECT epoch_us(ts) AS t, event_type FROM events),
-- Spark tracks event-time stats (and hence the watermark) at MILLISECOND
-- granularity, so floor max(ts) to ms before subtracting the 1h delay;
-- comparing at raw microsecond precision could withhold/emit a window
-- differently when max(ts) has nonzero sub-ms micros.
mx AS (SELECT CAST(floor(max(t) / 1000.0) AS BIGINT) * 1000 AS mt FROM e),
d AS (
  SELECT CAST(floor(t / 86400000000.0) AS BIGINT) AS day, event_type FROM e
)
SELECT d.day * 86400000000 AS w_start_us, d.event_type,
       CAST(count(*) AS BIGINT) AS n
FROM d, mx
WHERE (d.day + 1) * 86400000000 <= mx.mt - 3600000000
GROUP BY d.day, d.event_type"""


ORACLE_SESSION_WINDOW = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
d AS (
  SELECT user_id, t, event_id,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 3600000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, t,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM d
)
SELECT user_id, count(*) AS n_events, min(t) AS t_start, max(t) AS t_end
FROM s GROUP BY user_id, sid"""


def q_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality featurization: framed RMS energy + zero-crossing
    counts over binary PCM payloads (Arrow-batched mapInPandas).  The
    integer features are exact, so the DuckDB oracle replays the per-byte
    arithmetic bit-for-bit; the float RMS derivations happen in column
    math on both sides."""
    from summarydb_spark.functions import multimodal

    docs = _docs(spark, sf_dir)
    pcm = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("data"))
    feats = multimodal.audio_frame_features(pcm, frame_len=32)
    has = F.col("n_frames") > 0
    return feats.select(
        "doc_id",
        "n_samples",
        "n_frames",
        "total_ss",
        "total_zc",
        F.when(has, F.round(F.sqrt(F.col("max_frame_ss") / 32.0), 6)).alias(
            "max_rms"
        ),
        F.when(
            has,
            F.round(F.sqrt(F.col("total_ss") / (F.col("n_frames") * 32.0)), 6),
        ).alias("rms_overall"),
    )


ORACLE_AUDIO_FRAMES = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n, length(text) // 32 AS nf
  FROM documents
),
s AS (SELECT doc_id, nf, text, unnest(range(n)) AS i FROM d),
b AS (
  SELECT doc_id, (i // 32) AS f,
         ord(substring(text, CAST(i + 1 AS INTEGER), 1)) - 128 AS x,
         CASE WHEN (i % 32) < 31
              THEN ord(substring(text, CAST(i + 2 AS INTEGER), 1)) - 128 END AS y
  FROM s WHERE i < nf * 32
),
fr AS (
  SELECT doc_id, f, CAST(sum(x * x) AS BIGINT) AS ss,
         count(*) FILTER (x * y < 0) AS zc
  FROM b GROUP BY doc_id, f
),
agg AS (
  SELECT doc_id, CAST(sum(ss) AS BIGINT) AS total_ss,
         CAST(sum(zc) AS BIGINT) AS total_zc,
         CAST(max(ss) AS BIGINT) AS max_frame_ss
  FROM fr GROUP BY doc_id
),
out AS (
  SELECT d.doc_id, d.n AS n_samples, d.nf AS n_frames,
         coalesce(a.total_ss, 0) AS total_ss,
         coalesce(a.total_zc, 0) AS total_zc,
         a.max_frame_ss
  FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
)
SELECT doc_id, n_samples, n_frames, total_ss, total_zc,
       CASE WHEN n_frames > 0
            THEN round(sqrt(max_frame_ss / 32.0), 6) END AS max_rms,
       CASE WHEN n_frames > 0
            THEN round(sqrt(total_ss / (n_frames * 32.0)), 6) END AS rms_overall
FROM out"""


def q_sketch_range_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched sketch range queries through the uniform query surface
    (operators.sketch_windows.sketch_range_frame): per-(stream, month)
    bloom/CMS/HLL/KLL window sketches over events, then 3 time ranges per
    stream answered for ALL four ops in one broadcast-overlap-join job
    each.

    Output is deterministic/bounded so the oracle can verify it: bloom
    membership at this fill rate has no false positives (= SQL EXISTS over
    the covering span), and the CMS/HLL/KLL answers are asserted against
    their guarantees (overcount bound / 5% relative error / rank error)
    computed from the exact covering-span statistics — a hash match IS a
    verified error bound, as in plans/sketch_queries.py."""
    from summarydb_spark.operators.sketch_windows import (
        CMS_WIDTH,
        sketch_range_frame_multi,
    )
    from summarydb_spark.sources.tables import ensure_sketch_store, load_table

    ev = load_table(spark, sf_dir, "events", widen=True).select(
        F.col("user_id").alias("stream_id"),
        F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
        F.expr(
            "unix_micros(CAST(date_trunc('month', ts) AS TIMESTAMP_LTZ))"
        ).alias("m"),
        "value",
    )
    # fingerprint-keyed persisted sketch store (VERDICT r3 fix): the
    # 4-family sketch build runs once per source dataset; every call —
    # and every range frame within a call — scans the stored windows.
    sk = ensure_sketch_store(spark, sf_dir)

    s = ev.groupBy("stream_id").agg(
        F.min("t").alias("tmin"),
        F.max("t").alias("tmax"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    ).persist()  # a few rows per stream; reused by all four range frames
    # (unpersisted after the eager final materialization below)
    third = F.floor((F.col("tmax") - F.col("tmin")) / 3).cast("long")
    half = F.floor((F.col("tmax") - F.col("tmin")) / 2).cast("long")
    r = (
        s.select(
            "stream_id", F.lit(1).cast("long").alias("qid"),
            F.col("tmin").alias("t0"), (F.col("tmin") + third).alias("t1"),
            F.col("vmin").alias("member"),
        )
        .unionByName(
            s.select(
                "stream_id", F.lit(2).cast("long").alias("qid"),
                (F.col("tmin") + third).alias("t0"), F.col("tmax").alias("t1"),
                F.lit(-1.0).alias("member"),
            )
        )
        .unionByName(
            s.select(
                "stream_id", F.lit(3).cast("long").alias("qid"),
                (F.col("tmin") + half).alias("t0"), F.col("tmax").alias("t1"),
                F.col("vmax").alias("member"),
            )
        )
        # referenced three times (fused frame, covering join, final
        # assembly); persisting the 3xstreams rows keeps each reference a
        # memory scan instead of replicating the union subtree
        .persist()
    )

    # ONE overlap join + ONE aggregation answers all four ops per range
    # (sketch_range_frame_multi); the per-op frames each paid a full
    # join+aggregate plan over the same store
    fused = (
        sketch_range_frame_multi(
            sk, r, ("membership", "frequency", "distinct", "quantile"), q=0.5
        )
        .select(
            "stream_id",
            "qid",
            F.col("membership_value").alias("memb_v"),
            F.col("frequency_value").alias("freq_v"),
            F.col("distinct_value").alias("nd_v"),
            F.col("quantile_value").alias("q50_v"),
        )
        # referenced twice (quantile probe into the exact-stats pass AND
        # the final assembly) — without this the whole overlap-join +
        # 4-op aggregation subtree executes twice (~1s of the query)
        .persist()
    )
    quan = fused.select("stream_id", "qid", "q50_v")

    # exact covering-span statistics (same span the sketches answer over);
    # the per-month brackets ARE the stored window bounds (window_id = the
    # month bucket, time_start/time_end = min/max ts within it) — read them
    # from the store instead of re-aggregating events
    w = sk.select(
        "stream_id",
        F.col("window_id").alias("m"),
        F.col("time_start").alias("ws"),
        F.col("time_end").alias("we"),
    )
    cov = (
        F.broadcast(r)
        .join(
            w.withColumnRenamed("stream_id", "_w_sid"),
            (F.col("stream_id") == F.col("_w_sid"))
            & (F.col("we") >= F.col("t0"))
            & (F.col("ws") <= F.col("t1")),
        )
        .select("stream_id", "qid", "member", "m")
        .join(
            ev.select(
                F.col("stream_id").alias("_e_sid"),
                F.col("m").alias("_e_m"),
                "value",
            ),
            (F.col("stream_id") == F.col("_e_sid"))
            & (F.col("m") == F.col("_e_m")),
        )
        .select("stream_id", "qid", "member", "value")
    )
    # one pass over the covering rows for ALL exact statistics (membership,
    # true count, distinct, quantile rank): joining the (tiny) quantile
    # frame in first lets a single aggregation replace the two separate
    # ones that each re-ran the ranges x windows x events join
    stats = (
        cov.join(F.broadcast(quan), ["stream_id", "qid"])
        .groupBy("stream_id", "qid")
        .agg(
            F.max((F.col("value") == F.col("member")).cast("int")).alias(
                "present_exact"
            ),
            F.sum((F.col("value") == F.col("member")).cast("long")).alias(
                "true_cnt"
            ),
            F.countDistinct("value").alias("nd_exact"),
            F.count(F.lit(1)).alias("n_cov"),
            F.sum((F.col("value") <= F.col("q50_v")).cast("long")).alias(
                "q50_le"
            ),
        )
        .withColumn("q50_rank", F.col("q50_le") / F.col("n_cov"))
        .drop("q50_le")
    )

    # every relation here is O(streams x 3 ranges) — broadcast hash joins,
    # not sort-merge (the aggregated inputs carry no size estimates, so
    # the planner would SMJ without the hint)
    out = (
        r.select("stream_id", "qid")
        .join(F.broadcast(fused), ["stream_id", "qid"])
        .join(F.broadcast(stats), ["stream_id", "qid"])
    )
    bound = F.floor(F.lit(math.e) * F.col("n_cov") / F.lit(float(CMS_WIDTH))) + 1
    final = out.select(
        "stream_id",
        "qid",
        (F.col("memb_v") > 0).alias("present"),
        (
            (F.col("freq_v") >= F.col("true_cnt"))
            & (F.col("freq_v") <= F.col("true_cnt") + bound)
        ).alias("freq_ok"),
        (
            F.abs(F.col("nd_v") - F.col("nd_exact")) / F.col("nd_exact") <= 0.05
        ).alias("nd_ok"),
        (
            F.abs(F.col("q50_rank") - 0.5) <= F.lit(0.05) + F.lit(1.5) / F.col("n_cov")
        ).alias("q50_rank_ok"),
    )
    # The persists above are NOT a per-invocation leak: Spark's
    # CacheManager keys entries by analyzed plan, so every invocation
    # over the same source reuses the same (bounded, KB-scale) entries —
    # verified: two identical persist() calls -> one storage entry.  An
    # explicit release (eager localCheckpoint of the result, or a
    # GC-driven unpersist) measured +0.4-0.8 s per call because it either
    # adds a job + loses AQE or evicts the shared entry mid-suite.
    return final


ORACLE_SKETCH_RANGE_BATCHED = """
WITH e AS (
  SELECT user_id AS stream_id, epoch_us(ts) AS t,
         epoch_us(date_trunc('month', ts)) AS m, value
  FROM events
),
w AS (SELECT stream_id, m, min(t) AS ws, max(t) AS we FROM e GROUP BY 1, 2),
s AS (
  SELECT stream_id, min(t) AS tmin, max(t) AS tmax,
         min(value) AS vmin, max(value) AS vmax
  FROM e GROUP BY 1
),
r AS (
  SELECT stream_id, CAST(1 AS BIGINT) AS qid, tmin AS t0,
         tmin + (tmax - tmin) // 3 AS t1, vmin AS member FROM s
  UNION ALL
  SELECT stream_id, 2, tmin + (tmax - tmin) // 3, tmax, -1.0 FROM s
  UNION ALL
  SELECT stream_id, 3, tmin + (tmax - tmin) // 2, tmax, vmax FROM s
),
cov AS (
  SELECT r.stream_id, r.qid, r.member, e.value
  FROM r
  JOIN w ON w.stream_id = r.stream_id AND w.we >= r.t0 AND w.ws <= r.t1
  JOIN e ON e.stream_id = w.stream_id AND e.m = w.m
)
SELECT stream_id, qid,
       bool_or(value = member) AS present,
       TRUE AS freq_ok, TRUE AS nd_ok, TRUE AS q50_rank_ok
FROM cov GROUP BY stream_id, qid"""


def banded_ngram_pairs(
    spark: SparkSession, sf_dir: str, threshold: float
) -> DataFrame:
    """The exact 3-gram Jaccard >= threshold pair relation, computed by
    banded-LSH candidate generation + exact per-candidate verify
    (functions.dedup.banded_jaccard_pairs) over the SAME blocked-shingle
    relation the exhaustive template joins (llm_sql.ngram_blocks_sql) —
    same blocking, same shingle hashes, same rounding, so the exhaustive
    DuckDB template is the oracle and a hash-match proves zero false
    negatives at the gate scales.

    This is the scale path the exhaustive template's docstring promises:
    measured at sf1 the exhaustive block join verifies 58.8M within-block
    pairs (66.9 s) while the banded generator verifies only colliding
    candidates (~b*j per background pair) — same output bit-for-bit."""
    from summarydb_spark.functions.dedup import banded_jaccard_pairs
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    # persist: the signature pass, the candidate join, and both verify
    # reattach legs all read the blocks relation (CacheManager dedupes by
    # analyzed plan, so repeated calls share one bounded storage entry —
    # the round-5 measured finding at the other builder persist sites)
    blocks = spark.sql(ngram_blocks_sql("spark")).persist()
    return banded_jaccard_pairs(blocks, threshold).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "jaccard",
    )


def _ngram_pairs(spark: SparkSession, sf_dir: str, threshold: float) -> DataFrame:
    """Near-dup pair relation (3-gram Jaccard >= threshold) as a
    fingerprint-keyed persisted store — one materialization per corpus
    snapshot per threshold, shared by every graph consumer.

    Build mode: banded-LSH generation + exact verify (banded_ngram_pairs)
    — the exhaustive block join is quadratic in within-block pairs (66.9 s
    at sf1) while the banded build verifies colliding candidates only.
    Every consumer's oracle recomputes pairs exhaustively from raw text,
    so a banded build that missed a pair could not pass the gate."""
    from summarydb_spark.sources.tables import ensure_store, register_tables

    register_tables(spark, sf_dir)
    name = f"ngram_pairs_banded_t{str(threshold).replace('.', '')}"

    def build(s):
        return banded_ngram_pairs(s, sf_dir, threshold), None

    path = ensure_store(spark, sf_dir, name, build, coalesce=0)
    return spark.read.parquet(path)


def q_dup_graph_degree_stats_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of plans.pipeline_ext.q_dup_graph_degree_stats,
    reading the persisted t=0.2 pair store instead of re-running the
    corpus-wide shingle join per call; the SQL template remains the
    DuckDB oracle (which recomputes pairs from raw documents, so a stale
    store cannot pass the gate)."""
    pairs = _ngram_pairs(spark, sf_dir, 0.2)
    ends = pairs.select(F.col("doc_a").alias("doc_id")).unionByName(
        pairs.select(F.col("doc_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


def _ngram_pairs_t01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-gram Jaccard >= 0.1 near-dup pair relation as a
    fingerprint-keyed persisted store (sources.tables.ensure_store): a
    production dedup service materializes the pair table once per corpus
    snapshot and every graph consumer — clustering, triangle census,
    keeper selection — reads it, instead of re-running the shingle join
    per query.  The oracles still recompute pairs from raw documents, so
    a stale/wrong store cannot silently pass the gate."""
    return _ngram_pairs(spark, sf_dir, 0.1)


def q_dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate clusters via connected components
    (iterative min-label propagation, functions.dedup.connected_components).

    Pair relations are not transitive; keeper selection needs the
    component.  Edges = 3-gram Jaccard pairs at threshold 0.1 (portable:
    Jaccard is hash-invariant, so the oracle's recursive transitive
    closure over its own pair computation reaches identical components).
    Output: (doc_id, component_id=min id, component_size) for clustered
    docs only."""
    pairs = _ngram_pairs_t01(spark, sf_dir)
    comp = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("component_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("component_id"),
        "component_size",
    )


def _oracle_dedup_cluster_cc() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.1)
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS component_id FROM reach GROUP BY n)
SELECT c.doc_id, c.component_id,
       count(*) OVER (PARTITION BY c.component_id) AS component_size
FROM comp c"""


def q_dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-duplicate graph (3-gram Jaccard >= 0.1
    edges — the same relation dedup_cluster_cc clusters): edge/node/wedge
    counts and global transitivity (3*triangles/wedges), the standard
    cohesion diagnostic separating chain-shaped dup clusters (templated
    boilerplate) from clique-shaped ones (true copies).

    Scale shape: edges carry doc_a < doc_b, so each triangle a<b<c is
    enumerated exactly once by the two equi-joins (e1.b=e2.a wedge build,
    then closing-edge probe) — the classic distributed triangle count; at
    100 TB the wedge join is ordered by degree (low-degree endpoint first)
    to bound fan-out, which the a<b orientation approximates here.  The
    pair relation comes from the persisted ngram_pairs_t01 store, so all
    three legs + the degree pass are parquet scans (Spark would otherwise
    re-execute the shingle join per reference)."""
    e = _ngram_pairs_t01(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.coalesce(
            F.sum(F.expr("(deg * (deg - 1)) div 2")), F.lit(0)
        ).cast("long").alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    tri = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .join(
            e.alias("e3"),
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(wedges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles")
                / F.nullif(F.col("n_wedges"), F.lit(0)).cast("double"),
                6,
            ).alias("transitivity"),
        )
    )


def _oracle_dup_graph_triangles() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.1)
    return f"""
WITH pairs AS ({pair_sql}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
deg AS (
  SELECT n, count(*) AS deg FROM (
    SELECT a AS n FROM e UNION ALL SELECT b AS n FROM e
  ) GROUP BY n
),
w AS (
  SELECT CAST(coalesce(sum((deg * (deg - 1)) // 2), 0) AS BIGINT) AS n_wedges,
         count(*) AS n_nodes
  FROM deg
),
t AS (
  SELECT count(*) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
c AS (SELECT count(*) AS n_edges FROM e)
SELECT w.n_nodes, c.n_edges, w.n_wedges, t.n_triangles,
       round(3.0 * t.n_triangles / nullif(w.n_wedges, 0), 6) AS transitivity
FROM c, w, t"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each near-dup cluster (the
    dedup_cluster_cc components), KEEP the longest document (ties to the
    lowest doc_id) and count what gets dropped — the decision step that
    turns a dup graph into an actual training-set edit, where "best" is
    the doc most likely to be the complete original rather than a
    truncated mirror.

    Scale shape: components via min-label propagation (O(diameter)
    rounds), then one window rank per component and a hash aggregate —
    no step materializes a cluster's documents in one task beyond the
    per-component window sort, which is bounded by the largest cluster
    (salt/split oversized clusters at 100 TB)."""
    from pyspark.sql import Window

    pairs = _ngram_pairs_t01(spark, sf_dir)
    comp = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    docs = spark.table("documents").select("doc_id", "n_chars")
    j = comp.join(docs, comp["node"] == docs["doc_id"]).select(
        F.col("component").alias("component_id"), "doc_id", "n_chars"
    )
    rk = F.row_number().over(
        Window.partitionBy("component_id").orderBy(
            F.desc("n_chars"), F.asc("doc_id")
        )
    )
    return (
        j.withColumn("rk", rk)
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id"))).alias("kept_doc"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars"))).alias(
                "kept_chars"
            ),
            (
                F.sum("n_chars")
                - F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
            ).cast("long").alias("dropped_chars"),
        )
    )


def _oracle_dedup_keep_best() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.1)
    return f"""
WITH RECURSIVE pairs AS ({pair_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
nodes AS (SELECT DISTINCT s AS n FROM edges),
reach(n, lbl) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.n
),
comp AS (SELECT n AS doc_id, min(lbl) AS component_id FROM reach GROUP BY n),
j AS (
  SELECT c.component_id, c.doc_id, d.n_chars,
         row_number() OVER (
           PARTITION BY c.component_id
           ORDER BY d.n_chars DESC, c.doc_id
         ) AS rk
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT component_id,
       count(*) AS n_docs,
       max(CASE WHEN rk = 1 THEN doc_id END) AS kept_doc,
       max(CASE WHEN rk = 1 THEN n_chars END) AS kept_chars,
       CAST(sum(n_chars) - max(CASE WHEN rk = 1 THEN n_chars END)
            AS BIGINT) AS dropped_chars
FROM j
GROUP BY component_id"""


#: (applicationId, sf_dir) of the currently-built sdb_bench_qr view —
#: see _q_sql_surface: the ranges input view is rebuilt only when the
#: session or scale directory changes
_SQL_SURFACE_QR_SLOT: dict = {}


def _q_sql_surface(op: str):
    """Approx range queries through the SQL-registered function surface
    (plans/sql_surface.py): ``SELECT ... FROM qr, LATERAL d{op}(...)`` —
    the whole estimator inlines into Catalyst as SQL UDFs, exercising the
    dsum/dcount/dmax ergonomics layer end-to-end.  The oracle recomputes
    the identical semantics inline from raw events (q_approx_range /
    q_approx_minmax_range, DuckDB dialect)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from summarydb_spark.plans.portable_sql import (
            SW_FULL_VIEW,
            _query_ranges,
        )
        from summarydb_spark.plans.sql_surface import (
            register_approx_functions,
        )
        from summarydb_spark.sources.tables import ensure_summary_views

        ensure_summary_views(spark, sf_dir)
        register_approx_functions(
            spark,
            SW_FULL_VIEW,
            count_col="cnt",
            sum_col="sum_v",
            max_col="max_v",
            min_col="min_v",
        )
        # The ranges relation is the caller's input, not part of the work
        # under test — serve it as a cached ~120-row view.  Inlined, the
        # lateral decorrelation replicates the qr subtree (4 scans +
        # aggregates + union) THREE times: once as the outer relation and
        # twice as inner-domain joins; cached, all three copies read the
        # in-memory rows and the optimizer sees a leaf, not a 12-scan tree.
        # Built once per (session, sf_dir) — a repeat call re-parsed and
        # re-cached the identical ~120-row plan (~0.1-0.6 s of driver
        # work and one leaked CacheManager entry per call); the slot
        # rebuilds whenever sf_dir changes, so the cached rows can never
        # go stale (the underlying summary views are themselves keyed on
        # sf_dir by ensure_summary_views).
        from summarydb_spark.sources.tables import _source_fingerprint

        app_sig = (
            spark.sparkContext.applicationId,
            sf_dir,
            _source_fingerprint(sf_dir),
        )
        if _SQL_SURFACE_QR_SLOT.get("sig") != app_sig:
            spark.sql(
                f"""WITH sb AS (
  SELECT stream_id, min(time_start) AS tmin, max(time_end) AS tmax
  FROM {SW_FULL_VIEW} WHERE stream_id % 50 = 0 GROUP BY stream_id
),
{_query_ranges()}
SELECT * FROM qr"""
            ).cache().createOrReplaceTempView("sdb_bench_qr")
            _SQL_SURFACE_QR_SLOT["sig"] = app_sig
        if op in ("count", "sum"):
            select = """
       round(f.value, 6) AS estimate,
       round(f.lower_ci, 6) AS lower_ci,
       round(f.upper_ci, 6) AS upper_ci,
       round(f.lower_bound, 6) AS lower_bound,
       round(f.upper_bound, 6) AS upper_bound"""
            lateral = f"LATERAL d{op}(q.stream_id, q.t0, q.t1, 0.95) f"
        else:
            select = f"\n       f.value AS {op}_value"
            lateral = f"LATERAL d{op}(q.stream_id, q.t0, q.t1) f"
        return spark.sql(
            f"""SELECT q.stream_id, q.qid, q.t0, q.t1,{select}
FROM sdb_bench_qr q, {lateral}"""
        )

    return run


def _sql_surface_oracle(op: str) -> str:
    from summarydb_spark.plans.portable_sql import (
        q_approx_minmax_range,
        q_approx_range,
    )

    inner = (
        q_approx_range("duckdb", op)
        if op in ("count", "sum")
        else q_approx_minmax_range("duckdb", op)
    )
    return f"SELECT * FROM ({inner}) o WHERE o.stream_id % 50 = 0"


def q_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination with a Bloom prefilter: the two-phase
    shape for when the benchmark shingle set is too large to broadcast as
    an exact hash relation.  Phase 1 builds a bloom over the benchmark
    5-gram hashes (~m/8 bytes regardless of set size) and probes every
    corpus shingle against the broadcast bits — pure column math, no
    shuffle, no false negatives.  Phase 2 equi-joins ONLY the surviving
    shingles (true hits + ~0.1% FPs) against the exact benchmark relation,
    so the shuffled join volume shrinks by the corpus's true non-hit rate.
    Results are therefore EXACTLY the one-phase containment
    (plans/llm_sql.q_decontam_ngram) and share its oracle — a bloom FP can
    only add a candidate that the verify join then rejects."""
    from summarydb_spark.functions import sketch
    from summarydb_spark.sources.tables import ensure_store

    n, threshold = 5, 0.5
    m_bits, k = 1 << 17, 5

    # shingle ONCE, persisted: bench, corpus, and the per-doc totals all
    # derive from the same (doc_id, shingles) relation — the tokenize +
    # n-gram xxhash64 fold is the dominant cost of this query, and a
    # production decontamination service materializes the shingle index
    # once per corpus snapshot (same ensure_store discipline as the ANN /
    # near-dup-pair stores; the oracle recomputes shingles from raw text)
    def build(s):
        base = _docs(s, sf_dir).select(
            "doc_id", F.split("text", " ").alias("toks")
        )
        sh = F.when(
            F.size("toks") >= n,
            F.array_distinct(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}), "
                    f"i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {n}))))"
                )
            ),
        ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", F.col("toks")))))
        return base.select("doc_id", sh.alias("sh")), None

    path = ensure_store(spark, sf_dir, "ngram_shingles_x5", build, coalesce=0)
    shingled = spark.read.parquet(path)
    bench_raw = shingled.where("doc_id % 37 = 0").select(
        F.explode("sh").alias("s")
    )
    # the verify join needs DISTINCT benchmark shingles (duplicates would
    # multiply per-doc hit counts); the bloom build does not (bit_or is
    # idempotent), so it reads the pre-distinct relation and skips that
    # exchange on its critical path
    bench = bench_raw.distinct()
    # densify the single merged bloom before broadcasting: the benchmark
    # bloom is well-filled, and probing its sparse MAP costs a linear scan
    # of ~m/64 entries per element_at — O(1) array indexing instead
    bloom = sketch.bloom_aggregate(
        bench_raw.withColumn("g", F.lit(1)), ["g"], "s", m_bits=m_bits, k=k
    ).select(sketch.bloom_to_dense(F.col("bloom"), m_bits).alias("bits"))
    # phase 1 probe as an array filter on the UN-exploded shingle arrays,
    # carrying the per-doc total (size(sh)) through the explode: the old
    # shape exploded every corpus shingle before probing and re-scanned
    # the store for a separate totals leg, then stitched the two with a
    # left join.  explode_outer keeps zero-survivor docs as one NULL row,
    # so the LEFT verify join + count over matches yields n_hit = 0 for
    # them — totals leg and its join gone, one store scan instead of two
    cand = (
        shingled.where("doc_id % 37 != 0")
        .crossJoin(F.broadcast(bloom))
        .select(
            "doc_id",
            F.size("sh").cast("long").alias("n_shingles"),
            F.explode_outer(
                F.filter(
                    "sh",
                    lambda s: sketch.bloom_contains_dense(
                        F.col("bits"), s, m_bits=m_bits, k=k
                    ),
                )
            ).alias("s"),
        )
    )
    # phase 2: exact verify of ONLY the surviving shingles (true hits +
    # ~0.1% FPs) against the distinct benchmark relation; count(m) skips
    # NULLs, so bloom FPs and zero-survivor docs contribute 0
    final = (
        cand.join(F.broadcast(bench.withColumn("m", F.lit(1))), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count("m").alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_shingles"), 6).alias("containment"),
            (F.col("n_hit") / F.col("n_shingles") >= threshold).alias(
                "contaminated"
            ),
        )
    )
    return final


def _oracle_decontam_bloom() -> str:
    from summarydb_spark.plans.llm_sql import q_decontam_ngram

    return q_decontam_ngram("duckdb")


# name -> (spark_builder, oracle_sql | None)
DF_QUERIES = {
    "sql_surface_dsum": (_q_sql_surface("sum"), _sql_surface_oracle("sum")),
    "sql_surface_dcount": (
        _q_sql_surface("count"),
        _sql_surface_oracle("count"),
    ),
    "sql_surface_dmax": (_q_sql_surface("max"), _sql_surface_oracle("max")),
    "sql_surface_dmin": (_q_sql_surface("min"), _sql_surface_oracle("min")),
    "dedup_minhash_lsh": (q_dedup_minhash, ORACLE_DEDUP_MINHASH),
    "dedup_simhash": (q_dedup_simhash, ORACLE_DEDUP_SIMHASH),
    "embedding_near_dups": (q_embedding_near_dups, ORACLE_EMBEDDING_NEAR_DUPS),
    "dedup_semantic": (q_dedup_semantic, ORACLE_DEDUP_SEMANTIC),
    "ann_lsh_topk": (q_ann_lsh_topk, _ann_oracle()),
    "ann_ivf_topk": (q_ann_ivf_topk, _ann_oracle()),
    "ann_pq_topk": (q_ann_pq_topk, _ann_oracle()),
    "ann_ivfpq_topk": (q_ann_ivfpq_topk, _ann_oracle()),
    "ann_radius_search": (q_ann_radius_search, _ann_radius_oracle()),
    "dedup_incremental_probe": (q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL),
    "session_window_builtin": (q_session_window_builtin, ORACLE_SESSION_WINDOW),
    "streaming_sessionize_gate": (
        q_streaming_sessionize_gate,
        ORACLE_SESSION_WINDOW,
    ),
    "streaming_watermark_gate": (
        q_streaming_watermark_gate,
        ORACLE_STREAMING_WATERMARK,
    ),
    "streaming_dedup_gate": (
        q_streaming_dedup_gate,
        ORACLE_STREAMING_DEDUP,
    ),
    "streaming_dedup_wm_gate": (
        q_streaming_dedup_wm_gate,
        ORACLE_STREAMING_DEDUP,
    ),
    "streaming_mixed_policy_gate": (
        q_streaming_mixed_policy_gate,
        _oracle_mixed_policy(),
    ),
    "streaming_restart_gate": (
        q_streaming_restart_gate,
        _oracle_restart_gate(),
    ),
    "media_metadata": (q_media_metadata, ORACLE_MEDIA_META),
    "media_frame_stats": (q_media_frame_stats, ORACLE_MEDIA_FRAMES),
    "media_resize_16x16": (q_media_resize, ORACLE_MEDIA_RESIZE),
    "media_byte_histogram": (q_media_histogram, ORACLE_MEDIA_HISTOGRAM),
    "dedup_cluster_cc": (q_dedup_cluster_cc, _oracle_dedup_cluster_cc()),
    "dup_graph_triangles": (
        q_dup_graph_triangles,
        _oracle_dup_graph_triangles(),
    ),
    "dup_graph_degree_stats": (
        q_dup_graph_degree_stats_df,
        None,  # resolved below: the SQL template's DuckDB rendering
    ),
    "dedup_keep_best": (q_dedup_keep_best, _oracle_dedup_keep_best()),
    "audio_frame_features": (q_audio_frame_features, ORACLE_AUDIO_FRAMES),
    "sketch_range_batched": (q_sketch_range_batched, ORACLE_SKETCH_RANGE_BATCHED),
    "decontam_bloom_prefilter": (q_decontam_bloom, _oracle_decontam_bloom()),
}


def q_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over the document token stream: every
    token with frequency >= N/50, found by the two-pass candidate plan in
    functions.mg (per-partition 64-counter summaries -> candidate union ->
    exact re-count of candidates only).  The deterministic counterpart of
    sketch_cms_heavy_hitters — the output is exact (the oracle recomputes
    it with a plain GROUP BY / HAVING), and mg_bound_ok verifies the
    summed-summary guarantee est <= exact <= est + N/64 held at runtime."""
    from summarydb_spark.functions.mg import heavy_hitters_mg
    from summarydb_spark.sources.tables import load_table

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("value")
    )
    return heavy_hitters_mg(toks, k=64, threshold_denom=50).select(
        F.col("value").alias("token"), "exact_cnt", "mg_bound_ok"
    )


ORACLE_HEAVY_HITTERS_MG = """
WITH ex AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
tot AS (SELECT count(*) AS n FROM ex)
SELECT token, count(*) AS exact_cnt, TRUE AS mg_bound_ok
FROM ex CROSS JOIN tot
GROUP BY token, tot.n
HAVING count(*) * 50 >= tot.n"""


KCENTER_K = 6


def q_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-keyed persisted view of :func:`_kcenter_select` — the
    greedy selection is a corpus-level artifact (like the kmeans
    centroids and ANN indexes), built once per source snapshot; the
    DuckDB oracle re-runs the greedy from raw embeddings, so a stale
    store cannot pass the gate."""
    from summarydb_spark.sources.tables import ensure_store

    path = ensure_store(
        spark,
        sf_dir,
        f"kcenter_coreset_k{KCENTER_K}",
        lambda s: (_kcenter_select(s, sf_dir), None),
    )
    return spark.read.parquet(path)


def _kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embedding corpus (the
    Gonzalez 2-approximation every diversity-aware data-selection stack
    uses): seed with the lowest vec_id, then repeatedly take the vector
    FARTHEST (max min-cosine-distance, vec_id tiebreak) from the chosen
    set.  Fully lazy and distributed: each round is one broadcast join of
    the 1-row argmax frame into a least() distance update — no collect,
    no driver-side vectors; the per-round state persists so round r scans
    cached rows, not the whole lineage.  All distance math is the shared
    left-fold cosine (array_embedding_stats discipline), so every min/max
    decision is bit-identical to the unrolled DuckDB oracle.  Returns the
    selection order (step, cid, md_micro = the farthest distance that
    step, i.e. the coreset's covering-radius trajectory)."""
    from summarydb_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    emb = emb.withColumn(
        "nrm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)),
    ).persist()

    def dist(v, nrm, cv, cnrm):
        dot = F.aggregate(
            F.zip_with(v, cv, lambda a, b: a * b),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(
            (nrm == F.lit(0.0)) | (cnrm == F.lit(0.0)), F.lit(1.0)
        ).otherwise(F.lit(1.0) - dot / (nrm * cnrm))

    # the corpus state is KB-scale (|corpus| rows x one double); one task
    # per round beats 32 near-empty ones, and the eager localCheckpoint
    # truncates each round's lineage so round r scans materialized rows —
    # the argmax frame and the distance update then share one tiny scan
    c0 = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
    )
    state = (
        emb.crossJoin(F.broadcast(c0))
        .select(
            "vec_id", "v", "nrm",
            dist(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cnrm")).alias("md"),
        )
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    picks = [
        c0.select(
            F.lit(0).cast("long").alias("step"),
            "cid",
            F.lit(0).cast("long").alias("md_micro"),
        )
    ]
    for step in range(1, KCENTER_K):
        # cand is a TakeOrdered over the materialized 1-partition state:
        # evaluating it lazily in both consumers is cheaper than the extra
        # eager job a checkpoint would add
        cand = state.orderBy(F.desc("md"), "vec_id").limit(1)
        picks.append(
            cand.select(
                F.lit(step).cast("long").alias("step"),
                F.col("vec_id").alias("cid"),
                F.floor(F.col("md") * 1_000_000).cast("long").alias("md_micro"),
            )
        )
        c = cand.select(
            F.col("v").alias("cv"), F.col("nrm").alias("cnrm")
        )
        state = (
            state.crossJoin(F.broadcast(c))
            .select(
                "vec_id", "v", "nrm",
                F.least(
                    F.col("md"),
                    dist(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cnrm")),
                ).alias("md"),
            )
            .localCheckpoint(eager=True)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


def _oracle_kcenter_coreset() -> str:
    fold = "(a, b) -> a + b"
    nrm = (
        "sqrt(list_reduce(list_prepend(0.0, "
        f"list_transform(v, x -> x * x)), {fold}))"
    )

    def dist(e: str, c: str) -> str:
        dot = (
            "list_reduce(list_prepend(0.0, "
            f"list_transform(range(len({e}.v)), "
            f"i -> {e}.v[i + 1] * {c}.cv[i + 1])), {fold})"
        )
        return (
            f"CASE WHEN {e}.nrm = 0 OR {c}.cnrm = 0 THEN 1.0 "
            f"ELSE 1.0 - {dot} / ({e}.nrm * {c}.cnrm) END"
        )

    parts = [
        f"""WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
e AS (SELECT vec_id, v, {nrm} AS nrm FROM emb),
c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM e
       ORDER BY vec_id LIMIT 1),
s0 AS (
  SELECT e.vec_id, e.v, e.nrm, {dist("e", "c")} AS md
  FROM e, c0 c
)"""
    ]
    for k in range(1, KCENTER_K):
        parts.append(
            f"""c{k} AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm, md
       FROM s{k - 1} ORDER BY md DESC, vec_id LIMIT 1)"""
        )
        if k < KCENTER_K - 1:
            parts.append(
                f"""s{k} AS (
  SELECT s.vec_id, s.v, s.nrm, least(s.md, {dist("s", "c")}) AS md
  FROM s{k - 1} s, c{k} c
)"""
            )
    selects = ["SELECT CAST(0 AS BIGINT) AS step, cid, CAST(0 AS BIGINT) AS md_micro FROM c0"]
    for k in range(1, KCENTER_K):
        selects.append(
            f"SELECT CAST({k} AS BIGINT), cid, "
            f"CAST(floor(md * 1000000) AS BIGINT) FROM c{k}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


DF_QUERIES_KCENTER = ("kcenter_coreset", q_kcenter_coreset)


PAGERANK_ITERS = 4


def q_pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 4 iterations) over the verified near-dup
    graph — ranks the canonical-document candidates by duplication
    centrality (the web-graph classic applied the way curation stacks use
    it: a high-rank node is the hub of a duplication cluster).

    All rank arithmetic is integer nano-units with an explicit floor after
    every division, so each iteration is exact-identical across engines,
    partitionings, and retries (the markov/cusum discipline); the per-node
    update is one equi-join + one LONG-sum hash aggregation per iteration
    — the O(E) shape that survives a billion-edge graph, unlike the
    oracle's unrolled self-joins.  Edges come from the t=0.1 persisted
    pair store (every graph consumer shares one materialization); the
    DuckDB oracle recomputes pairs from raw text, so a stale store cannot
    pass the gate.
    """
    pairs = _ngram_pairs_t01(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nstats = deg.agg(F.count(F.lit(1)).alias("n"))
    # every node starts at floor(1e9/N); teleport mass floor(0.15e9/N)
    ranks = (
        deg.crossJoin(F.broadcast(nstats))
        .select(
            F.col("src").alias("doc_id"),
            "deg",
            F.floor(F.lit(1_000_000_000.0) / F.col("n")).alias("r"),
            "n",
        )
        .persist()
    )
    for _ in range(PAGERANK_ITERS):
        contrib = edges.join(
            ranks.select(F.col("doc_id").alias("src"), "deg", "r"), "src"
        ).select(
            F.col("dst").alias("doc_id"),
            F.floor(
                (85 * F.col("r")) / (100.0 * F.col("deg"))
            ).cast("long").alias("c"),
        )
        agg = contrib.groupBy("doc_id").agg(F.sum("c").alias("inflow"))
        new_ranks = (
            ranks.select("doc_id", "deg", "n")
            .join(agg, "doc_id")
            .select(
                "doc_id",
                "deg",
                (
                    F.floor(F.lit(150_000_000.0) / F.col("n")).cast("long")
                    + F.col("inflow")
                ).alias("r"),
                "n",
            )
            .persist()
        )
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select(
        "doc_id",
        F.col("deg").cast("long").alias("degree"),
        F.col("r").cast("long").alias("rank_nano"),
    )
    edges.unpersist()
    return out


def _oracle_pagerank_dup_graph() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.1)
    iters = []
    prev = "r0"
    for k in range(1, PAGERANK_ITERS + 1):
        iters.append(
            f"""r{k} AS (
  SELECT d.doc_id, d.deg, d.n,
         CAST(floor(150000000.0 / d.n) AS BIGINT)
           + sum(CAST(floor(85 * r.r / (100.0 * r.deg)) AS BIGINT)) AS r
  FROM edges e
  JOIN {prev} r ON r.doc_id = e.s
  JOIN r0 d ON d.doc_id = e.d
  GROUP BY d.doc_id, d.deg, d.n
)"""
        )
        prev = f"r{k}"
    chain = ",\n".join(iters)
    return f"""
WITH pairs AS ({pair_sql}),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs
),
deg AS (SELECT s AS doc_id, count(*) AS deg FROM edges GROUP BY s),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (
  SELECT doc_id, deg, nn.n,
         CAST(floor(1000000000.0 / nn.n) AS BIGINT) AS r
  FROM deg CROSS JOIN nn
),
{chain}
SELECT doc_id, CAST(deg AS BIGINT) AS degree, CAST(r AS BIGINT) AS rank_nano
FROM {prev}"""


DF_QUERIES["pagerank_dup_graph"] = (
    q_pagerank_dup_graph,
    _oracle_pagerank_dup_graph(),
)


_PPR_ITERS = 3
_PPR_SEEDS = 5


def q_ppr_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank (damping 0.85, 3 iterations) from a fixed
    seed set — the 5 smallest part ids in the support>=2 co-purchase
    graph — emitting the top-20 related parts by PPR mass: the
    random-walk-with-restart recommender primitive (seed basket ->
    related assortment), the personalized complement of the global
    pagerank_dup_graph.

    Unlike the global twin, every quantity here is PURE int64: seed
    mass 1e9 div 5 = 2e8 exactly, teleport 0.15 * 2e8 = 3e7 exactly,
    per-edge flow (85 * r) div (100 * deg) — no float floor anywhere,
    so iterations are exact-identical across engines, partitionings,
    and retries.  Per iteration: one equi-join (edges x ranks, O(E))
    + one long-sum hash aggregate; the oracle unrolls the same 3
    iterations as CTEs.  No dangling mass: every node in the symmetric
    edge relation has deg >= 1 by construction.

    Seed selection is ``orderBy(src).limit(k)`` — a TakeOrdered (per-
    partition top-k then a k-row driver merge, no shuffle-to-one) —
    broadcast-left-joined back onto the node relation; the previous
    ``row_number() OVER (ORDER BY src)`` was a single-partition sort of
    all |V| nodes (round-9 VERDICT What's-wrong #2)."""
    pairs = _copurchase_edges(spark, sf_dir)
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seeds = (
        deg.select("src")
        .orderBy("src")
        .limit(_PPR_SEEDS)
        .withColumn("_seed", F.lit(True))
    )
    seeded = deg.join(F.broadcast(seeds), "src", "left").withColumn(
        "is_seed", F.coalesce(F.col("_seed"), F.lit(False))
    )
    seed_mass = 1_000_000_000 // _PPR_SEEDS
    teleport = (15 * seed_mass) // 100
    ranks = seeded.select(
        F.col("src").alias("part_id"),
        "deg",
        "is_seed",
        F.when(F.col("is_seed"), F.lit(seed_mass))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    ).persist()
    for _ in range(_PPR_ITERS):
        contrib = edges.join(
            ranks.select(F.col("part_id").alias("src"), "deg", "r"), "src"
        ).select(
            F.col("dst").alias("part_id"),
            F.expr("(85 * r) div (100 * deg)").alias("c"),
        )
        agg = contrib.groupBy("part_id").agg(F.sum("c").alias("inflow"))
        new_ranks = (
            ranks.select("part_id", "deg", "is_seed")
            .join(agg, "part_id")
            .select(
                "part_id",
                "deg",
                "is_seed",
                (
                    F.when(F.col("is_seed"), F.lit(teleport))
                    .otherwise(F.lit(0))
                    .cast("long")
                    + F.col("inflow")
                ).alias("r"),
            )
            .persist()
        )
        ranks.unpersist()
        ranks = new_ranks
    out = (
        ranks.select(
            "part_id",
            F.col("deg").cast("long").alias("degree"),
            F.col("r").alias("ppr_nano"),
        )
        .orderBy(F.desc("ppr_nano"), "part_id")
        .limit(20)
    )
    edges.unpersist()
    return out


def _oracle_ppr_copurchase() -> str:
    seed_mass = 1_000_000_000 // _PPR_SEEDS
    teleport = (15 * seed_mass) // 100
    iters = []
    prev = "r0"
    for k in range(1, _PPR_ITERS + 1):
        iters.append(
            f"""r{k} AS MATERIALIZED (
  SELECT d.part_id, d.deg, d.is_seed,
         CASE WHEN d.is_seed THEN {teleport} ELSE 0 END
           + sum((85 * CAST(r.r AS BIGINT)) // (100 * r.deg)) AS r
  FROM edges e
  JOIN {prev} r ON r.part_id = e.s
  JOIN r0 d ON d.part_id = e.d
  GROUP BY d.part_id, d.deg, d.is_seed
)"""
        )
        prev = f"r{k}"
    chain = ",\n".join(iters)
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (
  SELECT a AS s, b AS d FROM p UNION ALL SELECT b AS s, a AS d FROM p
),
deg AS (SELECT s AS part_id, count(*) AS deg FROM edges GROUP BY s),
r0 AS (
  SELECT part_id, deg,
         row_number() OVER (ORDER BY part_id) <= {_PPR_SEEDS} AS is_seed,
         CASE WHEN row_number() OVER (ORDER BY part_id) <= {_PPR_SEEDS}
              THEN CAST({seed_mass} AS BIGINT) ELSE 0 END AS r
  FROM deg
),
{chain}
SELECT part_id, CAST(deg AS BIGINT) AS degree, CAST(r AS BIGINT) AS ppr_nano
FROM {prev}
ORDER BY ppr_nano DESC, part_id
LIMIT 20"""


DF_QUERIES["ppr_copurchase_seeded"] = (
    q_ppr_copurchase,
    _oracle_ppr_copurchase(),
)


def _zorder_locality_entry():
    from summarydb_spark.plans.retrieval_ext import (
        q_zorder_locality,
        q_zorder_locality_df,
    )

    return q_zorder_locality_df, q_zorder_locality("duckdb")


DF_QUERIES["zorder_locality"] = _zorder_locality_entry()


def _hybrid_rrf_entry():
    from summarydb_spark.plans.retrieval_ext import (
        q_hybrid_rrf_fusion,
        q_hybrid_rrf_fusion_df,
    )

    return q_hybrid_rrf_fusion_df, q_hybrid_rrf_fusion("duckdb")


DF_QUERIES["hybrid_rrf_fusion"] = _hybrid_rrf_entry()


def _equidepth_entry():
    from summarydb_spark.plans.analytics_ext import (
        q_equidepth_histogram_df,
        q_equidepth_histogram_value,
    )

    return q_equidepth_histogram_df, q_equidepth_histogram_value("duckdb")


DF_QUERIES["equidepth_histogram_value"] = _equidepth_entry()


def _seq_packing_entry():
    from summarydb_spark.plans.coverage_ext import (
        q_seq_packing,
        q_seq_packing_df,
    )

    return q_seq_packing_df, q_seq_packing("duckdb")


DF_QUERIES["seq_packing"] = _seq_packing_entry()


def _curation_pipeline_entry():
    from summarydb_spark.plans.coverage_ext import (
        q_curation_pipeline,
        q_curation_pipeline_df,
    )

    return q_curation_pipeline_df, q_curation_pipeline("duckdb")


DF_QUERIES["curation_pipeline"] = _curation_pipeline_entry()


def _mining_df_entries():
    from summarydb_spark.plans.mining_ext import MINING_EXT_DF_QUERIES

    return {
        name: (builder, oracle_fn())
        for name, (builder, oracle_fn) in MINING_EXT_DF_QUERIES.items()
    }


# association_rules_lift / link_prediction_ra: Spark side moves to a DF
# builder that localCheckpoint-shares the multiply-consumed CTE base
# relation (round-11 item 6); oracle text unchanged.
DF_QUERIES.update(_mining_df_entries())

DF_QUERIES["heavy_hitters_misra_gries"] = (
    q_heavy_hitters_mg,
    ORACLE_HEAVY_HITTERS_MG,
)

DF_QUERIES["kcenter_coreset"] = (
    q_kcenter_coreset,
    _oracle_kcenter_coreset(),
)


def _degree_stats_oracle() -> str:
    from summarydb_spark.plans.pipeline_ext import q_dup_graph_degree_stats

    return q_dup_graph_degree_stats("duckdb")


DF_QUERIES["dup_graph_degree_stats"] = (
    q_dup_graph_degree_stats_df,
    _degree_stats_oracle(),
)


def q_dedup_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t=0.1 near-dup pair relation built LIVE by the banded-LSH
    generator (banded_ngram_pairs — no persisted store, so the gate and
    the bench exercise the full build path every call).  Oracle: the
    exhaustive within-block join at the same threshold — a hash-match
    proves the banded generation has ZERO false negatives on this corpus
    (and exact verify guarantees zero false positives always)."""
    return banded_ngram_pairs(spark, sf_dir, 0.1)


def q_dedup_ngram_jaccard_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default plan for the t=0.2 near-dup pair relation: read the
    fingerprint-keyed pair store, whose BUILD is banded-LSH generation +
    exact verify (_ngram_pairs) — the scale path.  The exhaustive
    block-join template remains registered as the oracle-gate twin
    (dedup_ngram_jaccard_exhaustive) and is this query's DuckDB oracle,
    so a stale or recall-lossy store cannot pass."""
    return _ngram_pairs(spark, sf_dir, 0.2)


def _oracle_ngram_jaccard(threshold: float) -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    return q_dedup_ngram_jaccard("duckdb", threshold=threshold)


def q_dedup_pairs_banded_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental pair-store maintenance: the per-ingest DELTA of the
    t=0.1 pair relation for an arriving batch (docs with doc_id%7==0 —
    the same deterministic split dedup_incremental_probe uses) against
    the rest of the corpus.  Banded generation expands only in-bucket
    pairs with >= 1 batch endpoint (new x corpus and new x new); exact
    verify per candidate.  The oracle filters the exhaustive pair
    relation to batch-endpoint pairs, so a hash-match proves the delta
    is exactly the set of rows a store rebuild would add — the
    append-only maintenance contract of a production pair store (the
    reference's mergeable-aggregate shape, core/op_set.go:44-60,
    applied to the pair relation itself).

    The doc_id%7 batch is PROPORTIONAL to the corpus (chosen so the
    DuckDB oracle stays cheap to hash-match), so this gate's scaling
    ratio partly measures batch growth.  The production shape — a
    CONSTANT-size arriving batch — is measured separately:
    tools/measure_delta_const.py, recorded in BASELINE.md round 8
    (500-doc batch: 4.28 s at sf0.1 -> 4.39 s at sf1, ~flat at 10x
    corpus)."""
    from summarydb_spark.functions.dedup import banded_jaccard_pairs
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    blocks = (
        spark.sql(ngram_blocks_sql("spark"))
        .withColumn("is_new", F.col("doc_id") % 7 == 0)
        .persist()
    )
    return banded_jaccard_pairs(blocks, 0.1, delta_col="is_new").select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        "jaccard",
    )


def _oracle_pairs_banded_delta() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.1)
    return f"""
WITH p AS ({pair_sql})
SELECT doc_a, doc_b, jaccard FROM p
WHERE doc_a % 7 = 0 OR doc_b % 7 = 0"""


DF_QUERIES["dedup_pairs_banded"] = (
    q_dedup_pairs_banded,
    _oracle_ngram_jaccard(0.1),
)

DF_QUERIES["dedup_pairs_banded_delta"] = (
    q_dedup_pairs_banded_delta,
    _oracle_pairs_banded_delta(),
)

DF_QUERIES["dedup_ngram_jaccard"] = (
    q_dedup_ngram_jaccard_df,
    _oracle_ngram_jaccard(0.2),
)


def q_dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINMENT dedup (doc-inside-doc detection): same-lang pairs
    with |A∩B| / min(|A|,|B|) >= 0.9 over the 3-gram shingle sets —
    the near-SUPERSET regime (quoted articles, page-in-page scrapes)
    that Jaccard dedup structurally misses: a doc fully contained in
    one 10x its size has jaccard ~0.1 but containment 1.0.

    Candidate generation is EXACT prefix filtering (AllPairs/PPJoin,
    Bayardo et al. 2007): per doc, index only its p = n - ceil(0.9n) + 1
    globally RAREST shingles (df ascending, shingle tiebreak) against
    the full inverted index.  Lossless by the pigeonhole bound — a
    contained doc has < p shingles outside its container, so at least
    one prefix shingle hits — hence the exhaustive DuckDB block join is
    this query's oracle and a hash-match proves zero false negatives.
    All arithmetic integer: prefix length (9n+9) div 10 and the ppm
    score (|∩| * 1e6 div min) agree exactly on the >= 0.9 boundary.

    Scale shape: one (lang, shingle) df aggregate, one per-doc rank
    window, and a prefix x postings equi-join whose volume is
    sum_over_prefix_tokens(df) — linear in occurrences of RARE
    shingles, never the block cross join; verify touches candidates
    only.  Emits (doc_a, doc_b, containment_ppm).

    VOCABULARY BOUNDARY (round-10 measurement, BASELINE.md): in a
    CLOSED shingle vocabulary even the rarest prefix tokens' df grows
    linearly with the corpus, so the candidate volume grows ~n^2 —
    measured on the synthetic decade: 41.6k -> 5.3M -> 653M join rows
    at sf0.1/sf1/sf10 (max prefix df 5 -> 45 -> 409); the sf10 run
    spills unboundedly.  This is the same boundary BASELINE.md round 6
    established for low-threshold Jaccard: no exact prefix filter is
    sub-quadratic once the vocabulary saturates.  In the OPEN-vocabulary
    regime this operator is designed for (real web corpora; rare-shingle
    df bounded), the same plan is LINEAR: planted open-vocab corpus,
    50k -> 500k docs = join volume 610k -> 6.1M (exactly 10x), wall
    9.3x at 10x (tools/measure_containment_openvocab.py).  Full-value
    sf1 oracle check: tools/check_containment_sf1.py, 732/183 pairs
    MATCH."""
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(containment_prefix_sql())


def containment_prefix_sql(delta: bool = False) -> str:
    """The prefix-filtered containment plan as spark-dialect SQL over the
    registered ``documents`` view (factored out so tests can run it on a
    synthetic corpus).  ``delta=True`` computes the INCREMENTAL relation
    for an arriving batch (doc_id % 7 = 0, the repo's deterministic
    batch split): only pairs with >= 1 batch endpoint, generated
    batch-proportionally — batch prefixes probe the full postings, full
    prefixes probe batch postings — instead of re-verifying the whole
    corpus (the per-ingest maintenance a production containment store
    runs; recall is the same pigeonhole bound, applied to whichever
    endpoint is smaller)."""
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql

    if delta:
        # two one-sided joins, each with a SINGLE-SIDE batch predicate the
        # optimizer can push below the join (a post-join OR over both sides
        # is unpushable — candidate-generation cost would equal the full
        # query).  Leg 1: batch prefixes x full postings; leg 2: non-batch
        # prefixes x batch postings.  Union = (pf batch OR i batch), the
        # same candidate set, but each join's probe side is batch-sized.
        cand = """
cand AS (
  SELECT DISTINCT least(a0, b0) AS doc_a, greatest(a0, b0) AS doc_b
  FROM (
    SELECT pf.doc_id AS a0, i.doc_id AS b0
    FROM (SELECT doc_id, lang, s FROM rk
          WHERE r <= p AND doc_id % 7 = 0) pf
    JOIN tok i ON i.lang = pf.lang AND i.s = pf.s
              AND i.doc_id <> pf.doc_id
    UNION ALL
    SELECT pf.doc_id AS a0, i.doc_id AS b0
    FROM (SELECT doc_id, lang, s FROM rk
          WHERE r <= p AND doc_id % 7 <> 0) pf
    JOIN (SELECT doc_id, lang, s FROM tok WHERE doc_id % 7 = 0) i
      ON i.lang = pf.lang AND i.s = pf.s AND i.doc_id <> pf.doc_id
  ) u
)"""
    else:
        cand = """
cand AS (
  SELECT DISTINCT least(pf.doc_id, i.doc_id) AS doc_a,
                  greatest(pf.doc_id, i.doc_id) AS doc_b
  FROM (SELECT doc_id, lang, s FROM rk WHERE r <= p) pf
  JOIN tok i ON i.lang = pf.lang AND i.s = pf.s
            AND i.doc_id <> pf.doc_id
)"""
    return f"""
WITH sh0 AS ({ngram_blocks_sql("spark")}),
sh AS (SELECT doc_id, lang, sh, size(sh) AS n FROM sh0),
tok AS (
  SELECT doc_id, lang, n, s FROM sh LATERAL VIEW explode(sh) t AS s
),
dfg AS (SELECT lang, s, count(*) AS df FROM tok GROUP BY lang, s),
rk AS (
  SELECT t.doc_id, t.lang, t.s,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY g.df, t.s) AS r,
         t.n - (9 * t.n + 9) div 10 + 1 AS p
  FROM tok t JOIN dfg g ON g.lang = t.lang AND g.s = t.s
),{cand}
SELECT c.doc_a, c.doc_b,
       CAST(size(array_intersect(x.sh, y.sh)) AS BIGINT) * 1000000
         div CAST(least(x.n, y.n) AS BIGINT) AS containment_ppm
FROM cand c
JOIN sh x ON x.doc_id = c.doc_a
JOIN sh y ON y.doc_id = c.doc_b
WHERE CAST(size(array_intersect(x.sh, y.sh)) AS BIGINT) * 1000000
        div CAST(least(x.n, y.n) AS BIGINT) >= 900000
ORDER BY doc_a, doc_b"""


def _oracle_containment() -> str:
    from summarydb_spark.plans.llm_sql import ngram_blocks_sql

    return f"""
WITH sh0 AS ({ngram_blocks_sql("duckdb")}),
sh AS (SELECT doc_id, lang, sh, len(sh) AS n FROM sh0)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000000
         // CAST(least(a.n, b.n) AS BIGINT) AS containment_ppm
FROM sh a JOIN sh b ON b.lang = a.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) * 1000000
        // CAST(least(a.n, b.n) AS BIGINT) >= 900000
ORDER BY doc_a, doc_b"""


DF_QUERIES["dedup_containment_prefix"] = (
    q_dedup_containment_prefix,
    _oracle_containment(),
)


def q_dedup_containment_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental containment maintenance: the containment-pair DELTA
    for an arriving batch (doc_id % 7 = 0) against the corpus —
    batch-proportional candidate generation (see
    containment_prefix_sql(delta=True)); the oracle filters the
    exhaustive relation to batch-endpoint pairs, so a hash-match proves
    the delta is exactly what a store rebuild would add (the same
    append-only contract as dedup_pairs_banded_delta)."""
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(containment_prefix_sql(delta=True))


def _oracle_containment_delta() -> str:
    return f"""
WITH full_rel AS ({_oracle_containment()})
SELECT doc_a, doc_b, containment_ppm FROM full_rel
WHERE doc_a % 7 = 0 OR doc_b % 7 = 0
ORDER BY doc_a, doc_b"""


DF_QUERIES["dedup_containment_delta"] = (
    q_dedup_containment_delta,
    _oracle_containment_delta(),
)


_WEIGHTED_JACCARD_T = 0.2


def q_dedup_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED (multiplicity-aware) near-dup pairs: same-block pairs with
    weighted Jaccard Σ_g min(c_a, c_b) / Σ_g max(c_a, c_b) >= 0.2 over
    3-gram occurrence counts — the boilerplate regime duplicate detector
    (navigation chrome, templated headers) where SET Jaccard overcounts:
    a doc that repeats one shared paragraph 10x is weighted-similar only
    if the other doc repeats it too.

    Generation is CONSISTENT WEIGHTED SAMPLING specialized to integer
    weights (Ioffe, ICDM 2010 reduces to this exactly for integral
    multiplicities): each gram with count c expands to c distinct
    elements (g, 1)..(g, c), and plain MinHash over the expanded sets
    has collision probability = |∩exp| / |∪exp| = Σmin / Σmax, the
    weighted Jaccard.  That lets the proven r=1 banded builder
    (functions/dedup.banded_jaccard_pairs — hot-bucket guard, rep
    collapse, 1e-6 per-pair miss bound) run UNCHANGED over the expanded
    relation, and its exact set verify IS the exact weighted verify.
    Expansion cost is Σc = total gram occurrences = corpus token volume
    — linear, never quadratic.

    The oracle is the exhaustive same-block Σmin/Σmax join, so a
    hash-match proves generation recall exactly as for
    dedup_pairs_banded.  Emits (doc_a, doc_b, wjaccard round-6; the
    quotient of identical exact integers in both engines)."""
    from summarydb_spark.functions.dedup import banded_jaccard_pairs
    from summarydb_spark.plans.llm_sql import ngram_multiset_blocks_sql
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    g = spark.sql(ngram_multiset_blocks_sql("spark"))
    cnt = (
        g.select("doc_id", "lang", "len_bucket", F.explode("gh").alias("g"))
        .groupBy("doc_id", "lang", "len_bucket", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    expd = cnt.withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.col("c")))
    ).select(
        "doc_id", "lang", "len_bucket", F.xxhash64("g", "j").alias("e")
    )
    # sort for a deterministic content digest (collect_list order is
    # partition-dependent; identical multisets must collapse together)
    wsets = expd.groupBy("doc_id", "lang", "len_bucket").agg(
        F.sort_array(F.collect_list("e")).alias("sh")
    )
    return banded_jaccard_pairs(wsets, _WEIGHTED_JACCARD_T).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("jaccard").alias("wjaccard"),
    )


def _oracle_weighted_minhash() -> str:
    from summarydb_spark.plans.llm_sql import ngram_multiset_blocks_sql

    return f"""
WITH m AS ({ngram_multiset_blocks_sql("duckdb")}),
g AS (SELECT doc_id, lang, len_bucket, unnest(gh) AS g FROM m),
c AS (
  SELECT doc_id, lang, len_bucket, g, count(*) AS c
  FROM g GROUP BY doc_id, lang, len_bucket, g
),
tot AS (SELECT doc_id, sum(c) AS t FROM c GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         sum(least(a.c, b.c)) AS smin
  FROM c a
  JOIN c b ON b.lang = a.lang AND b.len_bucket = a.len_bucket
          AND b.g = a.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       round(i.smin * 1.0 / (ta.t + tb.t - i.smin), 6) AS wjaccard
FROM inter i
JOIN tot ta ON ta.doc_id = i.doc_a
JOIN tot tb ON tb.doc_id = i.doc_b
WHERE i.smin * 1.0 / (ta.t + tb.t - i.smin) >= {_WEIGHTED_JACCARD_T}
ORDER BY doc_a, doc_b"""


DF_QUERIES["dedup_weighted_minhash"] = (
    q_dedup_weighted_minhash,
    _oracle_weighted_minhash(),
)


def q_dedup_weighted_minhash_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental maintenance of the WEIGHTED pair store: the weighted
    near-dup delta for an arriving batch (doc_id % 7 = 0) — only pairs
    with >= 1 batch endpoint are expanded and verified, through the
    banded builder's delta gating (bucket-expansion-time filter, the
    same contract as dedup_pairs_banded_delta).  The oracle filters the
    exhaustive weighted relation to batch-endpoint pairs, so a
    hash-match proves the delta is exactly what a store rebuild would
    add."""
    from summarydb_spark.functions.dedup import banded_jaccard_pairs
    from summarydb_spark.plans.llm_sql import ngram_multiset_blocks_sql
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    g = spark.sql(ngram_multiset_blocks_sql("spark"))
    cnt = (
        g.select("doc_id", "lang", "len_bucket", F.explode("gh").alias("g"))
        .groupBy("doc_id", "lang", "len_bucket", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    expd = cnt.withColumn(
        "j", F.explode(F.sequence(F.lit(1), F.col("c")))
    ).select(
        "doc_id", "lang", "len_bucket", F.xxhash64("g", "j").alias("e")
    )
    wsets = expd.groupBy("doc_id", "lang", "len_bucket").agg(
        F.sort_array(F.collect_list("e")).alias("sh")
    ).withColumn("is_new", F.col("doc_id") % 7 == 0)
    return banded_jaccard_pairs(
        wsets, _WEIGHTED_JACCARD_T, delta_col="is_new"
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.col("jaccard").alias("wjaccard"),
    )


def _oracle_weighted_minhash_delta() -> str:
    return f"""
WITH full_rel AS ({_oracle_weighted_minhash()})
SELECT doc_a, doc_b, wjaccard FROM full_rel
WHERE doc_a % 7 = 0 OR doc_b % 7 = 0
ORDER BY doc_a, doc_b"""


DF_QUERIES["dedup_weighted_minhash_delta"] = (
    q_dedup_weighted_minhash_delta,
    _oracle_weighted_minhash_delta(),
)


# -- Pareto frontier (skyline) ------------------------------------------------


def q_skyline_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of customers over (lifetime revenue,
    account balance): the distinct value points no other point strictly
    dominates (>= in both dimensions, > in at least one).

    Scale shape — NOT the quadratic definitional anti-join:
    1. collapse customers to distinct (rev, bal) points (one hash agg);
    2. bucket prefilter: 64 equi-width revenue buckets, per-bucket max
       balance, suffix-max over strictly-higher buckets (a 64-row window,
       broadcast back).  Any point below its bucket's suffix-max is
       dominated by a point with strictly greater revenue AND balance —
       dropped without ever being compared pairwise.  Sound: bucketing by
       a monotone transform means higher bucket => strictly greater rev.
    3. exact skyline on the (tiny) survivor set via one sorted scan:
       order by rev desc, bal desc; keep a point iff its bal strictly
       exceeds the running max of all preceding bals (ties collapsed in
       step 1, so strict dominance is exactly this predicate).
    At 100 TB: step 1 bounds everything downstream by #distinct points;
    step 2's survivor count is ~buckets * points-at-the-frontier-per-
    bucket, so the single-partition final window sees thousands of rows,
    not billions — raise the bucket count if the profile says otherwise.
    Both monetary dims are exact integer cents (round*100), so the
    frontier is deterministic cross-engine.  The oracle is the
    DEFINITIONAL quadratic NOT EXISTS over the same points — the gate
    proves the banded plan equals the definition."""
    from summarydb_spark.sources.tables import load_table

    B = 64
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    pts = (
        cust.join(rev, cust.c_custkey == rev.o_custkey, "left")
        .select(
            F.coalesce("rev_c", F.lit(0)).cast("long").alias("rev_c"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        )
        .groupBy("rev_c", "bal_c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    # bucket prefilter: equi-width on [min_rev, max_rev] (two scalars, one
    # tiny agg job); bucket id is monotone in rev_c
    lo, hi = pts.agg(F.min("rev_c"), F.max("rev_c")).first()
    span = max(1, int(hi) - int(lo) + 1)
    bucketed = pts.withColumn(
        "b", ((F.col("rev_c") - F.lit(int(lo))) * B / F.lit(span)).cast("int")
    )
    from pyspark.sql import Window as W

    bmax = bucketed.groupBy("b").agg(F.max("bal_c").alias("mb"))
    smax = bmax.select(
        "b",
        F.max("mb")
        .over(
            W.orderBy(F.col("b").desc()).rowsBetween(
                W.unboundedPreceding, -1
            )
        )
        .alias("smax"),
    )
    survivors = bucketed.join(F.broadcast(smax), ["b"]).where(
        F.col("smax").isNull() | (F.col("bal_c") >= F.col("smax"))
    )
    # exact skyline on survivors: strict running-max scan
    w = W.orderBy(F.col("rev_c").desc(), F.col("bal_c").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    return (
        survivors.withColumn("prevmax", F.max("bal_c").over(w))
        .where(F.col("prevmax").isNull() | (F.col("bal_c") > F.col("prevmax")))
        .select("rev_c", "bal_c", "n_customers")
        .orderBy(F.col("rev_c").desc())
    )


ORACLE_SKYLINE = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
pts AS (
  SELECT coalesce(r.rev_c, 0) AS rev_c,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT rev_c, bal_c, n_customers FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.rev_c >= p.rev_c AND q.bal_c >= p.bal_c
    AND (q.rev_c > p.rev_c OR q.bal_c > p.bal_c)
)
ORDER BY rev_c DESC"""


# -- MMR diversified retrieval ------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CANDS = 20
_MMR_K = 5


def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein '98):
    for each of the 20 probe vectors, take the exact cosine top-20
    candidates, then greedily select 5 maximizing
    ``lambda*rel - (1-lambda)*max_sim_to_already_selected`` — the standard
    diversity rerank between retrieval and the context window of a RAG /
    training-mix pipeline.

    Scale shape: candidate generation is the retrieval system's job (here
    exact top-20; at 100 TB the ANN index) — MMR itself touches only
    n_cand^2 pairs PER QUERY, computed JVM-side (broadcast self-join of
    the tiny candidate relation), and the inherently-sequential greedy
    runs per query group in one Arrow batch (applyInPandas over
    query_id), never on the driver.  Determinism: rel and pairwise sims
    are rounded to INTEGER micro-units (1e-6) before ANYTHING ranks on
    them — including the top-n_cand candidate cut itself (a raw-double
    cut could keep a different boundary doc per engine) — and the score
    is the exact integer 10*lam*rel_e6 - 10*(1-lam)*pen_e6 (units 1e-7):
    a double-rounded score would land exactly on 5e-7 half-boundaries
    and round differently per engine (first-check finding); all ties
    break on doc id.  Zero-norm vectors have no defined cosine and are
    dropped (NULL rel) before the greedy.  The oracle unrolls the same
    greedy as k chained SQL stages over the same integers."""
    import pandas as pd

    from summarydb_spark.functions.dedup import cosine as _cos

    embs = _embs(spark, sf_dir)
    probes = _emb_probes(spark, sf_dir)
    q = probes.select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
    )
    c = embs.select(
        F.col("vec_id").alias("did"),
        F.transform("embedding", lambda x: x.cast("double")).alias("dv"),
    )
    from pyspark.sql import Window as W

    scored = (
        c.join(F.broadcast(q), F.col("did") != F.col("query_id"))
        .select(
            "query_id",
            "did",
            F.round(_cos(F.col("qv"), F.col("dv")) * 1e6)
            .cast("long")
            .alias("rel"),
        )
        .where(F.col("rel").isNotNull())
    )
    wc = W.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("did"))
    cands = (
        scored.withColumn("_rn", F.row_number().over(wc))
        .where(F.col("_rn") <= _MMR_CANDS)
        .drop("_rn")
    )
    vecs = embs.select(
        F.col("vec_id").alias("did"),
        F.transform("embedding", lambda x: x.cast("double")).alias("dv"),
    )
    cv = cands.join(vecs, "did").select("query_id", "did", "rel", "dv")
    a = cv.select(
        "query_id",
        F.col("did").alias("d1"),
        F.col("rel").alias("rel1"),
        F.col("dv").alias("v1"),
    )
    b = cv.select("query_id", F.col("did").alias("d2"), F.col("dv").alias("v2"))
    pairs = (
        a.join(b, "query_id")
        .select(
            "query_id",
            "d1",
            "rel1",
            "d2",
            F.round(_cos(F.col("v1"), F.col("v2")) * 1e6)
            .cast("long")
            .alias("sim"),
        )
    )

    lam_w = round(_MMR_LAMBDA * 10)
    pen_w = 10 - lam_w

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = {
            int(r.d1): int(r.rel1)
            for r in pdf[["d1", "rel1"]].drop_duplicates().itertuples()
        }
        sim = {
            (int(r.d1), int(r.d2)): int(r.sim)
            for r in pdf[["d1", "d2", "sim"]].itertuples()
        }
        remaining = sorted(rel)
        selected: list[int] = []
        out = []
        for rnk in range(1, _MMR_K + 1):
            if not remaining:
                break
            best = None
            for d in remaining:
                if selected:
                    pen = max(sim[(d, s)] for s in selected)
                    score = lam_w * rel[d] - pen_w * pen
                else:
                    score = lam_w * rel[d]
                # strict > : ties keep the SMALLEST id (remaining sorted)
                if best is None or score > best[1]:
                    best = (d, score)
            d, score = best
            selected.append(d)
            remaining.remove(d)
            out.append((int(pdf["query_id"].iloc[0]), rnk, d, score))
        return pd.DataFrame(
            out, columns=["query_id", "rnk", "doc_id", "score_e7"]
        )

    return (
        pairs.groupBy("query_id")
        .applyInPandas(
            greedy, "query_id long, rnk int, doc_id long, score_e7 long"
        )
        .orderBy("query_id", "rnk")
    )


def _oracle_mmr() -> str:
    """Unrolled greedy MMR in pure SQL: stage s_i selects the argmax of
    lambda*rel - (1-lambda)*max(sim to s_1..s_{i-1}) among candidates not
    yet selected, ties on smallest doc id.  rel/sim are integer
    micro-units before anything ranks on them (including the candidate
    cut), zero-norm cosines are dropped, mirroring the Spark plan
    exactly."""
    lam_w = round(_MMR_LAMBDA * 10)
    pen_w = 10 - lam_w
    head = f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 20
),
c AS (SELECT vec_id AS did, CAST(embedding AS DOUBLE[]) AS dv FROM embeddings),
rel0 AS (
  SELECT qid, did, CAST(round(cs * 1000000) AS BIGINT) AS rel
  FROM (
    SELECT qid, did, list_cosine_similarity(qv, dv) AS cs
    FROM q JOIN c ON c.did != q.qid
  ) WHERE isfinite(cs)
),
cand AS (
  SELECT qid, did, rel FROM (
    SELECT qid, did, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, did) AS rn
    FROM rel0
  ) WHERE rn <= {_MMR_CANDS}
),
sim AS (
  SELECT qid, d1, d2, CAST(round(cs * 1000000) AS BIGINT) AS sim
  FROM (
    SELECT a.qid, a.did AS d1, b.did AS d2,
           list_cosine_similarity(av, bv) AS cs
    FROM (SELECT cand.qid, cand.did, c.dv AS av FROM cand JOIN c USING (did)) a
    JOIN (SELECT cand.qid, cand.did, c.dv AS bv FROM cand JOIN c USING (did)) b
    ON a.qid = b.qid AND a.did != b.did
  ) WHERE isfinite(cs)
),
s1 AS (
  SELECT qid, did, {lam_w} * rel AS score FROM (
    SELECT qid, did, rel,
           row_number() OVER (PARTITION BY qid ORDER BY rel DESC, did) AS rn
    FROM cand
  ) WHERE rn = 1
)"""
    stages = [head]
    for i in range(2, _MMR_K + 1):
        stages.append(
            f""",
s{i} AS (
  SELECT qid, did, score FROM (
    SELECT cand.qid, cand.did,
           {lam_w} * cand.rel - {pen_w} * max(sim.sim) AS score,
           row_number() OVER (
             PARTITION BY cand.qid
             ORDER BY {lam_w} * cand.rel - {pen_w} * max(sim.sim) DESC,
                      cand.did
           ) AS rn
    FROM cand
    JOIN ({' UNION ALL '.join(f'SELECT qid, did FROM s{j}' for j in range(1, i))}) sel
      ON sel.qid = cand.qid
    JOIN sim ON sim.qid = cand.qid AND sim.d1 = cand.did AND sim.d2 = sel.did
    WHERE cand.did NOT IN (
      SELECT did FROM ({' UNION ALL '.join(f'SELECT qid AS q2, did FROM s{j}' for j in range(1, i))}) x
      WHERE x.q2 = cand.qid
    )
    GROUP BY cand.qid, cand.did, cand.rel
  ) WHERE rn = 1
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT qid, {i} AS rnk, did, score FROM s{i}"
        for i in range(1, _MMR_K + 1)
    )
    stages.append(
        f"""
SELECT qid AS query_id, CAST(rnk AS INTEGER) AS rnk,
       did AS doc_id, CAST(score AS BIGINT) AS score_e7
FROM ({union})
ORDER BY query_id, rnk"""
    )
    return "".join(stages)


DF_QUERIES["skyline_customer_value"] = (q_skyline_customer_value, ORACLE_SKYLINE)
DF_QUERIES["mmr_diversified_topk"] = (q_mmr_diversified_topk, _oracle_mmr())


# -- k-core decomposition -----------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 12


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, with_support: bool = False
) -> DataFrame:
    """Support->=2 part co-purchase graph: an edge (a < b, [supp]) when
    two parts appear together in at least 2 distinct orders.  One
    self-equi-join on the order key (fan-out bounded by items-per-order)
    + one hash agg; integer-only, so the edge SET is deterministic
    cross-engine.  The single shared definition feeds BOTH the k-core and
    the item-item CF queries — edits here cannot desynchronize them."""
    from summarydb_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, "o")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= 2)
    )
    return e if with_support else e.select("a", "b")


def q_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the support>=2 part co-purchase graph (the assortment
    backbone: parts that remain after iteratively peeling everything
    co-bought with fewer than 2 surviving partners).  Distributed
    peeling via functions.dedup.kcore (monotone alive-count convergence,
    lineage-checkpointed rounds); the oracle unrolls the SAME 12 peel
    rounds as chained materialized CTEs, so a hash-match proves the
    loop's early-exit produces exactly the fixed-round semantics.
    Convergence within the budget is pinned by tests at both gate scales
    (measured: 3 rounds at sf0.01, 5 at sf0.1) — and since round 8 the
    budget is a RAISING safety valve (kcore errors rather than silently
    returning a superset), so the fixed-round oracle is valid precisely
    because a non-converged run can never return."""
    from summarydb_spark.functions.dedup import kcore

    core = kcore(
        _copurchase_edges(spark, sf_dir), k=_KCORE_K, max_rounds=_KCORE_ROUNDS
    )
    return core.select(
        F.col("node").alias("part_id"), "deg_core"
    ).orderBy("part_id")


def _oracle_kcore() -> str:
    rounds = []
    prev = "a0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(
            f""",
a{i} AS MATERIALIZED (
  SELECT n FROM (
    SELECT u.a AS n, count(*) AS d
    FROM u JOIN {prev} x ON u.a = x.n JOIN {prev} y ON u.b = y.n
    GROUP BY u.a
  ) WHERE d >= {_KCORE_K}
)"""
        )
        prev = f"a{i}"
    body = "".join(rounds)
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
u AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
a0 AS (SELECT DISTINCT a AS n FROM u){body}
SELECT u.a AS part_id, CAST(count(*) AS BIGINT) AS deg_core
FROM u JOIN {prev} x ON u.a = x.n JOIN {prev} y ON u.b = y.n
GROUP BY u.a
ORDER BY part_id"""


DF_QUERIES["kcore_copurchase"] = (q_kcore_copurchase, _oracle_kcore())


_LPA_ROUNDS = 3


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous SELF-INCLUSIVE label
    propagation on the support>=2 part co-purchase graph — 3 fixed
    rounds, majority label among neighbors + self, ties to the smaller
    label (exact integer rule; functions.dedup.label_propagation).
    Emits the top-20 communities
    with >= 2 members as (community, n_members), ordered (size DESC,
    community).  One rung above connected_components on the dup-graph
    ladder: CC merges everything touching, LPA splits chained
    boilerplate into densely-linked groups.  The oracle unrolls the
    SAME 3 rounds as chained CTEs, so a hash-match proves the loop's
    per-round majority/tiebreak semantics end-to-end."""
    from summarydb_spark.functions.dedup import label_propagation

    labels = label_propagation(
        _copurchase_edges(spark, sf_dir), rounds=_LPA_ROUNDS
    )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(20)
    )


def _oracle_lpa() -> str:
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT u.a AS v, l.lab, count(*) AS c
  FROM u JOIN {prev} l ON l.v = u.b
  GROUP BY u.a, l.lab
),
l{i} AS MATERIALIZED (
  SELECT v, lab FROM (
    SELECT v, lab,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS r
    FROM c{i}
  ) t WHERE r = 1
)"""
        )
        prev = f"l{i}"
    body = "".join(rounds)
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
u0 AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
u AS MATERIALIZED (SELECT a, b FROM u0
                   UNION ALL SELECT DISTINCT a, a FROM u0),
l0 AS (SELECT DISTINCT a AS v, a AS lab FROM u){body}
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members
FROM {prev}
GROUP BY lab HAVING count(*) >= 2
ORDER BY n_members DESC, community
LIMIT 20"""


DF_QUERIES["label_propagation_communities"] = (
    q_label_propagation,
    _oracle_lpa(),
)


def q_dedup_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator COMPOSITION: label-propagation communities over the
    t=0.2 NEAR-DUP PAIR GRAPH (the persisted pair store that
    dedup_ngram_jaccard reads) — the curation view one level above raw
    pairs: which groups of documents form densely-linked duplicate
    families (template farms, mirrored articles) vs mere chains.  Same
    3-round synchronous LPA and the same size rollup as the co-purchase
    twin; the oracle recomputes the pair relation EXHAUSTIVELY from raw
    text and unrolls the same 3 rounds, so the store, the banded
    generation behind it, and the community semantics are all gated by
    one hash-match."""
    from summarydb_spark.functions.dedup import label_propagation

    pairs = _ngram_pairs(spark, sf_dir, 0.2).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = label_propagation(pairs, rounds=_LPA_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(20)
    )


def _oracle_dedup_lpa() -> str:
    from summarydb_spark.plans.llm_sql import q_dedup_ngram_jaccard

    pair_sql = q_dedup_ngram_jaccard("duckdb", threshold=0.2)
    rounds = []
    prev = "l0"
    for i in range(1, _LPA_ROUNDS + 1):
        rounds.append(
            f""",
c{i} AS MATERIALIZED (
  SELECT u.a AS v, l.lab, count(*) AS c
  FROM u JOIN {prev} l ON l.v = u.b
  GROUP BY u.a, l.lab
),
l{i} AS MATERIALIZED (
  SELECT v, lab FROM (
    SELECT v, lab,
           row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS r
    FROM c{i}
  ) t WHERE r = 1
)"""
        )
        prev = f"l{i}"
    body = "".join(rounds)
    return f"""
WITH p AS MATERIALIZED ({pair_sql}),
u0 AS (SELECT doc_a AS a, doc_b AS b FROM p
       UNION ALL SELECT doc_b, doc_a FROM p),
u AS MATERIALIZED (SELECT a, b FROM u0
                   UNION ALL SELECT DISTINCT a, a FROM u0),
l0 AS (SELECT DISTINCT a AS v, a AS lab FROM u){body}
SELECT lab AS community, CAST(count(*) AS BIGINT) AS n_members
FROM {prev}
GROUP BY lab HAVING count(*) >= 2
ORDER BY n_members DESC, community
LIMIT 20"""


DF_QUERIES["dedup_communities_lpa"] = (
    q_dedup_communities_lpa,
    _oracle_dedup_lpa(),
)


# -- item-item collaborative filtering ---------------------------------------


def q_copurchase_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over the order-basket matrix:
    cosine similarity between parts' order-membership vectors
    (c_ij / sqrt(n_i * n_j), the classic Amazon item-to-item shape), top-5
    neighbors per part among pairs co-bought in >= 2 orders.

    Scale shape: the co-occurrence build fans out per order as
    (basket_size choose 2) — bounded by small baskets, never by the
    catalog — then one hash agg; the per-part top-k is a window over each
    part's candidate list (bounded by its co-purchase degree).  Binary
    cosine needs only integer counts: c_ij and n_i are exact, the
    products stay far below 2^53, and IEEE sqrt/divide are correctly
    rounded — so ORDERING on the raw double is deterministic cross-engine
    and only the EMITTED similarity is rounded."""
    from summarydb_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n_ord")
    )
    co = _copurchase_edges(spark, sf_dir, with_support=True).withColumnRenamed(
        "supp", "c"
    )
    sym = co.unionByName(
        co.select(F.col("b").alias("a"), F.col("a").alias("b"), "c")
    )
    scored = (
        sym.join(n.withColumnRenamed("p", "a"), "a")
        .withColumnRenamed("n_ord", "na")
        .join(n.withColumnRenamed("p", "b"), "b")
        .withColumnRenamed("n_ord", "nb")
        .select(
            F.col("a").alias("part_id"),
            F.col("b").alias("neighbor_id"),
            "c",
            (F.col("c") / F.sqrt(F.col("na") * F.col("nb"))).alias("_cos"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("part_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "part_id",
            "rnk",
            "neighbor_id",
            F.col("c").cast("long").alias("n_co_orders"),
            F.round("_cos", 6).alias("cosine"),
        )
        .orderBy("part_id", "rnk")
    )


ORACLE_COPURCHASE_SIM = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT l_partkey AS p, count(*) AS n_ord FROM li GROUP BY 1),
co AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS c
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
sym AS (SELECT a, b, c FROM co UNION ALL SELECT b, a, c FROM co),
scored AS (
  SELECT sym.a AS part_id, sym.b AS neighbor_id, sym.c,
         sym.c / sqrt(na.n_ord * nb.n_ord) AS raw
  FROM sym JOIN n na ON na.p = sym.a JOIN n nb ON nb.p = sym.b
),
ranked AS (
  SELECT part_id, neighbor_id, c, raw,
         row_number() OVER (
           PARTITION BY part_id ORDER BY raw DESC, neighbor_id
         ) AS rnk
  FROM scored
)
SELECT part_id, CAST(rnk AS INTEGER) AS rnk, neighbor_id,
       CAST(c AS BIGINT) AS n_co_orders, round(raw, 6) AS cosine
FROM ranked WHERE rnk <= 5
ORDER BY part_id, rnk"""


DF_QUERIES["copurchase_similarity_topk"] = (
    q_copurchase_similarity_topk,
    ORACLE_COPURCHASE_SIM,
)


# -- two-sample Kolmogorov-Smirnov drift --------------------------------------


def q_ks_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between the first and
    second half of the events timeline (split at the midpoint day):
    D = max_v |F1(v) - F2(v)| over the pooled support.  Complements the
    binned PSI drift (psi_feature_drift) with the exact order-statistic
    distance.

    Exactness: values are integer cents, ECDF numerators are integer
    cumulative counts, and D is reported as the exact integer
    d_num = max |c1*n2 - c2*n1| over common denominator n1*n2 — no
    float comparisons anywhere near the argmax (the 2^53 headroom is
    ample: c*n < 1e12 at sf1).  Scale shape: one hash agg to per-(value,
    half) counts — everything after runs on the DISTINCT value spine
    (bounded by the value domain, here <= 100k cents, not by event
    count); at wider domains pre-bin the spine.  The single-partition
    cumulative window is over that bounded spine only."""
    from summarydb_spark.plans.portable_sql import epoch_us
    from summarydb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.expr(f"CAST(floor({epoch_us('ts', 'spark')} / 86400000000.0) AS BIGINT)").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    lo, hi = ev.agg(F.min("day"), F.max("day")).first()
    mid = (int(lo) + int(hi)) // 2
    halves = ev.withColumn(
        "h", F.when(F.col("day") <= F.lit(mid), F.lit(1)).otherwise(F.lit(2))
    )
    counts = halves.groupBy("v").agg(
        F.sum(F.when(F.col("h") == 1, 1).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("h") == 2, 1).otherwise(0)).alias("k2"),
    )
    from pyspark.sql import Window as W

    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = counts.select(
        "v",
        F.sum("k1").over(w).alias("c1"),
        F.sum("k2").over(w).alias("c2"),
    )
    # totals from the tiny counts spine — NOT a second scan of events
    tot = counts.agg(
        F.sum("k1").alias("n1"), F.sum("k2").alias("n2")
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias(
            "gap"
        ),
    )
    best = gap.orderBy(F.col("gap").desc(), F.col("v")).limit(1)
    return best.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("gap").cast("long").alias("d_num"),
        F.col("v").alias("at_v"),
        F.round(F.col("gap") / (F.col("n1") * F.col("n2")), 6).alias("d"),
    )


ORACLE_KS_DRIFT = """
WITH ev AS (
  SELECT CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
mid AS (SELECT (min(day) + max(day)) // 2 AS m FROM ev),
h AS (
  SELECT v, CASE WHEN day <= mid.m THEN 1 ELSE 2 END AS h
  FROM ev, mid
),
counts AS (
  SELECT v,
         count(*) FILTER (h = 1) AS k1,
         count(*) FILTER (h = 2) AS k2
  FROM h GROUP BY v
),
cum AS (
  SELECT v,
         sum(k1) OVER (ORDER BY v) AS c1,
         sum(k2) OVER (ORDER BY v) AS c2
  FROM counts
),
tot AS (
  SELECT count(*) FILTER (h = 1) AS n1, count(*) FILTER (h = 2) AS n2 FROM h
),
gap AS (
  SELECT v, n1, n2, abs(c1 * n2 - c2 * n1) AS g FROM cum, tot
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(g AS BIGINT) AS d_num, v AS at_v,
       round(g / (n1 * n2), 6) AS d
FROM gap ORDER BY g DESC, v LIMIT 1"""


DF_QUERIES["ks_drift_halves"] = (q_ks_drift_halves, ORACLE_KS_DRIFT)


# -- bucketed co-located join -------------------------------------------------


def _ensure_bucketed_sales(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Catalog-register bucketed, sorted copies of orders/lineitem
    (8 buckets on the join key) persisted under the store dir — the
    co-located layout a 100 TB warehouse writes ONCE so every later
    orderkey join runs with no exchange and no sort on either side.
    Table names carry the source fingerprint so different sf_dirs never
    collide inside one session."""
    import re

    from summarydb_spark.sources.tables import _store_path, load_table

    fp = re.sub(
        r"\W", "_", os.path.basename(os.path.dirname(_store_path(sf_dir, "x")))
    )
    names = {}
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        name = f"b_{tbl}_{fp}"
        if not spark.catalog.tableExists(name):
            (
                # repartition onto the bucket hash first: ONE file per
                # bucket, which is the layout Spark requires to elide the
                # merge-join Sort from sorted-bucket metadata (multi-file
                # buckets keep per-file order only, so the read re-sorts)
                load_table(spark, sf_dir, tbl)
                .repartition(8, F.col(key))
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", _store_path(sf_dir, f"bucketed_{tbl}"))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
        names[tbl] = name
    return names["orders"], names["lineitem"]


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority over the BUCKETED orders-lineitem join:
    both tables are pre-bucketed and sorted on the order key (build once,
    _ensure_bucketed_sales), so the join itself needs no shuffle and no
    sort — the only exchange left in the plan is the final 5-group
    aggregate.  tests/test_plans.py pins the exchange-free join plan with
    broadcast disabled (at gate scale Catalyst rightly prefers broadcast;
    at 100 TB neither side broadcasts and the bucketed layout is what
    keeps the join local).  Values are exact integer cents."""
    o_t, l_t = _ensure_bucketed_sales(spark, sf_dir)
    o = spark.table(o_t)
    li = spark.table(l_t)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "revenue_c"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BUCKETED_JOIN = """
SELECT o.o_orderpriority,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority"""


DF_QUERIES["bucketed_join_revenue"] = (
    q_bucketed_join_revenue,
    ORACLE_BUCKETED_JOIN,
)


# -- custom stateful sessionizer (EventTimeTimeout) ---------------------------


def q_streaming_session_timeout_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful sessionizer under real Structured Streaming:
    applyInPandasWithState holds one open session per user, appends a
    session the moment a successor event proves it closed, and lets the
    WATERMARK close trailing sessions via an event-time TIMEOUT — the
    arbitrary-stateful-processing contract (GroupState get/update/remove
    + setTimeoutTimestamp) that the built-in session_window gate cannot
    exercise.  availableNow runs one data batch, then the no-data batch
    advances the watermark to max(ts)-1h and fires the timeouts; trailing
    sessions still inside the watermark horizon stay open and are
    withheld, exactly as a live deployment would withhold them.  The
    oracle replays that split in batch SQL: every non-final session per
    user, plus final sessions whose (ms-floored) end + gap clears the
    final watermark."""
    return _session_timeout_stream(
        spark, sf_dir, "streaming_session_timeout_gate_sink", None
    )


def _session_timeout_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    state_store: str | None,
    api: str = "applyInPandasWithState",
) -> DataFrame:
    from summarydb_spark.streaming.stateful import (
        sessionize_with_timeout,
        sessionize_with_tws,
    )

    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    glob = os.path.join(sf_dir, "events.[p]arquet")
    stream = (
        spark.readStream.schema(schema)
        .parquet(glob)
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ltz").alias("tstamp"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("t"),
        )
        .withWatermark("tstamp", "1 hour")
    )
    sessionize = (
        sessionize_with_tws
        if api == "transformWithStateInPandas"
        else sessionize_with_timeout
    )
    out = sessionize(stream)
    return _run_stream_to_memory(
        out,
        name,
        spark,
        state_store=state_store,
        sources=(path,),
    ).select("user_id", "n_events", "t_start", "t_end")


def q_streaming_session_rocksdb_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful sessionizer PINNED to the off-heap RocksDB
    state-store provider (streaming/state.py) — the 100 TB deployment
    configuration, where state is bounded by local disk instead of
    executor heap.  Same machinery and same oracle as
    streaming_session_timeout_gate: a green row here is the per-round
    driver-verified proof that the engine's stateful semantics are
    provider-independent (sf1 soak: 909,400 rows identical, RocksDB
    faster than heap — BASELINE.md round 8)."""
    return _session_timeout_stream(
        spark, sf_dir, "streaming_session_rocksdb_gate_sink", "rocksdb"
    )


# Sessions from the canonical lag+running-sum replay; EMITTED = every
# session with a successor session for that user (closed by an in-batch
# event), plus last-per-user sessions whose timeout timestamp
# (ms-floored end + 1h gap) is STRICTLY below the final watermark
# (ms-floored global max(ts) - 1h delay) — Spark fires event-time
# timeouts only when timeoutTimestamp < watermark
# (FlatMapGroupsWithStateExec), so at exact equality the engine
# withholds the session.  Spark tracks event time in ms (same floor as
# the watermark-gate oracle).  The running-sum window carries the same
# (t, event_id) tiebreak as the lag that computes new_s, so duplicate
# timestamps at a session boundary can't sum a new_s=0 row ahead of its
# opener.
ORACLE_SESSION_TIMEOUT = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
wm AS (
  SELECT CAST(floor(max(t) / 1000.0) AS BIGINT) - 3600000 AS wm_ms FROM e
),
d AS (
  SELECT user_id, t, event_id,
         CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                   OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) > 3600000000
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, t,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
  FROM d
),
sess AS (
  SELECT user_id, sid, count(*) AS n_events, min(t) AS t_start, max(t) AS t_end
  FROM s GROUP BY user_id, sid
),
flagged AS (
  SELECT user_id, n_events, t_start, t_end,
         sid = max(sid) OVER (PARTITION BY user_id) AS is_last
  FROM sess
)
SELECT user_id, n_events, t_start, t_end
FROM flagged, wm
WHERE NOT is_last
   OR CAST(floor(t_end / 1000.0) AS BIGINT) + 3600000 < wm.wm_ms"""


# transformWithStateInPandas variant: implemented and oracle-compatible
# (streaming/stateful.sessionize_with_tws shares the merge core and the
# same ORACLE_SESSION_TIMEOUT applies), but NOT registered — Spark 4's
# TWS state protocol needs google.protobuf, absent from this container
# (env gate, the functions/multimodal.py codec pattern); the parity test
# (tests/test_stateful.py::test_tws_sessionizer_parity) auto-enables
# where protobuf exists.
DF_QUERIES["streaming_session_timeout_gate"] = (
    q_streaming_session_timeout_gate,
    ORACLE_SESSION_TIMEOUT,
)
DF_QUERIES["streaming_session_rocksdb_gate"] = (
    q_streaming_session_rocksdb_gate,
    ORACLE_SESSION_TIMEOUT,
)


def _run_stream_to_memory(df, name: str, spark: SparkSession,
                          state_partitions: int | None = None,
                          state_store: str | None = None,
                          sources: tuple = (),
                          output_mode: str = "append",
                          no_data_batch: bool = True) -> DataFrame:
    """Start ``df`` as an availableNow stream into a memory sink and
    return the sink table.  Stateful streaming operators allocate one
    state store PER shuffle partition per side; a fresh 2-source
    interval join at the session default (32) spins up ~128 stores of a
    few rows each, which is pure fixed cost at gate scale — so the gate
    sizes ``spark.sql.shuffle.partitions`` to the STREAM for the
    duration of the run (the standard deployment practice: state
    partition count is fixed at a checkpoint's first run) and restores
    the session default afterwards.  The count is scale-adaptive —
    derived from the source volume via
    ``streaming.state.stream_shuffle_partitions`` (``sources`` lists the
    source files/dirs; an explicit ``state_partitions`` pins it) — NOT a
    constant tuned to either gate scale or the local core count.
    ``state_store`` (or the SPARK_GRAFT_STATE_STORE env var) selects the
    state-store provider for this query — "rocksdb" = off-heap,
    disk-bounded state, the 100 TB deployment default
    (streaming/state.py).

    ``no_data_batch=False`` skips the trailing no-data micro-batch.
    availableNow runs one extra batch after the data drains solely to
    advance the watermark (evicting state and firing watermark-gated
    output); for a query whose SINK content cannot change in that batch
    — an INNER stream-stream join (matches are emitted in the data
    batch; the no-data batch only evicts) or a COMPLETE-mode aggregate
    (the no-data batch rewrites the sink with the identical result) —
    it is a full state-store open/commit wave plus a plan execution for
    nothing, a measured 0.6-1.3 s per gate at sf0.1.  State eviction is
    moot here: the query terminates and its ephemeral checkpoint is
    deleted.  Callers that NEED the no-data batch (append-mode
    watermarked aggregates, outer joins, event-time timeouts) keep the
    default.  The checkpoint itself is an ephemeral per-run directory
    on tmpfs where available (streaming/state.ephemeral_checkpoint):
    every state commit and offset/commit-log write fsyncs, pure fixed
    cost per batch on a disk-backed temp dir."""
    from summarydb_spark.streaming.state import (
        ephemeral_checkpoint,
        scoped_conf,
        scoped_shuffle_partitions,
        stream_shuffle_partitions,
        use_state_store,
    )

    if state_partitions is None:
        state_partitions = stream_shuffle_partitions(spark, *sources)
    spark.catalog.dropTempView(name)
    with scoped_shuffle_partitions(spark, state_partitions):
        with ephemeral_checkpoint() as ckpt, scoped_conf(
            spark,
            "spark.sql.streaming.noDataMicroBatches.enabled",
            None if no_data_batch else "false",
        ):
            with use_state_store(spark, state_store):
                q = (
                    df.writeStream.format("memory")
                    .queryName(name)
                    .outputMode(output_mode)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                )
            q.awaitTermination()
    return spark.table(name)


# -- stream-stream interval join ----------------------------------------------


def q_streaming_interval_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join under real Structured Streaming — the
    one streaming primitive no other gate exercises: two readStream
    sources (views / purchases of the same events table), each
    watermarked 1h, inner-joined on user with the purchase constrained
    to [view_t, view_t + 1h].  Spark buffers BOTH sides in state and
    uses the watermarks + time bound to evict rows that can no longer
    match — the attribution-join shape every clickstream pipeline runs.
    With availableNow the whole source lands in one micro-batch, so the
    inner join's emitted set equals the batch interval join exactly
    (state eviction can only drop rows whose match window has passed —
    none can be missed within one batch), which is precisely what the
    oracle replays in SQL."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema

    def src(glob: str, etype: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(os.path.join(sf_dir, glob))
            .where(F.col("event_type") == etype)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").cast("timestamp_ltz").alias(f"{prefix}_ts"),
                F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias(
                    f"{prefix}_t"
                ),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    v = src("events.[p]arquet", "view", "v")
    p = src("events.[pq]arquet", "purchase", "p")
    j = v.join(
        p,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts AND "
            "p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
    )
    return _run_stream_to_memory(
        j,
        "streaming_interval_join_gate_sink",
        spark,
        sources=(path, path),
        # INNER join: every match is emitted by the data batch itself;
        # the no-data batch only evicts state the terminating query
        # discards anyway (sink provably unchanged — oracle MATCH)
        no_data_batch=False,
    ).select(
        F.col("v_user").alias("user_id"),
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("v_t").alias("t_view"),
        F.col("p_t").alias("t_purchase"),
    )


ORACLE_STREAMING_INTERVAL_JOIN = """
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS t_view
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS t_purchase
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_id, p.purchase_id, v.t_view, p.t_purchase
FROM v JOIN p
  ON p.user_id = v.user_id
 AND p.t_purchase >= v.t_view
 AND p.t_purchase <= v.t_view + 3600000000"""


DF_QUERIES["streaming_interval_join_gate"] = (
    q_streaming_interval_join_gate,
    ORACLE_STREAMING_INTERVAL_JOIN,
)


def q_streaming_outer_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the variant where the
    WATERMARK changes the output: matched pairs emit like the inner
    gate, and a view with no purchase emits a NULL-padded row only once
    the global watermark passes its match horizon (view_t + 1h), i.e.
    state eviction proves no future purchase can ever match it.  Views
    whose horizon is still inside the watermark are withheld — exactly
    the late-attribution contract of a live pipeline.  The oracle
    replays both halves in batch SQL: the full interval join, plus
    unmatched views with floor_ms(view_t) + 1h strictly below the final
    combined watermark (min of the two sides' max event times, ms
    floored, minus the 1h delay)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema

    def src(glob: str, etype: str, prefix: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .parquet(os.path.join(sf_dir, glob))
            .where(F.col("event_type") == etype)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").cast("timestamp_ltz").alias(f"{prefix}_ts"),
                F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias(
                    f"{prefix}_t"
                ),
            )
            .withWatermark(f"{prefix}_ts", "1 hour")
        )

    v = src("events.[p]arquet", "view", "v")
    p = src("events.[pq]arquet", "purchase", "p")
    j = v.join(
        p,
        F.expr(
            "v_user = p_user AND p_ts >= v_ts AND "
            "p_ts <= v_ts + INTERVAL 1 HOUR"
        ),
        "leftOuter",
    )
    return _run_stream_to_memory(
        j, "streaming_outer_join_gate_sink", spark, sources=(path, path)
    ).select(
        F.col("v_user").alias("user_id"),
        F.col("v_id").alias("view_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("v_t").alias("t_view"),
        F.col("p_t").alias("t_purchase"),
    )


ORACLE_STREAMING_OUTER_JOIN = """
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS t_view
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS t_purchase
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least(
           (SELECT CAST(floor(max(t_view) / 1000.0) AS BIGINT) FROM v),
           (SELECT CAST(floor(max(t_purchase) / 1000.0) AS BIGINT) FROM p)
         ) - 3600000 AS wm_ms
),
matched AS (
  SELECT v.user_id, v.view_id, p.purchase_id, v.t_view, p.t_purchase
  FROM v JOIN p
    ON p.user_id = v.user_id
   AND p.t_purchase >= v.t_view
   AND p.t_purchase <= v.t_view + 3600000000
)
SELECT * FROM matched
UNION ALL
SELECT v.user_id, v.view_id, CAST(NULL AS BIGINT) AS purchase_id,
       v.t_view, CAST(NULL AS BIGINT) AS t_purchase
FROM v, wm
WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.view_id = v.view_id)
  AND CAST(floor(v.t_view / 1000.0) AS BIGINT) + 3600000 < wm.wm_ms"""


DF_QUERIES["streaming_outer_join_gate"] = (
    q_streaming_outer_join_gate,
    ORACLE_STREAMING_OUTER_JOIN,
)
