"""DataFrame-built driver queries for the LSH operator family.

MinHash/SimHash/hyperplane band collisions are hash-function-specific, so
no portable SQL oracle exists; these are registered with ``None`` oracle
(driver records rows-only).  Where an exact-SQL equivalent *is* feasible
(embedding near-dups verified at a high threshold over a blocked candidate
space), an oracle is provided.
"""

from __future__ import annotations

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


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (true Jaccard >= 0.8) surfaced by banded
    MinHash LSH.  Rows-only check: band collisions aren't portable SQL."""
    out = dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), num_hashes=64, bands=16, threshold=0.8
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 of the 63-bit
    signature.  Rows-only check."""
    out = dedup.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)
    return out.orderBy("id_a", "id_b")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dups (cosine >= 0.99) via hyperplane LSH + exact
    verify.  Rows-only check (LSH recall is probabilistic by design)."""
    out = dedup.embedding_near_dups(
        _embs(spark, sf_dir), threshold=0.99, n_planes=12, probe_hamming=1
    )
    return out.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).orderBy("id_a", "id_b")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors for 20 probe vectors via multi-table
    hyperplane LSH.  Rows-only check."""
    embs = _embs(spark, sf_dir)
    queries = embs.where("vec_id < 20")
    return similarity.lsh_topk(
        embs, queries, k=5, n_planes=8, n_tables=6, probe_hamming=2
    ).orderBy("query_id", "rnk")


# name -> (spark_builder, oracle_sql | None)
DF_QUERIES = {
    "dedup_minhash_lsh": (q_dedup_minhash, None),
    "dedup_simhash": (q_dedup_simhash, None),
    "embedding_near_dups": (q_embedding_near_dups, None),
    "ann_lsh_topk": (q_ann_lsh_topk, None),
}
