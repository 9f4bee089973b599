"""Pipeline-extension operators: k-means Lloyd, inverted index,
train/val/test split, bigram KN stats, length-bucket packing.

Semantics tests run at sf0.001; plan pins follow tests/test_plans.py
(broadcast where designed, no cartesian products, pruned scans).
"""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def run(spark, name):
    return entry.queries()[name](spark, SF_DIR)


def plan_of(spark, name: str) -> str:
    df = run(spark, name)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_kmeans_partitions_all_vectors(spark):
    rows = run(spark, "kmeans_lloyd_embeddings").collect()
    n_total = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r.n_vecs for r in rows) == n_total  # every vec assigned once
    assert 1 <= len(rows) <= 8
    for r in rows:
        assert r.inertia_micro >= 0
        assert r.centroid_norm2_micro >= 0


def test_kmeans_centroids_broadcast_no_cartesian(spark):
    plan = plan_of(spark, "kmeans_lloyd_embeddings")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # centroids are k x dims — broadcast
    assert "InMemoryTableScan" in plan  # exploded dims persisted, not re-read


def test_inverted_index_postings_consistent(spark):
    rows = run(spark, "inverted_index_postings").collect()
    assert rows, "df band empty at sf0.001"
    for r in rows:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == r.df
        assert ids[0] == r.first_doc and ids[-1] == r.last_doc
        assert 4 <= r.df <= 40


def test_split_train_val_test_partitions_corpus(spark):
    rows = run(spark, "split_train_val_test").collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert {r.split for r in rows} <= {"train", "val", "test"}
    by_split = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    # 98/1/1 split: train strictly dominates at any corpus size
    assert by_split.get("train", 0) > by_split.get("val", 0)
    assert by_split.get("train", 0) > by_split.get("test", 0)


def test_bigram_kn_stats_counts_sane(spark):
    rows = run(spark, "bigram_lm_kn_stats").collect()
    assert 0 < len(rows) <= 30
    counts = [r.bigram_count for r in rows]
    assert counts == sorted(counts, reverse=True)  # top-k by count
    for r in rows:
        # a bigram's own (w1, w2) cell contributes to both type counts
        assert r.continuation_w2 >= 1 and r.fertility_w1 >= 1


def test_length_buckets_pack_all_docs(spark):
    rows = run(spark, "length_bucket_batches").collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.cap == 2 ** (r.bucket + 1) - 1
        assert r.n_batches == (r.n_docs + 31) // 32
        assert 0 <= r.waste_to_max <= r.waste_to_cap


def test_split_and_buckets_are_single_aggregate(spark):
    """Both bookkeeping queries must stay join-free scans + one hash
    aggregate (split) / broadcast-spine join + one aggregate (buckets)."""
    plan = plan_of(spark, "split_train_val_test")
    assert "Join" not in plan
    assert "HashAggregate" in plan
    plan = plan_of(spark, "length_bucket_batches")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_bigram_no_token_self_join(spark):
    """Bigrams come from the index spine over each token array — no
    self-join of an exploded token table."""
    plan = plan_of(spark, "bigram_lm_kn_stats")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
