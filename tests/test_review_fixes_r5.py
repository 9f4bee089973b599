"""Regression tests for the round-5 review findings on dedup / similarity /
query_df: cross-stream qid collisions, NULL-text dedup drops, label-sum
overflow, zero-norm vectors, prebuilt-index dim mismatch, Hamming-2
probing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_range_frames_key_on_stream_id(spark):
    """Two streams issuing the same (qid, t0, t1) — the portable_sql twin
    emits a constant qid per stream — must not cross-match: 2 rows out,
    each stream seeing only its own windows."""
    from summarydb_spark.operators.query_df import (
        approx_range_frame,
        minmax_range_frame,
    )

    summary = spark.createDataFrame(
        [
            (1, 0, 9, 10.0, 100.0, 50.0, 1.0),
            (2, 0, 9, 7.0, 7.0, 2.0, 0.5),
        ],
        "stream_id long, time_start long, time_end long, "
        "count double, sum double, max double, min double",
    )
    ranges = spark.createDataFrame(
        [(1, 0, 0, 9), (2, 0, 0, 9)],
        "stream_id long, qid long, t0 long, t1 long",
    )
    rows = approx_range_frame(summary, ranges, "sum").collect()
    assert len(rows) == 2
    got = {r["stream_id"]: r["value"] for r in rows}
    assert got[1] == 100.0 and got[2] == 7.0

    rows = minmax_range_frame(summary, ranges, "max").collect()
    assert len(rows) == 2
    got = {r["stream_id"]: r["value"] for r in rows}
    assert got[1] == 50.0 and got[2] == 2.0


def test_exact_dedup_passes_null_text_through(spark):
    from summarydb_spark.functions.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "hello  WORLD"), (4, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["is_duplicate"] for r in exact_dedup(df).collect()}
    # every row survives; NULL texts are not content-equal to anything
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1] is False and rows[3] is True
    assert rows[2] is False and rows[4] is False


def test_connected_components_with_63bit_node_ids(spark):
    """Node ids near 2^62 (hash-derived, the 100 TB case) overflowed the
    long label-sum convergence check under ANSI mode."""
    from summarydb_spark.functions.dedup import connected_components

    big = 1 << 62
    edges = spark.createDataFrame(
        [(big, big + 1), (big + 1, big + 2), (big + 7, big + 8)],
        "src long, dst long",
    )
    comp = {
        r["node"]: r["component"] for r in connected_components(edges).collect()
    }
    assert comp[big] == comp[big + 1] == comp[big + 2] == big
    assert comp[big + 7] == comp[big + 8] == big + 7


def _rand_vecs(spark, n, dim, seed=7, with_zero=None):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    if with_zero is not None:
        rows.append((with_zero, [0.0] * dim))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_and_pq_total_on_zero_vectors(spark):
    """A zero-norm embedding anywhere (corpus or probes) must not crash the
    encode/search paths under ANSI mode; zero probes yield no rows and
    zero corpus vectors are excluded from the index."""
    from summarydb_spark.functions import similarity

    corpus = _rand_vecs(spark, 40, 16, with_zero=900)
    queries = _rand_vecs(spark, 3, 16, seed=11, with_zero=901)

    cent = similarity.train_ivf_centroids(corpus, n_centroids=4)
    enc = similarity.ivf_encode(corpus, cent)
    assert enc.where("neighbor_id = 900").count() == 0
    out = similarity.ivf_topk(None, queries, k=2, n_probe=4,
                              centroids=cent, encoded=enc)
    got = out.select("query_id").distinct().collect()
    assert 901 not in {r["query_id"] for r in got}

    books = similarity.train_pq_codebooks(corpus, m=4, k=8)
    encp = similarity.pq_encode(corpus, books)
    assert encp.where("neighbor_id = 900").count() == 0
    outp = similarity.pq_topk(None, queries, books, k=2, rerank=8,
                              encoded=encp)
    assert 901 not in {r["query_id"] for r in outp.select("query_id").distinct().collect()}


def test_lsh_prebuilt_index_dim_mismatch_fails_fast(spark):
    from summarydb_spark.functions import similarity

    corpus = _rand_vecs(spark, 30, 16)
    enc = similarity.lsh_encode(corpus, dim=16, n_planes=6, n_tables=2)
    queries = _rand_vecs(spark, 2, 8, seed=3)
    with pytest.raises(ValueError, match="dim"):
        similarity.lsh_topk(
            None, queries, k=2, dim=16, n_planes=6, n_tables=2, encoded=enc
        ).collect()


def test_embedding_near_dups_hamming2_is_superset(spark):
    from summarydb_spark.functions.dedup import embedding_near_dups

    df = _rand_vecs(spark, 120, 8, seed=5)

    def pairs(ph):
        return {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dups(
                df, threshold=0.5, dim=8, n_planes=10, probe_hamming=ph
            ).collect()
        }

    p1, p2 = pairs(1), pairs(2)
    assert p1 <= p2
