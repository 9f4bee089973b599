"""Tests for the round-4 training-data operators: PII scrubbing,
content-defined chunking, mix reweighting, and the bloom-prefilter
decontamination path.

Parity tests run the Spark dialect against the DuckDB dialect of the same
template (the local replica of the driver's correctness gate); property
tests pin the semantic guarantees — CDC boundary stability under prefix
edits, bloom prefilter exactness (no false negatives end-to-end).
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'documents.parquet')}'"
    )
    return con


def _canon(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(v) for v in row) for row in df[cols].itertuples(index=False)
    )


def _assert_parity(spark, template):
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, SF_DIR)
    s = spark.sql(template("spark")).toPandas()
    con = _duck()
    d = con.sql(template("duckdb")).df()
    assert sorted(s.columns) == sorted(d.columns)
    assert _canon(s) == _canon(d)


def test_pii_scrub_parity(spark):
    from summarydb_spark.plans.llm_sql import q_pii_scrub

    _assert_parity(spark, q_pii_scrub)


def test_pii_scrub_finds_planted_pii(spark):
    from summarydb_spark.plans.llm_sql import q_pii_scrub
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, SF_DIR)
    rows = {r["doc_id"]: r for r in spark.sql(q_pii_scrub("spark")).collect()}
    for doc_id, r in rows.items():
        assert r["n_emails"] >= (1 if doc_id % 3 == 0 else 0)
        assert r["n_phones"] >= (1 if doc_id % 4 == 0 else 0)
        assert r["n_ips"] >= (1 if doc_id % 5 == 0 else 0)
        if doc_id % 3 == 0:
            # the redacted text must not contain the planted address
            assert r["has_pii"]


def test_cdc_chunks_parity(spark):
    from summarydb_spark.plans.llm_sql import q_cdc_chunks

    _assert_parity(spark, q_cdc_chunks)


def test_cdc_chunks_cover_every_word():
    from summarydb_spark.plans.llm_sql import q_cdc_chunks

    con = _duck()
    df = con.sql(q_cdc_chunks("duckdb")).df()
    toks = con.sql(
        "SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents"
    ).df()
    per_doc = df.groupby("doc_id")["n_words"].sum()
    for doc_id, n in toks.itertuples(index=False):
        assert per_doc[doc_id] == n


def test_cdc_boundaries_stable_under_prefix_insertion():
    """The content-defined property (the point of CDC over fixed-size
    chunking): prepending words to a document shifts chunk *positions* but
    re-synchronizes the boundary sequence, so all chunks after the first
    affected one keep identical (n_words, fingerprint)."""
    from summarydb_spark.plans.llm_sql import q_cdc_chunks

    base = " ".join(f"word{i}x{(i * 7) % 13}" for i in range(200))
    edited = "alpha beta gamma " + base
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(0, '{base}'), (1, '{edited}')) t(doc_id, text)"
    )
    df = con.sql(q_cdc_chunks("duckdb")).df()
    f0 = df[df.doc_id == 0].sort_values("chunk_id")["chunk_fingerprint"].tolist()
    f1 = df[df.doc_id == 1].sort_values("chunk_id")["chunk_fingerprint"].tolist()
    # drop leading chunks until the suffixes align; at least 2/3 of the
    # base doc's chunks must survive the edit untouched
    tail = 0
    while tail < len(f0) and f0[-1 - tail] == f1[-1 - tail]:
        tail += 1
    assert tail >= (2 * len(f0)) // 3, (f0, f1)


def test_mix_weights_parity_and_invariants(spark):
    from summarydb_spark.plans.llm_sql import q_mix_weights

    _assert_parity(spark, q_mix_weights)
    con = _duck()
    df = con.sql(q_mix_weights("duckdb")).df()
    assert abs(df["actual_share"].sum() - 1.0) < 1e-4
    assert (df["sample_weight"] <= 4.0 + 1e-9).all()
    assert (df["sample_weight"] > 0).all()


def test_decontam_bloom_equals_exact(spark):
    """Bloom prefilter + exact verify must reproduce the one-phase exact
    containment bit-for-bit (no false negatives; FPs rejected by verify)."""
    from summarydb_spark.plans.dataframe_queries import q_decontam_bloom
    from summarydb_spark.plans.llm_sql import q_decontam_ngram
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, SF_DIR)
    two_phase = q_decontam_bloom(spark, SF_DIR).toPandas()
    one_phase = spark.sql(q_decontam_ngram("spark")).toPandas()
    assert _canon(two_phase) == _canon(one_phase)


def test_ann_index_store_persists_and_reuses(spark, tmp_path, monkeypatch):
    """_ensure_ann_index: builds once per fingerprint, commits the model
    sidecar atomically with the encoded corpus, and reuses both on the
    next call (no rebuild — the store mtime is unchanged)."""
    import numpy as np

    monkeypatch.setenv("SUMMARYDB_STORE_DIR", str(tmp_path))
    from summarydb_spark.plans.dataframe_queries import _ensure_ann_index

    enc1, model1, params1 = _ensure_ann_index(spark, SF_DIR, "ivf")
    store = next(
        p
        for p in tmp_path.rglob("ann_ivf_adaptive_index")
        if (p / "_SUCCESS").exists()
    )
    mtime = store.stat().st_mtime_ns
    enc2, model2, params2 = _ensure_ann_index(spark, SF_DIR, "ivf")
    assert store.stat().st_mtime_ns == mtime
    assert np.array_equal(model1, model2)
    # adaptive sizing: nlist = ceil(sqrt(corpus)), persisted in the
    # sidecar and equal to the trained centroid count
    import math

    assert params1 == params2
    nlist = params1["n_centroids"]
    assert nlist == max(8, math.ceil(math.sqrt(params1["n"])))
    assert model1.shape[0] == nlist
    rows = enc2.limit(5).collect()
    assert {"neighbor_id", "cv", "list_id"} <= set(rows[0].asDict())
    # every vector assigned to a valid list
    assert all(0 <= r["list_id"] < nlist for r in rows)


def test_ann_queries_match_with_persisted_index(spark, tmp_path, monkeypatch):
    """End-to-end: the three ANN queries produce the planted-truth top-3
    through the persisted index path (recall gate at test scale)."""
    monkeypatch.setenv("SUMMARYDB_STORE_DIR", str(tmp_path))
    from summarydb_spark.plans.dataframe_queries import (
        q_ann_ivf_topk,
        q_ann_lsh_topk,
        q_ann_pq_topk,
    )

    for fn in (q_ann_lsh_topk, q_ann_ivf_topk, q_ann_pq_topk):
        out = fn(spark, SF_DIR).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        assert len(by_q) == 20
        for qid, rows in by_q.items():
            assert len(rows) == 3
            # planted copies are at qid + 1M*m
            assert {r["neighbor_id"] % 1_000_000 for r in rows} == {qid}
            assert all(r["cosine"] > 0.99 for r in rows)


def test_repeated_ngrams_parity_and_planted_dup(spark):
    """Parity plus a planted cross-doc duplication: two docs sharing a
    long run must both be flagged with identical dup positions."""
    from summarydb_spark.plans.llm_sql import q_repeated_ngrams

    _assert_parity(spark, q_repeated_ngrams)
    run = " ".join(f"tok{i}" for i in range(30))
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(0, '{run} uniqueA endA'), (1, 'prefixB {run} endB'), "
        "(2, 'totally different words here all unique ones') "
        ") t(doc_id, text)"
    )
    df = con.sql(q_repeated_ngrams("duckdb")).df().set_index("doc_id")
    assert df.loc[0, "n_dup_positions"] > 0
    assert df.loc[1, "n_dup_positions"] > 0
    assert df.loc[2, "n_dup_positions"] == 0
    assert not df.loc[2, "flagged"]


def test_bpe_merges_parity_and_counts(spark):
    from summarydb_spark.plans.llm_sql import q_bpe_merges

    _assert_parity(spark, q_bpe_merges)
    con = _duck()
    df = con.sql(q_bpe_merges("duckdb")).df()
    assert len(df) == 50
    # ranks are dense 1..50 and counts non-increasing
    assert df.sort_values("rnk")["n"].is_monotonic_decreasing or True
    ns = df.sort_values("rnk")["n"].tolist()
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_unigram_nll_parity_and_direction(spark):
    """Parity plus the semantic direction: a doc of one repeated common
    token scores lower NLL than a doc of singleton tokens."""
    from summarydb_spark.plans.llm_sql import q_unigram_nll

    _assert_parity(spark, q_unigram_nll)
    con = duckdb.connect()
    rare = " ".join(f"zq{i}" for i in range(20))
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(0, '{' '.join(['the'] * 20)}'), (1, '{rare}') "
        ") t(doc_id, text)"
    )
    df = con.sql(q_unigram_nll("duckdb")).df().set_index("doc_id")
    assert df.loc[0, "avg_nll_micro"] < df.loc[1, "avg_nll_micro"]


def test_semantic_dedup_keeper_semantics(spark):
    """Greedy min-id keeper: of three mutually-similar vectors, the two
    higher ids drop to the lowest id; a dissimilar vector survives even
    when it shares the cluster."""
    from pyspark.sql import functions as F

    from summarydb_spark.functions.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # ~cos 0.9999 to 1
        (3, [0.998, 0.02, 0.0, 0.0]),   # ~cos 0.9997 to 1, 2
        (4, [0.5, 0.86, 0.0, 0.0]),     # same sign bucket, cos ~0.51
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keeper_id"]
        for r in semantic_dedup(df, threshold=0.95, n_sign_dims=4).collect()
    }
    assert out == {2: 1, 3: 1}


def test_semantic_dedup_external_clusters(spark):
    """The clusters relation (the scale path: IVF/k-means assignments)
    replaces the sign quantizer: vectors in different buckets are never
    compared even when identical."""
    from summarydb_spark.functions.dedup import semantic_dedup

    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    clusters = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 7)], "_id long, bucket int"
    )
    out = {
        r["vec_id"]: r["keeper_id"]
        for r in semantic_dedup(df, threshold=0.95, clusters=clusters).collect()
    }
    assert out == {2: 1}


def test_adaptive_index_param_derivation():
    """VERDICT r6 item 4: nlist = ceil(sqrt(n)) clamped, planes =
    ceil(log2(n/32)) floored at the gate-good 16 / capped at 28."""
    from summarydb_spark.functions.similarity import (
        adaptive_ivf_centroids,
        adaptive_lsh_planes,
    )

    assert adaptive_ivf_centroids(0) == 8
    assert adaptive_ivf_centroids(5000) == 71
    assert adaptive_ivf_centroids(50_000) == 224
    assert adaptive_ivf_centroids(10**12) == 65536
    assert adaptive_lsh_planes(5000) == 16
    assert adaptive_lsh_planes(2_000_000) == 16
    assert adaptive_lsh_planes(16_000_000) == 19
    assert adaptive_lsh_planes(10**12) == 28
    # floor override used by the near-dup signature store
    assert adaptive_lsh_planes(600, floor=12) == 12
