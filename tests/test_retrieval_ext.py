"""Semantics tests for plans.retrieval_ext on tiny controlled corpora —
the properties the DuckDB oracle can't pin (it computes the same SQL):
BM25 ordering behavior, Morton-key bit layout, k-anonymity accounting,
and partitioning-independence of the hashed classifier."""

from __future__ import annotations

import math

import pytest

from summarydb_spark.plans.retrieval_ext import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    _zkey,
    q_bm25_search_topk,
    q_k_anonymity_profile,
    q_quality_classifier_hashed,
)



@pytest.fixture(autouse=True)
def _invalidate_table_memo(spark):
    """These tests overwrite the shared testdata temp views with tiny
    synthetic ones; drop register_tables' memo afterwards so the next
    real-table consumer re-registers instead of reading the stubs."""
    yield
    from summarydb_spark.sources.tables import _REGISTERED_ATTR

    if hasattr(spark, _REGISTERED_ATTR):
        delattr(spark, _REGISTERED_ATTR)


def _mk_documents(spark, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")


def test_bm25_matches_hand_computed_reference(spark):
    # 3 docs, known tf/df/dl: verify the SQL against a from-scratch BM25.
    docs = [
        (0, "spark spark window filler filler filler", "en", "s", 0),
        (1, "spark filler filler filler", "en", "s", 0),
        (2, "dup filler", "en", "s", 0),
        (3, "filler filler filler filler filler filler filler filler", "en", "s", 0),
    ]
    _mk_documents(spark, docs)
    got = {
        r["doc_id"]: r["score_micro"]
        for r in spark.sql(q_bm25_search_topk("spark")).collect()
    }

    toks = {d: t.split(" ") for d, t, *_ in docs}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {
        w: sum(1 for t in toks.values() if w in t) for w in BM25_TERMS
    }

    def bm25(doc):
        s = 0.0
        for w in BM25_TERMS:
            tf = toks[doc].count(w)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            dl = len(toks[doc])
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
        return math.floor(s * 1_000_000)

    # doc 3 has no query term -> absent; the rest match the reference
    assert set(got) == {0, 1, 2}
    for d in got:
        assert got[d] == bm25(d), d
    # more occurrences of the same term in a shorter doc => higher score
    assert got[0] > got[1]


def test_zkey_is_morton_interleave(spark):
    rows = [(u, d) for u in range(16) for d in range(16)]
    df = spark.createDataFrame(rows, "ub long, db long")
    df.createOrReplaceTempView("zin")
    expr = _zkey("spark", "ub", "db")
    got = {
        (r["ub"], r["db"]): r["z"]
        for r in spark.sql(f"SELECT ub, db, CAST({expr} AS BIGINT) AS z FROM zin").collect()
    }

    def morton(ub, db):
        z = 0
        for i in range(4):
            z |= ((ub >> i) & 1) << (2 * i + 1)
            z |= ((db >> i) & 1) << (2 * i)
        return z

    for (u, d), z in got.items():
        assert z == morton(u, d)
    # bijective over the 8-bit domain
    assert sorted(got.values()) == list(range(256))


def test_k_anonymity_counts(spark):
    # classes: (0,A)x1, (0,B)x3, (1,A)x6 -> below k=2: 1 class/1 row;
    # below k=5: 2 classes/4 rows; below k=10/25: 3 classes/10 rows.
    rows = (
        [(0, "A")] + [(0, "B")] * 3 + [(1, "A")] * 6
    )
    spark.createDataFrame(
        [(i, n, s) for i, (n, s) in enumerate(rows)],
        "c_custkey long, c_nationkey long, c_mktsegment string",
    ).createOrReplaceTempView("customer")
    out = {
        r["k_min"]: (r["groups_below"], r["rows_below"], r["rows_below_ppm"])
        for r in spark.sql(q_k_anonymity_profile("spark")).collect()
    }
    assert out[2] == (1, 1, 100000)
    assert out[5] == (2, 4, 400000)
    assert out[10] == (3, 10, 1000000)
    assert out[25] == (3, 10, 1000000)


def test_hashed_classifier_partition_independent(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(1 + i % 7)), "en", "s", 0)
        for i in range(40)
    ]
    _mk_documents(spark, rows)
    a = spark.sql(q_quality_classifier_hashed("spark")).collect()
    # same corpus shuffled into 1 partition: identical buckets and counts
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).createOrReplaceTempView("documents")
    b = spark.sql(q_quality_classifier_hashed("spark")).collect()
    key = lambda r: (r["lang"], r["score_bucket"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # weights are bounded: every doc mean must lie in [-1e6, 1e6]
    for r in a:
        assert -1_000_000 <= r["min_score_micro"] <= r["max_score_micro"] <= 1_000_000


def test_minhash_calibration_identical_docs_agree_fully(spark):
    from summarydb_spark.plans.portable_dedup import q_minhash_calibration

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, text, "en", "s", len(text)),
        (1, text, "en", "s", len(text)),  # exact dup of 0
        (2, "one two three four five six seven eight nine ten", "en", "s", 49),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    out = {r["minhash_agree"]: r for r in
           spark.sql(q_minhash_calibration("spark")).collect()}
    # the identical pair collides in every band, agrees on all 16 hashes,
    # and has exact Jaccard 1.0 with zero estimator error
    assert 16 in out
    assert out[16]["n_pairs"] == 1
    assert out[16]["avg_j_exact"] == 1.0
    assert out[16]["mae_micro"] == 0


def test_hybrid_rrf_fuses_both_systems(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["hybrid_rrf_fusion"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(rows) <= 15
    scores = [r.rrf_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert any(r.rank_dense > 0 for r in rows)  # dense system contributes
    for r in rows:
        expect = 0
        if r.rank_text > 0:
            expect += 1000000 // (60 + r.rank_text)
        if r.rank_dense > 0:
            expect += 1000000 // (60 + r.rank_dense)
        assert r.rrf_micro == expect
        assert r.doc_id != 0  # the probe itself never self-retrieves
