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


def test_text_stats_total_on_empty_and_irregular_whitespace(spark):
    from summarydb_spark.functions import text

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "   "), (4, "a  b"), (5, "a\tb"),
         (6, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.with_token_stats(df).collect()}
    assert rows[2]["avg_token_len"] is None  # not a DIVIDE_BY_ZERO crash
    assert rows[2]["type_token_ratio"] is None
    # one tokenization: TTR can never exceed 1 (split(' ') on 'a  b' gave 1.5)
    assert rows[4]["n_tokens"] == 2 and rows[4]["n_distinct_tokens"] == 2
    assert rows[4]["type_token_ratio"] == 1.0
    assert rows[5]["n_distinct_tokens"] == 2
    assert rows[5]["avg_token_len"] == 1.0  # tab is not token content

    q = {r["doc_id"]: r for r in text.with_quality(df).collect()}
    assert q[2]["stopword_ratio"] is None and q[2]["alpha_ratio"] is None
    assert q[1]["quality_bucket"] in ("high", "medium", "low")


def test_lang_id_and_fingerprints_null_text(spark):
    from summarydb_spark.functions import text

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    langs = {r["doc_id"]: r["predicted_lang"] for r in text.with_lang_id(df).collect()}
    assert langs[1] == "en"
    assert langs[2] is None  # was: mislabeled as the chain's last language

    rolled = {
        r["doc_id"]: r["rolling_min_hash"]
        for r in text.with_rolling_fingerprint(df).collect()
    }
    assert rolled[2] is None  # was: hash('') — every null doc collided
    assert rolled[3] is not None and rolled[1] is not None


def test_sum_ci_propagates_nan_on_negative_variance():
    """Partial overlap of a negative-sum window makes the proration var
    term negative; Go's math.Sqrt yields NaN there — match it instead of
    raising ValueError from the public query path."""
    import math

    from summarydb_spark.operators.estimator import SummaryWindowRow, query_op

    res = query_op(
        "sum", [SummaryWindowRow(0, 9, count=10.0, sum=-50.0)], [], 5, 20
    )
    assert math.isnan(res.lower_ci) or res.lower_ci <= res.upper_ci


def test_welford_skips_null_values_and_null_ts():
    """A null ts poisoned the micro-batch (int(NaN) ValueError, replayed on
    every restart); a null value inflated the running n while contributing
    nothing to mean/m2.  Drive the state fn directly (batch mode cannot run
    applyInPandasWithState)."""
    import math

    import numpy as np
    import pandas as pd

    from summarydb_spark.streaming.stateful import _update_stats

    class FakeState:
        exists = False

        def update(self, t):
            self.got = t

    st = FakeState()
    pdf = pd.DataFrame(
        {
            "stream_id": [0, 0, 0, 0],
            "ts": [10.0, 20.0, np.nan, 30.0],
            "value": [1.0, np.nan, 9.0, 3.0],
        }
    )
    out = list(_update_stats((0,), iter([pdf]), st))[0]
    # null value: counts for gaps (real event time) but not value stats;
    # null ts: no position on the time axis, dropped entirely
    assert out["n"].iloc[0] == 2
    assert math.isclose(out["value_mean"].iloc[0], 2.0)
    assert out["gap_n"].iloc[0] == 2
    assert math.isclose(out["gap_mean"].iloc[0], 10.0)
    assert st.got[-1] == 30

    # an all-null-ts batch leaves carried state untouched and still emits
    st2 = FakeState()
    pdf2 = pd.DataFrame({"stream_id": [0], "ts": [np.nan], "value": [5.0]})
    out2 = list(_update_stats((0,), iter([pdf2]), st2))[0]
    assert out2["n"].iloc[0] == 0 and st2.got[0] == 0
