"""Round-6 review fixes: byte-budgeted quantizer training samples,
vectorized Misra-Gries reduction, and size-adaptive pattern matching."""

from __future__ import annotations

import pytest

from summarydb_spark.functions import similarity


def test_train_row_cap_is_byte_budgeted():
    # dim 2048 float64 under the 512 MiB default: 32768 rows, NOT 1M —
    # a row-only cap would collect 16 GB at this dim
    assert similarity._train_row_cap(2048) == (512 << 20) // (8 * 2048)
    assert similarity._train_row_cap(2048) == 32768
    # tiny dims clamp at the 1M row ceiling (extra rows buy nothing)
    assert similarity._train_row_cap(4) == 1_000_000
    # explicit budgets scale linearly; floor at 1 row
    assert similarity._train_row_cap(768, byte_budget=8 * 768 * 100) == 100
    assert similarity._train_row_cap(10**9) == 1


def test_embedding_dim_probe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    assert similarity._embedding_dim(df, "embedding") == 3
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        similarity._embedding_dim(empty, "embedding")


def test_byte_budget_flows_into_ivf_training(spark):
    """A budget that caps the sample below n_centroids must surface as
    the too-few-vectors error — proof the cap reaches the collect."""
    rows = [(i, [float(i + j) for j in range(8)]) for i in range(1, 50)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-zero"):
        similarity.train_ivf_centroids(
            corpus, n_centroids=4, byte_budget=8 * 8 * 2  # cap = 2 rows
        )
    # a sane budget trains fine
    cent = similarity.train_ivf_centroids(
        corpus, n_centroids=4, byte_budget=512 << 20
    )
    assert cent.shape == (4, 8)


def test_mg_vectorized_reduction_preserves_guarantee(spark):
    """The mergeable-summaries reduction (subtract (k+1)-st largest)
    must keep est <= exact <= est + N/k — checked by the operator's own
    mg_bound_ok output on a skew-heavy stream across partitionings."""
    from summarydb_spark.functions.mg import heavy_hitters_mg

    items = ["hot"] * 500 + [f"cold{i}" for i in range(2000)] * 2
    df = spark.createDataFrame([(v,) for v in items], "value string")
    for parts in (1, 5, 32):
        rows = heavy_hitters_mg(
            df.repartition(parts), k=64, threshold_denom=50
        ).collect()
        got = {r["value"]: r["exact_cnt"] for r in rows}
        assert got == {"hot": 500}, parts
        assert all(r["mg_bound_ok"] for r in rows), parts


def test_distributed_ivf_training_is_dropin(spark):
    """distributed=True trains with pyspark.ml KMeans (no driver sample)
    and returns the same (k, d) L2-normalized shape — a drop-in for
    ivf_encode/search, and the assignment it induces separates obvious
    clusters."""
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.randn(40, 8) * 0.05 + np.array([5, 0, 0, 0, 0, 0, 0, 0])
    b = rng.randn(40, 8) * 0.05 + np.array([0, 5, 0, 0, 0, 0, 0, 0])
    rows = [(i, v.tolist()) for i, v in enumerate(np.vstack([a, b]))]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = similarity.train_ivf_centroids(
        corpus, n_centroids=2, distributed=True
    )
    assert cent.shape == (2, 8)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
    enc = similarity.ivf_encode(corpus, cent)
    lists = {
        r["list_id"]
        for r in enc.groupBy("list_id").count().collect()
    }
    assert lists == {0, 1}
    # each input cluster maps to one list
    got = {r["neighbor_id"]: r["list_id"] for r in enc.collect()}
    assert len({got[i] for i in range(40)}) == 1
    assert len({got[i] for i in range(40, 80)}) == 1
    assert got[0] != got[79]


def test_distributed_pq_training_is_dropin(spark):
    """distributed=True PQ training returns (m, k, d/m) codebooks fit
    per subspace with no driver sample; encoding still round-trips."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, v.tolist()) for i, v in enumerate(rng.randn(120, 8))]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.train_pq_codebooks(
        corpus, m=2, k=4, distributed=True
    )
    assert books.shape == (2, 4, 4)
    with pytest.raises(ValueError, match="not divisible"):
        similarity.train_pq_codebooks(corpus, m=3, k=4, distributed=True)


def test_generic_member_key_property_roundtrip():
    """Hypothesis: arbitrary unicode/bytes members encode to exact-
    integer doubles, str == its utf-8 bytes, distinct inputs collide
    with ~2^-52 odds (never observed on the sampled domain)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from summarydb_spark.engine import generic_member_key as gk

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40))
    def check(s):
        v = gk(s)
        assert v == int(v) and 0 <= v < 2**52
        assert gk(s.encode("utf-8")) == v

    check()
