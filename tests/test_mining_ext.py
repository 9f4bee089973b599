"""Planted-hub contract for the RA link-prediction hub cap (round-9
VERDICT item 6): the degree cap on two-hop middles must (a) bound the
enumerated hop2 volume at cap x |V| where the uncapped plan is
sum(deg^2)-quadratic, and (b) leave the top-20 relation within the
disclosed score-error bound — <= 1e9/deg(hub) ppb per common hub
neighbor — which with real-cap headroom means IDENTICAL top-20.

The corpus plants one hub part co-purchased with every spoke (degree
n_spokes >> test cap) on top of a support-2 ring whose middles all have
tiny degree.
"""

from __future__ import annotations

import duckdb
import pytest

N_RING = 60  # parts 0..59 in a ring, each edge supported by 2 orders
N_SPOKES = 50  # hub degree (hub = part 1000)


@pytest.fixture(scope="module")
def hub_lineitem(spark):
    rows = []
    oid = 0
    # ring edges (i, i+1 mod N) with support 2 -> deg(i) = 2 in e/u
    for i in range(N_RING):
        for _ in range(2):
            rows += [(oid, i), (oid, (i + 1) % N_RING)]
            oid += 1
    # hub: part 1000 co-purchased with spokes 0..N_SPOKES-1, support 2
    for s in range(N_SPOKES):
        for _ in range(2):
            rows += [(oid, 1000), (oid, s)]
            oid += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    df.createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.register("lineitem", df.toPandas())
    yield spark, con
    spark.catalog.dropTempView("lineitem")


def _rows(spark_df):
    return [tuple(r) for r in spark_df.collect()]


def test_hub_cap_bounds_hop2(hub_lineitem):
    """With the cap below the hub degree, hop2 volume collapses from the
    hub's quadratic deg^2 term to <= cap x |V|."""
    from summarydb_spark.plans.mining_ext import ra_hop2_count_sql

    spark, _ = hub_lineitem
    cap = 8  # < hub degree (50+ring contributions), > ring degrees (2-3)
    n_uncapped = spark.sql(
        ra_hop2_count_sql("spark", hub_cap=10**9)
    ).collect()[0][0]
    n_capped = spark.sql(ra_hop2_count_sql("spark", hub_cap=cap)).collect()[
        0
    ][0]
    n_vertices = N_RING + 1
    # the hub middle alone contributes ~ C(N_SPOKES, 2) ordered paths
    assert n_uncapped - n_capped >= (N_SPOKES * (N_SPOKES - 1)) // 2
    assert n_capped <= cap * n_vertices


def test_hub_cap_score_error_within_disclosed_bound(hub_lineitem):
    """Every pair's capped RA score differs from the uncapped score by
    exactly the excluded hub middles' contribution, which is bounded by
    common_hub_neighbors x (1e9 div deg(hub)) — the docstring's bound.
    Pairs whose ONLY middle was the hub drop out entirely (score below
    any surviving 1e9/cap contribution by construction of the bound)."""
    from summarydb_spark.plans.mining_ext import q_link_prediction_ra

    spark, _ = hub_lineitem
    cap = 8
    big = 10**6  # effectively uncapped
    uncapped = {
        (r.part_a, r.part_b): (r.common_neighbors, r.ra_ppb)
        for r in spark.sql(
            q_link_prediction_ra("spark", hub_cap=big, limit=100_000)
        ).collect()
    }
    capped = {
        (r.part_a, r.part_b): (r.common_neighbors, r.ra_ppb)
        for r in spark.sql(
            q_link_prediction_ra("spark", hub_cap=cap, limit=100_000)
        ).collect()
    }
    # hub degree in the symmetric adjacency = N_SPOKES
    hub_unit = 1_000_000_000 // N_SPOKES
    assert set(capped) <= set(uncapped)
    for pair, (cn_u, ra_u) in uncapped.items():
        if pair in capped:
            cn_c, ra_c = capped[pair]
            dropped = cn_u - cn_c
            assert ra_u - ra_c == dropped * hub_unit
        else:
            # all middles were hubs: total score <= cn x hub_unit
            assert ra_u <= cn_u * hub_unit


def test_hub_cap_top20_churn_bounded_by_disclosed_error(hub_lineitem):
    """The production claim, made precise: capping can only perturb the
    top-20 among pairs whose scores sit within the dropped-contribution
    bound (common_hub_neighbors x 1e9/deg(hub)) of the cutoff — any pair
    entering or leaving the top-20 must be that close to the uncapped
    20th score.  (At RA_HUB_CAP=1e5 the bound is <= 10^4 ppb per hub
    neighbor, negligible against real gate scores; here the planted hub
    makes it measurable.)"""
    from summarydb_spark.plans.mining_ext import q_link_prediction_ra

    spark, _ = hub_lineitem
    full_u = _rows(
        spark.sql(q_link_prediction_ra("spark", 10**6, limit=100_000))
    )
    ra_u = {(a, b): ra for a, b, _cn, ra in full_u}
    top_u = [(a, b) for a, b, *_ in full_u[:20]]
    top_c = [
        (a, b)
        for a, b, *_ in _rows(spark.sql(q_link_prediction_ra("spark", 8)))
    ]
    assert len(top_c) == 20
    cutoff = ra_u[top_u[-1]]
    hub_unit = 1_000_000_000 // N_SPOKES  # single hub => cn_via_hub <= 1
    for pair in set(top_c) ^ set(top_u):
        assert abs(ra_u[pair] - cutoff) <= hub_unit, (
            f"{pair} churned the top-20 from farther than the disclosed "
            f"bound: |{ra_u[pair]} - {cutoff}| > {hub_unit}"
        )


def test_registered_sql_unchanged_semantics(hub_lineitem):
    """The parameterized template at its defaults must match DuckDB on
    the planted corpus (oracle parity holds off the gate corpus too)."""
    from summarydb_spark.plans.mining_ext import q_link_prediction_ra

    spark, con = hub_lineitem
    got = _rows(spark.sql(q_link_prediction_ra("spark")))
    want = [tuple(r) for r in con.sql(q_link_prediction_ra("duckdb")).fetchall()]
    assert got == want


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully contained in a 10x container: containment_ppm =
    1e6 while jaccard ~0.25 — the pair the containment query exists to
    catch (and jaccard-threshold dedup misses).  Cross-lang twins are
    blocked out; unrelated docs stay below the 0.9 threshold.  The
    prefix-filtered Spark plan must equal the exhaustive DuckDB oracle
    on the same corpus (the filter is lossless by the pigeonhole
    bound)."""
    import duckdb as _duck

    from summarydb_spark.plans.dataframe_queries import (
        _oracle_containment,
        containment_prefix_sql,
    )

    base = " ".join(f"tok{i}" for i in range(40))
    inner = " ".join(f"tok{i}" for i in range(10, 20))
    other = " ".join(f"zz{i}" for i in range(40))
    rows = [
        (0, "en", base, len(base)),
        (1, "en", inner, len(inner)),
        (2, "en", other, len(other)),
        (3, "de", inner, len(inner)),  # cross-lang: blocked out
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars long"
    )
    df.createOrReplaceTempView("documents")
    try:
        got = {
            (r.doc_a, r.doc_b, r.containment_ppm)
            for r in spark.sql(containment_prefix_sql()).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    assert got == {(0, 1, 1_000_000)}
    con = _duck.connect()
    con.register("documents", df.toPandas())
    want = {tuple(r) for r in con.sql(_oracle_containment()).fetchall()}
    assert want == {(0, 1, 1_000_000)}


def test_containment_prefix_lossless_on_random_corpus(spark):
    """Pigeonhole losslessness of the prefix filter on a seeded random
    corpus ENGINEERED for near-misses: planted subset pairs at exactly
    0.9, just-below pairs at ~0.89, size-skewed containers, shared
    boilerplate tokens (high df — the prefix ranking must look past
    them).  The Spark prefix plan must equal the exhaustive DuckDB
    block join exactly."""
    import duckdb as _duck
    import numpy as np

    from summarydb_spark.plans.dataframe_queries import (
        _oracle_containment,
        containment_prefix_sql,
    )

    rng = np.random.RandomState(99)
    vocab = [f"w{i}" for i in range(120)]
    rows = []
    did = 0
    for _ in range(12):
        # container: 30-60 unique tokens; contained doc: a contiguous
        # slice of ~k tokens with a few extras so containment straddles 0.9
        n = int(rng.randint(30, 60))
        toks = list(rng.choice(vocab, size=n, replace=False))
        rows.append((did, "en", " ".join(toks))); did += 1
        k = int(rng.randint(8, 15))
        inner = toks[:k] + list(
            rng.choice([w for w in vocab if w not in toks],
                       size=int(rng.randint(0, 3)), replace=False)
        )
        rows.append((did, "en", " ".join(inner))); did += 1
    # boilerplate-heavy docs: same 5-token prefix everywhere
    for _ in range(6):
        toks = ["b0", "b1", "b2", "b3", "b4"] + list(
            rng.choice(vocab, size=int(rng.randint(10, 20)), replace=False)
        )
        rows.append((did, "en", " ".join(toks))); did += 1
    df = spark.createDataFrame(
        [(i, lg, tx, len(tx)) for i, lg, tx in rows],
        "doc_id long, lang string, text string, n_chars long",
    )
    df.createOrReplaceTempView("documents")
    try:
        got = {
            tuple(r)
            for r in spark.sql(containment_prefix_sql()).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    con = _duck.connect()
    con.register("documents", df.toPandas())
    want = {tuple(r) for r in con.sql(_oracle_containment()).fetchall()}
    assert got == want
    assert want, "vacuous: the planted subsets must produce pairs"
