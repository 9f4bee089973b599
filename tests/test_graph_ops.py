"""Semantic tests for the dup-graph analysis queries (triangle census,
canonical keep-best selection) and the hard-negative miner.

A constructed corpus pins the expected graph exactly: docs 1-3 are a
mutual near-dup triangle, docs 4-5 an isolated pair, doc 6 unrelated —
so the triangle count, wedge count, transitivity, and per-component
keeper are all known in closed form rather than asserted loosely.
"""

from __future__ import annotations

import pytest

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _mk_docs(spark, tmp_path):
    texts = {
        1: BASE,
        2: BASE + " lambda mu",  # longest -> the keeper of {1,2,3}
        3: BASE.replace("kappa", "sigma"),
        4: "one two three four five six seven eight nine",
        5: "one two three four five six seven eight zero",  # same length as 4
        6: "completely different words with zero shingle overlap here now",
    }
    rows = [
        (i, t, "en", "src", len(t))
        for i, t in sorted(texts.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "corpus")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    return d, texts


def test_dup_graph_triangles_closed_form(spark, tmp_path):
    from summarydb_spark.plans.dataframe_queries import q_dup_graph_triangles

    d, _ = _mk_docs(spark, tmp_path)
    row = q_dup_graph_triangles(spark, d).collect()[0].asDict()
    assert row == {
        "n_nodes": 5,
        "n_edges": 4,
        "n_wedges": 3,
        "n_triangles": 1,
        "transitivity": 1.0,
    }


def test_dedup_keep_best_picks_longest_then_lowest_id(spark, tmp_path):
    from summarydb_spark.plans.dataframe_queries import q_dedup_keep_best

    d, texts = _mk_docs(spark, tmp_path)
    rows = {
        r["component_id"]: r.asDict()
        for r in q_dedup_keep_best(spark, d).collect()
    }
    assert set(rows) == {1, 4}
    assert rows[1]["kept_doc"] == 2  # longest of {1,2,3}
    assert rows[1]["n_docs"] == 3
    assert rows[1]["kept_chars"] == len(texts[2])
    assert rows[1]["dropped_chars"] == len(texts[1]) + len(texts[3])
    assert rows[4]["kept_doc"] == 4  # tie on length -> lowest doc_id
    assert rows[4]["n_docs"] == 2


def test_hard_negative_mining_labels_and_ranks(spark):
    from summarydb_spark.plans.llm_sql import q_hard_negative_mining
    from summarydb_spark.sources.tables import register_tables

    register_tables(spark, "/root/testdata/sf0.001")
    out = spark.sql(q_hard_negative_mining("spark")).collect()
    assert out, "probe set should mine at least one negative"
    by_q: dict[int, list] = {}
    for r in out:
        assert r["negative_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


# ---------------------------------------------------------------------------
# Property tests: the Spark graph queries vs independent brute-force
# Python implementations over hypothesis-generated corpora.  Expected
# pairs use 3-gram STRING shingles (set-identical to the engines'
# 64-bit-hash shingles modulo astronomically-unlikely collisions); the
# blocking (same lang + floor(n_chars/100) bucket, doc_a < doc_b,
# J >= 0.1) replicates q_dedup_ngram_jaccard exactly.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

TOKENS = [f"w{i}" for i in range(9)]


def _shingles(text):
    toks = text.split(" ")
    if len(toks) >= 3:
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    return {" ".join(toks)}


def _expected_pairs(texts):
    sh = {i: _shingles(t) for i, t in texts.items()}
    bucket = {i: len(t) // 100 for i, t in texts.items()}
    pairs = []
    ids = sorted(texts)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            if bucket[a] != bucket[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.1:
                pairs.append((a, b))
    return pairs


def _components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


corpus_strategy = st.dictionaries(
    keys=st.integers(min_value=0, max_value=20),
    values=st.lists(st.sampled_from(TOKENS), min_size=3, max_size=12).map(
        " ".join
    ),
    min_size=2,
    max_size=7,
)


def _write_corpus(spark, tmpdir, texts):
    rows = [(i, t, "en", "src", len(t)) for i, t in sorted(texts.items())]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmpdir) + "/documents.parquet"
    )
    return str(tmpdir)


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_triangles_match_bruteforce(spark, tmp_path_factory, texts):
    from summarydb_spark.plans.dataframe_queries import q_dup_graph_triangles

    d = _write_corpus(spark, tmp_path_factory.mktemp("corpus"), texts)
    pairs = _expected_pairs(texts)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    exp_tri = sum(
        1
        for a, b in pairs
        for c in adj.get(a, set())
        if c > b and c in adj.get(b, set())
    )
    exp_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    row = q_dup_graph_triangles(spark, d).collect()[0]
    assert row.n_edges == len(pairs)
    assert row.n_nodes == len(adj)
    assert row.n_wedges == exp_wedges
    assert row.n_triangles == exp_tri


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_keep_best_matches_bruteforce(spark, tmp_path_factory, texts):
    from summarydb_spark.plans.dataframe_queries import q_dedup_keep_best

    d = _write_corpus(spark, tmp_path_factory.mktemp("corpus"), texts)
    comp = _components(_expected_pairs(texts))
    expected = {}
    for n, c in comp.items():
        best = expected.get(c)
        cand = (len(texts[n]), -n)  # longest, ties -> lowest doc_id
        if best is None or cand > best[0]:
            expected[c] = (cand, n)
    rows = {r.component_id: r for r in q_dedup_keep_best(spark, d).collect()}
    assert set(rows) == set(expected)
    for c, (_, keeper) in expected.items():
        assert rows[c].kept_doc == keeper
        assert rows[c].n_docs == sum(1 for n in comp if comp[n] == c)


def _pagerank_bruteforce(pairs, iters=4):
    """Integer nano-unit PageRank with the exact floor schedule the query
    uses: r0 = floor(1e9/N); r' = floor(0.15e9/N) + sum floor(85*r/(100*deg))."""
    import math

    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    if n == 0:
        return {}
    r = {v: math.floor(1_000_000_000.0 / n) for v in adj}
    for _ in range(iters):
        nxt = {}
        for v, neigh in adj.items():
            inflow = sum(
                math.floor(85 * r[u] / (100.0 * len(adj[u]))) for u in neigh
            )
            nxt[v] = math.floor(150_000_000.0 / n) + inflow
        r = nxt
    return r


@settings(max_examples=6, deadline=None)
@given(texts=corpus_strategy)
def test_pagerank_matches_bruteforce(spark, tmp_path_factory, texts):
    from summarydb_spark.plans.dataframe_queries import q_pagerank_dup_graph

    d = _write_corpus(spark, tmp_path_factory.mktemp("corpus"), texts)
    pairs = _expected_pairs(texts)
    expected = _pagerank_bruteforce(pairs)
    rows = {r.doc_id: r for r in q_pagerank_dup_graph(spark, d).collect()}
    assert set(rows) == set(expected)
    for v, rank in expected.items():
        assert rows[v].rank_nano == rank, v
    # total mass is conserved up to the flooring losses (<= 1 nano per
    # division): sum of ranks can never exceed 1e9
    assert sum(r.rank_nano for r in rows.values()) <= 1_000_000_000


def test_kcore_hand_graph(spark):
    """Path 1-2-3-4 peels away entirely at k=2; the clique 10-11-12 plus
    a pendant 13 keeps exactly the triangle with degree 2 each."""
    from summarydb_spark.functions.dedup import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (12, 13)],
        "a long, b long",
    )
    got = {(r["node"], r["deg_core"]) for r in kcore(edges, k=2).collect()}
    assert got == {(10, 2), (11, 2), (12, 2)}


def test_kcore_round_budget_converges_at_gate_scales(spark):
    """The registered query's semantics are '12-round peel'; it equals the
    true 2-core only when peeling converges within the budget.  Pin that
    convergence at the gate scale: one extra round changes nothing."""
    from summarydb_spark.functions.dedup import kcore
    from summarydb_spark.plans.dataframe_queries import (
        _KCORE_ROUNDS,
        _copurchase_edges,
    )

    e = _copurchase_edges(spark, "/root/testdata/sf0.001").localCheckpoint()
    at_budget = {
        (r["node"], r["deg_core"])
        for r in kcore(e, k=2, max_rounds=_KCORE_ROUNDS).collect()
    }
    beyond = {
        (r["node"], r["deg_core"])
        for r in kcore(e, k=2, max_rounds=_KCORE_ROUNDS + 6).collect()
    }
    assert at_budget == beyond
    # and the result is a genuine 2-core: every survivor has deg >= 2
    assert all(d >= 2 for _, d in at_budget)


def test_kcore_long_path_converges_or_raises(spark):
    """Round-8 VERDICT item 3: a path graph needs O(diameter) peel
    rounds; the old 12-round truncation silently returned a superset.
    The default budget now converges (full peel -> empty 2-core), and
    an insufficient budget RAISES instead of returning a wrong answer."""
    import pytest

    from summarydb_spark.functions.dedup import kcore

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a long, b long"
    )
    # 41-node path: ~20 rounds to fully peel at k=2, > the old 12 budget
    assert kcore(edges, k=2).count() == 0
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, k=2, max_rounds=5)


def test_label_propagation_two_communities(spark):
    """Two 4-cliques joined by a single bridge edge: 3 synchronous LPA
    rounds with min-label tiebreak label every clique member with its
    clique's minimum id — the bridge is outvoted by intra-clique
    majorities on both sides."""
    from summarydb_spark.functions.dedup import label_propagation

    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(
        cl1 + cl2 + [(3, 10)], "a long, b long"
    )
    got = {
        (r.node, r.label)
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {(n, 0) for n in range(4)} | {
        (n, 10) for n in range(10, 14)
    }


def test_label_propagation_self_vote_semantics(spark):
    """The self-vote is load-bearing: (a) an ISOLATED PAIR — where
    pure-neighbor synchronous LPA oscillates forever and never forms a
    community — converges to the smaller id in one round; (b) a 4-cycle
    (bipartite, the classic oscillator) converges to all-0 by round 2;
    ties (equal counts) always go to the SMALLER label."""
    from summarydb_spark.functions.dedup import label_propagation

    pair = spark.createDataFrame([(7, 3)], "a long, b long")
    got = {
        (r.node, r.label) for r in label_propagation(pair, rounds=3).collect()
    }
    assert got == {(3, 3), (7, 3)}

    # square 0-1-2-3-0 with self-votes:
    # r1: n0 {1,3,self0} all count 1 -> min 0; n1 {0,2,self1} -> 0;
    #     n2 {1,3,self2} -> 1; n3 {0,2,self3} -> 0
    # r2: n0 {1:0,3:0,self:0} -> 0; n1 {0:0,2:1,self:0} -> 0;
    #     n2 {1:0,3:0,self:1} -> 0; n3 {0:0,2:1,self:0} -> 0
    # r3: fixed point, all 0
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "a long, b long"
    )
    got = {
        (r.node, r.label)
        for r in label_propagation(edges, rounds=3).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 0)}
