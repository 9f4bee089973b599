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
