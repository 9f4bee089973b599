"""Text-similarity extension: prefix-filtered exact Jaccard join,
token co-occurrence lift, tokenizer fertility.

Semantics at sf0.001; plan/shape pins follow tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io
from itertools import combinations

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


def _shingle_sets(spark):
    import re

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    out = {}
    for r in docs:
        toks = re.sub(r"\s+", " ", r.text.lower().strip()).split(" ")
        if len(toks) >= 3:
            out[r.doc_id] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        else:
            out[r.doc_id] = {" ".join(toks)}
    return out


def test_prefix_filter_matches_bruteforce_python(spark):
    """Independent recompute: every Jaccard>=0.7 pair, by brute force in
    Python over the raw text — the filter must lose nothing and add
    nothing."""
    sets = _shingle_sets(spark)
    truth = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        if i == 0:
            continue
        u = len(sets[a] | sets[b])
        if 10 * i >= 7 * u:
            truth[(a, b)] = (i, u)
    rows = run(spark, "prefix_filter_jaccard_join").collect()
    got = {(r.a_id, r.b_id): (r.inter_sz, r.union_sz) for r in rows}
    assert got == truth
    for r in rows:
        assert r.jaccard_ppm == r.inter_sz * 1000000 // r.union_sz
        assert r.jaccard_ppm >= 700000


def test_prefix_join_has_no_allpairs_stage(spark):
    plan = plan_of(spark, "prefix_filter_jaccard_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the plan reads the persisted index store, not raw documents
    assert "prefix_shingle_index_x3" in plan
    assert "documents.parquet" not in plan


def test_cooccurrence_lift_bounds_and_vocab(spark):
    rows = run(spark, "token_cooccurrence_lift").collect()
    vocab = {r.token_a for r in rows} | {r.token_b for r in rows}
    assert len(vocab) <= 30
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    for r in rows:
        assert r.token_a < r.token_b
        assert 1 <= r.n_ab <= n_docs
        assert r.lift_ppm >= 0


def test_tokenizer_fertility_identities(spark):
    rows = run(spark, "tokenizer_fertility").collect()
    assert rows
    for r in rows:
        # a word is >= 1 subword; a subword is >= 1 char
        assert r.total_subwords >= r.total_words
        assert r.total_chars >= r.total_subwords
        assert r.fertility_ppm >= 1000000
        assert r.n_docs > 0


def test_vocab_coverage_identities(spark):
    rows = run(spark, "vocab_coverage_oov").collect()
    assert rows
    for r in rows:
        assert 0 <= r.in_vocab_occ <= r.total_occ
        expect = (r.total_occ - r.in_vocab_occ) * 1000000 // r.total_occ
        assert r.oov_ppm == expect


def test_aho_corasick_matches_python_in_operator():
    """Automaton presence == substring presence, on adversarial strings
    (overlaps, shared prefixes, nested patterns)."""
    from summarydb_spark.functions.match import _scan, build_automaton

    patterns = ["ab", "abc", "bc", "c", "aa", "aab", "xyz"]
    tables = build_automaton(patterns)
    texts = ["aabc", "abab", "ccc", "", "xy", "zxyzz", "aaab", "ba", "cab"]
    for t in texts:
        got = _scan(*tables, t)
        want = {i for i, p in enumerate(patterns) if p in t}
        assert got == want, t


def test_blocklist_tagger_counts_match_contains(spark):
    from pyspark.sql import functions as F

    rows = run(spark, "blocklist_tag_aho").collect()
    assert len(rows) == 20
    docs = spark.sql(
        "SELECT regexp_replace(lower(trim(text)), '\\\\s+', ' ') AS nt "
        "FROM parquet.`/root/testdata/sf0.001/documents.parquet`"
    )
    for r in rows[:5]:  # spot-check the densest patterns
        want = docs.where(F.col("nt").contains(r.pattern)).count()
        assert r.n_docs == want


def test_multi_pattern_tag_jvm_and_automaton_paths_agree(spark):
    """The size-adaptive dispatch must be invisible: forcing the JVM
    contains-chain and the Python automaton over the same input yields
    identical (doc_id, pattern_id) sets, including overlap-heavy
    patterns and NULL text."""
    from summarydb_spark.functions.match import multi_pattern_tag

    pats = ["ab", "abc", "bc", "c", "aa", "xyz"]
    df = spark.createDataFrame(
        [(0, "aabc"), (1, "zxyzz"), (2, None), (3, ""), (4, "cab"),
         (5, "no hits here!")],
        "doc_id long, txt string",
    )
    jvm = multi_pattern_tag(df, "doc_id", "txt", pats, jvm_max_patterns=100)
    auto = multi_pattern_tag(df, "doc_id", "txt", pats, jvm_max_patterns=0)
    got_j = {(r.doc_id, r.pattern_id) for r in jvm.collect()}
    got_a = {(r.doc_id, r.pattern_id) for r in auto.collect()}
    want = {
        (i, pid)
        for i, t in [(0, "aabc"), (1, "zxyzz"), (3, ""), (4, "cab"),
                     (5, "no hits here!")]
        for pid, p in enumerate(pats)
        if p in t
    }
    assert got_j == want
    assert got_a == want


def test_multi_pattern_tag_empty_patterns(spark):
    """K=0 must return an empty (doc_id, pattern_id) frame on BOTH
    paths — the JVM path would otherwise build F.array() of zero
    structs (array<null>) and fail analysis at s['pat']."""
    from summarydb_spark.functions.match import _TAG_SCHEMA, multi_pattern_tag

    df = spark.createDataFrame([(1, "abc")], "doc_id long, txt string")
    for cap in (100, 0):
        out = multi_pattern_tag(df, "doc_id", "txt", [], jvm_max_patterns=cap)
        assert out.schema == _TAG_SCHEMA
        assert out.count() == 0


def test_bounded_blocklist_plan_is_pure_jvm(spark):
    """K<=100 patterns must compile to codegen'd contains — zero Python
    in the plan (no mapInPandas / ArrowEvalPython / BatchEvalPython)."""
    from summarydb_spark.functions.match import multi_pattern_tag

    df = spark.createDataFrame([(1, "xx")], "doc_id long, txt string")
    plan = multi_pattern_tag(
        df, "doc_id", "txt", ["a", "b", "c"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_aho_corasick_property_random_patterns():
    """Hypothesis: automaton presence == Python substring presence for
    arbitrary pattern sets over a small alphabet (dense overlap regime)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from summarydb_spark.functions.match import _scan, build_automaton

    alpha = "abc"
    pat = st.text(alphabet=alpha, min_size=1, max_size=4)

    @settings(max_examples=200, deadline=None)
    @given(
        pats=st.lists(pat, min_size=1, max_size=8, unique=True),
        text=st.text(alphabet=alpha, max_size=40),
    )
    def check(pats, text):
        tables = build_automaton(pats)
        got = _scan(*tables, text)
        want = {i for i, p in enumerate(pats) if p in text}
        assert got == want

    check()
