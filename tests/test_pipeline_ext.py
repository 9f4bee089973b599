"""Pipeline-extension operators: k-means Lloyd, inverted index,
train/val/test split, bigram KN stats, length-bucket packing.

Semantics tests run at sf0.001; plan pins follow tests/test_plans.py
(broadcast where designed, no cartesian products, pruned scans).
"""

from __future__ import annotations

import contextlib
import io

import pytest

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


def test_dq_column_profile_counts(spark):
    rows = {r.col_name: r for r in run(spark, "dq_column_profile").collect()}
    assert set(rows) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
        "l_returnflag",
    }
    n = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    for r in rows.values():
        assert r.n_rows == n and r.n_nulls == 0
        assert 1 <= r.n_distinct <= n
    assert rows["l_quantity"].min_num >= 1 and rows["l_quantity"].max_num <= 50
    assert rows["l_returnflag"].min_str is not None
    assert rows["l_quantity"].min_str is None  # numeric cols: no string stats


def test_dq_referential_orphans_clean_fks(spark):
    rows = {r.relationship: r for r in run(spark, "dq_referential_orphans").collect()}
    # generated data has intact FKs; reverse-coverage rows may be non-zero
    for rel in (
        "lineitem.l_orderkey -> orders",
        "lineitem.l_partkey -> part",
        "orders.o_custkey -> customer",
        "customer.c_nationkey -> nation",
    ):
        assert rows[rel].n_violations == 0
    assert rows["customers without orders"].n_violations >= 0


def test_dq_rule_violations_reports_failing_rule(spark):
    rows = {r.rule: r for r in run(spark, "dq_rule_violations").collect()}
    assert rows["orders.o_orderkey unique"].n_violations == 0
    assert rows["lineitem.l_quantity in [1,50]"].n_violations == 0
    # the deliberately tight discount gate must exercise the failure path
    assert rows["lineitem.l_discount <= 0.05 (tight gate)"].n_violations > 0


def test_dq_profile_two_branch_scan(spark):
    """Round-6 shape: exactly TWO scans of lineitem — plain aggregates
    in an ordinary scan-aggregate and the five count(DISTINCT)s alone in
    the Expand scan — never one scan per column (which would be 5+),
    and never plain aggs fused into the Expand (6x row penalty)."""
    import re

    plan = plan_of(spark, "dq_column_profile")
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 2
    assert "Expand" in plan  # multi-distinct expand, by design
    # exactly ONE Expand node: the plain-agg branch must not get its own
    assert len(re.findall(r"^\(\d+\) Expand", plan, re.M)) == 1


def test_m4_downsample_semantics(spark):
    rows = run(spark, "downsample_m4_daily").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((r.event_type, r.day), {})[r.role] = r
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert by_bucket
    for (_etype, _day), picks in by_bucket.items():
        assert set(picks) == {"first", "last", "min", "max"}
        assert picks["first"].t <= picks["last"].t
        assert picks["min"].value <= picks["max"].value
        # extremes bound every pick
        for r in picks.values():
            assert picks["min"].value <= r.value <= picks["max"].value
            assert picks["first"].t <= r.t <= picks["last"].t
    n_buckets = (
        ev.selectExpr(
            "event_type",
            "unix_micros(CAST(ts AS TIMESTAMP_LTZ)) div 86400000000 AS day",
        )
        .distinct()
        .count()
    )
    assert len(rows) == 4 * n_buckets


def test_m4_single_exchange(spark):
    """Four ranked picks must share ONE shuffle (co-partitioned sorts),
    not four."""
    import re

    plan = plan_of(spark, "downsample_m4_daily")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_weighted_sample_ares_is_topk(spark):
    rows = run(spark, "weighted_sample_ares").collect()
    assert len(rows) == 20
    keys = [r.ares_key for r in rows]
    assert keys == sorted(keys, reverse=True)
    assert [r.rnk for r in rows] == list(range(1, 21))
    # deterministic: rerun yields the identical sample
    again = run(spark, "weighted_sample_ares").collect()
    assert [r.o_orderkey for r in rows] == [r.o_orderkey for r in again]
    plan = plan_of(spark, "weighted_sample_ares")
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_markov_transitions_rows_normalize(spark):
    rows = run(spark, "markov_event_transitions").collect()
    by_cur = {}
    for r in rows:
        by_cur.setdefault(r.cur_type, []).append(r)
    for cur, rs in by_cur.items():
        total_ppm = sum(r.prob_ppm for r in rs)
        # integer division truncates: sum in (1e6 - n_targets, 1e6]
        assert 1_000_000 - len(rs) < total_ppm <= 1_000_000
        assert all(r.n_trans >= 1 for r in rs)


def test_cusum_final_deviation_near_zero(spark):
    """Deviations are measured against the type's own mean, so the final
    cumulative sum per type collapses to ~0 (bounded by the mean's 1e-6
    rounding times the event count)."""
    rows = run(spark, "cusum_drift_daily").collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_by_type = {r["event_type"]: r["n"] for r in
                 ev.groupBy("event_type").agg({"*": "count"})
                 .withColumnRenamed("count(1)", "n").collect()}
    last = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        last[r.event_type] = r
    for etype, r in last.items():
        # micro-units: n * 0.5 (mean rounding) + scale-4 daily recovery
        assert abs(r.cusum_micro) <= n_by_type[etype] * 1 + 10_000


def test_linreg_matches_corr_family(spark):
    rows = run(spark, "linreg_price_vs_quantity").collect()
    assert len(rows) == 3
    import math

    for r in rows:
        assert 0.0 <= r.r2 <= 1.0
        assert math.isfinite(r.slope) and math.isfinite(r.intercept)
        # intercept closes the normal equations: mean_y = slope*mean_x + b
        # (checked loosely; power sums are rounded to 2-4 decimals)
        assert abs(r.intercept) < 1e8


def test_ab_test_covers_all_users(spark):
    r = run(spark, "ab_test_conversion").collect()[0]
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert r.significant in (0, 1)


def test_knn_classification_covers_probes(spark):
    rows = run(spark, "knn_classification_accuracy").collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_probes = emb.where("vec_id % 50 = 7").count()
    assert sum(r.n_probes for r in rows) == n_probes
    for r in rows:
        assert 0 <= r.n_correct <= r.n_probes
        assert abs(r.accuracy - r.n_correct / r.n_probes) < 1e-6


def test_time_to_conversion_ordering(spark):
    rows = run(spark, "time_to_conversion").collect()
    assert {r.cohort for r in rows} <= {0, 1}
    for r in rows:
        assert r.n_users > 0
        assert r.min_s <= r.p50_s <= r.p90_s <= r.max_s
        assert r.min_s >= 0  # purchase is at-or-after the first view


def test_gini_in_unit_interval(spark):
    rows = run(spark, "gini_customer_revenue").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers > 0 and r.total_revenue > 0


def test_heatmap_cells_bounded(spark):
    rows = run(spark, "heatmap_dow_hour").collect()
    assert 0 < len(rows) <= 7 * 24
    ev_n = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r.n_events for r in rows) == ev_n
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hour <= 23


def test_burstiness_bounded(spark):
    rows = run(spark, "burstiness_interarrival").collect()
    assert rows
    for r in rows:
        assert r.mean_gap_s > 0
        assert r.cv > 0
        assert -1.0 < r.burstiness < 1.0  # B = (cv-1)/(cv+1)


def test_zipf_fit_shape(spark):
    r = run(spark, "zipf_token_fit").collect()[0]
    assert r.n == min(30, r.n)
    assert r.zipf_slope < 0  # frequency decreases with rank
    assert 0.0 <= r.r2 <= 1.0


def test_novelty_first_doc_is_fully_novel(spark):
    rows = run(spark, "ngram_novelty_score").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert r.novelty_ppm == r.n_novel * 1_000_000 // r.n_grams
    # the output is the 50 LEAST-novel docs in ascending order — assert
    # the ordering contract the LIMIT depends on (the first-doc-owns-all
    # closed form is pinned on a tiny corpus in test_edge_inputs)
    ppms = [r.novelty_ppm for r in rows]
    assert ppms == sorted(ppms)
    assert len(rows) == 50


def test_dup_graph_degrees_consistent(spark):
    rows = run(spark, "dup_graph_degree_stats").collect()
    for r in rows:
        assert r.degree >= 1 and r.n_docs >= 1
        assert r.min_doc <= r.max_doc


def test_dataset_card_totals(spark):
    r = run(spark, "dataset_card_summary").collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert r.n_docs == docs.count()
    assert r.total_chars == sum(x.n_chars for x in docs.select("n_chars").collect())
    assert r.min_tokens <= r.p50_tokens <= r.p90_tokens <= r.max_tokens
    assert 0 <= r.exact_dup_ppm < 1_000_000


def test_winsorized_mean_matches_independent_recompute(spark):
    import numpy as np

    rows = run(spark, "winsorized_mean_by_type").collect()
    assert rows
    vals = {}
    for v in (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .collect()
    ):
        vals.setdefault(v.event_type, []).append(v.value)
    for r in rows:
        a = np.array(vals[r.event_type])
        assert r.n == len(a)
        # same construction as the query: linear-interp percentiles
        # rounded to 6 BEFORE clipping
        lo = round(float(np.percentile(a, 5)), 6)
        hi = round(float(np.percentile(a, 95)), 6)
        expect = float(np.clip(a, lo, hi).mean())
        assert r.mean_winsorized == pytest.approx(expect, abs=1e-6)
        assert r.mean_raw == pytest.approx(float(a.mean()), abs=1e-6)


def test_mad_outliers_bounded(spark):
    rows = run(spark, "mad_outliers_by_type").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n
        assert r.mad_v >= 0


def test_cross_source_overlap_diagonal_exact(spark):
    rows = run(spark, "cross_source_overlap").collect()
    srcs = {r.src_a for r in rows}
    diag = {r.src_a: r for r in rows if r.src_a == r.src_b}
    assert set(diag) == srcs  # every source overlaps itself...
    for r in diag.values():
        assert r.overlap_ppm == 1_000_000  # ...completely
    for r in rows:
        assert 0 < r.shared_grams <= r.total_grams_a


def test_knn_label_noise_indexed_equals_exhaustive(spark):
    """Round-9 VERDICT item 1: the IVF-index-routed label-noise query
    must produce the IDENTICAL relation to the exhaustive probe x corpus
    twin (its oracle) — exact candidate recall over the planted
    micro-cluster corpus, exact-rerank cosine, same tiebreaks."""
    exact = {tuple(r) for r in run(spark, "knn_label_noise").collect()}
    routed = {
        tuple(r) for r in run(spark, "knn_label_noise_indexed").collect()
    }
    assert routed == exact
    assert exact, "vacuous: planted mislabels must be flagged"
    # planted flags: vec_id % 5 = 0 (probe) and % 37 = 0 (flip) => % 185
    assert all(vid % 185 == 0 for vid, *_ in exact)


def test_knn_label_noise_indexed_plan_shape(spark):
    """The routed plan must read the persisted inverted file (parquet
    store scan) and must NOT contain the exhaustive theta-join on
    vec_id <> vec_id (the quadratic shape the index replaces)."""
    run(spark, "knn_label_noise_indexed").collect()  # ensure store built
    plan = plan_of(spark, "knn_label_noise_indexed")
    assert "knn_ivf_label_index" in plan


def test_ivf_cogroup_scores_matches_bruteforce(spark):
    """The cogrouped-matmul candidate scorer must return, per probe, the
    same top-m (by normalized dot, neighbor tiebreak) over its probed
    lists as a driver-side numpy brute force — including self-exclusion
    and the empty-side guard."""
    import numpy as np
    from pyspark.sql import functions as F

    from summarydb_spark.functions import similarity

    rng = np.random.RandomState(7)
    M = rng.standard_normal((40, 8))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in M[i]], int(i % 3)) for i in range(40)],
        "neighbor_id long, cand_emb array<double>, list_id int",
    )
    probes = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(0, 40, 10)],
        "query_id long, emb array<double>",
    )
    cent = np.vstack(
        [M[assign].mean(0) / np.linalg.norm(M[assign].mean(0))
         for assign in ([0, 3], [1, 4], [2, 5])]
    )
    lists = similarity.ivf_probe_lists(
        probes, cent, n_probe=2, emb_col="emb", id_col="query_id"
    )
    got = (
        similarity.ivf_cogroup_scores(lists, corpus, m=3, emb_col="cand_emb")
        .orderBy("query_id", F.desc("score"), "neighbor_id")
        .collect()
    )
    # replicate: for each probe, its 2 nearest centroid lists, then
    # top-(3+1 minus self) members of those lists by normalized dot
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in (0, 10, 20, 30):
        probe_lists = np.argsort(-(Mn[qid] @ cent.T))[:2]
        for li in probe_lists:
            members = np.array(
                [i for i in range(40) if i % 3 == li and i != qid]
            )
            s = Mn[qid] @ Mn[members].T
            order = np.lexsort((members, -s))[:3]
            want = [
                (qid, int(members[o]), float(s[o])) for o in order
            ]
            have = [
                (r.query_id, r.neighbor_id, r.score)
                for r in got
                if r.query_id == qid
                and (r.neighbor_id % 3) == li
            ]
            # got holds top-(m+1 minus self) per list; compare the top-3
            have = sorted(have, key=lambda t: (-t[2], t[1]))[:3]
            for (q1, n1, s1), (q2, n2, s2) in zip(want, have):
                assert (q1, n1) == (q2, n2)
                assert abs(s1 - s2) < 1e-12


def test_ivf_cogroup_scores_carries_member_payload(spark):
    """With ``carry``, the scorer must pass the member row's payload
    columns through onto every emitted candidate row, byte-identical to
    a join-by-neighbor_id against the inverted file (the re-join the
    routed knn tail dropped in round 10) — including the empty-group
    guard (lists with members but no probes hit the empty branch, which
    must emit object-dtype carried columns for Arrow)."""
    import numpy as np

    from summarydb_spark.functions import similarity

    rng = np.random.RandomState(7)
    M = rng.standard_normal((40, 8))
    corpus = spark.createDataFrame(
        [
            (i, [float(x) for x in M[i]], int(i % 3), int(i * 7))
            for i in range(40)
        ],
        "neighbor_id long, cand_emb array<double>, list_id int, tag long",
    )
    probes = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(0, 40, 10)],
        "query_id long, emb array<double>",
    )
    cent = np.vstack(
        [M[assign].mean(0) / np.linalg.norm(M[assign].mean(0))
         for assign in ([0, 3], [1, 4], [2, 5])]
    )
    lists = similarity.ivf_probe_lists(
        probes, cent, n_probe=2, emb_col="emb", id_col="query_id"
    )
    got = similarity.ivf_cogroup_scores(
        lists, corpus, m=3, emb_col="cand_emb",
        carry=(("tag", "long"), ("cand_emb", "array<double>")),
    ).collect()
    assert got, "vacuous: the probes must emit candidates"
    for r in got:
        assert r.tag == r.neighbor_id * 7
        assert r.cand_emb == [float(x) for x in M[r.neighbor_id]]
    # the plain call (no carry) keeps its original 3-column schema
    plain = similarity.ivf_cogroup_scores(
        lists, corpus, m=3, emb_col="cand_emb"
    )
    assert plain.columns == ["query_id", "neighbor_id", "score"]


def test_ivf_delta_equals_rebuild_and_exhaustive(spark):
    """The append-maintained index (base on vec_id%7!=0, batch assigned to
    existing lists) must flag the IDENTICAL rows as both the full-rebuild
    index and the exhaustive twin — zero recall lost to maintenance."""
    rows = lambda name: {
        tuple(r) for r in run(spark, name).collect()
    }
    delta = rows("knn_label_noise_ivf_delta")
    rebuilt = rows("knn_label_noise_indexed")
    exhaustive = rows("knn_label_noise")
    assert delta == rebuilt == exhaustive
    assert delta, "vacuous: the planted corpus must contain flags"


def test_ivf_skew_trigger(spark):
    """ivf_list_skew / ivf_needs_retrain: a uniform inverted file stays
    under the bound; a batch piling into one list trips it; empty lists
    count toward the mean (drained quantizer also shows skew)."""
    from pyspark.sql import functions as F

    from summarydb_spark.functions.similarity import (
        ivf_list_skew,
        ivf_needs_retrain,
    )

    nlist = 16
    uniform = spark.range(1600).select(
        (F.col("id") % nlist).cast("int").alias("list_id")
    )
    mx, mean, ratio = ivf_list_skew(uniform, nlist)
    assert (mx, mean) == (100, 100.0) and ratio == 1.0
    assert not ivf_needs_retrain(uniform, nlist, bound=8.0)

    # planted drift: 1600 base uniform + 1500 batch rows all in list 0
    skewed = uniform.unionByName(
        spark.range(1500).select(F.lit(0).cast("int").alias("list_id"))
    )
    assert ivf_needs_retrain(skewed, nlist, bound=8.0)

    # drained file: all mass in 2 of 16 lists -> ratio 8 exactly (not >)
    drained = spark.range(200).select(
        (F.col("id") % 2).cast("int").alias("list_id")
    )
    assert ivf_list_skew(drained, nlist)[2] == 8.0
    assert not ivf_needs_retrain(drained, nlist, bound=8.0)
    assert ivf_needs_retrain(drained, nlist, bound=7.9)
