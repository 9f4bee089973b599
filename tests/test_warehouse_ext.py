"""Warehouse-extension operators: SCD2 build, last-touch attribution,
transition audit, changelog compact+merge, rolling median, exact EWMA.

Semantics tests run at sf0.001; plan pins follow tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io
from collections import defaultdict

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


def test_scd2_intervals_are_contiguous_versions(spark):
    rows = run(spark, "scd2_user_state_history").collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_sampled = ev.where("user_id % 7 = 0").count()
    assert sum(r.n_events for r in rows) == n_sampled
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        assert sum(r.is_current for r in vs) == 1
        assert vs[-1].is_current == 1 and vs[-1].valid_to_us == -1
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us  # contiguous
            assert a.state != b.state  # runs collapsed


def test_attribution_channels_and_purchase_totals(spark):
    rows = run(spark, "attribution_last_touch").collect()
    assert {r.channel for r in rows} <= {"view", "click", "direct"}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_purch = ev.where("event_type = 'purchase'").count()
    assert sum(r.n_purchases for r in rows) == n_purch
    assert all(r.revenue > 0 for r in rows)


def test_attribution_single_pass_no_fact_join(spark):
    plan = plan_of(spark, "attribution_last_touch")
    # carry-forward window, not a purchases x touches self-join
    assert "Join" not in plan
    assert plan.count("events.parquet") == 1


def test_state_machine_reports_only_disallowed(spark):
    allowed = {
        ("signup", "view"), ("view", "view"), ("view", "click"),
        ("click", "view"), ("click", "click"), ("click", "purchase"),
        ("purchase", "view"), ("view", "error"), ("error", "view"),
    }
    rows = run(spark, "state_machine_violations").collect()
    assert rows
    for r in rows:
        assert (r.prev_type, r.curr_type) not in allowed
        assert r.prev_type is not None
        assert 1 <= r.n_users and r.n_users <= r.n_violations


def test_state_machine_rules_broadcast(spark):
    plan = plan_of(spark, "state_machine_violations")
    assert "BroadcastHashJoin" in plan  # literal rule relation, never shuffled
    assert "CartesianProduct" not in plan


def test_changelog_merge_one_row_per_user_delta_wins(spark):
    rows = run(spark, "changelog_compact_merge").collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert len(rows) == ev.select("user_id").distinct().count()
    t0 = 1705363200000000
    from pyspark.sql import functions as F

    per_user = {
        r.user_id: (r.n, r.max_t)
        for r in ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max(F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))")).alias(
                "max_t"
            ),
        )
        .collect()
    }
    for r in rows:
        n, max_t = per_user[r.user_id]
        assert r.n_versions == n  # compaction accounts for every version
        assert r.state_t_us == max_t  # last writer wins
        assert r.src == ("delta" if max_t >= t0 else "base")


def test_rolling_median_bounded_by_window(spark):
    rows = run(spark, "rolling_median_daily_count").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for vs in by_type.values():
        vs.sort(key=lambda r: r.d)
        for i, r in enumerate(vs):
            window = [x.n for x in vs[max(0, i - 6) : i + 1]]
            assert min(window) <= r.med7 <= max(window)
        assert vs[0].med7 == float(vs[0].n)  # first row: median of itself


def test_ewma_first_day_equals_revenue_and_bounds(spark):
    rows = sorted(
        run(spark, "ewma_halflife_daily").collect(), key=lambda r: r.d
    )
    assert rows[0].ewma_cents == rows[0].rev_cents
    by_d = {r.d: r.rev_cents for r in rows}
    for r in rows:
        window = [
            by_d[d] for d in range(r.d - 19, r.d + 1) if d in by_d
        ]
        assert len(window) == r.n_days_in_window
        assert min(window) - 1 <= r.ewma_cents <= max(window)


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    rows = {r.event_type: r for r in run(spark, "salted_join_skew").collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    weights = {"click": 2, "error": 0, "purchase": 10, "signup": 5, "view": 1}
    plain = {
        r.event_type: (r.n, float(r.s))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(rows) == set(plain)
    for t, r in rows.items():
        n, s = plain[t]
        assert r.n_events == n  # salting never drops or duplicates a row
        assert abs(r.weighted_revenue - s * weights[t]) < 1e-6 * max(1.0, s)


def test_salted_dim_never_shuffles_the_fact(spark):
    plan = plan_of(spark, "salted_join_skew")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bootstrap_ci_brackets_true_mean(spark):
    from pyspark.sql import functions as F

    (row,) = run(spark, "bootstrap_mean_ci_poisson").collect()
    assert row.n_resamples == 64
    assert row.ci_lo_micro <= row.mean_of_means_micro <= row.ci_hi_micro
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    true_mean = (
        ev.where("event_type = 'purchase' AND value IS NOT NULL")
        .agg(F.avg("value"))
        .collect()[0][0]
    )
    # 95% CI from 64 resamples of ~400 purchases: generous 10% sanity band
    assert abs(row.mean_of_means_micro / 1e6 - true_mean) < 0.10 * true_mean
    assert row.ci_lo_micro <= true_mean * 1e6 <= row.ci_hi_micro


def test_rfm_segments_partition_customers(spark):
    rows = run(spark, "customer_rfm_segments").collect()
    ev = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert sum(r.n_customers for r in rows) == (
        ev.select("o_custkey").distinct().count()
    )
    for r in rows:
        seg = r.rfm_segment
        assert all(1 <= d <= 5 for d in (seg // 100, seg // 10 % 10, seg % 10))
        assert r.total_orders >= r.n_customers


def test_ewma_joins_stay_off_the_fact(spark):
    plan = plan_of(spark, "ewma_halflife_daily")
    # Spark inlines the twice-referenced daily CTE, so orders is scanned
    # twice — but each scan is column-pruned and aggregated to #days rows
    # BEFORE the range self-join (the join never sees the fact)
    assert plan.count("orders.parquet") <= 2
    assert "ReadSchema: struct<o_totalprice" in plan
    assert "CartesianProduct" not in plan


def test_session_paths_are_valid_trigrams(spark):
    types = {"view", "click", "purchase", "signup", "error"}
    rows = run(spark, "session_path_trigrams").collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_paths for r in rows]
    assert counts == sorted(counts, reverse=True)  # top-k ordering
    for r in rows:
        segs = r.path.split(">")
        assert len(segs) == 3 and set(segs) <= types
        assert 1 <= r.n_users <= r.n_paths


def test_seasonal_backtest_identities(spark):
    rows = run(spark, "seasonal_naive_backtest").collect()
    assert rows
    for r in rows:
        assert r.n_obs > 0
        assert r.wape_ppm >= 0 and r.mae_milli >= 0
        assert r.mae_milli == r.total_abs_err * 1000 // r.n_obs


def test_rolling_ols_slope_matches_numpy(spark):
    import numpy as np

    rows = run(spark, "rolling_ols_slope_14d").collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r.event_type].append(r)
    for vs in by_type.values():
        vs.sort(key=lambda r: r.d)
        for i, r in enumerate(vs):
            w = vs[max(0, i - 13) : i + 1]
            assert r.n_window == len(w)
            x = np.array([v.d for v in w], dtype=np.int64)
            y = np.array([v.y for v in w], dtype=np.int64)
            n = len(w)
            num = int(n * (x * y).sum() - x.sum() * y.sum()) * 1000
            den = int(n * (x * x).sum() - x.sum() ** 2)
            if den == 0:
                assert r.slope_milli is None
            else:
                # both engines truncate integer division toward zero
                assert r.slope_milli == int(num / den)


def test_snapshot_diff_partitions_all_users(spark):
    rows = run(spark, "snapshot_diff_counts").collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert sum(r.n_users for r in rows) == (
        ev.select("user_id").distinct().count()
    )
    kinds = {r.change for r in rows}
    assert kinds <= {"added", "state_changed", "value_changed", "unchanged"}
    assert "state_changed" in kinds or "added" in kinds


def test_peak_concurrency_bounded_by_sessions(spark):
    rows = run(spark, "peak_concurrency_daily").collect()
    assert rows
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert 0 <= r.peak_concurrent <= n_users  # never more than users
        assert r.n_endpoints >= 1


def test_linear_attribution_conserves_credit_exactly(spark):
    from pyspark.sql import functions as F

    rows = run(spark, "attribution_linear_multitouch").collect()
    total_credit = sum(r.credited_micro for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    total_purchases = (
        ev.where("event_type = 'purchase' AND value IS NOT NULL")
        .select(F.round(F.col("value") * 1000000, 0).cast("long").alias("v"))
        .agg(F.sum("v"))
        .collect()[0][0]
    )
    assert total_credit == total_purchases  # exact conservation, to the micro
    assert {r.channel for r in rows} <= {"view", "click", "direct"}


def test_active_time_union_never_double_counts(spark):
    cov = {r.d: r.covered_us for r in run(spark, "active_time_union_daily").collect()}
    peak = {r.d: r.peak_concurrent for r in run(spark, "peak_concurrency_daily").collect()}
    day_us = 86_400_000_000
    assert cov
    for d, us in cov.items():
        assert 0 < us  # some coverage on every day with endpoints
        # union can never exceed wall-clock x 1 (it's a union, not a sum),
        # modulo the start-day attribution of gaps that cross midnight
        assert us <= 2 * day_us
        if d in peak:
            assert peak[d] >= 1
