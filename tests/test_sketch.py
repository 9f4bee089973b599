"""Sketch aggregate tests: no-false-negative / overestimate / merge laws
and error bounds, on the driver's synthetic events table."""

import pytest
from pyspark.sql import functions as F

from summarydb_spark.functions import sketch


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "event_type", "value"
    )


def test_bloom_no_false_negatives(spark, events):
    blooms = sketch.bloom_aggregate(events, ["event_type"], "user_id")
    present = events.select("event_type", F.col("user_id").alias("probe")).distinct()
    probed = present.join(blooms, "event_type").select(
        "event_type",
        "probe",
        sketch.bloom_contains(F.col("bloom"), F.col("probe")).alias("hit"),
    )
    assert probed.where(~F.col("hit")).count() == 0


def test_bloom_false_positive_rate(spark, events):
    blooms = sketch.bloom_aggregate(events, ["event_type"], "user_id")
    # absent probes: user ids far outside the domain
    absent = spark.range(1_000_000, 1_002_000).crossJoin(
        blooms.select("event_type", "bloom")
    )
    fp = (
        absent.select(
            sketch.bloom_contains(F.col("bloom"), F.col("id")).alias("hit")
        )
        .where("hit")
        .count()
    )
    total = absent.count()
    assert fp / total < 0.05, f"bloom FP rate {fp}/{total}"


def test_bloom_merge_law(spark, events):
    """bloom(A ∪ B) == merge(bloom(A), bloom(B)) — per-window sketches can
    answer range queries by OR-merging."""
    a = events.where("user_id % 2 = 0")
    b = events.where("user_id % 2 = 1")
    whole = sketch.bloom_aggregate(events.withColumn("g", F.lit(1)), ["g"], "user_id")
    pa = sketch.bloom_aggregate(a.withColumn("g", F.lit(1)), ["g"], "user_id")
    pb = sketch.bloom_aggregate(b.withColumn("g", F.lit(1)), ["g"], "user_id")
    merged = (
        pa.select(F.col("bloom").alias("ba"))
        .crossJoin(pb.select(F.col("bloom").alias("bb")))
        .select(sketch.bloom_merge(F.col("ba"), F.col("bb")).alias("bloom"))
    )
    assert merged.first()["bloom"] == whole.first()["bloom"]


def test_cms_overestimates_and_is_tight_when_wide(spark, events):
    exact = events.groupBy("event_type", "user_id").count()
    counters = sketch.cms_aggregate(events, ["event_type"], "user_id", width=4096)
    probes = exact.select("event_type", F.col("user_id").alias("probe"))
    est = sketch.cms_estimate(counters, probes, ["event_type"], width=4096)
    exact2 = exact.select(
        F.col("event_type").alias("et"),
        F.col("user_id").alias("uid"),
        F.col("count"),
    )
    joined = est.join(
        exact2,
        (F.col("event_type") == F.col("et")) & (F.col("_probe") == F.col("uid")),
    ).select("event_type", "uid", "estimate", "count")
    rows = joined.collect()
    assert all(r["estimate"] >= r["count"] for r in rows)
    # wide sketch on a small domain: the vast majority should be exact
    exact_frac = sum(r["estimate"] == r["count"] for r in rows) / len(rows)
    assert exact_frac > 0.9, f"CMS too loose: {exact_frac}"


def test_cms_merge_is_union_all_reagg(spark, events):
    a = events.where("value < 50")
    b = events.where("value >= 50")
    whole = sketch.cms_aggregate(events, ["event_type"], "user_id")
    pa = sketch.cms_aggregate(a, ["event_type"], "user_id")
    pb = sketch.cms_aggregate(b, ["event_type"], "user_id")
    merged = (
        pa.unionAll(pb)
        .groupBy("event_type", "_depth", "_col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_hll_within_tolerance_and_merge(spark, events):
    exact = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    )
    exact_map = {r["event_type"]: r["nd"] for r in exact}
    # per-(event_type, value-bucket) window sketches, merged up to event_type
    wnd = sketch.hll_window_sketches(
        events.withColumn("w", (F.col("value") / 10).cast("int")),
        ["event_type", "w"],
        "user_id",
    )
    est = sketch.hll_estimate_over(wnd, ["event_type"]).collect()
    for r in est:
        nd = exact_map[r["event_type"]]
        assert abs(r["approx_distinct"] - nd) / nd < 0.05


def test_kll_quantiles_bounded_rank_error(spark, events):
    wnd = sketch.kll_window_sketches(
        events.withColumn("w", F.pmod("user_id", F.lit(8)).cast("int")),
        ["event_type", "w"],
        "value",
    )
    q = sketch.kll_quantiles_over(wnd, ["event_type"], quantiles=(0.5, 0.9))
    exact = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("e50"),
        F.percentile("value", F.lit(0.9)).alias("e90"),
    )
    rows = q.join(exact, "event_type").collect()
    for r in rows:
        # KLL(k=200) rank error ~1.3%; translate via local value spread
        assert abs(r["q0_5"] - r["e50"]) / max(abs(r["e50"]), 1e-9) < 0.15
        assert abs(r["q0_9"] - r["e90"]) / max(abs(r["e90"]), 1e-9) < 0.15


def test_kll_fold_rank_error_under_any_merge_order(spark):
    """KLL merged bytes are NOT reproducible — DataSketches compaction
    flips an internal random coin, so identical inputs yield different
    (valid) sketches run-to-run; bit-stability is impossible and nothing
    may expose raw estimates to a value-hash oracle.  What IS guaranteed,
    and pinned here: every merge order's fold answers quantile queries
    within the k=200 normalized rank error (~1.65%; asserted at 3x)."""
    vals = [float(i) for i in range(500)]
    parts = [vals[0:100], vals[100:350], vals[350:500]]
    sks = [
        spark.createDataFrame([(v,) for v in p], "v double")
        .agg(F.kll_sketch_agg_double("v", F.lit(200)).alias("kll"))
        .first()["kll"]
        for p in parts
    ]
    import itertools

    for perm in itertools.permutations(sks):
        row = (
            spark.createDataFrame([(list(perm),)], "ks array<binary>")
            .select(
                F.kll_sketch_get_quantile_double(
                    sketch.kll_fold(F.col("ks")), F.lit(0.5)
                ).alias("med")
            )
            .first()
        )
        # true median rank 250/500; 3x the 1.65% rank error ~ +-25 ranks
        assert abs(row["med"] - 249.5) <= 25.0, row["med"]


def test_cms_estimate_join_broadcasts(spark, events):
    """The estimate join must actually broadcast: a right-outer join can
    only build left, so the hint belongs on the counters side — on the
    probe side Spark drops it and silently shuffles both sides."""
    import contextlib
    import io

    counters = sketch.cms_aggregate(events, ["event_type"], "user_id", width=4096)
    probes = events.select("event_type", F.col("user_id").alias("probe")).distinct()
    est = sketch.cms_estimate(counters, probes, ["event_type"], width=4096)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        est.explain(mode="formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_hll_set_ops_identities_and_bounds(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["hll_set_ops_bound"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    types = {r.type_a for r in rows} | {r.type_b for r in rows}
    assert len(rows) == len(types) * (len(types) - 1) // 2  # every pair once
    for r in rows:
        assert r.type_a < r.type_b
        assert r.nd_union == r.nd_a + r.nd_b - r.nd_inter
        assert 0 <= r.nd_inter <= min(r.nd_a, r.nd_b)
        assert max(r.nd_a, r.nd_b) <= r.nd_union
        assert r.union_within_2pct and r.inter_within_10pct
