"""Driver-state / plan-size scale guards.

The per-stream metadata (element counts, last timestamps, windowing
boundaries) must flow through broadcast joins, never through literal
``create_map`` expressions or UDF-closure dicts: a plan that embeds one
entry per stream is O(#streams) in BOTH driver memory and plan size and
collapses in the millions-of-streams regime (the reference keeps this
metadata in storage, core/db.go:100-150).

These tests run the incremental merge and the monotonic clamp over 10k
streams and pin that (a) the optimized plan stays small and map-literal
free, and (b) results still agree with the batch rebuild oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summarydb_spark.operators.incremental import merge_summary_increment
from summarydb_spark.operators.summary import (
    build_summary_windows,
    clamp_monotonic,
)
from summarydb_spark.windowing import ExpWindowing

N_STREAMS = 10_000
EV_PER_STREAM = 4


def _batch(spark):
    # 4 events per stream, generated distributed (no driver-side rows)
    return spark.range(N_STREAMS * EV_PER_STREAM).select(
        (F.col("id") % N_STREAMS).alias("stream_id"),
        (F.col("id") / N_STREAMS).cast("long").alias("seq"),
        (100 + (F.col("id") / N_STREAMS).cast("long") * 10).alias("ts"),
        (F.col("id") % 13).cast("double").alias("value"),
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.mark.parametrize(
    "windowing", [ExpWindowing(2.0), ExpWindowing(1.5)], ids=["exp2", "general"]
)
def test_incremental_merge_plan_is_stream_count_free(spark, windowing):
    batch = _batch(spark)
    base = spark.range(N_STREAMS).select(
        F.col("id").alias("stream_id"), F.lit(0).cast("long").alias("n")
    )
    out = merge_summary_increment(
        None, batch, windowing, base_counts=base, order_cols=("seq",)
    )
    plan = _plan(out)
    assert "create_map" not in plan and "map(" not in plan
    # a 10k-entry literal map would be megabytes; a join-based plan is tiny
    assert len(plan) < 100_000, f"plan bloat: {len(plan)} chars"

    oracle = build_summary_windows(batch, windowing, order_cols=("seq",))
    assert out.exceptAll(oracle).count() == 0
    assert oracle.exceptAll(out.select(*oracle.columns)).count() == 0


def test_clamp_monotonic_plan_is_stream_count_free(spark):
    batch = _batch(spark)
    last = spark.range(N_STREAMS).select(
        F.col("id").alias("stream_id"),
        (F.lit(500) + F.col("id") % 7).cast("long").alias("last_ts"),
    )
    out = clamp_monotonic(batch, last_ts=last)
    plan = _plan(out)
    assert "create_map" not in plan and "map(" not in plan
    assert len(plan) < 100_000, f"plan bloat: {len(plan)} chars"
    # every stream's chain continues from its stored last_ts: first batch
    # ts (100) < last_ts+1, so it clamps to last_ts + 1
    first = out.where(F.col("seq") == 0)
    bad = first.join(last, "stream_id").where(
        F.col("ts") != F.col("last_ts") + 1
    )
    assert bad.count() == 0
