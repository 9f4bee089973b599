"""Misra-Gries operator semantics: the candidate-union guarantee, the
exactness of the final set under adversarial partitioning, and the
k >= denom precondition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from summarydb_spark.functions.mg import heavy_hitters_mg


def _values(spark, items, partitions):
    return spark.createDataFrame(
        [(v,) for v in items], "value string"
    ).repartition(partitions)


def test_exact_set_regardless_of_partitioning(spark):
    # 1000 rows: 'hot' x300, 'warm' x100, 96 distinct cold keys x~6
    items = ["hot"] * 300 + ["warm"] * 100
    for i in range(96):
        items += [f"cold{i}"] * 6
    items += ["pad"] * (1000 - len(items))
    expected = {
        v: items.count(v)
        for v in set(items)
        if items.count(v) * 50 >= len(items)
    }
    for parts in (1, 7, 32):
        rows = {
            r["value"]: r
            for r in heavy_hitters_mg(
                _values(spark, items, parts), k=64, threshold_denom=50
            ).collect()
        }
        assert {v: r["exact_cnt"] for v, r in rows.items()} == expected, parts
        assert all(r["mg_bound_ok"] for r in rows.values()), parts


def test_summary_size_is_bounded(spark):
    # 10k distinct singletons: summaries stay <= k rows per partition and
    # no false heavy hitter survives
    items = [f"u{i}" for i in range(10_000)]
    out = heavy_hitters_mg(_values(spark, items, 8), k=64).collect()
    assert out == []


def test_k_below_denom_rejected(spark):
    df = _values(spark, ["a", "b"], 1)
    with pytest.raises(ValueError, match="heavy hitter"):
        heavy_hitters_mg(df, k=10, threshold_denom=50)
