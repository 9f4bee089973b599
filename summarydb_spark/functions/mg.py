"""Misra-Gries heavy hitters as a distributed mergeable summary.

The deterministic counter-based alternative to CMS frequency sketching
(functions/sketch.py): each partition keeps at most ``k`` counters; the
classic decrement-all step charges every decrement to a prior increment,
so a partition pass is O(rows + k).  Per-partition summaries merge by
plain count addition, and the union of surviving keys provably contains
every item with global frequency > N/k (an item absent from every
partition summary lost at most n_p/k counts per partition, which sums to
N/k).  The exact pass then runs ONLY over the candidate set — the classic
two-pass exact-heavy-hitter plan that never shuffles the raw stream by
value.

Scale shape (100 TB): one ``mapInPandas`` pass emits <= k rows per
partition (KB-scale summaries regardless of input size); the candidate
set is broadcast back into a semi-join for the exact count.  No groupBy
over raw values ever happens, which is the point — a hot key that would
skew a naive count-group-by is bounded to one counter here.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MG_SUMMARY_SCHEMA = "value string, est long, part_n long"


def _mg_partition(k: int):
    """Vectorized per-partition MG pass: each Arrow batch is collapsed to
    (value, count) by pandas ``value_counts`` (one C pass, no per-row
    Python), folded into the running counter dict, then reduced back to
    <= k counters by the mergeable-summaries rule (Agarwal et al., PODS
    2012): subtract the (k+1)-st largest count from every counter and
    drop the non-positive.  Each reduction subtracting d charges
    d*(k+1) decrement mass against stored mass <= rows seen, so any
    item's total undercount is <= n_p/(k+1) <= n_p/k — the same
    guarantee as the classic per-row decrement loop, at ~distinct-per-
    batch interpreter cost instead of per-row.

    Null values count toward n but never become counters: a null
    candidate could not survive the downstream equi-join re-count
    anyway, and SQL ``GROUP BY``-based oracles never emit it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            vc = pdf["value"].value_counts(dropna=True)
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                sub = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: cnt - sub
                    for key, cnt in counters.items()
                    if cnt > sub
                }
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "value": list(counters.keys()),
                "est": list(counters.values()),
                "part_n": [n] * len(counters),
            }
        )

    return run


def heavy_hitters_mg(
    values: DataFrame, k: int = 64, threshold_denom: int = 50
) -> DataFrame:
    """Exact items with frequency >= N/``threshold_denom`` via a
    Misra-Gries candidate pass (``k`` counters per partition; requires
    ``k >= threshold_denom`` so no qualifying item can be missed).

    ``values``: a single STRING column named ``value``.  Returns
    (value, exact_cnt, mg_bound_ok) — deterministic regardless of
    partitioning: the candidate union can vary with the split, but the
    final filter re-counts candidates EXACTLY, so the surviving set is
    always precisely the true heavy hitters.  ``mg_bound_ok`` checks the
    summed-summary guarantee est <= exact <= est + N/k (integerized as
    exact*k <= est*k + N).
    """
    if k < threshold_denom:
        raise ValueError(
            f"k={k} < threshold_denom={threshold_denom}: the MG union "
            f"would not be guaranteed to contain every heavy hitter"
        )
    summaries = values.mapInPandas(_mg_partition(k), MG_SUMMARY_SCHEMA)
    # part_n is constant within a partition's rows; summing it per value
    # would double-count — total N comes from the source relation itself
    total = values.agg(F.count(F.lit(1)).alias("n"))
    est = summaries.groupBy("value").agg(F.sum("est").alias("est"))
    exact = (
        values.join(F.broadcast(est.select("value")), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        exact.join(F.broadcast(est), "value")
        .crossJoin(F.broadcast(total))
        .where(F.col("exact_cnt") * threshold_denom >= F.col("n"))
        .select(
            "value",
            "exact_cnt",
            (
                (F.col("est") <= F.col("exact_cnt"))
                & (F.col("exact_cnt") * k <= F.col("est") * k + F.col("n"))
            ).alias("mg_bound_ok"),
        )
    )
