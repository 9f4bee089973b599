"""Incremental (streaming) maintenance of the decayed summary table.

The reference maintains decay with a merge heap processing one append at a
time (core/merger.go:106-127, :209-239).  The Spark-native equivalent
exploits the same invariant the heap relies on: **canonical windows only
coarsen** — once two elements share a window at count N they share one at
every N' > N (the merge scheduler computes exactly the first such N,
window/generic_windowing.go:82-120).  Therefore the canonical state at
N + B is reachable from the canonical state at N by *merging whole old
windows* plus bucketing the B new events — no old window ever splits.

So a micro-batch update is:

    units = old summary windows (pre-aggregated)  UNION  new events (singletons)
    bucket(unit) = canonical bucket of the unit's count interval at new N
    groupBy(stream_id, bucket) -> monoid merge (count/sum/max/min, time/count bounds)

Cost per batch: O(streams * log N) state rows + O(B) new rows through one
hash aggregation — independent of history size.  This is the scale path
for 100 TB streams; the batch rebuild (operators/summary.py) remains the
oracle in tests.
"""

from __future__ import annotations

from typing import Mapping, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from summarydb_spark.operators.summary import SUMMARY_COLS
from summarydb_spark.windowing import ExpWindowing, canonical_boundaries

_UNIT_COLS = [
    "stream_id",
    "count_start",
    "count_end",
    "time_start",
    "time_end",
    "count",
    "sum",
    "max",
    "min",
]


def _events_as_units(
    batch: DataFrame,
    base_counts: Mapping[int, int],
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
) -> DataFrame:
    """Turn batch events into singleton units with insertion indexes that
    continue each stream's existing count."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(stream_col).orderBy(*order)
    base = F.create_map(
        *[F.lit(x) for kv in base_counts.items() for x in kv]
    ) if base_counts else None
    idx = F.row_number().over(w).cast("long") - 1
    if base is not None:
        idx = idx + F.coalesce(base[F.col(stream_col)], F.lit(0))
    ev = batch.select(
        F.col(stream_col).alias("stream_id"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
        *[F.col(c) for c in order_cols],
    ).withColumn("_idx", idx)
    return ev.select(
        "stream_id",
        F.col("_idx").alias("count_start"),
        F.col("_idx").alias("count_end"),
        F.col("ts").alias("time_start"),
        F.col("ts").alias("time_end"),
        F.lit(1).cast("long").alias("count"),
        F.col("value").alias("sum"),
        F.col("value").alias("max"),
        F.col("value").alias("min"),
    )


def _general_bucket_udf(windowing, new_counts: Mapping[int, int], buffer_size: int):
    bounds = {
        sid: np.asarray(
            canonical_boundaries(windowing, int(nn), buffer_size), dtype=np.int64
        )
        for sid, nn in new_counts.items()
    }
    n_map = {sid: int(nn) for sid, nn in new_counts.items()}

    @pandas_udf("long")
    def bucket_of(stream: pd.Series, count_end: pd.Series) -> pd.Series:
        out = np.empty(len(count_end), dtype=np.int64)
        cv = count_end.to_numpy()
        sv = stream.to_numpy()
        for sid in pd.unique(sv):
            mask = sv == sid
            b = bounds[sid]
            rank = n_map[sid] - 1 - cv[mask]
            # boundaries are in count (insertion-index) space oldest-first;
            # map rank back to index space for the searchsorted
            out[mask] = np.searchsorted(b, n_map[sid] - 1 - rank, side="right") - 1
        return pd.Series(out)

    return bucket_of


def merge_summary_increment(
    old_summary: Optional[DataFrame],
    batch: DataFrame,
    windowing,
    base_counts: Optional[Mapping[int, int]] = None,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
    buffer_size: int = 0,
) -> DataFrame:
    """One micro-batch step: old canonical summary + new events -> new
    canonical summary (schema ``SUMMARY_COLS``).

    ``base_counts`` maps stream_id -> element count already summarized
    (i.e. the stream's N before this batch); defaults to counts derived
    from ``old_summary``.
    """
    if base_counts is None:
        base_counts = {}
        if old_summary is not None:
            base_counts = {
                r["stream_id"]: r["n"]
                for r in old_summary.groupBy("stream_id")
                .agg((F.max("count_end") + 1).alias("n"))
                .collect()
            }

    new_units = _events_as_units(
        batch,
        base_counts,
        stream_col=stream_col,
        ts_col=ts_col,
        value_col=value_col,
        order_cols=order_cols,
    )
    units = new_units
    if old_summary is not None:
        units = old_summary.select(*_UNIT_COLS).unionByName(new_units)

    # per-stream new total N' (old N + batch size)
    batch_counts = {
        r["stream_id"]: r["c"]
        for r in batch.groupBy(F.col(stream_col).alias("stream_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    new_counts = dict(base_counts)
    for sid, c in batch_counts.items():
        new_counts[sid] = new_counts.get(sid, 0) + c

    n_map = F.create_map(*[F.lit(x) for kv in new_counts.items() for x in kv])
    units = units.withColumn("_n", n_map[F.col("stream_id")])

    exp2 = (
        isinstance(windowing, ExpWindowing)
        and windowing.base == 2.0
        and buffer_size <= 0
    )
    if exp2:
        # bucket of the unit's newest element; the coarsening invariant
        # guarantees the whole [count_start, count_end] interval shares it
        from summarydb_spark.operators.summary import with_exp2_bucket

        units = with_exp2_bucket(units, "count_end", "_n", "bucket")
    else:
        udf = _general_bucket_udf(windowing, new_counts, buffer_size)
        units = units.withColumn(
            "bucket", udf(F.col("stream_id"), F.col("count_end"))
        )

    return (
        units.groupBy("stream_id", "bucket")
        .agg(
            F.min("time_start").alias("time_start"),
            F.max("time_end").alias("time_end"),
            F.min("count_start").alias("count_start"),
            F.max("count_end").alias("count_end"),
            F.sum("count").alias("count"),
            F.sum("sum").alias("sum"),
            F.max("max").alias("max"),
            F.min("min").alias("min"),
        )
        .withColumn("window_id", F.col("count_start"))
        .select(*SUMMARY_COLS)
    )


def merge_sketch_increment(
    old_sketches: Optional[DataFrame],
    batch: DataFrame,
    windowing,
    ops,
    base_counts: Mapping[int, int],
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
    buffer_size: int = 0,
) -> DataFrame:
    """One micro-batch step for the per-window sketch state.

    Same coarsening argument as ``merge_summary_increment``: every sketch
    is a commutative monoid (bloom word-OR, CMS keywise sum, HLL register
    max, KLL merge), so the canonical sketch state at N + B = re-bucket
    old window sketches at the new N, build sketches for the B new events,
    and merge per (stream, bucket) — O(streams * log N) state rows + O(B)
    events through hash aggregation, no history rescan.

    ``old_sketches`` rows are ``build_sketch_windows`` output (window_id =
    the window's count_start, count = its element count — together they
    give the count interval the re-bucketing needs).
    """
    from summarydb_spark.operators.sketch_windows import build_sketch_windows
    from summarydb_spark.operators.summary import with_exp2_bucket

    ops = {"cms" if o == "freq" else o for o in ops}

    # -- index + bucket the batch events at the new N -----------------------
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(stream_col).orderBy(*order)
    base_map = (
        F.create_map(*[F.lit(x) for kv in base_counts.items() for x in kv])
        if base_counts
        else None
    )
    idx = F.row_number().over(w).cast("long") - 1
    if base_map is not None:
        idx = idx + F.coalesce(base_map[F.col(stream_col)], F.lit(0))
    ev = (
        batch.select(
            F.col(stream_col).alias("stream_id"),
            F.col(ts_col).cast("long").alias("ts"),
            F.col(value_col).cast("double").alias("value"),
            *[F.col(c) for c in order_cols],
        )
        .withColumn("idx", idx)
        .drop(*order_cols)
    )

    batch_counts = {
        r["stream_id"]: r["c"]
        for r in batch.groupBy(F.col(stream_col).alias("stream_id"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    new_counts = dict(base_counts)
    for sid, c in batch_counts.items():
        new_counts[sid] = new_counts.get(sid, 0) + c
    n_map = F.create_map(*[F.lit(x) for kv in new_counts.items() for x in kv])

    exp2 = (
        isinstance(windowing, ExpWindowing)
        and windowing.base == 2.0
        and buffer_size <= 0
    )

    def bucketed(df: DataFrame, idx_col: str) -> DataFrame:
        df = df.withColumn("_n", n_map[F.col("stream_id")])
        if exp2:
            return with_exp2_bucket(df, idx_col, "_n", "bucket").drop("_n")
        udf = _general_bucket_udf(windowing, new_counts, buffer_size)
        return df.withColumn(
            "bucket", udf(F.col("stream_id"), F.col(idx_col))
        ).drop("_n")

    new_sk = build_sketch_windows(bucketed(ev, "idx"), ops, keep_bucket=True)

    units = new_sk
    if old_sketches is not None:
        old = old_sketches.withColumn(
            "_count_end", F.col("window_id") + F.col("count") - 1
        )
        # the whole old window shares one new bucket (coarsening invariant)
        old = bucketed(old, "_count_end").drop("_count_end")
        units = old.select(*new_sk.columns).unionByName(new_sk)

    # -- monoid merge per (stream, new bucket) ------------------------------
    aggs = [
        F.min("time_start").alias("time_start"),
        F.max("time_end").alias("time_end"),
        F.min("window_id").alias("window_id"),
        F.sum("count").alias("count"),
    ]
    if "hll" in ops:
        aggs.append(F.hll_union_agg("hll").alias("hll"))
    if "kll" in ops:
        aggs.append(F.collect_list("kll").alias("_klls"))
    merged = units.groupBy("stream_id", "bucket").agg(*aggs)
    if "kll" in ops:
        merged = merged.withColumn(
            "kll",
            F.reduce(
                F.slice("_klls", 2, F.greatest(F.size("_klls") - 1, F.lit(0))),
                F.element_at("_klls", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ),
        ).drop("_klls")
    if "bloom" in ops:
        bl = (
            units.select("stream_id", "bucket", F.explode("bloom").alias("w", "bits"))
            .groupBy("stream_id", "bucket", "w")
            .agg(F.bit_or("bits").alias("bits"))
            .groupBy("stream_id", "bucket")
            .agg(
                F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias(
                    "bloom"
                )
            )
        )
        merged = merged.join(bl, ["stream_id", "bucket"])
    if "cms" in ops:
        cm = (
            units.select("stream_id", "bucket", F.explode("cms").alias("k", "cnt"))
            .groupBy("stream_id", "bucket", "k")
            .agg(F.sum("cnt").alias("cnt"))
            .groupBy("stream_id", "bucket")
            .agg(F.map_from_entries(F.collect_list(F.struct("k", "cnt"))).alias("cms"))
        )
        merged = merged.join(cm, ["stream_id", "bucket"])
    return merged.drop("bucket")
