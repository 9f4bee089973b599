"""Decayed summary-window construction as DataFrame plans.

The reference maintains the decayed window list incrementally (merge heap,
core/merger.go); at any element count N the canonical partition is a pure
function of N and the windowing policy (see summarydb_spark.windowing).  We
therefore build ``summary_windows`` declaratively:

    events -> per-stream insertion index -> bucket assignment -> groupBy/agg

For exponential base 2 (the reference's default config) bucket assignment is
a closed-form integer/bit expression (windowing.exp2_bucket_sql) — pure
whole-stage-codegen column math, no UDF, no driver state, valid at any N.
For general sequences the canonical boundaries are simulated on the driver
(O(#windows) result size) and binned with a vectorized Arrow-batched pandas
UDF (np.searchsorted, O(log W) per row).

Scale notes (100 TB):
- the per-stream insertion index uses a window function, which shuffles by
  stream_id and parallelizes across streams; for few-very-large-stream
  layouts use ``index_mode="range"`` which computes the index with a
  range-repartition + per-partition offset two-pass (no single-task sort).
- the final groupBy(stream_id, bucket) is a partial-aggregate-friendly
  hash aggregation: ~log(N) groups per stream, so the shuffle output is
  tiny regardless of input size.
- all aggregates (count/sum/max/min) are commutative monoids, exactly
  Spark's partial-aggregation contract (reference notes the same,
  core/op_set.go:51-55).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from summarydb_spark.windowing import (
    ExpWindowing,
    canonical_boundaries,
    exp2_bucket_sql,
)

SUMMARY_COLS = [
    "stream_id",
    "window_id",
    "time_start",
    "time_end",
    "count_start",
    "count_end",
    "count",
    "sum",
    "max",
    "min",
]


def clamp_monotonic(
    df: DataFrame,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    order_col: str = "seq",
    last_ts=None,
) -> DataFrame:
    """Reproduce the reference's out-of-order clamp ``ts' = max(ts, prev+1)``
    (core/pipeline.go:80-84) as column math.

    The sequential recurrence ``t'_i = max(t_i, t'_{i-1} + 1)`` has the
    closed form ``t'_i = i + running_max(t_j - j)``, which is a cumulative
    max window — fully parallel per stream partition, no driver loop.

    ``last_ts`` optionally continues the chain across batches: either a
    DataFrame ``(stream_col, last_ts)`` (the scale path — broadcast-joined,
    so plan size stays O(1) in #streams) or a small mapping stream_id ->
    last timestamp (converted to the same join).
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    idx = F.row_number().over(Window.partitionBy(stream_col).orderBy(order_col)) - F.lit(1)
    df = df.withColumn("_i", idx)
    clamped = F.col("_i") + F.max(F.col(ts_col) - F.col("_i")).over(w)
    if last_ts is not None:
        if not isinstance(last_ts, DataFrame):
            if not last_ts:
                return df.withColumn(ts_col, clamped).drop("_i")
            last_ts = df.sparkSession.createDataFrame(
                [(k, int(v)) for k, v in last_ts.items()],
                df.select(stream_col).schema.add("last_ts", "long"),
            )
        prev = last_ts.select(
            F.col(stream_col).alias("_clamp_sid"),
            F.col("last_ts").alias("_last_ts"),
        )
        df = df.join(
            F.broadcast(prev), F.col(stream_col) == F.col("_clamp_sid"), "left"
        ).drop("_clamp_sid")
        # greatest() skips NULLs, so streams with no prior state keep the
        # in-batch clamp unchanged
        clamped = F.greatest(clamped, F.col("_last_ts") + 1 + F.col("_i"))
        return df.withColumn(ts_col, clamped).drop("_i", "_last_ts")
    return df.withColumn(ts_col, clamped).drop("_i")


def _with_index(
    df: DataFrame,
    stream_col: str,
    ts_col: str,
    order_cols,
    index_mode: str = "window",
) -> DataFrame:
    """Add per-stream insertion index ``idx`` (0-based, oldest first) and
    stream size ``n``.

    ``index_mode="window"`` (default): one row_number window per stream —
    right for the reference's many-streams layout (parallelism = #streams).

    ``index_mode="range"``: for few-giant-streams layouts, where a single
    window partition would mean one task sorting (and possibly spilling)
    billions of rows.  Three bounded steps instead:

    1. range-repartition + sort *within* partitions on (stream, ts, ...) —
       Spark's sampled range partitioner splits even one stream across
       many ordered partitions;
    2. partition-local running index per stream via mapInPandas (no
       shuffle; a per-partition counter across Arrow batches);
    3. per-(partition, stream) row counts (tiny aggregate) -> driver
       computes global offsets -> broadcast map fixes the local indexes up.

    Both modes produce identical (idx, n); tests assert it.
    """
    if index_mode == "window":
        order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
        w = Window.partitionBy(stream_col).orderBy(*order)
        wn = Window.partitionBy(stream_col)
        return df.withColumn(
            "idx", F.row_number().over(w).cast("long") - 1
        ).withColumn("n", F.count(F.lit(1)).over(wn))
    if index_mode != "range":
        raise ValueError(f"unknown index_mode {index_mode!r}")

    order = [F.col(stream_col), F.col(ts_col)] + [F.col(c) for c in order_cols]
    d = df.repartitionByRange(*order).sortWithinPartitions(*order)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema_out = StructType(
        list(d.schema.fields)
        + [StructField("_pid", IntegerType()), StructField("_li", LongType())]
    )

    def local_index(it):
        import pandas as pd  # noqa: F401
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counters: dict = {}
        for pdf in it:
            lis = []
            for sid in pdf[stream_col]:
                c = counters.get(sid, 0)
                lis.append(c)
                counters[sid] = c + 1
            pdf = pdf.assign(_pid=pid, _li=lis)
            yield pdf

    d = d.mapInPandas(local_index, schema_out)
    # Global offsets from per-(partition, stream) counts — computed with
    # window functions over the tiny counts relation and broadcast-joined
    # back, so neither driver memory nor plan size grows with #streams
    # (the previous create_map-literal version was O(#streams) in both).
    counts = d.groupBy("_pid", stream_col).agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        Window.partitionBy(stream_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy(stream_col)
    fixups = counts.select(
        F.col("_pid").alias("_fix_pid"),
        F.col(stream_col).alias("_fix_sid"),
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(w_tot).alias("_ntot"),
    )
    return (
        d.join(
            F.broadcast(fixups),
            (F.col(stream_col) == F.col("_fix_sid"))
            & (F.col("_pid") == F.col("_fix_pid")),
        )
        .withColumn("idx", (F.col("_li") + F.col("_off")).cast("long"))
        .withColumn("n", F.col("_ntot").cast("long"))
        .drop("_pid", "_li", "_fix_pid", "_fix_sid", "_off", "_ntot")
    )


def bucket_expr_exp2(idx: Column | str = "idx", n: Column | str = "n") -> Column:
    """Closed-form canonical exp(2) bucket (newest window = bucket 0)."""
    rank = f"(({n}) - 1 - ({idx}))"
    return F.expr(exp2_bucket_sql(rank, str(n)))


def with_exp2_bucket(
    df: DataFrame,
    idx_col: str = "idx",
    n_col: str = "n",
    out_col: str = "bucket",
) -> DataFrame:
    """Staged-column version of the exp(2) closed form.

    The single-expression form (exp2_bucket_sql) macro-expands to ~22KB of
    SQL with 600+ casts: inlined into a whole-stage-codegen'd
    filter/aggregate it overflows the JVM constant pool and drops the stage
    to interpreted mode.  Staging each sub-term as a named column that is
    referenced more than once keeps CollapseProject from re-inlining
    (multiply-used non-cheap aliases are preserved), so every generated
    method stays small.  Semantics identical to bucket_expr_exp2 —
    the golden-parity tests cover both paths.
    """
    rank = (F.col(n_col) - 1 - F.col(idx_col)).alias("_rank")
    n1 = (F.col(n_col) + 1).cast("double")
    t0 = F.floor(F.log2(n1)).cast("long")
    df = df.withColumn("_rank", rank).withColumn("_t0", t0)
    # off-by-one fixup: Spark computes log2 as ln/ln, 1 ulp off at powers of 2
    p = lambda k: F.pow(F.lit(2.0), k.cast("double")).cast("long")  # noqa: E731
    t = (
        F.when(p(F.col("_t0") + 1) <= F.col(n_col) + 1, F.col("_t0") + 1)
        .when(p(F.col("_t0")) > F.col(n_col) + 1, F.col("_t0") - 1)
        .otherwise(F.col("_t0"))
    )
    df = df.withColumn("_t", t)
    df = df.withColumn("_m", F.col(n_col) - p(F.col("_t")) + 1)

    def c(k: Column) -> Column:  # C_k cumulative count; C_(-1) = 0
        mask = p(k + 1) - 1
        return mask + F.col("_m").bitwiseAND(mask)

    a = F.greatest(
        F.ceil(F.log2((F.col("_rank") + 2).cast("double"))).cast("long") - 3,
        F.lit(0).cast("long"),
    )
    df = df.withColumn("_a", a)
    k = F.when(F.col("_rank") < c(F.col("_a")), F.col("_a"))
    for i in range(1, 4):
        k = k.when(F.col("_rank") < c(F.col("_a") + i), F.col("_a") + i)
    k = k.otherwise(F.col("_a") + 4)
    df = df.withColumn("_k", k)
    c_prev = F.when(F.col("_k") == 0, F.lit(0).cast("long")).otherwise(
        c(F.col("_k") - 1)
    )
    below = F.col("_k") + F.bit_count(
        F.col("_m").bitwiseAND(p(F.col("_k")) - 1)
    ).cast("long")
    within = F.floor(
        (F.col("_rank") - c_prev).cast("double") / p(F.col("_k")).cast("double")
    ).cast("long")
    df = df.withColumn(out_col, below + within)
    return df.drop("_rank", "_t0", "_t", "_m", "_a", "_k")


#: Driver-enumerable boundary-binning limits for the JVM path in
#: bucketed_events: at most this many DISTINCT stream sizes (one
#: O(log n) boundary-array literal each keeps the plan small), and at
#: most this TOTAL replay cost (canonical_boundaries is an O(n log n)
#: merge-process replay per distinct size — the same work the pandas
#: UDF does per executor, done once on the driver instead).  Beyond
#: either bound the executor-memoized UDF remains the right tool.
JVM_BIN_MAX_DISTINCT_N = 512
JVM_BIN_MAX_TOTAL_REPLAY = 8_000_000


def _jvm_boundary_bucket(
    windowing, buffer_size: int, ns, idx_col: str = "idx", n_col: str = "n"
) -> Column:
    """Literal boundary-array binning in pure JVM expressions.

    For each enumerated stream size n the canonical upper boundaries
    [b1..bK=n] become an array literal; the bucket of an element is
    #{b : b <= idx} — exactly searchsorted(boundaries, idx, 'right')-1,
    the same binning the pandas UDF computes, with no Python worker and
    no Arrow transfer in the ingest pass.  A stream size that was not
    enumerated at plan time (a nondeterministic upstream changed the
    counts between the enumeration job and the main pass) raises
    loudly instead of binning garbage."""
    expr = None
    for nn in ns:
        bnds = canonical_boundaries(windowing, int(nn), buffer_size)
        arr = F.array(*[F.lit(int(b)).cast("long") for b in bnds[1:]])
        bucket = F.size(F.filter(arr, lambda b: b <= F.col(idx_col)))
        cond = F.col(n_col) == int(nn)
        expr = F.when(cond, bucket) if expr is None else expr.when(cond, bucket)
    return expr.otherwise(
        F.raise_error(
            F.concat(
                F.lit("stream size "),
                F.col(n_col).cast("string"),
                F.lit(" was not enumerated at plan time (nondeterministic input?)"),
            )
        )
    ).cast("long")


def _bucket_udf_general(windowing, buffer_size: int):
    """Vectorized searchsorted binning against canonical boundaries.

    The boundaries are a pure function of the stream's element count ``n``
    (not of the stream identity), so they are simulated INSIDE the executor
    from the ``n`` column, memoized per distinct n per python worker — no
    driver-collected per-stream dict, no O(#streams) closure state.  Streams
    sharing a count share one boundary array; the windowing policy itself is
    a few bytes in the serialized closure."""
    memo: dict = {}

    def bounds_for(nn: int) -> np.ndarray:
        b = memo.get(nn)
        if b is None:
            b = np.asarray(
                canonical_boundaries(windowing, int(nn), buffer_size),
                dtype=np.int64,
            )
            memo[nn] = b
        return b

    @pandas_udf("long")
    def bucket_of(idx: pd.Series, n: pd.Series) -> pd.Series:
        out = np.empty(len(idx), dtype=np.int64)
        iv = idx.to_numpy()
        nv = n.to_numpy()
        for nn in pd.unique(nv):
            mask = nv == nn
            # bucket in oldest->newest numbering
            out[mask] = np.searchsorted(bounds_for(int(nn)), iv[mask], side="right") - 1
        return pd.Series(out)

    return bucket_of


def bucketed_events(
    events: DataFrame,
    windowing,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
    buffer_size: int = 0,
    index_mode: str = "window",
) -> DataFrame:
    """Events annotated with per-stream insertion index ``idx``, stream
    size ``n`` and canonical decay ``bucket`` — the shared first stage of
    the summary build and any per-window sketch build."""
    ev = _with_index(
        events.select(
            F.col(stream_col).alias("stream_id"),
            F.col(ts_col).cast("long").alias("ts"),
            F.col(value_col).cast("double").alias("value"),
            *[F.col(c) for c in order_cols],
        ),
        "stream_id",
        "ts",
        order_cols,
        index_mode=index_mode,
    )

    if isinstance(windowing, ExpWindowing) and windowing.base == 2.0 and buffer_size <= 0:
        return with_exp2_bucket(ev, "idx", "n", "bucket")
    # JVM boundary binning for driver-enumerable size sets: one tiny
    # count-distinct job over the RAW events (map-side partial agg — the
    # window/index stage is not re-executed) enumerates the per-stream
    # sizes; each size's canonical boundaries become an O(log n) array
    # literal and the binning stays entirely JVM-side.  Falls back to
    # the executor-memoized pandas UDF when the size set is too large to
    # enumerate or the total replay cost exceeds the driver budget.
    # LIMIT N+1 bounds the driver transfer: a heterogeneous corpus with
    # millions of distinct sizes ships at most 513 rows before the
    # len() check routes it to the UDF (round-7 review finding — an
    # unbounded collect here would pay an O(#distinct-sizes) driver
    # stall exactly in the regime the UDF fallback exists for)
    ns = sorted(
        int(r["_n_"])
        for r in events.groupBy(F.col(stream_col))
        .agg(F.count(F.lit(1)).alias("_n_"))
        .select("_n_")
        .distinct()
        .limit(JVM_BIN_MAX_DISTINCT_N + 1)
        .collect()
    )
    if (
        ns
        and len(ns) <= JVM_BIN_MAX_DISTINCT_N
        and sum(ns) <= JVM_BIN_MAX_TOTAL_REPLAY
    ):
        return ev.withColumn(
            "bucket", _jvm_boundary_bucket(windowing, buffer_size, ns)
        )
    udf = _bucket_udf_general(windowing, buffer_size)
    return ev.withColumn("bucket", udf(F.col("idx"), F.col("n")))


def summarize_bucketed(ev: DataFrame) -> DataFrame:
    """groupBy monoid merge of bucketed events into ``SUMMARY_COLS``."""
    return (
        ev.groupBy("stream_id", "bucket")
        .agg(
            F.min("ts").alias("time_start"),
            F.max("ts").alias("time_end"),
            F.min("idx").alias("count_start"),
            F.max("idx").alias("count_end"),
            F.count(F.lit(1)).alias("count"),
            F.sum("value").alias("sum"),
            F.max("value").alias("max"),
            F.min("value").alias("min"),
        )
        .withColumn("window_id", F.col("count_start"))
        .select(*SUMMARY_COLS)
    )


def build_summary_windows(
    events: DataFrame,
    windowing,
    *,
    stream_col: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple = (),
    buffer_size: int = 0,
    index_mode: str = "window",
) -> DataFrame:
    """Build the canonical decayed ``summary_windows`` table for a batch.

    Input: raw events ``(stream_id, ts: long, value: double, [order cols])``.
    Output schema: ``SUMMARY_COLS`` — one row per canonical window, exactly
    the reference's SummaryWindow + DataTable (core/summary_window.go:13-19,
    core/data.go:9-21) with the promised-but-unbuilt ``min`` included.
    """
    return summarize_bucketed(
        bucketed_events(
            events,
            windowing,
            stream_col=stream_col,
            ts_col=ts_col,
            value_col=value_col,
            order_cols=order_cols,
            buffer_size=buffer_size,
            index_mode=index_mode,
        )
    )
