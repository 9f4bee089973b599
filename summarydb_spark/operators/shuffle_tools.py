"""Shuffle-shape tools for the 100 TB deployment: skew-salted joins and
bucketed (co-located) tables.

These are the two levers the rest of the engine's plan shapes assume exist
at cluster scale but that local parquet testdata never exercises:

- ``salted_join``: a hash join on a key with heavy hitters (the exact
  situation ``skew_key_profile`` diagnoses) sends every row of a hot key
  to one reducer.  Salting splits each hot key into ``n_salts`` synthetic
  sub-keys: the large side scatters uniformly (pmod of a per-row hash),
  the small side replicates each hot key ``n_salts`` times, and the join
  key becomes ``(key, salt)`` — same result set, reducer load capped at
  ~1/n_salts of the hot key.  AQE's skew-join handles *sort-merge* spills
  automatically; explicit salting is still the tool when the skew sits in
  a hash aggregate feeding the join or when AQE is unavailable
  (streaming-static joins).

- ``write_bucketed`` / co-located joins: two facts bucketed AND
  sort-ordered by the same key join with ZERO exchange — the parquet
  layout is the shuffle, paid once at write time and amortized over every
  subsequent join/aggregate on that key (the warehouse pattern for a
  100 TB fact joined daily).  ``tests/test_shuffle_tools.py`` pins the
  no-Exchange plan.

Both preserve exact result semantics (verified row-for-row against the
unsalted/unbucketed plans in tests).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    skewed_keys: Optional[Sequence] = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``large ⋈ small ON large.key = small.key``
    with hot keys split across ``n_salts`` reducers.

    ``skewed_keys``: the hot key values (e.g. the output of the
    ``skew_key_profile`` diagnostic).  Only those replicate on the small
    side — cold keys join under salt 0 with no replication, so the
    small-side blowup is ``len(skewed_keys) * n_salts`` rows, not
    ``|small| * n_salts``.  With ``skewed_keys=None`` every key is treated
    as hot (full replication — fine when the small side is dimension-
    sized).

    The large side never replicates and never collects: its salt is
    ``pmod(xxhash64(monotonic row seed), n_salts)`` for hot keys and 0
    otherwise — pure column math, uniform by construction.
    """
    if how not in ("inner", "left", "left_semi"):
        # right/outer would duplicate small-side rows that match no salt
        raise ValueError(f"salted_join supports inner/left/left_semi, got {how}")
    if skewed_keys is not None:
        hot = F.col(key).isin(list(skewed_keys))
    else:
        hot = F.lit(True)

    lg = large.withColumn(
        "_salt",
        F.when(
            hot,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in large.columns]),
                F.lit(n_salts),
            ).cast("int"),
        ).otherwise(F.lit(0)),
    )
    salts = F.when(
        hot, F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).otherwise(F.array(F.lit(0)))
    sm = small.withColumn("_salt", F.explode(salts))
    out = lg.join(sm, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-ordered) managed
    table: every later equi-join or aggregate on ``key`` between tables
    bucketed the same way runs with NO exchange (and with ``sort=True``,
    no per-task sort either — the sort-merge join zips the buckets).

    This is write-once shuffle: at 100 TB the nightly fact load pays one
    ``buckets``-way hash distribution; every downstream join on the key is
    then embarrassingly parallel bucket-to-bucket work.
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.  The plan contains
    no Exchange when both tables were written by :func:`write_bucketed`
    with the same bucket count."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


#: rank-internal persisted relations (see global_rank docstring); released
#: by release_rank_caches(), never eagerly (the counts and join passes both
#: read them lazily at action time)
_RANK_PERSISTED: list = []


def release_rank_caches() -> int:
    """Unpersist every global_rank-internal cached relation created so far
    and return how many were released.  Safe any time (unpersist is
    idempotent); later global_rank calls re-cache."""
    n = 0
    while _RANK_PERSISTED:
        df = _RANK_PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def global_rank(
    df: DataFrame, order_cols: Sequence[str], out_col: str = "rnk"
) -> DataFrame:
    """Exact global 1-based rank of every row under the TOTAL order
    ``order_cols`` — withOUT the single-partition WindowExec that
    ``row_number() OVER (ORDER BY ...)`` plans to (which moves the whole
    relation to one task: the classic 100 TB deadend).  The caller must
    ensure ``order_cols`` is a total order (include a unique tiebreak
    column); ties would make ranks partition-layout-dependent.

    Three bounded steps (the engine's own two-phase index,
    operators/summary.py:143-198, without the stream key):

    1. ``repartitionByRange(order_cols)`` + sort WITHIN partitions —
       Spark's sampled range partitioner splits the relation into
       globally ordered partitions, each sorted locally in parallel;
    2. partition-local 0-based index via mapInPandas (no shuffle, a
       counter across Arrow batches);
    3. per-partition row counts (one row per partition) -> cumulative
       offsets over that tiny relation -> broadcast join fixes the
       local indexes up to global ranks.

    The offsets window IS an unpartitioned window — over a relation
    bounded by the shuffle-partition count, never by the data.

    The locally-indexed relation is PERSISTED (memory-and-disk) before
    the counts pass: the counts pass and the join pass are otherwise two
    independent materializations of the same range shuffle, and nothing
    guarantees they agree on partitioning — the range partitioner's
    sample seed derives from the physical RDD lineage and AQE may
    coalesce the two shuffles differently, which desynchronizes ``_pid``
    between the passes (observed as a silently empty join leg).  The
    cache pins ONE set of partitions for both passes; call
    :func:`release_rank_caches` to drop the pinned relations (same
    contract as functions.dedup.release_guard_caches).

    ``order_cols`` entries may be column names or Column sort expressions
    (e.g. ``F.col("score").desc()``) — descending ranks need the latter."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.repartitionByRange(*order).sortWithinPartitions(*order)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema_out = StructType(
        list(d.schema.fields)
        + [StructField("_pid", IntegerType()), StructField("_li", LongType())]
    )

    def local_index(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        c = 0
        for pdf in it:
            n = len(pdf)
            pdf = pdf.assign(_pid=pid, _li=range(c, c + n))
            c += n
            yield pdf

    d = d.mapInPandas(local_index, schema_out)
    from pyspark import StorageLevel

    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    _RANK_PERSISTED.append(d)
    counts = d.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    from pyspark.sql import Window

    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    fixups = counts.select(
        F.col("_pid").alias("_fix_pid"),
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        d.join(F.broadcast(fixups), F.col("_pid") == F.col("_fix_pid"))
        .withColumn(out_col, (F.col("_li") + F.col("_off") + 1).cast("long"))
        .drop("_pid", "_li", "_fix_pid", "_off")
    )


def partitioned_prefix_sum(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[str],
    val_col: str,
    out_col: str = "prefix_sum",
) -> DataFrame:
    """EXCLUSIVE running sum of ``val_col`` within each ``part_col`` group
    under ``order_cols`` — the two-phase twin of
    ``sum(v) OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING)`` that does NOT put each group on a single task: a
    window cumsum over a one-language-dominant corpus routes the dominant
    shard's entire doc list through one task at 100 TB; here the range
    partitioner splits every group across partitions and only the
    per-(partition, group) TOTALS (a tiny relation) are globally combined.

    Same machinery and caveats as :func:`global_rank`: range shuffle +
    in-partition sort, mapInPandas local accumulation, broadcast offset
    fixup, and a pinned cache (released by :func:`release_rank_caches`)
    so both passes see one partitioning.  NULL values accumulate as 0,
    matching SQL ``sum``'s null-skipping.  Integer inputs only (the
    accumulator is exact int64); the emitted sum is NULL-free (0 for the
    first row of each group, like ``coalesce(prev_cum, 0)``)."""
    order = [F.col(part_col)] + [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    d = df.repartitionByRange(*order).sortWithinPartitions(*order)

    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema_out = StructType(
        list(d.schema.fields)
        + [StructField("_pid", IntegerType()), StructField("_lx", LongType())]
    )

    def local_sums(it):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        sums: dict = {}
        for pdf in it:
            lx = []
            for key, v in zip(pdf[part_col], pdf[val_col]):
                c = sums.get(key, 0)
                lx.append(c)
                if not pd.isna(v):
                    sums[key] = c + int(v)
            yield pdf.assign(_pid=pid, _lx=lx)

    d = d.mapInPandas(local_sums, schema_out)
    from pyspark import StorageLevel

    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    _RANK_PERSISTED.append(d)
    totals = d.groupBy("_pid", part_col).agg(F.sum(val_col).alias("_t"))
    from pyspark.sql import Window

    w_off = (
        Window.partitionBy(part_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fixups = totals.select(
        F.col("_pid").alias("_fix_pid"),
        F.col(part_col).alias("_fix_key"),
        F.coalesce(F.sum("_t").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        d.join(
            F.broadcast(fixups),
            (F.col("_pid") == F.col("_fix_pid"))
            & (F.col(part_col) == F.col("_fix_key")),
        )
        .withColumn(out_col, (F.col("_lx") + F.col("_off")).cast("long"))
        .drop("_pid", "_lx", "_fix_pid", "_fix_key", "_off")
    )
