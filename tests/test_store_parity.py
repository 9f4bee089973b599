"""Three-way parity for the canonical summary windows: the persisted-store
SQL build (plans.portable_sql.summary_view_sql), the DataFrame builder
(operators.summary.build_summary_windows), and the streaming incremental
path (streaming.ingest.StreamingSummarizer) must all produce the same
windows over the same events — they are three implementations of one
storage model (reference: windows persisted by the pipeline,
core/writer.go:53-67, served via storage/query_index.go:48-74).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from summarydb_spark.operators.summary import build_summary_windows
from summarydb_spark.sources.tables import ensure_summary_views, register_tables
from summarydb_spark.windowing import ExpWindowing

SF_DIR = "/root/testdata/sf0.001"


def _events_df(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select(
            F.col("user_id").alias("stream_id"),
            # TIMESTAMP(MICROS) -> epoch-micro longs (UTC session tz)
            F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("ts"),
            F.col("value"),
            F.col("event_id"),
        )
    )


def _canon(df):
    cols = ["stream_id", "time_start", "time_end", "cnt", "sum_v", "max_v", "min_v"]
    return sorted(
        (
            (
                r["stream_id"],
                r["time_start"],
                r["time_end"],
                r["cnt"],
                round(float(r["sum_v"]), 4),
                r["max_v"],
                r["min_v"],
            )
            for r in df.select(*cols).collect()
        )
    )


def test_sql_store_matches_dataframe_builder(spark):
    register_tables(spark, SF_DIR)
    ensure_summary_views(spark, SF_DIR)
    store = spark.sql(
        "SELECT stream_id, time_start, time_end, cnt, sum_v, max_v, min_v "
        "FROM sw_exp2_full"
    )
    built = build_summary_windows(
        _events_df(spark), ExpWindowing(2.0), order_cols=("event_id",)
    ).select(
        "stream_id",
        "time_start",
        "time_end",
        F.col("count").alias("cnt"),
        F.col("sum").alias("sum_v"),
        F.col("max").alias("max_v"),
        F.col("min").alias("min_v"),
    )
    assert _canon(store) == _canon(built)


def test_streaming_incremental_matches_sql_store(spark, tmp_path):
    from summarydb_spark.streaming.ingest import StreamingSummarizer

    register_tables(spark, SF_DIR)
    ensure_summary_views(spark, SF_DIR)
    store = spark.sql(
        "SELECT stream_id, time_start, time_end, cnt, sum_v, max_v, min_v "
        "FROM sw_exp2_full"
    )

    ev = _events_df(spark)
    # replay the events through the streaming path in three micro-batches
    # split on event_id (arrival order), as the reference's ingester would
    summ = StreamingSummarizer(
        spark, ExpWindowing(2.0), str(tmp_path / "state"), order_cols=("event_id",)
    )
    n = ev.count()
    cuts = [0, n // 3, 2 * n // 3, n]
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    ranked = ev.withColumn(
        "rn",
        F.row_number().over(
            w.partitionBy(F.lit(1)).orderBy("stream_id", "event_id")
        ),
    )
    for i in range(3):
        batch = ranked.where(
            (F.col("rn") > cuts[i]) & (F.col("rn") <= cuts[i + 1])
        ).drop("rn")
        summ.process_batch(batch, i)

    got = summ.summary().select(
        "stream_id",
        "time_start",
        "time_end",
        F.col("count").alias("cnt"),
        F.col("sum").alias("sum_v"),
        F.col("max").alias("max_v"),
        F.col("min").alias("min_v"),
    )
    assert _canon(got) == _canon(store)
