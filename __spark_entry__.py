"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship decayed-summary build through the
engine's DataFrame path; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 (plus the beyond-reference set)
as Spark-vs-DuckDB comparable pairs.  Query definitions live in
``summarydb_spark.plans.portable_sql`` — one template, two dialects.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _configure(spark: SparkSession) -> None:
    # testdata parquet uses TIMESTAMP(NANOS); read as LONG nanos
    # (normalized to epoch micros inside the queries).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


def _register(spark: SparkSession, sf_dir: str) -> None:
    _configure(spark)
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: canonical time-decayed summary windows over the events
    stream (exp base 2), built through the engine's DataFrame path."""
    from pyspark.sql import functions as F

    from summarydb_spark.operators.summary import build_summary_windows
    from summarydb_spark.windowing import ExpWindowing

    _configure(spark)
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = events.select(
        F.col("user_id").alias("stream_id"),
        F.expr("ts div 1000").alias("ts"),  # LONG nanos -> epoch micros
        F.col("value"),
        F.col("event_id"),
    )
    return build_summary_windows(
        ev, ExpWindowing(2.0), order_cols=("event_id",)
    )


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(_all_queries()[name]("spark"))

    return run


def _all_queries() -> dict:
    from summarydb_spark.plans.llm_sql import LLM_QUERIES
    from summarydb_spark.plans.portable_sql import CORE_QUERIES

    return {**CORE_QUERIES, **LLM_QUERIES}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _sql_query(name) for name in _all_queries()}


def oracle_sql() -> dict[str, str]:
    return {name: fn("duckdb") for name, fn in _all_queries().items()}
