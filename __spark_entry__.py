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
    # Queries compare against DuckDB on naive-UTC timestamps; pin the
    # session timezone so NTZ->LTZ casts are identity.  A non-UTC session
    # would silently shift every unix_micros(CAST ... TIMESTAMP_LTZ) by the
    # host offset — fail fast instead.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def _register(spark: SparkSession, sf_dir: str) -> None:
    from summarydb_spark.sources.tables import register_tables

    _configure(spark)
    register_tables(spark, sf_dir)


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
        # TIMESTAMP(MICROS) -> epoch-micro longs (UTC session tz)
        F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("ts"),
        F.col("value"),
        F.col("event_id"),
    )
    return build_summary_windows(
        ev, ExpWindowing(2.0), order_cols=("event_id",)
    )


# Queries reading the materialized summary store (see
# sources.tables.ensure_summary_views): the canonical window tables are
# built+cached once per (session, sf_dir), as in the reference where windows
# are persisted state scanned by queries (storage/query_index.go:48-74).
SUMMARY_VIEW_QUERIES = frozenset(
    {
        "decay_summary_exp2",
        "decay_compaction_exp2",
        "approx_count_range",
        "approx_sum_range",
        "approx_max_range",
        "approx_min_range",
        "approx_sum_range_landmark",
        "approx_count_range_landmark",
        "approx_max_range_landmark",
        "approx_min_range_landmark",
    }
)


def _sql_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        if name in SUMMARY_VIEW_QUERIES:
            from summarydb_spark.sources.tables import ensure_summary_views

            ensure_summary_views(spark, sf_dir)
        return spark.sql(_all_queries()[name]("spark"))

    return run


def _all_queries() -> dict:
    from summarydb_spark.plans.advanced_sql import ADVANCED_QUERIES
    from summarydb_spark.plans.analytics_ext import ANALYTICS_EXT_QUERIES
    from summarydb_spark.plans.coverage_ext import COVERAGE_EXT_QUERIES
    from summarydb_spark.plans.dq_sql import DQ_QUERIES
    from summarydb_spark.plans.llm_sql import LLM_QUERIES
    from summarydb_spark.plans.mining_ext import MINING_EXT_QUERIES
    from summarydb_spark.plans.monitoring_ext import MONITORING_EXT_QUERIES
    from summarydb_spark.plans.pipeline_ext import PIPELINE_EXT_QUERIES
    from summarydb_spark.plans.portable_dedup import PORTABLE_DEDUP_QUERIES
    from summarydb_spark.plans.portable_sql import CORE_QUERIES
    from summarydb_spark.plans.relational_ext import RELATIONAL_EXT_QUERIES
    from summarydb_spark.plans.retrieval_ext import RETRIEVAL_EXT_QUERIES
    from summarydb_spark.plans.stats_ext import STATS_EXT_QUERIES
    from summarydb_spark.plans.textsim_ext import TEXTSIM_EXT_QUERIES
    from summarydb_spark.plans.warehouse_ext import WAREHOUSE_EXT_QUERIES

    return {
        **CORE_QUERIES,
        **LLM_QUERIES,
        **PORTABLE_DEDUP_QUERIES,
        **RELATIONAL_EXT_QUERIES,
        **STATS_EXT_QUERIES,
        **ADVANCED_QUERIES,
        **COVERAGE_EXT_QUERIES,
        **ANALYTICS_EXT_QUERIES,
        **PIPELINE_EXT_QUERIES,
        **DQ_QUERIES,
        **RETRIEVAL_EXT_QUERIES,
        **MONITORING_EXT_QUERIES,
        **WAREHOUSE_EXT_QUERIES,
        **TEXTSIM_EXT_QUERIES,
        **MINING_EXT_QUERIES,
    }


def _df_query(builder) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _configure(spark)
        return builder(spark, sf_dir)

    return run


def _df_queries() -> dict:
    """DataFrame-built queries: (builder, oracle_sql | None).  None marks
    genuinely non-SQL-expressible ops (LSH band collisions) — the driver
    records the weaker rows-only check for those."""
    from summarydb_spark.plans.dataframe_queries import DF_QUERIES
    from summarydb_spark.plans.pipeline_ext import PIPELINE_DF_QUERIES
    from summarydb_spark.plans.sketch_queries import SKETCH_QUERIES
    from summarydb_spark.plans.linalg_ext import LINALG_DF_QUERIES
    from summarydb_spark.plans.textsim_ext import TEXTSIM_DF_QUERIES

    return {
        **SKETCH_QUERIES,
        **DF_QUERIES,
        **PIPELINE_DF_QUERIES,
        **TEXTSIM_DF_QUERIES,
        **LINALG_DF_QUERIES,
    }


# The correctness driver checks only the FIRST 50 entries of queries(),
# so ordering IS the verification schedule.  Order queries least-recently-
# verified-first, derived from the CORRECTNESS_r*.json history the driver
# leaves in the repo: a query that has never produced a green row (new
# this round, or failed last time) sorts to the front; among equally
# stale queries the registration order is kept.  Every round therefore
# verifies the stalest 50 automatically — no hand-rotated list to forget.


def _last_green_round() -> dict[str, int]:
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    out: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                not row.get("err")
                and row.get("rows_match") is True
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False  # None = rows-only
            )
            if green:
                out[name] = max(out.get(name, -1), rnd)
    return out


def _ordered(names: list[str]) -> list[str]:
    last = _last_green_round()
    pos = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (last.get(n, -1), pos[n]))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: _sql_query(name) for name in _all_queries()}
    for name, (builder, _oracle) in _df_queries().items():
        out[name] = _df_query(builder)
    return {name: out[name] for name in _ordered(list(out))}


def oracle_sql() -> dict[str, str]:
    out = {name: fn("duckdb") for name, fn in _all_queries().items()}
    for name, (_builder, oracle) in _df_queries().items():
        if oracle is not None:
            out[name] = oracle
    return {name: out[name] for name in _ordered(list(out))}
