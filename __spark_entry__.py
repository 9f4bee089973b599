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
    from summarydb_spark.plans.llm_sql import LLM_QUERIES
    from summarydb_spark.plans.portable_dedup import PORTABLE_DEDUP_QUERIES
    from summarydb_spark.plans.portable_sql import CORE_QUERIES
    from summarydb_spark.plans.relational_ext import RELATIONAL_EXT_QUERIES
    from summarydb_spark.plans.stats_ext import STATS_EXT_QUERIES

    return {
        **CORE_QUERIES,
        **LLM_QUERIES,
        **PORTABLE_DEDUP_QUERIES,
        **RELATIONAL_EXT_QUERIES,
        **STATS_EXT_QUERIES,
        **ADVANCED_QUERIES,
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
    from summarydb_spark.plans.sketch_queries import SKETCH_QUERIES

    return {**SKETCH_QUERIES, **DF_QUERIES}


# The correctness driver checks the FIRST 50 entries of queries().  Round 2
# verified positions 0-49 fully green (CORRECTNESS_r02.json) but left the 42
# later additions with zero oracle signal; rotate those into the checked
# window this round.  The previously-proven core set rides behind them —
# still pinned meanwhile by the pytest store-parity and golden fixtures.
_VERIFY_FIRST = (
    "media_frame_stats",  # the one r1 hash-FAIL; fix must be oracle-confirmed
    "embedding_near_dups",
    "dedup_cluster_cc",
    "audio_frame_features",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "media_metadata",
    "media_resize_16x16",
    "media_byte_histogram",
    "sketch_range_batched",
    "bloom_membership",
    "sketch_cms_heavy_hitters",
    "sketch_hll_distinct_bound",
    "sketch_kll_quantile_bound",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "session_window_builtin",
    "ingest_clamp_monotonic",
    "small_quantity_revenue_q17",
    "tpch_q3_like_topk",
    "tpch_q10_like_returns",
    "tpch_q13_like_custdist",
    "tpch_q14_like_promo",
    "tpch_q15_like_top_supplier",
    "tpch_q18_like_large_orders",
    "tpch_q19_like_disjunctive",
    "tpch_q21_like_late_suppliers",
    "tpch_q22_like_idle_customers",
    "min_cost_supplier_q2_like",
    "supplier_count_not_in_q16_like",
    "tfidf_top_terms",
    "token_position_stats",
    "token_vocab_top50",
    "dow_histogram_events",
    "fuzzy_part_names",
    "stratified_sample_orders",
    "grouping_sets_region_nation",
    "corr_quantity_price",
    "value_histogram_events",
    "percent_rank_balance_decile",
    "first_last_day_value",
    "calendar_rollup_orders",
    "string_functions_parts",
)


def _ordered(names: list[str]) -> list[str]:
    front = [n for n in _VERIFY_FIRST if n in names]
    rest = [n for n in names if n not in set(_VERIFY_FIRST)]
    return front + rest


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
