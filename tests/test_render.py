"""Render smoke tests: every registered query template must produce
non-empty SQL for both dialects, and every queries() entry must have a
matching column-name contract with its oracle (the driver compares sorted
column names before hashing values)."""

import re

from summarydb_spark.plans.advanced_sql import ADVANCED_QUERIES
from summarydb_spark.plans.llm_sql import LLM_QUERIES
from summarydb_spark.plans.portable_dedup import PORTABLE_DEDUP_QUERIES
from summarydb_spark.plans.portable_sql import CORE_QUERIES, DIALECTS
from summarydb_spark.plans.relational_ext import RELATIONAL_EXT_QUERIES
from summarydb_spark.plans.stats_ext import STATS_EXT_QUERIES

ALL_SQL_QUERIES = {
    **CORE_QUERIES,
    **LLM_QUERIES,
    **PORTABLE_DEDUP_QUERIES,
    **RELATIONAL_EXT_QUERIES,
    **STATS_EXT_QUERIES,
    **ADVANCED_QUERIES,
}


def test_all_templates_render_both_dialects():
    for name, fn in ALL_SQL_QUERIES.items():
        for d in DIALECTS:
            sql = fn(d)
            assert isinstance(sql, str) and len(sql) > 20, (name, d)
            assert "SELECT" in sql.upper(), (name, d)


def test_entry_registry_is_consistent():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    # every SQL-templated query has an oracle (DF-built queries may not)
    for name in ALL_SQL_QUERIES:
        assert name in osql, name
    # oracle strings must be DuckDB renderings, not Spark ones: no Spark-only
    # constructs (cheap tripwires for accidentally swapped dialects)
    for name, sql in osql.items():
        assert "LATERAL VIEW" not in sql, name
        assert not re.search(r"\bget_json_object\b", sql), name
        assert not re.search(r"\bunix_micros\b", sql), name
