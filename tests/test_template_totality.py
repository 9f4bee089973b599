"""Totality sweep: EVERY pure-SQL query template must execute (not
necessarily return rows) against degenerate 1-3-row tables.

The oracle gate proves value-correctness on generated data; this sweep
proves no template hides an input-dependent runtime error — ANSI
divide-by-zero on empty/constant groups, null propagation into CAST,
element_at past array bounds — the classes of failure tiny or skewed
real-world partitions would trigger.  DataFrame-built queries and the
summary-store views are exercised by their own tests (they read parquet
paths, not these views).

The synthetic rows deliberately stack edge conditions: a customer with
no orders, one single-line order, same-timestamp events, an empty and a
1-token document, duplicate texts, zero-valued metrics.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

import __spark_entry__ as entry

TS = datetime.datetime(2024, 1, 1)


def _register_degenerate(spark):
    dfs = {
        "region": [Row(r_regionkey=0, r_name="R0")],
        "nation": [Row(n_nationkey=0, n_name="N0", n_regionkey=0)],
        "customer": [
            Row(c_custkey=1, c_name="c1", c_nationkey=0, c_acctbal=0.0,
                c_mktsegment="SEG"),
            Row(c_custkey=2, c_name="c2", c_nationkey=0, c_acctbal=-1.5,
                c_mktsegment="SEG"),  # never orders
        ],
        "supplier": [
            Row(s_suppkey=1, s_name="s1", s_nationkey=0, s_acctbal=0.0)
        ],
        "part": [
            Row(p_partkey=1, p_name="part one", p_brand="B#1",
                p_type="TYPE", p_size=1, p_retailprice=0.0)
        ],
        "orders": [
            Row(o_orderkey=1, o_custkey=1, o_orderstatus="O",
                o_totalprice=0.0, o_orderdate=TS,
                o_orderpriority="1-URGENT"),
        ],
        "lineitem": [
            Row(l_orderkey=1, l_partkey=1, l_suppkey=1, l_linenumber=1,
                l_quantity=1.0, l_extendedprice=0.0, l_discount=0.0,
                l_tax=0.0, l_returnflag="N", l_linestatus="O",
                l_shipdate=TS),
        ],
        "events": [
            Row(event_id=0, ts=TS, user_id=1, event_type="view",
                value=0.0, props="{}"),
            Row(event_id=1, ts=TS, user_id=1, event_type="view",
                value=0.0, props="{}"),  # duplicate timestamp, zero value
            Row(event_id=2, ts=TS + datetime.timedelta(days=1), user_id=1,
                event_type="purchase", value=1.0, props="{}"),
        ],
        "documents": [
            Row(doc_id=0, text="", lang="en", source="s", n_chars=0),
            Row(doc_id=1, text="solo", lang="en", source="s", n_chars=4),
            Row(doc_id=2, text="a b c a b c", lang="xx", source="t",
                n_chars=11),
            Row(doc_id=3, text="a b c a b c", lang="xx", source="t",
                n_chars=11),  # exact duplicate
        ],
        "embeddings": [
            Row(vec_id=0, embedding=[0.0, 0.0, 0.0, 0.0], label=0),
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0], label=1),
            Row(vec_id=57, embedding=[0.0, 1.0, 0.0, 0.0], label=1),
        ],
    }
    for name, rows in dfs.items():
        spark.createDataFrame(rows).createOrReplaceTempView(name)


def _template_names():
    return sorted(entry._all_queries())


@pytest.fixture(scope="module")
def degenerate(spark):
    _register_degenerate(spark)
    yield spark
    # drop register_tables' memo: the degenerate views shadow the real
    # table names, and a memo hit in a later test file would silently
    # serve these stubs
    from summarydb_spark.sources.tables import _REGISTERED_ATTR

    if hasattr(spark, _REGISTERED_ATTR):
        delattr(spark, _REGISTERED_ATTR)


def test_every_sql_template_is_total(degenerate):
    spark = degenerate
    qs = entry._all_queries()
    skip = entry.SUMMARY_VIEW_QUERIES  # read the parquet store, not views
    failures = []
    for name in sorted(qs):
        if name in skip:
            continue
        try:
            spark.sql(qs[name]("spark")).collect()
        except Exception as exc:  # noqa: BLE001 - collecting the full list
            failures.append((name, str(exc).splitlines()[0][:160]))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)


def test_dataframe_builders_on_tiny_parquet(degenerate, tmp_path_factory):
    """DataFrame-built queries (ANN, sketches, media, SQL-surface, ...)
    read parquet from sf_dir; they must come up on a 1-3-row dataset —
    either producing a result or failing with an intentional, actionable
    error (ValueError with sizing guidance), never an engine crash."""
    spark = degenerate
    root = tmp_path_factory.mktemp("tinysf")
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        spark.table(name).coalesce(1).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    failures = []
    for name, (builder, _oracle) in sorted(entry._df_queries().items()):
        try:
            builder(spark, str(root)).collect()
        except ValueError:
            pass  # intentional, documented sizing/shape refusal
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"{type(exc).__name__}: "
                             f"{str(exc).splitlines()[0][:140]}"))
    assert not failures, "\n".join(f"{n}: {m}" for n, m in failures)
