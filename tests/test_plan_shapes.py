"""Register-wide plan-shape audit (round-9 VERDICT item 1): no query may
plan an UNPARTITIONED Window over a fact-sized relation — a
``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the whole
input to ONE task (WindowExec requires a single partition when the
partition spec is empty), which is the classic 100 TB deadend.

An unpartitioned window IS legitimate over provably small relations: the
rule applied here is that every path from the window operator down to a
storage leaf (parquet relation / cached table) must pass through at least
one cardinality-bounding node — Aggregate, (Global|Local)Limit, or
Deduplicate.  Windows over per-partition count relations (bounded by the
shuffle-partition count), daily rollups, top-k results, etc. all satisfy
this; a window straight over events/lineitem/documents rows does not.

The audit walks the OPTIMIZED logical plan of every registered query at
sf0.001 (cheap: plans are built lazily; only iterative builders execute
jobs).  Streaming gates are excluded — building them runs real streaming
queries and their stateful operators don't use Window at all.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: logical nodes that bound the cardinality of everything above them
_REDUCERS = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}

#: storage leaves that are fact-sized until proven otherwise
_STORAGE_LEAVES = {
    "LogicalRelation",
    "DataSourceV2Relation",
    "HiveTableRelation",
    "InMemoryRelation",
    "CatalogRelation",
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _iter_nodes(plan):
    stack = [plan]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _reaches_storage_unreduced(node) -> bool:
    """True if some path from ``node`` down to a storage leaf contains no
    cardinality-bounding node."""
    stack = _children(node)
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls in _REDUCERS:
            continue  # everything below is bounded
        if cls in _STORAGE_LEAVES:
            return True
        stack.extend(_children(n))
    return False


def unpartitioned_fact_windows(df) -> list[str]:
    """The offending Window nodes of a DataFrame's optimized plan."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = []
    for n in _iter_nodes(plan):
        if n.getClass().getSimpleName() != "Window":
            continue
        if not n.partitionSpec().isEmpty():
            continue
        if _reaches_storage_unreduced(n):
            bad.append(n.toString().splitlines()[0])
    return bad


def test_helper_flags_global_window_over_fact(spark):
    """The detector itself: a global row_number over raw events rows must
    be flagged; the same window after an aggregate must not."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    w = Window.orderBy("event_id")
    flagged = unpartitioned_fact_windows(
        ev.withColumn("rn", F.row_number().over(w))
    )
    assert flagged, "global window over raw fact rows must be detected"

    daily = ev.groupBy((F.col("event_id") % 7).alias("d")).count()
    ok = unpartitioned_fact_windows(
        daily.withColumn("rn", F.row_number().over(Window.orderBy("d")))
    )
    assert ok == [], ok


def test_register_has_no_unpartitioned_fact_windows(spark):
    """Sweep the whole register: every query's optimized plan is free of
    single-partition Window nodes whose input is unreduced storage."""
    import __spark_entry__ as entry

    offenders = {}
    for name, builder in entry.queries().items():
        if name.startswith("streaming_"):
            continue  # stateful streaming: building runs real queries
        try:
            df = builder(spark, SF_DIR)
        except Exception as exc:  # builder must not fail outright
            pytest.fail(f"{name}: builder raised {exc!r}")
        bad = unpartitioned_fact_windows(df)
        if bad:
            offenders[name] = bad
    assert offenders == {}, offenders
