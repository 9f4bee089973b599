"""summarydb_spark — a PySpark-native time-decayed analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of Squadrick/summarydb (SummaryStore, SOSP'17) on Apache Spark:
time-decayed summary windows with error-bounded approximate range queries,
built as declarative DataFrame plans (Catalyst-optimizable, no RDDs, no
row-at-a-time UDFs in the hot path), plus the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
such an engine needs at 100 TB.
"""

from summarydb_spark.windowing import (  # noqa: F401
    CanonicalDecay,
    ExpWindowing,
    IdealWindowing,
    PowerWindowing,
    canonical_boundaries,
)


def __getattr__(name):  # lazy: avoid importing pyspark for pure-python users
    if name in ("SummaryDB", "Stream"):
        from summarydb_spark import engine

        return getattr(engine, name)
    if name in ("QueryParams", "AggResult"):
        from summarydb_spark.operators import estimator

        return getattr(estimator, name)
    raise AttributeError(name)

__version__ = "0.1.0"
