"""Table loaders for the driver's parquet testdata.

The testdata files are single-row-group parquet, so a bare
``spark.read.parquet`` yields a ONE-task scan: every expensive per-row
pipeline (shingling, minhash, hyperplane signatures, sketch updates) would
serialize on one core no matter how many the cluster has.  ``load_table``
injects an explicit round-robin repartition right after the scan for
exactly those tables — the shuffle moves a few MB once, and everything
downstream runs wide.  On a real deployment the sources are many splittable
files and this exchange disappears; it is the IO-boundary fix for
single-file inputs.

Tables that feed floating-point *aggregation* queries (lineitem, orders,
events in the core approx queries) are deliberately NOT repartitioned by
default: keeping their natural scan order keeps float-sum results
bit-stable against the DuckDB oracle.  The repartition-safe set is the one
whose query outputs are order-independent (per-row values, integer ratios,
exact counts, bound booleans).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# tables whose downstream computations are per-row-heavy and whose query
# outputs are reorder-safe
WIDE_TABLES = frozenset({"documents", "embeddings"})


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    widen: bool | None = None,
) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet``; repartition to the session's
    default parallelism when ``widen`` (default: name in WIDE_TABLES)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if widen is None:
        widen = name in WIDE_TABLES
    if widen:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df
