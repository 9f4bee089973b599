import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from summarydb_spark.session import get_spark

    s = get_spark("summarydb-tests")
    yield s


@pytest.fixture()
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(autouse=True, scope="module")
def _fresh_table_registration():
    """Invalidate the register_tables memo at module boundaries.

    Several test modules plant temp views over registered table names
    (``documents``, ``events``, ``lineitem``, ...) to drive builders on
    synthetic corpora.  register_tables memoizes per (session, sf_dir,
    fingerprint), so a planted view left behind by one module silently
    poisons every later module's Spark-vs-DuckDB parity check — Spark
    reads the 3-row planted corpus while DuckDB reads the real parquet.
    The failure is ordering-dependent (observed: test_banded_pairs before
    test_llm_ops fails 8 parity tests that each pass in isolation).
    Clearing the memo here makes the next register_tables call in the
    following module re-register the real views."""
    yield
    from pyspark.sql import SparkSession

    s = getattr(SparkSession, "_instantiatedSession", None)
    if s is not None:
        from summarydb_spark.sources.tables import _REGISTERED_ATTR

        setattr(s, _REGISTERED_ATTR, None)
