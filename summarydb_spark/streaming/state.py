"""State-store provider selection for stateful Structured Streaming.

The default HDFS-backed provider keeps every state row ON-HEAP in the
executor; at 100 TB the reference's recovery contract
(core/pipeline.go:294-335) maps to streaming state that exceeds executor
heap — stream-stream join state grows with watermark horizon x rate, and
a sessionizer holds one row per live key.  Spark ships an off-heap
RocksDB provider (bundled rocksdbjni, incremental checkpointing to the
same checkpoint location) whose capacity is bounded by local disk, not
heap — the standard production choice for large state.

This module is the one switch point: pass ``state_store="rocksdb"`` to
:func:`summarydb_spark.session.get_spark` (or set the
``SPARK_GRAFT_STATE_STORE`` env var) to run every stateful query on
RocksDB, or scope it to a single query start with
:func:`use_state_store`.  The provider class is recorded in the
checkpoint's offset metadata at the query's FIRST run, so a restart
keeps whatever provider the checkpoint was created with — exactly the
deployment contract the restart test pins.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_ALIASES = {
    "rocksdb": ROCKSDB_PROVIDER,
    # the built-in default; selecting it explicitly pins the provider
    # even if the session-level conf says otherwise
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


def provider_class(state_store: str | None) -> str | None:
    """Resolve a state-store selector to a provider class name.

    ``None``/empty -> None (leave the session conf untouched);
    ``"rocksdb"``/``"hdfs"`` -> the bundled providers; anything else is
    taken verbatim as a fully-qualified provider class."""
    if not state_store:
        return None
    return _ALIASES.get(state_store.lower(), state_store)


@contextmanager
def use_state_store(spark: SparkSession, state_store: str | None = None):
    """Scope a state-store provider to the streaming queries STARTED
    inside the block (the provider is read at query start; running
    queries are unaffected).  ``state_store=None`` falls back to the
    ``SPARK_GRAFT_STATE_STORE`` env var; if neither is set, this is a
    no-op and the session default applies."""
    cls = provider_class(
        state_store or os.environ.get("SPARK_GRAFT_STATE_STORE")
    )
    if cls is None:
        yield
        return
    try:
        old = spark.conf.get(PROVIDER_CONF)
    except Exception:
        old = None
    spark.conf.set(PROVIDER_CONF, cls)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, old)
