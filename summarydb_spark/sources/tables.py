"""Table loaders for the driver's parquet testdata.

The testdata files are single-row-group parquet, so a bare
``spark.read.parquet`` yields a ONE-task scan: every expensive per-row
pipeline (shingling, minhash, hyperplane signatures, sketch updates) would
serialize on one core no matter how many the cluster has.  ``load_table``
serves those tables from a pre-split engine-side copy (``_widened``:
32-file parquet in the store, built once per source fingerprint) — the
ingest-into-engine-layout step every warehouse has.  Everything downstream
runs wide with NO per-query repartition exchange.  On a real deployment
the sources are many splittable files and the split store, like the
exchange it replaced, disappears.

Reordering is safe for every registered query because float sums all go
through exact DECIMAL(38,10) accumulation (portable_sql.dsum) — decimal
addition is associative and commutative, so results are bit-stable against
the DuckDB oracle under any partitioning.  Only the genuinely tiny dims
(region, nation, supplier) skip the exchange: they broadcast anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables where the post-scan exchange pays for itself: lineitem feeds
# decimal-heavy partial aggregation (the one-task scan would serialize it),
# documents/embeddings feed per-row-heavy signature/vector pipelines.
# Everything else is small enough that the repartition costs more than the
# single-task stage it parallelizes (measured at sf0.1: events-widening
# DOUBLED the window-function queries — their first op shuffles on
# stream_id anyway, so the extra exchange is pure overhead).
WIDE_TABLES = frozenset({"documents", "embeddings", "lineitem"})


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    widen: bool | None = None,
) -> DataFrame:
    """Read ``{sf_dir}/{name}.parquet``; serve the pre-split engine-side
    copy when ``widen`` (default: name in WIDE_TABLES)."""
    if widen is None:
        widen = name in WIDE_TABLES
    if widen:
        return _widened(spark, sf_dir, name)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _widened(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Pre-split copy of a wide table in the engine's store, built once per
    source fingerprint (ingest-into-engine-layout, the load step every
    warehouse has).  An in-plan ``repartition`` after the one-task scan
    costs a full shuffle of the table on EVERY query; scanning a 32-file
    copy gets the same downstream parallelism for free (measured at sf0.1:
    widened lineitem scan 1.07 s -> 0.51 s per query).  On a real
    deployment sources arrive as many splittable files and this store —
    like the exchange it replaces — disappears."""
    path = _store_path(sf_dir, f"split_{name}")
    _recover_store(path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        src = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _atomic_store_write(
            src.repartition(spark.sparkContext.defaultParallelism), path
        )
    return spark.read.parquet(path)


# Memo key lives ON the session object (not an id(spark)-keyed dict): ids
# are reused after garbage collection, which would silently skip
# registration for a brand-new session and fail with TABLE_OR_VIEW_NOT_FOUND.
_REGISTERED_ATTR = "_summarydb_registered_sf_dir"

ALL_TABLES = (
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


def _source_fingerprint(sf_dir: str) -> str:
    """Digest of (path, size, mtime_ns) over every source table.

    mtime_ns (not whole seconds): the harness regenerates parquet between
    rounds, and a same-second same-size regeneration must still change the
    fingerprint.  Stats of 10 files are ~free next to any Spark job."""
    import hashlib

    parts = [os.path.abspath(sf_dir)]
    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{t}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{t}|absent")
    return hashlib.md5("\n".join(parts).encode()).hexdigest()[:12]


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view, once per (session,
    source-fingerprint).

    View registration costs a file listing + parquet footer read per table
    (~0.5-1 s for the full set); doing it on every query call would dominate
    short queries.  The memo key includes the source fingerprint so an
    in-session data refresh (same sf_dir, new bytes) re-registers instead of
    serving stale views."""
    memo = (sf_dir, _source_fingerprint(sf_dir))
    if getattr(spark, _REGISTERED_ATTR, None) == memo:
        return
    for t in ALL_TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    setattr(spark, _REGISTERED_ATTR, memo)


_SUMMARY_VIEWS_ATTR = "_summarydb_summary_views"

# Persisted summary-window store, one subdir per source sf_dir.  Parquet on
# disk (not .persist() + temp view): Spark's cache-manager substitution does
# not reach inside WITH CTEs (a CTERelationDef subtree is never replaced by
# the InMemoryRelation), and every summary-consuming query binds the store
# behind a CTE — a cached view would silently rebuild from raw events on
# each of those queries.  A parquet store has no such quirk, gives the
# scan filter pushdown + column pruning, and is the reference's actual
# durability model (windows are persisted state, not session cache).
_STORE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".summary_store",
)


def _store_path(sf_dir: str, view: str) -> str:
    # Key the store by source-data fingerprint (path + per-table
    # size/mtime_ns), not path alone: the test harness regenerates the
    # parquet between rounds, and a path-only key would silently serve
    # summaries of the previous dataset.
    root = os.environ.get("SUMMARYDB_STORE_DIR", _STORE_ROOT)
    fp_dir = os.path.join(root, _source_fingerprint(sf_dir))
    _claim_fingerprint(root, fp_dir, sf_dir)
    return os.path.join(fp_dir, view)


def _claim_fingerprint(root: str, fp_dir: str, sf_dir: str) -> None:
    """Record which source dir owns a fingerprint and retire that source's
    superseded fingerprints.

    A testdata regeneration changes the fingerprint, and without pruning
    every regeneration strands the previous fingerprint's complete store
    tree (split table copies, summary/sketch/ANN stores) forever.  On the
    first sighting of a new fingerprint, write a ``_source.txt`` marker
    and delete sibling fingerprint dirs whose marker names the SAME source
    dir — other scale factors keep theirs.  Runs once per fingerprint (the
    marker gates it); single-writer by contract, like the stores."""
    marker = os.path.join(fp_dir, "_source.txt")
    if os.path.exists(marker):
        return
    import shutil

    src = os.path.abspath(sf_dir)
    os.makedirs(fp_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write(src)
    for sib in os.listdir(root):
        sib_dir = os.path.join(root, sib)
        if sib_dir == fp_dir or not os.path.isdir(sib_dir):
            continue
        try:
            with open(os.path.join(sib_dir, "_source.txt")) as f:
                owner = f.read()
        except OSError:
            continue  # unmarked/foreign dir: not attributable, keep it
        if owner == src:
            shutil.rmtree(sib_dir, ignore_errors=True)


def ensure_summary_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the canonical summary-window tables to the parquet store
    (once per sf_dir; reused across sessions) and expose them as temp views.

    This is the engine's storage model, mirroring the reference: summary
    windows are persisted state written by the pipeline and scanned by
    queries through the time index (storage/query_index.go:48-74) — range
    queries never re-derive windows from raw events.  The ten
    summary-consuming queries read these views; their DuckDB oracles keep
    the full inline recompute, so values are still verified end-to-end.
    The build is one pass over events per sf_dir; afterwards every query
    scans only O(streams x log n) stored rows."""
    from summarydb_spark.plans.portable_sql import (
        SW_FULL_VIEW,
        SW_LMK_VIEW,
        SW_LMKROWS_VIEW,
        SW_META_VIEW,
        summary_view_sql,
    )

    memo = (sf_dir, _source_fingerprint(sf_dir))
    state: dict = getattr(spark, _SUMMARY_VIEWS_ATTR, None) or {}
    if state.get("memo") == memo:
        return
    register_tables(spark, sf_dir)
    for view, kind in (
        (SW_FULL_VIEW, "full"),
        (SW_LMK_VIEW, "lmk"),
        (SW_META_VIEW, "meta"),
        (SW_LMKROWS_VIEW, "lmk_rows"),
    ):
        path = _store_path(sf_dir, view)
        _recover_store(path)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            # coalesce(1): the store is O(streams x log n) rows — a handful
            # of MB even at sf100; at real scale drop the coalesce and
            # partition by time_start range instead (see SCALING.md)
            _atomic_store_write(spark.sql(summary_view_sql(kind)).coalesce(1), path)
        spark.read.parquet(path).createOrReplaceTempView(view)
    setattr(spark, _SUMMARY_VIEWS_ATTR, {"memo": memo})


def _recover_store(path: str) -> None:
    """Heal a store directory after a crashed swap and clear debris.

    A writer that died between the two renames of ``_atomic_store_write``
    leaves the complete previous store at the newest ``.old-*`` sibling
    with nothing at ``path`` — rename it back.  All other ``.old-*`` /
    ``.tmp-*`` siblings are leftovers of crashed attempts and are deleted.
    Single-writer by contract (like the engine)."""
    import glob
    import shutil

    olds = sorted(glob.glob(path + ".old-*"), key=os.path.getmtime)
    if olds and not os.path.exists(path):
        os.rename(olds.pop(), path)
    for d in olds + glob.glob(path + ".tmp-*"):
        shutil.rmtree(d, ignore_errors=True)


def _atomic_store_write(
    df: DataFrame, path: str, extra_files: dict[str, bytes] | None = None
) -> None:
    """Write a store directory atomically: materialize to a temp sibling,
    then swap via renames.

    A plain ``mode("overwrite")`` deletes the old store before writing the
    new one — a crash mid-write destroys prior data while leaving no
    ``_SUCCESS``.  Here no committed data is ever lost: a crash before the
    first rename leaves the old store in place; a crash between the two
    renames leaves it at the ``.old-*`` sibling, which ``_recover_store``
    (run before every write, and from ``ensure_*`` readers) renames back.
    Matches the reference's transactional commit guarantee
    (storage/badger_backend.go:210-263).

    ``extra_files`` are sidecar blobs (e.g. a serialized ANN model) written
    into the temp directory BEFORE the swap, so data + model commit as one
    atomic unit.  Names must start with ``_`` so Spark's parquet reader
    ignores them as metadata."""
    import shutil
    import uuid

    _recover_store(path)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(tmp)
    for name, blob in (extra_files or {}).items():
        if not name.startswith("_"):
            raise ValueError(f"sidecar {name!r} must start with '_'")
        with open(os.path.join(tmp, name), "wb") as f:
            f.write(blob)
    old = f"{path}.old-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)  # roll back
        raise
    shutil.rmtree(old, ignore_errors=True)


SKETCH_STORE_OPS = frozenset({"bloom", "cms", "hll", "kll"})


def ensure_sketch_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-(stream, month) sketch-window store over ``events``,
    built once per source fingerprint and reused across calls and sessions
    — the sketch analogue of ensure_summary_views.  Sketches are monoid
    state (bloom OR, CMS +, HLL/KLL merge), so the stored rows answer any
    later range query by merging covering windows; queries never rebuild
    from raw events (the reference's stored-sketch model,
    storage/backend.go WindowState)."""
    from pyspark.sql import functions as F

    from summarydb_spark.operators.sketch_windows import build_sketch_windows

    path = _store_path(sf_dir, "sketch_windows_events")
    _recover_store(path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events", widen=True).select(
            F.col("user_id").alias("stream_id"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("ts"),
            "value",
            F.expr(
                "unix_micros(CAST(date_trunc('month', ts) AS TIMESTAMP_LTZ))"
            ).alias("bucket"),
        ).withColumn("idx", F.col("bucket"))
        _atomic_store_write(
            build_sketch_windows(ev, set(SKETCH_STORE_OPS)).coalesce(1), path
        )
    return spark.read.parquet(path)


def ensure_store(spark, sf_dir: str, name: str, build, coalesce: int = 1) -> str:
    """Generic fingerprint-keyed persisted parquet store: build once per
    source dataset, reuse across calls and sessions (the pattern behind
    ensure_summary_views / ensure_sketch_store, factored out for index-like
    artifacts such as the ANN encoded corpora).

    ``build(spark) -> (DataFrame, extra_files | None)`` runs only when the
    store for the CURRENT source fingerprint is absent; ``extra_files``
    sidecars (serialized models) commit atomically with the data.  Returns
    the store path — read it with ``spark.read.parquet`` and open sidecars
    with :func:`store_sidecar`."""
    path = _store_path(sf_dir, name)
    _recover_store(path)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df, extra = build(spark)
        if coalesce:
            df = df.coalesce(coalesce)
        _atomic_store_write(df, path, extra_files=extra)
    return path


def store_sidecar(path: str, name: str) -> bytes:
    """Read a sidecar blob written by :func:`ensure_store`."""
    with open(os.path.join(path, name), "rb") as f:
        return f.read()
