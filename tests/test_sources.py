"""Source-format agnosticism: the engine ingests from ANY Spark source.

The reference's only ingress is its own Append() API (core/stream.go:104);
here ``Stream.append`` takes a DataFrame, so parquet, JSON-lines, and CSV
sources (and by extension Kafka/file streams) all feed the same pipeline.
These tests pin that the SAME data arriving via different formats yields
BYTE-IDENTICAL summary state and query answers."""

import pytest

from summarydb_spark.engine import SummaryDB
from summarydb_spark.windowing import ExpWindowing

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def event_slice(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(SRC)
        .where("user_id = 1")
        .select(
            F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))").alias("ts"),
            "value",
        )
        .orderBy("ts")
        .limit(500)
        .cache()
    )


def _ingest(spark, path, df):
    db = SummaryDB(spark, path)
    s = db.new_stream(ops=["count", "sum", "max", "min"], windowing=ExpWindowing(2.0))
    s.append(df.orderBy("ts"))
    db.flush()
    return db


def test_json_csv_parquet_sources_identical(spark, tmp_path, event_slice):
    from pyspark.sql import functions as F

    jdir = str(tmp_path / "events_jsonl")
    cdir = str(tmp_path / "events_csv")
    event_slice.write.mode("overwrite").json(jdir)
    event_slice.write.mode("overwrite").option("header", True).csv(cdir)

    from_parquet = _ingest(spark, str(tmp_path / "db_parquet"), event_slice)
    from_json = _ingest(
        spark,
        str(tmp_path / "db_json"),
        spark.read.schema("ts long, value double").json(jdir),
    )
    from_csv = _ingest(
        spark,
        str(tmp_path / "db_csv"),
        spark.read.option("header", True)
        .schema("ts long, value double")
        .csv(cdir),
    )

    def canon(db):
        rows = (
            spark.read.parquet(db._summary_path)
            .select("stream_id", "time_start", "time_end", "count", "sum", "max", "min")
            .collect()
        )
        return sorted(tuple(r) for r in rows)

    base = canon(from_parquet)
    assert len(base) > 3
    assert canon(from_json) == base
    assert canon(from_csv) == base

    t0, t1 = base[0][1], base[-1][2]
    for op in ("count", "sum", "max", "min"):
        want = from_parquet.get_stream(0).query(op, t0, t1)
        for db in (from_json, from_csv):
            got = db.get_stream(0).query(op, t0, t1)
            assert got.value == want.value, op
            assert got.error == want.error, op


def test_orc_source_identical(spark, tmp_path, event_slice):
    """ORC (the other columnar format Spark ships a native reader for)
    feeds the same pipeline byte-identically — same contract as the
    JSON/CSV test above."""
    odir = str(tmp_path / "events_orc")
    event_slice.write.mode("overwrite").orc(odir)

    from_parquet = _ingest(spark, str(tmp_path / "db_parquet2"), event_slice)
    from_orc = _ingest(spark, str(tmp_path / "db_orc"), spark.read.orc(odir))

    def canon(db):
        rows = (
            spark.read.parquet(db._summary_path)
            .select(
                "stream_id", "time_start", "time_end", "count", "sum", "max", "min"
            )
            .collect()
        )
        return sorted(tuple(r) for r in rows)

    assert canon(from_orc) == canon(from_parquet)


def test_stale_fingerprint_stores_are_pruned(tmp_path, monkeypatch):
    """A source regeneration changes the store fingerprint; the superseded
    fingerprint's whole tree must be retired (it stranded multi-GB split
    copies forever), while other sources' fingerprints stay intact."""
    import os

    from summarydb_spark.sources import tables as T

    root = str(tmp_path / "store")
    monkeypatch.setenv("SUMMARYDB_STORE_DIR", root)

    src_a = tmp_path / "sf_a"
    src_b = tmp_path / "sf_b"
    for d in (src_a, src_b):
        d.mkdir()
        (d / "region.parquet").write_bytes(b"x")

    fp_a1 = os.path.dirname(T._store_path(str(src_a), "v"))
    fp_b = os.path.dirname(T._store_path(str(src_b), "v"))
    os.makedirs(os.path.join(fp_a1, "some_store"), exist_ok=True)
    assert os.path.isdir(fp_a1) and os.path.isdir(fp_b)

    # regenerate source a -> new fingerprint; a's old tree goes, b's stays
    os.utime(src_a / "region.parquet", ns=(1, 10**15))
    fp_a2 = os.path.dirname(T._store_path(str(src_a), "v"))
    assert fp_a2 != fp_a1
    assert not os.path.isdir(fp_a1), "stale fingerprint tree not pruned"
    assert os.path.isdir(fp_b), "other source's fingerprint wrongly pruned"

    # unmarked (unattributable) dirs are left alone
    foreign = os.path.join(root, "deadbeef0000")
    os.makedirs(foreign)
    os.utime(src_a / "region.parquet", ns=(2, 2 * 10**15))
    T._store_path(str(src_a), "v")
    assert os.path.isdir(foreign)
