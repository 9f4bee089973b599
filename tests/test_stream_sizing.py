"""Scale-adaptive streaming partition sizing (streaming/state.py) —
round-10 optimization: state-partition count derives from source volume,
with a parallelism floor and a state-instance cap, instead of inheriting
the session-wide shuffle default."""

import os

import pytest

from summarydb_spark.streaming.state import (
    _parse_bytes,
    scoped_shuffle_partitions,
    stream_shuffle_partitions,
)


def test_parse_bytes_suffixes():
    assert _parse_bytes("8m") == 8 << 20
    assert _parse_bytes("64k") == 64 << 10
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("8mb") == 8 << 20
    assert _parse_bytes("1024") == 1024


def test_sizing_floor_cap_and_scaling(spark, tmp_path):
    cores = spark.sparkContext.defaultParallelism
    floor = max(4, cores // 4)
    cap = 4 * cores

    # tiny source -> floor (a big machine must not serialize a small
    # stream, but must not pay per-partition state cost either)
    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)
    assert stream_shuffle_partitions(spark, str(small)) == floor

    # advisory-sized growth: N x advisory bytes -> ~N partitions once
    # past the floor
    advisory = _parse_bytes(
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    )
    n_target = max(floor + 3, 10)
    big = tmp_path / "big.bin"
    big.write_bytes(b"\0" * 128)  # placeholder; use explicit floor/cap math
    # simulate via a sparse file of n_target * advisory bytes
    with open(big, "wb") as f:
        f.truncate(n_target * advisory)
    assert stream_shuffle_partitions(spark, str(big)) == n_target

    # enormous source -> capped at 4x cores (state instance bound)
    huge = tmp_path / "huge.bin"
    with open(huge, "wb") as f:
        f.truncate((cap + 100) * advisory)
    assert stream_shuffle_partitions(spark, str(huge)) == cap


def test_env_override(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_STREAM_SHUFFLE", "17")
    assert stream_shuffle_partitions(spark, str(tmp_path)) == 17


def test_scoped_shuffle_partitions_restores(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with scoped_shuffle_partitions(spark, 5):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "5"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
    with pytest.raises(RuntimeError):
        with scoped_shuffle_partitions(spark, 5):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_directory_source_bytes(spark, tmp_path):
    # directories (the summarizer gates' chunked sources) sum their files
    d = tmp_path / "src"
    d.mkdir()
    advisory = _parse_bytes(
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    )
    cores = spark.sparkContext.defaultParallelism
    floor = max(4, cores // 4)
    n_target = max(floor + 2, 9)
    for i in range(n_target):
        with open(d / f"f{i}.bin", "wb") as f:
            f.truncate(advisory)
    assert stream_shuffle_partitions(spark, str(d)) == n_target
