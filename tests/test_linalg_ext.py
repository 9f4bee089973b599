"""Power-iteration PCA: independent exact recompute + plan pins."""

from __future__ import annotations

import contextlib
import io

import numpy as np

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _half_away(x):
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def test_pca_matches_exact_numpy_recompute(spark):
    rows = entry.queries()["embedding_pca_power"](spark, SF_DIR).collect()
    emb = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    vm = _half_away(emb * 1000.0).astype(np.int64)
    n = vm.shape[0]
    mean = np.array(
        [int(s) // n for s in vm.sum(axis=0, dtype=np.int64)], dtype=np.int64
    )
    xc = vm - mean
    w = np.full(vm.shape[1], 1000, dtype=np.int64)
    for _ in range(3):
        s = xc @ w
        z = xc.T @ s
        order = np.lexsort((np.arange(len(z)), -np.abs(z)))
        zref = int(z[order[0]])
        if zref == 0:
            w = np.zeros_like(w)
        else:
            w = _half_away(z.astype(np.float64) / zref * 1000.0).astype(
                np.int64
            )
    got = {r.idx: (r.mean_milli, r.w_milli) for r in rows}
    assert len(got) == vm.shape[1]
    for j in range(vm.shape[1]):
        assert got[j] == (int(mean[j]), int(w[j]))
    # normalization contract: exactly one component pinned to +1000
    assert sum(1 for _, wj in got.values() if wj == 1000) >= 1
    assert all(abs(wj) <= 1000 for _, wj in got.values())


def test_pca_weights_broadcast_fact_persisted(spark):
    df = entry.queries()["embedding_pca_power"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan  # d-row weight vector broadcasts
    assert "InMemoryTableScan" in plan  # centered relation persisted once
    assert "CartesianProduct" not in plan


def test_theil_sen_matches_numpy_per_group(spark):
    import numpy as np
    from pyspark.sql import functions as F

    rows = entry.queries()["theil_sen_daily_trend"](spark, SF_DIR).collect()
    daily = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            "event_type",
            F.floor(
                F.expr("unix_micros(CAST(ts AS TIMESTAMP_LTZ))")
                / 86_400_000_000.0
            ).cast("long").alias("d"),
        )
        .groupBy("event_type", "d")
        .count()
        .collect()
    )
    from collections import defaultdict

    series = defaultdict(dict)
    for r in daily:
        series[r.event_type][r.d] = r["count"]
    for r in rows:
        ds = sorted(series[r.event_type])
        ys = [series[r.event_type][d] for d in ds]
        slopes = [
            (ys[j] - ys[i]) / (ds[j] - ds[i])
            for i in range(len(ds))
            for j in range(i + 1, len(ds))
        ]
        assert r.n_days == len(ds)
        assert r.n_pairs == len(slopes)
        med = float(np.median(np.array(slopes)))
        assert r.sen_slope_milli == int(
            np.sign(med * 1000) * np.floor(abs(med * 1000) + 0.5)
        )
