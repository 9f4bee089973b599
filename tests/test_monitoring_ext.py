"""Semantics tests for plans.monitoring_ext on constructed inputs with
hand-computable statistics (the oracle runs the same SQL, so these pin
the math itself)."""

from __future__ import annotations

import datetime
import math

import pytest

from summarydb_spark.plans.monitoring_ext import (
    q_chi2_lang_source,
    q_embedding_quantize_int8,
    q_psi_feature_drift,
    q_token_entropy,
)



@pytest.fixture(autouse=True)
def _invalidate_table_memo(spark):
    """These tests overwrite the shared testdata temp views with tiny
    synthetic ones; drop register_tables' memo afterwards so the next
    real-table consumer re-registers instead of reading the stubs."""
    yield
    from summarydb_spark.sources.tables import _REGISTERED_ATTR

    if hasattr(spark, _REGISTERED_ATTR):
        delattr(spark, _REGISTERED_ATTR)


def _ts(day, sec=0):
    return datetime.datetime(2024, 1, day, 0, 0, sec)


def test_psi_detects_shift_and_stability(spark):
    # 'stable' type: identical halves; 'shift' type: values move buckets
    rows = []
    eid = 0
    for half, day in ((0, 1), (1, 9)):
        for i in range(50):
            rows.append((eid, _ts(day, i), 1, "stable", 10.0, "{}"))
            eid += 1
            val = 10.0 if half == 0 else 480.0
            rows.append((eid, _ts(day, i), 1, "shift", val, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).createOrReplaceTempView("events")
    out = {r["event_type"]: r for r in spark.sql(q_psi_feature_drift("spark")).collect()}
    assert out["stable"]["verdict"] == "stable"
    assert out["stable"]["psi_micro"] == 0
    assert out["shift"]["verdict"] == "block"
    # hand-compute the shifted PSI with +1 smoothing over the 2 observed
    # buckets (0 and 19): ref=(51,1)/52, cur=(1,51)/52
    exp = sum(
        (p - q) * math.log(p / q)
        for p, q in (((51 / 52), (1 / 52)), ((1 / 52), (51 / 52)))
    )
    assert out["shift"]["psi_micro"] == math.floor(exp * 1_000_000)


def test_chi2_independent_vs_skewed(spark):
    # perfectly independent 2x2: chi2 = 0
    rows = []
    did = 0
    for lang in ("en", "fr"):
        for src in ("a", "b"):
            for _ in range(25):
                rows.append((did, "t", lang, src, 1))
                did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    r = spark.sql(q_chi2_lang_source("spark")).collect()[0]
    assert r["chi2_micro"] == 0
    assert r["dof"] == 1

    # fully dependent: lang determines source; chi2 = n
    rows = [(i, "t", "en" if i % 2 else "fr", "a" if i % 2 else "b", 1)
            for i in range(100)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    r = spark.sql(q_chi2_lang_source("spark")).collect()[0]
    assert r["chi2_micro"] == 100 * 1_000_000


def test_token_entropy_extremes(spark):
    rows = [
        (0, "a a a a", "en", "s", 7),          # constant -> H = 0
        (1, "a b c d", "en", "s", 7),          # uniform -> H = ln(4)
        (2, "a a b b", "en", "s", 7),          # uniform over 2 -> ln(2)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).createOrReplaceTempView("documents")
    out = {r["doc_id"]: r for r in spark.sql(q_token_entropy("spark")).collect()}
    assert out[0]["entropy_micro"] == 0
    assert out[0]["entropy_ratio_micro"] == 1_000_000  # convention: 1 symbol
    assert out[1]["entropy_micro"] == math.floor(math.log(4) * 1e6)
    # H = ln(4) exactly (the c*ln(c) terms are all 0), so ratio == 1.0
    assert out[1]["entropy_ratio_micro"] == 1_000_000
    assert out[2]["entropy_micro"] == math.floor(math.log(2) * 1e6)


def test_quantize_int8_exact_and_zero_vector(spark):
    rows = [
        (0, [127.0, -127.0, 0.0], 0),   # scale 1: exact grid, zero error
        (1, [0.0, 0.0, 0.0], 0),        # zero vector: guarded, zero error
        (2, [1.0, 0.5, 0.0], 1),        # scale 1/127
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).createOrReplaceTempView("embeddings")
    out = {r["label"]: r for r in spark.sql(q_embedding_quantize_int8("spark")).collect()}
    assert out[0]["avg_mse_e12"] == 0.0
    assert out[0]["avg_max_err_micro"] == 0.0
    # label 1: q = floor(x*127 + 0.5) -> x=0.5 -> q=64, err = |0.5-64/127|
    sc = 1.0 / 127.0
    err = abs(0.5 - math.floor(0.5 / sc + 0.5) * sc)
    exp_mse = (err * err) / 3 * 1e12
    assert abs(out[1]["avg_mse_e12"] - round(exp_mse, 2)) < 0.05
    assert abs(out[1]["avg_max_err_micro"] - round(err * 1e6, 2)) < 0.05
