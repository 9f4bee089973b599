"""Degenerate-input totality tests for the SQL query templates.

The oracle gate proves each template correct on the generated testdata;
these prove the templates stay TOTAL on pathological inputs the
generator never produces — empty/1-token documents, single-event and
same-timestamp streams, all-identical values — i.e. no ANSI
divide-by-zero, no silently dropped rows, no crash in either engine's
rendering (Spark executed here; the DuckDB rendering is string-equal
modulo dialect so the guards are shared).

Each test registers tiny synthetic temp views shadowing the standard
table names, then runs the Spark rendering directly.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
import pytest



@pytest.fixture(autouse=True)
def _invalidate_table_memo(spark):
    """These tests overwrite the shared testdata temp views with tiny
    synthetic ones; drop register_tables' memo afterwards so the next
    real-table consumer re-registers instead of reading the stubs."""
    yield
    from summarydb_spark.sources.tables import _REGISTERED_ATTR

    if hasattr(spark, _REGISTERED_ATTR):
        delattr(spark, _REGISTERED_ATTR)


def _events_view(spark, rows):
    spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=t,
                user_id=u,
                event_type=et,
                value=float(v),
                props="{}",
            )
            for i, (t, u, et, v) in enumerate(rows)
        ]
    ).createOrReplaceTempView("events")


def _docs_view(spark, texts):
    spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="s0", n_chars=len(t))
            for i, t in enumerate(texts)
        ]
    ).createOrReplaceTempView("documents")


TS0 = datetime.datetime(2024, 1, 1)


def _ts(seconds):
    return TS0 + datetime.timedelta(seconds=seconds)


def test_length_buckets_cover_one_token_docs(spark):
    from summarydb_spark.plans.pipeline_ext import q_length_bucket_batches

    _docs_view(spark, ["", "x", "a b", "one two three four"])
    rows = spark.sql(q_length_bucket_batches("spark")).collect()
    # every doc lands in a bucket: '' and 'x' tokenize to 1 token -> b=0
    assert sum(r.n_docs for r in rows) == 4
    assert any(r.bucket == 0 for r in rows)


def test_m4_single_point_bucket_all_roles_coincide(spark):
    from summarydb_spark.plans.analytics_ext import q_downsample_m4_daily

    _events_view(
        spark,
        [
            (_ts(0), 1, "view", 5.0),  # lone point in its bucket
            (_ts(86400), 1, "view", 1.0),  # next day: duplicate (t, value)
            (_ts(86400), 1, "view", 1.0),
        ],
    )
    rows = spark.sql(q_downsample_m4_daily("spark")).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault((r.event_type, r.day), {})[r.role] = r
    assert all(set(p) == {"first", "last", "min", "max"} for p in by_bucket.values())
    lone = [p for p in by_bucket.values() if len({x.t for x in p.values()}) == 1]
    assert lone  # the singleton bucket picks the same point for all 4 roles


def test_burstiness_total_on_degenerate_streams(spark):
    from summarydb_spark.plans.analytics_ext import q_burstiness_interarrival

    _events_view(
        spark,
        [
            (_ts(0), 1, "lonely", 1.0),  # 1 event: no gaps
            (_ts(0), 1, "pair", 1.0),  # 2 events: 1 gap (variance undefined)
            (_ts(5), 1, "pair", 1.0),
            (_ts(0), 1, "same_ts", 1.0),  # all-zero gaps: mean 0
            (_ts(0), 1, "same_ts", 1.0),
            (_ts(0), 1, "same_ts", 1.0),
        ],
    )
    rows = spark.sql(q_burstiness_interarrival("spark")).collect()
    by_type = {r.event_type: r for r in rows}
    assert "lonely" not in by_type and "pair" not in by_type  # < 2 gaps
    assert by_type["same_ts"].cv is None  # nullif, not divide-by-zero
    assert by_type["same_ts"].burstiness is None


def test_markov_and_anomaly_run_on_single_event_users(spark):
    from summarydb_spark.plans.analytics_ext import q_anomaly_zscore_daily
    from summarydb_spark.plans.stats_ext import q_markov_event_transitions

    _events_view(spark, [(_ts(i * 3600), i, "view", 1.0) for i in range(3)])
    assert spark.sql(q_markov_event_transitions("spark")).collect() == []
    # anomaly needs >= 4 prior days; a short series returns empty, not error
    assert spark.sql(q_anomaly_zscore_daily("spark")).collect() == []


def test_bigrams_and_index_skip_short_docs(spark):
    from summarydb_spark.plans.pipeline_ext import (
        q_bigram_lm_kn_stats,
        q_inverted_index_postings,
    )

    _docs_view(spark, ["", "solo", "two words"])
    bg = spark.sql(q_bigram_lm_kn_stats("spark")).collect()
    assert {(r.w1, r.w2) for r in bg} == {("two", "words")}
    # all docs < 3 tokens shingle to whole-text terms with df < 4: empty
    assert spark.sql(q_inverted_index_postings("spark")).collect() == []


def test_split_covers_arbitrary_ids(spark):
    from summarydb_spark.plans.pipeline_ext import q_split_train_val_test

    _docs_view(spark, [f"doc {i}" for i in range(997)])
    rows = spark.sql(q_split_train_val_test("spark")).collect()
    assert sum(r.n_docs for r in rows) == 997
    assert {r.split for r in rows} <= {"train", "val", "test"}


def test_zipf_total_on_flat_and_single_token_corpora(spark):
    from summarydb_spark.plans.analytics_ext import q_zipf_token_fit

    # every token frequency equal (all y identical): r2's variance
    # denominator is exactly 0 -> NULL, slope numerator is 0 -> 0.0
    _docs_view(spark, ["alpha beta gamma delta"])
    r = spark.sql(q_zipf_token_fit("spark")).collect()[0]
    assert r.zipf_slope == 0.0
    assert r.r2 is None

    # one distinct token: a single (x, y) point, both denominators 0
    _docs_view(spark, ["a a a a a"])
    r = spark.sql(q_zipf_token_fit("spark")).collect()[0]
    assert r.zipf_slope is None
    assert r.r2 is None


def test_dataset_card_total_on_empty_corpus(spark):
    from summarydb_spark.plans.pipeline_ext import q_dataset_card_summary

    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).createOrReplaceTempView("documents")
    r = spark.sql(q_dataset_card_summary("spark")).collect()[0]
    assert r.n_docs == 0
    assert r.exact_dup_ppm is None  # nullif(count(*), 0), not a crash


def test_burstiness_regular_gaps_report_regular_limit(spark):
    from summarydb_spark.plans.analytics_ext import q_burstiness_interarrival

    # equal nonzero gaps whose rounded power sums make the sample
    # variance epsilon-NEGATIVE without the greatest(v, 0) clamp: the
    # rounded s2 undercuts s1^2/n, sqrt would be NaN.  With the clamp
    # the regular-limit values come out exactly: cv 0, burstiness -1.
    g_us = 1_414_250  # round(3*g^2, 2) < round(3*g, 4)^2 / 3: var -2.3e-4
    _events_view(
        spark,
        [
            (TS0 + datetime.timedelta(microseconds=i * g_us), 1, "tick", 1.0)
            for i in range(4)
        ],
    )
    r = spark.sql(q_burstiness_interarrival("spark")).collect()[0]
    assert r.cv == 0.0
    assert r.burstiness == -1.0


def test_novelty_closed_form_on_tiny_corpus(spark):
    from summarydb_spark.plans.pipeline_ext import q_ngram_novelty_score

    # 3 docs, all inside the LIMIT window: doc 0 owns every gram
    # (novelty 1.0), doc 1 is an exact copy (novelty 0), doc 2 shares
    # exactly one of its two grams with doc 0 (novelty 0.5)
    _docs_view(
        spark,
        [
            "alpha beta gamma delta",
            "alpha beta gamma delta",
            "omega alpha beta gamma",
        ],
    )
    by_doc = {
        r.doc_id: r for r in spark.sql(q_ngram_novelty_score("spark")).collect()
    }
    assert by_doc[0].novelty_ppm == 1_000_000
    assert by_doc[1].novelty_ppm == 0
    assert by_doc[2].n_grams == 2 and by_doc[2].n_novel == 1
    assert by_doc[2].novelty_ppm == 500_000
