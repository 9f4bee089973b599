"""Semantic checks for the landmark-corrected portable estimator SQL
(plans/portable_sql.q_approx_range_landmark) — run on DuckDB (no Spark
session needed; the Spark rendering is cross-checked by the oracle gate).

Reference semantics: core/sum_estimator.go:34-118 — landmark values answer
exactly; a query range fully covering every overlapping window must return
the exact aggregate with zero CI width.
"""

from __future__ import annotations

import duckdb
import pytest

from summarydb_spark.plans.portable_sql import q_approx_range_landmark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return c


def test_full_range_is_exact(con):
    """qid=1 spans [tmin, tmax]: every window fully covered + landmark exact
    => estimate == exact sum of all values, lower_ci == upper_ci."""
    est = con.sql(q_approx_range_landmark("duckdb", "sum")).df()
    full = est[est.qid == 1].set_index("stream_id")
    exact = con.sql(
        """SELECT user_id AS stream_id,
                  CAST(round(sum(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE) AS s
           FROM events GROUP BY user_id"""
    ).df().set_index("stream_id")
    for sid, row in full.iterrows():
        assert row["estimate"] == pytest.approx(exact.loc[sid, "s"], abs=1e-3)
        assert row["lower_ci"] == pytest.approx(row["upper_ci"], abs=1e-6)


def test_corrections_are_live(con):
    """The landmark interval [tmin+5%, tmin+15%] holds rows on every stream
    (so the build actually excludes rows), and count-op landmark sums are
    positive for the full-range query."""
    n_lm = con.sql(
        """WITH b AS (SELECT user_id, min(epoch_us(ts)) tmin, max(epoch_us(ts)) tmax
                      FROM events GROUP BY user_id)
           SELECT count(*) FROM events e JOIN b ON b.user_id = e.user_id
           WHERE epoch_us(ts) BETWEEN tmin + CAST(floor((tmax-tmin)*0.05) AS BIGINT)
                                  AND tmin + CAST(floor((tmax-tmin)*0.15) AS BIGINT)"""
    ).fetchone()[0]
    assert n_lm > 0

    cnt = con.sql(q_approx_range_landmark("duckdb", "count")).df()
    full = cnt[cnt.qid == 1]
    # full-range count estimate == stream size (exact), which includes the
    # landmark rows excluded from the summary build
    sizes = con.sql(
        "SELECT user_id AS stream_id, count(*) AS n FROM events GROUP BY user_id"
    ).df().set_index("stream_id")
    for _, row in full.iterrows():
        assert row["estimate"] == pytest.approx(
            sizes.loc[row["stream_id"], "n"], abs=1e-6
        )


def test_newest_tenth_skips_corrections(con):
    """qid=3 (newest tenth) doesn't overlap the old landmark interval: the
    guard paths must leave bounds consistent (lower <= estimate <= upper)."""
    est = con.sql(q_approx_range_landmark("duckdb", "sum")).df()
    tail = est[est.qid == 3]
    assert len(tail) > 0
    assert (tail["lower_bound"] <= tail["estimate"] + 1e-9).all()
    assert (tail["estimate"] <= tail["upper_bound"] + 1e-9).all()
    assert (tail["lower_ci"] <= tail["upper_ci"] + 1e-9).all()
