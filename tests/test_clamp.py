"""The monotonic ingest clamp (reference: late appends clamped to
lastTimestamp+1, core/pipeline.go:80-84) is recursive:
``t'_i = max(t_i, t'_{i-1} + 1)``.  The engine uses the closed form
``t'_i = i + running_max(t_j - j)`` so it runs as a window function.
Prove the two agree on adversarial sequences, via DuckDB (same SQL text the
oracle uses — no Spark session needed for the algebra)."""

from __future__ import annotations

import duckdb
import pytest

CLOSED_FORM = """
SELECT t,
       rn + max(t - rn) OVER (ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t_adj
FROM (
  SELECT t, CAST(row_number() OVER (ORDER BY i) AS BIGINT) AS rn
  FROM df
)
ORDER BY rn
"""


def reference_clamp(ts: list[int]) -> list[int]:
    out: list[int] = []
    last = None
    for t in ts:
        t2 = t if last is None else max(t, last + 1)
        out.append(t2)
        last = t2
    return out


@pytest.mark.parametrize(
    "ts",
    [
        [10, 20, 30],                      # already monotone: no-op
        [10, 5, 6, 7],                     # one late run
        [10, 10, 10, 10],                  # equal stamps -> +1 chain
        [5, 4, 3, 2, 1],                   # fully reversed
        [0, 100, 1, 2, 101, 50, 200],      # interleaved late bursts
        [7],                               # singleton
    ],
)
def test_closed_form_matches_recursive_clamp(ts):
    con = duckdb.connect()
    con.execute("CREATE TABLE df (i INTEGER, t BIGINT)")
    con.executemany("INSERT INTO df VALUES (?, ?)", list(enumerate(ts)))
    got = [r[1] for r in con.execute(CLOSED_FORM).fetchall()]
    assert got == reference_clamp(ts)


def test_clamped_sequence_is_strictly_increasing():
    ts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    out = reference_clamp(ts)
    assert all(b > a for a, b in zip(out, out[1:]))
    assert all(o >= t for t, o in zip(ts, out))
