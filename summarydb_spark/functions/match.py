"""Multi-pattern substring matching: Aho-Corasick over Arrow batches.

The 100 TB blocklist problem: tag every document that contains any of K
phrases.  K ``contains()`` predicates scan each document K times —
O(K * corpus); the Aho-Corasick automaton (Aho & Corasick, CACM 1975)
scans each document ONCE regardless of K.  The automaton builds on the
driver (K is small — blocklists are bounded), ships to executors inside
the ``mapInPandas`` closure (same broadcast discipline as the IVF
centroids), and the scan itself is pure Python over Arrow-batched
strings — no per-row UDF calls, one Python invocation per batch.

Semantics contract: PRESENCE of each pattern as a plain substring
(exactly SQL ``contains(text, pattern)``), so a K-predicate SQL oracle
can verify the automaton bit-for-bit.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def build_automaton(patterns: Sequence[str]):
    """Aho-Corasick goto/fail/output tables as plain dicts/lists
    (picklable, tiny: O(total pattern chars) states)."""
    goto: list[dict[str, int]] = [{}]
    out: list[set[int]] = [set()]
    for pid, pat in enumerate(patterns):
        s = 0
        for ch in pat:
            nxt = goto[s].get(ch)
            if nxt is None:
                goto.append({})
                out.append(set())
                nxt = len(goto) - 1
                goto[s][ch] = nxt
            s = nxt
        out[s].add(pid)
    fail = [0] * len(goto)
    q = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        r = q.popleft()
        for ch, s in goto[r].items():
            q.append(s)
            f = fail[r]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
            out[s] |= out[fail[s]]
    return goto, fail, out


def _scan(goto, fail, out, text: str):
    """Distinct pattern ids present in ``text`` (substring semantics)."""
    s = 0
    hits: set[int] = set()
    for ch in text:
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
        if out[s]:
            hits |= out[s]
    return hits


def multi_pattern_tag(
    df: DataFrame, id_col: str, text_col: str, patterns: Sequence[str]
) -> DataFrame:
    """(id, pattern_id) rows for every pattern present in each text —
    one automaton pass per document, Arrow-batched."""
    pats = list(patterns)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pattern_id", LongType()),
        ]
    )
    tables = build_automaton(pats)

    def scan_batches(batches):
        goto, fail, out = tables
        for pdf in batches:
            ids, pids = [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None:
                    continue
                for pid in _scan(goto, fail, out, txt):
                    ids.append(i)
                    pids.append(pid)
            import pandas as pd

            yield pd.DataFrame({"doc_id": ids, "pattern_id": pids})

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(scan_batches, schema)
