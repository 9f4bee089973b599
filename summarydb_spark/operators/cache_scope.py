"""Lifecycle scoping for the engine's TRANSIENT internal caches.

Two operator families persist small internal relations while one query
plan consumes them from several aliased branches (where AQE exchange
reuse cannot fire): the dedup guards (``functions.dedup._GUARD_PERSISTED``)
and the two-phase ranker (``operators.shuffle_tools._RANK_PERSISTED``).
Those persists are load-bearing WITHIN one query but must not outlive
it: a long-lived session issuing many dedup/rank queries would otherwise
accumulate one CacheManager entry + its block-manager blocks per query
(measured round 10: late-suite queries absorbed the lookup/GC cost of
hundreds of stale entries).

:func:`transient_cache_scope` is the library-level answer: wrap each
logical unit of work (one query build + its actions) and every guard/rank
relation persisted INSIDE the block is unpersisted on exit.  Scopes nest
— an inner scope releases only what it added.  ``bench.py``'s explicit
``release_guard_caches()/release_rank_caches()`` calls remain as a
safety net (unpersist is idempotent), and remain the right tool for
code that cannot use a ``with`` block.

Why release-on-exit instead of auto-release when the consuming action
completes: the persists are created deep inside query builders that
never see the final DataFrame, a weakref on the returned frame fires at
the NEXT GC — often before the caller's action has run (the persist is
lazy, so the win would silently vanish) — and a QueryExecutionListener
needs the py4j callback server plus races concurrent queries that share
a guard relation (bench suite-mode runs 8 threads).  An explicit scope
has none of those failure modes and makes the lifetime visible at the
call site.
"""

from __future__ import annotations

from contextlib import contextmanager


def _registries() -> list:
    from summarydb_spark.functions.dedup import _GUARD_PERSISTED
    from summarydb_spark.operators.shuffle_tools import _RANK_PERSISTED

    return [_GUARD_PERSISTED, _RANK_PERSISTED]


@contextmanager
def transient_cache_scope():
    """Release every guard/rank relation persisted inside the block on
    exit (including on exception).  Entries present before entry are
    untouched, so scopes nest and concurrent scopes on different threads
    only over-release benignly (unpersist is idempotent and a released
    relation is re-cached by the next guard call)."""
    regs = _registries()
    marks = [len(r) for r in regs]
    try:
        yield
    finally:
        for reg, mark in zip(regs, marks):
            # pop only what the block added; the list is append-only
            # inside the block, so everything past the mark is ours
            while len(reg) > mark:
                df = reg.pop()
                try:
                    df.unpersist()
                except Exception:
                    pass
