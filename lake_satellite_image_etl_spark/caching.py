"""Bounded lazy caching for multi-consumer subtrees.

Catalyst does NOT reuse non-exchange subtrees: a DataFrame referenced
k times in one plan recomputes its whole upstream k times (the
triangle kernel's ``oriented`` edge list was being rebuilt ~9× per
run — wedge sides e1/e2/e3 × corners a/b/c). ``persist()`` is the
right fix because it is plan-LAZY (zero Spark jobs at DataFrame
construction — the zero-jobs sweep in tests/test_construction_jobs.py
stays green; an eager localCheckpoint would materialize at plan time,
the r9 leak class) and the CacheManager dedups identical plans.

The registry bounds what a long-lived shared session can accumulate
(ADVICE r10 on the PQ codebook): only the newest ``_MAX`` frames stay
persisted; evicted frames unpersist, and a consumer of an evicted
plan just recomputes — unpersisting is always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []
_MAX = 8


def persist_bounded(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    while len(_PERSISTED) > _MAX:
        old = _PERSISTED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # session may already be stopped
    return df
