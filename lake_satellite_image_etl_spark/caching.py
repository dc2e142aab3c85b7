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
(ADVICE r10 on the PQ codebook): only the newest ``_MAX`` distinct
PLANS stay persisted. Keying matters (ADVICE r11): Spark's
CacheManager dedups identical canonicalized plans, so registering the
same reconstructed query twice by insertion order would create two
list slots pointing at ONE cache entry — evicting the "old" slot
unpersists the shared entry out from under the "new" one. The
registry is therefore keyed by ``(session, df.semanticHash())``
(Spark's canonicalized-plan hash): re-registering an identical plan
just refreshes its recency, and eviction only fires when no newer
registered frame shares the cache entry. Session scoping also stops
stopped-session DataFrames from being pinned by a live registry.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

#: (session key, semanticHash) -> DataFrame, insertion == recency order
_PERSISTED: dict[tuple[int, int], DataFrame] = {}
#: sized with headroom over the largest per-query registration count
#: (ADVICE r16: r16's optimizations register 3-4 frames per query and
#: _MAX=8 left a composed pipeline one eviction away from silently
#: reverting a still-referenced frame to full recompute; the largest
#: observed single-query count is 5 — pipeline_corpus_dedup — so 16
#: covers two composed pipelines). Frames are reduced intermediates
#: (signature/pair/centroid tables), so the memory bound stays modest.
_MAX = 16

#: capacity evictions since process start (ADVICE r16): eviction of
#: the LRU slot while a query is still being constructed can revert a
#: referenced frame to full recompute with no other signal — the
#: counter plus the warning below make that visible/testable.
CAPACITY_EVICTIONS = 0


def _key(df: DataFrame) -> tuple[int, int]:
    return (id(df.sparkSession), df.semanticHash())


def persist_bounded(df: DataFrame) -> DataFrame:
    df = df.persist()
    try:
        key = _key(df)
    except Exception:
        return df  # semanticHash unavailable (exotic plan): persist unmanaged
    # refresh recency: same canonical plan == same cache entry
    evicted = _PERSISTED.pop(key, None)
    if evicted is not None and evicted is not df:
        # semanticHash is 32-bit: two DIFFERENT plans can collide on
        # one key in a session. Dropping the slot silently would
        # leave the old frame cached untracked — beyond both the
        # recency bound and release_all()'s reach (ADVICE r12).
        # Unpersisting a non-shared entry is always safe; when the
        # plans ARE semantically equal they share one CacheManager
        # entry, so unpersisting would yank it from under `df`.
        try:
            same = evicted.sameSemantics(df)
        except Exception:
            same = True  # can't prove distinct: keep the safe side
        if not same:
            try:
                evicted.unpersist()
            except Exception:
                pass
    _PERSISTED[key] = df
    while len(_PERSISTED) > _MAX:
        global CAPACITY_EVICTIONS
        CAPACITY_EVICTIONS += 1
        oldest = next(iter(_PERSISTED))
        old = _PERSISTED.pop(oldest)
        _log.warning(
            "persist_bounded: capacity eviction at _MAX=%d (total %d) — "
            "if the evicted frame is still referenced by an in-flight "
            "plan it silently reverts to full recompute",
            _MAX,
            CAPACITY_EVICTIONS,
        )
        try:
            old.unpersist()
        except Exception:
            pass  # session may already be stopped
    return df


def release_all() -> None:
    """Unpersist every registered frame and empty the registry.

    Called by bench.py between queries (alongside its existing
    ``clearCache`` assumption) so a batch of 8 heavy graph queries
    cannot hold all ``_MAX`` slots concurrently — memory headroom at
    sf1+ is deterministic instead of depending on batch composition
    (VERDICT r11 item 8).
    """
    while _PERSISTED:
        _, old = _PERSISTED.popitem()
        try:
            old.unpersist()
        except Exception:
            pass


#: session-attr memo for bounded driver-side artifacts derived from
#: ONE fixture path (a scalar corpus count, a trained merge table, a
#: bloom bitset): (memo key, path) -> (path stat, value).
_PATH_MEMO_ATTR = "_lse_path_memo"


def memo_per_path(spark, key: str, path: str, compute, on_evict=None):
    """Memoize a bounded construction-time artifact per (session,
    ``key``, ``path`` stat) — the generalization of the IVF codebook
    memo (VERDICT r12 item 4) that moved the whole IVF family off the
    construction-jobs allowlist. Semantics:

    - the artifact is computed by ``compute()`` on FIRST touch of a
      path and re-used for every later DataFrame construction against
      the same unchanged path — construction becomes jobless after
      first touch, exactly like schema inference;
    - the stat key (mtime_ns, size) means an overwritten path
      re-computes instead of silently reusing a stale artifact; for
      a DIRECTORY path (Spark-written datasets) the key also folds
      in a digest of every file's (relpath, mtime_ns, size), walked
      recursively (ADVICE r13 + r14 review): an in-place part-file
      rewrite that keeps entry names — including one that RESTORES
      an older mtime (cp -p / rsync -a), or one inside a partition
      subdirectory — must invalidate result-bearing artifacts
      (bloom masks, candidate matrices, sample broadcasts), not
      serve stale query output;
    - ONE live entry per (key, path): replace, don't accumulate stat
      generations (ADVICE r11), so long-lived sessions that rewrite
      tmp fixture dirs stay bounded;
    - session-attr storage scopes the memo to the SparkSession
      lifetime (a stopped session's artifacts are not pinned by a
      module global).

    ``on_evict`` (r13 review): called with the OLD value when a
    stale entry is replaced after a path rewrite — artifacts holding
    executor-side resources (a pyspark Broadcast) pass a release
    hook (e.g. ``lambda bc: bc.unpersist()``) so rewrite generations
    free deterministically instead of waiting on Python GC + the
    ContextCleaner; a plain value (schema, scalar, list) needs none.

    Only memoize BOUNDED artifacts (model-artifact class: caps or
    structural bounds documented at the call site) — this is a
    driver-memory contract, not a result cache."""
    import os

    try:
        st = os.stat(path)
        stat_key = (st.st_mtime_ns, st.st_size)
        if os.path.isdir(path):
            # digest of EVERY file's (relpath, mtime_ns, size),
            # walked recursively in sorted order (r14 review closing
            # the ADVICE r13 gap for real): a max-only key missed any
            # rewrite that didn't move the max tuple (e.g. cp -p
            # restoring an OLDER part file), and a non-recursive scan
            # missed in-place rewrites inside partition
            # subdirectories (date=X/part-*.parquet). Bounded at
            # 4096 files — past the cap the digest covers the sorted
            # prefix plus the total count, so additions/removals
            # still invalidate; a beyond-horizon in-place rewrite of
            # a >4096-file dataset is accepted as out of contract
            # (memoized artifacts are fixture-scale model inputs).
            import hashlib as _hl

            digest = _hl.md5()
            count = 0
            for root, dirs, files in os.walk(path):
                dirs.sort()
                for fn in sorted(files):
                    count += 1  # full count: additions past the
                    # digest horizon still change the key
                    if count <= 4096:
                        fp = os.path.join(root, fn)
                        rel = os.path.relpath(fp, path)
                        # per-file stat failure (broken symlink,
                        # permission-denied part file) folds an
                        # error marker into the digest instead of
                        # escaping to the outer except: stat_key=None
                        # means "path missing" and MATCHES a prior
                        # None, so one persistently unstat-able file
                        # would otherwise freeze invalidation for the
                        # whole dataset dir (ADVICE r14). The marker
                        # keeps the key live — other files' rewrites
                        # still change it — and changes it again if
                        # the failure itself appears/clears/moves.
                        try:
                            st_f = os.stat(fp)
                            digest.update(
                                f"{rel}\x00{st_f.st_mtime_ns}"
                                f"\x00{st_f.st_size}\n".encode()
                            )
                        except OSError as e:
                            digest.update(
                                f"{rel}\x00ERR\x00{e.errno}\n".encode()
                            )
            stat_key = stat_key + (digest.hexdigest(), count)
    except OSError:
        stat_key = None
    memo = getattr(spark, _PATH_MEMO_ATTR, None)
    if memo is None:
        memo = {}
        setattr(spark, _PATH_MEMO_ATTR, memo)
    k = (key, path)
    hit = memo.get(k)
    if hit is None or hit[0] != stat_key:
        value = compute()  # compute BEFORE evicting: a raise keeps the old entry
        if hit is not None and on_evict is not None:
            try:
                on_evict(hit[1])
            except Exception:
                pass
        memo[k] = (stat_key, value)
    return memo[k][1]
