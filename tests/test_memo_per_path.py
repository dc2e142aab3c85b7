"""Unit contract of caching.memo_per_path (r13) — the generalized
per-(session, path stat) artifact memo that io.py's schema memo, the
IVF codebook memo callers, and the r13 construction-jobs migrations
all ride. Driver-side only; no Spark jobs."""

from __future__ import annotations

import os

from lake_satellite_image_etl_spark.caching import memo_per_path


class _FakeSession:
    """memo_per_path only setattr/getattrs a dict on the session."""


def test_computes_once_per_unchanged_path(tmp_path):
    spark = _FakeSession()
    f = tmp_path / "x.parquet"
    f.write_text("v1")
    calls = []
    for _ in range(3):
        v = memo_per_path(spark, "k", str(f), lambda: calls.append(1) or 7)
        assert v == 7
    assert len(calls) == 1


def test_stat_change_recomputes_and_evicts(tmp_path):
    spark = _FakeSession()
    f = tmp_path / "x.parquet"
    f.write_text("v1")
    evicted = []
    v1 = memo_per_path(
        spark, "k", str(f), lambda: "first", on_evict=evicted.append
    )
    assert v1 == "first" and evicted == []
    f.write_text("longer-v2")  # size changes -> stat key changes
    v2 = memo_per_path(
        spark, "k", str(f), lambda: "second", on_evict=evicted.append
    )
    assert v2 == "second"
    assert evicted == ["first"]
    # one live entry per (key, path): the stale generation is gone
    memo = spark._lse_path_memo
    assert len([k for k in memo if k == ("k", str(f))]) == 1


def test_compute_raise_keeps_old_entry(tmp_path):
    """A failing recompute must not tear down the previous value:
    compute runs BEFORE eviction (the embedding-cosine cap guard
    relies on a raise leaving no partial state)."""
    spark = _FakeSession()
    f = tmp_path / "x.parquet"
    f.write_text("v1")
    evicted = []
    memo_per_path(spark, "k", str(f), lambda: "good", on_evict=evicted.append)
    f.write_text("rewritten!")

    def boom():
        raise ValueError("over cap")

    try:
        memo_per_path(spark, "k", str(f), boom, on_evict=evicted.append)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert evicted == []  # nothing was torn down
    # and the NEXT call against the changed stat retries compute
    v = memo_per_path(
        spark, "k", str(f), lambda: "retried", on_evict=evicted.append
    )
    assert v == "retried" and evicted == ["good"]


def test_keys_do_not_collide_across_names(tmp_path):
    spark = _FakeSession()
    f = tmp_path / "x.parquet"
    f.write_text("v1")
    a = memo_per_path(spark, "a", str(f), lambda: "A")
    b = memo_per_path(spark, "b", str(f), lambda: "B")
    assert (a, b) == ("A", "B")


def test_missing_path_memoizes_until_path_appears(tmp_path):
    """OSError -> stat None: a missing path memoizes (same behavior
    the schema memo always had) and re-computes once the path exists
    (stat None -> real key)."""
    spark = _FakeSession()
    f = tmp_path / "later.parquet"
    v1 = memo_per_path(spark, "k", str(f), lambda: "absent")
    assert v1 == "absent"
    f.write_text("now here")
    v2 = memo_per_path(spark, "k", str(f), lambda: "present")
    assert v2 == "present"


def test_inplace_part_rewrite_of_directory_invalidates(tmp_path):
    """ADVICE r13: a parquet DIRECTORY rewritten in place — same
    entry names, so the directory inode (mtime, size) is unchanged —
    must still invalidate: the memo now covers result-bearing
    artifacts where a stale hit silently changes query output."""
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    part.write_text("v1")
    dir_st = os.stat(str(d))
    assert memo_per_path(spark, "k", str(d), lambda: 1) == 1
    part.write_text("v2")  # same name, same size, newer mtime
    # pin the directory inode stat to its original values so the test
    # exercises the part-file component of the key, not the dir's
    os.utime(str(d), ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    assert memo_per_path(spark, "k", str(d), lambda: 2) == 2


def test_mtime_preserving_restore_of_non_max_part_invalidates(tmp_path):
    """r14 review: a max-only directory key missed `cp -p` restoring
    an OLDER version of a part file while a newer sibling holds the
    max (mtime, size) — the full-entry digest must catch it."""
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    d.mkdir()
    p0, p1 = d / "part-00000.parquet", d / "part-00001.parquet"
    p0.write_text("v-now")
    p1.write_text("newer-sibling")
    st1 = os.stat(str(p1))
    os.utime(str(p1), ns=(st1.st_atime_ns, st1.st_mtime_ns + 10**9))
    assert memo_per_path(spark, "k", str(d), lambda: 1) == 1
    # restore p0 to an OLDER mtime, same size — p1's max is untouched
    st0 = os.stat(str(p0))
    os.utime(str(p0), ns=(st0.st_atime_ns, st0.st_mtime_ns - 10**9))
    assert memo_per_path(spark, "k", str(d), lambda: 2) == 2


def test_partition_subdirectory_rewrite_invalidates(tmp_path):
    """r14 review: partitioned datasets (date=X/part-*.parquet) keep
    their rewrites one level down — the walk must be recursive."""
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    (d / "date=2026-01-01").mkdir(parents=True)
    part = d / "date=2026-01-01" / "part-00000.parquet"
    part.write_text("v1")
    dir_st = os.stat(str(d))
    assert memo_per_path(spark, "k", str(d), lambda: 1) == 1
    part.write_text("v2")
    os.utime(str(d), ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    assert memo_per_path(spark, "k", str(d), lambda: 2) == 2


def test_directory_with_unchanged_parts_still_memoizes(tmp_path):
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    d.mkdir()
    (d / "part-00000.parquet").write_text("v1")
    calls = []
    for _ in range(3):
        v = memo_per_path(spark, "k", str(d), lambda: calls.append(1) or 7)
        assert v == 7
    assert len(calls) == 1


def test_mtime_only_change_recomputes(tmp_path):
    """Same size, newer mtime — the rewrite pattern mode('overwrite')
    produces — must invalidate."""
    spark = _FakeSession()
    f = tmp_path / "x.parquet"
    f.write_text("same-size")
    memo_per_path(spark, "k", str(f), lambda: 1)
    st = os.stat(str(f))
    os.utime(str(f), ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert memo_per_path(spark, "k", str(f), lambda: 2) == 2


def test_broken_entry_folds_error_marker_instead_of_freezing(tmp_path):
    """ADVICE r14: a persistently unstat-able entry inside a dataset
    dir (broken symlink, permission-denied part file) must fold a
    (relpath, errno) marker into the digest, NOT collapse the stat
    key to the missing-path None sentinel — None == None on the next
    call would serve a stale memoized artifact forever while OTHER
    files keep being rewritten."""
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    d.mkdir()
    part = d / "part-00000.parquet"
    part.write_text("v1")
    os.symlink(str(tmp_path / "nowhere"), str(d / "broken-link"))
    dir_st = os.stat(str(d))
    calls = []
    v = memo_per_path(spark, "k", str(d), lambda: calls.append(1) or "a")
    assert v == "a"
    # deterministic marker: unchanged dir (broken link included)
    # still memoizes
    assert memo_per_path(spark, "k", str(d), lambda: "never") == "a"
    assert len(calls) == 1
    # THE regression case: rewriting another file must invalidate
    # even with the broken entry present (dir mtime pinned so only
    # the per-file digest can carry the change)
    part.write_text("v2-longer")
    os.utime(str(d), ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    assert memo_per_path(spark, "k", str(d), lambda: "b") == "b"


def test_broken_entry_clearing_invalidates(tmp_path):
    """The error marker is part of the key: the failure CLEARING
    (symlink fixed in place) changes the digest and recomputes."""
    spark = _FakeSession()
    d = tmp_path / "ds.parquet"
    d.mkdir()
    (d / "part-00000.parquet").write_text("v1")
    target = tmp_path / "target"
    os.symlink(str(target), str(d / "link"))  # dangling at first
    dir_st = os.stat(str(d))
    assert memo_per_path(spark, "k", str(d), lambda: "a") == "a"
    target.write_text("now exists")  # link resolves; marker clears
    os.utime(str(d), ns=(dir_st.st_atime_ns, dir_st.st_mtime_ns))
    assert memo_per_path(spark, "k", str(d), lambda: "b") == "b"
