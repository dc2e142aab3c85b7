"""Idempotency / sink / streaming tests (SURVEY.md §5 items 3-4):
- K1 run-twice property: second append writes 0 rows.
- K2 artifact round-trip: blobs come back bit-identical under their
  deterministic keys.
- T1 streaming AvailableNow ingest: PK set equals the batch
  dedup_primary_key PK set, and a re-run appends nothing.
- approx_count_distinct within 5% of exact (promised by
  operators/aggregates.py docstring).
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE

SCRATCH = "/root/repo/.scratch/test_sinks"


@pytest.fixture(autouse=True)
def _clean_scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_idempotent_append_run_twice(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.sinks import write_idempotent_append

    target = os.path.join(SCRATCH, "target.parquet")
    ev = read_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    pk = ["user_id", "event_type"]
    n_first = write_idempotent_append(spark, ev, target, pk)
    assert n_first > 0
    # PK-uniqueness of what landed
    landed = spark.read.parquet(target)
    assert landed.count() == landed.select(*pk).distinct().count() == n_first
    # run twice → nothing new
    n_second = write_idempotent_append(spark, ev, target, pk)
    assert n_second == 0
    assert spark.read.parquet(target).count() == n_first


def test_pipeline_records_idempotent_sink(spark):
    """The reference's end state: per-image records upserted with
    ON CONFLICT DO NOTHING on PK (waterbody_id, captured_ts)
    (main.py:106-107,453-457). Composed pipeline → idempotent append;
    the second run writes nothing."""
    from lake_satellite_image_etl_spark.plans.pipeline import (
        pipeline_image_records,
    )
    from lake_satellite_image_etl_spark.sinks import write_idempotent_append

    target = os.path.join(SCRATCH, "image_records.parquet")
    records = pipeline_image_records(spark, SF_SMOKE)
    pk = ["waterbody_id", "captured_ts"]
    n1 = write_idempotent_append(spark, records, target, pk)
    assert n1 == 25  # one PK per entity (configs share captured_ts)
    assert write_idempotent_append(spark, records, target, pk) == 0
    landed = spark.read.parquet(target)
    assert landed.count() == 25
    assert set(landed.columns) >= {
        "waterbody_id", "captured_ts", "ee_id", "filename",
        "red_average", "white_fraction",
    }


def test_binary_artifact_sink_roundtrip(spark):
    from lake_satellite_image_etl_spark.multimodal.images import (
        decode_fimg,
        synth_fimg,
        with_images,
    )
    from lake_satellite_image_etl_spark.sinks import write_binary_artifacts

    out = os.path.join(SCRATCH, "artifacts")
    imgs = with_images(spark, SF_SMOKE).limit(10).select(
        "entity_id",
        F.concat(
            F.col("entity_id").cast("string"), F.lit("/img_"),
            F.col("entity_id").cast("string"), F.lit(".fimg"),
        ).alias("key"),
        "image",
    )
    n = write_binary_artifacts(imgs, out, "key", "image")
    assert n == 10
    written = sorted(glob.glob(os.path.join(out, "*", "*.fimg")))
    assert len(written) == 10
    # bit-identical round trip for one known entity
    some = written[0]
    eid = int(os.path.basename(os.path.dirname(some)))
    with open(some, "rb") as f:
        assert f.read() == synth_fimg(eid)
    assert decode_fimg(synth_fimg(eid)).shape == (3, 12, 12)


def test_streaming_available_now_matches_batch(spark):
    from lake_satellite_image_etl_spark.operators.incremental import (
        dedup_primary_key,
    )
    from lake_satellite_image_etl_spark.streaming.ingest import (
        PK,
        run_available_now,
    )

    # the file streaming source wants a *directory* — stage the fixture
    src = os.path.join(SCRATCH, "stream_src")
    os.makedirs(src, exist_ok=True)
    os.symlink(
        os.path.join(SF_SMOKE, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    out = os.path.join(SCRATCH, "stream_out")
    ckpt = os.path.join(SCRATCH, "ckpt")
    run_available_now(spark, src, out, ckpt)

    streamed = spark.read.parquet(out)
    batch = dedup_primary_key(spark, SF_SMOKE)
    # one row per PK, PK sets identical (streaming keeps an arbitrary
    # first-arrival row; batch keeps the earliest — values may differ)
    assert streamed.count() == batch.count()
    s_keys = {tuple(r) for r in streamed.select(*PK).collect()}
    b_keys = {tuple(r) for r in batch.select(*PK).collect()}
    assert s_keys == b_keys
    # re-run: checkpointed offsets → no new files, no new rows
    run_available_now(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == len(s_keys)


def test_stream_upsert_foreachbatch(spark):
    """foreachBatch idempotent upsert: streaming run lands one row per
    PK; re-running (new checkpoint, same data) appends nothing because
    the TARGET is the seen-set."""
    from lake_satellite_image_etl_spark.streaming.ingest import (
        PK,
        run_stream_upsert,
    )

    src = os.path.join(SCRATCH, "upsert_src")
    os.makedirs(src, exist_ok=True)
    os.symlink(
        os.path.join(SF_SMOKE, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    target = os.path.join(SCRATCH, "upsert_target")
    run_stream_upsert(spark, src, target, os.path.join(SCRATCH, "up_ckpt1"))
    landed = spark.read.parquet(target)
    n_pk = landed.select(*PK).distinct().count()
    assert landed.count() == n_pk > 0
    # fresh checkpoint → source re-reads everything; target dedups
    run_stream_upsert(spark, src, target, os.path.join(SCRATCH, "up_ckpt2"))
    assert spark.read.parquet(target).count() == n_pk


def test_streaming_windowed_agg_matches_batch(spark):
    """Streaming tumbling-window counts (watermark-closed windows) must
    equal the batch window_tumbling counts for the same buckets —
    F.window buckets identically in both modes."""
    from lake_satellite_image_etl_spark.operators.windows import window_tumbling
    from lake_satellite_image_etl_spark.streaming.ingest import (
        run_windowed_counts_available_now,
    )

    src = os.path.join(SCRATCH, "wstream_src")
    os.makedirs(src, exist_ok=True)
    os.symlink(
        os.path.join(SF_SMOKE, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    out = os.path.join(SCRATCH, "wstream_out")
    ckpt = os.path.join(SCRATCH, "wckpt")
    run_windowed_counts_available_now(spark, src, out, ckpt)

    streamed = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert streamed  # the watermark must have closed some windows
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in window_tumbling(spark, SF_SMOKE).collect()
    }
    for k, n in streamed.items():
        assert batch[k] == n, k


def test_approx_distinct_within_5pct(spark):
    from lake_satellite_image_etl_spark.io import read_table

    li = read_table(spark, SF_ORACLE, "lineitem")
    got = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    )
    for r in got.collect():
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.05


def test_streaming_two_tranches_watermark_eviction(spark):
    """VERDICT r6 item 8 — multi-micro-batch watermark lifecycle
    across two AvailableNow drains of the SAME checkpoint:

    run 1 (tranche 1): A(00:00) and B(10:00) both emit; the
    checkpointed watermark advances to 10:00 − 1h = 09:00, which is
    already past A's state expiry (00:00 + 1h) — A's dedup state is
    FREED, B's lives until 11:00.

    run 2 (tranche 2): a duplicate of A at 08:00 is LATE (< 09:00
    watermark) and is dropped; a duplicate of A at 09:30 re-emits
    (state was evicted — the lookback re-entry contract,
    main.py:45-46); a duplicate of B at 10:30 is still suppressed
    (state live); a fresh C at 12:00 emits."""
    from pyspark.sql import types as T

    from lake_satellite_image_etl_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        run_available_now,
    )

    src = os.path.join(SCRATCH, "tranche_src")
    out = os.path.join(SCRATCH, "tranche_out")
    ckpt = os.path.join(SCRATCH, "tranche_ckpt")
    os.makedirs(src, exist_ok=True)

    def stage(name, rows):
        tmp = os.path.join(SCRATCH, f"tmp_{name}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    from datetime import datetime

    d = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    stage(
        "t1",
        [
            (1, d(0), 1, "x", 1.0, "{}"),   # A
            (2, d(10), 2, "y", 1.0, "{}"),  # B
        ],
    )
    run_available_now(spark, src, out, ckpt, lookback="1 hour")
    first = spark.read.parquet(out)
    assert first.count() == 2

    stage(
        "t2",
        [
            (3, d(8), 1, "x", 2.0, "{}"),      # A dup, LATE -> dropped
            (4, d(9, 30), 1, "x", 3.0, "{}"),  # A dup, state evicted -> emits
            (5, d(10, 30), 2, "y", 2.0, "{}"), # B dup, state live -> suppressed
            (6, d(12), 3, "z", 1.0, "{}"),     # C fresh -> emits
        ],
    )
    run_available_now(spark, src, out, ckpt, lookback="1 hour")
    rows = {
        (r.user_id, r.event_type, r.ts)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, "x", d(0)) in rows and (2, "y", d(10)) in rows  # run 1
    assert (1, "x", d(9, 30)) in rows, "evicted key failed to re-enter"
    assert (3, "z", d(12)) in rows
    assert (1, "x", d(8)) not in rows, "late row not dropped"
    assert (2, "y", d(10, 30)) not in rows, "live dedup state lost"
    assert len(rows) == 4


def test_scd2_intervals(spark):
    """SCD2 invariants per user: contiguous versions, chained
    [valid_from, valid_to) intervals, exactly one open row, no
    consecutive equal states, and the intervals reconstruct the raw
    changelog's state at every event timestamp."""
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.incremental import (
        scd2_event_state,
    )
    from tests.conftest import SF_ORACLE

    rows = scd2_event_state(spark, SF_ORACLE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for lst in by_user.values():
        lst.sort(key=lambda r: r["version"])
        assert [r["version"] for r in lst] == list(range(1, len(lst) + 1))
        assert sum(r["is_current"] for r in lst) == 1 and lst[-1]["is_current"]
        for a, b in zip(lst, lst[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["state"] != b["state"]
        assert all(
            r["valid_to"] is None or r["valid_from"] < r["valid_to"]
            for r in lst
        )

    ev = read_table(spark, SF_ORACLE, "events").collect()
    # state at an event's ts = the interval containing it (half-open,
    # ties on ts broken by event_id exactly as the operator orders)
    ev_sorted: dict[int, list] = {}
    for e in ev:
        ev_sorted.setdefault(e["user_id"], []).append(e)
    for uid, evs in ev_sorted.items():
        evs.sort(key=lambda e: (e["ts"], e["event_id"]))
        final_state = evs[-1]["event_type"]
        assert by_user[uid][-1]["state"] == final_state


def test_stream_stream_join_two_tranches_eviction(spark):
    """Stream-stream join state lifecycle across two AvailableNow
    drains of the same checkpoint (1-hour watermark, 1-hour
    attribution window):

    tranche 1: click C1@00:00 + purchase P1@00:30 match; click
    C2@06:00 + purchase P2@06:10 match. The checkpointed global
    watermark advances to 05:00 (min over both sources) — past C1's
    evictability bound (00:00 + window + watermark), so C1's buffered
    state is FREED; C2's is live.

    tranche 2: purchase P3@00:45 would match C1 in batch but is late
    (< watermark) with the matching click evicted — NO match may
    emit; purchase P4@06:30 still matches the live C2."""
    from datetime import datetime

    from lake_satellite_image_etl_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        run_stream_stream_join_available_now,
    )

    src = os.path.join(SCRATCH, "ssj_src")
    out = os.path.join(SCRATCH, "ssj_out")
    ckpt = os.path.join(SCRATCH, "ssj_ckpt")
    os.makedirs(src, exist_ok=True)

    def stage(name, rows):
        tmp = os.path.join(SCRATCH, f"ssj_tmp_{name}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    d = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    stage(
        "t1",
        [
            (1, d(0), 1, "click", 1.0, "{}"),      # C1
            (2, d(0, 30), 1, "purchase", 1.0, "{}"),  # P1 -> (C1,P1)
            (3, d(6), 2, "click", 1.0, "{}"),      # C2
            (4, d(6, 10), 2, "purchase", 1.0, "{}"),  # P2 -> (C2,P2)
        ],
    )
    run_stream_stream_join_available_now(
        spark, src, out, ckpt, watermark="1 hour"
    )
    first = {
        (r.click_id, r.purchase_id) for r in spark.read.parquet(out).collect()
    }
    assert first == {(1, 2), (3, 4)}

    stage(
        "t2",
        [
            (5, d(0, 45), 1, "purchase", 2.0, "{}"),  # late + C1 evicted
            (6, d(6, 30), 2, "purchase", 2.0, "{}"),  # matches live C2
        ],
    )
    run_stream_stream_join_available_now(
        spark, src, out, ckpt, watermark="1 hour"
    )
    rows = {
        (r.click_id, r.purchase_id) for r in spark.read.parquet(out).collect()
    }
    assert (3, 6) in rows, "live click state lost across micro-batches"
    assert (1, 5) not in rows, "evicted/late purchase still matched"
    assert rows == {(1, 2), (3, 4), (3, 6)}


def test_stream_cdc_tombstone_survives_late_upsert(spark):
    """CDC-merge tombstone lifecycle across two checkpointed
    AvailableNow runs: a key deleted in run 1 must NOT be resurrected
    by an out-of-order OLDER upsert arriving in run 2 (the tombstone
    is part of the snapshot, so the merge stays order-independent),
    while a genuinely newer upsert does update its key."""
    from datetime import datetime

    from lake_satellite_image_etl_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        run_stream_cdc,
    )

    src = os.path.join(SCRATCH, "cdc_src")
    snap = os.path.join(SCRATCH, "cdc_snap")
    ckpt = os.path.join(SCRATCH, "cdc_ckpt")
    os.makedirs(src, exist_ok=True)

    def stage(name, rows):
        tmp = os.path.join(SCRATCH, f"cdc_tmp_{name}")
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src, f"{name}.parquet"))

    d = lambda h: datetime(2024, 1, 1, h)  # noqa: E731
    # run 1: key 1 created then DELETED; key 2 created
    stage(
        "t1",
        [
            (1, d(0), 1, "signup", 1.0, "{}"),
            (2, d(2), 1, "error", 0.0, "{}"),   # delete key 1 @ 02:00
            (3, d(1), 2, "signup", 2.0, "{}"),
        ],
    )
    v1 = run_stream_cdc(spark, src, snap, ckpt)
    snap1 = {r["user_id"]: r for r in spark.read.parquet(v1).collect()}
    assert snap1[1]["event_type"] == "error", "tombstone missing from snapshot"
    assert snap1[2]["event_type"] == "signup"

    # run 2 (same checkpoint — only the new file is read): key 1 gets
    # an upsert OLDER than its delete; key 2 a genuinely newer update;
    # key 3 is fresh
    stage(
        "t2",
        [
            (4, d(1), 1, "view", 9.0, "{}"),    # late upsert, ts < delete
            (5, d(3), 2, "view", 3.0, "{}"),
            (6, d(0), 3, "signup", 4.0, "{}"),
        ],
    )
    v2 = run_stream_cdc(spark, src, snap, ckpt)
    snap2 = {r["user_id"]: r for r in spark.read.parquet(v2).collect()}
    assert snap2[1]["event_type"] == "error", "delete was resurrected"
    assert snap2[2]["event_type"] == "view" and snap2[2]["value"] == 3.0
    assert snap2[3]["event_type"] == "signup"
    # live view (tombstones filtered) drops key 1
    live = {
        r["user_id"]
        for r in spark.read.parquet(v2)
        .filter(F.col("event_type") != "error")
        .collect()
    }
    assert live == {2, 3}

    # run 3: re-drain the SAME checkpoint with no new source files —
    # the run-twice idempotency property the batch upsert sinks
    # already pin (VERDICT r7 item 8): no new snapshot version may
    # appear and the latest snapshot's content is unchanged.
    before = sorted(glob.glob(os.path.join(snap, "v=*")))
    v3 = run_stream_cdc(spark, src, snap, ckpt)
    after = sorted(glob.glob(os.path.join(snap, "v=*")))
    assert after == before, "re-drain created a new snapshot version"
    assert v3 == v2
    snap3 = {r["user_id"]: r for r in spark.read.parquet(v3).collect()}
    assert snap3 == snap2
