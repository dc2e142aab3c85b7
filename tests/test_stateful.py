"""applyInPandasWithState sessionization: the AvailableNow streaming
run must produce the same per-user session counts as the batch
window_session plan (same 30-minute gap rule)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SCRATCH = "/root/repo/.scratch/test_stateful"


@pytest.fixture(autouse=True)
def _clean():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_stateful_sessionize_matches_batch(spark):
    from lake_satellite_image_etl_spark.operators.windows import window_session
    from lake_satellite_image_etl_spark.streaming.ingest import (
        read_events_stream,
    )
    from lake_satellite_image_etl_spark.streaming.stateful import (
        sessionize_stateful,
    )

    src = os.path.join(SCRATCH, "src")
    os.makedirs(src, exist_ok=True)
    os.symlink(
        os.path.join(SF_SMOKE, "events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    ckpt = os.path.join(SCRATCH, "ckpt")

    stream = sessionize_stateful(
        read_events_stream(spark, src).select("user_id", "ts")
    )
    # update-mode operator → update-capable sink (memory table)
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_sessions")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode emits one row per user per micro-batch; AvailableNow
    # on a single source file = one batch → final totals directly
    streamed = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in spark.sql("SELECT * FROM stateful_sessions").collect()
    }
    assert streamed

    batch = (
        window_session(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_sessions"),
        )
    )
    expected = {
        r["user_id"]: (r["n_events"], r["n_sessions"]) for r in batch.collect()
    }
    assert streamed == expected


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the fold."""

    def __init__(self):
        self.exists = False
        self._value = None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = value
        self.exists = True


def test_sessionize_group_chunk_order_invariant():
    """Spark may hand one group to the UDF as several Arrow chunks in
    arbitrary order; the fold must sort the WHOLE group, not each chunk
    independently (per-chunk sort inflates the session count when a
    later chunk carries earlier timestamps)."""
    import pandas as pd

    from lake_satellite_image_etl_spark.streaming.stateful import (
        _sessionize_group,
    )

    base = pd.Timestamp("2024-06-01 12:00:00")
    # one true session: events 1 min apart — but split across chunks
    # so that chunk 2 is entirely EARLIER than chunk 1
    late = pd.DataFrame({"ts": [base + pd.Timedelta(minutes=m) for m in (3, 4, 5)]})
    early = pd.DataFrame({"ts": [base + pd.Timedelta(minutes=m) for m in (0, 1, 2)]})

    state = _FakeState()
    out = list(_sessionize_group((7,), iter([late, early]), state))
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["user_id"], row["n_events"], row["n_sessions"]) == (7, 6, 1)

    # a second micro-batch 45 min later opens exactly one new session
    later = pd.DataFrame({"ts": [base + pd.Timedelta(minutes=50)]})
    out2 = list(_sessionize_group((7,), iter([later]), state))
    row2 = out2[0].iloc[0]
    assert (row2["n_events"], row2["n_sessions"]) == (7, 2)


def test_state_partition_scope_restores(spark):
    """The scope must restore the session's shuffle width on exit and
    on error — a leaked low setting would silently narrow every batch
    shuffle that follows the streaming drain."""
    from lake_satellite_image_etl_spark.streaming.ingest import (
        state_partition_scope,
    )

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with state_partition_scope(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before

    with pytest.raises(RuntimeError):
        with state_partition_scope(spark, 3):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before

    # n=None leaves the session untouched (no set/restore churn)
    with state_partition_scope(spark, None):
        assert spark.conf.get(key) == before
