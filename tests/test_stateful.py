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
