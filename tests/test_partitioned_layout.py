"""Partitioned parquet layout: a date filter over a
``partitionBy(date)`` table must prune partitions AT PLANNING TIME —
the physical proof of the 100 TB incremental-scan claim in
sinks.write_partitioned_parquet (the engine's analog of the
reference's per-capture-date incremental unit)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

SCRATCH = "/root/repo/.scratch/test_partitioned"


@pytest.fixture(scope="module")
def partitioned_events(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.sinks import write_partitioned_parquet

    shutil.rmtree(SCRATCH, ignore_errors=True)
    events = read_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned_parquet(events, SCRATCH, ["event_date"])
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_date_filter_prunes_partitions(spark, partitioned_events):
    dates = [
        d["event_date"]
        for d in spark.read.parquet(partitioned_events)
        .select("event_date")
        .distinct()
        .collect()
    ]
    assert len(dates) > 1, "fixture spans one day; pruning test is vacuous"
    target = sorted(dates)[0]

    q = spark.read.parquet(partitioned_events).filter(
        F.col("event_date") == F.lit(target)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the date predicate must appear as a PartitionFilter on the scan,
    # not a post-scan Filter over all partitions
    assert "PartitionFilters: [" in plan
    start = plan.index("PartitionFilters: [")
    assert "event_date" in plan[start : start + 200], plan[start : start + 200]

    # and the pruned read returns exactly that day's rows (checked
    # against the UNpartitioned source, not the partitioned copy)
    from lake_satellite_image_etl_spark.io import read_table

    expected = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F.to_date("ts") == F.lit(target))
        .count()
    )
    assert q.count() == expected > 0


def test_partitioned_roundtrip_preserves_rows(spark, partitioned_events):
    from lake_satellite_image_etl_spark.io import read_table

    n_src = read_table(spark, SF_SMOKE, "events").count()
    n_landed = spark.read.parquet(partitioned_events).count()
    assert n_landed == n_src
