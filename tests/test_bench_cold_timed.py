"""Pin of the r17 bench-integrity fix (VERDICT r16 item 1): the warm
``limit(1)`` pass's caches are released before the timed noop run, so
a ``persist_bounded`` subtree is COLD at t0 of the timed region and
the bench charges persist-based optimizations their true cost (one
computation) instead of zero (reading the warm pass's cache)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def bench_query(monkeypatch, spark):
    import __spark_entry__ as entrymod

    from lake_satellite_image_etl_spark.caching import persist_bounded
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def bump(x):
        acc.add(1)
        return x

    def q(spark_, sf_dir):
        # single input partition: the warm pass's aggregate computes
        # (and caches) the WHOLE persisted subtree, so the timed
        # run's recomputation is unambiguous in the accumulator
        base = spark_.range(0, 50, 1, 1).select(bump("id").alias("v"))
        shared = persist_bounded(base)
        return shared.select(F.sum("v").alias("s"))

    monkeypatch.setattr(entrymod, "queries", lambda: {"t_cold": q})
    return acc


def test_persisted_subtree_is_cold_at_t0(bench_query, capsys):
    import bench

    acc = bench_query
    bench.run_batch(["t_cold"])
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["queries"]["t_cold"] == payload["queries"]["t_cold"]
    # warm pass computed the 50-row subtree once; if the timed run
    # had read the warm cache the count would stay at 50 — the
    # between-pass release forces a second full computation
    assert acc.value >= 100, (
        f"timed region read the warm pass's cache (bumps={acc.value})"
    )
