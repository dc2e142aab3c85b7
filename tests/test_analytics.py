"""Invariants of the event-analytics operators beyond the oracle gate."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_funnel_monotonic_and_windowed(spark):
    from lake_satellite_image_etl_spark.operators.analytics import (
        FUNNEL_WINDOW_HOURS,
        analytics_window_funnel,
    )

    rows = analytics_window_funnel(spark, SF_ORACLE).collect()
    assert rows
    stages_seen = set()
    for r in rows:
        stages_seen.add(r["stages"])
        # stage k reached iff all earlier stages reached
        assert (r["t3"] is None) or (r["t2"] is not None)
        if r["t2"] is not None:
            assert r["t1"] < r["t2"]
        if r["t3"] is not None:
            assert r["t2"] < r["t3"]
            delta = (r["t3"] - r["t1"]).total_seconds()
            assert delta <= FUNNEL_WINDOW_HOURS * 3600
        expected = 1 + (r["t2"] is not None) + (r["t3"] is not None)
        assert r["stages"] == expected
    assert {1, 2, 3} <= stages_seen, f"degenerate funnel: {stages_seen}"


def test_cohort_day_zero_is_cohort_size(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.analytics import (
        analytics_cohort_retention,
    )

    grid = analytics_cohort_retention(spark, SF_ORACLE).collect()
    assert grid
    day0 = {r["cohort_day"]: r["n_active"] for r in grid if r["day_offset"] == 0}
    # every cohort has a day-0 cell, each member is active on their
    # first day by definition, and later cells never exceed day-0
    sizes: dict = {}
    for r in read_table(spark, SF_ORACLE, "events").groupBy("user_id").agg(
        {"ts": "min"}
    ).collect():
        day = r["min(ts)"].replace(hour=0, minute=0, second=0, microsecond=0)
        sizes[day] = sizes.get(day, 0) + 1
    assert day0 == sizes
    for r in grid:
        assert r["n_active"] <= day0[r["cohort_day"]]
        assert r["day_offset"] >= 0
