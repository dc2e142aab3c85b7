"""Count-min sketch invariants beyond the oracle gate."""

from __future__ import annotations

from tests.conftest import SF_ORACLE


def test_cms_never_underestimates_and_is_tight_for_some_key(spark):
    from lake_satellite_image_etl_spark.operators.sketches import (
        sketch_count_min,
    )

    rows = sketch_count_min(spark, SF_ORACLE).collect()
    assert rows
    assert all(r["overcount"] >= 0 for r in rows), "CMS underestimated"
    # with d=4 rows, at least some keys should estimate exactly
    assert any(r["overcount"] == 0 for r in rows)
