from __future__ import annotations

from tests.conftest import SF_ORACLE, SF_SMOKE


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "c_custkey" in df.columns and "order_keys" in df.columns


def test_flagship_matches_oracle(spark, duck):
    from lake_satellite_image_etl_spark.plans.flagship import (
        FLAGSHIP_ORACLE_SQL,
        flagship,
    )
    from tools.compare import compare_frames

    res = compare_frames(
        "flagship",
        flagship(spark, SF_ORACLE).toPandas(),
        duck.execute(FLAGSHIP_ORACLE_SQL).fetchdf(),
    )
    assert res.ok, res.detail


def test_flagship_plan_is_scale_sane(spark):
    """The physical plan must broadcast the dim join and use top-k."""
    from lake_satellite_image_etl_spark.plans.flagship import flagship

    plan = flagship(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
