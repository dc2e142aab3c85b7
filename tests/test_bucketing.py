"""Bucketed co-located join: the join on the bucket key must plan
with ZERO ShuffleExchange — the physical proof of the 100 TB layout
claim in operators/bucketing.py."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.bucketing import write_bucketed

    orders = read_table(spark, SF_SMOKE, "orders")
    lineitem = read_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    from lake_satellite_image_etl_spark.operators.bucketing import bucketed_join

    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.bucketing import bucketed_join

    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "o_orderkey").count()
    orders = read_table(spark, SF_SMOKE, "orders")
    li = read_table(spark, SF_SMOKE, "lineitem")
    exp = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert got == exp
