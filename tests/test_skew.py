"""Salted-join correctness: result multiset equals the plain join,
and the shuffle key carries the salt (hot keys split across
reducers)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_salted_join_matches_plain_join(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.skew import salted_join

    ev = read_table(spark, SF_SMOKE, "events")
    dim = (
        ev.select("event_type").distinct()
        .withColumn("type_code", F.length("event_type"))
    )
    plain = ev.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("type_code").alias("s")
    )
    salted = salted_join(
        ev, dim, "event_type", row_id="event_id", n_salt=8
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("type_code").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_shuffles_on_salted_key(spark):
    from lake_satellite_image_etl_spark.io import read_table
    from lake_satellite_image_etl_spark.operators.skew import salted_join

    ev = read_table(spark, SF_SMOKE, "events")
    dim = ev.select("event_type").distinct().withColumn("c", F.lit(1))
    joined = salted_join(ev, dim, "event_type", row_id="event_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the partitioning expression must include the salt column
    assert "_salt" in plan
