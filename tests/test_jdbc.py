"""S1/S2 JDBC source round-trip against embedded Apache Derby (the
only DB engine in this environment — ships with Spark).

Covers the reference's Postgres read path (main.py:467-486): a real
``spark.read.format("jdbc")`` scan, a pushed-down SQL subquery, and
the partitioned parallel read that replaces the reference's single
``pd.read_sql`` into driver memory."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

DB_DIR = "/root/repo/.scratch/derbydb"
URL = f"jdbc:derby:{DB_DIR};create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_nation(spark):
    shutil.rmtree(DB_DIR, ignore_errors=True)
    os.makedirs(os.path.dirname(DB_DIR), exist_ok=True)
    from lake_satellite_image_etl_spark.io import read_table

    nation = read_table(spark, SF_SMOKE, "nation")
    (
        nation.write.format("jdbc")
        .option("url", URL)
        .option("dbtable", "nation")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    yield nation
    shutil.rmtree(DB_DIR, ignore_errors=True)


def test_jdbc_table_scan_roundtrip(spark, jdbc_nation):
    from lake_satellite_image_etl_spark.io import read_jdbc

    got = read_jdbc(spark, URL, "nation", driver=DRIVER)
    assert got.count() == jdbc_nation.count()
    assert sorted(c.lower() for c in got.columns) == sorted(
        c.lower() for c in jdbc_nation.columns
    )
    key = next(c for c in got.columns if c.lower() == "n_nationkey")
    assert {r[key] for r in got.collect()} == {
        r["n_nationkey"] for r in jdbc_nation.collect()
    }


def test_jdbc_pushed_down_query(spark, jdbc_nation):
    """S2: the whole subquery executes server-side (the reference's
    CTE-to-Postgres pattern)."""
    from lake_satellite_image_etl_spark.io import read_jdbc

    # Spark's JDBC writer creates quoted (case-exact) identifiers, so
    # the hand-authored server-side SQL must quote them too.
    got = read_jdbc(
        spark,
        URL,
        'SELECT "n_regionkey", COUNT(*) AS n FROM nation GROUP BY "n_regionkey"',
        is_query=True,
        driver=DRIVER,
    )
    exp = (
        jdbc_nation.groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_jdbc_partitioned_parallel_read(spark, jdbc_nation):
    """The distributed replacement for the reference's single-threaded
    pd.read_sql: bounds split the scan into parallel range queries."""
    from lake_satellite_image_etl_spark.io import read_jdbc

    got = read_jdbc(
        spark,
        URL,
        "nation",
        partition_column="n_nationkey",
        lower_bound=0,
        upper_bound=25,
        num_partitions=4,
        driver=DRIVER,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == jdbc_nation.count()


def test_jdbc_filter_pushdown_in_plan(spark, jdbc_nation):
    from lake_satellite_image_etl_spark.io import read_jdbc

    base = read_jdbc(spark, URL, "nation", driver=DRIVER)
    key = next(c for c in base.columns if c.lower() == "n_regionkey")
    df = base.filter(F.col(key) == 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "regionkey" in plan.lower()
