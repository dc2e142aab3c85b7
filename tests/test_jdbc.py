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


def test_jdbc_upsert_merge_run_twice(spark, jdbc_nation):
    """K1 deployable form (VERDICT r6 item 6): distributed staging
    append + server-side MERGE into Derby — the ON CONFLICT DO
    NOTHING analog (main.py:453-457). First run inserts everything,
    second run (same input) inserts 0; a half-overlapping delta
    inserts only its new keys."""
    from lake_satellite_image_etl_spark.io import read_jdbc
    from lake_satellite_image_etl_spark.sinks import write_jdbc_upsert

    n0 = write_jdbc_upsert(jdbc_nation, URL, "nation_tgt", ["n_nationkey"], driver=DRIVER)
    assert n0 == jdbc_nation.count()
    n1 = write_jdbc_upsert(jdbc_nation, URL, "nation_tgt", ["n_nationkey"], driver=DRIVER)
    assert n1 == 0
    # delta: 20 existing keys + 5 shifted-out keys
    delta = jdbc_nation.withColumn(
        "n_nationkey",
        F.when(F.col("n_nationkey") < 5, F.col("n_nationkey") + 1000).otherwise(
            F.col("n_nationkey")
        ),
    )
    n2 = write_jdbc_upsert(delta, URL, "nation_tgt", ["n_nationkey"], driver=DRIVER)
    assert n2 == 5
    got = read_jdbc(spark, URL, "nation_tgt", driver=DRIVER)
    assert got.count() == jdbc_nation.count() + 5


SQLITE_DB = "/root/repo/.scratch/upsert.sqlite"


def test_dbapi_upsert_foreach_partition_run_twice(spark):
    """The row-batch flavor: foreachPartition + DB-API executemany,
    exercised against stdlib sqlite3 (INSERT OR IGNORE) with real
    multi-partition executor parallelism. The same call with
    psycopg2.connect / ON CONFLICT DO NOTHING is the Postgres
    deployment."""
    import sqlite3

    from lake_satellite_image_etl_spark.sinks import write_dbapi_upsert

    if os.path.exists(SQLITE_DB):
        os.remove(SQLITE_DB)
    os.makedirs(os.path.dirname(SQLITE_DB), exist_ok=True)
    con = sqlite3.connect(SQLITE_DB)
    con.execute("CREATE TABLE tgt (k INTEGER PRIMARY KEY, v TEXT)")
    con.commit()
    con.close()

    df = spark.range(0, 200, 1, 4).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    connect = lambda: sqlite3.connect(SQLITE_DB, timeout=60)  # noqa: E731
    sql = "INSERT OR IGNORE INTO tgt (k, v) VALUES (?, ?)"
    n0 = write_dbapi_upsert(df, connect, sql, ["k", "v"], batch_size=32)
    assert n0 == 200
    n1 = write_dbapi_upsert(df, connect, sql, ["k", "v"], batch_size=32)
    assert n1 == 0
    con = sqlite3.connect(SQLITE_DB)
    assert con.execute("SELECT count(*) FROM tgt").fetchone()[0] == 200
    con.close()
    os.remove(SQLITE_DB)
