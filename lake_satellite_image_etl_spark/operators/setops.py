"""Set operations (SURVEY.md §2.7).

The reference has none (its only except-like semantics is the J4
anti-join); Spark provides them natively — exposed and oracle-tested
here for completeness of the engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query


def _high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select("c_custkey")


def _automobile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")


@query(
    "set_union",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).union(_automobile(spark, sf_dir)).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).intersect(_automobile(spark, sf_dir))


@query(
    "set_except_all",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).exceptAll(_automobile(spark, sf_dir))
