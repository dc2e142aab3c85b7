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


@query(
    "set_union_by_name",
    oracle="""
    -- schema-tolerant union: the sides carry different column sets;
    -- missing columns fill with NULL (unionByName allowMissingColumns)
    SELECT e.event_id AS id, e.value AS amount, e.event_type AS kind,
           NULL::VARCHAR AS priority
    FROM events e WHERE e.event_type = 'purchase' AND e.event_id % 50 = 0
    UNION ALL
    SELECT o.o_orderkey AS id, o.o_totalprice AS amount,
           NULL::VARCHAR AS kind, o.o_orderpriority AS priority
    FROM orders o WHERE o.o_orderkey % 500 = 0
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT schema-tolerant union (``unionByName`` with
    allowMissingColumns): the ingestion primitive for merging sources
    whose schemas drifted — columns align by NAME, absent ones become
    NULL, no positional surprises. The reference's multi-dataset
    configs (main.py:74-92) imply exactly this shape once Landsat and
    Sentinel rows carry different metadata columns."""
    ev = read_table(spark, sf_dir, "events")
    purchases = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("event_id") % 50 == 0))
        .select(
            F.col("event_id").alias("id"),
            F.col("value").alias("amount"),
            F.col("event_type").alias("kind"),
        )
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 500 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    return purchases.unionByName(orders, allowMissingColumns=True)
