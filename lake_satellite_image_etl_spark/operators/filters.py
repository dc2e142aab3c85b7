"""Projections, filters, predicates (SURVEY.md §2.3, P1-P10).

Every predicate here is a native Column expression, so Catalyst pushes
it into the parquet scan (``PushedFilters`` in ``.explain``) — the
distributed analog of the reference pushing its WHERE clause into
Postgres (main.py:471,482) and its spatial/temporal/metadata predicates
into the Earth Engine server (main.py:397-404).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query


@query(
    "project_rename",
    oracle="""
    SELECT p_partkey AS part_id, p_name AS name, p_brand AS brand,
           p_retailprice AS price
    FROM part WHERE p_size BETWEEN 10 AND 30
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: explicit projection with rename (band select analog).

    Reference selects 3 of ~12 bands and renames them to color names
    (main.py:399, main.py:150-153); the column pruning reaches the scan.
    """
    part = read_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size").between(10, 30)).select(
        F.col("p_partkey").alias("part_id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_retailprice").alias("price"),
    )


@query(
    "filter_range_numeric",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity < 25 AND l_extendedprice BETWEEN 1000 AND 20000
    """,
)
def filter_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: numeric range filter (areasqkm < 900 analog, main.py:482)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 25)
        & F.col("l_extendedprice").between(1000.0, 20000.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_temporal_interval",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    """,
)
def filter_temporal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+P5: half-open temporal interval (filterDate analog, main.py:398)."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


@query(
    "filter_spatial_bbox",
    oracle="""
    SELECT e1.event_id, e1.user_id, e1.value
    FROM events e1
    WHERE e1.value BETWEEN 10.0 AND 50.0
      AND e1.user_id BETWEEN 100 AND 400
    """,
)
def filter_spatial_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 (bbox form): spatial containment as conjunctive comparisons.

    The reference's filterBounds(point) (main.py:397) reduces to plain
    min/max comparisons once footprints carry bbox columns — fully
    Catalyst-pushable; the exact polygon test runs later as a UDF on
    the tiny bbox-prefiltered set (SURVEY.md §4).
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").between(10.0, 50.0) & F.col("user_id").between(100, 400)
    ).select("event_id", "user_id", "value")


@query(
    "filter_metadata_threshold",
    oracle="""
    SELECT event_id, event_type, value FROM events
    WHERE event_type = 'error' AND value < 20
    """,
)
def filter_metadata_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: conditionally-applied metadata threshold
    (CLOUDY_PIXEL_PERCENTAGE < 20 analog, main.py:85,403-404)."""
    ev = read_table(spark, sf_dir, "events")
    return _with_optional_threshold(ev, 20.0).select(
        "event_id", "event_type", "value"
    )


def _with_optional_threshold(df: DataFrame, threshold: float | None) -> DataFrame:
    """The reference applies the cloud filter only when configured
    (main.py:403-404); the optional-predicate pattern is a plan-time
    branch, not a runtime CASE."""
    df = df.filter(F.col("event_type") == "error")
    if threshold is not None:
        df = df.filter(F.col("value") < threshold)
    return df


@query(
    "filter_membership_array",
    oracle="""
    WITH seen AS (
        SELECT user_id, list_sort(array_agg(DISTINCT event_id)) AS seen_ids
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id
    FROM events e JOIN seen s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND NOT list_contains(s.seen_ids, e.event_id - 1)
    """,
)
def filter_membership_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (array form): per-row membership anti-predicate.

    Mirrors the reference literally: it carries ARRAY_AGG(ee_id) per
    water body and skips images already in the array (main.py:469,415).
    The relational form (left-anti join) in incremental.py is what you
    want at scale — this array form exists for parity.
    """
    ev = read_table(spark, sf_dir, "events")
    seen = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_id")).alias("seen_ids"))
    )
    return (
        ev.filter(F.col("event_type") == "click")
        .join(seen, "user_id")
        .filter(~F.array_contains(F.col("seen_ids"), F.col("event_id") - 1))
        .select("event_id", "user_id")
    )


@query(
    "filter_pixel_predicates",
    oracle="""
    WITH px AS (
        SELECT l_orderkey AS image_id, l_linenumber AS pix,
               (CASE WHEN l_quantity < 2 THEN 0
                     ELSE 140 + (l_partkey % 60) END)::INT AS red,
               (CASE WHEN l_quantity < 2 THEN 0
                     ELSE 140 + (l_suppkey % 60) END)::INT AS green,
               (CASE WHEN l_quantity < 2 THEN 0
                     ELSE 140 + ((l_partkey + l_suppkey) % 60) END)::INT AS blue
        FROM lineitem
    )
    SELECT image_id, pix, red, green, blue
    FROM px
    WHERE NOT (red = 0 AND green = 0 AND blue = 0)
      AND least(red, green, blue) >= 153
      AND greatest(red, green, blue) - least(red, green, blue) <= 25
    """,
)
def filter_pixel_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9+P10: nodata mask + compound per-pixel "white" predicate.

    Exact semantics of main.py:276-277 with the int-truncated
    thresholds int(0.6*255)=153 and int(0.1*255)=25, on the long pixel
    form. Pixels are derived deterministically from lineitem keys so
    the oracle sees the same table: low-quantity rows become nodata
    (0,0,0) pixels — excluded by P9 — and the rest land in [140,200),
    so a real fraction satisfies the white predicate (P10). Both
    branches of the predicate are exercised (non-vacuous; asserted in
    tests/test_oracle_gate.py).
    """
    li = read_table(spark, sf_dir, "lineitem")
    nodata_row = F.col("l_quantity") < 2

    def chan(expr: F.Column) -> F.Column:
        return F.when(nodata_row, 0).otherwise(140 + (expr % 60)).cast("int")

    px = li.select(
        F.col("l_orderkey").alias("image_id"),
        F.col("l_linenumber").alias("pix"),
        chan(F.col("l_partkey")).alias("red"),
        chan(F.col("l_suppkey")).alias("green"),
        chan(F.col("l_partkey") + F.col("l_suppkey")).alias("blue"),
    )
    nodata = (F.col("red") == 0) & (F.col("green") == 0) & (F.col("blue") == 0)
    lo = F.least("red", "green", "blue")
    hi = F.greatest("red", "green", "blue")
    return px.filter(~nodata & (lo >= 153) & ((hi - lo) <= 25))
