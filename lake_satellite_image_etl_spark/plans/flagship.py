"""Flagship plan: the reference's outer catalog query (E1), recomposed.

Reference (``/root/reference/src/app/main.py:467-486``) pushes one SQL
string to Postgres::

    WITH already_downloaded_images AS (
        SELECT waterbody_id, ARRAY_AGG(ee_id) AS ee_ids ...
        GROUP BY waterbody_id)                     -- A1
    SELECT ... FROM water_bodies b
    LEFT JOIN water_body_geometries g ON b.id = g.id        -- J1
    LEFT JOIN already_downloaded_images d ON b.id = d.waterbody_id  -- J2
    WHERE b.areasqkm < 900                                   -- P3
    ORDER BY b.areasqkm DESC LIMIT 1100                      -- O1

Here the same shape is a native DataFrame graph over the fixture star
schema (customer ↔ water_bodies, nation ↔ geometries dim, orders ↔
already-downloaded catalog), so Catalyst plans it: the filter reaches
the parquet scan, both left joins broadcast (dim side is small), and
the ORDER BY + LIMIT compiles to TakeOrderedAndProject — no full sort.

Scale notes (100 TB): the grouped side (A1) is the only shuffle; it is
a partial-aggregated ``collect_list`` keyed by the join key, so at
1000 executors it shuffles only (key, list) pairs, and AQE handles key
skew. The dim join stays broadcast at any fact size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table


def flagship(spark: SparkSession, sf_dir: str, *, limit: int = 1100) -> DataFrame:
    """customer ⟕ nation ⟕ (orders grouped to key arrays) → filter → top-k."""
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")

    # A1 — ARRAY_AGG per key (sorted for deterministic output; the
    # reference's array is only consumed as a membership set,
    # main.py:415, so order is semantically free).
    already = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    return (
        customer
        # J1 — dim enrich; tiny right side → broadcast, no shuffle.
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        # J2 — left join against the aggregated seen-set.
        .join(already, customer.c_custkey == already.o_custkey, "left")
        # P3 — numeric range filter (pushed to the customer scan).
        .filter(F.col("c_acctbal") < 9000.0)
        # P1 — explicit projection (column pruning reaches the scans).
        # The key array is serialized to a scalar string at the output
        # boundary: the driver's correctness hasher (pandas sort+hash)
        # cannot factorize list-valued cells. The array-producing plan
        # stays the internal API; only the gate projection flattens.
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            "n_name",
            F.concat_ws(",", F.col("order_keys").cast("array<string>")).alias(
                "order_keys"
            ),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        # O1 — top-k: TakeOrderedAndProject, not a global sort.
        # Secondary key makes the cut deterministic for the oracle.
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(limit)
    )


FLAGSHIP_ORACLE_SQL = """
WITH already AS (
    SELECT o_custkey,
           list_sort(array_agg(o_orderkey)) AS order_keys,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name,
       coalesce(array_to_string(a.order_keys, ','), '') AS order_keys,
       coalesce(a.n_orders, 0) AS n_orders
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN already a ON c.c_custkey = a.o_custkey
WHERE c.c_acctbal < 9000.0
ORDER BY c.c_acctbal DESC, c.c_custkey ASC
LIMIT 1100
"""
