"""Graph operators — weighted PageRank over a relationally-built
graph, the iterative-computation pattern (join per superstep) that
complements dedup.py's label-propagation connected components.

Exactness rule: ranks are SCALED INTEGERS and every transition is
integer arithmetic (floor division), so eight supersteps produce
bit-identical results on any engine and any partitioning — float
PageRank would accumulate summation-order noise across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

PR_SCALE = 10**12
PR_ITERS = 8
#: damping in exact percent units: d = 85/100
PR_D_NUM = 85

#: the trade graph: customer nation → supplier nation, one edge per
#: lineitem (weight = co-occurrence count)
_SQL_EDGES = """
    SELECT c.c_nationkey AS u, s.s_nationkey AS v, count(*) AS w
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
"""


def _sql_pagerank() -> str:
    n_nodes = "(SELECT count(*) FROM nation)"
    teleport = f"((100 - {PR_D_NUM}) * {PR_SCALE}) // (100 * {n_nodes})"
    ctes = [
        f"edges AS ({_SQL_EDGES})",
        "outw AS (SELECT u, sum(w) AS wu FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT n_nationkey AS node, "
        f"{PR_SCALE} // {n_nodes} AS r FROM nation)",
    ]
    for i in range(PR_ITERS):
        ctes.append(
            f"""pr{i + 1} AS (
        SELECT nd.n_nationkey AS node,
               ({teleport} + ({PR_D_NUM} * COALESCE(s.c, 0)) // 100)::BIGINT
                   AS r
        FROM nation nd LEFT JOIN (
            SELECT e.v, sum((p.r * e.w) // o.wu) AS c
            FROM pr{i} p
            JOIN edges e ON e.u = p.node
            JOIN outw o ON o.u = p.node
            GROUP BY e.v
        ) s ON s.v = nd.n_nationkey
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, r::BIGINT AS rank_scaled FROM pr{PR_ITERS}"
    )


@query("graph_pagerank", oracle=_sql_pagerank())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank ({PR_ITERS} supersteps, damping 0.85) over
    the customer-nation → supplier-nation trade graph, built
    relationally from the fact tables.

    Plan per superstep: ranks ⋈ edges on the source key, contribution
    = (r·w) // out-weight in exact integers, one aggregate on the
    destination key, right-joined against the node list so sinks keep
    their teleport mass. The edge/out-weight tables are built ONCE
    and checkpointed; each superstep is the canonical Pregel-on-a-
    relational-engine shape — shuffle keyed on node id, per-round
    lineage cut exactly like dedup_cluster_assign's label
    propagation. At 100 TB the edge build dominates (three fact
    joins, all on pre-aggregated keys); supersteps touch only
    |nodes| + |edges| rows."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            cust["c_nationkey"].alias("u"),
            supp["s_nationkey"].alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("u").agg(F.sum("w").alias("wu"))
    ew = edges.join(outw, "u").localCheckpoint(eager=True)

    nodes = nation.select(F.col("n_nationkey").alias("node"))
    n_nodes = nodes.count()
    teleport = ((100 - PR_D_NUM) * PR_SCALE) // (100 * n_nodes)

    ranks = nodes.select("node", F.lit(PR_SCALE // n_nodes).alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            ranks.join(ew, ranks["node"] == ew["u"])
            .select(
                F.col("v"),
                F.expr("(r * w) div wu").alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["v"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({PR_D_NUM} * coalesce(c, 0L)) div 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))
