"""Sketch operators — sub-linear summaries for frequency estimation.
Count-min sketch expressed relationally: the sketch IS a (row,
counter) table built by one aggregation, so it shuffles |d × w|
counters instead of |keys|, and estimation is a broadcast join. (HLL
cardinality is covered by agg_approx_distinct; this adds the
frequency-sketch family with an exactly-reproducible construction.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

#: sketch geometry: d independent universal-hash rows × w counters.
#: w = 64 is deliberately TIGHT for the 150-user fixture (εn ≈ 2n/w
#: collisions are visible) so the overestimate behavior is exercised,
#: not vacuous; production sizes w = ⌈e/ε⌉ for target error εn.
CMS_D = 4
CMS_W = 64
CMS_P = 1_000_000_007
CMS_A = (999_983, 492_876_847, 715_225_739, 179_424_673)
CMS_B = (15_485_863, 32_452_843, 49_979_687, 67_867_967)

_SQL_PARAMS = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(zip(CMS_A, CMS_B))
)


@query(
    "sketch_count_min",
    oracle=f"""
    -- count-min sketch of per-user event frequencies: build the
    -- {CMS_D}×{CMS_W} counter table, then estimate every user's count
    -- as min over rows of its counter. CMS never underestimates:
    -- overcount >= 0 by construction (pinned in tests/test_sketches.py).
    WITH params AS (
        SELECT * FROM (VALUES {_SQL_PARAMS}) p(j, a, b)
    ),
    pos AS (
        SELECT e.user_id, p.j,
               ((p.a * e.user_id + p.b) % {CMS_P}) % {CMS_W} AS pos
        FROM events e CROSS JOIN params p
    ),
    sketch AS (SELECT j, pos, count(*) AS cnt FROM pos GROUP BY 1, 2),
    exact AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1),
    probe AS (
        SELECT k.user_id, k.exact_n, p.j,
               ((p.a * k.user_id + p.b) % {CMS_P}) % {CMS_W} AS pos
        FROM exact k CROSS JOIN params p
    )
    SELECT user_id, exact_n,
           min(cnt) AS cms_est,
           min(cnt) - exact_n AS overcount
    FROM probe JOIN sketch USING (j, pos)
    GROUP BY user_id, exact_n
    """,
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the events stream,
    with the exact count alongside so the (always non-negative)
    overestimate is visible — the heavy-hitter building block when
    exact per-key counting is too expensive or the key space is
    unbounded.

    Plan: the build is ONE aggregation whose output is d×w = {CMS_D}×{CMS_W}
    counters — partial aggregation collapses each input partition to
    ≤ d·w rows before the shuffle, so shuffle volume is CONSTANT in
    input size (the whole point of a sketch at 100 TB; contrast the
    exact count's |keys|-sized shuffle, computed here only to exhibit
    the error). Estimation joins the broadcast sketch. Merging shards
    or days = summing counter tables — the sketch is a commutative
    monoid, which is why it distributes."""
    ev = read_table(spark, sf_dir, "events")
    params = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.lit(a).alias("a"),
                F.lit(b).alias("b"),
            )
            for j, (a, b) in enumerate(zip(CMS_A, CMS_B))
        ]
    )
    pos_expr = (
        (F.col("p.a") * F.col("user_id") + F.col("p.b")) % CMS_P
    ) % CMS_W
    pos = ev.select("user_id", F.explode(params).alias("p")).select(
        "user_id", F.col("p.j").alias("j"), pos_expr.alias("pos")
    )
    sketch = pos.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("cnt"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probe = exact.select(
        "user_id", "exact_n", F.explode(params).alias("p")
    ).select("user_id", "exact_n", F.col("p.j").alias("j"), pos_expr.alias("pos"))
    return (
        probe.join(F.broadcast(sketch), ["j", "pos"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )
