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


#: LogLog/HLL geometry: m = 2^LL_P buckets addressed by the low hash
#: bits; the register is the trailing-zero rank of the remaining bits,
#: clamped to LL_RMAX so 2^(LL_RMAX - R) stays an exact BIGINT and the
#: harmonic sum is integer arithmetic end to end.
LL_P = 5
LL_M = 1 << LL_P
LL_RMAX = 30
#: HLL bias constant for m = 32
LL_ALPHA = 0.697


@query(
    "sketch_distinct_loglog",
    oracle=f"""
    -- mergeable distinct-count sketch (HLL shape) with a DETERMINISTIC
    -- cross-engine construction: bucket j = low {LL_P} hash bits,
    -- register R_j = max trailing-zero rank of the remaining bits.
    -- The harmonic denominator sum(2^-R_j) is kept EXACT by scaling:
    -- S = sum(2^({LL_RMAX}-R_j)) is a BIGINT, so the only fp ops are
    -- one correctly-rounded division and the final round — identical
    -- IEEE results on any engine. (agg_approx_distinct covers the
    -- engine-native HLL; this is the reproducible, oracle-checkable
    -- twin.)
    WITH h AS (
        SELECT DISTINCT event_type, user_id,
               ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT
                   AS hv
        FROM events
    ),
    rho AS (
        SELECT event_type, hv % {LL_M} AS j,
               CASE WHEN hv >= {LL_M}
                    THEN least(bit_count(
                             ((hv // {LL_M}) & -(hv // {LL_M})) - 1) + 1,
                         {LL_RMAX})
                    ELSE 0 END AS rho
        FROM h
    ),
    regs AS (
        SELECT event_type, j, max(rho) AS r
        FROM rho GROUP BY 1, 2
    ),
    grid AS (
        SELECT t.event_type, g.j, coalesce(regs.r, 0) AS r
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN range({LL_M}) g(j)
        LEFT JOIN regs ON regs.event_type = t.event_type AND regs.j = g.j
    ),
    sums AS (
        SELECT event_type,
               sum((1::BIGINT << ({LL_RMAX} - r)))::BIGINT AS s,
               max(r) AS max_r
        FROM grid GROUP BY 1
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    )
    SELECT e.event_type, e.n_exact, s.s AS harmonic_scaled, s.max_r,
           round({LL_ALPHA} * {LL_M * LL_M}
                 * {1 << LL_RMAX} / s.s, 4) AS estimate
    FROM exact e JOIN sums s USING (event_type)
    """,
)
def sketch_distinct_loglog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user sketch per event type, HLL-shaped but exactly
    reproducible: md5-derived 60-bit hash, {LL_M} registers of max
    trailing-zero rank, harmonic-mean estimate. The exact distinct
    count rides along so the (bounded) error is visible.

    Why next to ``agg_approx_distinct``: Spark's native HLL sketch is
    engine-internal (rows-only checkable). This one is a SPECIFIED
    sketch — any engine reproduces the identical registers, so shipped
    sketches can be merged across systems and audited. Determinism
    trick: the harmonic sum is computed as the INTEGER
    sum(2^({LL_RMAX}-R_j)), so the only floating-point steps are one
    correctly-rounded IEEE division and the final round.

    Scale shape: the shuffle after partial aggregation is ≤ types × m
    register rows — CONSTANT in input size; merging days/shards is
    max() per register (a commutative monoid), which is the entire
    point of sketching a 100 TB stream. The exact count (computed here
    only to exhibit the error) is the expensive |keys|-shuffle the
    sketch replaces."""
    ev = read_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = ev.select(
        "event_type", "user_id", hv.alias("hv")
    ).distinct()
    w = F.expr(f"hv div {LL_M}")
    rho = (
        F.when(
            F.col("hv") >= LL_M,
            F.least(
                F.bit_count((w.bitwiseAND(-w)) - 1) + 1, F.lit(LL_RMAX)
            ),
        )
        .otherwise(0)
        .cast("int")
    )
    regs = (
        h.select("event_type", (F.col("hv") % LL_M).alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("r"))
    )
    types = ev.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(spark.range(LL_M).select(F.col("id").alias("j"))))
        .join(regs, ["event_type", "j"], "left")
        .select("event_type", "j", F.coalesce("r", F.lit(0)).alias("r"))
    )
    sums = grid.groupBy("event_type").agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {LL_RMAX} - r)"))
        .cast("long")
        .alias("harmonic_scaled"),
        F.max("r").alias("max_r"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return exact.join(sums, "event_type").select(
        "event_type",
        "n_exact",
        "harmonic_scaled",
        "max_r",
        F.round(
            F.lit(LL_ALPHA * LL_M * LL_M)
            * (1 << LL_RMAX)
            / F.col("harmonic_scaled"),
            4,
        ).alias("estimate"),
    )


@query(
    "sketch_loglog_set_ops",
    oracle=f"""
    -- SET OPERATIONS on sketches: for every event-type pair, estimate
    -- |A ∪ B| by MERGING the two LogLog register sets (max per
    -- register — the sketch monoid), and |A ∩ B| by inclusion-
    -- exclusion — all without revisiting the raw stream. Registers
    -- are the same deterministic construction as
    -- sketch_distinct_loglog, so every engine reproduces identical
    -- estimates; exact counts ride along to exhibit the error.
    WITH h AS (
        SELECT DISTINCT event_type, user_id,
               ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT
                   AS hv
        FROM events
    ),
    rho AS (
        SELECT event_type, user_id, hv % {LL_M} AS j,
               CASE WHEN hv >= {LL_M}
                    THEN least(bit_count(
                             ((hv // {LL_M}) & -(hv // {LL_M})) - 1) + 1,
                         {LL_RMAX})
                    ELSE 0 END AS rho
        FROM h
    ),
    regs AS (
        SELECT event_type, j, max(rho) AS r FROM rho GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM events) a
        JOIN (SELECT DISTINCT event_type FROM events) b
          ON a.event_type < b.event_type
    ),
    grid AS (
        SELECT p.type_a, p.type_b, g.j,
               coalesce(ra.r, 0) AS r_a, coalesce(rb.r, 0) AS r_b
        FROM pairs p
        CROSS JOIN range({LL_M}) g(j)
        LEFT JOIN regs ra ON ra.event_type = p.type_a AND ra.j = g.j
        LEFT JOIN regs rb ON rb.event_type = p.type_b AND rb.j = g.j
    ),
    sums AS (
        SELECT type_a, type_b,
               sum((1::BIGINT << ({LL_RMAX} - r_a)))::BIGINT AS s_a,
               sum((1::BIGINT << ({LL_RMAX} - r_b)))::BIGINT AS s_b,
               sum((1::BIGINT << ({LL_RMAX} - greatest(r_a, r_b))))::BIGINT
                   AS s_u
        FROM grid GROUP BY 1, 2
    ),
    exact AS (
        SELECT p.type_a, p.type_b,
               count(DISTINCT i.user_id) AS x
        FROM pairs p
        LEFT JOIN (
            SELECT a.user_id, a.event_type AS ta, b.event_type AS tb
            FROM (SELECT DISTINCT event_type, user_id FROM events) a
            JOIN (SELECT DISTINCT event_type, user_id FROM events) b
              USING (user_id)
        ) i ON i.ta = p.type_a AND i.tb = p.type_b
        GROUP BY 1, 2
    )
    SELECT s.type_a, s.type_b,
           round({LL_ALPHA} * {LL_M * LL_M} * {1 << LL_RMAX}
                 / s.s_u, 4) AS est_union,
           round({LL_ALPHA} * {LL_M * LL_M} * {1 << LL_RMAX} / s.s_a
                 + {LL_ALPHA} * {LL_M * LL_M} * {1 << LL_RMAX} / s.s_b
                 - {LL_ALPHA} * {LL_M * LL_M} * {1 << LL_RMAX} / s.s_u,
                 4) AS est_intersect,
           e.x AS exact_intersect
    FROM sums s JOIN exact e USING (type_a, type_b)
    """,
)
def sketch_loglog_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra ON SKETCHES — the reason mergeable sketches matter:
    per event-type pair, |A ∪ B| from the register-wise max of two
    LogLog sketches and |A ∩ B| by inclusion-exclusion, touching only
    |types| × {LL_M} register rows. The raw stream is read once to
    BUILD the registers; every pairwise question after that is
    constant-time sketch algebra (this is how overlap matrices across
    thousands of segments stay feasible at 100 TB).

    Same deterministic construction as `sketch_distinct_loglog`, so
    the estimates are engine-exact; the exact intersection rides
    along to exhibit the (inclusion-exclusion-amplified) error."""
    ev = read_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = ev.select("event_type", "user_id", hv.alias("hv")).distinct()
    w = F.expr(f"hv div {LL_M}")
    rho = (
        F.when(
            F.col("hv") >= LL_M,
            F.least(F.bit_count((w.bitwiseAND(-w)) - 1) + 1, F.lit(LL_RMAX)),
        )
        .otherwise(0)
        .cast("int")
    )
    regs = (
        h.select("event_type", (F.col("hv") % LL_M).alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("r"))
    )
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    grid = (
        pairs.crossJoin(
            F.broadcast(spark.range(LL_M).select(F.col("id").alias("j")))
        )
        .join(
            F.broadcast(
                regs.select(
                    F.col("event_type").alias("type_a"), "j",
                    F.col("r").alias("r_a"),
                )
            ),
            ["type_a", "j"],
            "left",
        )
        .join(
            F.broadcast(
                regs.select(
                    F.col("event_type").alias("type_b"), "j",
                    F.col("r").alias("r_b"),
                )
            ),
            ["type_b", "j"],
            "left",
        )
        .select(
            "type_a",
            "type_b",
            F.coalesce("r_a", F.lit(0)).alias("r_a"),
            F.coalesce("r_b", F.lit(0)).alias("r_b"),
        )
    )
    pw = lambda c: F.expr(f"shiftleft(cast(1 as bigint), {LL_RMAX} - {c})")  # noqa: E731
    sums = grid.groupBy("type_a", "type_b").agg(
        F.sum(pw("r_a")).cast("long").alias("s_a"),
        F.sum(pw("r_b")).cast("long").alias("s_b"),
        F.sum(pw("greatest(r_a, r_b)")).cast("long").alias("s_u"),
    )
    ut = h.select("event_type", "user_id").distinct()
    inter = (
        ut.select(F.col("event_type").alias("ta"), "user_id")
        .join(
            ut.select(F.col("event_type").alias("tb"), "user_id"),
            "user_id",
        )
        .filter(F.col("ta") < F.col("tb"))
    )
    exact = (
        pairs.join(
            inter,
            (F.col("ta") == F.col("type_a")) & (F.col("tb") == F.col("type_b")),
            "left",
        )
        .groupBy("type_a", "type_b")
        .agg(F.count_distinct("user_id").alias("exact_intersect"))
    )
    c = LL_ALPHA * LL_M * LL_M
    est = lambda s: F.lit(c) * (1 << LL_RMAX) / F.col(s)  # noqa: E731
    return sums.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.round(est("s_u"), 4).alias("est_union"),
        F.round(est("s_a") + est("s_b") - est("s_u"), 4).alias(
            "est_intersect"
        ),
        "exact_intersect",
    )
