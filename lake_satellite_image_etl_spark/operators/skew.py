"""Skew mitigation (SURVEY.md §4, build plan phase 5): salted joins
for hot keys.

A shuffled equi-join sends every row of a key to ONE reducer; a hot
key (celebrity user, null-ish default, head-of-zipf token) turns that
reducer into the straggler that bounds the whole stage. Two engine
answers:

1. **AQE skew-join** (on by default in session.py): splits oversized
   partitions at runtime — zero code, the first line of defense.
2. **Salting** (this module): pre-split hot keys deterministically —
   the explicit form for when the skew is known and extreme (AQE can
   only split what fits one executor's fetch in the first place).

The salt must be *deterministic* here (derived by hashing a
row-unique column) so plans stay replayable and oracle-checkable —
``rand()``-salting would break retry idempotency too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.registry import query


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    row_id: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the fact side's hot keys are split across
    ``n_salt`` reducers.

    fact rows get ``salt = pmod(xxhash64(row_id), n_salt)``; the dim
    side is replicated ``n_salt``× via a literal explode. The shuffle
    key becomes (key, salt) — a hot key now lands on n_salt reducers
    instead of one. Cost: dim side ×n_salt (fine for dimension tables;
    for fact-fact skew, salt only the hot-key subset — split the join
    in two and union).

    Only fact-preserving join types are allowed: with ``right`` or
    ``full`` the replicated dim side would emit every unmatched dim
    row ``n_salt`` times — silently wrong output (ADVICE r2)."""
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows of "
            f"the replicated dim side; allowed: {sorted(allowed)}"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_id)), F.lit(n_salt)).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])),
    )
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


@query(
    "skew_salted_join",
    oracle="""
    -- the salted join must be RESULT-IDENTICAL to the plain join —
    -- salting only changes the shuffle key distribution.
    SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey,
           s.s_name, s.s_nationkey
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_quantity < 5
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate entry for the skew technique: a deterministic
    salted fact⋈dim join whose oracle is the PLAIN join — proving the
    rewrite is a pure physical transformation (the hot key is split
    across n_salt reducers; the result set is untouched).

    The salt derives from xxhash64 of a row-unique key, so retries and
    the oracle comparison are stable."""
    from lake_satellite_image_etl_spark.io import read_table

    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") < 5)
        .withColumn(
            "_rid",
            F.col("l_orderkey") * 8 + F.col("l_linenumber"),
        )
    )
    dim = read_table(spark, sf_dir, "supplier").withColumnRenamed(
        "s_suppkey", "l_suppkey"
    )
    joined = salted_join(li, dim, "l_suppkey", row_id="_rid", n_salt=8)
    return joined.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "s_name", "s_nationkey"
    )


def null_safe_left_join(
    fact: DataFrame, dim: DataFrame, key: str, dim_key: str
) -> DataFrame:
    """Left join where NULL fact keys BYPASS the shuffle entirely.

    The production trap: a nullable FK (optional dimension) shuffles
    every NULL-keyed row to ONE reducer — SQL NULL never equi-matches,
    so those rows do nothing there except serialize behind each other
    (often the single biggest partition in the job). Fix: split the
    scan — NULL keys take a metadata-only path (columns padded with
    typed NULLs, no exchange), non-NULL keys join normally — and
    union. Same rows out, the hotspot never exists.

    AQE's skew split does NOT cover this case well: it splits a big
    partition into chunks but still shuffles and sorts the NULL rows;
    the split avoids moving them at all."""
    matched = fact.where(F.col(key).isNotNull()).join(
        dim, fact[key] == dim[dim_key], "left"
    )
    nulls = fact.where(F.col(key).isNull())
    for c in dim.columns:
        nulls = nulls.withColumn(c, F.lit(None).cast(dict(dim.dtypes)[c]))
    return matched.unionByName(nulls)


@query(
    "skew_null_safe_join",
    oracle="""
    -- null-key-skew-safe left enrich: orders whose 'P' status models
    -- an OPTIONAL customer FK (key nulled) enriched against customer.
    -- The oracle is the PLAIN left join — the null-bypass split must
    -- be output-identical to it (null keys never match anyway).
    WITH f AS (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE o_custkey END AS fk,
               o_totalprice
        FROM orders
    )
    SELECT f.o_orderkey, f.fk,
           CAST(round(f.o_totalprice * 100) AS BIGINT) AS total_cents,
           c.c_mktsegment, c.c_nationkey
    FROM f LEFT JOIN customer c ON f.fk = c.c_custkey
    """,
)
def skew_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-key skew mitigation (the third skew tool beside AQE and
    salting): a nullable FK's NULL rows — here orders in 'P' status
    modeling an optional customer link — never leave their input
    partitions; only real keys shuffle. The oracle is the PLAIN left
    join, so the split is proven output-identical, not just faster.

    At 100 TB this is the difference between a join that finishes and
    one whose straggler holds the stage: optional FKs routinely run
    20-60% NULL (unattributed events, walk-in orders), and ALL of
    that lands on hash(NULL)'s single reducer in the naive plan."""
    from lake_satellite_image_etl_spark.io import read_table

    o = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    f = o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "P", F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("fk"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias(
            "total_cents"
        ),
    )
    return null_safe_left_join(f, cust, "fk", "c_custkey").select(
        "o_orderkey", "fk", "total_cents", "c_mktsegment", "c_nationkey"
    )
