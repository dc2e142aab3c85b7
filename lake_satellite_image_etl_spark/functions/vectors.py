"""Vector math over ``embeddings.embedding`` (array<float>) —
SURVEY.md §2.8 EXT, the LLM-pipeline vector block.

Design rule for exactness: embeddings are **quantized to integers**
(``round(x * 10000)`` per component — float32 inputs carry ~7
significant digits, so 4 decimal places preserve the signal) and every
dot product / norm is integer arithmetic, which is exact and
engine-independent. Doubles appear only in the final sqrt/divide,
where IEEE-correct rounding makes both engines bit-identical.
Without quantization, float summation-order differences between
engines would leak into low-order bits and break the value hash.

All expressions are JVM-side array HOFs (``zip_with``/``aggregate``
equivalents) — no Python in the hot path; a 100 TB scan of embeddings
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

QUANT = 10000

#: DuckDB fragment — MUST mirror qvec_of() exactly.
SQL_QVEC = f"list_transform(embedding, x -> round(x::DOUBLE * {QUANT})::BIGINT)"


def qvec_of(c: Column) -> Column:
    """Quantized integer vector: round(x*10000) per component."""
    return F.transform(
        c, lambda x: F.round(x.cast("double") * QUANT, 0).cast("long")
    )


def dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of quantized vectors — exact integer dots,
    one IEEE sqrt/divide at the end (identical across engines).

    NOTE: recomputes both norms per call. In pairwise joins use
    ``norm`` to precompute each side's norm ONCE per vector and divide
    by the product — same doubles (identical op order), 3× less work.
    """
    return dot_long(a, b).cast("double") / (norm(a) * norm(b))


def norm(a: Column) -> Column:
    """L2 norm of a quantized vector (double)."""
    return F.sqrt(dot_long(a, a).cast("double"))


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)}::DOUBLE)"


# DuckDB mirrors of dot_long/cosine over list columns.
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {b}[i]))::BIGINT"
    )


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({sql_dot(a, b)}::DOUBLE / "
        f"(sqrt({sql_dot(a, a)}::DOUBLE) * sqrt({sql_dot(b, b)}::DOUBLE)))"
    )


@query(
    "vector_norms",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {SQL_QVEC} AS qv FROM embeddings)
    SELECT vec_id, label,
           len(qv)::BIGINT AS dim,
           {sql_dot("qv", "qv")} AS l2sq_q,
           round(sqrt({sql_dot("qv", "qv")}::DOUBLE) / {QUANT}, 6) AS l2_norm,
           round(list_sum(qv)::DOUBLE / len(qv) / {QUANT}, 6) AS mean_component,
           (list_max(qv))::BIGINT AS max_q,
           (list_min(qv))::BIGINT AS min_q
    FROM q
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector statistics: dimension, exact quantized L2², L2 norm,
    component mean, min/max. One narrow map stage — scan speed."""
    emb = read_table(spark, sf_dir, "embeddings")
    qv = qvec_of(F.col("embedding"))
    df = emb.select("vec_id", "label", qv.alias("qv"))
    l2sq = dot_long(F.col("qv"), F.col("qv"))
    return df.select(
        "vec_id",
        "label",
        F.size("qv").cast("long").alias("dim"),
        l2sq.alias("l2sq_q"),
        F.round(F.sqrt(l2sq.cast("double")) / QUANT, 6).alias("l2_norm"),
        F.round(
            F.aggregate(
                F.col("qv"), F.lit(0).cast("long"), lambda a, x: a + x
            ).cast("double")
            / F.size("qv")
            / QUANT,
            6,
        ).alias("mean_component"),
        F.array_max("qv").cast("long").alias("max_q"),
        F.array_min("qv").cast("long").alias("min_q"),
    )


@query(
    "vector_centroid_cosine",
    oracle=f"""
    WITH q AS (SELECT vec_id, label, {SQL_QVEC} AS qv FROM embeddings),
    e AS (
        SELECT vec_id, label,
               unnest(qv) AS qc,
               unnest(generate_series(1, len(qv))) AS pos
        FROM q
    ),
    comp AS (
        SELECT label, pos, sum(qc)::BIGINT AS sq FROM e GROUP BY label, pos
    ),
    cent AS (
        SELECT label, array_agg(sq ORDER BY pos) AS cq FROM comp GROUP BY label
    )
    SELECT q.vec_id, q.label,
           round({sql_cosine("q.qv", "cent.cq")}, 6) AS cos_to_centroid
    FROM q JOIN cent ON q.label = cent.label
    """,
)
def vector_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of each vector to its label centroid.

    The centroid is built distributively: posexplode → (label, pos)
    partial sums → re-assembled sorted array. Cosine is taken against
    the *sum* vector (the 1/n scale cancels in cosine), keeping all
    arithmetic exact integers. At 100 TB: the explode shuffles
    (label, pos) pairs — 64·|labels| groups — then the tiny centroid
    table broadcasts back onto the scan; no large shuffle of vectors.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.select("vec_id", "label", qvec_of(F.col("embedding")).alias("qv"))
    e = q.select("vec_id", "label", F.posexplode("qv").alias("pos", "qc"))
    comp = e.groupBy("label", "pos").agg(F.sum("qc").alias("sq"))
    cent = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sq"))), lambda s: s["sq"]
        ).alias("cq")
    )
    return (
        q.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("qv"), F.col("cq")), 6).alias("cos_to_centroid"),
        )
    )
