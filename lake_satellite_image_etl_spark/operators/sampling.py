"""Deterministic sampling operators — the training-data-pipeline
trio: reproducible subsampling, train/val/test splitting, and
label-balanced downsampling.

``sample()``/``rand()`` are the WRONG tool for corpus work at scale:
re-runs, retries, and engine changes all reshuffle the sample, so
lineage breaks. The production pattern is *hash-based* sampling — a
row's fate is a pure function of its stable key (here the md5-derived
60-bit hash, portable across engines), which makes samples
reproducible, composable (a 10% sample of an 80% split is stable),
and shardable with zero coordination. Every operator below is a
narrow scan-speed map stage with a full oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lake_satellite_image_etl_spark.functions.text import tok_hash60
from lake_satellite_image_etl_spark.io import read_table
from lake_satellite_image_etl_spark.registry import query

SAMPLE_PCT = 10
TRAIN_PCT, VAL_PCT = 80, 10  # remainder = test
BALANCED_N = 50

#: DuckDB mirror of tok_hash60 on a stringified key
def _sql_key_hash(expr: str) -> str:
    return f"('0x' || substring(md5({expr}::VARCHAR), 1, 15))::BIGINT"


@query(
    "sample_deterministic",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_sql_key_hash("doc_id")} % 100 < {SAMPLE_PCT}
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~{SAMPLE_PCT}% reproducible sample keyed on doc_id: membership
    is hash(key) mod 100 — stable across runs, engines, partitionings,
    and cluster sizes; the filter is a pushable narrow predicate."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.filter(
        tok_hash60(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT
    ).select("doc_id", "source", "n_chars")


@query(
    "sample_train_test_split",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, {_sql_key_hash("doc_id")} % 100 AS bucket
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
                WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{TRAIN_PCT}/{VAL_PCT}/{100 - TRAIN_PCT - VAL_PCT} train/val/test
    assignment from the same hash buckets — every document lands in
    exactly one split, forever, on any engine; downstream jobs filter
    on the split column (or recompute the bucket — same answer)."""
    docs = read_table(spark, sf_dir, "documents")
    bucket = tok_hash60(F.col("doc_id").cast("string")) % 100
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "sample_balanced_downsample",
    oracle=f"""
    WITH ranked AS (
        SELECT vec_id, label,
               row_number() OVER (
                   PARTITION BY label
                   ORDER BY {_sql_key_hash("vec_id")}, vec_id) AS rn
        FROM embeddings
    )
    SELECT vec_id, label FROM ranked WHERE rn <= {BALANCED_N}
    """,
)
def sample_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balanced downsample: at most {BALANCED_N} rows per label,
    chosen by hash order (a deterministic 'random' draw). One shuffle
    on label; at 100 TB with few labels, salt the row_number pass or
    take per-partition partial top-N first — the hash order makes
    either refinement produce the same final set."""
    emb = read_table(spark, sf_dir, "embeddings")
    w = Window.partitionBy("label").orderBy(
        tok_hash60(F.col("vec_id").cast("string")), F.asc("vec_id")
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BALANCED_N)
        .select("vec_id", "label")
    )
