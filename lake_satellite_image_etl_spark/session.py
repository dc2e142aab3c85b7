"""SparkSession factory.

Mirrors the runtime confs the reference enables (Arrow:
``/root/reference/template.yml:97``) and adds the ones a 100 TB
deployment needs from day one: AQE (runtime re-planning, skew-join
splitting, partition coalescing) and a UTC session timezone so results
are reproducible across clusters and comparable against the DuckDB
oracle (DuckDB timestamps are UTC-naive).

``shuffle_partitions`` defaults to the local core count; on a real
cluster set it (or let AQE coalesce) to ~2-3× total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEF_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "lake-satellite-image-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession."""
    master = master or f"local[{_DEF_CPUS}]"
    shuffle_partitions = shuffle_partitions or int(_DEF_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # broadcast conversion based on observed sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches for every pandas UDF / toPandas boundary
        # (the reference enables the same flag, template.yml:97).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Parallelism FLOOR for file scans: a small-but-CPU-heavy input
        # (one parquet file under maxPartitionBytes fused below
        # tokenize/shingle/UDF stages) otherwise runs as ONE task on an
        # idle cluster. This is a floor tied to core count, not a byte
        # cap — at real scale splits already exceed cores and it's a
        # no-op. (Found via the 120 K smoke: every doc query looked
        # ~20× super-linear because the fixture was a single split.)
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        # InferFiltersFromGenerate copies the generator's child
        # expression into a `size(...) > 0` Filter — for the HOF-heavy
        # arrays this engine explodes (shingle+md5 chains, band
        # transforms) that re-evaluates the WHOLE chain once more per
        # row, measured 2.4 s -> 0.65 s on the shingle index stage
        # (r8). The inferred filter only skips empty arrays, which
        # plain explode skips anyway — semantics identical, the rule
        # is pure overhead for expensive generators (cf. SPARK-36715).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        # Deterministic, oracle-comparable timestamps.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
