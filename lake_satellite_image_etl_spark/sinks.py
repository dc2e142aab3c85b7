"""Sinks (SURVEY.md §2.2 K1-K3): idempotent relational append and the
binary artifact store.

The reference commits one row per image inside the fan-out loop
(main.py:453-457, ON CONFLICT DO NOTHING) and uploads three artifacts
per image from a 5-thread pool (main.py:311-325). Distributed form:
ONE batched, restartable append of the PK-anti-joined delta (K1), and
executor-side artifact writes via ``foreachPartition`` (K2) — the
thread pools disappear into partition parallelism.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from lake_satellite_image_etl_spark.operators.incremental import idempotent_append


def write_idempotent_append(
    spark: SparkSession, new_rows: DataFrame, target_path: str, pk: list[str]
) -> int:
    """K1: append only PK-new rows to a parquet target — the batch
    equivalent of INSERT … ON CONFLICT DO NOTHING (main.py:453-457).

    Reads back only the PK columns of the target (column pruning keeps
    this cheap at any target size; at 100 TB swap the distinct-PK scan
    for a partition-pruned read or a bloom index). Returns the number
    of rows appended — 0 on a re-run with the same input, which is the
    idempotency contract (tests/test_incremental.py run-twice test).
    """
    if os.path.exists(target_path):
        existing = spark.read.parquet(target_path).select(*pk)
    else:
        existing = new_rows.select(*pk).limit(0)
    delta = idempotent_append(new_rows, existing, pk)
    # cache: the count and the write must see the same delta exactly once
    delta = delta.cache()
    n = delta.count()
    if n:
        delta.write.mode("append").parquet(target_path)
    delta.unpersist()
    return n


def write_binary_artifacts(df: DataFrame, out_dir: str, key_col: str, data_col: str) -> int:
    """K2: object-store artifact sink — one blob per row under its
    deterministic key (main.py:311-325 writes {key}.tif/{key}_thumbnail
    to S3 from a 5-thread pool).

    ``foreachPartition`` puts the writes on the executors: each
    partition is an independent uploader, so parallelism = partition
    count (repartition upstream to size it), and a task retry rewrites
    only its partition's keys — idempotent because keys are
    deterministic (K3). The local filesystem stands in for the object
    store; the boto3 ``put_object`` body is the only line that would
    change.

    Each blob lands ATOMICALLY (write to a task-unique tmp name, then
    ``os.replace`` onto the key): a killed task or concurrent reader
    can never observe a truncated blob, and a speculative duplicate
    task just re-replaces the same bytes. The tmp name carries a
    per-call uuid, not just the pid — concurrent task THREADS in one
    executor share a pid, and two speculative attempts on the same key
    must never interleave into one tmp file (ADVICE r3). The returned
    count comes
    from an accumulator incremented in the same pass — counting with a
    second action would re-execute the entire upstream lineage
    (ADVICE r2) and could disagree with what was written."""
    os.makedirs(out_dir, exist_ok=True)
    rows = df.select(key_col, data_col)
    n_written = rows.sparkSession.sparkContext.accumulator(0)

    def _write_partition(it) -> None:
        for row in it:
            key = row[key_col]
            path = os.path.join(out_dir, key)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = f"{path}.tmp.{uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(bytes(row[data_col]))
            os.replace(tmp, path)
            n_written.add(1)

    rows.foreachPartition(_write_partition)
    return n_written.value


def write_partitioned_parquet(
    df: DataFrame, out_path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """The 100 TB layout primitive: date/key-partitioned parquet so
    downstream incremental scans prune partitions (SURVEY.md §4 —
    the engine's analog of the reference's per-day incremental unit).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_path)
