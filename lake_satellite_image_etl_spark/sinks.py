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


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    pk: list[str],
    driver: str | None = None,
) -> int:
    """K1 deployable form against a live RDBMS (main.py:453-457
    ``INSERT … ON CONFLICT DO NOTHING``): distributed staging append +
    one server-side set-based ``MERGE``.

    Spark's JDBC sink streams the DataFrame into a session-unique
    staging table from the EXECUTORS (batched PreparedStatement
    inserts per partition — the distributed half); then a single
    ``MERGE INTO target USING staging … WHEN NOT MATCHED THEN
    INSERT`` runs inside the database (the transactional half —
    Derby's ANSI analog of ON CONFLICT DO NOTHING; on Postgres the
    same statement works verbatim from 15, or swap the one string for
    INSERT … ON CONFLICT). This staging+merge split is the canonical
    warehouse bulk-upsert: per-row upserts from tasks would hold row
    locks across the whole job, while the merge is one set-based
    statement the database can plan. Row-at-a-time engines with a
    Python DB-API driver can use ``write_dbapi_upsert`` below
    instead.

    Creates the target (empty) when absent. Returns the number of
    rows the MERGE inserted — 0 on a re-run with the same input
    (run-twice contract, tests/test_jdbc.py).
    """
    jvm = df.sparkSession._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)

    def q(ident: str) -> str:
        return '"' + ident + '"'

    staging = f"stage_{uuid.uuid4().hex[:12]}"
    writer = df.write.format("jdbc").option("url", url).option("dbtable", staging)
    if driver:
        writer = writer.option("driver", driver)
    writer.mode("overwrite").save()

    # target create-if-absent: mode("ignore") no-ops when it exists
    tgt = df.limit(0).write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        tgt = tgt.option("driver", driver)
    tgt.mode("ignore").save()

    cols = ", ".join(q(c) for c in df.columns)
    src_cols = ", ".join(f"s.{q(c)}" for c in df.columns)
    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            n = stmt.executeUpdate(
                f"MERGE INTO {table} t USING {staging} s ON {on} "
                f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({src_cols})"
            )
            stmt.executeUpdate(f"DROP TABLE {staging}")
        finally:
            stmt.close()
    finally:
        conn.close()
    return n


def write_dbapi_upsert(
    df: DataFrame,
    connect_fn,
    upsert_sql: str,
    cols: list[str],
    batch_size: int = 500,
) -> int:
    """K1 deployable form, row-batch flavor: ``foreachPartition``
    batched upserts through any Python DB-API connection factory —
    the exact executor-side loop a Postgres deployment runs with
    ``connect_fn=psycopg2.connect(...)`` and ``upsert_sql="INSERT …
    ON CONFLICT DO NOTHING"`` (main.py:453-457).

    Each partition opens ONE connection, executes ``executemany`` per
    ``batch_size`` rows, and commits once — parallelism = partition
    count, a task retry re-upserts only its partition (idempotent by
    the conflict clause). ``upsert_sql`` is dialect-owned by the
    caller (ON CONFLICT / INSERT OR IGNORE / MERGE) with one ``?`` or
    ``%s`` placeholder per column in ``cols`` order. Returns rows
    actually inserted, summed from cursor rowcounts via an
    accumulator in the same pass (a second counting action would
    re-run the lineage)."""
    rows = df.select(*cols)
    n_inserted = rows.sparkSession.sparkContext.accumulator(0)

    def _upsert_partition(it) -> None:
        conn = connect_fn()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []

            def flush() -> None:
                if batch:
                    cur.executemany(upsert_sql, batch)
                    if cur.rowcount and cur.rowcount > 0:
                        n_inserted.add(cur.rowcount)
                    batch.clear()

            for row in it:
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    flush()
            flush()
            conn.commit()
        finally:
            conn.close()

    rows.foreachPartition(_upsert_partition)
    return n_inserted.value


def write_partitioned_parquet(
    df: DataFrame, out_path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """The 100 TB layout primitive: date/key-partitioned parquet so
    downstream incremental scans prune partitions (SURVEY.md §4 —
    the engine's analog of the reference's per-day incremental unit).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(out_path)
