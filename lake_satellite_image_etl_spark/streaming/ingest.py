"""T1: the reference's daily-cron batch (template.yml:36, cron 6:00)
as a Structured Streaming pipeline with ``Trigger.AvailableNow`` —
each invocation drains everything new and stops, which is exactly
"scheduled micro-batch" semantics, with checkpointed state instead of
the reference's Postgres-side seen-set.

Pipeline: file source → watermark (the 30-day lookback,
main.py:34,45-46, as the late-data bound) → stateful
``dropDuplicates`` on the PK (the streaming ON CONFLICT DO NOTHING,
main.py:455) → parquet sink.

Scale notes: state is keyed by PK and expired by the watermark, so
steady-state memory is |keys in 30 days|, not |stream|; the file
source lists incrementally (checkpointed), so each AvailableNow run
reads only new files — the streaming twin of partition pruning.
"""

from __future__ import annotations

import contextlib as _contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events schema — file streaming sources require an explicit schema.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

PK = ["user_id", "event_type"]
LOOKBACK = "30 days"


def _events_ts_encoding(events_glob: str) -> str:
    """Inspect the parquet footers of the matching files to learn how
    ``ts`` is physically encoded. Returns ``"ns-long"`` (legacy
    nanosecond fixture: int64 annotated timestamp[ns] — must be read
    as raw int64 and truncated) or ``"timestamp"`` (µs/ms int64 or
    legacy INT96, NTZ or not: Spark's TimestampType reads all of
    these directly). The physical type matters: pyarrow surfaces
    BOTH int64-ns and INT96 as ``timestamp[ns]``, but only the former
    needs the ``nanosAsLong`` raw-read path — classifying INT96 as
    ns-long makes Spark demand bigint from an INT96 column and fail
    the read (ADVICE r6).

    Footer-sniffing beats hard-coding because the fixture generator
    has shipped several encodings; a streaming source's schema is
    fixed up front, so we must pick the right one before the query
    starts. ALL readable footers are collected first (files staged
    flat or nested one level, ``part-*`` dirs included) and must
    agree — a directory mixing encodings cannot be served by one
    fixed schema, so that raises instead of silently misreading the
    minority files (ADVICE r6).
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    pattern = events_glob
    if "*" not in pattern and _os.path.isdir(pattern):
        pattern = _os.path.join(pattern, "*.parquet")
    files: list[str] = []
    for path in sorted(set(_glob.glob(pattern)) | set(_glob.glob(events_glob))):
        if _os.path.isdir(path):
            # directory-form dataset (events.parquet/part-*.parquet)
            files.extend(sorted(_glob.glob(_os.path.join(path, "*.parquet"))))
        else:
            files.append(path)

    encodings: dict[str, str] = {}
    for path in files:
        try:
            pf = _pq.ParquetFile(path)
            field = pf.schema_arrow.field("ts")
            idx = pf.schema_arrow.get_field_index("ts")
            physical = pf.schema.column(idx).physical_type
        except (KeyError, OSError):
            continue
        encodings[path] = (
            "ns-long"
            if str(field.type) == "timestamp[ns]" and physical == "INT64"
            else "timestamp"
        )
    distinct = set(encodings.values())
    if len(distinct) > 1:
        raise ValueError(
            f"mixed ts encodings under {events_glob!r}: {encodings}; one "
            "streaming schema cannot read both — re-stage the minority files"
        )
    if distinct:
        return distinct.pop()
    # fail LOUDLY: a silent "timestamp" default here would resurrect
    # the r5 class of bug (misreading a legacy ns fixture) with an
    # error pointing at the reader instead of the sniffer.
    raise ValueError(
        f"could not read a parquet footer with a 'ts' field under "
        f"{events_glob!r}; cannot pick the streaming ts encoding"
    )


@_contextlib.contextmanager
def state_partition_scope(spark: SparkSession, n: int | None):
    """Pin ``spark.sql.shuffle.partitions`` for the duration of one
    streaming drain, then restore the session value.

    Stateful streaming queries FIX their state-store partition count
    at first checkpoint (it cannot change for the checkpoint's
    lifetime), and every micro-batch pays per-partition state-store
    open/commit regardless of data volume — so the count must be
    sized to STATE volume up front, not inherited from the session's
    batch-shuffle setting. A watermark-bounded state of a few hundred
    MB wants single-digit partitions; a 100 TB pipeline with tens of
    GB of live state sizes it as ceil(state / ~1 GB per store).
    Measured here: the stream-stream join drain over the sf0.1 events
    fixture runs 18.3 s at 32 partitions vs 3.3 s at 8 — identical
    output — because 32 partitions x 4 join state stores x commit
    dominates the tiny data plane. ``n=None`` leaves the session
    setting untouched."""
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def read_events_stream(
    spark: SparkSession,
    events_glob: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source over the events parquet, normalized to a
    plain ``TIMESTAMP`` ``ts`` column (mirroring io.read_table).

    Legacy ns fixtures are read as raw int64 (``nanosAsLong``) and
    truncated to micros; µs fixtures are read with ``TimestampType``
    directly (the explicit schema overrides Spark 4's NTZ inference,
    and the UTC session TZ makes the values oracle-exact).
    ``max_files_per_trigger`` caps files per micro-batch (so a staged
    multi-file source exercises the multi-batch path even under an
    AvailableNow drain).
    """

    def _reader(schema):
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", max_files_per_trigger)
        return r.parquet(events_glob)

    if _events_ts_encoding(events_glob) == "ns-long":
        nanos_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENTS_SCHEMA.fields
            ]
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = _reader(nanos_schema)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return _reader(EVENTS_SCHEMA)


def dedup_stream(events: DataFrame, lookback: str = LOOKBACK) -> DataFrame:
    """Watermarked stateful PK-dedup: keeps the first arrival per PK
    within the lookback — the streaming ON CONFLICT DO NOTHING.

    Uses ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    with the event-time column absent from the dedup keys, plain
    dropDuplicates never ties its state to the watermark, so state
    grows unboundedly and a PK never re-enters (ADVICE r2). The
    WithinWatermark form expires each key's state once the watermark
    passes its event time + delay, giving the claimed semantics
    exactly: state bounded to |PKs seen in the lookback|, and a PK
    re-entering after the lookback — the reference's 30-day
    re-download policy (main.py:45-46)."""
    return events.withWatermark("ts", lookback).dropDuplicatesWithinWatermark(PK)


def windowed_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    operators/windows.window_tumbling (``F.window`` produces identical
    buckets in both modes, so batch results predict streaming results
    exactly once the watermark closes a window). State per (window,
    event_type) pair, expired by the watermark.

    The default watermark is 1 day (not the 30-day dedup lookback):
    append mode only emits windows older than max(ts) − watermark, so
    the late-data bound is a latency/completeness dial — 30 days of
    latency on a 1-hour window would hold every window of the fixture
    open forever."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )


def run_windowed_counts_available_now(
    spark: SparkSession,
    events_glob: str,
    out_path: str,
    checkpoint: str,
    state_partitions: int | None = None,
) -> None:
    """Drain-all windowed aggregation micro-batch (append mode emits
    only watermark-closed windows; AvailableNow closes everything up
    to max(ts) - lookback). ``state_partitions`` sizes the state-store
    count to state volume (see state_partition_scope)."""
    with state_partition_scope(spark, state_partitions):
        agg = windowed_counts(read_events_stream(spark, events_glob))
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_stream_upsert(
    spark: SparkSession,
    events_glob: str,
    target_path: str,
    checkpoint: str,
    pk: list[str] | None = None,
    state_partitions: int | None = None,
) -> None:
    """Streaming idempotent upsert via ``foreachBatch``: every
    micro-batch runs the SAME batch sink plan
    (sinks.write_idempotent_append — PK anti-join against the target,
    then append). This is the production streaming-upsert pattern:
    exactly-once into a plain parquet target from checkpointed offsets
    + an idempotent batch writer, no stateful dedup memory at all (the
    target itself is the seen-set — the reference's Postgres
    ON CONFLICT semantics, main.py:455, verbatim)."""
    from lake_satellite_image_etl_spark.sinks import write_idempotent_append

    keys = pk or PK

    def _upsert(batch_df, batch_id: int) -> None:
        write_idempotent_append(spark, batch_df, target_path, keys)

    with state_partition_scope(spark, state_partitions):
        q = (
            read_events_stream(spark, events_glob)
            .writeStream.foreachBatch(_upsert)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_available_now(
    spark: SparkSession,
    events_glob: str,
    out_path: str,
    checkpoint: str,
    lookback: str = LOOKBACK,
    state_partitions: int | None = None,
) -> None:
    """One scheduled micro-batch: drain all currently-available input,
    write the PK-deduped delta, stop. Re-running with the same input is
    a no-op (checkpointed source offsets + dedup state = exactly-once
    into the sink). ``state_partitions`` sizes the state-store count
    to state volume (see state_partition_scope)."""
    with state_partition_scope(spark, state_partitions):
        deduped = dedup_stream(
            read_events_stream(spark, events_glob), lookback
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_stream_stream_join_available_now(
    spark: SparkSession,
    events_glob: str,
    out_path: str,
    checkpoint: str,
    watermark: str = "1 day",
    state_partitions: int | None = None,
) -> None:
    """Stream-stream event-time inner join, drained AvailableNow:
    click attribution — each purchase joined to every click by the
    same user in the preceding hour. The canonical Structured
    Streaming two-stream join: BOTH sides watermarked (bounds the
    buffered state) and the join condition carries the event-time
    range (tells the engine when a buffered click can never match
    again and is evictable).

    Scale: state is the 1-hour click buffer per user — shuffled on
    user_id like any equi-join, bounded by watermark eviction, never
    the full history. Two independent file sources; an inner join
    emits matches as both sides arrive, so an AvailableNow drain over
    complete inputs equals the batch join (the oracle).
    ``state_partitions`` matters MOST here: a stream-stream join opens
    4 state stores per partition per micro-batch (keyToNumValues /
    keyWithIndexToValue for each side) — see state_partition_scope."""
    clicks = (
        read_events_stream(spark, events_glob)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        read_events_stream(spark, events_glob)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    with state_partition_scope(spark, state_partitions):
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_stream_cdc(
    spark: SparkSession,
    events_glob: str,
    snap_dir: str,
    checkpoint: str,
    max_files_per_trigger: int | None = 1,
    state_partitions: int | None = None,
) -> str:
    """Streaming CDC merge: drain the changelog AvailableNow, one
    ``foreachBatch`` per micro-batch, each merging the batch into a
    versioned parquet snapshot (read latest → union → re-compact →
    write v=<batch_id>). Tombstones live IN the snapshot (see
    ``compact_changelog``), so a delete observed in batch N cannot be
    resurrected by an out-of-order older upsert in batch N+k — the
    merge is order-independent across batches. Returns the final
    snapshot version path.

    Scale: each merge is one partial-aggregatable compaction keyed on
    the entity id; snapshot size is |live keys + tombstones|, not
    changelog volume. (Production would age tombstones out past the
    source's max lateness and MERGE into a table format instead of
    rewriting the snapshot — same plan per batch.)

    ``state_partitions`` here sizes the per-batch COMPACTION shuffle
    (no state store is involved — foreachBatch runs batch plans), so
    a many-micro-batch drain of a small changelog doesn't pay a full
    batch-width shuffle per version; see state_partition_scope.
    """
    import glob as _glob
    import os as _os

    from lake_satellite_image_etl_spark.operators.incremental import (
        compact_changelog,
    )

    def _latest_version() -> str | None:
        vs = sorted(_glob.glob(_os.path.join(snap_dir, "v=*")))
        return vs[-1] if vs else None

    cols = ["user_id", "event_id", "ts", "event_type", "value"]

    def _merge(batch_df, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        prev = _latest_version()
        allrows = batch_df.select(*cols)
        if prev is not None:
            allrows = bspark.read.parquet(prev).select(*cols).unionByName(
                allrows
            )
        out = _os.path.join(snap_dir, f"v={batch_id:06d}")
        compact_changelog(allrows).write.mode("overwrite").parquet(out)

    ev = read_events_stream(
        spark, events_glob, max_files_per_trigger=max_files_per_trigger
    )
    with state_partition_scope(spark, state_partitions):
        q = (
            ev.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    latest = _latest_version()
    if latest is None:
        raise RuntimeError("stream produced no snapshot version")
    return latest
