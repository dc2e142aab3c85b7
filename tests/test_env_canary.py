"""Environment canary: pin down the fixture/Spark timestamp contract.

The sandbox has silently changed under the repo before (PySpark 3.5 →
4.1, events ``ts`` fixture ns-int64 → µs ``TIMESTAMP_NTZ``), which in
round 5 broke three driver rows and six tests at once with no single
obvious culprit. These tests exist to fail FIRST, by name, on the next
such bump: if ``io.read_table`` / ``streaming.ingest`` stop yielding a
plain ``TIMESTAMP`` column with sane 21st-century values, look here.
"""

from __future__ import annotations

import datetime

import pyspark

from lake_satellite_image_etl_spark import io as eio
from lake_satellite_image_etl_spark.streaming.ingest import (
    EVENTS_SCHEMA,
    _events_ts_encoding,
    read_events_stream,
)

from tests.conftest import SF_SMOKE


def test_events_ts_reads_as_timestamp(spark):
    """Post-normalization, events.ts must be TIMESTAMP (never NTZ or
    bigint) regardless of how the fixture is physically encoded."""
    df = eio.read_table(spark, SF_SMOKE, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"events.ts normalized to {dict(df.dtypes)['ts']!r}; "
        f"pyspark={pyspark.__version__} — fixture encoding changed?"
    )


def test_no_table_leaks_timestamp_ntz(spark):
    """EVERY fixture table must leave the reader NTZ-free — the µs
    fixtures read orders.o_orderdate / lineitem.l_shipdate as NTZ on
    Spark 4 too, and any epoch function applied to them would hit the
    same breakage class as r5's events.ts."""
    for name in eio.TABLES:
        df = eio.read_table(spark, SF_SMOKE, name)
        ntz = [c for c, d in df.dtypes if d == "timestamp_ntz"]
        assert not ntz, f"{name}: NTZ columns leaked: {ntz}"


def test_events_ts_values_are_sane(spark):
    """A 1000× unit mix-up lands events in ~1972 (the r5 streaming
    bug) or ~year 52970; bound the actual range instead."""
    row = eio.read_table(spark, SF_SMOKE, "events").selectExpr(
        "min(ts) AS lo", "max(ts) AS hi"
    ).first()
    assert row.lo >= datetime.datetime(2000, 1, 1), row.lo
    assert row.hi < datetime.datetime(2100, 1, 1), row.hi


def test_streaming_encoding_detection_matches_fixture():
    """The footer sniffer must classify the shipped fixture; if the
    generator moves to a third encoding this fails before any query."""
    enc = _events_ts_encoding(f"{SF_SMOKE}/events.parquet")
    assert enc in ("ns-long", "timestamp")


def test_streaming_reader_schema_is_timestamp(spark, tmp_path):
    """The streaming source must surface the same normalized schema as
    the batch reader (same ts dtype ⇒ batch plans predict streaming)."""
    stream = read_events_stream(spark, f"{SF_SMOKE}/events.parquet")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in EVENTS_SCHEMA.fields
    ]
