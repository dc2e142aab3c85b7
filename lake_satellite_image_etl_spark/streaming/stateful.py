"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9/§2.10): per-user sessionization with explicit
``GroupState`` — the carrier for any stateful logic Structured
Streaming's built-ins (windows, dropDuplicates) can't express.

The operator mirrors operators/windows.window_session's 30-minute-gap
semantics, but as incremental state: per user it keeps (last event
ts, open-session count) across micro-batches and emits the running
session count. tests/test_stateful.py proves the AvailableNow run
equals the batch sessionization.

Scale notes: state is per-key and O(1) per user (two numbers); the
shuffle is the groupBy(user_id) every micro-batch — identical key
distribution to the batch form. A timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) would evict idle users
in a long-running stream; AvailableNow drains and stops, so no
timeout is configured here.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_SECONDS = 30 * 60

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, n_sessions bigint"
STATE_SCHEMA = "last_ts_micros bigint, n_sessions bigint, n_events bigint"


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events (sorted by ts) into the running
    (last_ts, session_count) state; emit the per-user totals so far."""
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    # Spark may deliver one group as several Arrow chunks, in any
    # order; sorting each chunk independently would let a later chunk
    # carry earlier timestamps and inflate the session count. Concat
    # the whole group (bounded by per-user batch size), sort ONCE.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ts = pd.concat([c["ts"] for c in chunks]).sort_values()
        # normalize to µs regardless of the pandas datetime64 unit
        micros = ts.astype("datetime64[ns]").astype("int64") // 1000
        for t in micros:
            if last_ts is None or t - last_ts > GAP_SECONDS * 1_000_000:
                n_sessions += 1
            last_ts = int(t)
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        [(int(key[0]), n_events, n_sessions)],
        columns=["user_id", "n_events", "n_sessions"],
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """events (streaming, cols user_id/ts) → running per-user session
    counts, update mode."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
