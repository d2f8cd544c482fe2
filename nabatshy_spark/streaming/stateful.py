"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.9 "beyond parity" — the reference
has no stream-time operators at all).

Why stateful-API and not ``session_window``: the built-in session
window closes purely on watermark; the state API additionally lets the
operator (a) emit a session the moment its gap elapses in event time
(EventTimeTimeout), (b) keep arbitrary per-key extras (counts here;
at 100 TB typically also sketches/samples per session), and (c) bound
memory explicitly — state is one small tuple per *open* session, and
the watermark bounds how long a key can stay open.

Scale shape: state is hash-partitioned by user key across executors
exactly like a groupBy, so 10⁹ concurrent sessions spread evenly; each
micro-batch touches only keys with new data plus keys whose timeout
fired. Out-of-order events within the watermark merge into the open
session; events older than the watermark are dropped (the same
explicit late-data policy as streaming/preagg.py — the batch twin
``operators/sessions.sessionize`` is the exact-after-the-fact answer).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

_US = 1_000_000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("duration_secs", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[Any, ...]] = []

        def emit(s: int, e: int, n: int) -> None:
            closed.append((key[0], s, e, n, (e - s) // _US))

        if state.hasTimedOut:
            s, e, n = state.get
            emit(s, e, n)
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(pdf["ts"].astype("int64") // 1000)
            ts.sort()
            s, e, n = state.get if state.exists else (None, 0, 0)
            for t in ts:
                if s is None:
                    s, e, n = t, t, 1
                elif t - e > gap_us:
                    emit(s, e, n)
                    s, e, n = t, t, 1
                else:
                    e, n = max(e, t), n + 1
            if s is not None:
                state.update((s, e, n))
                # close the session once event time passes end + gap
                state.setTimeoutTimestamp((e + gap_us) // 1000)

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "duration_secs",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-user sessionization: emits one row per CLOSED
    session (closed when the event-time watermark passes the session's
    last event + gap). ``events`` must be a streaming frame with
    ``user_id`` and an event-time ``ts`` timestamp column.
    """
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy(F.col("user_id"))
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
