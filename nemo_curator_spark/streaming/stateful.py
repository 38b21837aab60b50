"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState`` (beyond-reference addition — the reference has
no streaming engine; this is the Structured Streaming analogue of the
batch ``events_sessionize`` query, same 30-minute-gap semantics).

Shape: ``groupBy(user_id)`` keyed state holding the open session
(last event time, session start, counts); each micro-batch's events for a
user are merged in event order, sessions CLOSE when the gap to the next
event exceeds the threshold (emitted downstream), and the still-open
session persists in state. An event-time timeout closes idle sessions
once the watermark passes ``last_ts + gap`` — so state is bounded by the
number of users active inside the watermark horizon, not by history
(the 100 TB property: state size tracks active keys, never the stream).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, sess_start timestamp, sess_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "last_us long, start_us long, n long, total double"


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)


def _sessionize_fn(gap_us: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            last, start, n, total = state.get
            closed.append((user_id, start, last, n, total))
            state.remove()
        else:
            if state.exists:
                last, start, n, total = state.get
            else:
                last = start = None
                n, total = 0, 0.0
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            for ts, value in zip(batch["ts"], batch["value"]):
                t = _us(ts)
                if last is None:
                    start, last, n, total = t, t, 1, float(value)
                elif t - last > gap_us:
                    closed.append((user_id, start, last, n, total))
                    start, last, n, total = t, t, 1, float(value)
                else:
                    last = t
                    n += 1
                    total += float(value)
            state.update((last, start, n, total))
            # close the open session once the watermark passes last + gap
            state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "sess_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "sess_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "total_value": [round(c[4], 4) for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events,
    gap_minutes: float = 30.0,
    watermark: str = "2 hours",
):
    """(user_id, ts, event_id, value) stream -> closed-session rows.

    Events later than the watermark are dropped by Spark before reaching
    the state function; sessions are emitted when a gap closes them or
    when their event-time timeout fires.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes * 60 * 1_000_000)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
