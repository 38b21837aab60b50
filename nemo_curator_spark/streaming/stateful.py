"""Custom stateful streaming operator: per-host running curation stats.

The reference has no event-time/stateful operators (SURVEY.md §1.2); this
is the Spark-native capability the task adds: ``applyInPandasWithState``
keeps a (docs_seen, docs_kept) accumulator per host across micro-batches —
the streaming analogue of the lineage table, usable for live keep-rate
monitoring / per-host anomaly cutoff.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "host string, n_docs long, n_kept long, keep_rate double"
STATE_SCHEMA = "n_docs long, n_kept long"


def _update_host_stats(key, pdfs, state: GroupState):
    (host,) = key
    if state.exists:
        n_docs, n_kept = state.get
    else:
        n_docs, n_kept = 0, 0
    for pdf in pdfs:
        n_docs += len(pdf)
        n_kept += int(pdf["keep"].sum())
    state.update((n_docs, n_kept))
    yield pd.DataFrame(
        {
            "host": [host],
            "n_docs": [n_docs],
            "n_kept": [n_kept],
            "keep_rate": [n_kept / n_docs if n_docs else 0.0],
        }
    )


def host_running_stats(labeled_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of cumulative per-host stats (update mode)."""
    with_host = labeled_stream.withColumn(
        "host", F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1)
    )
    return (
        with_host.select("host", F.col("keep").cast("long").alias("keep"))
        .groupBy("host")
        .applyInPandasWithState(
            _update_host_stats,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# --- per-user streaming sessionization ---------------------------------------
# (applyInPandasWithState #2: event-time timeouts — the Structured
# Streaming analogue of the batch events_sessionize query, same
# 30-minute-gap semantics. Sessions CLOSE when the gap to the next event
# exceeds the threshold or when the watermark passes last_ts + gap, so
# state is bounded by the number of users active inside the watermark
# horizon — the 100 TB property: state tracks active keys, not history.)

from typing import Any, Iterator


SESSION_OUTPUT_SCHEMA = (
    "user_id long, sess_start timestamp, sess_end timestamp, "
    "n_events long, total_value double"
)
SESSION_STATE_SCHEMA = "last_us long, start_us long, n long, total double"


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
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
