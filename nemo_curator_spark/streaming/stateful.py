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
