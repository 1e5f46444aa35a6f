"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (the Structured Streaming surface for operators
Spark lacks natively — SURVEY.md maps the reference's streamed-edge-
partition processing here).

``running_user_stats`` keeps, per user, a running (event count, value sum,
max value) across micro-batches — the building block for streaming degree
counters / incremental graph statistics. State is Spark-managed (fault-
tolerant through the checkpoint location), emitted once per batch per
updated key.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Attach the stateful per-user aggregator to a streaming events frame
    (columns: user_id, value). Returns the update stream."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
