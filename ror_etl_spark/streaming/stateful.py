"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState``.

This is the escape hatch for streaming semantics the built-in windowed
aggregates can't express — here, a running (count, sum, max) per user that
emits an updated row per user per micro-batch and keeps O(1) state per
key. State lives in the state store, partitioned by the group key across
executors; a watermark-driven timeout (``GroupStateTimeout``) would evict
idle users on an unbounded keyspace.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total": [round(total, 4)],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → one updated stats row per user
    per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
