"""Arbitrary stateful streaming via ``transformWithStateInPandas``
(Spark 4's successor to ``applyInPandasWithState``).

Same per-user running-stats semantics as ``streaming.stateful`` so the
two APIs are directly comparable in tests, but on the new operator
model: typed state handles (ValueState / ListState / MapState) acquired
in ``init`` from a ``StatefulProcessorHandle``, optional event-time
timers for eviction, and Arrow-batched row iteration per key. State
lives in the state store keyed by user across executors — O(1) per key,
checkpoint-recoverable, exactly like the old API but with composable
state primitives instead of a single tuple.

Runtime requirements: the operator's driver worker needs the
``google.protobuf`` Python package and a RocksDB-backed state store
(``spark.sql.streaming.stateStore.providerClass`` =
``...state.RocksDBStateStoreProvider``). The test suite probes for
protobuf and skips when the environment lacks it (this container does);
``streaming.stateful`` (applyInPandasWithState) is the
dependency-free fallback with identical semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id long, n_events long, total double, max_value double"
STATE_SCHEMA = "n long, total double, mx double"


class RunningUserStats(StatefulProcessor):
    """Per-user (count, sum, max) with one ValueState cell per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            n, total, mx = self._state.get()
        else:
            n, total, mx = 0, 0.0, float("-inf")
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total": [round(total, 4)],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → one updated stats row per user
    per micro-batch, via the transformWithStateInPandas operator."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
