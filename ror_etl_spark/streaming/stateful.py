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


KMV_K = 2048
_KMV_SCALE = float(1 << 52)

KMV_OUTPUT_SCHEMA = "event_type string, distinct_users double, sketch_size long"
KMV_STATE_SCHEMA = "hashes array<double>"


def _kmv_hash_py(v) -> float:
    """Python twin of queries/temporal.py:_kmv_hash — md5 of the string
    form, top 13 hex chars as a double in [0, 1). Bit-identical to the
    Spark/DuckDB expression, so stream state merged across micro-batches
    lands on the same sketch the batch query computes."""
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16) / _KMV_SCALE


def _update_kmv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    hashes = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        hashes.update(_kmv_hash_py(u) for u in pdf["user_id"])
    # KMV merge: union then re-take bottom-k (distributive, so any
    # micro-batch split of the input converges to the batch sketch)
    bottom = sorted(hashes)[:KMV_K]
    state.update((bottom,))
    m = len(bottom)
    est = float(m) if m < KMV_K else round((KMV_K - 1) / bottom[-1], 4)
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "distinct_users": [est],
            "sketch_size": [m],
        }
    )


def kmv_distinct_users_stream(events: DataFrame) -> DataFrame:
    """Streaming KMV distinct-count sketch per event_type: bounded state
    (≤ k hashes per key) no matter how many events arrive, an updated
    estimate per key per micro-batch, and — because the sketch is a pure
    function of the distinct ids seen — a final answer IDENTICAL to the
    batch ``sketch_distinct_users_rollup`` path on the same data. This is
    what exact streaming distinct-count cannot do: its state grows with
    cardinality; the sketch's is capped at k doubles."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_kmv,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
