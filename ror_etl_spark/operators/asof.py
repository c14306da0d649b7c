"""As-of join: for each left row, the latest right row with
``right_time <= left_time`` within the same key group.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The classic distributed
formulations are (a) range-join + row_number()==1 — explodes to one row
per candidate pair before pruning, O(clicks × purchases-per-user) shuffle
volume — or (b) union + ordered window with last(ignorenulls) — one
shuffle on the key, state bounded by the window frame. We use (b):

    union(left tagged, right tagged)
      → window per key ordered by (time, right-first-on-ties)
      → last(right_value, ignorenulls) over unbounded-preceding frame
      → keep left rows

At 100 TB both sides shuffle once on the join key and the sort is
per-key-group; this is the same strategy Flink uses for event-time
temporal joins. Rows on the right with equal timestamps resolve to the
last one in (time, tiebreak) order — deterministic given a tiebreak
column in ``right_values``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    strict: bool = False,
    right_order: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. ``strict=True`` uses ``right_time < left_time``
    (excludes simultaneous rows) by ordering left rows before right rows
    on time ties. ``right_order`` columns break ties between right rows
    sharing a timestamp (the LAST row in that order wins) — without it,
    simultaneous right rows resolve arbitrarily."""
    lcols = left.columns
    order_cols = [c for c in (right_order or []) if c not in right_values]
    l = left.withColumn(_SIDE, F.lit(1)).withColumn("__asof_t", F.col(left_time))
    for v in right_values + order_cols:
        l = l.withColumn(v, F.lit(None))
    r = right.withColumn(_SIDE, F.lit(0)).withColumn("__asof_t", F.col(right_time))
    for c in lcols:
        if c not in right.columns:
            r = r.withColumn(c, F.lit(None))
    cols = (
        [on, "__asof_t", _SIDE]
        + [c for c in lcols if c != on]
        + right_values
        + order_cols
    )
    cols = list(dict.fromkeys(cols))
    unioned = l.select(*cols).unionByName(r.select(*cols))

    # Right rows must precede left rows on time ties so `<=` semantics hold
    # (strict mode flips the tie order to get `<`).
    tie = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    # right-row tiebreaks sort after the side flag: left rows hold nulls in
    # these columns but sides are already separated, so nulls never reorder
    # across the side boundary
    order = [F.col("__asof_t").asc(), tie] + [
        F.col(c).asc() for c in (right_order or [])
    ]
    w = (
        W.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(v, ignorenulls=True).over(w).alias(f"__asof_{v}")
            for v in right_values
        ],
    )
    out = filled.filter(F.col(_SIDE) == 1)
    for v in right_values:
        out = out.withColumn(v, F.col(f"__asof_{v}")).drop(f"__asof_{v}")
    return out.drop(_SIDE, "__asof_t", *order_cols)
