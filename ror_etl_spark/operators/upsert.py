"""MERGE-style upsert and SCD2 history tracking, emulated on plain
parquet tables (no Delta/Iceberg jars in this environment — with a lakehouse
format these become single MERGE INTO statements; the dataflow below is
what those engines execute internally).

Upsert = anti-join (unchanged target rows) ∪ source (new + updated rows):
one shuffle on the key, full-replace write — the reference's
WRITE_TRUNCATE world model (SURVEY §1.4) applied to incremental feeds.

SCD2 keeps history: matched keys close their current row (valid_to set)
and append a new open row; unmatched source keys append as open rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """Last-writer-wins upsert: source rows replace same-key target rows,
    new keys append. Columns must match."""
    assert set(target.columns) == set(source.columns), "schemas must match"
    kept = target.join(source.select(key), on=key, how="left_anti")
    return kept.unionByName(source)


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply a batch of updates to an SCD2 history table.

    ``history`` columns: payload + key + valid_from + valid_to (null = open
    row). ``updates`` columns: payload + key + ts_col (change timestamp).
    Open rows for updated keys close at the update timestamp; every update
    opens a new row. One shuffle on the key."""
    upd_keyed = updates.withColumnRenamed(ts_col, "__new_from")
    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    closing = (
        open_rows.join(
            F.broadcast(upd_keyed.select(key, "__new_from")), on=key, how="inner"
        )
        .withColumn(valid_to, F.col("__new_from"))
        .drop("__new_from")
    )
    still_open = open_rows.join(upd_keyed.select(key), on=key, how="left_anti")
    opening = (
        upd_keyed.withColumnRenamed("__new_from", valid_from)
        .withColumn(valid_to, F.lit(None).cast(history.schema[valid_to].dataType))
    )
    return closed_rows.unionByName(closing).unionByName(still_open).unionByName(opening)
