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

    Handles multiple updates per key in one batch: updates are chained per
    key in timestamp order with a ``lead()`` window — each update row's
    validity ends where the next one starts, only the latest stays open —
    and the previously-open history row closes at the EARLIEST update's
    timestamp (exactly once). One shuffle on the key. The window's order
    must be total per key, so equal timestamps for one key are rejected —
    they'd make which-update-wins undefined."""
    from pyspark.sql import Window as W

    upd_keyed = updates.withColumnRenamed(ts_col, "__new_from")
    dup_ts = (
        upd_keyed.groupBy(key, "__new_from")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup_ts:
        r = dup_ts[0]
        raise ValueError(
            f"scd2_apply: {r['n']} updates share key={r[key]!r} "
            f"ts={r['__new_from']!r}; per-key timestamps must be unique"
        )
    w = W.partitionBy(key).orderBy("__new_from")
    chained = upd_keyed.withColumn("__next_from", F.lead("__new_from").over(w))
    first_per_key = upd_keyed.groupBy(key).agg(F.min("__new_from").alias("__new_from"))

    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    closing = (
        open_rows.join(F.broadcast(first_per_key), on=key, how="inner")
        .withColumn(valid_to, F.col("__new_from"))
        .drop("__new_from")
    )
    still_open = open_rows.join(upd_keyed.select(key), on=key, how="left_anti")
    opening = (
        chained.withColumnRenamed("__new_from", valid_from)
        .withColumn(
            valid_to, F.col("__next_from").cast(history.schema[valid_to].dataType)
        )
        .drop("__next_from")
    )
    return closed_rows.unionByName(closing).unionByName(still_open).unionByName(opening)
