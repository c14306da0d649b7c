"""Late-data semantics: a watermarked tumbling aggregate must finalize a
window once the watermark passes it and drop events arriving later."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("ts", T.TimestampType()), T.StructField("v", T.LongType())]
)


def _write_batch(dirpath: str, name: str, rows: list[tuple[dt.datetime, int]]):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["ts", "v"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    # microsecond timestamps: pandas defaults to nanos, which Spark's
    # reader can't treat as TimestampType
    table = pa.Table.from_pandas(
        pdf, schema=pa.schema([("ts", pa.timestamp("us")), ("v", pa.int64())])
    )
    pq.write_table(table, os.path.join(dirpath, name))


def test_watermark_drops_late_event(spark, tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # batch 1: two rows in [10:00, 11:00) and one at 11:30 that pushes the
    # watermark (10-min delay) to 11:20, past the first window's end
    _write_batch(str(src), "b1.parquet", [(at(0), 1), (at(5), 1), (at(90), 1)])

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-passed first window (10:30 <
        # watermark 11:20) plus an on-time row advancing the watermark
        _write_batch(str(src), "b2.parquet", [(at(30), 1), (at(150), 1)])
        q.processAllAvailable()
        # batch 3: advance watermark further so remaining windows finalize
        _write_batch(str(src), "b3.parquet", [(at(240), 1)])
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["wstart"]: r["n"] for r in spark.sql("SELECT * FROM t_late").collect()}
    # the 10:00 window finalized with 2 rows — the late 10:30 event was
    # dropped, not added
    assert out[t0] == 2
    # the 11:00 window contains exactly the 11:30 event
    assert out[dt.datetime(2024, 1, 1, 11, 0, 0)] == 1
