"""Streaming durability: a checkpointed file-sink query stopped and
restarted must process new data exactly once — no loss, no duplication."""

from __future__ import annotations

import datetime as dt

from tests.test_watermark import SCHEMA, _write_batch


def _start(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    return (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )


def test_restart_resumes_exactly_once(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()
    t0 = dt.datetime(2024, 1, 1)

    _write_batch(src, "b1.parquet", [(t0, 1), (t0, 2)])
    q = _start(spark, src, out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2

    # new data lands while the query is DOWN; restart from the checkpoint
    _write_batch(src, "b2.parquet", [(t0, 3)])
    q = _start(spark, src, out, ckpt)
    q.processAllAvailable()
    q.stop()

    vals = sorted(r["v"] for r in spark.read.parquet(out).collect())
    assert vals == [1, 2, 3]  # b1 not reprocessed, b2 picked up once

    # a third restart with nothing new must not duplicate anything either
    q = _start(spark, src, out, ckpt)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 3
