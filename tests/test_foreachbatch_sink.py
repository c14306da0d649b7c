"""foreachBatch MERGE sink: latest-per-user state, idempotent on batch
replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from ror_etl_spark.streaming.events import read_events_stream
from ror_etl_spark.streaming.sinks import ParquetUpsertSink
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def _run_sink(spark, tmp_path, subdir):
    from ror_etl_spark.streaming.stateful import running_user_stats

    stream = running_user_stats(read_events_stream(spark, SF_SMALL))
    sink = ParquetUpsertSink(spark, str(tmp_path / subdir / "state"))
    q = sink.attach(stream, str(tmp_path / subdir / "ckpt"))
    q.processAllAvailable()
    q.stop()
    return sink


def test_sink_holds_latest_state_per_user(spark, tmp_path):
    sink = _run_sink(spark, tmp_path, "a")
    state = spark.read.parquet(sink.path)
    got = {r["user_id"]: (r["n_events"], r["total"]) for r in state.collect()}
    batch = (
        Tables(spark, SF_SMALL)
        .events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("s"))
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want
    # exactly one row per key — MERGE, not append
    assert state.count() == state.select("user_id").distinct().count()


def test_sink_is_idempotent_on_replayed_batch(spark, tmp_path):
    sink = _run_sink(spark, tmp_path, "b")
    before = sorted(
        tuple(r) for r in spark.read.parquet(sink.path).drop("__batch_id").collect()
    )
    # replay batch 0 manually — the ledger must reject it
    replay = spark.read.parquet(sink.path).drop("__batch_id").limit(5)
    sink.process_batch(replay, batch_id=0)
    after = sorted(
        tuple(r) for r in spark.read.parquet(sink.path).drop("__batch_id").collect()
    )
    assert after == before
