"""Multimodal column support: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs.

Design (the part that matters at 100 TB):
- media rides in a ``binary`` column next to a ``meta`` struct
  (kind/width/height/sample_rate/duration_ms/n_frames) — one row per
  asset, columnar at rest, so metadata predicates prune without touching
  payload bytes (Parquet column pruning skips the binary column entirely
  for metadata-only queries).
- ingest path: ``spark.read.format("binaryFile")`` for asset directories,
  or any table carrying bytes.
- compute path: ``mapInPandas`` — the payload crosses to Python ONCE per
  Arrow batch, not per row; batch size is controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory is
  bounded by batch_size × max_asset_size.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
environment, so decode is STUBBED: ``decoder="fake"`` produces
deterministic pseudo-decoded output (seeded by content hash) with the
real schema, partitioning and batch shape; ``decoder="real"`` raises
NotImplementedError at the exact seam where the codec call belongs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def read_binary_dir(spark, path: str, glob: str = "*") -> DataFrame:
    """Directory-of-assets source: Spark's binaryFile format yields
    (path, modificationTime, length, content)."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media fixture: documents' text bytes as fake 'image'
    payloads — real binary column, real metadata struct, fake pixels."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.lit("image").alias("kind"),
            (F.length("text") % 640).cast("int").alias("width"),
            (F.length("text") % 480).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for codec output: FEATURE_DIM floats in
    [0, 1) derived from the content digest. NOT a real decode — marks the
    seam where PIL/ffmpeg would run."""
    digest = hashlib.sha256(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """binary → feature vector via mapInPandas (Arrow-batched).

    ``decoder="real"`` is the production seam: plug the codec call in
    ``batch_fn`` — partitioning, schema and batch flow stay identical."""
    if decoder not in {"fake", "real"}:
        raise ValueError(decoder)

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image/audio decode needs PIL/ffmpeg, absent in this "
                    "environment — swap _fake_decode for the codec call here"
                )
            contents = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": contents.map(len).astype("int64"),
                    "content_sha": contents.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": contents.map(lambda b: _fake_decode(bytes(b))),
                }
            )

    return media.mapInPandas(batch_fn, schema=FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payload through mapInPandas with updated
    metadata; the pixel work is the documented NotImplementedError seam."""

    def batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["meta"] = out["meta"].map(
                lambda m: {**m, "width": width, "height": height}
            )
            # real implementation: out["content"] = decode→resize→encode
            yield out

    return media.mapInPandas(batch_fn, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per kept frame index,
    metadata-driven (n_frames), payload untouched in the stub."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
        F.lit(every_n),
    )
    return media.select(
        "media_id",
        F.explode(frames).alias("frame_idx"),
        F.col("meta"),
    )
