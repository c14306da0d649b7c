"""Multimodal plumbing tests: schema, Arrow batch flow, determinism, and
the documented real-decoder seam."""

from __future__ import annotations

import pytest

from ror_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_stub,
    media_from_documents,
    resize_stub,
)
from ror_etl_spark.tables import Tables
from tests.conftest import SF_SMALL


def _media(spark, n=20):
    docs = Tables(spark, SF_SMALL).documents.limit(n)
    return media_from_documents(docs)


def test_media_schema_and_payload(spark):
    m = _media(spark)
    row = m.first()
    assert isinstance(row["content"], (bytes, bytearray))
    assert row["meta"]["kind"] == "image"
    assert m.count() == 20


def test_extract_features_deterministic(spark):
    a = {r["media_id"]: r["features"] for r in extract_features(_media(spark)).collect()}
    b = {r["media_id"]: r["features"] for r in extract_features(_media(spark)).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)


def test_extract_features_sha_matches_content(spark):
    import hashlib

    m = _media(spark, n=3)
    raw = {r["media_id"]: bytes(r["content"]) for r in m.collect()}
    out = {r["media_id"]: r["content_sha"] for r in extract_features(m).collect()}
    for mid, content in raw.items():
        assert out[mid] == hashlib.sha256(content).hexdigest()


def test_real_decoder_seam_raises(spark):
    with pytest.raises(Exception, match="PIL|ffmpeg|NotImplemented"):
        extract_features(_media(spark, n=2), decoder="real").collect()


def test_resize_updates_meta_only(spark):
    out = resize_stub(_media(spark, n=5), 64, 48).collect()
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 48 for r in out)


def test_frame_sample_explodes_by_metadata(spark):
    rows = frame_sample_stub(_media(spark, n=5), every_n=1).collect()
    # n_frames=1 for image fixtures → exactly one frame row each
    assert len(rows) == 5
    assert all(r["frame_idx"] == 0 for r in rows)


def test_video_frame_sampling(spark):
    """Video-shaped metadata: n_frames drives the sample explosion."""
    from pyspark.sql import functions as F

    rows = [(1, b"fakevideo", ("video", 640, 480, None, 5000, 100))]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, meta struct<kind:string,width:int,height:int,sample_rate:int,duration_ms:int,n_frames:int>"
    )
    out = frame_sample_stub(media, every_n=10).collect()
    assert [r["frame_idx"] for r in out] == list(range(0, 100, 10))
    assert all(r["meta"]["kind"] == "video" for r in out)
