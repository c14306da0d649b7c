"""Multimodal plumbing tests: schema, Arrow batch flow, determinism, and
the documented real-decoder seam."""

from __future__ import annotations

import pytest

from ror_etl_spark.sources.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample,
    media_from_documents,
    resize_nearest,
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


def test_real_decoder_rejects_non_image_payloads(spark):
    # text-bytes fixtures are not PNGs/JPEGs; the real codec must say so
    # rather than hallucinate features
    with pytest.raises(Exception, match="unknown image format"):
        extract_features(_media(spark, n=2), decoder="real").collect()


def test_png_roundtrip_all_filters():
    import numpy as np

    from ror_etl_spark.sources.multimodal import png_decode, png_encode

    for channels in (1, 3, 4):
        for ft in (0, 1, 2):
            data = png_encode(7, 5, channels, lambda y: (3 + y) % 256, ft)
            px = png_decode(data)
            assert px.shape == (5, 7, channels), (channels, ft)
            expect = np.array([[(3 + y) % 256] * 7 * channels for y in range(5)])
            assert (px.reshape(5, -1) == expect).all(), (channels, ft)


def test_png_decode_sub_filter_random_pixels():
    # the Sub unfilter is a vectorized per-lane cumsum — uniform-row
    # fixtures (png_encode) leave it mostly zeros, so drive it with
    # random pixels, every channel count, and Sub mixed among other
    # filters (the carry into/out of a Sub row must survive)
    import struct
    import zlib

    import numpy as np

    from ror_etl_spark.sources.multimodal import PNG_SIG, png_decode

    rng = np.random.default_rng(11)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    for c, color_type in ((1, 0), (2, 4), (3, 2), (4, 6)):
        for filters in ((1,), (1, 2, 1, 0), (4, 1, 3)):
            h, w = 9, 11
            img = rng.integers(0, 256, size=(h, w * c), dtype=np.int32)
            raw = bytearray()
            prev = np.zeros(w * c, dtype=np.int32)
            for y in range(h):
                ft = filters[y % len(filters)]
                raw.append(ft)
                for x in range(w * c):
                    a = int(img[y, x - c]) if x >= c else 0
                    b = int(prev[x])
                    cc = int(prev[x - c]) if x >= c else 0
                    if ft == 0:
                        pred = 0
                    elif ft == 1:
                        pred = a
                    elif ft == 2:
                        pred = b
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - cc
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                    raw.append((int(img[y, x]) - pred) & 0xFF)
                prev = img[y]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
            data = (
                PNG_SIG
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b"")
            )
            assert (png_decode(data).reshape(h, -1) == img).all(), (c, filters)


def test_png_decode_average_and_paeth_filters():
    # hand-filter a known image with Average (3) and Paeth (4) scanlines —
    # the decoder must invert both (spec §9 reference arithmetic)
    import struct
    import zlib

    import numpy as np

    from ror_etl_spark.sources.multimodal import PNG_SIG, png_decode

    rng = np.random.default_rng(42)
    w, h, c = 6, 4, 3
    img = rng.integers(0, 256, size=(h, w * c), dtype=np.int32)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else cc)

    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        ft = 3 if y % 2 == 0 else 4
        raw.append(ft)
        for x in range(w * c):
            a = int(img[y, x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            pred = (a + b) // 2 if ft == 3 else paeth(a, b, cc)
            raw.append((int(img[y, x]) - pred) & 0xFF)
        prev = img[y]

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (png_decode(data).reshape(h, -1) == img).all()


def test_jpeg_header_parse():
    import struct

    from ror_etl_spark.sources.multimodal import decode_image_meta

    sof = struct.pack(">BHHB", 8, 480, 640, 3)  # precision, h, w, ncomp
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"  # APP0 filler
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    )
    meta = decode_image_meta(jpeg)
    assert meta == {
        "fmt": "jpeg", "width": 640, "height": 480, "channels": 3, "bit_depth": 8,
    }


def test_real_features_from_png_media(spark):
    from ror_etl_spark.sources.multimodal import png_media_from_documents

    docs = Tables(spark, SF_SMALL).documents.limit(6)
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(png_media_from_documents(docs), decoder="real").collect()
    }
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, f in feats.items():
        assert f[0] == float(len(raw[mid]) % 64 + 1)  # width
        assert f[1] == float(len(raw[mid]) % 48 + 1)  # height
        assert f[2] == (1.0 if mid % 2 == 0 else 3.0)  # channels
        assert f[3] == 8.0  # bit depth


def test_resize_nearest_real_pixels(spark):
    # real resample: decode the resized payload and check BOTH dimensions
    # and exact pixel identity against index-sampling the original decode
    from ror_etl_spark.sources.multimodal import (
        png_decode,
        png_media_from_documents,
        resize_nearest_px,
    )

    docs = Tables(spark, SF_SMALL).documents.limit(6)
    media = png_media_from_documents(docs)
    orig = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    out = resize_nearest(media, 32, 24).collect()
    assert len(out) == 6
    for r in out:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 24
        px = png_decode(bytes(r["content"]))
        assert px.shape[:2] == (24, 32)
        expect = resize_nearest_px(png_decode(orig[r["media_id"]]), 32, 24)
        assert (px == expect).all(), r["media_id"]


def test_resize_nearest_passes_non_png_through(spark):
    # fake (non-PNG) payloads must come back byte-identical, meta intact —
    # rewriting meta for bytes we didn't touch would lie
    src = {
        r["media_id"]: (bytes(r["content"]), r["meta"])
        for r in _media(spark, n=5).collect()
    }
    out = resize_nearest(_media(spark, n=5), 64, 48).collect()
    for r in out:
        content, meta = src[r["media_id"]]
        assert bytes(r["content"]) == content
        assert r["meta"] == meta


def test_frame_sample_explodes_by_metadata(spark):
    # non-APNG payloads keep the metadata-driven plumbing: n_frames=1 for
    # image fixtures → exactly one frame row each, payload untouched
    src = {r["media_id"]: bytes(r["content"]) for r in _media(spark, n=5).collect()}
    rows = frame_sample(_media(spark, n=5), every_n=1).collect()
    assert len(rows) == 5
    assert all(r["frame_idx"] == 0 for r in rows)
    assert all(bytes(r["content"]) == src[r["media_id"]] for r in rows)


def test_video_frame_sampling_metadata_fallback(spark):
    """Non-APNG video payload: n_frames metadata drives the explosion."""
    rows = [(1, b"fakevideo", ("video", 640, 480, None, 5000, 100))]
    media = spark.createDataFrame(
        rows, "media_id long, content binary, meta struct<kind:string,width:int,height:int,sample_rate:int,duration_ms:int,n_frames:int>"
    )
    out = frame_sample(media, every_n=10).collect()
    assert [r["frame_idx"] for r in out] == list(range(0, 100, 10))
    assert all(r["meta"]["kind"] == "video" for r in out)


def test_apng_roundtrip_all_filters():
    import numpy as np

    from ror_etl_spark.sources.multimodal import apng_decode_frames, apng_encode

    for c in (1, 3, 4):
        for ft in (0, 1, 2):
            data = apng_encode(
                7, 5, c, 4, lambda f, y: (11 * f + 3 * y) % 256, ft
            )
            frames = apng_decode_frames(data)
            assert len(frames) == 4
            for f, px in enumerate(frames):
                assert px.shape == (5, 7, c)
                expect = np.array(
                    [[(11 * f + 3 * y) % 256] * 7 * c for y in range(5)],
                    dtype=np.uint8,
                ).reshape(5, 7, c)
                assert (px == expect).all(), (c, ft, f)


def test_plain_png_decodes_as_single_frame():
    from ror_etl_spark.sources.multimodal import (
        apng_decode_frames,
        png_decode,
        png_encode,
    )

    data = png_encode(6, 4, 3, lambda y: (40 + y) % 256, 1)
    frames = apng_decode_frames(data)
    assert len(frames) == 1
    assert (frames[0] == png_decode(data)).all()


def test_real_frame_sampling_decodes_kept_frames(spark):
    """APNG payloads: every kept output row is a standalone still PNG whose
    pixels equal the source animation's frame — real decode, not metadata."""
    from ror_etl_spark.sources.multimodal import (
        apng_media_from_documents,
        png_decode,
    )

    docs = Tables(spark, SF_SMALL).documents.limit(8)
    media = apng_media_from_documents(docs)
    n_frames = {
        r["media_id"]: r["meta"]["n_frames"] for r in media.collect()
    }
    out = frame_sample(media, every_n=2).collect()
    by_media: dict[int, list] = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in by_media.items():
        assert [r["frame_idx"] for r in rows] == list(range(0, n_frames[mid], 2))
        for r in rows:
            px = png_decode(bytes(r["content"]))
            f = r["frame_idx"]
            # fixture rule: pixel[f, y] = (doc_id + 7 f + y) % 256
            assert all(
                (px[y] == (mid + 7 * f + y) % 256).all()
                for y in range(px.shape[0])
            )
            assert r["meta"]["n_frames"] == 1 and r["meta"]["kind"] == "image"


def test_wav_roundtrip_and_parse_errors():
    from ror_etl_spark.sources.multimodal import wav_encode, wav_parse

    samples = [0, 1, -1, 32767, -32768, 12345]
    parsed = wav_parse(wav_encode(44100, samples))
    assert parsed["sample_rate"] == 44100
    assert list(parsed["samples"]) == samples

    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        wav_parse(b"\x89PNG\r\n\x1a\nnot audio")


def test_audio_stats_matches_generation_rule(spark):
    from ror_etl_spark.sources.multimodal import audio_stats, wav_media_from_documents

    docs = spark.createDataFrame(
        [(7, "abcdefgh"), (8, "xy")], "doc_id long, text string"
    )
    rows = {r["media_id"]: r for r in audio_stats(wav_media_from_documents(docs)).collect()}
    # doc 7: 32 samples of ((7*31+i) % 65536) - 32768
    exp = [((7 * 31 + i) % 65536) - 32768 for i in range(32)]
    assert rows[7]["n_samples"] == 32
    assert rows[7]["duration_ms"] == 32 * 1000 // 8000
    assert abs(rows[7]["mean_amp"] - sum(exp) / 32) < 1e-9
    assert rows[8]["n_samples"] == 8


def test_average_hash_general_pixels_match_reference(spark):
    """Pin the GENERAL per-pixel aHash kernel on non-uniform images
    (horizontal+vertical gradients, RGB and gray) against a double-loop
    reference: decode→8×8 nearest→channel-mean gray→mean threshold
    (cross-multiplied)→MSB-first packbits hex."""
    import numpy as np

    from ror_etl_spark.sources.multimodal import (
        average_hash,
        png_encode_pixels,
        resize_nearest_px,
    )

    rng_imgs = []
    for mid, (h, w, c) in enumerate([(33, 47, 3), (8, 8, 1), (50, 20, 3)]):
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = (yy * 7 + xx * 13 + mid * 29) % 256
        px = np.repeat(base[:, :, None], c, axis=2).astype(np.uint8)
        if c == 3:  # make channels genuinely differ
            px[:, :, 1] = (px[:, :, 1] + 40) % 256
            px[:, :, 2] = (px[:, :, 2] + 90) % 256
        rng_imgs.append((mid, px))

    def ref_hash(px):
        small = resize_nearest_px(px.astype(np.int64), 8, 8)
        gray = small.sum(axis=2) // small.shape[2]
        total = int(gray.sum())
        bits = []
        for y in range(8):
            for x in range(8):
                bits.append(1 if gray[y, x] * 64 > total else 0)
        out = bytearray()
        for i in range(0, 64, 8):
            b = 0
            for j in range(8):
                b = (b << 1) | bits[i + j]
            out.append(b)
        return bytes(out).hex()

    rows = [(mid, png_encode_pixels(px)) for mid, px in rng_imgs]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r["ahash"] for r in average_hash(media).collect()}
    for mid, px in rng_imgs:
        assert got[mid] == ref_hash(px)
    # gradients must produce a mixed-bit hash, not the uniform ff/00 rows
    assert any(b not in ("ff", "00") for b in
               [got[0][i:i + 2] for i in range(0, 16, 2)])


def test_ahash_dupes_query_groups_consistently(spark):
    from ror_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["multimodal_image_ahash_dupes"](spark, SF_SMALL).collect()
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["ahash"], []).append(r)
    assert any(len(v) > 1 for v in by_hash.values()), "expect dup groups"
    for group in by_hash.values():
        assert all(r["n_dupes"] == len(group) for r in group)
        keepers = [r for r in group if r["keep"]]
        assert len(keepers) == 1
        assert keepers[0]["media_id"] == min(r["media_id"] for r in group)


def test_audio_downsample_roundtrip_general_samples(spark):
    """Decimation on an ARBITRARY (non-closed-form) sample stream: parse
    → [::3] → re-encode at rate/3 → parse must reproduce exactly the
    numpy-sliced samples and scaled rate."""
    import numpy as np

    from ror_etl_spark.sources.multimodal import (
        audio_downsample,
        wav_encode,
        wav_parse,
    )

    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=1001).astype(int).tolist()
    media = spark.createDataFrame(
        [(1, wav_encode(9000, samples))], "media_id long, content binary"
    )
    out = audio_downsample(media, factor=3).collect()[0]
    parsed = wav_parse(bytes(out["content"]))
    assert parsed["sample_rate"] == 3000
    assert list(parsed["samples"]) == samples[::3]
    assert out["meta"]["sample_rate"] == 3000


def test_pixel_digest_collides_across_filter_types_only_when_pixels_equal(spark):
    """The defining property: same pixels under DIFFERENT PNG filters →
    same digest (file bytes differ); one changed pixel → different
    digest."""
    import numpy as np

    from ror_etl_spark.sources.multimodal import (
        pixel_digest,
        png_encode,
        png_encode_pixels,
    )

    # same uniform-rows image, filter None vs Sub vs Up
    imgs = [
        (1, png_encode(10, 6, 3, lambda y: (7 + y) % 256, 0)),
        (2, png_encode(10, 6, 3, lambda y: (7 + y) % 256, 1)),
        (3, png_encode(10, 6, 3, lambda y: (7 + y) % 256, 2)),
        (4, png_encode(10, 6, 3, lambda y: (8 + y) % 256, 0)),  # different
    ]
    assert len({c for _, c in imgs}) == 4, "file bytes must all differ"
    px = np.zeros((6, 10, 3), dtype=np.uint8)
    for y in range(6):
        px[y, :, :] = (7 + y) % 256
    px2 = px.copy()
    px2[3, 4, 1] ^= 1  # one-bit pixel change
    imgs += [(5, png_encode_pixels(px)), (6, png_encode_pixels(px2))]
    media = spark.createDataFrame(imgs, "media_id long, content binary")
    got = {r["media_id"]: r["px_md5"] for r in pixel_digest(media).collect()}
    assert got[1] == got[2] == got[3] == got[5]
    assert got[4] != got[1]
    assert got[6] != got[5]
