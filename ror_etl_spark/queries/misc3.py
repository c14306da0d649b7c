"""Operator-surface batch 3: bitmap-exact distinct counting, mode /
percentile_disc aggregates, try_-function error handling, correlated
LATERAL join, and LLM-pipeline document chunking."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ror_etl_spark.registry import query
from ror_etl_spark.tables import Tables
from ror_etl_spark.queries.util import ordered, r2


@query(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (Spark 3.5+ bitmap functions):
    bucket ids into 32k-bit bitmaps, OR them per group, sum the bit
    counts. Unlike HLL/theta this is exact at ANY cardinality, and the
    shuffle carries one bitmap per (group, bucket) instead of one row
    per distinct id — the standard high-cardinality COUNT(DISTINCT)
    rewrite for integer keys at 100 TB."""
    e = Tables(spark, sf_dir).events
    per_bucket = (
        e.groupBy("event_type", F.expr("bitmap_bucket_number(user_id)").alias("b"))
        .agg(F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))").alias("c"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("c").alias("distinct_users"))
        .orderBy("event_type")
    )


@query(
    "agg_mode_percentile_disc",
    oracle="""
    SELECT CAST(mode(year(o_orderdate)) AS INT) AS mode_year,
           quantile_disc(o_totalprice, 0.5) AS p50_disc,
           quantile_disc(o_totalprice, 0.9) AS p90_disc
    FROM orders
    """,
)
def agg_mode_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and discrete percentiles. percentile_disc returns actual
    data values (no interpolation), so cross-engine equality is exact
    with no rounding; the fixture's per-year counts are distinct, so the
    mode is unique and deterministic."""
    o = Tables(spark, sf_dir).orders
    return o.agg(
        F.expr("mode(year(o_orderdate))").cast("int").alias("mode_year"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").alias("p50_disc"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").alias("p90_disc"),
    )


@query(
    "scalar_try_funcs",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           round(sum(COALESCE(l_extendedprice / nullif(l_quantity - 10, 0), 0)), 2)
             AS sum_try_div,
           CAST(sum(CASE WHEN ([l_quantity, l_discount])[5] IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oob
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def scalar_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_ error-handling scalars: try_divide yields NULL on /0 instead
    of failing under ANSI mode; try_element_at yields NULL out of bounds.
    The oracle models them with nullif / out-of-range list access."""
    li = Tables(spark, sf_dir).lineitem.filter(F.col("l_orderkey") < 1000)
    tdiv = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 10)
    oob = F.try_element_at(F.array("l_quantity", "l_discount"), F.lit(5))
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum(F.coalesce(tdiv, F.lit(0.0)))).alias("sum_try_div"),
        F.sum(F.when(oob.isNull(), 1).otherwise(0)).cast("long").alias("n_oob"),
    )


_LATERAL_SQL = """
    SELECT u.user_id, l.value AS top_value
    FROM (SELECT DISTINCT user_id FROM events) u,
    LATERAL (SELECT value FROM events e
             WHERE e.user_id = u.user_id
             ORDER BY value DESC, event_id LIMIT 1) l
    ORDER BY u.user_id
"""


@query("lateral_top_event_per_user", oracle=_LATERAL_SQL)
def lateral_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-key ORDER BY + LIMIT — the
    SQL-standard form of per-group top-1. Catalyst decorrelates it into
    a window/aggregate plan, so it shuffles once on the correlation key
    instead of running the inner query per outer row."""
    t = Tables(spark, sf_dir)
    t.view("events")
    return spark.sql(_LATERAL_SQL)


@query(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id, CAST((s - 1) / 40 AS BIGINT) AS chunk_no,
           CAST(len(tk[s : least(s + 49, len(tk))]) AS BIGINT) AS n_tokens,
           array_to_string(tk[s : least(s + 49, len(tk))], ' ') AS chunk_text
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk), 40)) AS s) g
    ORDER BY doc_id, chunk_no
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pipeline document chunking: fixed 50-token windows with
    stride 40 (10-token overlap), one output row per chunk. Pure
    built-ins — split → sequence → explode → slice — so chunking
    runs in codegen with no Python, embarrassingly parallel over docs;
    chunk_no is derived from the stride so no window function is
    needed. At 100 TB this is the map-side prep stage feeding the
    embedding / dedup operators."""
    d = Tables(spark, sf_dir).documents
    toks = d.select("doc_id", F.split("text", " ").alias("tk"))
    return (
        toks.select(
            "doc_id", "tk",
            F.explode(F.sequence(F.lit(1), F.size("tk"), F.lit(40))).alias("s"),
        )
        .select(
            "doc_id",
            ((F.col("s") - 1) / 40).cast("long").alias("chunk_no"),
            F.size(F.slice("tk", F.col("s"), F.lit(50))).cast("long").alias("n_tokens"),
            F.array_join(F.slice("tk", F.col("s"), F.lit(50)), " ").alias("chunk_text"),
        )
        .transform(ordered, "doc_id", "chunk_no")
    )


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT source, count(*) AS n,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           min(sha256(text)) AS min_sha
    FROM documents GROUP BY source ORDER BY source
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary column statistics — the multimodal data model's
    query surface (SURVEY §2.3): payloads live as binary with typed
    metadata beside them; here text is encoded to UTF-8 bytes standing
    in for image/audio blobs (the fixtures carry no real media). Byte
    lengths and content digests aggregate per source shard, all in
    codegen (encode/octet_length/sha2 are JVM built-ins)."""
    d = Tables(spark, sf_dir).documents
    b = F.encode(F.col("text"), "UTF-8")
    return (
        d.select("source", b.alias("b"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.octet_length("b")).alias("total_bytes"),
            F.min(F.sha2("b", 256)).alias("min_sha"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_decode_stats",
    oracle="""
    SELECT doc_id AS media_id,
           'png' AS fmt,
           CAST(length(text) % 64 + 1 AS BIGINT) AS width,
           CAST(length(text) % 48 + 1 AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST((length(text) % 64 + 1) * (length(text) % 48 + 1) AS BIGINT) AS n_pixels,
           round(list_aggregate(
             list_transform(range(0, length(text) % 48 + 1), y -> (doc_id + y) % 256),
             'avg'), 4) AS mean_px
    FROM documents
    ORDER BY media_id
    """,
    priority=2,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over a binary media column: every document becomes
    a valid PNG (dimensions/pixels derived from its columns, PNG filters
    None/Sub/Up rotated per row), then the pure-Python codec
    (sources/multimodal.py: inflate + scanline unfilter, no PIL/ffmpeg)
    recovers header fields and the mean pixel value per image inside an
    Arrow-batched mapInPandas. The oracle predicts every decoded value
    from the generation rule — a decoder bug (filter math, channel
    layout, dimension parse) breaks the hash."""
    from ror_etl_spark.sources.multimodal import png_decode_stats_from_documents

    from ror_etl_spark.operators.util import spread

    # PNG encode+decode is CPU-bound Python work per row — fan the
    # single-file scan out before mapInPandas (14s -> ~1s at sf0.1).
    # r12: fixture + decode fused into ONE mapInPandas (guide §4) — the
    # generated PNG bytes no longer round-trip JVM→Python→JVM between
    # the encode and decode operators.
    d = spread(Tables(spark, sf_dir).documents)
    stats = png_decode_stats_from_documents(d)
    return stats.select(
        "media_id",
        "fmt",
        "width",
        "height",
        "channels",
        "bit_depth",
        "n_pixels",
        F.round("mean_px", 4).alias("mean_px"),
    )


@query(
    "multimodal_resize_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(32 AS BIGINT) AS width,
           CAST(24 AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
           CAST(32 * 24 AS BIGINT) AS n_pixels,
           round(list_aggregate(
             list_transform(range(0, 24),
               y -> (doc_id + (y * (length(text) % 48 + 1)) // 24) % 256),
             'avg'), 4) AS mean_px
    FROM documents
    ORDER BY media_id
    """,
    priority=2,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize (SURVEY §2.3 multimodal row, last stubbed step
    now implemented): PNG fixtures are decoded, nearest-neighbor
    resampled to 32×24 by integer index sampling (src = dst·size//24),
    re-encoded, then decoded AGAIN for stats — so a resampling bug
    anywhere (index math, re-encode, second decode) breaks the hash. The
    oracle replays the sampling rule in SQL: resized row y' shows source
    row (y'·h)//24, whose every pixel is (doc_id + y) % 256."""
    from ror_etl_spark.operators.util import spread
    from ror_etl_spark.sources.multimodal import (
        decode_stats,
        png_media_from_documents,
        resize_nearest,
    )

    d = spread(Tables(spark, sf_dir).documents)
    stats = decode_stats(resize_nearest(png_media_from_documents(d), 32, 24))
    return stats.select(
        "media_id",
        "width",
        "height",
        "channels",
        "n_pixels",
        F.round("mean_px", 4).alias("mean_px"),
    ).transform(ordered, "media_id")


@query(
    "multimodal_frame_sample_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(length(text) % 16 + 1 AS BIGINT) AS width,
           CAST(length(text) % 12 + 1 AS BIGINT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels,
           round(list_aggregate(
             list_transform(range(0, length(text) % 12 + 1),
                            y -> (doc_id + 7 * f + y) % 256),
             'avg'), 4) AS mean_px
    FROM documents,
         LATERAL (SELECT unnest(range(0, length(text) % 6 + 2, 2)) AS f) g
    ORDER BY media_id, frame_idx
    """,
    priority=2,
)
def multimodal_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling (SURVEY §2.3 multimodal row — the last
    stubbed step, now implemented): every document becomes a valid APNG
    (2-7 full-size frames, acTL/fcTL/fdAT per the PNG spec 3rd edition,
    frame pixels closed-form in doc_id/frame/row), the sampler decodes the
    animation chunk-walk + per-frame inflate/unfilter, keeps every 2nd
    frame, re-encodes each kept frame as a standalone still PNG, and the
    stats pass decodes those AGAIN — so container parse, frame split,
    re-encode and second decode are all under the hash. frame_idx rides
    through the still-image stats helper packed into the key (16 > max
    n_frames), unpacked afterwards; the oracle predicts every value from
    the generation rule."""
    from ror_etl_spark.operators.util import spread
    from ror_etl_spark.sources.multimodal import (
        apng_media_from_documents,
        decode_stats,
        frame_sample,
    )

    d = spread(Tables(spark, sf_dir).documents)
    frames = frame_sample(apng_media_from_documents(d), every_n=2)
    packed = frames.select(
        (F.col("media_id") * 16 + F.col("frame_idx")).alias("media_id"), "content"
    )
    stats = decode_stats(packed)
    return stats.select(
        F.floor(F.col("media_id") / 16).cast("long").alias("media_id"),
        (F.col("media_id") % 16).cast("long").alias("frame_idx"),
        "width",
        "height",
        "channels",
        F.round("mean_px", 4).alias("mean_px"),
    ).transform(ordered, "media_id", "frame_idx")


@query(
    "multimodal_audio_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(length(text) * 4 AS BIGINT) AS n_samples,
           CAST(length(text) * 4 * 1000 // 8000 AS BIGINT) AS duration_ms,
           round(list_aggregate(
             list_transform(range(0, length(text) * 4),
                            i -> (doc_id * 31 + i) % 65536 - 32768),
             'avg'), 4) AS mean_amp
    FROM documents
    ORDER BY media_id
    """,
    priority=2,
)
def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode over a binary media column: every document becomes
    a valid PCM16 mono WAV (samples derived from its columns), then the
    chunk-walking RIFF parse (sources/multimodal.py:wav_parse, stdlib
    struct only) recovers sample rate, duration and mean amplitude per
    file inside Arrow-batched mapInPandas. The oracle predicts every
    decoded value from the generation rule — a header-offset or
    endianness bug breaks the hash."""
    from ror_etl_spark.sources.multimodal import audio_stats, wav_media_from_documents

    from ror_etl_spark.operators.util import spread

    d = spread(Tables(spark, sf_dir).documents)
    media = wav_media_from_documents(d)
    stats = audio_stats(media)
    return stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("mean_amp", 4).alias("mean_amp"),
    ).transform(ordered, "media_id")


@query(
    "multimodal_image_ahash_dupes",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(0, 8),
               y -> (doc_id + (y * ((length(text) % 48) + 1)) // 8) % 256
             ) AS r8
      FROM documents),
    h AS (
      SELECT doc_id, r8, list_aggregate(r8, 'sum') AS s FROM px),
    ah AS (
      SELECT doc_id,
             list_aggregate(list_transform(r8,
               v -> CASE WHEN 8 * v > s THEN 'ff' ELSE '00' END),
               'string_agg', '') AS ahash
      FROM h)
    SELECT doc_id AS media_id, ahash,
           CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_dupes,
           doc_id = min(doc_id) OVER (PARTITION BY ahash) AS keep
    FROM ah ORDER BY media_id
    """,
    priority=3,
)
def multimodal_image_ahash_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection via perceptual average-hash: every
    document's real-PNG fixture is decoded (full inflate + unfilter),
    nearest-neighbor downsampled to 8×8, grayscaled, thresholded at the
    image mean into a 64-bit fingerprint, and images sharing a
    fingerprint form a duplicate group (min-id canonical, keep flag) —
    the image-side analogue of the text dedup family, and the standard
    cheap near-dup pass a multimodal pipeline runs before embeddings.

    The oracle replays the hash CLOSED-FORM from the fixture's
    generation rule (resized row y' shows source row (y'·h)//8, whose
    every pixel is (doc_id + y) %% 256; the mean-threshold compare is
    cross-multiplied to integers, 8·v > Σrows), so a bug anywhere in
    decode, resample, packing order, or grouping breaks the driver
    hash. The fixture's uniform scanlines make each hash byte 0xff/0x00;
    the kernel (sources/multimodal.py:average_hash) is the general
    per-pixel implementation and is separately pinned on a non-uniform
    image in tests.

    Scale shape: the codec work is Arrow-batched mapInPandas over a
    spread scan (CPU-bound Python, embarrassingly parallel); only
    (media_id, 16-hex-char hash) rows reach the shuffle — the grouping
    windows partition BY HASH, so dup-group discovery is one
    hash-keyed exchange of fingerprint-sized rows, never pixels."""
    from ror_etl_spark.operators.util import spread
    from ror_etl_spark.sources.multimodal import (
        average_hash,
        png_media_from_documents,
    )
    from pyspark.sql import Window

    d = spread(Tables(spark, sf_dir).documents)
    hashes = average_hash(png_media_from_documents(d), size=8)
    w = Window.partitionBy("ahash")
    return (
        hashes.select(
            "media_id",
            "ahash",
            F.count(F.lit(1)).over(w).alias("n_dupes"),
            (F.col("media_id") == F.min("media_id").over(w)).alias("keep"),
        )
        .transform(ordered, "media_id")
    )


@query(
    "multimodal_audio_downsample_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(4000 AS BIGINT) AS sample_rate,
           CAST((length(text) * 4 + 1) // 2 AS BIGINT) AS n_samples,
           CAST(((length(text) * 4 + 1) // 2) * 1000 // 4000 AS BIGINT)
             AS duration_ms,
           round(list_aggregate(
             list_transform(range(0, length(text) * 4, 2),
                            i -> (doc_id * 31 + i) % 65536 - 32768),
             'avg'), 4) AS mean_amp
    FROM documents
    ORDER BY media_id
    """,
    priority=3,
)
def multimodal_audio_downsample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio downsampling (the audio analogue of the image resize
    row): every document's PCM16 WAV fixture is parsed, decimated 2×
    (keep every other sample, rate 8000 → 4000), re-encoded, then
    parsed AGAIN for stats — so the RIFF walk, the decimation index
    math, the re-encode and the second parse are all under the driver
    hash. The oracle predicts every surviving sample from the
    generation rule (kept sample i is (doc_id·31 + 2i) mod 2¹⁶ −
    2¹⁵).

    Scale shape: two Arrow codec passes over a spread scan, both
    embarrassingly parallel; only (media_id, 4-column stats) rows reach
    the presentation sort."""
    from ror_etl_spark.operators.util import spread
    from ror_etl_spark.sources.multimodal import (
        audio_downsample,
        audio_stats,
        wav_media_from_documents,
    )

    d = spread(Tables(spark, sf_dir).documents)
    stats = audio_stats(audio_downsample(wav_media_from_documents(d), factor=2))
    return stats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        "duration_ms",
        F.round("mean_amp", 4).alias("mean_amp"),
    ).transform(ordered, "media_id")


@query(
    "multimodal_image_pixel_dupes",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             md5(string_agg(
               repeat(lpad(lower(to_hex((doc_id + y) % 256)), 2, '0'),
                      ((length(text) % 64) + 1)
                      * (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END)),
               '' ORDER BY y)) AS px_md5
      FROM documents,
           LATERAL (SELECT unnest(range(0, (length(text) % 48) + 1)) AS y) g
      GROUP BY doc_id, text)
    SELECT doc_id AS media_id, px_md5,
           CAST(count(*) OVER (PARTITION BY px_md5) AS BIGINT) AS n_dupes,
           doc_id = min(doc_id) OVER (PARTITION BY px_md5) AS keep
    FROM px ORDER BY media_id
    """,
    priority=3,
)
def multimodal_image_pixel_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT image dedup at the PIXEL level: decode every PNG fixture and
    group by the digest of the decoded pixel buffer. This is the layer
    file-byte dedup cannot reach — the fixtures deliberately rotate PNG
    filter types (None/Sub/Up by doc_id %% 3), so two images with
    identical pictures usually have DIFFERENT file bytes; only decoding
    exposes the duplicate. Together with the perceptual aHash query this
    completes the image-dedup stack: exact (this), near (aHash),
    semantic (embedding SemDeDup).

    The oracle rebuilds each pixel buffer closed-form from the fixture
    generation rule (row y is (doc_id + y) %% 256 across w·c samples)
    as a hex string and must land on the same md5 the kernel computes
    from actually-decoded bytes — so a decode bug in ANY filter path
    breaks the hash.

    Scale shape: Arrow codec kernel (embarrassingly parallel), then
    only (media_id, 32-hex digest) rows reach the hash-partitioned
    dup-group window."""
    from ror_etl_spark.operators.util import spread
    from ror_etl_spark.sources.multimodal import (
        pixel_digest,
        png_media_from_documents,
    )
    from pyspark.sql import Window

    d = spread(Tables(spark, sf_dir).documents)
    digests = pixel_digest(png_media_from_documents(d))
    w = Window.partitionBy("px_md5")
    return (
        digests.select(
            "media_id",
            "px_md5",
            F.count(F.lit(1)).over(w).alias("n_dupes"),
            (F.col("media_id") == F.min("media_id").over(w)).alias("keep"),
        )
        .transform(ordered, "media_id")
    )
