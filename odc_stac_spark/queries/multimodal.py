"""Multimodal queries surfaced through the driver contract.

The demo media column is a deterministic SIMG image per doc_id
(operators/multimodal.py: width 16+doc_id%8, height 16, 3 channels, pixel
value (doc_id*37 + k*11 + y*5 + x*3) % 256) — so the *results* of the real
binary pipeline (encode → Arrow transport → executor decode → numpy stats)
have an exact relational image DuckDB can compute from first principles.
The hash match therefore gates the whole binary path end-to-end; byte
layout is additionally tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import pyspark.sql.functions as F

from ..operators.multimodal import (
    audio_features,
    decode_metadata,
    demo_audio_df,
    demo_image_stats,
    demo_media_df,
    image_dhash,
    image_stats,
)
from . import register, scoped_persist


@register(
    "mm_image_metadata",
    oracle="""
    SELECT doc_id,
           CAST(16 + doc_id % 8 AS INT) AS width,
           16 AS height,
           3 AS channels,
           CAST((16 + doc_id % 8) * 16 * 3 AS BIGINT) AS payload_bytes
    FROM documents
    """,
    doc="multimodal: binary media column → typed metadata via header-only "
    "mapInPandas parse (no payload copy).",
    tags=("multimodal",),
)
def mm_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_metadata(demo_media_df(spark, sf_dir))


@register(
    "mm_image_stats",
    oracle="""
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           MIN(v) AS p_min,
           MAX(v) AS p_max
    FROM (
      SELECT d.doc_id, (d.doc_id * 37 + k.k * 11 + y.y * 5 + x.x * 3) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS k) k
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS x) x
      WHERE x.x < 16 + d.doc_id % 8
    )
    GROUP BY doc_id
    """,
    doc="multimodal: per-image feature extraction (decode + numpy stats) "
    "over Arrow batches — the model-forward-pass slot.",
    tags=("multimodal",),
)
def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir)


@register(
    "mm_audio_features",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, i.i,
             ((d.doc_id * 31 + i.i * 7) % 201) - 100 AS s
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 1498)) AS i) i
      WHERE i.i < 1000 + d.doc_id % 500
    ),
    zc AS (
      SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE sgn <> prev_sgn) AS BIGINT)
                 AS zero_crossings
      FROM (SELECT doc_id, i, sign(s) AS sgn,
                   LAG(sign(s)) OVER (PARTITION BY doc_id ORDER BY i)
                       AS prev_sgn
            FROM samples WHERE s <> 0)
      GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           16000 AS sample_rate,
           ROUND(COUNT(*) * 1000.0 / 16000, 4) AS duration_ms,
           ROUND(sqrt(AVG(CAST(a.s AS DOUBLE) * a.s)), 6) AS rms,
           MIN(zc.zero_crossings) AS zero_crossings
    FROM samples a JOIN zc ON zc.doc_id = a.doc_id
    GROUP BY a.doc_id
    """,
    doc="multimodal audio: binary SAUD clips → decode + DSP features "
    "(RMS, zero-crossing rate, duration) over Arrow batches; the demo "
    "clips are a pure function of doc_id so DuckDB recomputes the "
    "expected features from first principles — the hash match gates the "
    "entire binary audio path.",
    tags=("multimodal", "audio"),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(demo_audio_df(spark, sf_dir))


@register(
    "mm_video_framesample",
    oracle="""
    WITH px AS (
      SELECT d.doc_id, f.f, y.y, x.x,
             (d.doc_id * 37 + f.f * 17 + y.y * 5 + x.x * 3) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS f) f
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 11)) AS x) x
      WHERE f.f < 4 + d.doc_id % 4 AND x.x < 8 + d.doc_id % 4
    )
    SELECT doc_id,
           CAST(MAX(f) + 1 AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT f) FILTER (WHERE f % 2 = 0) AS BIGINT)
               AS kept_frames,
           CAST(8 + doc_id % 4 AS INT) AS width,
           8 AS height,
           ROUND(AVG(v) FILTER (WHERE f % 2 = 0), 6) AS kept_mean
    FROM px
    GROUP BY doc_id
    """,
    doc="multimodal video: binary SVID clips → decode → every-2nd-frame "
    "sampling → per-clip stats over Arrow batches (the decode→sample→"
    "batch-encode shape of a video training pipeline; real mp4 decode is "
    "the documented ffmpeg slot). Demo clips are a pure function of "
    "doc_id so the hash match gates the whole binary video path.",
    tags=("multimodal", "video"),
)
def mm_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import demo_video_df, video_frame_features

    return video_frame_features(demo_video_df(spark, sf_dir), every=2)


@register(
    "mm_video_mp4_demux",
    # frame f of doc d is a UNIFORM even-valued 16x24 grayscale image
    # (value 2*((d*31 + f*17) % 128)) — lossless through baseline JPEG at
    # quality 50 (pure-DC blocks), so the oracle recomputes the decoded
    # frame stats exactly; clips have 3 + d % 3 frames
    oracle="""
    WITH f AS (
      SELECT d.doc_id, ff.f, 2 * ((d.doc_id * 31 + ff.f * 17) % 128) AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS f) ff
      WHERE ff.f < 3 + d.doc_id % 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(*) FILTER (WHERE f % 2 = 0) AS BIGINT) AS kept_frames,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           ROUND(AVG(v) FILTER (WHERE f % 2 = 0), 6) AS kept_mean
    FROM f GROUP BY doc_id
    """,
    doc="HASH-GATED mp4 (ISO BMFF) demux: per-doc Motion-JPEG mp4 files "
    "— real ftyp/mdat/moov with full stsd/stts/stsc/stsz/stco sample "
    "tables (operators/codecs.py encode_mp4_mjpeg) — are muxed on the "
    "executors, shipped as binary rows, then demuxed through the "
    "VIDEO_DECODERS seam (generic sample-table walk) with every-2nd-"
    "frame sampling. Fixture frames are exactly lossless through the "
    "JPEG codec, so the hash gates container + sample tables + frame "
    "decode end-to-end. Compressed codecs (avc1/hev1) refuse loudly "
    "toward the documented ffmpeg seam.",
    tags=("multimodal", "video", "mp4"),
)
def mm_video_mp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.codecs import encode_mp4_mjpeg
    from ..operators.multimodal import video_frame_features
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                d = int(i)
                frames = [
                    np.full((16, 24), 2 * ((d * 31 + f * 17) % 128), np.uint8)
                    for f in range(3 + d % 3)
                ]
                media.append(encode_mp4_mjpeg(frames, fps=5, quality=50))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": media, "media_type": "video/mp4"}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return video_frame_features(docs.mapInPandas(gen, schema), every=2)


@register(
    "mm_video_fmp4_demux",
    # same frame derivation as mm_video_mp4_demux — the FRAGMENTED (moof)
    # container must demux to identical frames, so the oracle is shared
    oracle="""
    WITH f AS (
      SELECT d.doc_id, ff.f, 2 * ((d.doc_id * 31 + ff.f * 17) % 128) AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 5)) AS f) ff
      WHERE ff.f < 3 + d.doc_id % 3
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(*) FILTER (WHERE f % 2 = 0) AS BIGINT) AS kept_frames,
           CAST(24 AS INT) AS width,
           CAST(16 AS INT) AS height,
           ROUND(AVG(v) FILTER (WHERE f % 2 = 0), 6) AS kept_mean
    FROM f GROUP BY doc_id
    """,
    doc="HASH-GATED FRAGMENTED mp4 (fMP4/DASH/CMAF) demux: per-doc "
    "Motion-JPEG movie-fragment files — ftyp + moov with EMPTY sample "
    "tables + mvex/trex + per-fragment moof[tfhd/tfdt/trun] + mdat "
    "(operators/codecs.py encode_mp4_mjpeg_fragmented) — demux through "
    "the trun sample-run walk (ISO 14496-12 §8.8) with every-2nd-frame "
    "sampling; frames are lossless through the JPEG codec so the hash "
    "gates the fragment layout end-to-end. Segmented mp4 is what "
    "streaming corpora actually contain; compressed codecs (avc1/hev1) "
    "still refuse toward the ffmpeg seam.",
    tags=("multimodal", "video", "mp4", "fmp4"),
)
def mm_video_fmp4_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.codecs import encode_mp4_mjpeg_fragmented
    from ..operators.multimodal import video_frame_features
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                d = int(i)
                frames = [
                    np.full((16, 24), 2 * ((d * 31 + f * 17) % 128), np.uint8)
                    for f in range(3 + d % 3)
                ]
                media.append(
                    encode_mp4_mjpeg_fragmented(
                        frames, fps=5, quality=50,
                        frames_per_fragment=1 + d % 3,
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": media, "media_type": "video/mp4"}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return video_frame_features(docs.mapInPandas(gen, schema), every=2)


@register(
    "mm_image_resize_stats",
    # resized pixel (i, j) of channel k samples source pixel
    # (y, x) = (i*16//8, j*w//8) with w = 16 + doc_id % 8 — the same
    # nearest-neighbor index math as operators/multimodal.resize_nearest.
    oracle="""
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           MIN(v) AS p_min,
           MAX(v) AS p_max
    FROM (
      SELECT d.doc_id,
             (d.doc_id * 37 + k.k * 11
              + ((i.i * 16) // 8) * 5
              + ((j.j * (16 + d.doc_id % 8)) // 8) * 3) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS k) k
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS i) i
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS j) j
    )
    GROUP BY doc_id
    """,
    doc="multimodal: decode → nearest-neighbor resize to 8×8 → re-encode "
    "→ stats, fused into ONE Arrow mapInPandas pass (the "
    "thumbnail/preprocess slot; r17 — the composed 3-stage chain planned "
    "three Python eval nodes and shipped the pixels across the JVM "
    "boundary between each pair); the oracle recomputes every resized "
    "pixel from the SIMG formula, so the hash gates the full "
    "decode-resize-encode-decode chain.",
    tags=("multimodal",),
)
def mm_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, out_w=8, out_h=8)


PHASH_HAM_T = 5  # near-dup threshold; planted cluster members land at 0-4
PHASH_BANDS = 4  # 4 × 16-bit bands over the 64-bit dHash

# The oracle recomputes the ENTIRE pipeline from first principles: the
# planted-near-dup pixel formula (operators/multimodal.py
# synth_image_neardup), integer channel-sum gray, 9×8 nearest-neighbor
# sampling (h=16 → ys = yq*2; xs = (xq*w)//9), the 64 brighter-than-left
# bits packed into two uint32 halves, the 4×16-bit LSH banding AND the
# Hamming verify — so the hash gate covers decode → hash → block →
# verify end-to-end, including the banding semantics (a pair at
# hamming ≤ T that shares NO band is correctly absent on both sides).
_PHASH_ORACLE = """
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 < 3 THEN doc_id - doc_id % 10
                  ELSE doc_id END AS b,
             CASE WHEN doc_id % 10 < 3 THEN doc_id % 10 ELSE 0 END AS m
      FROM documents
    ),
    dim AS (SELECT *, 16 + b % 8 AS w FROM d),
    grid AS (
      SELECT dim.doc_id, dim.b, dim.m, dim.w, yq.yq, xq.xq,
             (yq.yq * 2) * dim.w + ((xq.xq * dim.w) // 9) AS idx
      FROM dim
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS yq) yq
      CROSS JOIN (SELECT UNNEST(generate_series(0, 8)) AS xq) xq
    ),
    gray AS (
      SELECT doc_id, yq, xq,
             SUM(((b*73 + k.k*11 + idx*97
                   + (b % 17) * (idx % 19) * 53
                   + (b % 29) * (idx % 23) * 89) % 251
                  + CASE WHEN idx % 29 = 0 THEN m * 40 ELSE 0 END) % 251) AS g
      FROM grid CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS k) k
      GROUP BY doc_id, yq, xq
    ),
    bits AS (
      SELECT a.doc_id, a.yq * 8 + a.xq AS pos,
             CASE WHEN r.g > a.g THEN 1 ELSE 0 END AS bit
      FROM gray a JOIN gray r
        ON r.doc_id = a.doc_id AND r.yq = a.yq AND r.xq = a.xq + 1
      WHERE a.xq < 8
    ),
    hashes AS (
      SELECT doc_id,
             SUM(CASE WHEN pos < 32 THEN bit * (CAST(1 AS BIGINT) << (31 - pos))
                      ELSE 0 END) AS hash_hi,
             SUM(CASE WHEN pos >= 32 THEN bit * (CAST(1 AS BIGINT) << (63 - pos))
                      ELSE 0 END) AS hash_lo
      FROM bits GROUP BY doc_id
    ),
    bands AS (
      SELECT h.doc_id, h.hash_hi, h.hash_lo, bi.bi AS band_i,
             CASE bi.bi WHEN 0 THEN h.hash_hi // 65536
                        WHEN 1 THEN h.hash_hi % 65536
                        WHEN 2 THEN h.hash_lo // 65536
                        ELSE h.hash_lo % 65536 END AS band_v
      FROM hashes h
      CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS bi) bi
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.hash_hi, b.hash_hi))
                + bit_count(xor(a.hash_lo, b.hash_lo)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band_i = b.band_i AND a.band_v = b.band_v
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.hash_hi, b.hash_hi))
          + bit_count(xor(a.hash_lo, b.hash_lo)) <= 5
"""


@register(
    "mm_image_phash_neardup",
    oracle=_PHASH_ORACLE,
    doc="IMAGE near-duplicate detection via perceptual hash — the "
    "image-side MinHash: decode binary media → 64-bit dHash (integer "
    "gray, 9×8 nearest downsample, brighter-than-left bits) inside one "
    "Arrow-batched mapInPandas pass, then 4×16-bit LSH banding "
    "(candidates share ≥1 band — never all-pairs) and an exact Hamming "
    "verify ≤ 5. One (hash_hi, hash_lo) pair per image crosses the "
    "shuffle, never pixels; at 100 TB the band join is the same "
    "bucketed equi-join shape as dedup_minhash_lsh.",
    tags=("multimodal", "dedup"),
)
def mm_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = demo_media_df(spark, sf_dir, media_type="image/x-simg+neardup")
    hashed = scoped_persist(image_dhash(media))
    band_arr = F.array(
        F.shiftright("hash_hi", 16),
        F.col("hash_hi").bitwiseAND(F.lit(65535)),
        F.shiftright("hash_lo", 16),
        F.col("hash_lo").bitwiseAND(F.lit(65535)),
    )
    bands = hashed.select(
        "doc_id",
        "hash_hi",
        "hash_lo",
        F.posexplode(band_arr).alias("band_i", "band_v"),
    )
    a = bands.select(
        "band_i",
        "band_v",
        F.col("doc_id").alias("doc_a"),
        F.col("hash_hi").alias("hi_a"),
        F.col("hash_lo").alias("lo_a"),
    )
    b = bands.select(
        "band_i",
        "band_v",
        F.col("doc_id").alias("doc_b"),
        F.col("hash_hi").alias("hi_b"),
        F.col("hash_lo").alias("lo_b"),
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return (
        a.join(b, ["band_i", "band_v"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= PHASH_HAM_T)
        # a pair can collide in several bands; hamming is deterministic,
        # so duplicates are identical rows — dedup after the cheap filter
        .distinct()
    )


_PX_STATS_ORACLE = """
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           MIN(v) AS p_min,
           MAX(v) AS p_max
    FROM (
      SELECT d.doc_id, (d.doc_id * 37 + k.k * 11 + y.y * 5 + x.x * 3) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 2)) AS k) k
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS x) x
      WHERE x.x < 16 + d.doc_id % 8
    )
    GROUP BY doc_id
    """


@register(
    "mm_image_png_codec",
    oracle=_PX_STATS_ORACLE,
    doc="multimodal with a REAL codec: images are encoded as genuine PNG "
    "(operators/codecs.py — pure-stdlib zlib DEFLATE + filter pipeline "
    "per the W3C spec), shipped as binary rows, and decoded back inside "
    "executors through the DECODERS media-type seam. Same pixel content "
    "as mm_image_stats, so the same first-principles oracle gates the "
    "full real-PNG encode→Arrow→decode→stats path end-to-end.",
    tags=("multimodal", "codec"),
)
def mm_image_png_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/png")


@register(
    "mm_image_jp2_codec",
    oracle=_PX_STATS_ORACLE,
    doc="multimodal with the REAL JPEG2000 codec (operators/jp2.py — "
    "ISO/IEC 15444-1 Part 1 from scratch: MQ-coded EBCOT code-blocks, "
    "5/3 reversible DWT, RCT, LRCP packets): per-doc RGB images are "
    "encoded as genuine lossless JP2 on the executors, shipped as "
    "binary rows, and decoded back through the DECODERS seam. JP2's "
    "reversible path is exactly lossless on arbitrary content, so the "
    "same first-principles pixel oracle as mm_image_stats hash-gates "
    "the full encode→Arrow→decode→stats bitstream round trip.",
    tags=("multimodal", "codec", "jp2"),
)
def mm_image_jp2_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/jp2")


@register(
    "mm_image_gif_codec",
    oracle=_PX_STATS_ORACLE,
    doc="multimodal with the REAL GIF codec (operators/gif.py — GIF89a "
    "from scratch: variable-width LZW with clear/EOI and the 4096-entry "
    "cap, global color table, sub-block framing): per-doc RGB images "
    "are encoded as genuine GIF files on the executors (palette formats "
    "are exactly lossless for ≤256-color content, which the synthetic "
    "images are by construction) and decoded back through the DECODERS "
    "seam; the same first-principles pixel oracle as mm_image_stats "
    "hash-gates the full encode→Arrow→decode→stats bitstream round "
    "trip.",
    tags=("multimodal", "codec", "gif"),
)
def mm_image_gif_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/gif")


@register(
    "mm_image_jp2_lossy",
    oracle=_PX_STATS_ORACLE,
    doc="multimodal with the LOSSY JPEG2000 profile (operators/jp2.py — "
    "9/7 irreversible CDF float DWT, deadzone scalar quantization with "
    "expounded (εb, μb) step sizes, mid-point dequantization; the "
    "profile real aerial/satellite visual products use): per-doc RGB "
    "images are encoded at a fine base step (1/1024 — quantization "
    "error < ½ LSB, so uint8 content reconstructs exactly after "
    "rounding) and decoded back through the DECODERS seam; the exact "
    "reconstruction lets the same first-principles pixel oracle "
    "hash-gate the whole lossy machinery: float lifting, quantizer, "
    "dequantizer, ICT, clipping.",
    tags=("multimodal", "codec", "jp2", "lossy"),
)
def mm_image_jp2_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/jp2+lossy")


@register(
    "mm_image_webp_codec",
    oracle=_PX_STATS_ORACLE,
    doc="multimodal with the REAL WebP codec (operators/webp.py — "
    "RFC 9649 VP8L from scratch: canonical prefix codes, LZ77 with the "
    "2D distance mapping, subtract-green transform): per-doc RGB images "
    "are encoded as genuine lossless WebP files on the executors, "
    "shipped as binary rows, and decoded back through the DECODERS "
    "seam. VP8L is exactly lossless on arbitrary content, so the same "
    "first-principles pixel oracle as mm_image_stats hash-gates the "
    "full encode→Arrow→decode→stats bitstream round trip.",
    tags=("multimodal", "codec", "webp"),
)
def mm_image_webp_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/webp")


@register(
    "mm_image_webp_lossy",
    # per-doc grayscale 4x4-lattice image (h=16, w=16+doc_id%8):
    # pixel (y, x) = (doc_id*37 + (y//4)*29 + (x//4)*13) % 256. The VP8
    # profile reconstructs lattice content EXACTLY (DC-only residuals at
    # qi=0 — operators/vp8.py docstring), and the decoder's RGB output
    # replicates the gray channel 3x, which leaves mean/std/min/max
    # unchanged — so the single-channel oracle gates the full lossy
    # bitstream: bool coder, mode trees, token cats, WHT/DCT, borders.
    oracle="""
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           MIN(v) AS p_min,
           MAX(v) AS p_max
    FROM (
      SELECT d.doc_id,
             (d.doc_id * 37 + (y.y // 4) * 29 + (x.x // 4) * 13) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS x) x
      WHERE x.x < 16 + d.doc_id % 8
    )
    GROUP BY doc_id
    """,
    doc="multimodal with the LOSSY WebP codec (operators/vp8.py — RFC 6386 "
    "VP8 keyframe from scratch: boolean arithmetic coder, keyframe mode "
    "trees, per-band/context token probabilities, WHT Y2 plane, all intra "
    "predictors, in-loop deblocking): per-doc grayscale lattice images are "
    "encoded as genuine RIFF/WEBP files with a 'VP8 ' chunk on the "
    "executors and decoded back through the DECODERS seam; the lattice "
    "profile reconstructs exactly, so a first-principles pixel oracle "
    "hash-gates the whole lossy bitstream round trip. The reference reads "
    "lossy WebP via GDAL's libwebp delegation (loader/_rio.py).",
    tags=("multimodal", "codec", "webp", "lossy"),
)
def mm_image_webp_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return demo_image_stats(spark, sf_dir, media_type="image/webp+lossy")


@register(
    "mm_audio_wav_codec",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, i.i,
             ((d.doc_id * 31 + i.i * 7) % 201) - 100 AS s
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 1498)) AS i) i
      WHERE i.i < 1000 + d.doc_id % 500
    ),
    zc AS (
      SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE sgn <> prev_sgn) AS BIGINT)
                 AS zero_crossings
      FROM (SELECT doc_id, i, sign(s) AS sgn,
                   LAG(sign(s)) OVER (PARTITION BY doc_id ORDER BY i)
                       AS prev_sgn
            FROM samples WHERE s <> 0)
      GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           16000 AS sample_rate,
           ROUND(COUNT(*) * 1000.0 / 16000, 4) AS duration_ms,
           ROUND(sqrt(AVG(CAST(a.s AS DOUBLE) * a.s)), 6) AS rms,
           MIN(zc.zero_crossings) AS zero_crossings
    FROM samples a JOIN zc ON zc.doc_id = a.doc_id
    GROUP BY a.doc_id
    """,
    doc="multimodal audio with a REAL codec: clips are genuine RIFF/WAVE "
    "PCM-16 files (operators/codecs.py) decoded per-row through the "
    "AUDIO_DECODERS seam; same sample content as mm_audio_features, so "
    "the same oracle hash-gates the real-WAV encode→decode→DSP path.",
    tags=("multimodal", "audio", "codec"),
)
def mm_audio_wav_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(demo_audio_df(spark, sf_dir, media_type="audio/wav"))


@register(
    "mm_audio_flac_codec",
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, i.i,
             ((d.doc_id * 31 + i.i * 7) % 201) - 100 AS s
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 1498)) AS i) i
      WHERE i.i < 1000 + d.doc_id % 500
    ),
    zc AS (
      SELECT doc_id,
             CAST(COUNT(*) FILTER (WHERE sgn <> prev_sgn) AS BIGINT)
                 AS zero_crossings
      FROM (SELECT doc_id, i, sign(s) AS sgn,
                   LAG(sign(s)) OVER (PARTITION BY doc_id ORDER BY i)
                       AS prev_sgn
            FROM samples WHERE s <> 0)
      GROUP BY doc_id
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           16000 AS sample_rate,
           ROUND(COUNT(*) * 1000.0 / 16000, 4) AS duration_ms,
           ROUND(sqrt(AVG(CAST(a.s AS DOUBLE) * a.s)), 6) AS rms,
           MIN(zc.zero_crossings) AS zero_crossings
    FROM samples a JOIN zc ON zc.doc_id = a.doc_id
    GROUP BY a.doc_id
    """,
    doc="multimodal audio with the REAL FLAC codec (operators/flac.py — "
    "RFC 9639 from scratch: fixed/LPC prediction, partitioned rice "
    "residuals, CRC-8/16 and STREAMINFO MD5 verification): clips are "
    "genuine FLAC files encoded on the executors and decoded back "
    "through the AUDIO_DECODERS seam; FLAC is exactly lossless, so the "
    "same sample oracle as mm_audio_wav_codec hash-gates the whole "
    "predict→rice→bitstream round trip.",
    tags=("multimodal", "audio", "codec", "flac"),
)
def mm_audio_flac_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return audio_features(demo_audio_df(spark, sf_dir, media_type="audio/flac"))


@register(
    "mm_image_jpeg_codec",
    # Block-constant, even-valued grayscale images are LOSSLESS through
    # baseline JPEG at quality 50 (pure-DC blocks; (v-128)*8 is an exact
    # multiple of the DC quantizer 16), so the oracle recomputes the
    # decoded stats exactly: each 8x8 block of the 16x16 image carries
    # value 2*((doc_id*13 + by*7 + bx*3) % 128), 64 pixels per block.
    oracle="""
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           CAST(MIN(v) AS INT) AS p_min,
           CAST(MAX(v) AS INT) AS p_max
    FROM (
      SELECT d.doc_id, 2 * ((d.doc_id * 13 + b.by * 7 + b.bx * 3) % 128) AS v
      FROM documents d
      CROSS JOIN (
        SELECT y.by, x.bx
        FROM (SELECT UNNEST(generate_series(0, 1)) AS by) y
        CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS bx) x
      ) b
      CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS p) px
    )
    GROUP BY doc_id
    """,
    doc="multimodal with the REAL JPEG codec (operators/jpeg.py — baseline "
    "ITU-T T.81 from scratch: DCT, Annex-K quantization, Huffman entropy "
    "coding, byte stuffing): per-doc grayscale images are encoded as "
    "genuine JFIF on the executors, shipped as binary rows, and decoded "
    "back through the DECODERS seam. The fixture is constructed so the "
    "lossy codec is exactly lossless (pure-DC even-valued blocks), which "
    "makes the whole bitstream round trip SQL-hash-gateable.",
    tags=("multimodal", "codec"),
)
def mm_image_jpeg_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jpeg_dc_even_df(spark, sf_dir, progressive=False)


def _jpeg_dc_even_df(
    spark: SparkSession, sf_dir: str, progressive: bool
) -> DataFrame:
    """The DC-even lossless JPEG fixture → decoded image stats; the
    ``progressive`` flag selects the SOF0 vs SOF2 (multi-scan) encoding
    of the SAME pixel content, so one oracle gates both bitstreams."""
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.jpeg import encode_jpeg
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by, bx = np.mgrid[0:2, 0:2]
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                v = (2 * ((int(i) * 13 + by * 7 + bx * 3) % 128)).astype(np.uint8)
                img = np.repeat(np.repeat(v, 8, 0), 8, 1)
                media.append(encode_jpeg(img, quality=50, progressive=progressive))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": media, "media_type": "image/jpeg"}
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return image_stats(docs.mapInPandas(gen, schema))


@register(
    "mm_image_jpeg_progressive",
    # same DC-even lossless fixture as mm_image_jpeg_codec — see there
    oracle="""
    SELECT doc_id,
           ROUND(AVG(v), 6) AS mean,
           ROUND(STDDEV_POP(v), 6) AS std,
           CAST(MIN(v) AS INT) AS p_min,
           CAST(MAX(v) AS INT) AS p_max
    FROM (
      SELECT d.doc_id, 2 * ((d.doc_id * 13 + b.by * 7 + b.bx * 3) % 128) AS v
      FROM documents d
      CROSS JOIN (
        SELECT y.by, x.bx
        FROM (SELECT UNNEST(generate_series(0, 1)) AS by) y
        CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS bx) x
      ) b
      CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS p) px
    )
    GROUP BY doc_id
    """,
    doc="multimodal with PROGRESSIVE JPEG (SOF2, ITU-T T.81 Annex G — the "
    "dominant encoding of large web images): each per-doc image is "
    "emitted as a genuine multi-scan progressive file (interleaved DC "
    "first + refinement, two AC spectral bands each first + successive-"
    "approximation refinement with EOB-run coding) and decoded back "
    "through the DECODERS seam by the from-scratch progressive decoder "
    "(operators/jpeg.py _decode_scan_prog: coefficients accumulate "
    "across scans, one IDCT at EOI). The DC-even fixture makes the "
    "lossy pipeline exactly lossless, so the same first-principles "
    "oracle as mm_image_jpeg_codec hash-gates the whole multi-scan "
    "bitstream.",
    tags=("multimodal", "codec", "jpeg", "progressive"),
)
def mm_image_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jpeg_dc_even_df(spark, sf_dir, progressive=True)


@register(
    "mm_webdataset_pipeline",
    # sample i (0..199, two shards of 100): label = i % 7; image = 16x16
    # grayscale of 8x8 blocks v(by,bx) = 2*((i*13 + by*7 + bx*3) % 128),
    # JPEG q50 (exactly lossless for pure-DC even blocks).
    oracle="""
    SELECT printf('%05d', i) AS key,
           CAST(i % 7 AS INT) AS label,
           ROUND(AVG(v), 6) AS mean,
           CAST(MIN(v) AS INT) AS p_min,
           CAST(MAX(v) AS INT) AS p_max
    FROM (
      SELECT i.i AS i, 2 * ((i.i * 13 + b.by * 7 + b.bx * 3) % 128) AS v
      FROM (SELECT UNNEST(generate_series(0, 199)) AS i) i
      CROSS JOIN (
        SELECT y.by, x.bx
        FROM (SELECT UNNEST(generate_series(0, 1)) AS by) y
        CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS bx) x
      ) b
      CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS p) px
    )
    GROUP BY i
    """,
    doc="WebDataset tar-shard ingestion end-to-end: two tar shards in the "
    "public {key}.{ext} sample convention (sources/webdataset.py) are "
    "scanned one-partition-per-shard via streaming mapInPandas, grouped "
    "into ext→bytes sample maps, and each sample's REAL JPEG payload is "
    "decoded through the codec seam next to its classification label. "
    "The oracle recomputes every decoded pixel from the fixture formula, "
    "hash-gating shard scan + sample grouping + JPEG decode together.",
    tags=("multimodal", "webdataset", "codec"),
)
def mm_webdataset_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.jpeg import encode_jpeg
    from ..operators.multimodal import DECODERS
    from ..sources.webdataset import group_samples, read_webdataset, write_webdataset_shard

    # deterministic on-disk fixture shards (idempotent rewrite; tiny)
    by, bx = np.mgrid[0:2, 0:2]
    shards = []
    for s in range(2):
        path = os.path.join(tempfile.gettempdir(), f"odc_stac_spark_wds_{s:03d}.tar")
        samples = []
        for i in range(s * 100, (s + 1) * 100):
            v = (2 * ((i * 13 + by * 7 + bx * 3) % 128)).astype(np.uint8)
            img = np.repeat(np.repeat(v, 8, 0), 8, 1)
            samples.append(
                (
                    f"{i:05d}",
                    {
                        "cls": str(i % 7).encode(),
                        "jpg": encode_jpeg(img, quality=50),
                        "txt": f"synthetic caption {i}".encode(),
                    },
                )
            )
        write_webdataset_shard(path, samples)
        shards.append(path)

    samples_df = group_samples(read_webdataset(spark, shards))
    decoders = dict(DECODERS)

    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("label", IntegerType()),
            StructField("mean", DoubleType()),
            StructField("p_min", IntegerType()),
            StructField("p_max", IntegerType()),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, parts in zip(pdf["key"], pdf["parts"]):
                px = decoders["image/jpeg"](bytes(parts["jpg"])).astype(np.float64)
                rows.append(
                    {
                        "key": key,
                        "label": int(bytes(parts["cls"]).decode()),
                        "mean": round(float(px.mean()), 6),
                        "p_min": int(px.min()),
                        "p_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return samples_df.mapInPandas(feats, schema)


@register(
    "mm_video_avi_codec",
    # clip i: 4 + i%4 frames of 16x16 grayscale; frame f is 8x8 blocks of
    # v(f,by,bx) = 2*((i*13 + f*17 + by*7 + bx*3) % 128) — lossless through
    # MJPEG q50 (pure-DC even blocks); features keep every 2nd frame.
    oracle="""
    WITH px AS (
      SELECT d.doc_id, f.f,
             2 * ((d.doc_id * 13 + f.f * 17 + b.by * 7 + b.bx * 3) % 128) AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS f) f
      CROSS JOIN (
        SELECT y.by, x.bx
        FROM (SELECT UNNEST(generate_series(0, 1)) AS by) y
        CROSS JOIN (SELECT UNNEST(generate_series(0, 1)) AS bx) x
      ) b
      CROSS JOIN (SELECT UNNEST(generate_series(0, 63)) AS p) px
      WHERE f.f < 4 + d.doc_id % 4
    )
    SELECT doc_id,
           CAST(MAX(f) + 1 AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT f) FILTER (WHERE f % 2 = 0) AS BIGINT)
               AS kept_frames,
           16 AS width,
           16 AS height,
           ROUND(AVG(v) FILTER (WHERE f % 2 = 0), 6) AS kept_mean
    FROM px
    GROUP BY doc_id
    """,
    doc="multimodal video with a REAL container+codec: per-doc clips are "
    "genuine Motion-JPEG AVI files (RIFF container from the public AVI "
    "spec, one baseline JPEG per 00dc chunk — operators/codecs.py + "
    "operators/jpeg.py), decoded per-row through the VIDEO_DECODERS seam, "
    "then every-2nd-frame sampled (decode_avi_mjpeg also supports "
    "decode-time frame skipping via its `every` arg for pipelines that "
    "don't need the total frame count). Lossless-by-construction frames "
    "make the whole container + codec round trip SQL-hash-gateable.",
    tags=("multimodal", "video", "codec"),
)
def mm_video_avi_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.codecs import encode_avi_mjpeg
    from ..operators.multimodal import video_frame_features
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by, bx = np.mgrid[0:2, 0:2]
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = []
                for f in range(4 + i % 4):
                    v = (2 * ((i * 13 + f * 17 + by * 7 + bx * 3) % 128)).astype(np.uint8)
                    frames.append(np.repeat(np.repeat(v, 8, 0), 8, 1))
                media.append(encode_avi_mjpeg(frames, quality=50))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": media,
                    "media_type": "video/x-msvideo",
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return video_frame_features(docs.mapInPandas(gen, schema), every=2)


@register(
    "mm_video_gif_sample",
    # clip i: 3 + i%3 full-frame 8x8 gray frames, v(f,y,x) =
    # 2*((i*13 + f*17 + y*7 + x*3) % 100) → ≤100 distinct colors fits the
    # palette; GIF is lossless so the RGBA composite is (v,v,v,255) and
    # the 4-channel mean is (3·Σv + 255·N)/(4N) exactly
    oracle="""
    WITH px AS (
      SELECT d.doc_id, f.f,
             2 * ((d.doc_id * 13 + f.f * 17 + y.y * 7 + x.x * 3) % 100) AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 4)) AS f) f
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS x) x
      WHERE f.f < 3 + d.doc_id % 3
    )
    SELECT doc_id,
           CAST(MAX(f) + 1 AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT f) FILTER (WHERE f % 2 = 0) AS BIGINT)
               AS kept_frames,
           8 AS width,
           8 AS height,
           ROUND(
             (3 * SUM(v) FILTER (WHERE f % 2 = 0)
              + 255 * COUNT(*) FILTER (WHERE f % 2 = 0))
             / (4.0 * COUNT(*) FILTER (WHERE f % 2 = 0)), 6
           ) AS kept_mean
    FROM px
    GROUP BY doc_id
    """,
    doc="multimodal video via ANIMATED GIF (operators/gif.py — GIF is a "
    "video format for sampling purposes): per-doc clips are genuine "
    "multi-frame GIF89a files (variable-width LZW, graphic-control "
    "delays, NETSCAPE loop) decoded and composited per-row through the "
    "VIDEO_DECODERS seam, then every-2nd-frame sampled. Palette formats "
    "are exactly lossless, so the RGBA frame stats are SQL-reproducible "
    "and the whole container + LZW + compositing path hash-gates.",
    tags=("multimodal", "video", "codec", "gif"),
)
def mm_video_gif_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.gif import encode_gif
    from ..operators.multimodal import video_frame_features
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        y, x = np.mgrid[0:8, 0:8]
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = []
                for f in range(3 + i % 3):
                    v = (2 * ((i * 13 + f * 17 + y * 7 + x * 3) % 100)).astype(np.uint8)
                    frames.append(np.stack([v, v, v], axis=-1))
                media.append(encode_gif(frames, delays=[4] * len(frames)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": media,
                    "media_type": "image/gif",
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return video_frame_features(docs.mapInPandas(gen, schema), every=2)


@register(
    "mm_video_h264_keyframes",
    # clip i: 2 + i%3 grayscale 4x4-lattice frames (16x24), pixel
    # v(f,y,x) = (i*13 + f*17 + (y//4)*7 + (x//4)*3) % 256. The H.264
    # exact-lattice profile (operators/h264.py, QP=0 DC-only residuals,
    # deblocking off) reconstructs EXACTLY, and the decoder's RGB
    # triplication leaves the mean unchanged — so a first-principles
    # oracle gates CAVLC, intra prediction, the integer transforms and
    # the avcC/avc1 mp4 plumbing end-to-end.
    oracle="""
    WITH px AS (
      SELECT d.doc_id, f.f,
             (d.doc_id * 13 + f.f * 17 + (y.y // 4) * 7 + (x.x // 4) * 3)
                 % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS f) f
      CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 23)) AS x) x
      WHERE f.f < 2 + d.doc_id % 3
    )
    SELECT doc_id,
           CAST(MAX(f) + 1 AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT f) FILTER (WHERE f % 2 = 0) AS BIGINT)
               AS kept_frames,
           24 AS width,
           16 AS height,
           ROUND(SUM(v) FILTER (WHERE f % 2 = 0)
                 / (1.0 * COUNT(*) FILTER (WHERE f % 2 = 0)), 6) AS kept_mean
    FROM px
    GROUP BY doc_id
    """,
    doc="multimodal video with the REAL H.264/AVC codec (operators/"
    "h264.py — ITU-T H.264 baseline intra from scratch: Exp-Golomb "
    "headers, CAVLC coeff_token/level/total_zeros/run_before, all "
    "Intra_4x4/16x16/chroma prediction modes, integer inverse transforms "
    "incl. the luma-DC Hadamard, I_PCM): per-doc clips are genuine "
    "avc1-in-mp4 files (length-prefixed IDR NALUs + avcC config, ISO "
    "14496-15) demuxed and decoded per-row through the VIDEO_DECODERS "
    "seam, then every-2nd-frame sampled. The exact-lattice profile "
    "reconstructs exactly, so the frame stats are SQL-reproducible and "
    "the whole mux + entropy-decode + reconstruction path hash-gates. "
    "The reference delegates compressed video to ffmpeg/GDAL.",
    tags=("multimodal", "video", "codec", "h264"),
)
def mm_video_h264_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..operators.codecs import encode_mp4_h264
    from ..operators.multimodal import video_frame_features
    from ..sources.tables import load_table

    # compute-sized partitioning for the Python codec stage (the KB-scale
    # doc-id scan otherwise collapses to one partition and serializes the
    # encode/decode work — see operators/multimodal.py demo_media_df)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by, bx = np.mgrid[0:4, 0:6]
        for pdf in batches:
            media = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = []
                for f in range(2 + i % 3):
                    cells = ((i * 13 + f * 17 + by * 7 + bx * 3) % 256).astype(
                        np.uint8
                    )
                    frames.append(cells.repeat(4, 0).repeat(4, 1))
                media.append(encode_mp4_h264(frames, fps=5))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": media,
                    "media_type": "video/mp4",
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return video_frame_features(docs.mapInPandas(gen, schema), every=2)


def _spectral_golden_sql() -> str:
    from ._spectral_golden import SPECTRAL_GOLDEN_SQL

    return SPECTRAL_GOLDEN_SQL


@register(
    "mm_audio_spectral",
    # FFT is genuinely non-relational, so the oracle is a GOLDEN table:
    # expected features for every gated doc_id (0..499 at sf0.001/sf0.01),
    # computed offline by tools/gen_spectral_golden.py directly from the
    # synth-clip formula + numpy rFFT — independent of the engine's WAV
    # codec, AUDIO_DECODERS seam and Arrow transport, all of which the
    # hash therefore gates end-to-end.
    oracle=_spectral_golden_sql(),
    doc="multimodal audio frequency-domain features: decode (AUDIO_DECODERS "
    "seam) → numpy rFFT → dominant bin / spectral centroid / band "
    "energies over Arrow batches. Hash-gated against a golden FFT table "
    "(tools/gen_spectral_golden.py) and pytest-verified against a direct "
    "numpy reference.",
    tags=("multimodal", "audio"),
)
def mm_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_spectral_features

    return audio_spectral_features(demo_audio_df(spark, sf_dir, media_type="audio/wav"))


@register(
    "mm_audio_resample",
    # 16 kHz clips → 8 kHz: out position i maps to source 2i exactly, so
    # linear interpolation degenerates to decimation — the oracle
    # recomputes every output sample from the clip formula.
    oracle="""
    WITH samples AS (
      SELECT d.doc_id, i.i,
             CAST(((d.doc_id * 31 + i.i * 7) % 201) - 100 AS DOUBLE) AS s
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 1498)) AS i) i
      WHERE i.i < 1000 + d.doc_id % 500
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM samples GROUP BY doc_id),
    resampled AS (
      SELECT s.doc_id, s.s
      FROM samples s JOIN cnt USING (doc_id)
      WHERE s.i % 2 = 0 AND s.i // 2 < CAST(FLOOR(n / 2.0) AS BIGINT)
    )
    SELECT c.doc_id,
           CAST(c.n AS BIGINT) AS n_in,
           CAST(FLOOR(c.n / 2.0) AS BIGINT) AS n_out,
           r.rms_out,
           r.checksum
    FROM cnt c
    JOIN (
      SELECT doc_id,
             ROUND(sqrt(AVG(s * s)), 6) AS rms_out,
             ROUND(SUM(s), 6) AS checksum
      FROM resampled GROUP BY doc_id
    ) r ON r.doc_id = c.doc_id
    """,
    doc="multimodal audio resampling: WAV decode → linear-interpolation "
    "SR normalization 16 kHz→8 kHz → stats, per clip over Arrow batches "
    "(operators/multimodal.resample_audio — the polyphase-resampler "
    "slot). The 2:1 ratio makes interpolation exact decimation, so the "
    "oracle recomputes every output sample and the hash gates the whole "
    "decode→resample chain.",
    tags=("multimodal", "audio"),
)
def mm_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_resample_features

    return audio_resample_features(
        demo_audio_df(spark, sf_dir, media_type="audio/wav"), dst_rate=8000
    )


SCENE_CUT_T = 40.0  # MAD threshold; synth clips spread 17-113


@register(
    "mm_video_scene_cuts",
    # the oracle recomputes every frame-pair mean-abs-diff from the SVID
    # pixel formula — all-integer until the final mean, so the gate is
    # exact (mad spread on the synth corpus: 17..112.6)
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id, f.f, y.y, x.x,
             (d.doc_id * 37 + f.f * 17 + y.y * 5 + x.x * 3) % 256 AS v
      FROM documents d
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS f) f
      CROSS JOIN (SELECT UNNEST(generate_series(0, 7)) AS y) y
      CROSS JOIN (SELECT UNNEST(generate_series(0, 11)) AS x) x
      WHERE f.f < 4 + d.doc_id % 4 AND x.x < 8 + d.doc_id % 4)
    SELECT a.doc_id, CAST(a.f AS INT) AS frame_from,
           ROUND(AVG(abs(b.v - a.v)), 6) AS mad,
           CAST(AVG(abs(b.v - a.v)) > {SCENE_CUT_T} AS INT) AS is_cut
    FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.f = a.f + 1
                       AND b.y = a.y AND b.x = a.x
    GROUP BY 1, 2
    """,
    doc="multimodal video scene-cut detection: decode → per-consecutive-"
    "frame-pair mean absolute difference → threshold, inside Arrow "
    "batches (the clip-segmentation pass that turns raw video into "
    "training samples). One row per frame pair leaves the Python "
    "island; integer pixel math makes the gate exact.",
    tags=("multimodal", "video"),
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import demo_video_df, video_scene_cuts

    return video_scene_cuts(demo_video_df(spark, sf_dir), threshold=SCENE_CUT_T)


@register(
    "mm_image_aspect_buckets",
    # header-only parse: width = 16 + doc_id % 8, height = 16 — the
    # oracle recomputes the bucket assignment from the formula
    oracle="""
    SELECT ratio_bucket, CAST(count(*) AS BIGINT) AS n_images,
           CAST(ceil(count(*) / 64.0) AS BIGINT) AS n_batches,
           ROUND(AVG((16 + doc_id % 8) * 1.0 / 16), 6) AS mean_ratio
    FROM (SELECT doc_id,
                 CAST(round((16 + doc_id % 8) * 8.0 / 16) AS BIGINT) AS ratio_bucket
          FROM documents)
    GROUP BY 1
    """,
    doc="aspect-ratio bucketing for variable-resolution image training "
    "(the SDXL-style batching prep): HEADER-ONLY metadata parse (no "
    "pixel decode) -> quantized w/h ratio bucket -> per-bucket batch "
    "budget. The metadata pass reads bytes proportional to image COUNT "
    "not image SIZE, and bucketing is map-side; only the bucket "
    "histogram (bounded by the ratio grid) aggregates.",
    tags=("multimodal", "image"),
)
def mm_image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import decode_metadata, demo_media_df

    meta = decode_metadata(demo_media_df(spark, sf_dir))
    ratio = F.col("width") * F.lit(1.0) / F.col("height")
    return (
        meta.select(
            "doc_id", F.round(ratio * 8).cast("bigint").alias("ratio_bucket"), ratio.alias("r")
        )
        .groupBy("ratio_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.ceil(F.count(F.lit(1)) / 64.0).alias("n_batches"),
            F.round(F.avg("r"), 6).alias("mean_ratio"),
        )
    )


@register(
    "mm_audio_vad_frames",
    # oracle: samples from the SAUD synth formula s(d,i) = ((d*31 + i*7)
    # % 201) - 100 over i < 1000 + d % 500; all-integer energies
    oracle="""
    SELECT doc_id, CAST(frame AS INT) AS frame,
           CAST(count(*) AS INT) AS flen,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(SUM(s * s) > 3350 * count(*) AS INT) AS active
    FROM (
        SELECT d.doc_id, i.i // 100 AS frame,
               ((d.doc_id * 31 + i.i * 7) % 201) - 100 AS s
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(0, 1499)) AS i) i
        WHERE i.i < 1000 + d.doc_id % 500)
    GROUP BY 1, 2
    """,
    doc="multimodal audio VAD framing: decode -> 100-sample frames -> "
    "exact int64 energy -> active/silent label inside Arrow batches; "
    "one row per frame leaves the Python island, never samples. The "
    "segmentation pass that turns raw audio into training windows "
    "(real speech VAD drops into the same frame loop).",
    tags=("multimodal", "audio"),
)
def mm_audio_vad_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import audio_energy_frames, demo_audio_df

    return audio_energy_frames(demo_audio_df(spark, sf_dir))
