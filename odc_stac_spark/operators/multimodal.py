"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas`` (SURVEY north
star: multimodal training-data pipeline).

Real codecs: JPEG (operators/jpeg.py — baseline ITU-T T.81 from scratch),
PNG, BMP and WAV (operators/codecs.py — zlib/DEFLATE, PNG filter pipeline,
RIFF parse) are genuine pure-numpy/stdlib coders installed as defaults in
the DECODERS / AUDIO_DECODERS seams below. mp4/webm video remains the
documented ffmpeg slot (``decode_real_image``); a deterministic in-house
raster format ("SIMG") additionally stands in where tests want byte-exact
oracle behavior for arbitrary pixel content.

SIMG layout: b"SIMG" | ver:u8 | width:u16le | height:u16le | channels:u8 |
payload (width*height*channels bytes, row-major).

Scale notes: records stay (id, binary) rows — Spark shuffles/spills binary
columns natively; mapInPandas streams Arrow record batches so executor
memory is bounded by batch size (spark.sql.execution.arrow.maxRecordsPerBatch),
not partition size. Feature extraction emits narrow numeric rows, so the
wide binary column is pruned from downstream plans.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"SIMG"
HEADER_FMT = "<4sBHHB"  # magic, ver, w, h, c
HEADER_SIZE = struct.calcsize(HEADER_FMT)


def encode_simg(arr: np.ndarray) -> bytes:
    """(h, w, c) uint8 → SIMG bytes."""
    h, w, c = arr.shape
    return struct.pack(HEADER_FMT, MAGIC, 1, w, h, c) + arr.astype(np.uint8).tobytes()


def decode_simg(data: bytes) -> np.ndarray:
    magic, ver, w, h, c = struct.unpack_from(HEADER_FMT, data)
    if magic != MAGIC:
        raise ValueError("not a SIMG payload")
    return np.frombuffer(data, np.uint8, count=w * h * c, offset=HEADER_SIZE).reshape(h, w, c)


def decode_real_image(data: bytes):  # pragma: no cover - env lacks codecs
    """Real-format decode slot (JPEG/PNG via PIL, frames via ffmpeg).
    STUB: image/audio libraries are not installed in this container."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires Pillow, which is not installed; "
            "the SIMG path exercises identical Spark plumbing"
        ) from e
    raise NotImplementedError("unreachable in this environment")


#: media_type → decoder: THE codec seam. A real deployment registers PIL /
#: ffmpeg decoders here (``register_decoder("image/png", pil_decode)``) and
#: every engine path — mapInPandas batch shapes, schemas, partitioning —
#: runs unchanged; tests/test_multimodal.py proves the drop-in contract by
#: injecting a fake decoder through this exact slot.
DECODERS = {"image/x-simg": decode_simg}


def register_decoder(media_type: str, fn) -> None:
    """Install a decoder ``bytes -> (h, w, c) uint8 ndarray`` for a media
    type. Operators SNAPSHOT this dict into their closures at plan-build
    time (``dict(DECODERS)``) — cloudpickle then ships the registered
    functions by value, so Python workers (which import this module fresh
    and would otherwise see only the defaults) decode with them too."""
    DECODERS[media_type] = fn


def decode_image(data: bytes, media_type: str = "image/x-simg") -> np.ndarray:
    """Dispatch decode by media type; unknown types fall through to the
    real-codec stub (NotImplementedError until PIL/ffmpeg exist)."""
    return _decode_with(DECODERS, data, media_type)


def _decode_with(decoders: dict, data: bytes, media_type: str) -> np.ndarray:
    fn = decoders.get(media_type)
    if fn is None:
        return decode_real_image(data)
    return fn(data)


def _batch_types(pdf: pd.DataFrame) -> "pd.Series":
    """Per-row media types for a batch; frames without the column are SIMG
    (the operators' historical default)."""
    if "media_type" in pdf.columns:
        return pdf["media_type"]
    return pd.Series(["image/x-simg"] * len(pdf))


def synth_image(seed: int, w: int = 16, h: int = 16, c: int = 3) -> np.ndarray:
    """Deterministic fake image (stands in for decoded media)."""
    y, x = np.mgrid[0:h, 0:w]
    chans = [((seed * 37 + k * 11 + y * 5 + x * 3) % 256).astype(np.uint8) for k in range(c)]
    return np.stack(chans, axis=-1)


def synth_lattice_gray(seed: int, w: int = 16, h: int = 16, c: int = 1) -> np.ndarray:
    """Deterministic 4x4-block-constant grayscale image — the exact-
    reconstruction profile of the lossy VP8 encoder (operators/vp8.py:
    DC-only residuals at qi=0 hit any per-block constant exactly)."""
    y, x = np.mgrid[0:h, 0:w]
    return ((seed * 37 + (y // 4) * 29 + (x // 4) * 13) % 256).astype(np.uint8)


def synth_image_neardup(seed: int, w: int = 16, h: int = 16, c: int = 3) -> np.ndarray:
    """Deterministic image corpus WITH PLANTED NEAR-DUPLICATES for the
    perceptual-hash dedup path (the default ramp content is too
    degenerate for dedup work — only ~250 distinct images exist, since
    the seed enters the pixel formula additively mod 256).

    Cluster structure mirrors the documents table's text dup clusters:
    seeds with seed%10 < 3 form 3-member clusters sharing a base image
    (base = seed - seed%10 member = seed%10); members differ by a +40·m
    bump on every 29th pixel — a few flipped dHash bits, like a
    re-encoded/slightly-edited copy. Non-cluster seeds are unique.
    Bilinear seed×position terms decorrelate the bases (455 distinct
    hashes in 500 at sf0.01). Width is BASE-derived (16 + base%8, like a
    shared source image), so duplicates exercise the resize-invariance of
    the hash; the w/h args are part of the synth signature but the
    content must be cluster-consistent, so they are ignored.

    Pure integer function of (seed, k, y, x) — the DuckDB oracle
    recomputes expected pixels from first principles, gating the whole
    binary decode→hash→block→verify path.
    """
    b = seed - seed % 10 if seed % 10 < 3 else seed
    m = seed % 10 if seed % 10 < 3 else 0
    width = 16 + b % 8
    y, x = np.mgrid[0:h, 0:width]
    idx = y * width + x
    out = np.empty((h, width, c), np.uint8)
    for k in range(c):
        v = (b * 73 + k * 11 + idx * 97 + (b % 17) * (idx % 19) * 53 + (b % 29) * (idx % 23) * 89) % 251
        out[..., k] = np.where(idx % 29 == 0, (v + m * 40) % 251, v).astype(np.uint8)
    return out


#: media_type → encoder for the demo generators; PNG is a REAL codec
#: (operators/codecs.py), SIMG the deterministic in-house one.
_DEMO_IMAGE_ENCODERS = {"image/x-simg": encode_simg}

#: media_type → pixel synth for the demo generators (default synth_image);
#: lossy VP8's exact profile needs lattice content rather than the SIMG ramp
_DEMO_IMAGE_SYNTH = {}

# planted-near-dup corpus: SIMG payloads (decode_simg reads them), distinct
# media_type so demo_media_df swaps ONLY the pixel content
_DEMO_IMAGE_ENCODERS["image/x-simg+neardup"] = encode_simg
_DEMO_IMAGE_SYNTH["image/x-simg+neardup"] = synth_image_neardup
DECODERS["image/x-simg+neardup"] = decode_simg


def demo_media_df(
    spark: SparkSession, sf_dir: str, media_type: str = "image/x-simg"
) -> DataFrame:
    """documents → (doc_id, media BINARY, media_type) demo table. At scale
    this column comes straight from parquet/webdataset. ``media_type``
    selects the encoding codec — ``image/png`` exercises the real PNG
    coder end-to-end (same pixel content, so the same oracle applies)."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # The encode/decode stages downstream are COMPUTE-bound Python work,
    # so partition by available cores, not by input bytes: the doc-id
    # projection of documents.parquet is KB-scale and otherwise collapses
    # to ONE scan partition (single row group), serializing the whole
    # codec pipeline on one core (measured: mm_image_jp2_lossy 128 s
    # serial vs ~5 s at 32-way — the codec was never the bottleneck).
    # The shuffle moves only the doc ids; at 100 TB a real media column
    # arrives pre-partitioned and maxPartitionBytes does this job.
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    encode = _DEMO_IMAGE_ENCODERS[media_type]
    synth = _DEMO_IMAGE_SYNTH.get(media_type, synth_image)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [
                        encode(synth(int(i), 16 + int(i) % 8, 16, 3))
                        for i in pdf["doc_id"]
                    ],
                    "media_type": media_type,
                }
            )
            yield out

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.mapInPandas(gen, schema)


_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("payload_bytes", LongType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Header-only parse — no payload copy (cheap scan over binary rows)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [struct.unpack_from(HEADER_FMT, b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[2] for m in metas],
                    "height": [m[3] for m in metas],
                    "channels": [m[4] for m in metas],
                    "payload_bytes": [len(b) - HEADER_SIZE for b in pdf["media"]],
                }
            )

    return media.mapInPandas(parse, _META_SCHEMA)


_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
        StructField("p_min", IntegerType()),
        StructField("p_max", IntegerType()),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Feature extraction: per-image pixel stats (the 'embed this image'
    slot — a model forward pass drops into the same mapInPandas body)."""

    decoders = dict(DECODERS)  # snapshot: ships registered codecs to workers

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], _batch_types(pdf)):
                # no float64 astype: numpy computes integer mean/std in a
                # float64 accumulator over the same element sequence, so
                # the values are bit-identical and the 8x-wider temporary
                # copy (the largest allocation of this stage) disappears
                px = _decode_with(decoders, bytes(blob), mt)
                if px.dtype.kind == "f":  # float decoders keep the old
                    px = px.astype(np.float64)  # float64 accumulation
                rows.append(
                    {
                        "doc_id": doc_id,
                        "mean": round(float(px.mean()), 6),
                        "std": round(float(px.std()), 6),
                        "p_min": int(px.min()),
                        "p_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(stats, _STATS_SCHEMA)


_DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("hash_hi", LongType()),
        StructField("hash_lo", LongType()),
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode → integer
    channel-sum gray → 9×8 nearest-neighbor downsample → 64 horizontal
    brighter-than-left bits, returned as two uint32 halves (hash_hi =
    bits 0..31 row-major, hash_lo = bits 32..63) so every downstream
    band/XOR stays in non-negative BIGINT range on both engines.

    All-integer pipeline (sum-gray instead of mean-gray: same ordering,
    no float ties), so the DuckDB oracle reproduces the hash exactly.
    Arrow-batched mapInPandas like every codec stage; at 100 TB this is
    the map-side signature pass of image dedup — one number pair per
    image crosses the shuffle, never pixels."""

    decoders = dict(DECODERS)  # snapshot: ships registered codecs to workers

    def dh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], _batch_types(pdf)):
                px = _decode_with(decoders, bytes(blob), mt)
                # sum with an int64 accumulator instead of widening the
                # whole frame first — identical values, no 8x temporary
                gray = px.sum(axis=2, dtype=np.int64)
                h, w = gray.shape
                yi = (np.arange(8) * h // 8).astype(int)
                xi = (np.arange(9) * w // 9).astype(int)
                g = gray[np.ix_(yi, xi)]
                bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).ravel()
                hi = int(bits[:32].dot(1 << np.arange(31, -1, -1, dtype=np.int64)))
                lo = int(bits[32:].dot(1 << np.arange(31, -1, -1, dtype=np.int64)))
                rows.append({"doc_id": doc_id, "hash_hi": hi, "hash_lo": lo})
            yield pd.DataFrame(rows)

    return media.mapInPandas(dh, _DHASH_SCHEMA)


def resize_nearest(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize inside the executor; emits SIMG again."""

    decoders = dict(DECODERS)

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob, mt in zip(pdf["media"], _batch_types(pdf)):
                px = _decode_with(decoders, bytes(blob), mt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out.append(encode_simg(px[np.ix_(yi, xi)]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out, "media_type": "image/x-simg"})

    return media.mapInPandas(rz, media.schema)


def demo_image_stats(
    spark: SparkSession,
    sf_dir: str,
    media_type: str = "image/x-simg",
    out_w: int | None = None,
    out_h: int | None = None,
) -> DataFrame:
    """The demo encode → decode [→ nearest resize → re-encode → decode]
    → stats chain in ONE Arrow pass.

    Composing the stages as separate operators
    (``image_stats(resize_nearest(demo_media_df(...)))``) plans one
    ``MapInPandas`` node per stage: each node runs its own Python worker
    set and the binary media crosses the JVM↔Arrow boundary between every
    pair of stages (3 nodes → 4 boundary crossings of the payload for the
    resize chain). The per-image work is identical here — same encoder,
    same ``DECODERS`` dispatch, same index math and the same SIMG
    re-encode round trip, so results are bit-for-bit equal — but the
    pixels never leave the worker, and the plan carries a single Python
    eval node. At 100 TB the media column arrives from parquet and the
    fused stage is ``decode → preprocess → featurize`` over that column;
    the demo synth+encode stands in for the scan."""
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # compute-sized partitioning, same rationale as demo_media_df above
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    encode = _DEMO_IMAGE_ENCODERS[media_type]
    synth = _DEMO_IMAGE_SYNTH.get(media_type, synth_image)
    decoders = dict(DECODERS)  # snapshot: ships registered codecs to workers

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["doc_id"]:
                d = int(i)
                # demo_media_df stage: synth + media encode
                blob = encode(synth(d, 16 + d % 8, 16, 3))
                # decode through the registered-codec seam (identical
                # dispatch to image_stats/resize_nearest)
                px = _decode_with(decoders, blob, media_type)
                if out_w is not None and out_h is not None:
                    # resize_nearest stage, including its SIMG re-encode
                    # round trip (lossless for uint8, kept so the fused
                    # path computes exactly what the composed one did)
                    h, w, _ = px.shape
                    yi = (np.arange(out_h) * h // out_h).astype(int)
                    xi = (np.arange(out_w) * w // out_w).astype(int)
                    px = _decode_with(
                        decoders, encode_simg(px[np.ix_(yi, xi)]), "image/x-simg"
                    )
                # image_stats stage (same accumulator notes as image_stats)
                if px.dtype.kind == "f":
                    px = px.astype(np.float64)
                rows.append(
                    {
                        "doc_id": d,
                        "mean": round(float(px.mean()), 6),
                        "std": round(float(px.std()), 6),
                        "p_min": int(px.min()),
                        "p_max": int(px.max()),
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(run, _STATS_SCHEMA)


def frame_sample(media: DataFrame, every: int = 4) -> DataFrame:
    """Video-style frame sampling: treat each image row as a 'frame' strip
    and keep every k-th row — the plumbing a real video pipeline uses
    (decode → sample → re-encode), minus the codec."""

    decoders = dict(DECODERS)

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob, mt in zip(pdf["media"], _batch_types(pdf)):
                px = _decode_with(decoders, bytes(blob), mt)
                out.append(encode_simg(px[::every]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out, "media_type": "image/x-simg"})

    return media.mapInPandas(fs, media.schema)


# ---- audio modality -------------------------------------------------------
# SAUD layout: b"SAUD" | ver:u8 | sample_rate:u32le | channels:u8 |
# n_samples:u32le | samples (int16le, interleaved). Stands in for
# wav/flac/mp3 the way SIMG stands in for JPEG/PNG — deterministic, so the
# whole decode→feature path has an exact relational oracle.

AUDIO_MAGIC = b"SAUD"
AUDIO_HEADER_FMT = "<4sBIBI"
AUDIO_HEADER_SIZE = struct.calcsize(AUDIO_HEADER_FMT)


def encode_saud(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono samples → SAUD bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    return (
        struct.pack(AUDIO_HEADER_FMT, AUDIO_MAGIC, 1, sample_rate, 1, s.size)
        + s.tobytes()
    )


def decode_saud(data: bytes):
    magic, ver, rate, channels, n = struct.unpack_from(AUDIO_HEADER_FMT, data)
    if magic != AUDIO_MAGIC:
        raise ValueError("not a SAUD payload")
    samples = np.frombuffer(data, np.int16, count=n, offset=AUDIO_HEADER_SIZE)
    return samples, rate


def synth_audio(seed: int, n: int) -> np.ndarray:
    """Deterministic fake clip: s[i] = ((seed*31 + i*7) % 201) - 100."""
    i = np.arange(n, dtype=np.int64)
    return (((seed * 31 + i * 7) % 201) - 100).astype(np.int16)


#: media_type → decoder ``bytes -> (samples, rate)``: the audio codec seam,
#: mirroring DECODERS for images. WAV is installed as a real default below.
AUDIO_DECODERS = {"audio/x-saud": decode_saud}


def register_audio_decoder(media_type: str, fn) -> None:
    """Install an audio decoder ``bytes -> (samples ndarray, rate)``; same
    snapshot-into-closure shipping semantics as :func:`register_decoder`."""
    AUDIO_DECODERS[media_type] = fn


_DEMO_AUDIO_ENCODERS = {"audio/x-saud": encode_saud}


def demo_audio_df(
    spark: SparkSession, sf_dir: str, media_type: str = "audio/x-saud"
) -> DataFrame:
    """documents → (doc_id, media BINARY, media_type) audio demo table;
    clip length varies per doc (1000 + doc_id % 500 samples).
    ``media_type="audio/wav"`` routes through the real WAV coder."""
    from ..sources.tables import load_table

    # compute-sized partitioning (same starvation fix as demo_media_df:
    # the KB-scale doc-id scan is one row group → one partition → the
    # whole Python codec stage serializes on one core)
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    encode = _DEMO_AUDIO_ENCODERS[media_type]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [
                        encode(synth_audio(int(i), 1000 + int(i) % 500))
                        for i in pdf["doc_id"]
                    ],
                    "media_type": media_type,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.mapInPandas(gen, schema)


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip features (decode + numpy DSP over Arrow batches — the
    'embed this audio' slot; a real encoder forward pass drops into the
    same mapInPandas body). Dispatches decode per-row by media_type
    through the AUDIO_DECODERS seam (SAUD + real WAV by default)."""

    decoders = dict(AUDIO_DECODERS)  # snapshot: ships registered codecs

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series(["audio/x-saud"] * len(pdf))
            )
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], types):
                fn = decoders.get(mt)
                if fn is None:
                    raise NotImplementedError(f"no audio decoder registered for {mt!r}")
                s, rate = fn(bytes(blob))
                s = np.asarray(s).reshape(-1)
                sf = s.astype(np.float64)
                sign = np.sign(sf)
                zc = int(np.count_nonzero(np.diff(sign[sign != 0]) != 0))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": s.size,
                        "sample_rate": rate,
                        "duration_ms": round(s.size * 1000.0 / rate, 4),
                        "rms": round(float(np.sqrt((sf**2).mean())), 6),
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, _AUDIO_FEAT_SCHEMA)


# ---- video modality -------------------------------------------------------
# SVID layout: b"SVID" | ver:u8 | width:u16le | height:u16le | channels:u8 |
# n_frames:u16le | frames (frame-major uint8). Stands in for mp4/webm the
# way SIMG/SAUD stand in for images/audio — deterministic, so the whole
# decode → frame-sample → feature path has an exact relational oracle.

VIDEO_MAGIC = b"SVID"
VIDEO_HEADER_FMT = "<4sBHHBH"
VIDEO_HEADER_SIZE = struct.calcsize(VIDEO_HEADER_FMT)


def encode_svid(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, c) uint8 → SVID bytes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = f.shape
    return struct.pack(VIDEO_HEADER_FMT, VIDEO_MAGIC, 1, w, h, c, n) + f.tobytes()


def decode_svid(data: bytes) -> np.ndarray:
    magic, ver, w, h, c, n = struct.unpack_from(VIDEO_HEADER_FMT, data)
    if magic != VIDEO_MAGIC:
        raise ValueError("not an SVID payload")
    return np.frombuffer(
        data, np.uint8, count=n * h * w * c, offset=VIDEO_HEADER_SIZE
    ).reshape(n, h, w, c)


#: media_type → decoder ``bytes -> (n, h, w, c) uint8``: the video codec
#: seam. MJPEG-AVI (operators/codecs.py + the in-repo JPEG coder) is a
#: REAL default; mp4/webm remain the documented ffmpeg slot.
VIDEO_DECODERS = {"video/x-svid": decode_svid}


def register_video_decoder(media_type: str, fn) -> None:
    """Install a video decoder; same snapshot-into-closure semantics as
    :func:`register_decoder`."""
    VIDEO_DECODERS[media_type] = fn


def synth_video(doc_id: int) -> np.ndarray:
    """Deterministic fake clip: n_frames = 4 + doc_id%4, 8x(8+doc_id%4)x1,
    pixel v = (doc_id*37 + f*17 + y*5 + x*3) % 256."""
    n = 4 + doc_id % 4
    w = 8 + doc_id % 4
    f, y, x = np.ogrid[0:n, 0:8, 0:w]
    v = (doc_id * 37 + f * 17 + y * 5 + x * 3) % 256
    return v.astype(np.uint8)[..., None]


def demo_video_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media BINARY, media_type) video demo table."""
    from ..sources.tables import load_table

    # compute-sized partitioning — see demo_media_df
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": [encode_svid(synth_video(int(i))) for i in pdf["doc_id"]],
                    "media_type": "video/x-svid",
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
            StructField("media_type", StringType()),
        ]
    )
    return docs.mapInPandas(gen, schema)


_VIDEO_FEAT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("kept_frames", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("kept_mean", DoubleType()),
    ]
)


def video_frame_features(media: DataFrame, every: int = 2) -> DataFrame:
    """Keep every ``every``-th frame then per-clip stats — the
    decode → sample → batch-features shape of a video training pipeline
    (a real frame encoder drops into the same mapInPandas body).
    Dispatches per-row by media_type through VIDEO_DECODERS (SVID + real
    MJPEG-AVI by default)."""

    decoders = dict(VIDEO_DECODERS)  # snapshot: ships registered codecs

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series(["video/x-svid"] * len(pdf))
            )
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], types):
                fn = decoders.get(mt)
                if fn is None:
                    raise NotImplementedError(f"no video decoder registered for {mt!r}")
                fr = fn(bytes(blob))
                kept = fr[::every]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": fr.shape[0],
                        "kept_frames": kept.shape[0],
                        "width": fr.shape[2],
                        "height": fr.shape[1],
                        "kept_mean": round(float(kept.mean(dtype=np.float64)), 6),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, _VIDEO_FEAT_SCHEMA)


# ---- real codec defaults --------------------------------------------------
# Pure-stdlib PNG/BMP/WAV coders (operators/codecs.py) install through the
# exact same seams a PIL/ffmpeg deployment would use — proving the contract
# with genuinely real formats, not just the SIMG/SAUD stand-ins.
from .codecs import AUDIO_CODECS as _REAL_AUDIO, IMAGE_CODECS as _REAL_IMAGES  # noqa: E402
from .codecs import decode_avi_mjpeg as _decode_avi  # noqa: E402
from .codecs import encode_png as _encode_png, encode_wav as _encode_wav  # noqa: E402

DECODERS.update(_REAL_IMAGES)
AUDIO_DECODERS.update(_REAL_AUDIO)
VIDEO_DECODERS["video/x-msvideo"] = _decode_avi

from .codecs import decode_mp4_mjpeg as _decode_mp4  # noqa: E402

VIDEO_DECODERS["video/mp4"] = _decode_mp4
_DEMO_IMAGE_ENCODERS["image/png"] = _encode_png


def _encode_jp2_demo(arr):
    from .jp2 import encode_jp2

    return encode_jp2(arr, levels=2, cblk=16)


_DEMO_IMAGE_ENCODERS["image/jp2"] = _encode_jp2_demo
_DEMO_AUDIO_ENCODERS["audio/wav"] = _encode_wav

from .jpeg import decode_jpeg as _decode_jpeg, encode_jpeg as _encode_jpeg  # noqa: E402

DECODERS["image/jpeg"] = _decode_jpeg


def _decode_jp2_blob(data: bytes):
    from .jp2 import decode_jp2

    return decode_jp2(data)


DECODERS["image/jp2"] = _decode_jp2_blob


def _decode_webp_blob(data: bytes):
    from .webp import decode_webp

    return decode_webp(data)


def _encode_jp2_lossy_demo(arr):
    # the 9/7 irreversible profile at a fine quantization step: error
    # stays below ½ LSB, so uint8 content round-trips exactly — which is
    # what lets the lossy machinery carry a SQL hash gate
    from .jp2 import encode_jp2

    return encode_jp2(arr, levels=2, cblk=16, irreversible=True, base_step=1 / 1024)


#: demo-only media key: same decoder, lossy (9/7) encoder
DECODERS["image/jp2+lossy"] = _decode_jp2_blob
_DEMO_IMAGE_ENCODERS["image/jp2+lossy"] = _encode_jp2_lossy_demo


def _decode_gif_blob(data: bytes):
    from .gif import decode_gif

    return decode_gif(data)


def _decode_gif_video(data: bytes, every: int = 1, max_frames: int = 0):
    # animated GIF through the video seam: composited RGBA frames
    from .gif import decode_gif_frames

    return decode_gif_frames(data, every=every, max_frames=max_frames)[0]


def _encode_gif_demo(arr):
    from .gif import encode_gif

    return encode_gif(arr)


DECODERS["image/gif"] = _decode_gif_blob
VIDEO_DECODERS["image/gif"] = _decode_gif_video
_DEMO_IMAGE_ENCODERS["image/gif"] = _encode_gif_demo


def _decode_flac_blob(data: bytes):
    from .flac import decode_flac

    return decode_flac(data)


def _encode_flac_demo(samples):
    from .flac import encode_flac

    return encode_flac(samples, rate=16000)


AUDIO_DECODERS["audio/flac"] = _decode_flac_blob
_DEMO_AUDIO_ENCODERS["audio/flac"] = _encode_flac_demo


def _encode_webp_demo(arr):
    from .webp import encode_webp

    return encode_webp(arr)


DECODERS["image/webp"] = _decode_webp_blob
_DEMO_IMAGE_ENCODERS["image/webp"] = _encode_webp_demo


def _encode_webp_lossy_demo(arr):
    from .vp8 import encode_webp_lossy_gray

    return encode_webp_lossy_gray(arr)


#: demo-only media key: same container decoder, lossy (VP8 keyframe) encoder
DECODERS["image/webp+lossy"] = _decode_webp_blob
_DEMO_IMAGE_ENCODERS["image/webp+lossy"] = _encode_webp_lossy_demo
_DEMO_IMAGE_SYNTH["image/webp+lossy"] = synth_lattice_gray


def install_native_codecs() -> dict:
    """Detect optional native image decoders and register them through the
    DECODERS seam, displacing the pure-Python codecs for their media types.
    Pure-Python decode is the 100 TB ceiling (~2-4 Mpx/s/thread vs >100
    for libjpeg-turbo), so a deployment that ships Pillow or PyTurboJPEG
    gets native speed with ZERO engine changes — operators snapshot
    DECODERS at plan-build time, so anything registered here rides into
    the Arrow workers automatically. Returns {media_type: backend} for
    what engaged; {} (and no side effects) when no native lib is present.

    OPT-IN: call explicitly, or set ``ODC_STAC_SPARK_NATIVE_CODECS=1``
    before import. Not auto-engaged — the hash-gated codec queries
    (mm_image_jpeg_codec, mm_webdataset_pipeline) pin exact-losslessness
    to the pure-Python codecs, and a native IDCT's rounding (or
    TurboJPEG's 3-channel grayscale) would silently change gate results
    with the environment. Safe to call again after installing more
    backends at runtime."""
    engaged: dict = {}
    try:  # PyTurboJPEG (libjpeg-turbo): fastest JPEG path
        from turbojpeg import TurboJPEG

        _tj = TurboJPEG()

        def _tj_decode(data: bytes) -> np.ndarray:
            arr = _tj.decode(data)  # BGR uint8
            return np.ascontiguousarray(arr[:, :, ::-1])

        register_decoder("image/jpeg", _tj_decode)
        engaged["image/jpeg"] = "turbojpeg"
    except Exception:  # noqa: BLE001 - probe only; lib absent or broken
        pass
    try:  # Pillow: JPEG (if turbojpeg didn't take it) + the web formats
        import io as _io

        import PIL.Image as _PILImage

        def _pil_decode(data: bytes) -> np.ndarray:
            img = _PILImage.open(_io.BytesIO(data))
            arr = np.asarray(img.convert("RGB" if img.mode not in ("L", "I;16") else "L"))
            return arr[:, :, None] if arr.ndim == 2 else arr

        for mt in (
            "image/jpeg", "image/png", "image/bmp",
            "image/webp", "image/gif", "image/x-icon",
        ):
            if mt not in engaged:
                register_decoder(mt, _pil_decode)
                engaged[mt] = "pillow"
    except Exception:  # noqa: BLE001
        pass
    try:  # soundfile (libsndfile): native FLAC/WAV decode
        import io as _io2

        import soundfile as _sf

        def _sf_decode(data: bytes):
            samples, rate = _sf.read(_io2.BytesIO(data), dtype="int16")
            return samples, rate

        for mt in ("audio/flac", "audio/wav"):
            register_audio_decoder(mt, _sf_decode)
            engaged[mt] = "soundfile"
    except Exception:  # noqa: BLE001
        pass
    return engaged


NATIVE_CODECS: dict = (
    install_native_codecs()
    if os.environ.get("ODC_STAC_SPARK_NATIVE_CODECS", "").lower() in ("1", "true", "yes")
    else {}
)


_SPECTRAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("dominant_bin", LongType()),
        StructField("spectral_centroid_hz", DoubleType()),
        StructField("band_energy", StringType()),  # JSON array, n_bands floats
    ]
)


def audio_spectral_features(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Frequency-domain clip features via numpy rFFT over Arrow batches:
    dominant frequency bin, spectral centroid (Hz), and ``n_bands``
    log-spaced-ish band energies (JSON-encoded) — the front end of any
    audio encoder. FFTs are genuinely non-relational, so this operator is
    pytest-verified against a direct numpy computation (no SQL oracle);
    the decode dispatch reuses the AUDIO_DECODERS seam (SAUD + real WAV)."""

    decoders = dict(AUDIO_DECODERS)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        for pdf in batches:
            types = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series(["audio/x-saud"] * len(pdf))
            )
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], types):
                fn = decoders.get(mt)
                if fn is None:
                    raise NotImplementedError(f"no audio decoder registered for {mt!r}")
                s, rate = fn(bytes(blob))
                s = np.asarray(s, dtype=np.float64).reshape(-1)
                spec = np.abs(np.fft.rfft(s))
                power = spec**2
                freqs = np.fft.rfftfreq(s.size, d=1.0 / rate)
                # exclude DC from the dominant-bin vote
                dom = int(np.argmax(spec[1:]) + 1) if spec.size > 1 else 0
                centroid = (
                    float((freqs * power).sum() / power.sum()) if power.sum() else 0.0
                )
                edges = np.linspace(0, power.size, n_bands + 1).astype(int)
                bands = [
                    round(float(power[a:b].sum()), 3) for a, b in zip(edges, edges[1:])
                ]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": s.size,
                        "dominant_bin": dom,
                        "spectral_centroid_hz": round(centroid, 4),
                        "band_energy": json.dumps(bands),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, _SPECTRAL_SCHEMA)


def resample_audio(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resampler (the SR-normalization stage of an
    audio training pipeline; a polyphase/sinc kernel drops into the same
    slot). Output sample i sits at source position i*src/dst:
    out[i] = s[k]*(1-f) + s[k+1]*f with k = floor(pos), f = pos-k."""
    s = np.asarray(samples, dtype=np.float64).reshape(-1)
    if src_rate == dst_rate:
        return s.copy()
    n_out = int(s.size * dst_rate / src_rate)
    pos = np.arange(n_out, dtype=np.float64) * src_rate / dst_rate
    k = np.minimum(pos.astype(np.int64), s.size - 1)
    k1 = np.minimum(k + 1, s.size - 1)
    f = pos - k
    return s[k] * (1.0 - f) + s[k1] * f


_RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_in", LongType()),
        StructField("n_out", LongType()),
        StructField("rms_out", DoubleType()),
        StructField("checksum", DoubleType()),
    ]
)


def audio_resample_features(media: DataFrame, dst_rate: int = 8000) -> DataFrame:
    """Decode → resample to ``dst_rate`` → summary stats, per clip, over
    Arrow batches (AUDIO_DECODERS seam dispatch)."""

    decoders = dict(AUDIO_DECODERS)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            types = (
                pdf["media_type"]
                if "media_type" in pdf.columns
                else pd.Series(["audio/x-saud"] * len(pdf))
            )
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], types):
                fn = decoders.get(mt)
                if fn is None:
                    raise NotImplementedError(f"no audio decoder registered for {mt!r}")
                s, rate = fn(bytes(blob))
                s = np.asarray(s).reshape(-1)
                out = resample_audio(s, rate, dst_rate)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_in": s.size,
                        "n_out": out.size,
                        "rms_out": round(float(np.sqrt((out**2).mean())), 6),
                        "checksum": round(float(out.sum()), 6),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, _RESAMPLE_SCHEMA)


_SCENE_CUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_from", IntegerType()),
        StructField("mad", DoubleType()),
        StructField("is_cut", IntegerType()),
    ]
)


def video_scene_cuts(media: DataFrame, threshold: float = 40.0) -> DataFrame:
    """Scene-cut detection: per consecutive frame pair, the mean absolute
    pixel difference; pairs above ``threshold`` are cut boundaries — the
    clip-segmentation pass of a video training pipeline (each segment
    then becomes a training sample). Arrow-batched mapInPandas like
    every codec stage; one row per frame PAIR crosses the boundary,
    never pixels. Integer pixel math (int16 diff of uint8 frames), so
    the MAD is exact and the oracle replays it bit-for-bit."""

    decoders = dict(VIDEO_DECODERS)

    def sc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                frames = decoders[mt](bytes(blob)).astype(np.int16)
                for f in range(frames.shape[0] - 1):
                    mad = float(np.abs(frames[f + 1] - frames[f]).mean())
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_from": f,
                            "mad": round(mad, 6),
                            "is_cut": int(mad > threshold),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(sc, _SCENE_CUT_SCHEMA)


_AUDIO_SEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame", IntegerType()),
        StructField("flen", IntegerType()),
        StructField("energy", LongType()),
        StructField("active", IntegerType()),
    ]
)


def audio_energy_frames(media: DataFrame, frame_len: int = 100, mean_sq: int = 3350) -> DataFrame:
    """Energy-based VAD framing: split each clip into ``frame_len``-sample
    frames (last frame may be short), per-frame energy = sum of squared
    samples (EXACT int64 — the oracle replays it bit-for-bit), frame
    active iff energy > mean_sq x frame-length (the integer cross-multiply
    form of mean-square > mean_sq). One row per FRAME leaves the Arrow
    island, never samples — the segmentation pass that turns raw audio
    into training windows."""

    decoders = dict(AUDIO_DECODERS)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob, mt in zip(pdf["doc_id"], pdf["media"], pdf["media_type"]):
                samples, _rate = decoders[mt](bytes(blob))
                s = samples.astype(np.int64)
                n = s.shape[0]
                for f in range((n + frame_len - 1) // frame_len):
                    fr = s[f * frame_len : (f + 1) * frame_len]
                    e = int((fr * fr).sum())
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame": f,
                            "flen": int(fr.shape[0]),
                            "energy": e,
                            "active": int(e > mean_sq * fr.shape[0]),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(seg, _AUDIO_SEG_SCHEMA)
