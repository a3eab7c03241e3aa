"""Minimal cloud-optimized GeoTIFF writer/reader in pure Python (S14).

The reference writes COGs through rasterio (`xx.odc.write_cog`,
docs/samples/save-cog-from-stac.py); rasterio is absent here, but a COG
is just a TIFF with a specific layout — header + all IFDs up front
(full-res first, then reduced-resolution overview IFDs), tile data after,
so an HTTP range reader can plan its reads from one head request. This
module emits exactly that layout from scratch:

- classic little-endian TIFF, tiled (TileWidth/TileLength 256 default)
- DEFLATE-compressed tiles by default (Compression=8 via stdlib zlib —
  what virtually every real-world COG uses), LZW (Compression=5, the
  Landsat/USGS-archive staple, with optional Predictor=2 horizontal
  differencing), or uncompressed (Compression=1)
- GeoTIFF georeferencing: ModelPixelScaleTag + ModelTiepointTag +
  GeoKeyDirectoryTag (projected EPSG or geographic EPSG:4326)
- GDAL_NODATA ascii tag
- overviews: nearest-decimation reduced-resolution IFDs (NewSubfileType=1)
- ``write_tiff_striped``: the classic strip-organized (non-tiled) layout
  for small scenes (RowsPerStrip/StripOffsets/StripByteCounts)

The readers handle tiled AND strip-organized single-band TIFFs, classic
(version 42) AND BigTIFF (version 43, 64-bit offsets — what GDAL writes
for >4 GiB COGs), with Compression 1/5/8/32946/32773 (none / TIFF-LZW /
zlib deflate / PackBits) and Predictor 1/2 — enough to read this writer's
output, typical externally-produced deflate COGs, LZW+predictor archive
GeoTIFFs, and PackBits USGS/Landsat archive layouts without GDAL. ZSTD
(Compression=50000) encodes via pyarrow's bundled zstd and decodes
through a backend chain ending in the from-scratch RFC 8878 decoder
(operators/zstd.py — validated against real libzstd output), so ZSTD
COGs read even with no native backend at all. JPEG2000 (34712) rides
the in-house Part-1 codec (operators/jp2.py). The writers emit BigTIFF
on request or automatically when the payload could cross the 4 GiB
offset ceiling (GDAL's IF_SAFER).

Scale note: one COG per (band, t) mosaic is a driver-side or
foreachPartition finalization step over collected tiles — the distributed
artifact remains the parquet tile table (sinks.write_tiles_parquet);
this writer is the export/interchange sink.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..model import GeoBox

# TIFF tag ids
_NEWSUBFILETYPE = 254
_WIDTH = 256
_LENGTH = 257
_BITSPERSAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIPOFFSETS = 273
_SAMPLESPERPIXEL = 277
_ROWSPERSTRIP = 278
_STRIPBYTECOUNTS = 279
_PLANARCONFIG = 284
_PREDICTOR = 317
_JPEGTABLES = 347
_TILEWIDTH = 322
_TILELENGTH = 323
_TILEOFFSETS = 324
_TILEBYTECOUNTS = 325
_SAMPLEFORMAT = 339
_MODELPIXELSCALE = 33550
_MODELTIEPOINT = 33922
_GEOKEYDIRECTORY = 34735
_GDAL_NODATA = 42113

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12
_TYPE_LONG8 = 16  # BigTIFF 64-bit unsigned (TIFF_LONG8)

_SAMPLEFORMAT_FOR_KIND = {"u": 1, "i": 2, "f": 3}


# ---------------------------------------------------------------------------
# TIFF-variant LZW codec (Compression=5), pure stdlib.
#
# TIFF 6.0 §13 LZW with the de-facto "early change": code width bumps one
# code earlier than textbook LZW (encoder at next_code 511/1023/2047, the
# decoder — always one table entry behind — at 510/1022/2046), ClearCode at
# next_code 4094. MSB-first bit packing. This is what libtiff/GDAL emit and
# expect, so Landsat/USGS-style LZW COGs decode here without GDAL
# (reference reads them via rasterio, loader/_rio.py:374-475).


def lzw_encode(data: bytes) -> bytes:
    """Compress ``data`` as a TIFF LZW code stream."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table: Dict[int, int] = {}
    next_code = 258
    width = 9
    emit(256, width)  # ClearCode opens every strip/tile stream
    prev = -1
    for b in data:
        if prev < 0:
            prev = b
            continue
        key = (prev << 8) | b
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code == 511:
            width = 10
        elif next_code == 1023:
            width = 11
        elif next_code == 2047:
            width = 12
        elif next_code == 4094:
            emit(256, width)
            table.clear()
            next_code = 258
            width = 9
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(257, width)  # EOI
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes) -> bytes:
    """Decompress a TIFF LZW code stream (early-change variant)."""
    out: List[bytes] = []
    table: List[bytes] = []
    width = 9
    prev: Optional[bytes] = None
    bitbuf = 0
    bitcnt = 0
    i = 0
    n = len(data)
    while True:
        while bitcnt < width and i < n:
            bitbuf = (bitbuf << 8) | data[i]
            i += 1
            bitcnt += 8
        if bitcnt < width:
            break  # stream ended without EOI; tolerate like libtiff
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == 257:  # EOI
            break
        if code == 256:  # ClearCode
            table = [bytes([j]) for j in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream: first code not literal")
            s = table[code]
        else:
            if code < len(table):
                s = table[code]
            elif code == len(table):  # KwKwK case
                s = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream: code beyond table")
            table.append(prev + s[:1])
            tl = len(table)
            if tl == 510:
                width = 10
            elif tl == 1022:
                width = 11
            elif tl == 2046:
                width = 12
        out.append(s)
        prev = s
    return b"".join(out)


# ---------------------------------------------------------------------------
# PackBits codec (Compression=32773, TIFF 6.0 spec §9) — the USGS/Landsat
# archive staple the reference reads via GDAL (loader/_rio.py:374-475).
# Pure stdlib; rows are packed independently per the spec's requirement
# that "each row must begin on a fresh byte".


def packbits_encode(data: bytes, row_bytes: Optional[int] = None) -> bytes:
    if not data:
        return b""
    out = bytearray()
    step = row_bytes or len(data)
    for r in range(0, len(data), step):
        row = data[r : r + step]
        i, n = 0, len(row)
        while i < n:
            j = i
            while j < n - 1 and row[j] == row[j + 1] and j - i < 127:
                j += 1
            run = j - i + 1
            if run >= 2:  # replicate run: header = -(run-1) two's complement
                out.append((257 - run) & 0xFF)
                out.append(row[i])
                i = j + 1
            else:  # literal run up to 128 bytes, cut before the next 3-run
                start = i
                i += 1
                while i < n and i - start < 128:
                    if i + 2 < n and row[i] == row[i + 1] == row[i + 2]:
                        break
                    i += 1
                out.append(i - start - 1)
                out.extend(row[start:i])
    return bytes(out)


def packbits_decode(data: bytes, expected: Optional[int] = None) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and (expected is None or len(out) < expected):
        b = data[i]
        i += 1
        if b == 128:  # noop per spec
            continue
        if b < 128:  # literal: next b+1 bytes
            out += data[i : i + b + 1]
            i += b + 1
        else:  # replicate: next byte repeated 257-b times
            out += data[i : i + 1] * (257 - b)
            i += 1
    return bytes(out)


def _zstd_decompress(raw: bytes, expected: Optional[int] = None) -> bytes:
    """ZSTD (Compression=50000, GDAL's registered code). Backend chain:
    Python ≥3.14 stdlib, the zstandard package, pyarrow's bundled zstd
    (always present here — Arrow is a hard dependency of the engine;
    needs the decompressed size, which every TIFF tile read knows), then
    the from-scratch RFC 8878 decoder (operators/zstd.py)."""
    try:
        from compression import zstd  # Python ≥3.14 stdlib

        return zstd.decompress(raw)
    except ImportError:
        pass
    try:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(raw)
    except ImportError:
        pass
    if expected is not None:
        try:
            import pyarrow as pa

            if pa.Codec.is_available("zstd"):
                return bytes(pa.Codec("zstd").decompress(raw, expected))
        except ImportError:
            pass
    from ..operators.zstd import decode_zstd

    return decode_zstd(raw)


def _apply_predictor2(block: np.ndarray) -> np.ndarray:
    """Horizontal differencing (Predictor=2) on a 2-D integer block;
    operates per sample value (8/16/32-bit), wrapping mod 2**bits."""
    if block.dtype.kind not in ("u", "i"):
        raise ValueError("Predictor=2 applies to integer samples only")
    u = block.view(f"u{block.dtype.itemsize}")
    d = u.copy()
    d[:, 1:] -= u[:, :-1]
    return d.view(block.dtype)


def _undo_predictor2(block: np.ndarray) -> np.ndarray:
    """Undo horizontal differencing: per-row cumulative sum mod 2**bits."""
    if block.dtype.kind not in ("u", "i"):
        raise ValueError("Predictor=2 applies to integer samples only")
    u = block.view(f"u{block.dtype.itemsize}")
    acc = np.add.accumulate(u, axis=1, dtype=u.dtype)
    return acc.view(block.dtype)


def _apply_predictor3(block: np.ndarray) -> np.ndarray:
    """Floating-point predictor (Predictor=3, TIFF TechNote 3 / libtiff
    fpDiff): per row, split samples into BIG-ENDIAN bytes, regroup into
    byte planes (all MSBs first), then byte-wise horizontal differencing.
    Returns the (h, row_bytes) uint8 array the compressor consumes —
    exponent bytes of neighbouring floats are near-equal, so the deltas
    compress the way integer imagery does."""
    if block.dtype.kind != "f":
        raise ValueError("Predictor=3 applies to floating-point samples only")
    h = block.shape[0]
    flat = block.reshape(h, -1)
    be = np.ascontiguousarray(flat.astype(flat.dtype.newbyteorder(">")))
    nb = flat.dtype.itemsize
    b = be.view(np.uint8).reshape(h, flat.shape[1], nb)
    planes = np.ascontiguousarray(b.transpose(0, 2, 1)).reshape(h, -1)
    d = planes.copy()
    d[:, 1:] -= planes[:, :-1]
    return d


def _undo_predictor3(raw_rows: np.ndarray, n: int, dtype: np.dtype) -> np.ndarray:
    """(h, row_bytes) uint8 → (h, n) floats: cumulative byte sums, then
    byte planes back to big-endian samples."""
    acc = np.add.accumulate(raw_rows, axis=1, dtype=np.uint8)
    h = raw_rows.shape[0]
    nb = dtype.itemsize
    b = acc.reshape(h, nb, n).transpose(0, 2, 1)
    be = np.ascontiguousarray(b).reshape(h, n * nb)
    return be.view(dtype.newbyteorder(">")).astype(dtype)


def _geokeys(crs: str) -> List[int]:
    """GeoKeyDirectory shorts for EPSG codes (projected or geographic)."""
    if not crs.upper().startswith("EPSG:"):
        raise NotImplementedError(f"only EPSG CRS supported, got {crs!r}")
    epsg = int(crs.split(":")[1])
    geographic = epsg == 4326 or 4000 <= epsg < 5000
    # version 1.1.0, N keys; each key: (id, location, count, value)
    keys = [
        (1024, 0, 1, 2 if geographic else 1),  # GTModelTypeGeoKey
        (1025, 0, 1, 1),  # GTRasterTypeGeoKey = PixelIsArea
    ]
    keys.append((2048 if geographic else 3072, 0, 1, epsg))
    out = [1, 1, 0, len(keys)]
    for k in keys:
        out.extend(k)
    return out


def write_cog_file(
    path: str,
    pix: np.ndarray,
    geobox: GeoBox,
    nodata: Optional[float] = None,
    tile: int = 256,
    overview_levels: Optional[List[int]] = None,
    compression: str = "deflate",
    predictor: int = 1,
    bigtiff: Optional[bool] = None,
    jpeg_quality: int = 90,
    overview_resampling: str = "nearest",
    planar: int = 1,
) -> None:
    """Write a single-band 2-D array as a tiled COG-layout GeoTIFF.

    ``compression``: "deflate" (Compression=8, stdlib zlib per tile — what
    virtually every real-world COG uses), "lzw" (Compression=5, the
    Landsat/USGS-archive staple), "jpeg" (Compression=7, one baseline
    JFIF stream per tile via the in-repo codec — the visual-product /
    aerial-imagery pairing; uint8 only, LOSSY at quality<100-ish) or
    "none" (Compression=1).
    ``predictor``: 1 (none) or 2 (horizontal differencing, integer dtypes;
    the common pairing with LZW in real-world archives).
    ``bigtiff``: True → BigTIFF (version 43, 64-bit offsets — required
    once the file would cross 4 GiB; GDAL's BIGTIFF=YES); False → classic;
    None (default) → auto: BigTIFF iff the uncompressed payload could
    cross the 4 GiB offset ceiling (GDAL's BIGTIFF=IF_SAFER).
    ``overview_resampling``: "nearest" (decimation — safe for categorical
    data and for decimated-read pushdown) or "average" (box mean over
    each level's footprint, ignoring nodata — gdaladdo's default for
    continuous data; readers should then load with use_overviews=False
    when exact full-res values matter)."""
    if pix.ndim == 3 and pix.shape[2] == 1:
        pix = pix[:, :, 0]
    if pix.ndim not in (2, 3):
        raise ValueError("write_cog_file expects (h, w) or (h, w, samples)")
    if pix.ndim == 3 and pix.shape[2] > 4:
        raise ValueError("write_cog_file supports at most 4 interleaved samples")
    if compression not in ("deflate", "lzw", "none", "jpeg", "jp2", "zstd", "lzma", "packbits", "webp"):
        raise ValueError(
            f"compression must be 'deflate', 'lzw', 'jpeg', 'jp2', 'zstd', "
            f"'lzma', 'packbits', 'webp' or 'none', got {compression!r}"
        )
    if predictor not in (1, 2, 3):
        raise ValueError(f"predictor must be 1, 2 or 3, got {predictor}")
    if predictor == 2 and pix.dtype.kind not in ("u", "i"):
        raise ValueError("Predictor=2 applies to integer samples only")
    if predictor == 3 and pix.dtype.kind != "f":
        raise ValueError("Predictor=3 applies to floating-point samples only")
    if planar not in (1, 2):
        raise ValueError(f"planar must be 1 (chunky) or 2 (separate), got {planar}")
    if planar == 2 and compression == "jpeg":
        raise ValueError("PlanarConfig=2 with JPEG compression is not supported")
    if compression == "webp":
        if pix.dtype != np.uint8:
            raise ValueError("webp compression requires uint8 pixels")
        if predictor != 1:
            raise ValueError("webp compression is incompatible with Predictor=2")
    if compression == "jpeg":
        if pix.dtype != np.uint8:
            raise ValueError("jpeg compression requires uint8 pixels")
        if predictor != 1:
            raise ValueError("jpeg compression is incompatible with Predictor=2")
        if pix.ndim == 3 and pix.shape[2] not in (1, 3):
            raise ValueError("jpeg compression takes 1 (gray) or 3 (RGB) samples")
    if compression == "jp2":
        if pix.dtype not in (np.uint8, np.uint16, np.int16):
            raise ValueError("jp2 compression takes uint8/uint16/int16 pixels")
        if predictor != 1:
            raise ValueError("jp2 compression is incompatible with Predictor=2")
    # south-up output would round-trip with silently flipped georeferencing
    # (readers reconstruct -|sy| assuming north-up) — refuse it
    if geobox.transform[4] > 0:
        raise ValueError(
            "write_cog_file requires a north-up geobox (sy<0); flip rows first"
        )
    if overview_levels is None:
        # overviews until the image fits in one tile (COG convention)
        overview_levels = []
        level = 2
        while max(pix.shape) // level >= tile:
            overview_levels.append(level)
            level *= 2

    if overview_resampling not in ("nearest", "average"):
        raise ValueError(
            f"overview_resampling must be 'nearest' or 'average', got {overview_resampling!r}"
        )
    pix = np.ascontiguousarray(pix)
    if overview_resampling == "nearest":
        levels = [pix] + [pix[::lv, ::lv] for lv in overview_levels]
    else:
        levels = [pix] + [
            _box_average(pix, lv, nodata) for lv in overview_levels
        ]
    if bigtiff is None:
        # IF_SAFER: compressed sizes aren't known until encode, so decide
        # on the uncompressed payload bound (compression only shrinks it)
        payload = sum(a.nbytes for a in levels)
        bigtiff = payload >= 2**32 - (1 << 20)

    # ---- plan IFDs first (COG layout: all IFDs before any tile data)
    ifds = []
    for lv_idx, arr in enumerate(levels):
        ifds.append(
            _plan_ifd(
                arr, geobox, nodata, tile, lv_idx, overview_levels, compression,
                predictor, jpeg_quality, planar,
            )
        )
    _write_tiff(path, ifds, bigtiff=bigtiff)


def write_cog_file_from_tiles(
    path: str,
    shape,
    dtype,
    geobox: GeoBox,
    level_tiles: List[List[bytes]],
    nodata: Optional[float] = None,
    tile: int = 256,
    overview_levels: Optional[List[int]] = None,
    compression: str = "deflate",
    predictor: int = 1,
    bigtiff: Optional[bool] = None,
) -> None:
    """Assemble and write a COG from ALREADY-COMPRESSED tile streams —
    the writer stage of the distributed tile-parallel export
    (sinks.write_cog): blocks are cut by cut_cog_blocks on the assembly
    stage, deflate/lzw/... compressed in parallel Spark tasks, and only
    the compressed bytes reach this single writer per output file.

    ``level_tiles[0]`` is the full-resolution row-major tile list;
    ``level_tiles[1:]`` correspond to ``overview_levels`` (default: the
    cog_overview_levels rule). IFD planning depends only on
    shape/dtype/geobox, so no pixels are needed here. Byte-identical to
    write_cog_file for the same inputs (single-sample, planar=1)."""
    ny, nx = int(shape[0]), int(shape[1])
    dt = np.dtype(dtype)
    if geobox.transform[4] > 0:
        raise ValueError(
            "write_cog_file_from_tiles requires a north-up geobox (sy<0)"
        )
    if overview_levels is None:
        overview_levels = cog_overview_levels((ny, nx), tile)
    if len(level_tiles) != 1 + len(overview_levels):
        raise ValueError(
            f"level_tiles has {len(level_tiles)} levels, expected "
            f"{1 + len(overview_levels)} (full + overviews)"
        )
    shapes = [(ny, nx)] + [
        ((ny + lv - 1) // lv, (nx + lv - 1) // lv) for lv in overview_levels
    ]
    if bigtiff is None:
        payload = sum(h * w * dt.itemsize for h, w in shapes)
        bigtiff = payload >= 2**32 - (1 << 20)
    ifds = []
    for lv_idx, ((h, w), tiles) in enumerate(zip(shapes, level_tiles)):
        # zero-copy stand-in: _plan_ifd only reads shape/dtype/ndim when
        # tiles_override is given
        ph = np.broadcast_to(np.zeros(1, dt), (h, w))
        ifds.append(
            _plan_ifd(
                ph, geobox, nodata, tile, lv_idx, overview_levels,
                compression, predictor, 90, 1, tiles_override=tiles,
            )
        )
    _write_tiff(path, ifds, bigtiff=bigtiff)


def _write_tiff(path: str, ifds: List[Dict], bigtiff: bool = False) -> None:
    """Layout + render planned IFDs: header (8, or 16 for BigTIFF) | IFD
    blocks (each: entries + next ptr + aux data) | block data.

    BigTIFF (version 43): 8-byte IFD offsets/entry counts, 20-byte entries
    with an 8-byte value field, tile offset/bytecount arrays as LONG8."""
    entry_sz, cnt_sz, next_sz, arr_item = (20, 8, 8, 8) if bigtiff else (12, 2, 4, 4)
    pos = 16 if bigtiff else 8
    for ifd in ifds:
        ifd["ifd_offset"] = pos
        pos += cnt_sz + entry_sz * len(ifd["entries"]) + next_sz
        ifd["aux_offset"] = pos
        # blobs that fit the entry's value field are stored inline per the
        # TIFF spec (readers MUST treat small counts as inline values)
        aux_total = sum(len(b) for b in ifd["aux"] if len(b) > arr_item)
        if len(ifd["tiles"]) > 1:
            # offsets + bytecounts arrays also live in the aux area
            aux_total += 2 * arr_item * len(ifd["tiles"])
        pos += aux_total
    for ifd in ifds:
        ifd["data_offset"] = pos
        pos += sum(ifd["tile_sizes"])
    if not bigtiff and pos >= 2**32:
        raise ValueError(
            f"file would be {pos} bytes — beyond classic TIFF's 32-bit "
            "offsets; pass bigtiff=True"
        )

    out = bytearray()
    if bigtiff:
        out += struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifds[0]["ifd_offset"])
    else:
        out += struct.pack("<2sHI", b"II", 42, ifds[0]["ifd_offset"])
    for i, ifd in enumerate(ifds):
        next_off = ifds[i + 1]["ifd_offset"] if i + 1 < len(ifds) else 0
        out += _render_ifd(ifd, next_off, bigtiff=bigtiff)
    for ifd in ifds:
        for t_bytes in ifd["tiles"]:
            out += t_bytes
    # the file is fully assembled in memory (IFD-first COG layout needs
    # that anyway), so any rangeio-supported destination works: local
    # path, s3:// put_object, http(s):// PUT
    from .rangeio import put_bytes

    put_bytes(path, bytes(out))


def _box_average(pix: np.ndarray, lv: int, nodata) -> np.ndarray:
    """lv× box-mean overview ignoring nodata (gdaladdo 'average'): each
    output pixel is the mean of valid samples in its lv×lv footprint;
    all-nodata footprints stay nodata."""
    ny, nx = pix.shape[:2]
    oy, ox = (ny + lv - 1) // lv, (nx + lv - 1) // lv
    pad_shape = (oy * lv, ox * lv) + pix.shape[2:]
    padded = np.zeros(pad_shape, dtype=np.float64)
    padded[:ny, :nx] = pix
    valid = np.zeros(pad_shape[:2], dtype=np.float64)
    valid[:ny, :nx] = 1.0
    if nodata is not None:
        mask2d = (pix == nodata) if pix.ndim == 2 else (pix == nodata).all(axis=2)
        valid[:ny, :nx][mask2d] = 0.0
        padded[:ny, :nx][mask2d] = 0.0
    if pix.ndim == 3:
        grp = padded.reshape(oy, lv, ox, lv, -1)
        s = grp.sum(axis=(1, 3))
        n = valid.reshape(oy, lv, ox, lv).sum(axis=(1, 3))[..., None]
    else:
        s = padded.reshape(oy, lv, ox, lv).sum(axis=(1, 3))
        n = valid.reshape(oy, lv, ox, lv).sum(axis=(1, 3))
    with np.errstate(invalid="ignore", divide="ignore"):
        mean = s / np.maximum(n, 1)
    if np.issubdtype(pix.dtype, np.integer):
        mean = np.rint(mean)
    out = mean.astype(pix.dtype)
    empty = (n if pix.ndim == 2 else n[..., 0]) == 0
    if nodata is not None and empty.any():
        out[empty] = np.asarray(nodata, dtype=pix.dtype)
    return out


def _compress_block(block: "np.ndarray", compression: str, jpeg_quality: int = 90) -> bytes:
    if compression == "deflate":
        return zlib.compress(block.tobytes(), 6)
    if compression == "lzw":
        return lzw_encode(block.tobytes())
    if compression == "jpeg":
        # Compression=7 ("new-style" JPEG, TIFF TechNote 2): one complete
        # baseline JFIF stream per tile/strip, via the in-repo codec
        from ..operators.jpeg import encode_jpeg

        return encode_jpeg(block, quality=jpeg_quality)
    if compression == "jp2":
        # Compression=34712 (GDAL JP2000): one lossless Part-1 codestream
        # per tile, via the in-repo codec
        from ..operators.jp2 import encode_jp2_codestream

        return encode_jp2_codestream(block, levels=2, cblk=32)
    if compression == "zstd":
        # Compression=50000 (GDAL ZSTD): encoded via pyarrow's bundled
        # zstd (a hard engine dependency); decoding falls back to the
        # from-scratch RFC 8878 decoder when no native backend exists
        import pyarrow as pa

        return bytes(pa.Codec("zstd").compress(block.tobytes()))
    if compression == "lzma":
        # Compression=34925 (libtiff): one xz stream per tile, stdlib
        import lzma

        return lzma.compress(
            block.tobytes(), format=lzma.FORMAT_XZ, check=lzma.CHECK_NONE, preset=6
        )
    if compression == "packbits":
        # spec §9: rows pack independently
        row_bytes = block.nbytes // block.shape[0]
        return packbits_encode(block.tobytes(), row_bytes=row_bytes)
    if compression == "webp":
        # Compression=50001 (GDAL WEBP): one complete RIFF/WebP file per
        # tile (libtiff tif_webp.c layout), lossless VP8L via the in-repo
        # RFC 9649 codec. 8-bit only, per the format.
        from ..operators.webp import encode_webp

        if block.dtype != np.uint8:
            raise ValueError("TIFF WEBP compression requires uint8 samples")
        return encode_webp(block)
    return block.tobytes()


_COMPRESSION_CODE = {"none": 1, "lzw": 5, "deflate": 8, "jpeg": 7, "jp2": 34712, "packbits": 32773, "lzma": 34925, "zstd": 50000, "webp": 50001}


def write_tiff_striped(
    path: str,
    pix: np.ndarray,
    geobox: GeoBox,
    nodata: Optional[float] = None,
    rows_per_strip: int = 64,
    compression: str = "lzw",
    predictor: int = 1,
    bigtiff: bool = False,
    jpeg_quality: int = 90,
) -> None:
    """Write a strip-organized (non-tiled) single-band GeoTIFF — the
    classic pre-COG layout still common for small scenes (RowsPerStrip /
    StripOffsets / StripByteCounts instead of tile tags; the reference
    reads both layouts via GDAL, loader/_rio.py:374-475). The last strip
    is short when rows_per_strip does not divide the height — no padding
    rows are written, matching real-world writers."""
    if pix.ndim != 2:
        raise ValueError("write_tiff_striped expects a 2-D single-band array")
    if compression not in ("deflate", "lzw", "none", "jpeg", "jp2", "zstd", "lzma", "packbits"):
        raise ValueError(
            f"compression must be 'deflate', 'lzw', 'jpeg', 'jp2', 'zstd', "
            f"'lzma', 'packbits' or 'none', got {compression!r}"
        )
    if predictor not in (1, 2, 3):
        raise ValueError(f"predictor must be 1, 2 or 3, got {predictor}")
    if predictor == 2 and pix.dtype.kind not in ("u", "i"):
        raise ValueError("Predictor=2 applies to integer samples only")
    if predictor == 3 and pix.dtype.kind != "f":
        raise ValueError("Predictor=3 applies to floating-point samples only")
    if compression == "jpeg" and (pix.dtype != np.uint8 or predictor != 1):
        raise ValueError("jpeg compression requires uint8 pixels and Predictor=1")
    if compression == "jp2" and predictor != 1:
        raise ValueError("jp2 compression is incompatible with Predictor=2")
    if geobox.transform[4] > 0:
        raise ValueError(
            "write_tiff_striped requires a north-up geobox (sy<0); flip rows first"
        )
    pix = np.ascontiguousarray(pix)
    ny, nx = pix.shape
    dt = pix.dtype
    strips: List[bytes] = []
    for y0 in range(0, ny, rows_per_strip):
        strip = pix[y0 : y0 + rows_per_strip]
        if predictor == 2:
            strip = _apply_predictor2(strip)
        elif predictor == 3:
            strip = _apply_predictor3(strip)
        strips.append(_compress_block(strip, compression, jpeg_quality))

    entries: List[Tuple[int, int, int, object]] = [
        (_WIDTH, _TYPE_LONG, 1, nx),
        (_LENGTH, _TYPE_LONG, 1, ny),
        (_BITSPERSAMPLE, _TYPE_SHORT, 1, dt.itemsize * 8),
        (_COMPRESSION, _TYPE_SHORT, 1, _COMPRESSION_CODE[compression]),
        (_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
        (_STRIPOFFSETS, _TYPE_LONG, len(strips), "TILEOFFSETS"),
        (_SAMPLESPERPIXEL, _TYPE_SHORT, 1, 1),
        (_ROWSPERSTRIP, _TYPE_LONG, 1, rows_per_strip),
        (_STRIPBYTECOUNTS, _TYPE_LONG, len(strips), "TILEBYTECOUNTS"),
        (_PLANARCONFIG, _TYPE_SHORT, 1, 1),
        (_SAMPLEFORMAT, _TYPE_SHORT, 1, _SAMPLEFORMAT_FOR_KIND[dt.kind]),
    ]
    if predictor in (2, 3):
        entries.append((_PREDICTOR, _TYPE_SHORT, 1, predictor))
    aux: List[bytes] = []
    sx, _, x0, _, sy, y0_ = geobox.transform
    entries.append((_MODELPIXELSCALE, _TYPE_DOUBLE, 3, "AUX"))
    aux.append(struct.pack("<3d", abs(sx), abs(sy), 0.0))
    entries.append((_MODELTIEPOINT, _TYPE_DOUBLE, 6, "AUX"))
    aux.append(struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0_, 0.0))
    gk = _geokeys(geobox.crs)
    entries.append((_GEOKEYDIRECTORY, _TYPE_SHORT, len(gk), "AUX"))
    aux.append(struct.pack(f"<{len(gk)}H", *gk))
    if nodata is not None:
        nd = f"{int(nodata)}" if float(nodata).is_integer() else repr(float(nodata))
        nd_b = nd.encode() + b"\x00"
        entries.append((_GDAL_NODATA, _TYPE_ASCII, len(nd_b), "AUX"))
        aux.append(nd_b)
    entries.sort(key=lambda e: e[0])
    _write_tiff(
        path,
        [{
            "entries": entries,
            "aux": aux,
            "tiles": strips,
            "tile_sizes": [len(s) for s in strips],
        }],
        bigtiff=bigtiff,
    )


def cog_overview_levels(shape, tile: int = 256) -> List[int]:
    """Default COG overview decimation levels for an image shape — the
    same rule write_cog_file applies when overview_levels is None
    (halve until the image fits one tile). Exposed so the distributed
    tile-parallel encode path (sinks.write_cog) can derive the identical
    level plan on the assembly AND writer stages without shipping it."""
    overview_levels: List[int] = []
    level = 2
    while max(shape[:2]) // level >= tile:
        overview_levels.append(level)
        level *= 2
    return overview_levels


def cut_cog_blocks(arr, tile: int = 256, predictor: int = 1):
    """Yield (tile_idx, block) for ONE level in the exact row-major order
    _plan_ifd compresses them (chunky/planar=1): zero-padded to
    tile×tile, predictor pre-applied. The distributed COG sink cuts
    blocks with this on the assembly stage and compresses them in
    parallel elsewhere — sharing the loop guarantees byte-identical
    output vs the in-process writer."""
    ny, nx = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    idx = 0
    for ty in range(0, ny, tile):
        for tx in range(0, nx, tile):
            shape = (tile, tile, spp) if arr.ndim == 3 else (tile, tile)
            block = np.zeros(shape, dtype=arr.dtype)
            sub = arr[ty : ty + tile, tx : tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            if predictor == 2:
                block = _apply_predictor2(block)
            elif predictor == 3:
                block = _apply_predictor3(block)
            yield idx, block
            idx += 1


def _plan_ifd(
    arr, geobox, nodata, tile, lv_idx, overview_levels, compression="none",
    predictor=1, jpeg_quality=90, planar=1, tiles_override=None,
):
    ny, nx = arr.shape[:2]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    dt = arr.dtype
    bits = dt.itemsize * 8
    fmt = _SAMPLEFORMAT_FOR_KIND[dt.kind]
    tiles: List[bytes] = []
    n_expect = ((ny + tile - 1) // tile) * ((nx + tile - 1) // tile)
    if planar == 2 and spp > 1:
        n_expect *= spp
    if tiles_override is not None:
        # precompressed tile streams (the distributed encode path);
        # entries below depend only on shape/dtype/geobox, never pixels
        tiles = list(tiles_override)
        if len(tiles) != n_expect:
            raise ValueError(
                f"tiles_override has {len(tiles)} tiles, expected {n_expect}"
            )
    elif planar == 2 and spp > 1:
        # separate planes (spec §14): all of sample 0's tiles, then 1's, …
        for s in range(spp):
            for ty in range(0, ny, tile):
                for tx in range(0, nx, tile):
                    block = np.zeros((tile, tile), dtype=dt)
                    sub = arr[ty : ty + tile, tx : tx + tile, s]
                    block[: sub.shape[0], : sub.shape[1]] = sub
                    if predictor == 2:
                        block = _apply_predictor2(block)
                    elif predictor == 3:
                        block = _apply_predictor3(block)
                    tiles.append(_compress_block(block, compression, jpeg_quality))
    else:
        for _, block in cut_cog_blocks(arr, tile, predictor):
            tiles.append(_compress_block(block, compression, jpeg_quality))

    entries: List[Tuple[int, int, int, object]] = []
    aux: List[bytes] = []
    if lv_idx > 0:
        entries.append((_NEWSUBFILETYPE, _TYPE_LONG, 1, 1))  # reduced-res
    # photometric: gray (1); RGB (2); JPEG color is stored as YCbCr (6)
    photometric = 1
    if spp >= 3:
        photometric = 6 if compression == "jpeg" else 2
    entries += [
        (_WIDTH, _TYPE_LONG, 1, nx),
        (_LENGTH, _TYPE_LONG, 1, ny),
        (_BITSPERSAMPLE, _TYPE_SHORT, 1, bits)
        if spp == 1
        else (_BITSPERSAMPLE, _TYPE_SHORT, spp, "AUX"),
        (_COMPRESSION, _TYPE_SHORT, 1, _COMPRESSION_CODE[compression]),
        (_PHOTOMETRIC, _TYPE_SHORT, 1, photometric),
        (_SAMPLESPERPIXEL, _TYPE_SHORT, 1, spp),
        (_PLANARCONFIG, _TYPE_SHORT, 1, planar if spp > 1 else 1),
        (_TILEWIDTH, _TYPE_SHORT, 1, tile),
        (_TILELENGTH, _TYPE_SHORT, 1, tile),
        (_TILEOFFSETS, _TYPE_LONG, len(tiles), "TILEOFFSETS"),
        (_TILEBYTECOUNTS, _TYPE_LONG, len(tiles), "TILEBYTECOUNTS"),
        (_SAMPLEFORMAT, _TYPE_SHORT, 1, fmt),
    ]
    if spp > 1:
        aux.append(struct.pack(f"<{spp}H", *([bits] * spp)))
    if predictor in (2, 3):
        entries.append((_PREDICTOR, _TYPE_SHORT, 1, predictor))
    if lv_idx == 0:
        sx, _, x0, _, sy, y0 = geobox.transform
        scale = struct.pack("<3d", abs(sx), abs(sy), 0.0)
        tie = struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0)
        gk = _geokeys(geobox.crs)
        gk_bytes = struct.pack(f"<{len(gk)}H", *gk)
        entries.append((_MODELPIXELSCALE, _TYPE_DOUBLE, 3, "AUX"))
        aux.append(scale)
        entries.append((_MODELTIEPOINT, _TYPE_DOUBLE, 6, "AUX"))
        aux.append(tie)
        entries.append((_GEOKEYDIRECTORY, _TYPE_SHORT, len(gk), "AUX"))
        aux.append(gk_bytes)
        if nodata is not None:
            nd = (f"{int(nodata)}" if float(nodata).is_integer() else repr(float(nodata)))
            nd_b = nd.encode() + b"\x00"
            entries.append((_GDAL_NODATA, _TYPE_ASCII, len(nd_b), "AUX"))
            aux.append(nd_b)
    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order
    return {
        "entries": entries,
        "aux": aux,
        "tiles": tiles,
        "tile_sizes": [len(t) for t in tiles],
    }


def _render_ifd(ifd, next_offset: int, bigtiff: bool = False) -> bytes:
    entries = ifd["entries"]
    aux_iter = iter(ifd["aux"])
    aux_pos = ifd["aux_offset"]
    body = bytearray()
    body += struct.pack("<Q" if bigtiff else "<H", len(entries))
    aux_bytes = bytearray()
    n_tiles = len(ifd["tiles"])
    # entry head + value field sizes per variant; inline values are
    # left-justified (little-endian) in the value field
    vfmt = "<Q" if bigtiff else "<I"

    def emit(tag, typ, count, value_int):
        body.extend(struct.pack("<HH", tag, typ))
        body.extend(struct.pack(vfmt, count))
        body.extend(struct.pack(vfmt, value_int))

    def emit_short(tag, count, value_int):
        body.extend(struct.pack("<HH", tag, _TYPE_SHORT))
        body.extend(struct.pack(vfmt, count))
        body.extend(struct.pack("<H", value_int))
        body.extend(b"\x00" * (6 if bigtiff else 2))

    for tag, typ, count, val in entries:
        if bigtiff and val in ("TILEOFFSETS", "TILEBYTECOUNTS"):
            typ = _TYPE_LONG8  # BigTIFF convention (libtiff writes LONG8)
        if val == "AUX":
            blob = next(aux_iter)
            cap = 8 if bigtiff else 4
            if len(blob) <= cap:
                # inline, left-justified in the value field (TIFF spec)
                body.extend(struct.pack("<HH", tag, typ))
                body.extend(struct.pack(vfmt, count))
                body.extend(blob + b"\x00" * (cap - len(blob)))
            else:
                emit(tag, typ, count, aux_pos)
                aux_pos += len(blob)
                aux_bytes += blob
        elif val in ("TILEOFFSETS", "TILEBYTECOUNTS"):
            if val == "TILEOFFSETS":
                vals, off = [], ifd["data_offset"]
                for sz in ifd["tile_sizes"]:
                    vals.append(off)
                    off += sz
            else:
                vals = ifd["tile_sizes"]
            if n_tiles == 1:
                emit(tag, typ, 1, vals[0])
            else:
                item = "Q" if typ == _TYPE_LONG8 else "I"
                blob = struct.pack(f"<{n_tiles}{item}", *vals)
                emit(tag, typ, n_tiles, aux_pos)
                aux_pos += len(blob)
                aux_bytes += blob
        elif typ == _TYPE_SHORT:
            emit_short(tag, count, int(val))
        else:
            emit(tag, typ, count, int(val))
    body += struct.pack("<Q" if bigtiff else "<I", next_offset)
    return bytes(body) + bytes(aux_bytes)


# ---------------------------------------------------------------------------
# header-only parse + single-tile range reads (the COG access pattern:
# one head fetch plans everything, then byte-range reads per tile)


def read_cog_header(path: str) -> Dict:
    """Parse ONLY the IFD region (COG layout puts all IFDs before any tile
    data, so one small head read suffices — here a single 64 KiB read
    covers typical headers, extended if needed). Handles classic TIFF
    (version 42, 32-bit offsets) and BigTIFF (version 43, 64-bit offsets —
    what GDAL writes for >4 GiB COGs). Returns per-level tile layout + geo
    tags, no pixel bytes. ``path`` may be a local path or any
    rangeio-supported URL (http(s)/s3) — the head fetch becomes ranged
    GETs (reference: GDAL VSI curl reads, loader/_rio.py:374-475)."""
    from .rangeio import range_open

    with range_open(path) as f:
        f.seek(0, 2)
        fsize = f.tell()
        f.seek(0)
        buf = f.read(65536)

        def ensure(n):
            # bounded growth: a corrupt offset/count must raise, never
            # pre-allocate its claimed size (fuzz finding: a mutated IFD
            # offset drove one huge f.read into MemoryError)
            nonlocal buf
            if n > fsize:
                raise ValueError(
                    f"TIFF: structure points beyond EOF ({n} > {fsize})"
                )
            while len(buf) < n:
                chunk = f.read(min(1 << 20, max(65536, n - len(buf))))
                if not chunk:
                    break
                buf += chunk

        order, magic = struct.unpack_from("<2sH", buf, 0)
        assert order == b"II", "big-endian TIFF not supported"
        if magic == 42:
            big = False
            (ifd_off,) = struct.unpack_from("<I", buf, 4)
        elif magic == 43:
            big = True
            osize, pad, ifd_off = struct.unpack_from("<HHQ", buf, 4)
            if osize != 8 or pad != 0:
                raise NotImplementedError(f"BigTIFF offset size {osize} unsupported")
        else:
            raise ValueError(f"not a TIFF (version {magic})")
        # per-variant geometry: entry stride, count/offset widths, inline cap
        entry_sz, cnt_fmt, off_fmt, inline_cap = (
            (20, "<Q", "<Q", 8) if big else (12, "<H", "<I", 4)
        )
        cnt_sz = 8 if big else 2
        _ITEM = {_TYPE_SHORT: (2, "H"), _TYPE_LONG: (4, "I"), _TYPE_LONG8: (8, "Q")}
        levels = []
        geo: Dict = {"nodata": None, "epsg": None, "transform": None}
        seen_ifds = set()
        while ifd_off:
            if ifd_off in seen_ifds or len(seen_ifds) > 4096:
                # a corrupt next-IFD pointer cycling back would walk the
                # chain forever (fuzz finding)
                raise ValueError("TIFF: cyclic or runaway IFD chain")
            seen_ifds.add(ifd_off)
            ensure(ifd_off + cnt_sz)
            (n_entries,) = struct.unpack_from(cnt_fmt, buf, ifd_off)
            ensure(ifd_off + cnt_sz + entry_sz * n_entries + (8 if big else 4))
            tags: Dict[int, Tuple[int, int, int]] = {}
            for i in range(n_entries):
                base = ifd_off + cnt_sz + entry_sz * i
                tag, typ = struct.unpack_from("<HH", buf, base)
                (count,) = struct.unpack_from(off_fmt, buf, base + 4)
                (raw,) = struct.unpack_from(off_fmt, buf, base + 4 + (8 if big else 4))
                tags[tag] = (typ, count, raw)
            (ifd_off,) = struct.unpack_from(
                off_fmt, buf, ifd_off + cnt_sz + entry_sz * n_entries
            )

            def short_val(tag):
                typ, count, raw = tags[tag]
                return raw & 0xFFFF if typ == _TYPE_SHORT else raw

            def val_bytes(tag, nbytes):
                """The tag's value bytes, whether inline or at an offset."""
                typ, count, raw = tags[tag]
                if nbytes <= inline_cap:
                    return struct.pack(off_fmt, raw)[:nbytes]
                ensure(raw + nbytes)
                return bytes(buf[raw : raw + nbytes])

            def long_array(tag):
                typ, count, raw = tags[tag]
                size, item = _ITEM[typ]
                b = val_bytes(tag, size * count)
                return list(struct.unpack_from(f"<{count}{item}", b, 0))

            if tags[_BITSPERSAMPLE][1] > 1:
                bps = long_array(_BITSPERSAMPLE)
                if len(set(bps)) != 1:
                    raise NotImplementedError("TIFF: per-sample bit depths must match")
                bits = bps[0]
            else:
                bits = short_val(_BITSPERSAMPLE)
            fmt = short_val(_SAMPLEFORMAT) if _SAMPLEFORMAT in tags else 1
            comp = short_val(_COMPRESSION) if _COMPRESSION in tags else 1
            if comp not in (1, 5, 7, 8, 32946, 32773, 34712, 34925, 50000, 50001):
                raise NotImplementedError(
                    f"TIFF compression {comp}: only none(1)/lzw(5)/jpeg(7)/"
                    "deflate(8,32946)/packbits(32773)/jpeg2000(34712)/"
                    "lzma(34925)/zstd(50000)/webp(50001) readable without GDAL"
                )
            pred = short_val(_PREDICTOR) if _PREDICTOR in tags else 1
            if pred not in (1, 2, 3):
                raise NotImplementedError(
                    f"TIFF predictor {pred}: only none(1)/horizontal(2)/"
                    "floating-point(3) supported"
                )
            spp = (
                short_val(_SAMPLESPERPIXEL) if _SAMPLESPERPIXEL in tags else 1
            )
            planar = short_val(_PLANARCONFIG) if _PLANARCONFIG in tags else 1
            if spp > 1 and planar not in (1, 2):
                raise NotImplementedError(
                    f"TIFF multi-band: PlanarConfig {planar} unknown (1=chunky, 2=planar)"
                )
            nx, ny = short_val(_WIDTH), short_val(_LENGTH)
            if _TILEOFFSETS in tags:
                tile_w, tile_h = short_val(_TILEWIDTH), short_val(_TILELENGTH)
                offsets = long_array(_TILEOFFSETS)
                bytecounts = long_array(_TILEBYTECOUNTS)
            else:
                # strip-organized: each strip is a full-width block of
                # RowsPerStrip rows (the last one short) — present strips
                # as nx-wide tiles so all window math downstream is shared
                rps = (
                    min(short_val(_ROWSPERSTRIP), ny)
                    if _ROWSPERSTRIP in tags
                    else ny
                )
                tile_w, tile_h = nx, rps
                offsets = long_array(_STRIPOFFSETS)
                bytecounts = long_array(_STRIPBYTECOUNTS)
            jpeg_tables = (
                val_bytes(_JPEGTABLES, tags[_JPEGTABLES][1])
                if _JPEGTABLES in tags
                else None
            )
            # allocation sanity (same discipline as the JP2 decode cap):
            # a corrupt header must raise, never drive a tile-sized
            # np.full/decompress into executor OOM
            if not (0 < tile_w and 0 < tile_h and 0 < nx and 0 < ny):
                raise ValueError(
                    f"TIFF: invalid dimensions {ny}x{nx} tiles {tile_h}x{tile_w}"
                )
            # Legit large single-strip TIFFs (one strip = whole image)
            # may exceed the default; the env override mirrors the JP2
            # cap's escape hatch (ODC_STAC_SPARK_JP2_MAX_PIXELS).
            tile_cap = int(
                os.environ.get("ODC_STAC_SPARK_TIFF_MAX_PIXELS", str(1 << 28))
            )
            if tile_w * tile_h * max(spp, 1) > tile_cap:
                raise ValueError(
                    f"TIFF: tile claims {tile_h}x{tile_w}x{spp} samples — "
                    "over the decode sanity cap (ODC_STAC_SPARK_TIFF_MAX_PIXELS)"
                )
            levels.append(
                {
                    "nx": nx,
                    "ny": ny,
                    "tile_w": tile_w,
                    "tile_h": tile_h,
                    "dtype": _NP_DTYPE[(fmt, bits)],
                    "compression": comp,
                    "predictor": pred,
                    "spp": spp,
                    "planar": planar,
                    "jpeg_tables": jpeg_tables,
                    "offsets": offsets,
                    "bytecounts": bytecounts,
                }
            )
            if _MODELPIXELSCALE in tags:
                sx, sy, _z = struct.unpack_from("<3d", val_bytes(_MODELPIXELSCALE, 24), 0)
                _i, _j, _k, x0, y0, _z2 = struct.unpack_from(
                    "<6d", val_bytes(_MODELTIEPOINT, 48), 0
                )
                geo["transform"] = (sx, 0.0, x0, 0.0, -sy, y0)
            if _GEOKEYDIRECTORY in tags:
                count = tags[_GEOKEYDIRECTORY][1]
                gk = struct.unpack_from(f"<{count}H", val_bytes(_GEOKEYDIRECTORY, 2 * count), 0)
                for i in range(4, len(gk), 4):
                    if gk[i] in (2048, 3072):
                        geo["epsg"] = gk[i + 3]
            if _GDAL_NODATA in tags:
                count = tags[_GDAL_NODATA][1]
                nd = val_bytes(_GDAL_NODATA, count)
                geo["nodata"] = float(nd[: count - 1].decode())
        return {"levels": levels, **geo}


def read_cog_tile(
    path: str, header: Dict, level: int, tile_idx: int, sample: Optional[int] = None
) -> np.ndarray:
    """One tile/strip via seek + byte-range read (the executor-side access
    pattern; over object storage this becomes an HTTP range request).
    Always returns a full (tile_h, tile_w) block — a short last strip is
    zero-padded (callers slice to the valid extent).

    Multi-band (SamplesPerPixel>1, chunky) files return (tile_h, tile_w,
    spp) — or one 2-D band when ``sample`` (0-based) is given.
    PlanarConfig=2 (separate planes) stores each sample's tiles
    contiguously: with a ``sample`` only THAT plane's tile is fetched
    (band selection reads 1/spp of the bytes — the planar layout's whole
    point); without one, the planes are fetched and restacked."""
    lv = header["levels"][level]
    spp_file = lv.get("spp", 1)
    if lv.get("planar", 1) == 2 and spp_file > 1:
        tiles_per_plane = len(lv["offsets"]) // spp_file
        lv1 = dict(lv, spp=1, planar=1)
        if sample is not None:
            s = min(sample, spp_file - 1)
            hdr1 = dict(header, levels=list(header["levels"]))
            hdr1["levels"][level] = lv1
            return read_cog_tile(
                path, hdr1, level, s * tiles_per_plane + tile_idx, sample=None
            )
        hdr1 = dict(header, levels=list(header["levels"]))
        hdr1["levels"][level] = lv1
        planes = [
            read_cog_tile(path, hdr1, level, s * tiles_per_plane + tile_idx)
            for s in range(spp_file)
        ]
        return np.stack(planes, axis=-1)
    off = lv["offsets"][tile_idx]
    cnt = lv["bytecounts"][tile_idx]
    from .rangeio import fetch_range

    raw = fetch_range(path, off, cnt)
    comp = lv.get("compression", 1)
    dt = np.dtype(lv["dtype"])
    th, tw = lv["tile_h"], lv["tile_w"]
    spp = lv.get("spp", 1)
    if comp == 7:
        # one baseline JFIF stream per tile; abbreviated streams carry
        # their tables in the JPEGTables tag — splice them after SOI
        from ..operators.jpeg import decode_jpeg

        tables = lv.get("jpeg_tables")
        if tables and raw[2:4] not in (b"\xff\xdb", b"\xff\xc4") and b"\xff\xdb" not in raw[:64]:
            raw = raw[:2] + tables[2:-2] + raw[2:]
        img = decode_jpeg(raw)  # (h, w, 1) gray or (h, w, 3) RGB (from YCbCr)
        arr = img.astype(dt, copy=False)
        if arr.shape[0] < th or arr.shape[1] < tw:
            full = np.zeros((th, tw, arr.shape[2]), dt)
            full[: arr.shape[0], : arr.shape[1]] = arr
            arr = full
        if sample is not None:
            return arr[:, :, min(sample, arr.shape[2] - 1)]
        return arr[:, :, 0] if arr.shape[2] == 1 else arr
    if comp == 34712:
        # JPEG2000 (GDAL's registered code): one lossless Part-1
        # codestream per tile, via the in-repo codec (operators/jp2.py)
        from ..operators.jp2 import decode_jp2

        arr = decode_jp2(raw).astype(dt, copy=False)
        if arr.shape[0] < th or arr.shape[1] < tw:
            full = np.zeros((th, tw, arr.shape[2]), dt)
            full[: arr.shape[0], : arr.shape[1]] = arr
            arr = full
        if sample is not None:
            return arr[:, :, min(sample, arr.shape[2] - 1)]
        return arr[:, :, 0] if arr.shape[2] == 1 else arr
    if comp == 50001:
        # WEBP (GDAL's registered code): one complete RIFF/WebP per tile,
        # decoded by the in-repo lossless VP8L codec (operators/webp.py);
        # lossy VP8 payloads raise toward the native-codec seam there
        from ..operators.webp import decode_webp

        arr = decode_webp(raw).astype(dt, copy=False)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[0] < th or arr.shape[1] < tw:
            full = np.zeros((th, tw, arr.shape[2]), dt)
            full[: arr.shape[0], : arr.shape[1]] = arr
            arr = full
        if sample is not None:
            return arr[:, :, min(sample, arr.shape[2] - 1)]
        # single-band tiles are stored as gray RGB triplets (the format is
        # 3/4-channel); collapse back to the band
        return arr[:, :, 0] if spp == 1 else arr
    if comp in (8, 32946):
        raw = zlib.decompress(raw)
    elif comp == 5:
        raw = lzw_decode(raw)
    elif comp == 32773:
        raw = packbits_decode(raw, expected=th * tw * spp * dt.itemsize)
    elif comp == 34925:
        # LZMA (libtiff tif_lzma.c): an xz-container stream per tile —
        # self-describing, stdlib-decodable
        import lzma

        raw = lzma.decompress(raw)
    elif comp == 50000:
        raw = _zstd_decompress(raw, expected=th * tw * spp * dt.itemsize)
    n_rows = len(raw) // (tw * spp * dt.itemsize)
    if lv.get("predictor", 1) == 3:
        # floating-point predictor: byte-plane cumsum + reassembly
        rows = np.frombuffer(
            raw, np.uint8, count=n_rows * tw * spp * dt.itemsize
        ).reshape(n_rows, -1)
        arr = _undo_predictor3(rows, tw * spp, dt).reshape(n_rows, tw, spp)
    else:
        arr = np.frombuffer(raw, dt, count=n_rows * tw * spp).reshape(n_rows, tw, spp)
    if lv.get("predictor", 1) == 2:
        # horizontal differencing runs per sample channel (stride = spp)
        u = arr.view(f"u{dt.itemsize}")
        arr = np.add.accumulate(u, axis=1, dtype=u.dtype).view(dt)
    if n_rows < th:  # short last strip: pad below the valid rows
        full = np.zeros((th, tw, spp), dt)
        full[:n_rows] = arr
        arr = full
    if sample is not None:
        return arr[:, :, min(sample, spp - 1)]
    return arr[:, :, 0] if spp == 1 else arr


# ---------------------------------------------------------------------------
# reader (tests + range-read planning demo)

_NP_DTYPE = {
    (1, 8): "uint8", (1, 16): "uint16", (1, 32): "uint32",
    (2, 8): "int8", (2, 16): "int16", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
}


def read_cog_file(path: str) -> Dict:
    """Full-file read via the same header+tile path the executor-side
    range reader uses (tiled or strip-organized, Compression 1/5/8/32946,
    Predictor 1/2): full-res array, overview arrays, geotransform, EPSG,
    nodata."""
    hdr = read_cog_header(path)
    levels = []
    for li, lv in enumerate(hdr["levels"]):
        ny, nx, th, tw = lv["ny"], lv["nx"], lv["tile_h"], lv["tile_w"]
        spp = lv.get("spp", 1)
        ntx = (nx + tw - 1) // tw
        shape = (ny, nx) if spp == 1 else (ny, nx, spp)
        arr = np.zeros(shape, dtype=np.dtype(lv["dtype"]))
        n_spatial = len(lv["offsets"])
        if lv.get("planar", 1) == 2 and spp > 1:
            n_spatial //= spp  # planar: offsets repeat per sample plane
        for ti in range(n_spatial):
            ty, tx = divmod(ti, ntx)
            block = read_cog_tile(path, hdr, li, ti)
            ys, xs = min(th, ny - ty * th), min(tw, nx - tx * tw)
            arr[ty * th : ty * th + ys, tx * tw : tx * tw + xs] = block[:ys, :xs]
        levels.append(arr)
    return {
        "data": levels[0],
        "overviews": levels[1:],
        "transform": hdr["transform"],
        "epsg": hdr["epsg"],
        "nodata": hdr["nodata"],
    }
