"""Minimal cloud-optimized GeoTIFF writer/reader in pure Python (S14).

The reference writes COGs through rasterio (`xx.odc.write_cog`,
docs/samples/save-cog-from-stac.py); rasterio is absent here, but a COG
is just a TIFF with a specific layout — header + all IFDs up front
(full-res first, then reduced-resolution overview IFDs), tile data after,
so an HTTP range reader can plan its reads from one head request. This
module emits exactly that layout from scratch:

- classic little-endian TIFF, tiled (TileWidth/TileLength 256 default)
- DEFLATE-compressed tiles by default (Compression=8 via stdlib zlib —
  what virtually every real-world COG uses), or uncompressed
  (Compression=1)
- GeoTIFF georeferencing: ModelPixelScaleTag + ModelTiepointTag +
  GeoKeyDirectoryTag (projected EPSG or geographic EPSG:4326)
- GDAL_NODATA ascii tag
- overviews: nearest-decimation reduced-resolution IFDs (NewSubfileType=1)

The readers handle tiled single-band TIFFs with Compression 1/8/32946
(none / zlib deflate) — enough to read both this writer's output and
typical externally-produced deflate COGs without GDAL.

Scale note: one COG per (band, t) mosaic is a driver-side or
foreachPartition finalization step over collected tiles — the distributed
artifact remains the parquet tile table (sinks.write_tiles_parquet);
this writer is the export/interchange sink.
"""

from __future__ import annotations

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
_SAMPLESPERPIXEL = 277
_PLANARCONFIG = 284
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

_SAMPLEFORMAT_FOR_KIND = {"u": 1, "i": 2, "f": 3}


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
) -> None:
    """Write a single-band 2-D array as a tiled COG-layout GeoTIFF.

    ``compression``: "deflate" (Compression=8, stdlib zlib per tile — what
    virtually every real-world COG uses) or "none" (Compression=1)."""
    if pix.ndim != 2:
        raise ValueError("write_cog_file expects a 2-D single-band array")
    if compression not in ("deflate", "none"):
        raise ValueError(f"compression must be 'deflate' or 'none', got {compression!r}")
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

    pix = np.ascontiguousarray(pix)
    levels = [pix] + [pix[::lv, ::lv] for lv in overview_levels]

    # ---- plan IFDs first (COG layout: all IFDs before any tile data)
    ifds = []
    for lv_idx, arr in enumerate(levels):
        ifds.append(
            _plan_ifd(arr, geobox, nodata, tile, lv_idx, overview_levels, compression)
        )

    # layout: header(8) | IFD blocks (each: entries + next ptr + aux data)
    # | tile data
    pos = 8
    for ifd in ifds:
        ifd["ifd_offset"] = pos
        pos += 2 + 12 * len(ifd["entries"]) + 4  # count + entries + next
        ifd["aux_offset"] = pos
        aux_total = sum(len(b) for b in ifd["aux"])
        if len(ifd["tiles"]) > 1:
            # TileOffsets + TileByteCounts arrays also live in the aux area
            aux_total += 2 * 4 * len(ifd["tiles"])
        pos += aux_total
    for ifd in ifds:
        ifd["data_offset"] = pos
        pos += sum(ifd["tile_sizes"])

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifds[0]["ifd_offset"])
    for i, ifd in enumerate(ifds):
        next_off = ifds[i + 1]["ifd_offset"] if i + 1 < len(ifds) else 0
        out += _render_ifd(ifd, next_off)
    for ifd in ifds:
        for t_bytes in ifd["tiles"]:
            out += t_bytes
    with open(path, "wb") as f:
        f.write(bytes(out))


def _plan_ifd(arr, geobox, nodata, tile, lv_idx, overview_levels, compression="none"):
    ny, nx = arr.shape
    dt = arr.dtype
    bits = dt.itemsize * 8
    fmt = _SAMPLEFORMAT_FOR_KIND[dt.kind]
    deflate = compression == "deflate"
    tiles: List[bytes] = []
    for ty in range(0, ny, tile):
        for tx in range(0, nx, tile):
            block = np.zeros((tile, tile), dtype=dt)
            sub = arr[ty : ty + tile, tx : tx + tile]
            block[: sub.shape[0], : sub.shape[1]] = sub
            raw = block.tobytes()
            tiles.append(zlib.compress(raw, 6) if deflate else raw)

    entries: List[Tuple[int, int, int, object]] = []
    aux: List[bytes] = []
    if lv_idx > 0:
        entries.append((_NEWSUBFILETYPE, _TYPE_LONG, 1, 1))  # reduced-res
    entries += [
        (_WIDTH, _TYPE_LONG, 1, nx),
        (_LENGTH, _TYPE_LONG, 1, ny),
        (_BITSPERSAMPLE, _TYPE_SHORT, 1, bits),
        (_COMPRESSION, _TYPE_SHORT, 1, 8 if deflate else 1),
        (_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
        (_SAMPLESPERPIXEL, _TYPE_SHORT, 1, 1),
        (_PLANARCONFIG, _TYPE_SHORT, 1, 1),
        (_TILEWIDTH, _TYPE_SHORT, 1, tile),
        (_TILELENGTH, _TYPE_SHORT, 1, tile),
        (_TILEOFFSETS, _TYPE_LONG, len(tiles), "TILEOFFSETS"),
        (_TILEBYTECOUNTS, _TYPE_LONG, len(tiles), "TILEBYTECOUNTS"),
        (_SAMPLEFORMAT, _TYPE_SHORT, 1, fmt),
    ]
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


def _render_ifd(ifd, next_offset: int) -> bytes:
    entries = ifd["entries"]
    aux_iter = iter(ifd["aux"])
    aux_pos = ifd["aux_offset"]
    body = bytearray()
    body += struct.pack("<H", len(entries))
    aux_bytes = bytearray()
    n_tiles = len(ifd["tiles"])
    for tag, typ, count, val in entries:
        if val == "AUX":
            blob = next(aux_iter)
            body += struct.pack("<HHII", tag, typ, count, aux_pos)
            aux_pos += len(blob)
            aux_bytes += blob
        elif val == "TILEOFFSETS":
            offs = []
            off = ifd["data_offset"]
            for sz in ifd["tile_sizes"]:
                offs.append(off)
                off += sz
            if n_tiles == 1:
                body += struct.pack("<HHII", tag, typ, 1, offs[0])
            else:
                blob = struct.pack(f"<{n_tiles}I", *offs)
                body += struct.pack("<HHII", tag, typ, n_tiles, aux_pos)
                aux_pos += len(blob)
                aux_bytes += blob
        elif val == "TILEBYTECOUNTS":
            if n_tiles == 1:
                body += struct.pack("<HHII", tag, typ, 1, ifd["tile_sizes"][0])
            else:
                blob = struct.pack(f"<{n_tiles}I", *ifd["tile_sizes"])
                body += struct.pack("<HHII", tag, typ, n_tiles, aux_pos)
                aux_pos += len(blob)
                aux_bytes += blob
        else:
            # inline value (fits in 4 bytes for our SHORT/LONG singles)
            if typ == _TYPE_SHORT:
                body += struct.pack("<HHIHH", tag, typ, count, int(val), 0)
            else:
                body += struct.pack("<HHII", tag, typ, count, int(val))
    body += struct.pack("<I", next_offset)
    return bytes(body) + bytes(aux_bytes)


# ---------------------------------------------------------------------------
# header-only parse + single-tile range reads (the COG access pattern:
# one head fetch plans everything, then byte-range reads per tile)


def read_cog_header(path: str) -> Dict:
    """Parse ONLY the IFD region (COG layout puts all IFDs before any tile
    data, so one small head read suffices — here a single 64 KiB read
    covers typical headers, extended if needed). Returns per-level tile
    layout + geo tags, no pixel bytes."""
    with open(path, "rb") as f:
        buf = f.read(65536)

        def ensure(n):
            nonlocal buf
            while len(buf) < n:
                chunk = f.read(max(65536, n - len(buf)))
                if not chunk:
                    break
                buf += chunk

        order, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
        assert order == b"II" and magic == 42
        levels = []
        geo: Dict = {"nodata": None, "epsg": None, "transform": None}
        while ifd_off:
            ensure(ifd_off + 2)
            (n_entries,) = struct.unpack_from("<H", buf, ifd_off)
            ensure(ifd_off + 2 + 12 * n_entries + 4)
            tags: Dict[int, Tuple[int, int, int]] = {}
            for i in range(n_entries):
                tag, typ, count, raw = struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)
                tags[tag] = (typ, count, raw)
            (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n_entries)

            def short_val(tag):
                typ, count, raw = tags[tag]
                return raw & 0xFFFF if typ == _TYPE_SHORT else raw

            def long_array(tag):
                typ, count, raw = tags[tag]
                if count == 1:
                    return [raw]
                ensure(raw + 4 * count)
                return list(struct.unpack_from(f"<{count}I", buf, raw))

            bits = short_val(_BITSPERSAMPLE)
            fmt = short_val(_SAMPLEFORMAT)
            comp = short_val(_COMPRESSION) if _COMPRESSION in tags else 1
            if comp not in (1, 8, 32946):
                raise NotImplementedError(
                    f"TIFF compression {comp}: only none(1)/deflate(8,32946) "
                    "readable without GDAL"
                )
            if 317 in tags and (tags[317][2] & 0xFFFF) != 1:
                raise NotImplementedError("TIFF predictor != 1 not supported")
            levels.append(
                {
                    "nx": short_val(_WIDTH),
                    "ny": short_val(_LENGTH),
                    "tile_w": short_val(_TILEWIDTH),
                    "tile_h": short_val(_TILELENGTH),
                    "dtype": _NP_DTYPE[(fmt, bits)],
                    "compression": comp,
                    "offsets": long_array(_TILEOFFSETS),
                    "bytecounts": long_array(_TILEBYTECOUNTS),
                }
            )
            if _MODELPIXELSCALE in tags:
                typ, count, raw = tags[_MODELPIXELSCALE]
                ensure(raw + 24)
                sx, sy, _z = struct.unpack_from("<3d", buf, raw)
                typ, count, raw = tags[_MODELTIEPOINT]
                ensure(raw + 48)
                _i, _j, _k, x0, y0, _z2 = struct.unpack_from("<6d", buf, raw)
                geo["transform"] = (sx, 0.0, x0, 0.0, -sy, y0)
            if _GEOKEYDIRECTORY in tags:
                typ, count, raw = tags[_GEOKEYDIRECTORY]
                ensure(raw + 2 * count)
                gk = struct.unpack_from(f"<{count}H", buf, raw)
                for i in range(4, len(gk), 4):
                    if gk[i] in (2048, 3072):
                        geo["epsg"] = gk[i + 3]
            if _GDAL_NODATA in tags:
                typ, count, raw = tags[_GDAL_NODATA]
                ensure(raw + count)
                geo["nodata"] = float(buf[raw : raw + count - 1].decode())
        return {"levels": levels, **geo}


def read_cog_tile(path: str, header: Dict, level: int, tile_idx: int) -> np.ndarray:
    """One tile via seek + byte-range read (the executor-side access
    pattern; over object storage this becomes an HTTP range request)."""
    lv = header["levels"][level]
    off = lv["offsets"][tile_idx]
    cnt = lv["bytecounts"][tile_idx]
    with open(path, "rb") as f:
        f.seek(off)
        raw = f.read(cnt)
    if lv.get("compression", 1) in (8, 32946):
        raw = zlib.decompress(raw)
    dt = np.dtype(lv["dtype"])
    return np.frombuffer(raw, dt).reshape(lv["tile_h"], lv["tile_w"])


# ---------------------------------------------------------------------------
# reader (tests + range-read planning demo)

_NP_DTYPE = {
    (1, 8): "uint8", (1, 16): "uint16", (1, 32): "uint32",
    (2, 8): "int8", (2, 16): "int16", (2, 32): "int32",
    (3, 32): "float32", (3, 64): "float64",
}


def read_cog_file(path: str) -> Dict:
    """Parse a write_cog_file-produced TIFF: full-res array, overview
    arrays, geotransform, EPSG, nodata."""
    with open(path, "rb") as f:
        buf = f.read()
    order, magic, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    assert order == b"II" and magic == 42, "not a classic little-endian TIFF"
    levels = []
    geo: Dict = {"nodata": None, "epsg": None, "transform": None}
    while ifd_off:
        (n_entries,) = struct.unpack_from("<H", buf, ifd_off)
        tags: Dict[int, Tuple[int, int, int]] = {}
        for i in range(n_entries):
            tag, typ, count, raw = struct.unpack_from(
                "<HHII", buf, ifd_off + 2 + 12 * i
            )
            tags[tag] = (typ, count, raw)
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n_entries)

        def _short_val(tag):
            typ, count, raw = tags[tag]
            return raw & 0xFFFF if typ == _TYPE_SHORT else raw

        def _long_array(tag):
            typ, count, raw = tags[tag]
            if count == 1:
                return [raw]
            return list(struct.unpack_from(f"<{count}I", buf, raw))

        nx, ny = _short_val(_WIDTH), _short_val(_LENGTH)
        tw, th = _short_val(_TILEWIDTH), _short_val(_TILELENGTH)
        bits = _short_val(_BITSPERSAMPLE)
        fmt = _short_val(_SAMPLEFORMAT)
        comp = _short_val(_COMPRESSION) if _COMPRESSION in tags else 1
        if comp not in (1, 8, 32946):
            raise NotImplementedError(
                f"TIFF compression {comp}: only none(1)/deflate(8,32946) "
                "readable without GDAL"
            )
        dt = np.dtype(_NP_DTYPE[(fmt, bits)])
        offs = _long_array(_TILEOFFSETS)
        cnts = _long_array(_TILEBYTECOUNTS)
        ntx = (nx + tw - 1) // tw
        arr = np.zeros((ny, nx), dtype=dt)
        for ti, off in enumerate(offs):
            ty, tx = divmod(ti, ntx)
            if comp in (8, 32946):
                raw = zlib.decompress(buf[off : off + cnts[ti]])
                block = np.frombuffer(raw, dt, count=tw * th).reshape(th, tw)
            else:
                block = np.frombuffer(buf, dt, count=tw * th, offset=off).reshape(th, tw)
            ys, xs = min(th, ny - ty * th), min(tw, nx - tx * tw)
            arr[ty * th : ty * th + ys, tx * tw : tx * tw + xs] = block[:ys, :xs]
        levels.append(arr)

        if _MODELPIXELSCALE in tags:
            _, _, raw = tags[_MODELPIXELSCALE]
            sx, sy, _ = struct.unpack_from("<3d", buf, raw)
            _, _, raw = tags[_MODELTIEPOINT]
            _, _, _, x0, y0, _ = struct.unpack_from("<6d", buf, raw)
            geo["transform"] = (sx, 0.0, x0, 0.0, -sy, y0)
        if _GEOKEYDIRECTORY in tags:
            typ, count, raw = tags[_GEOKEYDIRECTORY]
            gk = struct.unpack_from(f"<{count}H", buf, raw)
            for i in range(4, len(gk), 4):
                if gk[i] in (2048, 3072):
                    geo["epsg"] = gk[i + 3]
        if _GDAL_NODATA in tags:
            typ, count, raw = tags[_GDAL_NODATA]
            geo["nodata"] = float(buf[raw : raw + count - 1].decode())

    return {"data": levels[0], "overviews": levels[1:], **geo}
