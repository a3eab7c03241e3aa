"""Unit tests for the pure-Python tiled COG writer/reader
(sources/geotiff.py): dtype matrix, tile-edge padding, overview IFDs,
georeferencing tags, nodata tag, COG layout invariant (all IFDs before
any tile data)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from odc_stac_spark.model import GeoBox
from odc_stac_spark.sources.geotiff import read_cog_file, write_cog_file

GBOX = GeoBox((70, 90), (10.0, 0.0, 1200.0, 0.0, -10.0, 98000.0), "EPSG:32735")


def rand(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    if np.dtype(dtype).kind == "f":
        return rng.random(shape).astype(dtype)
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max, size=shape, dtype=dtype)


@pytest.mark.parametrize(
    "dtype", ["uint8", "uint16", "int16", "int32", "float32", "float64"]
)
def test_roundtrip_dtypes(tmp_path, dtype):
    arr = rand((70, 90), dtype)
    p = str(tmp_path / f"x_{dtype}.tif")
    write_cog_file(p, arr, GBOX, tile=64)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)
    assert got["data"].dtype == np.dtype(dtype)


def test_tile_edges_and_multi_tile(tmp_path):
    """Non-multiple-of-tile shape: edge tiles are zero-padded in the file
    but the read crops back exactly."""
    arr = rand((300, 530), "uint16", seed=3)
    p = str(tmp_path / "big.tif")
    write_cog_file(p, arr, GBOX, tile=256)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)


def test_overviews_nearest_decimation(tmp_path):
    arr = rand((600, 600), "uint8", seed=1)
    p = str(tmp_path / "ovr.tif")
    write_cog_file(p, arr, GBOX, tile=256, overview_levels=[2, 4])
    got = read_cog_file(p)
    assert len(got["overviews"]) == 2
    np.testing.assert_array_equal(got["overviews"][0], arr[::2, ::2])
    np.testing.assert_array_equal(got["overviews"][1], arr[::4, ::4])


def test_geo_tags_and_nodata(tmp_path):
    arr = rand((70, 90), "int32", seed=2)
    p = str(tmp_path / "geo.tif")
    write_cog_file(p, arr, GBOX, nodata=-99)
    got = read_cog_file(p)
    assert got["epsg"] == 32735
    assert got["transform"] == GBOX.transform
    assert got["nodata"] == -99.0

    g4326 = GeoBox((10, 10), (0.1, 0.0, 27.0, 0.0, -0.1, -14.0), "EPSG:4326")
    p2 = str(tmp_path / "geo4326.tif")
    write_cog_file(p2, rand((10, 10), "uint8"), g4326, nodata=0.5)
    got2 = read_cog_file(p2)
    assert got2["epsg"] == 4326
    assert got2["nodata"] == 0.5


def test_cog_layout_ifds_before_data(tmp_path):
    """The COG invariant: every IFD (incl. overviews) sits before all tile
    data, so a range reader can plan from one header fetch."""
    arr = rand((600, 600), "uint16", seed=4)
    p = str(tmp_path / "layout.tif")
    write_cog_file(p, arr, GBOX, tile=256, overview_levels=[2])
    buf = open(p, "rb").read()
    _, _, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    ifd_ends = []
    tile_offsets = []
    while ifd_off:
        (n,) = struct.unpack_from("<H", buf, ifd_off)
        for i in range(n):
            tag, typ, count, raw = struct.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i)
            if tag == 324:  # TileOffsets
                offs = (
                    [raw]
                    if count == 1
                    else list(struct.unpack_from(f"<{count}I", buf, raw))
                )
                tile_offsets.extend(offs)
        ifd_ends.append(ifd_off + 2 + 12 * n + 4)
        (ifd_off,) = struct.unpack_from("<I", buf, ifd_off + 2 + 12 * n)
    assert min(tile_offsets) > max(ifd_ends)


def test_deflate_roundtrip_and_size(tmp_path):
    """DEFLATE (Compression=8) tiles round-trip exactly and compress a
    low-entropy image well below the raw size."""
    iy, ix = np.mgrid[0:500, 0:400]
    arr = ((iy // 7 + ix // 5) % 11).astype("uint16")  # repetitive → compressible
    p_raw = str(tmp_path / "raw.tif")
    p_z = str(tmp_path / "z.tif")
    write_cog_file(p_raw, arr, GBOX, nodata=0, compression="none")
    write_cog_file(p_z, arr, GBOX, nodata=0, compression="deflate")
    import os

    assert os.path.getsize(p_z) < os.path.getsize(p_raw) / 3
    got = read_cog_file(p_z)
    np.testing.assert_array_equal(got["data"], arr)
    assert got["nodata"] == 0
    # compression tag actually says 8
    import struct as _s

    buf = open(p_z, "rb").read()
    _, _, ifd_off = _s.unpack_from("<2sHI", buf, 0)
    (n,) = _s.unpack_from("<H", buf, ifd_off)
    comp = {
        t: raw & 0xFFFF
        for t, typ, c, raw in (
            _s.unpack_from("<HHII", buf, ifd_off + 2 + 12 * i) for i in range(n)
        )
    }[259]
    assert comp == 8


def test_deflate_header_tile_reads(tmp_path):
    """Range-read path: read_cog_header + read_cog_tile decompress
    per-tile (the executor-side COG access pattern)."""
    from odc_stac_spark.sources.geotiff import read_cog_header, read_cog_tile

    arr = (np.arange(512 * 512, dtype=np.uint32) % 9973).reshape(512, 512)
    p = str(tmp_path / "t.tif")
    write_cog_file(p, arr.astype("int32"), GBOX, tile=256, compression="deflate")
    hdr = read_cog_header(p)
    assert hdr["levels"][0]["compression"] == 8
    t0 = read_cog_tile(p, hdr, 0, 0)
    np.testing.assert_array_equal(t0, arr[:256, :256].astype("int32"))
    t3 = read_cog_tile(p, hdr, 0, 3)
    np.testing.assert_array_equal(t3, arr[256:, 256:].astype("int32"))


def test_deflate_through_tiff_reader_pipeline(spark, tmp_path):
    """A deflate COG read through TiffReader → full load pipeline must be
    pixel-equal to the in-memory source array."""
    from datetime import datetime

    from odc_stac_spark.model import RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, load
    from odc_stac_spark.plans.load import assemble_numpy

    arr = ((np.arange(300 * 280) * 31) % 2003).reshape(300, 280).astype("uint16")
    g = GeoBox((300, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 3000.0), "EPSG:32735")
    p = str(tmp_path / "pipe.tif")
    write_cog_file(p, arr, g, nodata=0, compression="deflate")
    item = Item(
        id="cog-0",
        datetime=datetime(2020, 6, 6),
        bands={"red": RasterSource(p, geobox=g, meta=RasterBandMetadata("uint16", 0))},
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)["red"][0]
    np.testing.assert_array_equal(got, arr)


def test_south_up_geobox_rejected(tmp_path):
    import pytest as _pytest

    g_south = GeoBox((10, 10), (10.0, 0.0, 0.0, 0.0, 10.0, 0.0), "EPSG:32735")
    with _pytest.raises(ValueError, match="north-up"):
        write_cog_file(str(tmp_path / "s.tif"), np.zeros((10, 10), "uint8"), g_south)


def test_cogtiles_datasource_reads_deflate(spark, tmp_path):
    """The cogtiles Spark data source over a DEFLATE COG."""
    arr = ((np.arange(512 * 512) * 7) % 251).reshape(512, 512).astype("uint8")
    p = str(tmp_path / "ds.tif")
    write_cog_file(p, arr, GBOX, tile=256, compression="deflate")
    from odc_stac_spark.sources.datasource import CogTilesDataSource

    spark.dataSource.register(CogTilesDataSource)
    df = spark.read.format("cogtiles").load(p)
    got = np.zeros_like(arr)
    for r in df.where("level = 0").collect():
        t = np.frombuffer(r.data, dtype=np.uint8).reshape(r.height, r.width)
        got[r.y0 : r.y0 + r.height, r.x0 : r.x0 + r.width] = t
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------------------
# TIFF-LZW (Compression=5) + Predictor=2 + strip-organized layout


def test_lzw_codec_known_bitstream():
    """Hand-derived TIFF-LZW encoding of b'\\x07\\x07\\x07\\x08\\x08\\x07':
    codes Clear(256),7,258,8,8,7,EOI(257), all 9-bit MSB-first — validates
    the codec against the TIFF 6.0 spec algorithm, not just itself."""
    from odc_stac_spark.sources.geotiff import lzw_decode, lzw_encode

    data = b"\x07\x07\x07\x08\x08\x07"
    codes = [256, 7, 258, 8, 8, 7, 257]
    bits = "".join(format(c, "09b") for c in codes)
    bits += "0" * (-len(bits) % 8)
    expected = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_encode(data) == expected
    assert lzw_decode(expected) == data


@pytest.mark.parametrize("seed", [0, 1])
def test_lzw_codec_roundtrip_large(seed):
    """Round-trip through all code-width bumps (9→12 bits) and at least
    one ClearCode table reset (needs > ~4000 distinct phrases)."""
    from odc_stac_spark.sources.geotiff import lzw_decode, lzw_encode

    rng = np.random.default_rng(seed)
    # mix of compressible runs and noise, > 64 KiB so the dictionary fills
    runs = b"".join(bytes([b]) * n for b, n in zip(
        rng.integers(0, 256, 2000), rng.integers(1, 30, 2000)
    ))
    noise = rng.integers(0, 256, 40000, dtype=np.uint8).tobytes()
    data = runs + noise + runs[::-1]
    assert lzw_decode(lzw_encode(data)) == data


def test_lzw_codec_empty_and_single():
    from odc_stac_spark.sources.geotiff import lzw_decode, lzw_encode

    assert lzw_decode(lzw_encode(b"")) == b""
    assert lzw_decode(lzw_encode(b"\x42")) == b"\x42"


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "int32"])
def test_predictor2_roundtrip(dtype):
    from odc_stac_spark.sources.geotiff import _apply_predictor2, _undo_predictor2

    arr = rand((33, 47), dtype, seed=5)
    np.testing.assert_array_equal(_undo_predictor2(_apply_predictor2(arr)), arr)


def test_predictor2_rejects_float():
    from odc_stac_spark.sources.geotiff import _apply_predictor2

    with pytest.raises(ValueError, match="integer"):
        _apply_predictor2(np.zeros((2, 2), "float32"))


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16"])
def test_lzw_pred2_cog_roundtrip(tmp_path, dtype):
    """LZW+Predictor=2 tiled COG round-trips pixel-exact; smooth imagery
    compresses better WITH the predictor (the reason archives use it)."""
    import os

    from odc_stac_spark.sources.geotiff import read_cog_header

    iy, ix = np.mgrid[0:300, 0:280]
    arr = (iy * 3 + ix // 2).astype(dtype)  # smooth gradient
    p1 = str(tmp_path / "lzw1.tif")
    p2 = str(tmp_path / "lzw2.tif")
    write_cog_file(p1, arr, GBOX, nodata=0, compression="lzw", predictor=1)
    write_cog_file(p2, arr, GBOX, nodata=0, compression="lzw", predictor=2)
    for p in (p1, p2):
        got = read_cog_file(p)
        np.testing.assert_array_equal(got["data"], arr)
        assert got["nodata"] == 0
    hdr = read_cog_header(p2)
    assert hdr["levels"][0]["compression"] == 5
    assert hdr["levels"][0]["predictor"] == 2
    assert os.path.getsize(p2) < os.path.getsize(p1)


def test_lzw_overviews_carry_predictor(tmp_path):
    arr = rand((600, 600), "uint16", seed=7)
    p = str(tmp_path / "lzwovr.tif")
    write_cog_file(p, arr, GBOX, tile=256, overview_levels=[2, 4],
                   compression="lzw", predictor=2)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)
    np.testing.assert_array_equal(got["overviews"][0], arr[::2, ::2])
    np.testing.assert_array_equal(got["overviews"][1], arr[::4, ::4])


@pytest.mark.parametrize(
    "compression,predictor", [("none", 1), ("deflate", 1), ("lzw", 2)]
)
def test_striped_roundtrip(tmp_path, compression, predictor):
    """Strip-organized TIFF (RowsPerStrip not dividing height → short last
    strip) round-trips pixel-exact through the shared reader."""
    from odc_stac_spark.sources.geotiff import read_cog_header, write_tiff_striped

    arr = rand((301, 270), "uint16", seed=11)
    p = str(tmp_path / f"strip_{compression}_{predictor}.tif")
    write_tiff_striped(p, arr, GBOX, nodata=9, rows_per_strip=64,
                       compression=compression, predictor=predictor)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)
    assert got["nodata"] == 9
    hdr = read_cog_header(p)
    lv = hdr["levels"][0]
    assert lv["tile_w"] == 270 and lv["tile_h"] == 64
    assert len(lv["offsets"]) == (301 + 63) // 64


def test_striped_single_strip(tmp_path):
    """RowsPerStrip >= height: one strip for the whole image."""
    from odc_stac_spark.sources.geotiff import write_tiff_striped

    arr = rand((40, 55), "int32", seed=13)
    p = str(tmp_path / "one.tif")
    write_tiff_striped(p, arr, GBOX, rows_per_strip=4096, compression="deflate")
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)


def test_lzw_pred2_through_tiff_reader_pipeline(spark, tmp_path):
    """An LZW+Predictor=2 COG through TiffReader → full load pipeline is
    pixel-equal to the source (the Landsat-archive read path)."""
    from datetime import datetime

    from odc_stac_spark.model import RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    arr = ((np.arange(300 * 280) * 31) % 2003).reshape(300, 280).astype("uint16")
    g = GeoBox((300, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 3000.0), "EPSG:32735")
    p = str(tmp_path / "lzwpipe.tif")
    write_cog_file(p, arr, g, nodata=0, compression="lzw", predictor=2)
    item = Item(
        id="lzw-0",
        datetime=datetime(2020, 6, 6),
        bands={"red": RasterSource(p, geobox=g, meta=RasterBandMetadata("uint16", 0))},
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)["red"][0]
    np.testing.assert_array_equal(got, arr)


def test_striped_through_tiff_reader_pipeline(spark, tmp_path):
    """A strip-organized LZW GeoTIFF through the full load pipeline —
    strips present as full-width tiles to the shared window reader."""
    from datetime import datetime

    from odc_stac_spark.model import RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, assemble_numpy, load
    from odc_stac_spark.sources.geotiff import write_tiff_striped

    arr = ((np.arange(300 * 280) * 17) % 1009).reshape(300, 280).astype("uint16")
    g = GeoBox((300, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 3000.0), "EPSG:32735")
    p = str(tmp_path / "strippipe.tif")
    write_tiff_striped(p, arr, g, nodata=0, rows_per_strip=48,
                       compression="lzw", predictor=2)
    item = Item(
        id="strip-0",
        datetime=datetime(2020, 6, 6),
        bands={"red": RasterSource(p, geobox=g, meta=RasterBandMetadata("uint16", 0))},
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)["red"][0]
    np.testing.assert_array_equal(got, arr)


# ---- BigTIFF (version 43, 64-bit offsets) ---------------------------------


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
def test_bigtiff_roundtrip(tmp_path, compression):
    """BigTIFF write+read: same pixels/geo/nodata as classic, file leads
    with the version-43 16-byte header and LONG8 offset arrays."""
    arr = rand((300, 280), "uint16", seed=3)
    p = str(tmp_path / f"big_{compression}.tif")
    write_cog_file(
        p, arr, GBOX, nodata=0, tile=128, compression=compression, bigtiff=True
    )
    with open(p, "rb") as f:
        head = f.read(16)
    order, ver, osize, pad, ifd0 = struct.unpack("<2sHHHQ", head)
    assert (order, ver, osize, pad) == (b"II", 43, 8, 0) and ifd0 == 16

    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)
    assert got["epsg"] == 32735
    assert got["nodata"] == 0.0
    sx, _, x0, _, sy, y0 = GBOX.transform
    assert got["transform"] == (sx, 0.0, x0, 0.0, sy, y0)
    # overviews survive the variant switch
    for ov, lv in zip(got["overviews"], (2, 4)):
        np.testing.assert_array_equal(ov, arr[::lv, ::lv])


def test_bigtiff_matches_classic_pixels(tmp_path):
    arr = rand((100, 120), "int32", seed=5)
    pc = str(tmp_path / "classic.tif")
    pb = str(tmp_path / "big.tif")
    write_cog_file(pc, arr, GBOX, tile=64, bigtiff=False)
    write_cog_file(pb, arr, GBOX, tile=64, bigtiff=True)
    np.testing.assert_array_equal(read_cog_file(pc)["data"], read_cog_file(pb)["data"])


def test_bigtiff_striped(tmp_path):
    from odc_stac_spark.sources.geotiff import write_tiff_striped

    arr = rand((90, 110), "uint8", seed=7)
    p = str(tmp_path / "big_striped.tif")
    write_tiff_striped(p, arr, GBOX, rows_per_strip=32, bigtiff=True)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)


def test_classic_refuses_over_4gib_layout(tmp_path):
    """The classic writer must fail loudly, not wrap offsets, if a file
    would cross 2^32 bytes (synthesized via a fake huge tile size — no
    actual 4 GiB allocation)."""
    from odc_stac_spark.sources.geotiff import _write_tiff

    ifd = {
        "entries": [(256, 4, 1, 8)],
        "aux": [],
        "tiles": [b"x"],
        "tile_sizes": [2**32],
    }
    with pytest.raises(ValueError, match="bigtiff=True"):
        _write_tiff(str(tmp_path / "huge.tif"), [ifd], bigtiff=False)


def test_bigtiff_auto_threshold(tmp_path):
    """bigtiff=None auto-selects: small payload → classic (version 42)."""
    arr = rand((64, 64), "uint8", seed=9)
    p = str(tmp_path / "auto.tif")
    write_cog_file(p, arr, GBOX, tile=64, bigtiff=None)
    with open(p, "rb") as f:
        assert struct.unpack("<2sH", f.read(4))[1] == 42


# ---- JPEG compression (Compression=7) -------------------------------------


def _blocky_u8(ny_b, nx_b):
    """8x8-block-constant even-valued uint8 image — exactly lossless
    through baseline JPEG at q=50 (pure-DC blocks)."""
    v = (2 * ((np.arange(ny_b)[:, None] * 7 + np.arange(nx_b)[None, :] * 3) % 128)).astype(
        "uint8"
    )
    return np.repeat(np.repeat(v, 8, 0), 8, 1)


def test_jpeg_cog_roundtrip_with_overviews(tmp_path):
    big = _blocky_u8(40, 36)
    g = GeoBox(big.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 3200.0), "EPSG:32735")
    p = str(tmp_path / "j.tif")
    write_cog_file(p, big, g, nodata=0, tile=64, compression="jpeg", jpeg_quality=50)
    out = read_cog_file(p)
    np.testing.assert_array_equal(out["data"], big)
    assert len(out["overviews"]) >= 1
    from odc_stac_spark.sources.geotiff import read_cog_header

    assert read_cog_header(p)["levels"][0]["compression"] == 7


def test_jpeg_striped_roundtrip(tmp_path):
    big = _blocky_u8(40, 36)
    g = GeoBox(big.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 3200.0), "EPSG:32735")
    p = str(tmp_path / "js.tif")
    from odc_stac_spark.sources.geotiff import write_tiff_striped

    write_tiff_striped(p, big, g, rows_per_strip=48, compression="jpeg", jpeg_quality=50)
    np.testing.assert_array_equal(read_cog_file(p)["data"], big)


def test_jpeg_lossy_quality(tmp_path):
    y, x = np.mgrid[0:128, 0:96]
    nat = (128 + 60 * np.sin(y / 9.0) + 50 * np.cos(x / 7.0)).clip(0, 255).astype("uint8")
    g = GeoBox(nat.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 1280.0), "EPSG:32735")
    p = str(tmp_path / "n.tif")
    write_cog_file(p, nat, g, tile=64, compression="jpeg", jpeg_quality=90)
    got = read_cog_file(p)["data"]
    mse = np.mean((got.astype(float) - nat) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 40
    assert (tmp_path / "n.tif").stat().st_size < nat.nbytes / 2


def test_jpeg_requires_uint8_and_pred1(tmp_path):
    import pytest as _pytest

    g = GeoBox((16, 16), (10.0, 0.0, 0.0, 0.0, -10.0, 160.0), "EPSG:32735")
    with _pytest.raises(ValueError, match="uint8"):
        write_cog_file(str(tmp_path / "x.tif"), np.zeros((16, 16), "uint16"), g,
                       compression="jpeg")
    with _pytest.raises(ValueError, match="Predictor"):
        write_cog_file(str(tmp_path / "x.tif"), np.zeros((16, 16), "uint8"), g,
                       compression="jpeg", predictor=2)


def test_jpegtables_abbreviated_stream(tmp_path):
    """External writers often share tables via the JPEGTables tag and strip
    them from each tile (abbreviated streams). Build one from our own
    encoder output by relocating the DQT/DHT segments, and read it back."""
    import struct as _struct

    from odc_stac_spark.operators.jpeg import encode_jpeg
    from odc_stac_spark.sources.geotiff import read_cog_header, read_cog_tile

    big = _blocky_u8(8, 8)  # one 64x64 tile
    g = GeoBox(big.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 640.0), "EPSG:32735")
    p = str(tmp_path / "t.tif")
    write_cog_file(p, big, g, tile=64, compression="jpeg", jpeg_quality=50,
                   overview_levels=[])

    # split the tile stream into tables and abbreviated image data
    full = encode_jpeg(big, quality=50)
    segs, pos = [], 2
    while pos < len(full) - 1:
        marker = full[pos : pos + 2]
        if marker == b"\xff\xda":
            rest = full[pos:]
            break
        (ln,) = _struct.unpack_from(">H", full, pos + 2)
        segs.append((marker, full[pos : pos + 2 + ln]))
        pos += 2 + ln
    tables = b"\xff\xd8" + b"".join(s for m, s in segs if m in (b"\xff\xdb", b"\xff\xc4")) + b"\xff\xd9"
    abbrev = b"\xff\xd8" + b"".join(s for m, s in segs if m not in (b"\xff\xdb", b"\xff\xc4")) + rest

    # hand-assemble a minimal tiled TIFF with JPEGTables
    def entry(tag, typ, count, val):
        return _struct.pack("<HHI", tag, typ, count) + _struct.pack("<I", val)

    ny = nx = 64
    n_entries = 10
    ifd_start = 8
    data_start = ifd_start + 2 + n_entries * 12 + 4
    tables_off = data_start
    tile_off = tables_off + len(tables)
    hdr = b"II*\x00" + _struct.pack("<I", ifd_start)
    entries = b"".join(
        [
            entry(256, 3, 1, nx),
            entry(257, 3, 1, ny),
            entry(258, 3, 1, 8),
            entry(259, 3, 1, 7),  # jpeg
            entry(262, 3, 1, 1),
            entry(322, 3, 1, 64),
            entry(323, 3, 1, 64),
            entry(324, 4, 1, tile_off),
            entry(325, 4, 1, len(abbrev)),
            entry(347, 7, len(tables), tables_off),
        ]
    )
    blob = hdr + _struct.pack("<H", n_entries) + entries + _struct.pack("<I", 0)
    blob += tables + abbrev
    p2 = str(tmp_path / "abbrev.tif")
    with open(p2, "wb") as f:
        f.write(blob)

    hdr2 = read_cog_header(p2)
    assert hdr2["levels"][0]["jpeg_tables"] is not None
    tile = read_cog_tile(p2, hdr2, 0, 0)
    np.testing.assert_array_equal(tile, big)


def test_jpeg_through_tiff_reader_pipeline(spark, tmp_path):
    """A JPEG-compressed COG through TiffReader → full load pipeline is
    pixel-equal (lossless-by-construction content)."""
    from datetime import datetime

    from odc_stac_spark.model import RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    big = _blocky_u8(37, 35)  # 296x280, not tile-aligned
    g = GeoBox(big.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 2960.0), "EPSG:32735")
    p = str(tmp_path / "pipe.tif")
    write_cog_file(p, big, g, nodata=0, compression="jpeg", jpeg_quality=50)
    item = Item(
        id="jcog-0",
        datetime=datetime(2020, 6, 6),
        bands={"red": RasterSource(p, geobox=g, meta=RasterBandMetadata("uint8", 0))},
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)["red"][0]
    np.testing.assert_array_equal(got, big)


# ---- multi-band (SamplesPerPixel > 1, chunky) -----------------------------


def test_multiband_deflate_pred2_roundtrip(tmp_path):
    rgb = rand((192, 160, 3), "uint16")
    g = GeoBox((192, 160), (10.0, 0.0, 0.0, 0.0, -10.0, 1920.0), "EPSG:32735")
    p = str(tmp_path / "rgb.tif")
    write_cog_file(p, rgb, g, tile=64, compression="deflate", predictor=2)
    out = read_cog_file(p)
    np.testing.assert_array_equal(out["data"], rgb)
    from odc_stac_spark.sources.geotiff import read_cog_header

    lv = read_cog_header(p)["levels"][0]
    assert lv["spp"] == 3 and lv["predictor"] == 2


def test_multiband_jpeg_color_lossless_equal_channels(tmp_path):
    v = (2 * ((np.arange(24)[:, None] * 7 + np.arange(20)[None, :] * 3) % 128)).astype(
        "uint8"
    )
    gray = np.repeat(np.repeat(v, 8, 0), 8, 1)
    rgb = np.stack([gray] * 3, -1)
    g = GeoBox(gray.shape, (10.0, 0.0, 0.0, 0.0, -10.0, 1920.0), "EPSG:32735")
    p = str(tmp_path / "jc.tif")
    write_cog_file(p, rgb, g, tile=64, compression="jpeg", jpeg_quality=50)
    np.testing.assert_array_equal(read_cog_file(p)["data"], rgb)


def test_multiband_jpeg_true_color_psnr(tmp_path):
    y, x = np.mgrid[0:192, 0:160]
    nat = np.stack(
        [
            (128 + 60 * np.sin(y / 9.0)).astype("uint8"),
            (128 + 50 * np.cos(x / 7.0)).astype("uint8"),
            ((y + x) % 256).astype("uint8"),
        ],
        -1,
    )
    g = GeoBox((192, 160), (10.0, 0.0, 0.0, 0.0, -10.0, 1920.0), "EPSG:32735")
    p = str(tmp_path / "nat.tif")
    write_cog_file(p, nat, g, tile=64, compression="jpeg", jpeg_quality=90)
    got = read_cog_file(p)["data"]
    mse = np.mean((got.astype(float) - nat) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 38


def test_multiband_band_select_tile(tmp_path):
    rgb = rand((100, 90, 3), "uint8")
    g = GeoBox((100, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 1000.0), "EPSG:32735")
    p = str(tmp_path / "b.tif")
    write_cog_file(p, rgb, g, tile=64, compression="deflate")
    from odc_stac_spark.sources.geotiff import read_cog_header, read_cog_tile

    hdr = read_cog_header(p)
    t = read_cog_tile(p, hdr, 0, 0, sample=1)
    np.testing.assert_array_equal(t[:64, :64], rgb[:64, :64, 1])


def test_multiband_through_pipeline_band_selection(spark, tmp_path):
    """A 3-band COG addressed per-band via RasterSource.band through the
    full load pipeline — each band pixel-equal to its channel."""
    from datetime import datetime

    from odc_stac_spark.model import RasterBandMetadata, RasterSource
    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    rgb = rand((296, 280, 3), "uint16")
    rgb[rgb == 0] = 1  # keep clear of the nodata value
    g = GeoBox((296, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 2960.0), "EPSG:32735")
    p = str(tmp_path / "mb.tif")
    write_cog_file(p, rgb, g, nodata=0, compression="deflate")
    item = Item(
        id="mb-0",
        datetime=datetime(2020, 6, 6),
        bands={
            "red": RasterSource(p, band=1, geobox=g, meta=RasterBandMetadata("uint16", 0)),
            "nir": RasterSource(p, band=3, geobox=g, meta=RasterBandMetadata("uint16", 0)),
        },
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)
    np.testing.assert_array_equal(got["red"][0], rgb[:, :, 0])
    np.testing.assert_array_equal(got["nir"][0], rgb[:, :, 2])


def test_average_overviews(tmp_path):
    arr = rand((128, 128), "uint16").astype("uint16")
    arr[:4, :4] = 0  # a nodata patch
    g = GeoBox((128, 128), (10.0, 0.0, 0.0, 0.0, -10.0, 1280.0), "EPSG:32735")
    p = str(tmp_path / "avg.tif")
    write_cog_file(p, arr, g, nodata=0, tile=64, overview_levels=[2],
                   overview_resampling="average")
    ov = read_cog_file(p)["overviews"][0]
    # interior pixel: plain 2x2 mean
    want = np.rint(arr[10:12, 10:12].astype(float).mean())
    assert ov[5, 5] == want
    # all-nodata footprint stays nodata
    assert ov[0, 0] == 0
    # mixed footprint ignores nodata samples
    a = arr[2:4, 2:4].astype(float)
    valid = a[a != 0]
    if valid.size:
        assert ov[1, 1] == np.rint(valid.mean())


# ---------------------------------------------------------------------------
# PackBits (Compression=32773) — TIFF 6.0 §9


def test_packbits_spec_golden_vector():
    """The worked example from the TIFF 6.0 spec's PackBits section."""
    from odc_stac_spark.sources.geotiff import packbits_decode, packbits_encode

    unpacked = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    assert packbits_decode(packed) == unpacked
    assert packbits_encode(unpacked) == packed


def test_packbits_decode_noop_byte():
    from odc_stac_spark.sources.geotiff import packbits_decode

    # 0x80 is a spec-mandated no-op between runs
    assert packbits_decode(b"\x80\x00A\x80\xfeB") == b"ABBB"


@pytest.mark.parametrize("seed", [0, 7])
def test_packbits_roundtrip_random_and_runs(seed):
    from odc_stac_spark.sources.geotiff import packbits_decode, packbits_encode

    rng = np.random.default_rng(seed)
    # low-cardinality bytes → plenty of runs; plus pure noise and constants
    for data in (
        rng.integers(0, 3, 5000, dtype=np.uint8).tobytes(),
        rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(),
        b"\x55" * 1000,
        b"",
        b"\x01",
    ):
        assert packbits_decode(packbits_encode(data)) == data
        # per-row packing decodes identically (rows are independent)
        assert packbits_decode(packbits_encode(data, row_bytes=37)) == data


@pytest.mark.parametrize("dtype", ["uint8", "uint16"])
def test_packbits_cog_roundtrip(tmp_path, dtype):
    arr = rand((300, 530), dtype, seed=21)
    p = str(tmp_path / f"pb_{dtype}.tif")
    write_cog_file(p, arr, GBOX, tile=256, compression="packbits")
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)


def test_packbits_striped_short_last_strip(tmp_path):
    from odc_stac_spark.sources.geotiff import read_cog_header, write_tiff_striped

    arr = rand((301, 270), "uint16", seed=22)
    p = str(tmp_path / "pb_strip.tif")
    write_tiff_striped(p, arr, GBOX, nodata=9, rows_per_strip=64, compression="packbits")
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], arr)
    assert read_cog_header(p)["levels"][0]["compression"] == 32773


def test_packbits_predictor2(tmp_path):
    """Predictor=2 turns smooth ramps into near-constant deltas — exactly
    what PackBits run-length encodes well; must round-trip pixel-exact."""
    import os

    ramp = (np.arange(200)[None, :] + np.arange(120)[:, None]).astype("uint8")
    p = str(tmp_path / "pb_pred2.tif")
    write_cog_file(p, ramp, GBOX, tile=64, compression="packbits", predictor=2)
    got = read_cog_file(p)
    np.testing.assert_array_equal(got["data"], ramp)
    assert os.path.getsize(p) < ramp.nbytes  # the runs actually compressed


def test_zstd_cog_write_read(tmp_path):
    """Compression=50000 is fully served in-repo now: encode via
    pyarrow's bundled zstd, decode via the backend chain whose last
    resort is the from-scratch RFC 8878 decoder (operators/zstd.py) —
    the former loud seam is closed (tests/test_zstd.py proves the pure
    decoder against real libzstd frames)."""
    from odc_stac_spark.sources import geotiff as gt

    arr = rand((70, 90), "uint16", seed=23)
    p = str(tmp_path / "z.tif")
    write_cog_file(p, arr, GBOX, tile=64, compression="zstd")
    hdr = gt.read_cog_header(p)
    assert hdr["levels"][0]["compression"] == 50000
    out = gt.read_cog_file(p)
    np.testing.assert_array_equal(out["data"], arr)


def test_lzma_cog_write_read(tmp_path):
    """Compression=34925 (libtiff LZMA: one xz stream per tile) through
    the stdlib — real-format coverage with zero dependencies."""
    from odc_stac_spark.sources import geotiff as gt

    arr = rand((70, 90), "int16", seed=31)
    p = str(tmp_path / "lz.tif")
    write_cog_file(p, arr, GBOX, tile=64, compression="lzma", overview_levels=[2])
    hdr = gt.read_cog_header(p)
    assert hdr["levels"][0]["compression"] == 34925
    out = gt.read_cog_file(p)
    np.testing.assert_array_equal(out["data"], arr)


# ---------------------------------------------------------------------------
# PlanarConfig=2 (separate sample planes, spec §14) — round-7


def test_planar_separate_planes_roundtrip(tmp_path):
    rng2 = np.random.default_rng(31)
    pix = rng2.integers(0, 4000, (70, 90, 3)).astype(np.uint16)
    gbox = GeoBox((70, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32735")
    for comp, pred in [("none", 1), ("deflate", 2), ("lzw", 1), ("zstd", 1)]:
        p = str(tmp_path / f"planar_{comp}_{pred}.tif")
        write_cog_file(
            p, pix, gbox, tile=64, compression=comp, predictor=pred,
            overview_levels=[], planar=2,
        )
        d = read_cog_file(p)
        assert d["data"].shape == (70, 90, 3)
        np.testing.assert_array_equal(d["data"], pix)


def test_planar_band_select_reads_one_plane(tmp_path):
    from odc_stac_spark.sources.geotiff import read_cog_header, read_cog_tile

    rng2 = np.random.default_rng(32)
    pix = rng2.integers(0, 255, (70, 90, 3)).astype(np.uint8)
    gbox = GeoBox((70, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32735")
    p = str(tmp_path / "planar.tif")
    write_cog_file(p, pix, gbox, tile=64, compression="deflate",
                   overview_levels=[], planar=2)
    hdr = read_cog_header(p)
    lv = hdr["levels"][0]
    assert lv["planar"] == 2
    # offsets hold spp × spatial tiles (all of sample 0's first)
    assert len(lv["offsets"]) == 3 * 2 * 2  # 2×2 grid of 64px tiles, 3 planes
    for s in range(3):
        t = read_cog_tile(p, hdr, 0, 0, sample=s)
        assert t.ndim == 2
        np.testing.assert_array_equal(t[:64, :64], pix[:64, :64, s])
    # no-sample fetch restacks the planes
    full = read_cog_tile(p, hdr, 0, 0)
    assert full.shape == (64, 64, 3)


def test_planar_guards(tmp_path):
    gbox = GeoBox((8, 8), (10.0, 0.0, 0.0, 0.0, -10.0, 80.0), "EPSG:32735")
    with pytest.raises(ValueError, match="planar"):
        write_cog_file(str(tmp_path / "a.tif"), np.zeros((8, 8), np.uint8),
                       gbox, planar=3)
    with pytest.raises(ValueError, match="JPEG"):
        write_cog_file(str(tmp_path / "b.tif"),
                       np.zeros((8, 8, 3), np.uint8), gbox,
                       compression="jpeg", planar=2)


# ---------------------------------------------------------------------------
# Predictor=3 (floating-point differencing, TIFF TechNote 3) — round-7


def test_predictor3_float_roundtrip(tmp_path):
    y, x = np.mgrid[0:70, 0:90]
    pix = (np.sin(y / 9.0) * np.cos(x / 11.0)).astype(np.float32)
    gbox = GeoBox((70, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32735")
    for comp in ("deflate", "lzw", "zstd", "none"):
        p = str(tmp_path / f"p3_{comp}.tif")
        write_cog_file(p, pix, gbox, tile=64, compression=comp,
                       predictor=3, overview_levels=[])
        d = read_cog_file(p)
        assert d["data"].dtype == np.float32
        np.testing.assert_array_equal(d["data"], pix)


def test_predictor3_actually_compresses_better(tmp_path):
    import os

    y, x = np.mgrid[0:70, 0:90]
    pix = (np.sin(y / 9.0) * np.cos(x / 11.0)).astype(np.float32)
    gbox = GeoBox((70, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32735")
    a = str(tmp_path / "p3.tif")
    b = str(tmp_path / "p1.tif")
    write_cog_file(a, pix, gbox, tile=64, compression="deflate",
                   predictor=3, overview_levels=[])
    write_cog_file(b, pix, gbox, tile=64, compression="deflate",
                   predictor=1, overview_levels=[])
    # byte-plane regrouping makes exponent bytes adjacent → smaller files
    assert os.path.getsize(a) < os.path.getsize(b)


def test_predictor3_float64_striped_and_multiband(tmp_path):
    from odc_stac_spark.sources.geotiff import write_tiff_striped

    y, x = np.mgrid[0:70, 0:90]
    base = (np.sin(y / 9.0) * np.cos(x / 11.0)).astype(np.float32)
    gbox = GeoBox((70, 90), (10.0, 0.0, 0.0, 0.0, -10.0, 700.0), "EPSG:32735")
    p64 = str(tmp_path / "s3.tif")
    write_tiff_striped(p64, base.astype(np.float64), gbox, rows_per_strip=16,
                       compression="deflate", predictor=3)
    np.testing.assert_array_equal(read_cog_file(p64)["data"], base.astype(np.float64))
    mb = np.stack([base, base * 2, base + 1], axis=-1).astype(np.float32)
    pm = str(tmp_path / "m3.tif")
    write_cog_file(pm, mb, gbox, tile=64, compression="lzw",
                   predictor=3, overview_levels=[])
    np.testing.assert_array_equal(read_cog_file(pm)["data"], mb)


def test_predictor_dtype_guards(tmp_path):
    gbox = GeoBox((8, 8), (10.0, 0.0, 0.0, 0.0, -10.0, 80.0), "EPSG:32735")
    with pytest.raises(ValueError, match="floating-point"):
        write_cog_file(str(tmp_path / "a.tif"), np.zeros((8, 8), np.uint8),
                       gbox, predictor=3)
    with pytest.raises(ValueError, match="integer"):
        write_cog_file(str(tmp_path / "b.tif"), np.zeros((8, 8), np.float32),
                       gbox, predictor=2)
