"""In-house HDF5 reader/writer (sources/hdf5.py) — netCDF-4 container
support with windowed chunk reads."""

import struct

import numpy as np
import pytest

from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
from odc_stac_spark.sources import hdf5 as h5
from odc_stac_spark.sources.hdf5 import read_hdf5_header, read_hdf5_var, write_hdf5

rng = np.random.default_rng(13)

GBOX = GeoBox((60, 48), (10.0, 0.0, 0.0, 0.0, -10.0, 600.0), "EPSG:32735")


@pytest.mark.parametrize(
    "dtype", ["int8", "uint8", "int16", "uint16", "int32", "int64", "float32", "float64"]
)
def test_contiguous_roundtrip_dtypes(tmp_path, dtype):
    p = str(tmp_path / f"c_{dtype}.h5")
    if np.issubdtype(np.dtype(dtype), np.integer):
        info = np.iinfo(dtype)
        a = rng.integers(info.min, int(info.max) + 1, size=(11, 7)).astype(dtype)
    else:
        a = rng.standard_normal((11, 7)).astype(dtype)
    write_hdf5(p, {"v": {"data": a}})
    hdr = read_hdf5_header(p)
    out = read_hdf5_var(p, hdr, "v")
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, a)


@pytest.mark.parametrize("filt", [{}, {"compression": "gzip"}, {"compression": "gzip", "shuffle": True}])
def test_chunked_roundtrip_with_filters(tmp_path, filt):
    p = str(tmp_path / "ch.h5")
    a = rng.integers(0, 5000, (70, 90), dtype=np.uint16)  # non-multiple-of-chunk
    write_hdf5(p, {"v": {"data": a, "chunks": (32, 32), **filt}})
    hdr = read_hdf5_header(p)
    v = hdr["vars"]["v"]
    assert v["chunks"] == (32, 32) and v["layout_class"] == 2
    got_filters = [fid for fid, _ in v["filters"]]
    if filt.get("shuffle"):
        assert got_filters == [h5._FILTER_SHUFFLE, h5._FILTER_DEFLATE]
    elif filt.get("compression"):
        assert got_filters == [h5._FILTER_DEFLATE]
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v"), a)


def test_windowed_chunk_read_fetches_only_intersecting_chunks(tmp_path, monkeypatch):
    """The 100 TB discipline: a (y, x) window must decompress ONLY the
    chunks it intersects, never the whole variable."""
    p = str(tmp_path / "w.h5")
    a = rng.integers(0, 255, (128, 128), dtype=np.uint8)
    write_hdf5(p, {"v": {"data": a, "chunks": (32, 32), "compression": "gzip"}})
    hdr = read_hdf5_header(p)

    calls = []
    real = h5.zlib.decompress

    def counting(raw):
        calls.append(len(raw))
        return real(raw)

    monkeypatch.setattr(h5.zlib, "decompress", counting)
    out = read_hdf5_var(p, hdr, "v", (slice(30, 70), slice(60, 100)))
    np.testing.assert_array_equal(out, a[30:70, 60:100])
    # rows 30-70 → chunk rows 0-2; cols 60-100 → chunk cols 1-3 → 9 of 16
    assert len(calls) == 9


def test_3d_window_strided_and_int_index(tmp_path):
    p = str(tmp_path / "t3.h5")
    a = rng.integers(0, 9999, (4, 50, 60), dtype=np.int32)
    write_hdf5(p, {"v": {"data": a, "chunks": (1, 16, 16), "compression": "gzip"}})
    hdr = read_hdf5_header(p)
    np.testing.assert_array_equal(
        read_hdf5_var(p, hdr, "v", (2, slice(5, 45), slice(10, 55))),
        a[2, 5:45, 10:55],
    )
    np.testing.assert_array_equal(
        read_hdf5_var(p, hdr, "v", (1, slice(0, 50, 3), slice(4, 60, 5))),
        a[1, 0:50:3, 4:60:5],
    )


def test_attrs_and_dimension_scales(tmp_path):
    p = str(tmp_path / "a.h5")
    write_hdf5(
        p,
        {
            "temp": {
                "data": np.zeros((3, 4), np.float32),
                "attrs": {"_FillValue": np.float32(-9.0), "units": "K", "ids": [1, 2, 3]},
            },
            "y": {"data": np.arange(3.0), "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "y"}},
            "x": {"data": np.arange(4.0), "attrs": {"CLASS": "DIMENSION_SCALE", "NAME": "x"}},
        },
        global_attrs={"Conventions": "CF-1.6", "n_scenes": 7},
    )
    hdr = read_hdf5_header(p)
    assert hdr["dims"] == {"y": 3, "x": 4}
    assert hdr["gattrs"] == {"Conventions": "CF-1.6", "n_scenes": 7}
    ta = hdr["vars"]["temp"]["attrs"]
    assert ta["units"] == "K" and ta["_FillValue"] == -9.0 and ta["ids"] == [1, 2, 3]


def test_superblock_bytes_match_spec(tmp_path):
    """Spec-level (HDF5 File Format Spec v3.0) byte assertions on the
    writer output, so writer and reader can't share a layout bug."""
    p = str(tmp_path / "sb.h5")
    write_hdf5(p, {"v": {"data": np.arange(6, dtype=np.uint8).reshape(2, 3)}})
    raw = open(p, "rb").read()
    assert raw[:8] == b"\x89HDF\r\n\x1a\n"  # format signature
    assert raw[8] == 0  # superblock version 0
    assert raw[13] == 8 and raw[14] == 8  # offset/length sizes
    base, free, eof = struct.unpack_from("<QQQ", raw, 24)
    assert base == 0 and eof == len(raw)
    # root symbol table entry at offset 56: cache type 1 with btree+heap
    cache_type = struct.unpack_from("<I", raw, 56 + 16)[0]
    assert cache_type == 1
    bt, heap = struct.unpack_from("<QQ", raw, 56 + 24)
    assert raw[bt : bt + 4] == b"TREE" and raw[heap : heap + 4] == b"HEAP"
    # group B-tree is node type 0; the dataset's raw bytes exist in-file
    assert raw[bt + 4] == 0
    assert bytes(range(6)) in raw


def test_unsupported_filter_raises_loudly(tmp_path):
    p = str(tmp_path / "f.h5")
    a = np.zeros((8, 8), np.uint8)
    write_hdf5(p, {"v": {"data": a, "chunks": (8, 8), "compression": "gzip"}})
    hdr = read_hdf5_header(p)
    hdr["vars"]["v"]["filters"] = [(32000, [])]  # unknown registered filter
    with pytest.raises(NotImplementedError, match="filter id 32000"):
        read_hdf5_var(p, hdr, "v")


def test_multiple_datasets_sorted_group(tmp_path):
    p = str(tmp_path / "m.h5")
    arrays = {f"band_{i:02d}": rng.integers(0, 99, (6, 5), dtype=np.int16) for i in range(12)}
    write_hdf5(p, {n: {"data": a} for n, a in arrays.items()})
    hdr = read_hdf5_header(p)
    assert sorted(hdr["vars"]) == sorted(arrays)
    for n, a in arrays.items():
        np.testing.assert_array_equal(read_hdf5_var(p, hdr, n), a)


def test_fill_value_backs_unallocated_chunks(tmp_path):
    """libhdf5 never allocates chunks the writer didn't touch; absent
    chunks must read back as the fill-value message, not zeros (the
    nodata-corruption failure mode ADVICE r6 flagged)."""
    a = np.full((64, 64), -9999, np.int16)
    a[:32, :32] = rng.integers(0, 100, (32, 32), dtype=np.int16)
    p = str(tmp_path / "fill.h5")
    write_hdf5(p, {"v": {"data": a, "chunks": (32, 32), "fill": -9999}})
    hdr = read_hdf5_header(p)
    assert hdr["vars"]["v"]["fill_raw"] == np.int16(-9999).tobytes()
    # three of four chunks are all-fill → elided from the chunk B-tree
    from odc_stac_spark.sources.hdf5 import _R, _walk_chunk_btree

    r = _R(p)
    try:
        assert len(_walk_chunk_btree(r, hdr["vars"]["v"]["btree"], 2)) == 1
    finally:
        r.close()
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v"), a)
    # a window entirely inside an unallocated chunk is pure fill
    np.testing.assert_array_equal(
        read_hdf5_var(p, hdr, "v", (slice(40, 50), slice(40, 50))),
        np.full((10, 10), -9999, np.int16),
    )


def test_fill_value_float_and_fillvalue_attr_fallback(tmp_path):
    a = np.full((16, 16), np.float32(np.nan))
    a[:8, :8] = 1.5
    p = str(tmp_path / "fillf.h5")
    write_hdf5(
        p,
        {"v": {"data": a, "chunks": (8, 8), "fill": np.float32(np.nan),
               "attrs": {"_FillValue": np.float32(np.nan)}}},
    )
    hdr = read_hdf5_header(p)
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v"), a)
    # no fill message → _FillValue attr backs the gap
    hdr["vars"]["v"].pop("fill_raw", None)
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v"), a)


def test_chunk_filter_mask_skips_only_masked_filters(tmp_path):
    """HDF5 spec: bit i of a chunk's filter mask disables only filter i.
    A chunk written with deflate skipped but shuffle applied must be
    unshuffled (not returned raw, not fully defiltered)."""
    a = rng.integers(0, 60000, (8, 8), dtype=np.uint16)
    p = str(tmp_path / "mask.h5")
    write_hdf5(p, {"v": {"data": a, "chunks": (8, 8), "compression": "gzip", "shuffle": True}})
    hdr = read_hdf5_header(p)
    v = hdf5_v = hdr["vars"]["v"]
    assert [fid for fid, _ in v["filters"]] == [h5._FILTER_SHUFFLE, h5._FILTER_DEFLATE]
    # rewrite the file: chunk data = shuffled-only bytes, mask bit 1 set
    shuffled = (
        a.tobytes() and np.frombuffer(a.tobytes(), np.uint8).reshape(-1, 2).T.tobytes()
    )
    raw = bytearray(open(p, "rb").read())
    new_addr = len(raw)
    raw += shuffled
    bt = hdf5_v["btree"]
    # leaf node with one entry: key at bt+24 = (size u32, mask u32, origin...)
    struct.pack_into("<II", raw, bt + 24, len(shuffled), 0b10)  # mask filter idx 1
    key_size = 8 + 8 * 3  # rank 2 → rank+1 dims
    struct.pack_into("<Q", raw, bt + 24 + key_size, new_addr)
    open(p, "wb").write(bytes(raw))
    np.testing.assert_array_equal(read_hdf5_var(p, read_hdf5_header(p), "v"), a)


def test_negative_step_raises_and_negative_index_normalizes(tmp_path):
    a = rng.integers(0, 99, (6, 5), dtype=np.int32)
    p = str(tmp_path / "neg.h5")
    write_hdf5(p, {"v": {"data": a}})
    hdr = read_hdf5_header(p)
    with pytest.raises(NotImplementedError, match="negative-step"):
        read_hdf5_var(p, hdr, "v", (slice(None, None, -1),))
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v", (-1,)), a[-1])
    np.testing.assert_array_equal(read_hdf5_var(p, hdr, "v", (-2, -3)), a[-2, -3])
    with pytest.raises(IndexError):
        read_hdf5_var(p, hdr, "v", (7,))


def test_ncreader_serves_hdf5_through_load_pipeline(spark, tmp_path):
    """netCDF-4 (HDF5) container through the FULL load pipeline — reader
    dispatch by extension, subdataset (variable) addressing per band,
    pixel equality (reference reads these via GDAL subdatasets,
    loader/_rio.py; here the in-house HDF5 chunk reader serves them)."""
    from datetime import datetime

    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    red = ((np.arange(300 * 280) * 31) % 2003).reshape(300, 280).astype("uint16")
    nir = ((np.arange(300 * 280) * 17) % 1499).reshape(300, 280).astype("uint16")
    g = GeoBox((300, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 3000.0), "EPSG:32735")
    p = str(tmp_path / "scene.h5")
    write_hdf5(
        p,
        {
            "red": {"data": red, "chunks": (64, 64), "compression": "gzip", "shuffle": True},
            "nir": {"data": nir, "chunks": (64, 64), "compression": "gzip"},
        },
    )
    item = Item(
        id="h5-0",
        datetime=datetime(2021, 3, 3),
        bands={
            "red": RasterSource(
                p, subdataset="red", geobox=g, meta=RasterBandMetadata("uint16", 0)
            ),
            "nir": RasterSource(
                p, subdataset="nir", geobox=g, meta=RasterBandMetadata("uint16", 0)
            ),
        },
    )
    tiles_df, plan = load(spark, [item], chunks=(128, 128))
    got = assemble_numpy(tiles_df, plan)
    np.testing.assert_array_equal(got["red"][0], red)
    np.testing.assert_array_equal(got["nir"][0], nir)
