"""NetCDF classic codec + NcReader driver — sources/netcdf.py."""

import struct

import numpy as np
import pytest

from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterSource
from odc_stac_spark.sources.netcdf import (
    NcReader,
    read_geo_netcdf,
    read_netcdf_header,
    read_netcdf_var,
    write_geo_netcdf,
    write_netcdf,
)

rng = np.random.default_rng(7)


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize(
    "dtype", ["int8", "int16", "int32", "float32", "float64", "uint8", "uint16"]
)
def test_roundtrip_dtypes(tmp_path, version, dtype):
    p = str(tmp_path / "t.nc")
    info = np.iinfo(dtype) if np.issubdtype(np.dtype(dtype), np.integer) else None
    if info:
        a = rng.integers(info.min, int(info.max) + 1, size=(11, 7)).astype(dtype)
    else:
        a = rng.standard_normal((11, 7)).astype(dtype)
    write_netcdf(p, {"y": 11, "x": 7}, {"v": (("y", "x"), a)}, version=version)
    hdr = read_netcdf_header(p)
    assert hdr["version"] == version
    out = read_netcdf_var(p, hdr, "v")
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, a)


def test_attrs_roundtrip(tmp_path):
    p = str(tmp_path / "t.nc")
    write_netcdf(
        p,
        {"x": 4},
        {"v": (("x",), np.arange(4, dtype=np.int32))},
        global_attrs={"title": "hello", "version": 3, "scale": 0.5, "vec": [1.0, 2.0]},
        var_attrs={"v": {"_FillValue": np.int32(-1), "units": "m"}},
    )
    hdr = read_netcdf_header(p)
    g = hdr["gattrs"]
    assert g["title"] == "hello" and g["version"] == 3 and g["scale"] == 0.5
    assert g["vec"] == [1.0, 2.0]
    va = hdr["vars"]["v"]["attrs"]
    assert va["_FillValue"] == -1 and va["units"] == "m"


def test_windowed_and_strided_reads(tmp_path):
    p = str(tmp_path / "t.nc")
    a = (np.arange(50 * 40) % 617).reshape(50, 40).astype(np.int16)
    write_netcdf(p, {"y": 50, "x": 40}, {"v": (("y", "x"), a)})
    hdr = read_netcdf_header(p)
    np.testing.assert_array_equal(
        read_netcdf_var(p, hdr, "v", (slice(5, 30), slice(8, 33))), a[5:30, 8:33]
    )
    np.testing.assert_array_equal(
        read_netcdf_var(p, hdr, "v", (slice(0, 50, 7), slice(3, 40, 5))), a[::7, 3::5]
    )
    np.testing.assert_array_equal(read_netcdf_var(p, hdr, "v", (17,)), a[17])


def test_3d_variable_leading_index(tmp_path):
    p = str(tmp_path / "t.nc")
    c = np.arange(3 * 6 * 5, dtype=np.float32).reshape(3, 6, 5)
    write_netcdf(p, {"t": 3, "y": 6, "x": 5}, {"c": (("t", "y", "x"), c)})
    hdr = read_netcdf_header(p)
    np.testing.assert_array_equal(
        read_netcdf_var(p, hdr, "c", (2, slice(1, 5), slice(0, 4))), c[2, 1:5, 0:4]
    )


def test_record_variable_hand_assembled():
    """Reader handles record (unlimited-dim) variables — proven against a
    byte-level file assembled by hand from the public spec, independent of
    our writer (which is fixed-size only)."""

    def name(s):
        b = s.encode()
        pad = (4 - len(b) % 4) % 4
        return struct.pack(">I", len(b)) + b + b"\x00" * pad

    hdr = b"CDF\x01" + struct.pack(">I", 2)  # numrecs = 2
    hdr += struct.pack(">II", 0x0A, 2) + name("t") + struct.pack(">I", 0)  # record dim
    hdr += name("x") + struct.pack(">I", 3)
    hdr += struct.pack(">II", 0, 0)  # no global attrs
    hdr += struct.pack(">II", 0x0B, 1)  # 1 variable
    var = name("v") + struct.pack(">I", 2) + struct.pack(">II", 0, 1)  # dims (t, x)
    var += struct.pack(">II", 0, 0)  # no var attrs
    begin = len(hdr) + len(var) + 4 + 4 + 4  # nc_type + vsize + begin(4, CDF-1)
    var += struct.pack(">III", 4, 12, begin)  # NC_INT, vsize 12
    data = np.array([[1, 2, 3], [4, 5, 6]], ">i4").tobytes()
    blob = hdr + var + data

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "rec.nc")
        with open(p, "wb") as f:
            f.write(blob)
        h = read_netcdf_header(p)
        v = h["vars"]["v"]
        assert v["record"] and v["shape"] == (2, 3) and h["recsize"] == 12
        np.testing.assert_array_equal(
            read_netcdf_var(p, h, "v"), [[1, 2, 3], [4, 5, 6]]
        )
        np.testing.assert_array_equal(
            read_netcdf_var(p, h, "v", (slice(1, 2), slice(0, 2))), [[4, 5]]
        )


def test_hdf5_magic_dispatches_to_hdf5_reader(tmp_path):
    """A .nc file with the HDF5 signature (netCDF-4) parses through the
    in-house HDF5 reader and serves the same header-dict shape."""
    from odc_stac_spark.sources.hdf5 import write_hdf5

    p = str(tmp_path / "h5.nc")
    a = np.arange(12, dtype=np.int32).reshape(3, 4)
    write_hdf5(p, {"v": {"data": a, "attrs": {"units": "m"}}})
    hdr = read_netcdf_header(p)
    assert hdr["format"] == "hdf5"
    assert hdr["vars"]["v"]["attrs"]["units"] == "m"
    np.testing.assert_array_equal(read_netcdf_var(p, hdr, "v"), a)


def test_unknown_cdf_version_refused(tmp_path):
    p = str(tmp_path / "c3.nc")
    with open(p, "wb") as f:
        f.write(b"CDF\x03" + b"\x00" * 64)
    with pytest.raises(NotImplementedError, match="CDF-3"):
        read_netcdf_header(p)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint32", "int64", "uint64"])
def test_cdf5_native_unsigned_and_64bit(tmp_path, dtype):
    """CDF-5 carries unsigned and 64-bit integers natively (types 7-11,
    8-byte header sizes) — no _Unsigned convention needed."""
    p = str(tmp_path / "c5.nc")
    info = np.iinfo(dtype)
    a = rng.integers(info.min, info.max, size=(9, 5), dtype=dtype)
    write_netcdf(p, {"y": 9, "x": 5}, {"v": (("y", "x"), a)}, version=5,
                 global_attrs={"title": "v5"}, var_attrs={"v": {"units": "m"}})
    hdr = read_netcdf_header(p)
    assert hdr["version"] == 5
    assert hdr["gattrs"]["title"] == "v5"
    assert "_Unsigned" not in hdr["vars"]["v"]["attrs"]
    out = read_netcdf_var(p, hdr, "v")
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, a)
    np.testing.assert_array_equal(
        read_netcdf_var(p, hdr, "v", (slice(2, 8), slice(1, 4))), a[2:8, 1:4]
    )


def test_cdf5_through_load_pipeline(tmp_path):
    """A CDF-5 geo file reads through NcReader windows identically."""
    from odc_stac_spark.sources.netcdf import write_geo_netcdf as wg

    band = ((np.arange(60 * 48) * 13) % 251).reshape(60, 48).astype(np.uint8)
    p = str(tmp_path / "geo5.nc")
    wg(p, {"red": band}, GBOX, nodata=7, version=5)
    w = NcReader()._window(p + "#red", 7, "uint8", 8, 40, 4, 36)
    np.testing.assert_array_equal(w, band[8:40, 4:36])


GBOX = GeoBox((60, 48), (10.0, 0.0, 500.0, 0.0, -10.0, 7000.0), "EPSG:32735")


def test_geo_roundtrip(tmp_path):
    p = str(tmp_path / "geo.nc")
    red = ((np.arange(60 * 48) * 13) % 251).reshape(60, 48).astype(np.uint8)
    nir = ((np.arange(60 * 48) * 7) % 1009).reshape(60, 48).astype(np.int16)
    write_geo_netcdf(p, {"red": red, "nir": nir}, GBOX, nodata=0)
    bands, transform, crs, nodata = read_geo_netcdf(p)
    assert set(bands) == {"red", "nir"}
    np.testing.assert_array_equal(bands["red"], red)
    np.testing.assert_array_equal(bands["nir"], nir)
    assert transform == (10.0, 0.0, 500.0, 0.0, -10.0, 7000.0)
    assert crs == "EPSG:32735"
    assert nodata["red"] == 0
    # CF coordinate variables at pixel centers
    hdr = read_netcdf_header(p)
    ys = read_netcdf_var(p, hdr, "y")
    xs = read_netcdf_var(p, hdr, "x")
    assert ys[0] == 7000.0 - 5.0 and xs[0] == 505.0


def test_ncreader_window_pad_and_decimation(tmp_path):
    p = str(tmp_path / "geo.nc")
    band = ((np.arange(60 * 48) * 13) % 251).reshape(60, 48).astype(np.uint8)
    write_geo_netcdf(p, {"red": band}, GBOX, nodata=7)
    r = NcReader()
    w = r._window(p + "#red", None, "uint8", -4, 10, 40, 52)
    exp = np.full((14, 12), 7, np.uint8)
    exp[4:, :8] = band[0:10, 40:48]
    np.testing.assert_array_equal(w, exp)
    w2 = r._window(p + "#red", 7, "uint8", 8, 40, 4, 36, decimation=4)
    np.testing.assert_array_equal(w2, band[8:40:4, 4:36:4])


def test_ncreader_single_var_needs_no_subdataset(tmp_path):
    p = str(tmp_path / "one.nc")
    band = np.full((60, 48), 9, np.uint8)
    write_geo_netcdf(p, {"only": band}, GBOX)
    np.testing.assert_array_equal(
        NcReader()._window(p, None, "uint8", 0, 5, 0, 5), band[:5, :5]
    )


def test_ncreader_multi_var_requires_subdataset(tmp_path):
    p = str(tmp_path / "two.nc")
    write_geo_netcdf(
        p, {"a": np.zeros((60, 48), np.uint8), "b": np.ones((60, 48), np.uint8)}, GBOX
    )
    with pytest.raises(ValueError, match="subdataset"):
        NcReader()._window(p, None, "uint8", 0, 5, 0, 5)


def test_netcdf_through_load_pipeline(spark, tmp_path):
    """A classic .nc container with two variables through the FULL load
    pipeline — reader dispatch by extension, subdataset (variable)
    addressing per band, pixel equality (reference: netcdf subdataset
    sources, loader/types.py:52-53)."""
    from datetime import datetime

    from odc_stac_spark.plans.load import Item, assemble_numpy, load

    red = ((np.arange(300 * 280) * 31) % 2003).reshape(300, 280).astype("uint16")
    nir = ((np.arange(300 * 280) * 17) % 1499).reshape(300, 280).astype("uint16")
    g = GeoBox((300, 280), (10.0, 0.0, 0.0, 0.0, -10.0, 3000.0), "EPSG:32735")
    p = str(tmp_path / "scene.nc")
    write_geo_netcdf(p, {"red": red, "nir": nir}, g, nodata=0)
    item = Item(
        id="nc-0",
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
