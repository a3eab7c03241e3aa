"""Property-based fuzz of the TIFF/COG and JP2 header parsers
(VERDICT r7 #9): truncated, bit-flipped, or garbage-prefixed inputs must
raise a TYPED exception quickly — never hang, loop, or allocate
unboundedly. The golden bytes come from the in-repo writers, mutations
from hypothesis."""

from __future__ import annotations

import struct
import time

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from odc_stac_spark.model import GeoBox
from odc_stac_spark.operators.jp2 import encode_jp2, read_jp2_header
from odc_stac_spark.sources.geotiff import read_cog_header, write_cog_file

# exceptions a parser is ALLOWED to raise on corrupt input; anything else
# (hang, MemoryError, SystemError, segfault) is a bug
OK_ERRORS = (
    ValueError,
    NotImplementedError,
    KeyError,
    IndexError,
    EOFError,
    OSError,
    struct.error,
    AssertionError,
    OverflowError,
    ZeroDivisionError,
    TypeError,
)

BUDGET_S = 1.0


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    ny, nx = 64, 80
    yy, xx = np.mgrid[0:ny, 0:nx]
    img = ((yy * 31 + xx * 7) % 997).astype(np.int16)
    gbox = GeoBox((ny, nx), (10.0, 0.0, 0.0, 0.0, -10.0, 640.0), "EPSG:32735")
    tif = d / "g.tif"
    write_cog_file(str(tif), img, gbox, tile=32, compression="deflate",
                   predictor=2, overview_levels=[2])
    jp2 = d / "g.jp2"
    jp2.write_bytes(encode_jp2(((yy + xx) % 255).astype(np.uint8), levels=2))
    return {"tif": tif.read_bytes(), "jp2": jp2.read_bytes(), "dir": d}


def _run_parser(parse, blob: bytes, d, name: str) -> None:
    p = d / name
    p.write_bytes(blob)
    t0 = time.perf_counter()
    try:
        parse(str(p))
    except OK_ERRORS:
        pass
    dt = time.perf_counter() - t0
    assert dt < BUDGET_S, f"parser took {dt:.2f}s on {len(blob)}-byte input"


@settings(max_examples=80, deadline=None)
@given(cut=st.integers(0, 4096))
def test_tiff_header_truncation(golden, cut):
    blob = golden["tif"]
    _run_parser(read_cog_header, blob[: min(cut, len(blob))], golden["dir"], "t.tif")


@settings(max_examples=120, deadline=None)
@given(
    muts=st.lists(
        st.tuples(st.integers(0, 2047), st.integers(0, 255)), min_size=1, max_size=8
    )
)
def test_tiff_header_bitflips(golden, muts):
    blob = bytearray(golden["tif"])
    for pos, val in muts:
        blob[pos % len(blob)] = val
    _run_parser(read_cog_header, bytes(blob), golden["dir"], "t.tif")


@settings(max_examples=80, deadline=None)
@given(cut=st.integers(0, 4096))
def test_jp2_header_truncation(golden, cut):
    blob = golden["jp2"]
    _run_parser(read_jp2_header, blob[: min(cut, len(blob))], golden["dir"], "t.jp2")


@settings(max_examples=120, deadline=None)
@given(
    muts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 255)), min_size=1, max_size=8
    )
)
def test_jp2_header_bitflips(golden, muts):
    blob = bytearray(golden["jp2"])
    for pos, val in muts:
        blob[pos % len(blob)] = val
    _run_parser(read_jp2_header, bytes(blob), golden["dir"], "t.jp2")


@settings(max_examples=40, deadline=None)
@given(junk=st.binary(min_size=0, max_size=512))
def test_garbage_inputs(golden, junk):
    _run_parser(read_cog_header, junk, golden["dir"], "g.tif")
    _run_parser(read_jp2_header, junk, golden["dir"], "g.jp2")


# netCDF classic + HDF5 get the same treatment (same discipline as the
# TIFF/JP2 targets the verdict named; these parsers feed the same load
# pipeline, so corrupt containers must fail typed-and-fast too)


@pytest.fixture(scope="module")
def golden_nc(tmp_path_factory):
    from odc_stac_spark.sources.hdf5 import write_hdf5
    from odc_stac_spark.sources.netcdf import write_netcdf

    d = tmp_path_factory.mktemp("fuzz_nc")
    data = ((np.arange(40)[:, None] * 13 + np.arange(50)[None, :]) % 251).astype(
        np.int16
    )
    nc = d / "g.nc"
    write_netcdf(str(nc), {"y": 40, "x": 50}, {"v": (("y", "x"), data)})
    h5 = d / "g.h5"
    write_hdf5(
        str(h5),
        {"v": {"data": data, "chunks": (16, 16), "compression": "gzip",
               "shuffle": True}},
    )
    return {"nc": nc.read_bytes(), "h5": h5.read_bytes(), "dir": d}


@settings(max_examples=60, deadline=None)
@given(cut=st.integers(0, 2048))
def test_netcdf_header_truncation(golden_nc, cut):
    from odc_stac_spark.sources.netcdf import read_netcdf_header

    blob = golden_nc["nc"]
    _run_parser(read_netcdf_header, blob[: min(cut, len(blob))],
                golden_nc["dir"], "t.nc")


@settings(max_examples=100, deadline=None)
@given(
    muts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 255)), min_size=1, max_size=8
    )
)
def test_netcdf_header_bitflips(golden_nc, muts):
    from odc_stac_spark.sources.netcdf import read_netcdf_header

    blob = bytearray(golden_nc["nc"])
    for pos, val in muts:
        blob[pos % len(blob)] = val
    _run_parser(read_netcdf_header, bytes(blob), golden_nc["dir"], "t.nc")


@settings(max_examples=100, deadline=None)
@given(
    muts=st.lists(
        st.tuples(st.integers(0, 2047), st.integers(0, 255)), min_size=1, max_size=8
    )
)
def test_hdf5_header_bitflips(golden_nc, muts):
    from odc_stac_spark.sources.netcdf import read_netcdf_header

    blob = bytearray(golden_nc["h5"])
    for pos, val in muts:
        blob[pos % len(blob)] = val
    _run_parser(read_netcdf_header, bytes(blob), golden_nc["dir"], "t.h5")
