from __future__ import annotations

import numpy as np
import pytest

from odc_stac_spark.plans.load import assemble_numpy, load
from odc_stac_spark.sources.sinks import read_tiles_parquet, write_cog, write_tiles_parquet


def test_tiles_parquet_roundtrip(spark, tmp_path):
    from .test_load_pipeline import mk_item

    items = [mk_item(0), mk_item(1, origin=(300.0, 1000.0))]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(48, 48))
    out = str(tmp_path / "tiles")
    write_tiles_parquet(tiles_df, out)
    back = read_tiles_parquet(spark, out)
    # partition pruning works: band/t are partition columns
    assert set(back.columns) == set(tiles_df.columns)
    a = assemble_numpy(tiles_df, plan)
    b = assemble_numpy(
        back.withColumn("band", back["band"].cast("string")).withColumn(
            "t", back["t"].cast("int")
        ),
        plan,
    )
    np.testing.assert_array_equal(a["red"], b["red"])


def test_cog_sink_roundtrip(spark, tmp_path):
    """S14: load → COG files; bytes parse back to the same pixels, grid
    and nodata through the independent reader."""
    from odc_stac_spark.sources.geotiff import read_cog_file

    from .test_load_pipeline import mk_item

    items = [mk_item(0, nodata=-1, nodata_every=5), mk_item(1, origin=(300.0, 1000.0), nodata=-1)]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(48, 48))
    paths = write_cog(tiles_df, plan, str(tmp_path / "cogs"))
    assert [p.split("/")[-1] for p in paths] == ["red_t0.tif"]

    cube = assemble_numpy(tiles_df, plan)["red"]
    got = read_cog_file(paths[0])
    np.testing.assert_array_equal(got["data"], cube[0])
    assert got["epsg"] == 32735
    sx, _, x0, _, sy, y0 = plan.gbox.transform
    assert got["transform"] == (sx, 0.0, x0, 0.0, sy, y0)

def test_cog_sink_is_executor_side_and_byte_identical(spark, tmp_path):
    """Round-4 verdict item 5: write_cog must write each (band, t) COG
    from the executors (no assemble_numpy / driver pixel collect in the
    path) and the bytes must be identical to driver-side write_cog_file
    over the assembled cube — multi-band, multi-time-group."""
    from odc_stac_spark.sources.geotiff import write_cog_file

    from .test_load_pipeline import mk_item

    items = [
        mk_item(0, nodata=-1, nodata_every=5),
        mk_item(1, origin=(300.0, 1000.0), nodata=-1),
        mk_item(2, band="nir", nodata=-1, nodata_every=7),
        mk_item(3, band="nir", origin=(300.0, 1000.0), nodata=-1),
    ]
    tiles_df, plan = load(spark, items, groupby="id", chunks=(48, 48))
    paths = write_cog(tiles_df, plan, str(tmp_path / "cogs"))
    assert sorted(p.split("/")[-1] for p in paths) == [
        f"{b}_t{t}.tif" for b in ("nir", "red") for t in range(4)
    ]

    cubes = assemble_numpy(tiles_df, plan)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    for band, cube in cubes.items():
        nodata = plan.cfg[band].fill_value if band in plan.cfg else None
        for t in range(cube.shape[0]):
            ref = str(ref_dir / f"{band}_t{t}.tif")
            write_cog_file(ref, cube[t], plan.gbox, nodata=nodata)
            got = open(str(tmp_path / "cogs" / f"{band}_t{t}.tif"), "rb").read()
            assert got == open(ref, "rb").read(), (band, t)


def test_cog_parallel_encode_matches_serial(spark, tmp_path, monkeypatch):
    """Round-15 (VERDICT r14 #4): the tile-parallel encode path (map-side
    block cut + deflate in the load tasks, overview build from half-res
    patches + assemble-from-compressed in one writer task per file) must
    produce byte-identical files to the serial one-task-per-COG path.
    chunks=(256, 256) aligns tiles to the COG block grid so the parallel
    path is actually taken (asserted via a call spy); unaligned chunks
    must fall back to serial."""
    import odc_stac_spark.sources.sinks as sinks

    from .test_load_pipeline import mk_item

    calls = []
    real = sinks._write_cog_parallel
    monkeypatch.setattr(
        sinks, "_write_cog_parallel",
        lambda *a, **k: (calls.append(1), real(*a, **k))[1],
    )
    items = [
        mk_item(0, nodata=-1, nodata_every=5),
        mk_item(1, origin=(300.0, 1000.0), nodata=-1),
        mk_item(2, band="nir", nodata=-1, nodata_every=7),
    ]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(256, 256))
    par = write_cog(tiles_df, plan, str(tmp_path / "par"), parallel_encode=True)
    assert calls, "aligned chunks must take the parallel encode path"
    ser = write_cog(tiles_df, plan, str(tmp_path / "ser"), parallel_encode=False)
    assert [p.split("/")[-1] for p in par] == [p.split("/")[-1] for p in ser]
    assert par  # at least one file written
    for p, s in zip(par, ser):
        assert open(p, "rb").read() == open(s, "rb").read(), p
    # unaligned chunking cannot cut blocks map-side -> serial fallback
    calls.clear()
    tiles48, plan48 = load(spark, items, groupby="solar_day", chunks=(48, 48))
    fb = write_cog(tiles48, plan48, str(tmp_path / "fb"), parallel_encode=True)
    assert not calls, "unaligned chunks must fall back to the serial writer"
    for p, s in zip(fb, ser):
        assert open(p, "rb").read() == open(s, "rb").read(), p


def test_cog_parallel_encode_overviews_and_missing_tiles(spark, tmp_path):
    """The parallel path's overview pyramid (built from half-res patches
    + further decimation) and its fill synthesis for tile-less regions
    (two items far apart -> the union grid has large empty areas) must
    be byte-identical to the serial path on an image big enough to carry
    overview levels (1600x1200 -> levels 2, 4)."""
    from .test_load_pipeline import mk_item

    items = [
        mk_item(0, shape=(600, 1200), nodata=-1, nodata_every=5),
        # offset item: union grid 1600 rows; rows 600..1000 have no tiles
        mk_item(1, origin=(0.0, -9000.0), shape=(600, 1200), nodata=-1),
    ]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(512, 512))
    assert plan.gbox.shape == (1600, 1200)
    from odc_stac_spark.sources.geotiff import cog_overview_levels

    assert cog_overview_levels(plan.gbox.shape) == [2, 4]
    par = write_cog(tiles_df, plan, str(tmp_path / "par"), parallel_encode=True)
    ser = write_cog(tiles_df, plan, str(tmp_path / "ser"), parallel_encode=False)
    assert par
    for p, s in zip(par, ser):
        assert open(p, "rb").read() == open(s, "rb").read(), p


def test_zarr_sink_roundtrip(spark, tmp_path):
    """Zarr v2 sink: executor-written chunks + driver metadata parse back
    to the same pixels via the independent minimal reader; edge chunks are
    padded to full chunk shape per spec; metadata is xarray-compatible."""
    import json

    from odc_stac_spark.sources.sinks import read_zarr_array, write_zarr

    from .test_load_pipeline import mk_item

    items = [
        mk_item(0, nodata=-1, nodata_every=5),
        mk_item(1, origin=(300.0, 1000.0), nodata=-1),
    ]
    # 48x48 chunks over a 100x150 grid -> overhanging edge chunks both axes
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(48, 48))
    out = str(tmp_path / "store")
    write_zarr(tiles_df, plan, out)

    cube = assemble_numpy(tiles_df, plan)["red"]
    got = read_zarr_array(f"{out}/red")
    assert got.shape == (1, plan.gbox.height, plan.gbox.width)
    np.testing.assert_array_equal(got, cube)

    meta = json.load(open(f"{out}/red/.zarray"))
    assert meta["chunks"] == [1, 48, 48]
    assert meta["compressor"] == {"id": "zlib", "level": 1}
    attrs = json.load(open(f"{out}/red/.zattrs"))
    assert attrs["_ARRAY_DIMENSIONS"] == ["time", "y", "x"]
    root_attrs = json.load(open(f"{out}/.zattrs"))
    assert root_attrs["crs"] == plan.gbox.crs

    # coordinate arrays: pixel-center x/y, ns-epoch time
    xs = read_zarr_array(f"{out}/x")
    sx, _, x0, _, sy, y0 = plan.gbox.transform
    np.testing.assert_allclose(xs, x0 + (np.arange(plan.gbox.width) + 0.5) * sx)
    ts = read_zarr_array(f"{out}/time")
    assert ts.dtype == np.dtype("<i8") and ts.shape == (1,)


def test_zarr_sink_uncompressed(spark, tmp_path):
    from odc_stac_spark.sources.sinks import read_zarr_array, write_zarr

    from .test_load_pipeline import mk_item

    items = [mk_item(0, nodata=-1, nodata_every=3)]
    tiles_df, plan = load(spark, items, groupby="id", chunks=(64, 64))
    out = str(tmp_path / "store")
    write_zarr(tiles_df, plan, out, compressor="none")
    cube = assemble_numpy(tiles_df, plan)["red"]
    np.testing.assert_array_equal(read_zarr_array(f"{out}/red"), cube)


def test_zarr_sink_float_nan_fill(spark, tmp_path):
    """Float output with NaN nodata: the .zarray fill_value must be the
    spec's "NaN" string (not a bare NaN token), and pixels round-trip."""
    import json

    from odc_stac_spark.model import RasterLoadParams
    from odc_stac_spark.sources.sinks import read_zarr_array, write_zarr

    from .test_load_pipeline import mk_item

    items = [mk_item(0, nodata=-1, nodata_every=4)]
    cfg = {"*": RasterLoadParams(dtype="float64", fill_value=float("nan"))}
    tiles_df, plan = load(spark, items, groupby="id", chunks=(48, 48), cfg=cfg)
    out = str(tmp_path / "store")
    write_zarr(tiles_df, plan, out)

    meta = json.load(open(f"{out}/red/.zarray"))
    assert meta["fill_value"] == "NaN"
    cube = assemble_numpy(tiles_df, plan)["red"]
    got = read_zarr_array(f"{out}/red")
    np.testing.assert_array_equal(got, cube)  # NaN-positions included


# ---------------------------------------------------------------------------
# Zarr v3 (round-7)


def test_zarr_v3_roundtrip(spark, tmp_path):
    import json

    from odc_stac_spark.sources.sinks import read_zarr_v3_array, write_zarr_v3
    from .test_load_pipeline import mk_item, plan_load

    items = [mk_item(0, nodata=-1), mk_item(1, nodata=-1)]
    plan = plan_load(items, chunks=(32, 48))
    tiles_df, _ = load(spark, items, plan=plan)
    cube = assemble_numpy(tiles_df, plan)["red"]
    for comp in ("zstd", "gzip", "none"):
        out = str(tmp_path / f"v3_{comp}.zarr")
        write_zarr_v3(tiles_df, plan, out, compressor=comp)
        got = read_zarr_v3_array(f"{out}/red")
        np.testing.assert_array_equal(got, cube)
        # spec-level metadata shape (v3.0): node types, regular grid,
        # default / separator, bytes-first codec chain, dimension_names
        root = json.load(open(f"{out}/zarr.json"))
        assert root["zarr_format"] == 3 and root["node_type"] == "group"
        meta = json.load(open(f"{out}/red/zarr.json"))
        assert meta["node_type"] == "array"
        assert meta["chunk_grid"]["name"] == "regular"
        assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [1, 32, 48]
        assert meta["chunk_key_encoding"]["configuration"]["separator"] == "/"
        assert meta["codecs"][0]["name"] == "bytes"
        assert meta["dimension_names"] == ["time", "y", "x"]
        # chunks live under the c/ prefix with / separators
        import os as _os

        assert _os.path.exists(f"{out}/red/c/0/0/0")
    # coordinate vectors parse back
    xs = read_zarr_v3_array(f"{out}/x")
    assert xs.shape[0] == plan.gbox.shape[1]
    ts = read_zarr_v3_array(f"{out}/time")
    assert ts.shape[0] == 2


def test_zarr_v3_bad_compressor(spark, tmp_path):
    from odc_stac_spark.sources.sinks import write_zarr_v3
    from .test_load_pipeline import mk_item, plan_load

    items = [mk_item(0)]
    plan = plan_load(items, chunks=(32, 32))
    tiles_df, _ = load(spark, items, plan=plan)
    with pytest.raises(ValueError, match="compressor"):
        write_zarr_v3(tiles_df, plan, str(tmp_path / "x"), compressor="lz4")
