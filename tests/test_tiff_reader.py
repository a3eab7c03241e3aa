"""TiffReader: loading real GeoTIFF/COG files through the full tile
pipeline (S8 on an actual file format — written by sources/geotiff.py).

The flagship assertion is the closed loop: synth items → load → write_cog
→ point new Items at the .tif files → load again → identical mosaic.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pytest

from odc_stac_spark.model import GeoBox, RasterBandMetadata, RasterLoadParams, RasterSource
from odc_stac_spark.plans.load import Item, assemble_numpy, load
from odc_stac_spark.sources import synth as S
from odc_stac_spark.sources.geotiff import write_cog_file
from odc_stac_spark.sources.synth import SynthReader, TiffReader, reader_for

CRS = "EPSG:32735"
T0 = datetime(2020, 6, 6, 8, 30)


def test_reader_dispatch():
    assert isinstance(reader_for("synth://a?seed=1"), SynthReader)
    assert isinstance(reader_for("file:///x/y.tif"), TiffReader)
    assert isinstance(reader_for("/x/y.TIFF"), TiffReader)
    assert type(reader_for("synth://a")) is SynthReader  # not the subclass


def test_tiff_window_read_and_cache(tmp_path):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 10007, size=(80, 100)).astype("int32")
    gbox = GeoBox((80, 100), (10.0, 0.0, 0.0, 0.0, -10.0, 800.0), CRS)
    p = str(tmp_path / "w.tif")
    write_cog_file(p, arr, gbox, nodata=-1, tile=64)

    S.restore_env({})
    r = TiffReader()
    src = RasterSource(f"file://{p}", geobox=gbox, meta=RasterBandMetadata("int32", -1))
    rr = r.read(src, RasterLoadParams(), gbox)
    np.testing.assert_array_equal(rr.pix, arr)
    # per-process cache holds ONLY the header (pixel bytes are fetched
    # per-tile on demand — executor memory stays bounded by the window)
    assert f"file://{p}" in S.capture_env()["tif_headers"]
    assert "levels" in S.capture_env()["tif_headers"][f"file://{p}"]


def test_tiff_overview_pushdown(tmp_path):
    """2x-decimated read must come from the overview IFD and equal the
    top-left-sampled full-res data."""
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 255, size=(512, 512)).astype("uint8")
    gbox = GeoBox((512, 512), (10.0, 0.0, 0.0, 0.0, -10.0, 5120.0), CRS)
    p = str(tmp_path / "o.tif")
    write_cog_file(p, arr, gbox, tile=256, overview_levels=[2])

    S.restore_env({})
    r = TiffReader()
    src = RasterSource(f"file://{p}", geobox=gbox, meta=RasterBandMetadata("uint8", None))
    dst = GeoBox((256, 256), (20.0, 0.0, 0.0, 0.0, -20.0, 5120.0), CRS)
    rr = r.read(src, RasterLoadParams(), dst)
    np.testing.assert_array_equal(rr.pix, arr[::2, ::2])
    assert S.capture_env().get("tif_overview_reads", 0) == 1


def test_cog_write_read_loop_through_pipeline(spark, tmp_path):
    """synth load → COG sink → tif load: mosaics identical."""
    from odc_stac_spark.sources.sinks import write_cog

    from .test_load_pipeline import mk_item

    items = [
        mk_item(0, nodata=-1, nodata_every=4),
        mk_item(1, origin=(300.0, 1000.0), nodata=-1),
    ]
    tiles_df, plan = load(spark, items, groupby="solar_day", chunks=(48, 48))
    want = assemble_numpy(tiles_df, plan)["red"]
    paths = write_cog(tiles_df, plan, str(tmp_path / "cogs"))

    tif_items = [
        Item(
            id="tif-000",
            datetime=T0,
            bands={
                "red": RasterSource(
                    f"file://{paths[0]}",
                    geobox=plan.gbox,
                    meta=RasterBandMetadata("int32", plan.cfg["red"].fill_value),
                )
            },
        )
    ]
    tiles2, plan2 = load(spark, tif_items, geobox=plan.gbox, chunks=(64, 64))
    got = assemble_numpy(tiles2, plan2)["red"]
    np.testing.assert_array_equal(got[0], want[0])


def test_use_overviews_false_forces_fullres(tmp_path):
    """RasterLoadParams.use_overviews=False must bypass the overview IFD
    even when an aligned decimation matches (advisor finding): for files
    whose overviews were built with non-nearest resampling the overview
    substitution would silently change pixel values."""
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 255, size=(512, 512)).astype("uint8")
    gbox = GeoBox((512, 512), (10.0, 0.0, 0.0, 0.0, -10.0, 5120.0), CRS)
    p = str(tmp_path / "no_ov.tif")
    write_cog_file(p, arr, gbox, tile=256, overview_levels=[2])

    S.restore_env({})
    r = TiffReader()
    src = RasterSource(f"file://{p}", geobox=gbox, meta=RasterBandMetadata("uint8", None))
    dst = GeoBox((256, 256), (20.0, 0.0, 0.0, 0.0, -20.0, 5120.0), CRS)
    rr = r.read(src, RasterLoadParams(use_overviews=False), dst)
    # same values (writer overviews ARE nearest-decimated) but via the
    # full-res IFD: no overview read counted
    np.testing.assert_array_equal(rr.pix, arr[::2, ::2])
    assert S.capture_env().get("tif_overview_reads", 0) == 0


def test_tile_sanity_cap_env_override(tmp_path, monkeypatch):
    """The per-tile allocation cap honors ODC_STAC_SPARK_TIFF_MAX_PIXELS
    (the JP2 escape-hatch pattern) so a legit large single-strip TIFF can
    be admitted by raising it; lowering it proves the wiring."""
    from odc_stac_spark.sources.geotiff import read_cog_header

    gbox = GeoBox((32, 32), (10.0, 0.0, 0.0, 0.0, -10.0, 320.0), "EPSG:32735")
    img = np.arange(32 * 32, dtype=np.int16).reshape(32, 32)
    p = str(tmp_path / "small.tif")
    write_cog_file(p, img, gbox, tile=32, overview_levels=[])
    assert read_cog_header(p)["levels"][0]["tile_w"] == 32
    monkeypatch.setenv("ODC_STAC_SPARK_TIFF_MAX_PIXELS", "100")
    with pytest.raises(ValueError, match="ODC_STAC_SPARK_TIFF_MAX_PIXELS"):
        read_cog_header(p)
    monkeypatch.setenv("ODC_STAC_SPARK_TIFF_MAX_PIXELS", str(1 << 30))
    assert read_cog_header(p)["levels"][0]["tile_h"] == 32
