"""Unit tests for the planning/data-model layer (reference test strategy
SURVEY §5.1: exact assertions on pure operators)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from odc_stac_spark.model import (
    GeoBox,
    GeoboxTiles,
    RasterBandMetadata,
    RasterCollectionMetadata,
    RasterLoadParams,
    band_display_name,
    nodata_mask,
    norm_key,
    pick_overview,
    resolve_dst_dtype,
    resolve_dst_nodata,
    resolve_src_nodata,
    same_nodata,
    solar_offset_seconds,
)


def test_norm_key():
    # reference model.py:461-472
    assert norm_key("red") == ("red", 1)
    assert norm_key("band.3") == ("band", 3)
    assert norm_key("a.b") == ("a.b", 1)  # non-int suffix → plain name
    assert norm_key(("x", 2)) == ("x", 2)
    assert band_display_name(("red", 1)) == "red"
    assert band_display_name(("red", 2)) == "red.2"


def test_pick_overview():
    # reference loader/_reader.py:104-114: largest overview ≤ shrink
    assert pick_overview(1, [2, 4]) is None
    assert pick_overview(2, [2, 4]) == 0
    assert pick_overview(3, [2, 4]) == 0
    assert pick_overview(4, [2, 4]) == 1
    assert pick_overview(100, [2, 4]) == 1


def test_solar_offset():
    # reference model.py:454-458: int(lon/15)*3600, trunc toward zero
    assert solar_offset_seconds(0.0) == 0
    assert solar_offset_seconds(14.9) == 0
    assert solar_offset_seconds(15.0) == 3600
    assert solar_offset_seconds(-14.9) == 0
    assert solar_offset_seconds(-15.1) == -3600
    assert solar_offset_seconds(179.9) == 11 * 3600


def test_nodata_resolution_chain():
    # reference loader/_reader.py:68-101 (F5/F6/F7)
    cfg = RasterLoadParams()
    assert resolve_src_nodata(None, cfg) is None
    assert resolve_src_nodata(-1, cfg) == -1
    cfg2 = RasterLoadParams(src_nodata_override=7, src_nodata_fallback=9)
    assert resolve_src_nodata(-1, cfg2) == 7
    cfg3 = RasterLoadParams(src_nodata_fallback=9)
    assert resolve_src_nodata(None, cfg3) == 9

    assert resolve_dst_dtype("int16", RasterLoadParams()) == np.dtype("int16")
    assert resolve_dst_dtype("int16", RasterLoadParams(dtype="float64")) == np.dtype("float64")

    assert resolve_dst_nodata(np.dtype("int16"), RasterLoadParams(fill_value=-99), -1) == -99
    assert math.isnan(resolve_dst_nodata(np.dtype("float32"), RasterLoadParams(), -1))
    assert resolve_dst_nodata(np.dtype("int16"), RasterLoadParams(), -1) == -1
    assert resolve_dst_nodata(np.dtype("int16"), RasterLoadParams(), None) is None


def test_nodata_mask_semantics():
    # reference loader/_reader.py:117-134 (F3/F4)
    f = np.array([1.0, np.nan, -1.0])
    assert nodata_mask(f, -1.0).tolist() == [False, True, True]
    assert nodata_mask(f, None).tolist() == [False, True, False]  # NaN always missing
    i = np.array([1, -1, 0])
    assert nodata_mask(i, -1).tolist() == [False, True, False]
    assert nodata_mask(i, None).tolist() == [False, False, False]
    assert same_nodata(float("nan"), float("nan"))
    assert not same_nodata(float("nan"), -1.0)
    assert same_nodata(None, None)
    assert not same_nodata(None, -1.0)
    assert same_nodata(-1.0, -1.0)


def test_geobox_math():
    g = GeoBox.from_bbox((0, 0, 1200, 1000), 10.0, "EPSG:32735")
    assert g.shape == (100, 120)
    assert g.bbox() == (0.0, 0.0, 1200.0, 1000.0)
    assert g.pixel_of(0.0, 1000.0) == (0, 0)
    assert g.pixel_of(15.0, 995.0) == (0, 1)
    assert g.gsd == 10.0
    sub = g.crop((10, 20), (30, 50))
    assert sub.shape == (10, 20)
    assert sub.bbox() == (300.0, 800.0, 500.0, 900.0)
    assert g.aligned_with(sub)
    shifted = GeoBox((10, 10), (10.0, 0.0, 5.0, 0.0, -10.0, 1000.0), "EPSG:32735")
    assert not g.aligned_with(shifted)  # half-pixel offset
    other_crs = GeoBox((10, 10), (10.0, 0.0, 0.0, 0.0, -10.0, 1000.0), "EPSG:4326")
    assert not g.aligned_with(other_crs)


def test_geobox_tiles():
    g = GeoBox.from_bbox((0, 0, 1200, 1000), 10.0, "EPSG:32735")
    tiles = GeoboxTiles(g, (48, 48))
    assert tiles.chunk_counts == (3, 3)
    # edge tile is clipped
    assert tiles.tile_geobox(2, 2).shape == (100 - 96, 120 - 96)
    # bbox covering upper-left quadrant only
    hits = list(tiles.tiles_overlapping_bbox((0, 500, 600, 1000)))
    assert (0, 0) in hits and (1, 1) in hits and (2, 2) not in hits
    # degenerate bbox → no tiles
    assert list(tiles.tiles_overlapping_bbox((-500, -500, -100, -100))) == []


def test_collection_metadata_alias_resolution():
    # reference model.py:118-164: alias priority, dotted keys, ambiguity
    md = RasterCollectionMetadata(
        name="c",
        bands={("B04", 1): RasterBandMetadata("uint16", 0), ("visual", 1): RasterBandMetadata()},
        aliases={"red": [("B04", 1), ("visual", 1)]},
    )
    assert md.canonical_name("B04") == ("B04", 1)
    assert md.canonical_name("red") == ("B04", 1)  # first candidate wins
    assert md.resolve_bands("red") == {("B04", 1): md.bands[("B04", 1)]}
    assert set(md.resolve_bands(None)) == {("B04", 1), ("visual", 1)}
    with pytest.raises(ValueError):
        md.canonical_name("nope")
    assert len(md) == 2 and ("B04", 1) in md
