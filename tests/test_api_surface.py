"""Public-API parity with the reference (odc/stac/__init__.py:20-36):
a user of odc-stac finds the same top-level names here, Spark-flavored."""

from __future__ import annotations

import odc_stac_spark as api


def test_reference_public_names_exist():
    # reference exports: load (alias stac_load), parse_item/parse_items,
    # extract_collection_metadata, output_geobox, configure_s3_access,
    # model classes, stac2ds
    for name in (
        "load",
        "stac_load",
        "parse_item",
        "parse_items",
        "extract_collection_metadata",
        "output_geobox",
        "configure_s3_access",
        "configure_rio",
        "stac2ds",
        "ParsedItem",
        "ConversionConfig",
        "RasterBandMetadata",
        "RasterCollectionMetadata",
        "RasterLoadParams",
        "RasterSource",
        "GeoBox",
    ):
        assert hasattr(api, name), name
    assert api.stac_load is api.load
    # ParsedItem is the reference's per-item loading-essentials object
    # (model.py:193-219) — here the driver-side Item that parse_item
    # returns and load() consumes
    assert api.ParsedItem is api.Item
    from typing import get_origin

    # ConversionConfig is a Dict[str, Any] type alias in the reference
    # (_mdtools.py:61) — same here
    assert get_origin(api.ConversionConfig) is dict


def test_output_geobox_resolves_grid():
    from .test_load_pipeline import mk_item

    gbox = api.output_geobox([mk_item(0), mk_item(1, origin=(300.0, 1000.0))])
    assert gbox.crs == "EPSG:32735"
    assert gbox.resolution == (10.0, -10.0)
    # union of the two 100x120 grids offset by (300, 0)
    assert gbox.bbox() == (0.0, 0.0, 1500.0, 1000.0)
