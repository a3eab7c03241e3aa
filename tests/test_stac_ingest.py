"""Real STAC JSON ingestion against the reference's golden fixtures.

Expected values mirror the reference's own assertions
(tests/test_mdtools.py:62,88,176-189 and tests/common/__init__.py
S2_ALL_BANDS) — computed independently by the Catalyst parse pipeline in
sources/stac_items.py (stac_json_to_items → raster_assets_df →
extract_collection_metadata).
"""

from __future__ import annotations

import os

import pytest

from odc_stac_spark.sources.stac_items import (
    extract_collection_metadata,
    parse_items,
    raster_assets_df,
    read_stac_json,
    stac_dicts_to_items,
    to_load_items,
)

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference golden fixtures not available"
)

S2_MS = f"{DATA}/S2B_MSIL2A_20190629T212529_R043_T06VVN_20201006T080531.json"
S2_COGS = f"{DATA}/S2A_28QCH_20200714_0_L2A.json"
GA_LS8 = f"{DATA}/ga_ls8c_ard_3-1-0_088080_2020-05-25_final.stac-item.json"
S2_MS_RASTER = f"{DATA}/S2B_MSIL2A_20190629T212529_R043_T06VVN_20201006T080531_raster_ext.json"

# reference tests/common/__init__.py S2_ALL_BANDS
S2_ALL_BANDS = {
    "B01", "B02", "B03", "B04", "B05", "B06", "B07", "B08", "B09", "B11",
    "B12", "B8A", "AOT", "SCL", "WVP", "visual",
}


def _bands_of(spark, path):
    items = read_stac_json(spark, path)
    ra = raster_assets_df(items)
    return {r.asset_name for r in ra.select("asset_name").distinct().collect()}


def test_s2_ms_data_band_detection(spark):
    """check_proj + role filters: 16 data bands, no preview/metadata/tilejson
    (reference test_extract_md, test_mdtools.py:173)."""
    assert _bands_of(spark, S2_MS) == S2_ALL_BANDS


def test_s2_cogs_proj_check_drops_thumbnail(spark):
    """S2A item: 'thumbnail' is image/png with NO proj data on a proj item →
    dropped by check_proj; 'overview'/'visual' have proj data → kept
    (reference is_raster_data check_proj, _mdtools.py:199-205)."""
    bands = _bands_of(spark, S2_COGS)
    assert "thumbnail" not in bands
    assert "info" not in bands and "metadata" not in bands
    assert {"overview", "visual", "B01", "SCL"} <= bands


def test_ga_item_level_proj_fallback(spark):
    """GA item: proj:shape/transform/epsg live at ITEM level; every asset
    inherits them (pystac owner-fallback semantics the reference relies on
    in asset_geobox, _mdtools.py:270-303)."""
    items = read_stac_json(spark, GA_LS8)
    ra = raster_assets_df(items).collect()
    assert len(ra) == 22
    for r in ra:
        if r.asset_name == "nbart_panchromatic":
            continue  # its own 15 m grid at asset level
        assert r.g_crs == "EPSG:32656"
        assert list(r.g_shape) == [7841, 7781]
        assert r.g_transform[0] == 30.0


def test_ga_collection_id_from_odc_product(spark):
    """collection is null on early ODC items → odc:product
    (reference _collection_id, _mdtools.py:471-479)."""
    items = read_stac_json(spark, GA_LS8)
    md = extract_collection_metadata(spark, items)
    assert set(md) == {"ga_ls8c_ard_3"}
    grids = set(md["ga_ls8c_ard_3"].band2grid.values())
    assert grids == {"default", "g15"}
    assert md["ga_ls8c_ard_3"].band2grid["nbart_panchromatic"] == "g15"


def test_s2_ms_grids_and_aliases(spark):
    """Grid election default/g20/g60 and eo alias ordering (reference
    test_eo3_grids + test_extract_md, test_mdtools.py:62,176-189)."""
    items = read_stac_json(spark, S2_MS)
    md = extract_collection_metadata(spark, items)["sentinel-2-l2a"]
    assert set(md.band2grid.values()) == {"default", "g20", "g60"}
    # 10 m group wins default (tie vs 20 m broken by smaller gsd)
    assert md.band2grid["B02"] == "default"
    assert md.band2grid["B05"] == "g20"
    assert md.band2grid["B01"] == "g60"
    # aliases: unique common names; 1-band asset outranks 3-band visual
    assert md.aliases["rededge"] == [("B05", 1), ("B06", 1), ("B07", 1), ("B8A", 1)]
    assert md.aliases["blue"][0] == ("B02", 1)
    assert ("visual", 3) in md.aliases["blue"]


def test_s2_raster_ext_band_metadata(spark):
    """raster:bands dtype/nodata flow through (reference band_metadata,
    _mdtools.py:101-136): SCL uint8, B02 uint16 nodata 0."""
    items = read_stac_json(spark, S2_MS_RASTER)
    md = extract_collection_metadata(spark, items)["sentinel-2-l2a"]
    assert md.bands[("SCL", 1)].data_type == "uint8"
    assert md.bands[("B02", 1)].data_type == "uint16"
    assert md.bands[("B02", 1)].nodata == 0.0


def test_parse_items_to_load_items(spark):
    """End-to-end bridge: golden fixture → parsed rows → plans.load.Item
    with real geoboxes (reference parse_item, _mdtools.py:642-702)."""
    items = read_stac_json(spark, S2_MS)
    parsed = parse_items(spark, items)
    loadable = to_load_items(parsed, band=["B02", "B05"])
    assert len(loadable) == 1
    it = loadable[0]
    assert it.id == "S2B_MSIL2A_20190629T212529_R043_T06VVN_20201006T080531"
    b02 = it.bands["B02"]
    assert b02.geobox.shape == (10980, 10980)
    assert b02.geobox.crs == "EPSG:32606"
    assert b02.geobox.transform[0] == 10.0
    b05 = it.bands["B05"]
    assert b05.geobox.shape == (5490, 5490)
    assert it.datetime.year == 2019


def test_stac_dicts_same_as_json(spark):
    """Driver-dict convenience path and at-scale JSON path agree."""
    import json

    with open(S2_MS) as f:
        doc = json.load(f)
    via_dicts = raster_assets_df(stac_dicts_to_items(spark, [doc]))
    via_json = raster_assets_df(read_stac_json(spark, S2_MS))
    a = sorted(map(tuple, via_dicts.select("asset_name", "g_crs", "href").collect()))
    b = sorted(map(tuple, via_json.select("asset_name", "g_crs", "href").collect()))
    assert a == b


def test_datetime_parsing(spark):
    items = read_stac_json(spark, S2_MS)
    r = items.select("datetime", "has_proj").first()
    assert r.datetime.isoformat().startswith("2019-06-29T21:25:29")
    assert r.has_proj is True


def test_featurecollection_search_dump_roundtrip(spark, tmp_path):
    """S16: a pystac-client-style search dump (ItemCollection JSON with 3
    golden items as features) parses to the same rows as the per-item
    path."""
    import json

    from odc_stac_spark.sources.stac_items import read_stac_api_dump

    docs = [json.load(open(p)) for p in (S2_MS, S2_COGS, GA_LS8)]
    dump = {"type": "FeatureCollection", "features": docs}
    p = tmp_path / "search_dump.json"
    p.write_text(json.dumps(dump))
    from_dump = parse_items(spark, read_stac_api_dump(spark, str(p)))
    from_items = parse_items(spark, stac_dicts_to_items(spark, docs))
    a = sorted(map(tuple, from_dump.drop("properties").collect()))
    b = sorted(map(tuple, from_items.drop("properties").collect()))
    assert a == b and len(a) > 0


def test_featurecollection_mixed_with_bare_item(spark, tmp_path):
    """A bare item document (no features key) passes through the same
    reader."""
    import json

    from odc_stac_spark.sources.stac_items import read_stac_api_dump

    doc = json.load(open(S2_COGS))
    p = tmp_path / "bare_item.json"
    p.write_text(json.dumps(doc))
    got = parse_items(spark, read_stac_api_dump(spark, str(p)))
    want = parse_items(spark, stac_dicts_to_items(spark, [doc]))
    assert sorted(map(tuple, got.drop("properties").collect())) == sorted(
        map(tuple, want.drop("properties").collect())
    )


def test_relative_asset_hrefs_resolve_against_self_link(spark):
    """Self-contained catalogs ship relative asset hrefs; they resolve
    against the item's self link (pystac get_absolute_href semantics,
    reference _mdtools.py:685). Without a self link they pass through
    unresolved (read fails loudly later)."""
    import json

    doc = json.load(open(S2_COGS))
    self_href = next(l["href"] for l in doc["links"] if l["rel"] == "self")
    base = self_href.rsplit("/", 1)[0]
    rel = json.loads(json.dumps(doc))
    names = list(rel["assets"])
    forms = {}
    for i, name in enumerate(names):
        fname = rel["assets"][name]["href"].rsplit("/", 1)[-1]
        if i % 3 == 0:
            rel["assets"][name]["href"] = fname
            forms[name] = f"{base}/{fname}"
        elif i % 3 == 1:
            rel["assets"][name]["href"] = f"./{fname}"
            forms[name] = f"{base}/{fname}"
        else:
            rel["assets"][name]["href"] = f"../up/{fname}"
            forms[name] = f"{base.rsplit('/', 1)[0]}/up/{fname}"
    items = stac_dicts_to_items(spark, [rel])
    got = {
        r.asset_name: r.href
        for r in raster_assets_df(items).select("asset_name", "href").collect()
    }
    for name, want in forms.items():
        if name in got:  # raster assets only
            assert got[name] == want, (name, got[name], want)
    assert len(got) > 0

    # no self link → unresolved passthrough
    rel2 = json.loads(json.dumps(rel))
    rel2["links"] = []
    got2 = {
        r.asset_name: r.href
        for r in raster_assets_df(stac_dicts_to_items(spark, [rel2]))
        .select("asset_name", "href")
        .collect()
    }
    for name, href in got2.items():
        assert not href.startswith("http"), (name, href)
