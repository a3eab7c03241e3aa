"""STAC /search client (sources/stac_search.py) against golden multi-page
responses, plus the new public exports parse_item / infer_dc_product /
mk_sample_item (reference odc/stac/__init__.py:20-36;
eo3/_eo3converter.py:102-122,328-347; assertions mirror the reference's
own tests/test_eo3converter.py:27-60)."""

from __future__ import annotations

import json
import os

import pytest

import odc_stac_spark as api
from odc_stac_spark.sources.stac_search import StacSearchClient, search_items

DATA = "/root/reference/tests/data"
SITE1 = f"{DATA}/site1-20200606-tall-strip-africa.geojson"
COLLECTION = f"{DATA}/sentinel-2-l2a.collection.json"

needs_golden = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference golden fixtures not available"
)


def _features():
    with open(SITE1) as f:
        return json.load(f)["features"]


class FakeTransport:
    """Golden pager: serves `features` in pages of `page_size`, emitting
    the requested next-link style. Records every call for assertions."""

    def __init__(self, features, page_size, style="post-token"):
        self.features = features
        self.page_size = page_size
        self.style = style
        self.calls = []

    def __call__(self, method, url, body):
        self.calls.append((method, url, json.loads(json.dumps(body)) if body else body))
        if self.style == "get-href":
            # token rides the URL; first call is the POST
            start = 0
            if method == "GET":
                start = int(url.rsplit("page=", 1)[1]) * self.page_size
        else:
            start = int((body or {}).get("token", 0)) * self.page_size
        page_no = start // self.page_size
        feats = self.features[start : start + self.page_size]
        page = {"type": "FeatureCollection", "features": feats, "links": []}
        if start + self.page_size < len(self.features):
            if self.style == "post-token":
                page["links"].append(
                    {
                        "rel": "next",
                        "href": url if method == "POST" else None,
                        "method": "POST",
                        "body": {"token": page_no + 1},
                        "merge": True,
                    }
                )
            elif self.style == "post-body":
                page["links"].append(
                    {
                        "rel": "next",
                        "method": "POST",
                        "body": {**(body or {}), "token": page_no + 1},
                    }
                )
            else:  # get-href
                page["links"].append(
                    {"rel": "next", "href": f"{url.split('?')[0]}?page={page_no + 1}"}
                )
        return page


@needs_golden
@pytest.mark.parametrize("style", ["post-token", "post-body", "get-href"])
def test_search_pagination_styles(style):
    feats = _features()
    t = FakeTransport(feats, page_size=4, style=style)
    client = StacSearchClient("https://api.example.com/stac/v1", transport=t)
    got = list(client.search(collections=["sentinel-2-l2a"], datetime="2020-06-06"))
    assert [g["id"] for g in got] == [f["id"] for f in feats]
    # 9 features, 4/page → 3 requests; first is always POST /search
    assert len(t.calls) == 3
    m0, u0, b0 = t.calls[0]
    assert m0 == "POST" and u0 == "https://api.example.com/stac/v1/search"
    assert b0["collections"] == ["sentinel-2-l2a"] and b0["datetime"] == "2020-06-06"
    if style == "get-href":
        assert t.calls[1][0] == "GET" and t.calls[1][2] is None
    else:
        # merge keeps the original search params alongside the token
        assert t.calls[1][0] == "POST"
        if style == "post-token":
            assert t.calls[1][2]["collections"] == ["sentinel-2-l2a"]
        assert t.calls[1][2]["token"] == 1


@needs_golden
def test_search_max_items_truncates_mid_page():
    feats = _features()
    t = FakeTransport(feats, page_size=4)
    client = StacSearchClient("https://api.example.com/stac/v1", transport=t)
    got = list(client.search(max_items=6))
    assert len(got) == 6
    assert [g["id"] for g in got] == [f["id"] for f in feats[:6]]
    assert len(t.calls) == 2  # stops paging once satisfied


@needs_golden
def test_search_to_dump_matches_reference_shape(spark):
    """dump shape == reference dump_site output (bench/_prepare.py:62-73):
    FeatureCollection + properties.api/search — and it round-trips through
    the existing S16 dump parser into ITEM_SCHEMA rows."""
    from odc_stac_spark.sources.stac_items import stac_featurecollection_to_items

    feats = _features()
    t = FakeTransport(feats, page_size=5)
    client = StacSearchClient("https://api.example.com/stac/v1", transport=t)
    dump = client.search_to_dump(collections=["sentinel-2-l2a"])
    assert dump["type"] == "FeatureCollection"
    assert len(dump["features"]) == len(feats)
    assert dump["properties"]["api"].endswith("/search")
    assert dump["properties"]["search"]["collections"] == ["sentinel-2-l2a"]
    raw = spark.createDataFrame([(json.dumps(dump),)], schema="value string")
    items = stac_featurecollection_to_items(raw)
    assert items.count() == len(feats)


@needs_golden
def test_search_items_lands_item_rows(spark):
    feats = _features()
    t = FakeTransport(feats, page_size=4)
    df = search_items(
        spark,
        "https://api.example.com/stac/v1",
        transport=t,
        collections=["sentinel-2-l2a"],
    )
    rows = df.select("id", "collection").collect()
    assert {r.id for r in rows} == {f["id"] for f in feats}
    assert {r.collection for r in rows} == {"sentinel-2-l2a"}


def test_empty_page_terminates():
    t = FakeTransport([], page_size=4)
    client = StacSearchClient("https://api.example.com/stac/v1", transport=t)
    assert list(client.search()) == []
    assert len(t.calls) == 1


# ---------------------------------------------------------------------------
# parse_item / infer_dc_product / mk_sample_item


def test_new_public_names_exported():
    for name in ("parse_item", "infer_dc_product", "mk_sample_item",
                 "StacSearchClient", "search_items"):
        assert hasattr(api, name), name


@needs_golden
def test_parse_item_singular(spark):
    with open(SITE1) as f:
        doc = json.load(f)["features"][0]
    # site1 items carry no raster extension — band metadata comes from the
    # config, like the reference's STAC_CFG (tests/common/__init__.py)
    cfg = {
        "sentinel-2-l2a": {
            "assets": {
                "*": {"data_type": "uint16", "nodata": 0},
                "SCL": {"data_type": "uint8", "nodata": 0},
            }
        }
    }
    item = api.parse_item(spark, doc, cfg=cfg)
    assert item.id == doc["id"]
    # the S2 band set comes through with dtype/nodata resolved
    assert "B02" in item.bands and "SCL" in item.bands
    assert "thumbnail" not in item.bands
    b02 = item.bands["B02"]
    assert b02.meta.data_type == "uint16" and b02.meta.nodata == 0
    assert b02.uri == doc["assets"]["B02"]["href"]


@needs_golden
def test_infer_dc_product_from_collection(spark):
    """Mirrors reference tests/test_eo3converter.py:27-48: SCL uint8 with
    no band index; eo-extension aliases red/green/blue resolve; B01 lands
    on the 60 m grid while B02 is default."""
    with open(COLLECTION) as f:
        collection = json.load(f)
    product = api.infer_dc_product(spark, collection)
    assert product["name"] == "sentinel-2-l2a"
    assert product["metadata_type"] == "eo3"
    m = {x["name"]: x for x in product["measurements"]}
    assert m["SCL"]["dtype"] == "uint8"
    assert "band" not in m["SCL"]
    assert "red" in m["B04"].get("aliases", [])
    assert "green" in m["B03"].get("aliases", [])
    assert "blue" in m["B02"].get("aliases", [])
    # band2grid via the same sample-item path (reference attaches _md)
    from odc_stac_spark.sources.eo3 import mk_sample_item
    from odc_stac_spark.sources.stac_items import (
        extract_collection_metadata,
        stac_dicts_to_items,
    )

    items = stac_dicts_to_items(spark, [mk_sample_item(collection)])
    md = extract_collection_metadata(spark, items)["sentinel-2-l2a"]
    assert md.band2grid["B02"] == "default"
    assert md.band2grid["B01"] == "g60"


@needs_golden
def test_infer_dc_product_from_item(spark):
    with open(SITE1) as f:
        doc = json.load(f)["features"][0]
    product = api.infer_dc_product(spark, doc)
    assert product["name"] == "sentinel-2-l2a"
    names = {x["name"] for x in product["measurements"]}
    assert {"B02", "B03", "B04", "SCL"} <= names


def test_mk_sample_item_requires_item_assets():
    with pytest.raises(ValueError, match="ItemAssets"):
        api.mk_sample_item({"type": "Collection", "id": "x"})
