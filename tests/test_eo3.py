from __future__ import annotations

import json

from odc_stac_spark.sources.eo3 import stac2ds
from odc_stac_spark.sources.stac_items import items_df, parse_items

from .test_stac_metadata import landsat_item, s2_item


def test_stac2ds_docs(spark):
    df = items_df(spark, [s2_item(0), s2_item(1), landsat_item()])
    docs = {r.id: r for r in stac2ds(parse_items(spark, df)).collect()}
    assert len(docs) == 3
    s2 = docs["S2A_T35MNM_0000"]
    d = json.loads(s2.doc)
    assert d["product"] == "sentinel-2-l2a"
    assert d["id"] == s2.doc_uuid and len(s2.doc_uuid) == 36
    # grids deduped by resolution: 10/20/60 m
    assert set(d["grids"]) == {"g10.0", "g20.0", "g60.0"}
    assert d["grids"]["g10.0"]["shape"] == [10980, 10980]
    # measurements point at (path, band, grid)
    assert d["measurements"]["B05"]["grid"] == "g20.0"
    assert d["measurements"]["B02"]["path"].endswith("B02.tif")
    assert d["properties"]["odc:processing_datetime"].endswith("Z")
    # deterministic uuid: same input → same uuid; different item → different
    docs2 = {r.id: r for r in stac2ds(parse_items(spark, df)).collect()}
    assert docs2["S2A_T35MNM_0000"].doc_uuid == s2.doc_uuid
    assert docs["S2A_T35MNM_0001"].doc_uuid != s2.doc_uuid
    # landsat: collection falls back to odc:product
    assert docs["LC08_L2SP_001"].collection == "ga_ls8c_ard_3"


def test_stac2ds_same_resolution_distinct_grids(spark):
    """Two grids sharing x-resolution but different shape/origin must get
    distinct map keys (hash-suffixed), not DUPLICATED_MAP_KEY (advisor
    finding; reference keys grids by full GeoBox identity)."""
    item = s2_item(0)
    # give B05 a grid with the same 20 m resolution as SCL but a
    # different shape → same "g20.0" label, different identity
    a = dict(item["assets"]["B05"])
    a["proj_shape"] = [2745, 2745]
    item["assets"]["B05"] = a
    df = items_df(spark, [item])
    docs = {r.id: r for r in stac2ds(parse_items(spark, df)).collect()}
    d = json.loads(docs["S2A_T35MNM_0000"].doc)
    g20_keys = [k for k in d["grids"] if k.startswith("g20.0")]
    assert len(g20_keys) == 2 and "g20.0" not in g20_keys  # both suffixed
    # measurements still reference existing grid keys
    for m in d["measurements"].values():
        assert m["grid"] in d["grids"]
    # unaffected grids keep their clean labels
    assert "g10.0" in d["grids"] and "g60.0" in d["grids"]
