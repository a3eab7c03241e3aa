"""STAC → EO3 dataset-document converter (SURVEY §2.1 S17, §3.3;
reference odc/stac/eo3/_eo3converter.py — semantics re-expressed as one
DataFrame projection).

Per item: deterministic UUID from (collection, id) digest
(eo3/_eo3converter.py:125-156), grid docs from per-band geoboxes
(:163-226), measurement→(path, band) map, STAC→EO3 property renames
(:45-56), emitted as a JSON document column. Lazy iterator in the
reference → lazy DataFrame here; ``collection schema first-item-wins``
is the same `extract_collection_metadata` aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# STAC property → EO3 property rename map (reference keymap :45-56 has 10
# entries; these are the ones representable in our item schema)
PROPERTY_RENAMES = {
    "datetime": "odc:processing_datetime",
    "start_datetime": "dtr:start_datetime",
    "end_datetime": "dtr:end_datetime",
}


def _uuid5_like(col_collection: F.Column, col_id: F.Column) -> F.Column:
    """Deterministic uuid from md5(collection \\n id) — the F14 digest
    formatted as 8-4-4-4-12."""
    h = F.md5(F.concat_ws("\n", col_collection, col_id))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def stac2ds(parsed: DataFrame) -> DataFrame:
    """parsed-item band rows (sources/stac_items.parse_items output) →
    one EO3 dataset doc per item, as (id, doc_uuid, collection, doc JSON).

    Grid naming: resolution label ``g<|sx|>`` while unique within the
    item; two distinct grids sharing an x-resolution (different shape/
    origin/crs) get a full-identity hash suffix instead of colliding into
    one map key (DUPLICATED_MAP_KEY — advisor finding; reference keys
    grids by GeoBox identity, _eo3converter.py:163-226)."""
    label = F.concat(F.lit("g"), F.abs(F.element_at("g_transform", 1)).cast("string"))
    identity = F.md5(
        F.to_json(
            F.struct(
                F.col("g_shape").alias("shape"),
                F.col("g_transform").alias("transform"),
                F.col("g_crs").alias("crs"),
            )
        )
    )
    collected = parsed.groupBy("cid", "id", "datetime").agg(
        F.collect_list(
            F.struct(
                F.col("asset_name"),
                F.col("href"),
                F.col("band_idx"),
                label.alias("label"),
                identity.alias("identity"),
                F.col("g_shape").alias("shape"),
                F.col("g_transform").alias("transform"),
                F.col("g_crs").alias("crs"),
            )
        ).alias("bands"),
    )
    uniq = F.array_distinct(
        F.transform(
            F.col("bands"),
            lambda b: F.struct(
                b["label"].alias("label"),
                b["identity"].alias("identity"),
                b["shape"].alias("shape"),
                b["transform"].alias("transform"),
                b["crs"].alias("crs"),
            ),
        )
    )

    def grid_key(label_col, identity_col, uniq_col):
        clash = (
            F.size(F.filter(uniq_col, lambda u: u["label"] == label_col)) > 1
        )
        return F.when(
            clash, F.concat(label_col, F.lit("-"), F.substring(identity_col, 1, 6))
        ).otherwise(label_col)

    grids = collected.withColumn("uniq", uniq).select(
        "cid",
        "id",
        "datetime",
        F.map_from_entries(
            F.transform(
                F.col("uniq"),
                lambda g: F.struct(
                    grid_key(g["label"], g["identity"], F.col("uniq")).alias("key"),
                    F.struct(
                        g["shape"].alias("shape"),
                        g["transform"].alias("transform"),
                        g["crs"].alias("crs"),
                    ).alias("value"),
                ),
            )
        ).alias("grids"),
        F.map_from_entries(
            F.transform(
                F.col("bands"),
                lambda b: F.struct(
                    b["asset_name"].alias("key"),
                    F.struct(
                        b["href"].alias("path"),
                        b["band_idx"].alias("band"),
                        grid_key(b["label"], b["identity"], F.col("uniq")).alias(
                            "grid"
                        ),
                    ).alias("value"),
                ),
            )
        ).alias("measurements"),
    )
    doc = F.to_json(
        F.struct(
            _uuid5_like(F.col("cid"), F.col("id")).alias("id"),
            F.col("cid").alias("product"),
            F.col("grids"),
            F.col("measurements"),
            F.struct(
                F.date_format("datetime", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                    PROPERTY_RENAMES["datetime"]
                )
            ).alias("properties"),
        )
    )
    return grids.select(
        "id",
        _uuid5_like(F.col("cid"), F.col("id")).alias("doc_uuid"),
        F.col("cid").alias("collection"),
        doc.alias("doc"),
    )


# ---------------------------------------------------------------------------
# product inference (reference eo3/_eo3converter.py:63-122, 328-347)


def mk_sample_item(collection: dict) -> dict:
    """STAC Collection dict → a synthetic sample item carrying the
    collection's ``item_assets`` definitions (reference ``mk_sample_item``,
    _mdtools.py:445-468: requires the ItemAssets extension; asset hrefs
    are empty — only the band metadata matters for product inference)."""
    item_assets = collection.get("item_assets")
    if item_assets is None:
        raise ValueError(
            "This only works on Collections with ItemAssets extension"
        )
    return {
        "type": "Feature",
        "stac_version": collection.get("stac_version", "1.0.0"),
        "stac_extensions": collection.get("stac_extensions", []),
        "id": "sample",
        "collection": collection.get("id"),
        "properties": {"datetime": "2020-01-01T00:00:00Z"},
        "geometry": None,
        "links": [],
        "assets": {
            name: {"href": "", **asset} for name, asset in item_assets.items()
        },
    }


def infer_dc_product(spark, doc: dict, cfg=None) -> dict:
    """Datacube product document inferred from a sample STAC Item dict or
    a STAC Collection dict (reference ``infer_dc_product``,
    eo3/_eo3converter.py:102-122 item form, :328-347 collection form via
    ``mk_sample_item``). Returns the eo3 product doc as a plain dict:
    ``{name, metadata_type, metadata, measurements:[{name, dtype, nodata,
    units, aliases?, band?}]}`` — the reference wraps the same doc in a
    ``datacube`` DatasetType, a dependency this engine doesn't take.

    Runs through the SAME ``extract_collection_metadata`` aggregation as
    the at-scale path (one code path, no drift)."""
    from .stac_items import extract_collection_metadata, stac_dicts_to_items

    if doc.get("type") == "Collection" or (
        "item_assets" in doc and "properties" not in doc
    ):
        return infer_dc_product(spark, mk_sample_item(doc), cfg)
    items = stac_dicts_to_items(spark, [doc])
    mds = extract_collection_metadata(spark, items, cfg)
    if not mds:
        raise ValueError(f"item {doc.get('id')!r} has no raster data assets")
    (md,) = mds.values()

    # unique alias map: alias → its winning candidate only (the reference
    # drops ambiguous aliases, band_aliases(unique=True), model.py)
    band_aliases = {}
    for alias, candidates in md.aliases.items():
        if candidates:
            band_aliases.setdefault(tuple(candidates[0]), []).append(alias)

    measurements = []
    for (name, idx), band in sorted(md.bands.items()):
        m = {
            "name": f"{name}_{idx}" if idx > 1 else name,
            "dtype": band.data_type,
            "nodata": band.nodata,
            "units": band.unit,
        }
        aliases = band_aliases.get((name, idx))
        if aliases:
            m["aliases"] = sorted(aliases)
        if idx > 1:
            m["band"] = idx
        measurements.append(m)
    return {
        "name": md.name,
        "metadata_type": "eo3",
        "metadata": {"product": {"name": md.name}},
        "measurements": measurements,
    }
