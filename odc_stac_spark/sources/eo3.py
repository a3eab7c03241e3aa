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
