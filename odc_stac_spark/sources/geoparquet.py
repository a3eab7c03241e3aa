"""STAC-geoparquet catalog layout: WKB geometry + bbox covering + ``geo``
file metadata, written from executors.

The public stac-geoparquet convention (and GeoParquet 1.1) stores a STAC
catalog as parquet with

- a ``geometry`` column of ISO WKB (here: the item footprint polygon),
- a ``bbox`` STRUCT<xmin, ymin, xmax, ymax> "covering" column whose
  parquet min/max footer statistics let engines prune row groups for a
  bbox query without decoding a single geometry, and
- a ``geo`` key-value entry in each file footer describing version,
  primary column, encoding and covering.

Spark's parquet writer cannot attach custom file metadata, so
:func:`write_stac_geoparquet` writes each partition with **pyarrow inside
``mapInArrow``** (exact type passthrough — no pandas degradation of
nullable booleans/timestamps/maps), the same executor-side pattern as the
Zarr/COG sinks:
every task emits one spec-complete file and returns a manifest row; the
driver never sees data. At catalog scale (10⁸ items) both the write and
any later bbox-filtered scan are fully distributed, and the bbox covering
turns spatial catalog queries into stats-only row-group pruning
(PushedFilters on ``bbox.xmin`` etc. — asserted in tests).

WKB encode/decode is implemented from the OGC spec (pure struct/numpy;
polygons + multipolygons, either byte order on read).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from typing import Iterator, List, Sequence, Tuple

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

# ---- WKB (OGC 06-103r4) ---------------------------------------------------

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def wkb_encode_polygon(rings: Sequence[Sequence[Tuple[float, float]]]) -> bytes:
    """rings (exterior first) → little-endian ISO WKB Polygon."""
    out = bytearray(struct.pack("<BI", 1, _WKB_POLYGON))
    out += struct.pack("<I", len(rings))
    for ring in rings:
        pts = np.asarray(ring, dtype="<f8")
        out += struct.pack("<I", len(pts))
        out += pts.tobytes()
    return bytes(out)


def wkb_decode(data: bytes):
    """WKB → (type_name, list of polygons, each a list of (n, 2) arrays).
    Handles Polygon and MultiPolygon in either byte order."""

    def rd_polygon(buf, pos, bo):
        (nrings,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            pts = np.frombuffer(buf, dtype=bo + "f8", count=npts * 2, offset=pos)
            rings.append(pts.reshape(npts, 2))
            pos += npts * 16
        return rings, pos

    bo = "<" if data[0] == 1 else ">"
    (gtype,) = struct.unpack_from(bo + "I", data, 1)
    if gtype == _WKB_POLYGON:
        rings, _ = rd_polygon(data, 5, bo)
        return "Polygon", [rings]
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from(bo + "I", data, 5)
        pos = 9
        polys = []
        for _ in range(npoly):
            bo_i = "<" if data[pos] == 1 else ">"
            pos += 5  # inner byte order + type
            rings, pos = rd_polygon(data, pos, bo_i)
            polys.append(rings)
        return "MultiPolygon", polys
    raise NotImplementedError(f"WKB geometry type {gtype} (Polygon/MultiPolygon only)")


def _geo_file_metadata(crs: str) -> bytes:
    """The GeoParquet 1.1 ``geo`` footer entry with a bbox covering."""
    return json.dumps(
        {
            "version": "1.1.0",
            "primary_column": "geometry",
            "columns": {
                "geometry": {
                    "encoding": "WKB",
                    "geometry_types": ["Polygon"],
                    "crs": crs,
                    "covering": {
                        "bbox": {
                            "xmin": ["bbox", "xmin"],
                            "ymin": ["bbox", "ymin"],
                            "xmax": ["bbox", "xmax"],
                            "ymax": ["bbox", "ymax"],
                        }
                    },
                }
            },
        }
    ).encode()


# ---- writer ---------------------------------------------------------------


def write_stac_geoparquet(
    df: DataFrame, path: str, bbox_col: str = "bbox", crs: str = "EPSG:4326"
) -> List[str]:
    """Write a catalog DataFrame as STAC-geoparquet.

    ``df`` must carry ``bbox_col`` as ARRAY<DOUBLE> [xmin, ymin, xmax,
    ymax] (the ITEM_SCHEMA convention); the writer derives the WKB
    footprint polygon and the bbox covering struct per row, then each
    partition writes one spec-complete parquet file (pyarrow, executor
    side) including the ``geo`` footer metadata. Returns the file list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):  # overwrite semantics (files are uuid-named)
        if old.endswith(".parquet"):
            os.remove(os.path.join(path, old))
    geo_meta = _geo_file_metadata(crs)

    def write_part(batches):
        import pyarrow as pa  # noqa: F811 (executor-side import)
        import pyarrow.parquet as pq  # noqa: F811

        parts = [pa.Table.from_batches([b]) for b in batches]
        parts = [t for t in parts if t.num_rows]
        if not parts:
            return
        table = pa.concat_tables(parts)
        boxes = table.column(bbox_col).to_pylist()
        table = table.remove_column(table.schema.get_field_index(bbox_col))
        geom = pa.array(
            [
                None
                if b is None
                else wkb_encode_polygon(
                    [[(b[0], b[1]), (b[2], b[1]), (b[2], b[3]), (b[0], b[3]), (b[0], b[1])]]
                )
                for b in boxes
            ],
            type=pa.binary(),
        )
        bbox_type = pa.struct(
            [("xmin", pa.float64()), ("ymin", pa.float64()),
             ("xmax", pa.float64()), ("ymax", pa.float64())]
        )
        covering = pa.array(
            [
                None
                if b is None
                else {"xmin": float(b[0]), "ymin": float(b[1]),
                      "xmax": float(b[2]), "ymax": float(b[3])}
                for b in boxes
            ],
            type=bbox_type,
        )
        table = table.append_column("geometry", geom).append_column("bbox", covering)
        table = table.replace_schema_metadata(
            {**(table.schema.metadata or {}), b"geo": geo_meta}
        )
        fname = f"part-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(path, fname))
        yield pa.RecordBatch.from_pydict({"file": [fname]})

    # mapInArrow: the catalog columns pass through as EXACT arrow types —
    # a pandas hop would degrade nullable booleans/timestamps/maps
    out_schema = StructType([StructField("file", StringType())])
    files = [r.file for r in df.mapInArrow(write_part, out_schema).collect()]
    return sorted(files)


def read_stac_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """Scan a STAC-geoparquet catalog. Filters on ``bbox.xmin`` etc. are
    plain struct-field predicates, so they reach the parquet reader as
    PushedFilters and prune row groups via the covering stats."""
    return spark.read.parquet(path)


def geoparquet_meta(path_or_file: str) -> dict:
    """Parse the ``geo`` footer metadata of a geoparquet file (validation/
    interop helper)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path_or_file):
        names = [n for n in sorted(os.listdir(path_or_file)) if n.endswith(".parquet")]
        path_or_file = os.path.join(path_or_file, names[0])
    md = pq.read_schema(path_or_file).metadata or {}
    if b"geo" not in md:
        raise ValueError(f"{path_or_file}: no 'geo' footer metadata — not geoparquet")
    return json.loads(md[b"geo"])


def bbox_filter(df: DataFrame, xmin: float, ymin: float, xmax: float, ymax: float) -> DataFrame:
    """Covering-based bbox intersection predicate (stats-prunable)."""
    return df.where(
        (F.col("bbox.xmin") <= xmax)
        & (F.col("bbox.xmax") >= xmin)
        & (F.col("bbox.ymin") <= ymax)
        & (F.col("bbox.ymax") >= ymin)
    )


def catalog_from_geoparquet(df: DataFrame) -> DataFrame:
    """Restore the ITEM_SCHEMA shape from a geoparquet catalog scan:
    bbox covering struct → ARRAY<DOUBLE> [xmin, ymin, xmax, ymax]; the WKB
    geometry column is dropped (planning uses bbox; decode on demand via
    :func:`wkb_decode`). Output feeds ``parse_items`` unchanged."""
    return df.withColumn(
        "bbox",
        F.array(
            F.col("bbox.xmin"), F.col("bbox.ymin"), F.col("bbox.xmax"), F.col("bbox.ymax")
        ),
    ).drop("geometry")
