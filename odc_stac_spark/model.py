"""Data model: driver-side planning structs mirroring the reference's
metadata plane (SURVEY.md §1.1; reference files odc/stac/model.py,
odc/stac/loader/types.py — semantics only, re-implemented Spark-first).

These are deliberately plain dataclasses: at plan time they live on the
driver (or inside broadcast variables); the *data* they describe flows
through DataFrames. ``GeoBox`` replaces ``odc.geo.GeoBox`` with exactly the
affine math the engine needs (no pyproj dependency — CRS is an opaque
string; cross-CRS warping is a reader-driver concern, stubbed in
sources/synth.py like the reference's rasterio driver would plug in).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Iterator, Mapping, Optional, Sequence, Tuple

import numpy as np

# --------------------------------------------------------------------------
# GeoBox: shape + affine + CRS (reference: odc.geo.GeoBox used at
# model.py:21, _stac_load.py:32; affine validation _mdtools.py:296-301)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GeoBox:
    """A pixel grid: ``shape=(ny, nx)``, affine ``(sx, 0, x0, 0, sy, y0)``
    (sy negative for north-up), CRS as an opaque authority string."""

    shape: Tuple[int, int]
    transform: Tuple[float, float, float, float, float, float]
    crs: str = "EPSG:4326"

    @staticmethod
    def from_bbox(
        bbox: Tuple[float, float, float, float],
        resolution: float,
        crs: str = "EPSG:4326",
    ) -> "GeoBox":
        """Grid covering bbox=(xmin, ymin, xmax, ymax) at square resolution."""
        xmin, ymin, xmax, ymax = bbox
        nx = max(1, int(math.ceil((xmax - xmin) / resolution)))
        ny = max(1, int(math.ceil((ymax - ymin) / resolution)))
        return GeoBox((ny, nx), (resolution, 0.0, xmin, 0.0, -resolution, ymax), crs)

    @property
    def width(self) -> int:
        return self.shape[1]

    @property
    def height(self) -> int:
        return self.shape[0]

    @property
    def resolution(self) -> Tuple[float, float]:
        return (self.transform[0], self.transform[4])

    @property
    def gsd(self) -> float:
        """ground sample distance = min |scale| (reference _mdtools.py:306-313)."""
        return min(abs(self.transform[0]), abs(self.transform[4]))

    def bbox(self) -> Tuple[float, float, float, float]:
        sx, _, x0, _, sy, y0 = self.transform
        xs = (x0, x0 + sx * self.width)
        ys = (y0, y0 + sy * self.height)
        return (min(xs), min(ys), max(xs), max(ys))

    def pixel_of(self, x: float, y: float) -> Tuple[int, int]:
        """World → pixel (iy, ix), truncating toward -inf (floor)."""
        sx, _, x0, _, sy, y0 = self.transform
        return (int(math.floor((y - y0) / sy)), int(math.floor((x - x0) / sx)))

    def world_of(self, iy: int, ix: int) -> Tuple[float, float]:
        """Pixel corner → world (x, y)."""
        sx, _, x0, _, sy, y0 = self.transform
        return (x0 + ix * sx, y0 + iy * sy)

    def crop(self, roi_y: Tuple[int, int], roi_x: Tuple[int, int]) -> "GeoBox":
        """Sub-geobox for pixel ranges [y0,y1), [x0,x1)."""
        x, y = self.world_of(roi_y[0], roi_x[0])
        sx, sh, _, sv, sy, _ = self.transform
        return GeoBox(
            (roi_y[1] - roi_y[0], roi_x[1] - roi_x[0]),
            (sx, sh, x, sv, sy, y),
            self.crs,
        )

    def aligned_with(self, other: "GeoBox", tol: float = 1e-6) -> bool:
        """Same CRS, same scale, and integer pixel offset — the paste
        fast-path precondition (reference loader/_rio.py:350-368)."""
        if self.crs != other.crs:
            return False
        sx, _, x0, _, sy, y0 = self.transform
        osx, _, ox0, _, osy, oy0 = other.transform
        if abs(sx - osx) > tol * abs(sx) or abs(sy - osy) > tol * abs(sy):
            return False
        fx = (ox0 - x0) / sx
        fy = (oy0 - y0) / sy
        return abs(fx - round(fx)) < tol and abs(fy - round(fy)) < tol


@dataclass(frozen=True)
class GeoboxTiles:
    """Regular tiling of a GeoBox (reference GeoboxTiles, _stac_load.py:426)."""

    base: GeoBox
    tile_shape: Tuple[int, int]

    @property
    def chunk_counts(self) -> Tuple[int, int]:
        ty, tx = self.tile_shape
        return (
            (self.base.height + ty - 1) // ty,
            (self.base.width + tx - 1) // tx,
        )

    def tile_geobox(self, iy: int, ix: int) -> GeoBox:
        ty, tx = self.tile_shape
        y0, x0 = iy * ty, ix * tx
        y1 = min(y0 + ty, self.base.height)
        x1 = min(x0 + tx, self.base.width)
        return self.base.crop((y0, y1), (x0, x1))

    def tiles_overlapping_bbox(
        self, bbox: Tuple[float, float, float, float]
    ) -> Iterator[Tuple[int, int]]:
        """Tile indices intersecting a world bbox (reference _tiles,
        _stac_load.py:569-573) — the grid-index expansion behind J1."""
        sx, _, x0, _, sy, y0 = self.base.transform
        xmin, ymin, xmax, ymax = bbox
        # pixel ranges [px0, px1) / [py0, py1); sy < 0 ⇒ ymax is the top row
        px0 = max(0, int(math.floor((xmin - x0) / sx)))
        px1 = min(self.base.width, int(math.ceil((xmax - x0) / sx)))
        py0 = max(0, int(math.floor((ymax - y0) / sy)))
        py1 = min(self.base.height, int(math.ceil((ymin - y0) / sy)))
        if px0 >= px1 or py0 >= py1:
            return
        ty, tx = self.tile_shape
        for y in range(py0 // ty, (py1 - 1) // ty + 1):
            for x in range(px0 // tx, (px1 - 1) // tx + 1):
                yield (y, x)


# --------------------------------------------------------------------------
# Band metadata / sources / load params (reference loader/types.py:11-139)
# --------------------------------------------------------------------------

BandKey = Tuple[str, int]  # (asset name, 1-based band index) — model.py:26-27


@dataclass(frozen=True)
class RasterBandMetadata:
    """reference loader/types.py:11-37; defaults BAND_DEFAULTS :160."""

    data_type: Optional[str] = "float32"
    nodata: Optional[float] = None
    unit: str = "1"


def norm_band_metadata(v, fallback: Optional["RasterBandMetadata"] = None):
    """dict/RasterBandMetadata → RasterBandMetadata with fallback fill
    (reference norm_band_metadata, loader/types.py + model.py:445-451)."""
    if isinstance(v, RasterBandMetadata):
        return v
    fb = fallback or RasterBandMetadata()
    return RasterBandMetadata(
        data_type=v.get("data_type", fb.data_type),
        nodata=v.get("nodata", fb.nodata),
        unit=v.get("unit", fb.unit),
    )


@dataclass(frozen=True)
class MDParseConfig:
    """Per-collection item-parsing config (reference model.py:417-442):
    explicit band metadata overrides, asset aliases, proj-extension
    opt-out. Build from the user's ``stac_cfg`` dict with
    :meth:`from_dict`; apply by passing ``cfg=`` to
    ``parse_items``/``extract_collection_metadata``."""

    band_defaults: RasterBandMetadata = field(default_factory=RasterBandMetadata)
    band_cfg: dict = field(default_factory=dict)  # asset name -> RasterBandMetadata
    aliases: dict = field(default_factory=dict)  # alias -> BandKey
    ignore_proj: bool = False

    @staticmethod
    def from_dict(collection_id: str, cfg: Optional[dict]) -> "MDParseConfig":
        """``cfg`` maps collection id (or ``"*"``) → config; the
        collection entry's top-level keys replace the wildcard's
        wholesale (reference MDParseConfig.from_dict, model.py:426-442)."""
        cfg = cfg or {}
        _cfg = dict(cfg.get("*", {}))
        _cfg.update(cfg.get(collection_id, {}))
        assets = _cfg.get("assets", {})
        band_defaults = norm_band_metadata(assets.get("*", {}))
        band_cfg = {
            k: norm_band_metadata(v, band_defaults)
            for k, v in assets.items()
            if k != "*"
        }
        aliases = {
            alias: ((band, 1) if isinstance(band, str) else tuple(band))
            for alias, band in _cfg.get("aliases", {}).items()
        }
        return MDParseConfig(
            band_defaults=band_defaults,
            band_cfg=band_cfg,
            aliases=aliases,
            ignore_proj=bool(_cfg.get("ignore_proj", False)),
        )


@dataclass(frozen=True)
class RasterSource:
    """reference loader/types.py:40-70."""

    uri: str
    band: int = 1
    subdataset: Optional[str] = None
    geobox: Optional[GeoBox] = None
    meta: Optional[RasterBandMetadata] = None

    def strip(self) -> "RasterSource":
        """Drop geobox+meta before shipping (loader/types.py:61-67)."""
        return replace(self, geobox=None, meta=None)


@dataclass(frozen=True)
class RasterLoadParams:
    """reference loader/types.py:77-139."""

    dtype: Optional[str] = None
    fill_value: Optional[float] = None
    src_nodata_fallback: Optional[float] = None
    src_nodata_override: Optional[float] = None
    use_overviews: bool = True
    resampling: str = "nearest"
    fail_on_error: bool = True

    @staticmethod
    def same_as(src: "RasterBandMetadata | RasterSource") -> "RasterLoadParams":
        meta = src.meta if isinstance(src, RasterSource) else src
        if meta is None:
            return RasterLoadParams()
        return RasterLoadParams(dtype=meta.data_type, fill_value=meta.nodata)


# --------------------------------------------------------------------------
# nodata / dtype resolution kernel (reference loader/_reader.py:20-134;
# SURVEY F3-F7). Single implementation shared by planner + mosaic UDF.
# --------------------------------------------------------------------------


def resolve_src_nodata(file_nodata: Optional[float], cfg: RasterLoadParams) -> Optional[float]:
    """override → file value → fallback (loader/_reader.py:68-75)."""
    if cfg.src_nodata_override is not None:
        return cfg.src_nodata_override
    if file_nodata is not None:
        return file_nodata
    return cfg.src_nodata_fallback


def resolve_dst_dtype(src_dtype: str, cfg: RasterLoadParams) -> np.dtype:
    """cfg dtype else source dtype (loader/_reader.py:78-81)."""
    return np.dtype(cfg.dtype) if cfg.dtype is not None else np.dtype(src_dtype)


def resolve_dst_nodata(
    dst_dtype: np.dtype, cfg: RasterLoadParams, src_nodata: Optional[float]
) -> Optional[float]:
    """fill_value → NaN for float dst → src nodata → None
    (loader/_reader.py:84-101)."""
    if cfg.fill_value is not None:
        return dst_dtype.type(cfg.fill_value)
    if dst_dtype.kind == "f":
        return float("nan")
    if src_nodata is not None:
        return dst_dtype.type(src_nodata)
    return None


def nodata_mask(pix: np.ndarray, nodata: Optional[float]) -> np.ndarray:
    """floats: isnan | ==nodata; ints: ==nodata; else none missing
    (loader/_reader.py:127-134)."""
    if pix.dtype.kind == "f":
        if nodata is None or math.isnan(nodata):
            return np.isnan(pix)
        return np.isnan(pix) | (pix == nodata)
    if nodata is None:
        return np.zeros(pix.shape, dtype=bool)
    return pix == nodata


def same_nodata(a: Optional[float], b: Optional[float]) -> bool:
    """NaN-aware nodata equality (loader/_reader.py:117-124)."""
    if a is None or b is None:
        return a is b
    if math.isnan(a):
        return math.isnan(b)
    return a == b


def pick_overview(shrink: int, overviews: Sequence[int]) -> Optional[int]:
    """largest overview index with decimation ≤ shrink
    (loader/_reader.py:104-114)."""
    best = None
    for i, ovr in enumerate(overviews):
        if ovr <= shrink:
            best = i
    return best


# --------------------------------------------------------------------------
# Collection metadata + alias resolution (reference model.py:33-190)
# --------------------------------------------------------------------------


@dataclass
class RasterCollectionMetadata(Mapping):
    """Inferred collection schema: bands, alias map, grid membership
    (reference model.py:33-190)."""

    name: str
    bands: dict  # BandKey -> RasterBandMetadata
    aliases: dict = field(default_factory=dict)  # alias -> [BandKey,...]
    has_proj: bool = True
    band2grid: dict = field(default_factory=dict)  # band name -> grid name

    def canonical_name(self, query: str) -> BandKey:
        """alias/name/'asset.idx' → BandKey; ambiguity = first candidate
        (reference model.py:118-164)."""
        key = norm_key(query)
        if key in self.bands:
            return key
        cands = self.aliases.get(query)
        if cands:
            return cands[0]
        raise ValueError(f"unknown band: {query!r}")

    def resolve_bands(self, bands=None) -> dict:
        if bands is None:
            return dict(self.bands)
        if isinstance(bands, str):
            bands = [bands]
        return {self.canonical_name(b): self.bands[self.canonical_name(b)] for b in bands}

    def __getitem__(self, k):
        return self.bands[self.canonical_name(k) if isinstance(k, str) else k]

    def __iter__(self):
        return iter(self.bands)

    def __len__(self):
        return len(self.bands)


def norm_key(key) -> BandKey:
    """'band' → (band, 1); 'band.3' → (band, 3) (reference model.py:461-472)."""
    if isinstance(key, tuple):
        return key
    if "." in key:
        name, _, idx = key.rpartition(".")
        try:
            return (name, int(idx))
        except ValueError:
            return (key, 1)
    return (key, 1)


def band_display_name(key: BandKey) -> str:
    """BandKey → display name (reference model.py:99-112)."""
    name, idx = key
    return name if idx == 1 else f"{name}.{idx}"


# --------------------------------------------------------------------------
# solar-time adjustment (reference model.py:454-458)
# --------------------------------------------------------------------------


def solar_offset_seconds(longitude: float) -> int:
    """whole-hour offset: int(lon/15)*3600, truncation toward zero."""
    return int(longitude / 15) * 3600
