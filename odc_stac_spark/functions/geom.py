"""Planar polygon geometry from scratch — P4 geometry normalization.

The reference normalizes ``geopolygon=`` inputs through odc-geo/shapely
(``_normalize_geometry``, _mdtools.py:768-788) and uses the polygon for
output-extent computation and item/tile intersection. This container has
no shapely, so the needed subset is re-implemented on numpy: a CRS-tagged
:class:`Polygon` (exterior ring + optional holes, MultiPolygon flattened
to rings) with

- vectorized even-odd (crossing-number) membership — rasterizing an AOI
  over a GeoBox is a handful of fused numpy expressions per ring edge,
  never per-pixel Python;
- bbox intersection tests (vertex-in-box, box-corner-in-polygon, edge
  crossing) for tile pruning;
- CRS transforms via densified edges through :mod:`..functions.proj`
  (the reference's N=100 perimeter densification, model.py:271-299).

Only planar semantics are implemented (the reference likewise treats
rings as planar in the query CRS); winding order is irrelevant under the
even-odd rule, and holes are just additional rings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence, Tuple

import numpy as np


def _norm_ring(ring) -> np.ndarray:
    """(N,2) float64, closed (last point == first point)."""
    r = np.asarray(ring, dtype=np.float64)
    if r.ndim != 2 or r.shape[1] < 2:
        raise ValueError("ring must be a sequence of (x, y) points")
    r = r[:, :2]
    if len(r) < 3:
        raise ValueError("ring needs at least 3 points")
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


@dataclass(frozen=True, eq=False)
class Polygon:
    """Rings in one CRS; ``rings[0]`` is the exterior, the rest holes (or
    further exteriors of a flattened MultiPolygon — the even-odd rule
    handles both identically)."""

    rings: Tuple[np.ndarray, ...]
    crs: str = "EPSG:4326"

    def __init__(self, rings: Sequence, crs: str = "EPSG:4326"):
        object.__setattr__(self, "rings", tuple(_norm_ring(r) for r in rings))
        object.__setattr__(self, "crs", crs)
        if not self.rings:
            raise ValueError("polygon needs at least one ring")

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_geojson(geom, crs: str = "EPSG:4326") -> "Polygon":
        """GeoJSON Polygon/MultiPolygon dict (or ``__geo_interface__``
        object) → Polygon; CRS defaults to EPSG:4326 exactly as the
        reference assumes for bare GeoJSON (_mdtools.py:782-785)."""
        geo = getattr(geom, "__geo_interface__", None)
        if geo is not None:
            geom = geo
        if not isinstance(geom, dict):
            raise ValueError("expected a GeoJSON-style dict")
        gtype = geom.get("type")
        coords = geom.get("coordinates")
        if gtype == "Polygon":
            return Polygon(coords, crs)
        if gtype == "MultiPolygon":
            return Polygon([ring for poly in coords for ring in poly], crs)
        raise ValueError(f"unsupported GeoJSON geometry type: {gtype!r}")

    @staticmethod
    def from_bbox(
        bbox: Tuple[float, float, float, float], crs: str = "EPSG:4326"
    ) -> "Polygon":
        xmin, ymin, xmax, ymax = bbox
        return Polygon(
            [[(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]], crs
        )

    # -- basic properties --------------------------------------------------

    @property
    def bounds(self) -> Tuple[float, float, float, float]:
        pts = np.vstack(self.rings)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    @property
    def __geo_interface__(self) -> dict:
        return {
            "type": "Polygon",
            "coordinates": [r.tolist() for r in self.rings],
        }

    @property
    def area(self) -> float:
        """Shoelace area: exterior minus holes under even-odd (holes wind
        opposite or not — use absolute per-ring area with the first ring
        positive and the rest subtracted)."""
        total = 0.0
        for i, r in enumerate(self.rings):
            x, y = r[:-1, 0], r[:-1, 1]
            xn, yn = r[1:, 0], r[1:, 1]
            a = abs(float(np.sum(x * yn - xn * y)) / 2.0)
            total += a if i == 0 else -a
        return total

    # -- membership --------------------------------------------------------

    def contains(self, xs, ys) -> np.ndarray:
        """Even-odd membership for point arrays (any broadcastable shape).
        Boundary points are not guaranteed either way (standard crossing-
        number caveat) — callers quantizing pixel centers avoid exact
        edge hits by construction."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        xs, ys = np.broadcast_arrays(xs, ys)
        inside = np.zeros(xs.shape, dtype=bool)
        for ring in self.rings:
            x1, y1 = ring[:-1, 0], ring[:-1, 1]
            x2, y2 = ring[1:, 0], ring[1:, 1]
            for i in range(len(x1)):
                if y1[i] == y2[i]:
                    continue  # horizontal edge never crossed by a ray
                crosses = (y1[i] > ys) != (y2[i] > ys)
                if not crosses.any():
                    continue
                xint = x1[i] + (ys - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
                inside ^= crosses & (xs < xint)
        return inside

    def rasterize(self, gbox) -> np.ndarray:
        """Boolean mask over a GeoBox (pixel-center membership); the
        polygon must already be in ``gbox.crs`` (use :meth:`to_crs`)."""
        if self.crs != gbox.crs:
            raise ValueError(
                f"polygon crs {self.crs!r} != geobox crs {gbox.crs!r}; "
                "call to_crs() first"
            )
        sx, _, x0, _, sy, y0 = gbox.transform
        xs = x0 + sx * (np.arange(gbox.shape[1]) + 0.5)
        ys = y0 + sy * (np.arange(gbox.shape[0]) + 0.5)
        return self.contains(xs[None, :], ys[:, None])

    # -- intersection ------------------------------------------------------

    def intersects_bbox(self, bbox: Tuple[float, float, float, float]) -> bool:
        """Polygon ∩ axis-aligned box ≠ ∅: any vertex inside the box, any
        box corner inside the polygon, or any edge pair crossing."""
        xmin, ymin, xmax, ymax = bbox
        pxmin, pymin, pxmax, pymax = self.bounds
        if pxmax < xmin or pxmin > xmax or pymax < ymin or pymin > ymax:
            return False
        for r in self.rings:
            if (
                (r[:, 0] >= xmin) & (r[:, 0] <= xmax)
                & (r[:, 1] >= ymin) & (r[:, 1] <= ymax)
            ).any():
                return True
        cx = np.array([xmin, xmax, xmax, xmin])
        cy = np.array([ymin, ymin, ymax, ymax])
        if self.contains(cx, cy).any():
            return True
        box = np.array(
            [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax), (xmin, ymin)]
        )
        for r in self.rings:
            for i in range(len(r) - 1):
                for j in range(4):
                    if _segments_cross(r[i], r[i + 1], box[j], box[j + 1]):
                        return True
        return False

    # -- reprojection ------------------------------------------------------

    def to_crs(self, dst_crs: str, points_per_edge: int = 25) -> "Polygon":
        """Transform rings with per-edge densification so curved images of
        straight edges are followed (reference safe-geometry densify)."""
        if dst_crs == self.crs:
            return self
        from . import proj

        new_rings = []
        t01 = np.linspace(0.0, 1.0, points_per_edge, endpoint=False)
        for r in self.rings:
            xs = (r[:-1, 0, None] + (r[1:, 0, None] - r[:-1, 0, None]) * t01).ravel()
            ys = (r[:-1, 1, None] + (r[1:, 1, None] - r[:-1, 1, None]) * t01).ravel()
            tx, ty = proj.transform(xs, ys, self.crs, dst_crs)
            new_rings.append(np.column_stack([tx, ty]))
        return Polygon(new_rings, dst_crs)


def _segments_cross(p1, p2, p3, p4) -> bool:
    """Proper + collinear-overlap segment intersection via orientations."""

    def orient(a, b, c) -> float:
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    def on_seg(a, b, c) -> bool:
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    d1 = orient(p3, p4, p1)
    d2 = orient(p3, p4, p2)
    d3 = orient(p1, p2, p3)
    d4 = orient(p1, p2, p4)
    if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) and d1 != d2 and d3 != d4:
        return True
    if d1 == 0 and on_seg(p3, p4, p1):
        return True
    if d2 == 0 and on_seg(p3, p4, p2):
        return True
    if d3 == 0 and on_seg(p1, p2, p3):
        return True
    if d4 == 0 and on_seg(p1, p2, p4):
        return True
    return False


def normalize_geometry(geom, crs: str = "EPSG:4326") -> Polygon:
    """P4 entry point mirroring the reference's ``_normalize_geometry``
    (_mdtools.py:768-788): Polygon passes through; GeoJSON dicts and
    ``__geo_interface__`` objects parse with an assumed-4326 CRS; a bare
    bbox 4-tuple becomes its rectangle."""
    if isinstance(geom, Polygon):
        return geom
    if (
        isinstance(geom, (tuple, list))
        and len(geom) == 4
        and all(isinstance(v, (int, float)) for v in geom)
    ):
        return Polygon.from_bbox(tuple(geom), crs)
    return Polygon.from_geojson(geom, crs)
