"""Coordinate transforms without pyproj: WGS84 geographic ↔ UTM
(EPSG:4326 ↔ EPSG:326xx/327xx) via the Krüger/transverse-Mercator series
(public standard formulation, 3rd order in n — max error well under 1 mm
inside a UTM zone's normal extent, verified by round-trip tests).

Scope: exactly the CRS pairs the reference's own scenarios use (Sentinel-2
tiles are UTM, queries arrive in lat/lon — bench/_prepare.py bboxes are
4326, outputs epsg:32735). Anything beyond WGS84/UTM raises — that is the
pyproj/rasterio slot. All functions are vectorized numpy, executor-safe.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

_A = 6378137.0  # WGS84 semi-major
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E0 = 500000.0
_N = _F / (2.0 - _F)  # third flattening

_n = _N
# rectifying radius
_ABAR = _A / (1 + _n) * (1 + _n**2 / 4 + _n**4 / 64)
# forward series (Krüger alpha), 3rd order
_ALPHA = (
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16,
    13 * _n**2 / 48 - 3 * _n**3 / 5,
    61 * _n**3 / 240,
)
# inverse series (Krüger beta)
_BETA = (
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96,
    _n**2 / 48 + _n**3 / 15,
    17 * _n**3 / 480,
)
# conformal → geographic latitude series
_DELTA = (
    2 * _n - 2 * _n**2 / 3 - 2 * _n**3,
    7 * _n**2 / 3 - 8 * _n**3 / 5,
    56 * _n**3 / 15,
)
_E2SQRT = 2 * math.sqrt(_n) / (1 + _n)


def parse_utm(crs: str) -> Tuple[int, bool]:
    """EPSG:326xx → (zone, north), EPSG:327xx → (zone, south)."""
    code = int(crs.upper().replace("EPSG:", ""))
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    raise NotImplementedError(
        f"{crs}: only WGS84 UTM (EPSG:326xx/327xx) and EPSG:4326 supported "
        "without pyproj"
    )


def _zone_lon0(zone: int) -> float:
    return math.radians(zone * 6 - 183)


def geographic_to_utm(lon, lat, zone: int, north: bool):
    """(lon, lat) degrees → UTM (x, y) metres. Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    dlam = np.radians(lon) - _zone_lon0(zone)
    s = np.sin(phi)
    # conformal latitude
    t = np.sinh(np.arctanh(s) - _E2SQRT * np.arctanh(_E2SQRT * s))
    xi_p = np.arctan2(t, np.cos(dlam))
    eta_p = np.arcsinh(np.sin(dlam) / np.hypot(t, np.cos(dlam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    x = _E0 + _K0 * _ABAR * eta
    y = _K0 * _ABAR * xi
    if not north:
        y = y + 10000000.0
    return x, y


def utm_to_geographic(x, y, zone: int, north: bool):
    """UTM (x, y) metres → (lon, lat) degrees. Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if not north:
        y = y - 10000000.0
    xi = y / (_K0 * _ABAR)
    eta = (x - _E0) / (_K0 * _ABAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, d in enumerate(_DELTA, start=1):
        phi += d * np.sin(2 * j * chi)
    lam = _zone_lon0(zone) + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lam), np.degrees(phi)


def geographic_to_webmercator(lon, lat):
    """(lon, lat) degrees → EPSG:3857 spherical-Mercator metres (the
    public web-tile formulation; sphere of radius a, lat clamped to the
    projection's ±85.051129° validity band)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128779807, 85.051128779807)
    x = _A * np.radians(lon)
    y = _A * np.log(np.tan(np.pi / 4 + np.radians(lat) / 2))
    return x, y


def webmercator_to_geographic(x, y):
    """EPSG:3857 metres → (lon, lat) degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / _A)
    lat = np.degrees(2 * np.arctan(np.exp(y / _A)) - np.pi / 2)
    return lon, lat


def _to_geographic(x, y, crs: str):
    if crs == "EPSG:4326":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if crs == "EPSG:3857":
        return webmercator_to_geographic(x, y)
    zone, north = parse_utm(crs)
    return utm_to_geographic(x, y, zone, north)


def _from_geographic(lon, lat, crs: str):
    if crs == "EPSG:4326":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if crs == "EPSG:3857":
        return geographic_to_webmercator(lon, lat)
    zone, north = parse_utm(crs)
    return geographic_to_utm(lon, lat, zone, north)


def transform(x, y, src_crs: str, dst_crs: str):
    """World coords src_crs → dst_crs (WGS84 geographic / UTM /
    Web-Mercator), hub-and-spoke through geographic."""
    src = src_crs.upper()
    dst = dst_crs.upper()
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    lon, lat = _to_geographic(x, y, src)
    return _from_geographic(lon, lat, dst)


def can_transform(src_crs: str, dst_crs: str) -> bool:
    for crs in (src_crs, dst_crs):
        if crs.upper() in ("EPSG:4326", "EPSG:3857"):
            continue
        try:
            parse_utm(crs)
        except NotImplementedError:
            return False
    return True
