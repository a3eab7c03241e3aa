"""Coordinate transforms without pyproj: WGS84 geographic ↔ UTM
(EPSG:4326 ↔ EPSG:326xx/327xx) via the Krüger/transverse-Mercator series
(public standard formulation, 3rd order in n — max error well under 1 mm
inside a UTM zone's normal extent, verified by round-trip tests).

Scope: the CRS families odc catalogs actually use — WGS84 geographic,
UTM (Sentinel-2/Landsat tiles), Web-Mercator (EPSG:3857 web grids),
Albers equal-area conic (EPSG:3577 Australian national grid — the
opendatacube default — plus 5070/3310), and the MODIS sinusoidal sphere
(ESRI:54008). Anything else raises — that is the pyproj/rasterio slot.
All functions are vectorized numpy, executor-safe.
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


# ---- Albers equal-area conic (ellipsoidal, Snyder's public formulation) --
# The workhorse CRS of continental ODC deployments (EPSG:3577 is the
# Australian national grid the opendatacube ecosystem defaults to).
# Datum shifts GDA94/NAD83↔WGS84 are treated as identity (metre-level,
# standard practice for raster work at these scales).

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101

#: EPSG → (a, f, lat1, lat2, lat0, lon0, false_easting, false_northing)
_ALBERS_PARAMS = {
    "EPSG:3577": (_GRS80_A, _GRS80_F, -18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
    "EPSG:5070": (_GRS80_A, _GRS80_F, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    "EPSG:3310": (_GRS80_A, _GRS80_F, 34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0),
}


def _albers_setup(crs: str):
    a, f, lat1, lat2, lat0, lon0, fe, fn = _ALBERS_PARAMS[crs]
    e2 = 2 * f - f * f
    e = math.sqrt(e2)

    def q_of(phi):
        s = np.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    def m_of(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e2 * s * s)

    p1, p2, p0 = map(math.radians, (lat1, lat2, lat0))
    m1, m2 = m_of(p1), m_of(p2)
    q1, q2 = float(q_of(p1)), float(q_of(p2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * float(q_of(p0))) / n
    return a, e, e2, math.radians(lon0), fe, fn, n, C, rho0, q_of


def geographic_to_albers(lon, lat, crs: str):
    a, e, e2, lam0, fe, fn, n, C, rho0, q_of = _albers_setup(crs)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    q = q_of(phi)
    rho = a * np.sqrt(C - n * q) / n
    theta = n * (lam - lam0)
    return fe + rho * np.sin(theta), fn + rho0 - rho * np.cos(theta)


def albers_to_geographic(x, y, crs: str):
    a, e, e2, lam0, fe, fn, n, C, rho0, _ = _albers_setup(crs)
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.hypot(xp, yp)
    # for n<0 (southern standard parallels) rho and the angle flip sign
    sgn = 1.0 if n >= 0 else -1.0
    theta = np.arctan2(sgn * xp, sgn * yp)
    q = (C - (rho * n / a) ** 2) / n
    lam = lam0 + theta / n
    # iterate Snyder 3-16 for phi from q
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _i in range(8):
        s = np.sin(phi)
        phi = phi + (1 - e2 * s * s) ** 2 / (2 * np.cos(phi)) * (
            q / (1 - e2)
            - s / (1 - e2 * s * s)
            + (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )
    return np.degrees(lam), np.degrees(phi)


# ---- sinusoidal (MODIS grid: sphere R=6371007.181, ESRI:54008) -----------

_SINU_R = 6371007.181
_SINU_CODES = ("ESRI:54008", "SR-ORG:6974", "SINUSOIDAL")


def geographic_to_sinusoidal(lon, lat):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    return _SINU_R * lam * np.cos(phi), _SINU_R * phi


def sinusoidal_to_geographic(x, y):
    phi = np.asarray(y, dtype=np.float64) / _SINU_R
    lam = np.asarray(x, dtype=np.float64) / (_SINU_R * np.cos(phi))
    return np.degrees(lam), np.degrees(phi)


def _to_geographic(x, y, crs: str):
    if crs == "EPSG:4326":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if crs == "EPSG:3857":
        return webmercator_to_geographic(x, y)
    if crs in _ALBERS_PARAMS:
        return albers_to_geographic(x, y, crs)
    if crs in _SINU_CODES:
        return sinusoidal_to_geographic(x, y)
    zone, north = parse_utm(crs)
    return utm_to_geographic(x, y, zone, north)


def _from_geographic(lon, lat, crs: str):
    if crs == "EPSG:4326":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if crs == "EPSG:3857":
        return geographic_to_webmercator(lon, lat)
    if crs in _ALBERS_PARAMS:
        return geographic_to_albers(lon, lat, crs)
    if crs in _SINU_CODES:
        return geographic_to_sinusoidal(lon, lat)
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
        u = crs.upper()
        if u in ("EPSG:4326", "EPSG:3857") or u in _ALBERS_PARAMS or u in _SINU_CODES:
            continue
        try:
            parse_utm(crs)
        except NotImplementedError:
            return False
    return True
