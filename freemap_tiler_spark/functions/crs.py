"""Pluggable CRS transforms for the warp (the reference's PROJ-pipeline
knob, src/warp.rs:22-77 / src/main.rs:154-162, re-expressed offline).

No PROJ in this container, so transforms are pure-numpy implementations of
published projection formulas (Snyder, "Map Projections — A Working
Manual", USGS PP 1395: Transverse Mercator eqs 8-9..8-17 and 4-20..4-32).
A transform pair is registered by name:

    register_crs("EPSG:32633", to_merc=fn, from_merc=fn)

- ``from_merc(mx, my) -> (X, Y)``: WebMercator meters -> source CRS coords
  (used per target-pixel-center during the warp's inverse mapping);
- ``to_merc(X, Y) -> (mx, my)``: source coords -> WebMercator (used to
  bbox a block for tile-cover enumeration, with edge densification).

WGS84 UTM zones (EPSG:326xx north / 327xx south) auto-register on lookup.
Non-axis-aligned transforms make the inverse map non-separable, so the
warp samples them through its generic 2-D path.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np

from freemap_tiler_spark.functions import mercator

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996


def _m_arc(lat: np.ndarray) -> np.ndarray:
    """Meridional arc length from equator (Snyder 3-21)."""
    e2, e4, e6 = _E2, _E2 ** 2, _E2 ** 3
    return _A * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * lat
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * lat)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * lat)
        - (35 * e6 / 3072) * np.sin(6 * lat)
    )


def tm_forward(
    lon_deg: np.ndarray, lat_deg: np.ndarray, lon0_deg: float,
    k0: float = _K0, false_e: float = 500_000.0, false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal Transverse Mercator forward (Snyder 8-9..8-13)."""
    lat = np.radians(np.asarray(lat_deg, float))
    lon = np.radians(np.asarray(lon_deg, float))
    lon0 = math.radians(lon0_deg)
    sin_l, cos_l, tan_l = np.sin(lat), np.cos(lat), np.tan(lat)
    n = _A / np.sqrt(1 - _E2 * sin_l ** 2)
    t = tan_l ** 2
    c = _EP2 * cos_l ** 2
    a_ = (lon - lon0) * cos_l
    m = _m_arc(lat)
    x = k0 * n * (
        a_ + (1 - t + c) * a_ ** 3 / 6
        + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2) * a_ ** 5 / 120
    )
    y = k0 * (
        m + n * tan_l * (
            a_ ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * a_ ** 4 / 24
            + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2) * a_ ** 6 / 720
        )
    )
    return x + false_e, y + false_n


def tm_inverse(
    x: np.ndarray, y: np.ndarray, lon0_deg: float,
    k0: float = _K0, false_e: float = 500_000.0, false_n: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Ellipsoidal Transverse Mercator inverse (Snyder 8-17..8-25)."""
    x = np.asarray(x, float) - false_e
    y = np.asarray(y, float) - false_n
    m = y / k0
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    lat1 = (
        mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * np.sin(2 * mu)
        + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * np.sin(4 * mu)
        + (151 * e1 ** 3 / 96) * np.sin(6 * mu)
        + (1097 * e1 ** 4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(lat1), np.cos(lat1), np.tan(lat1)
    c1 = _EP2 * cos1 ** 2
    t1 = tan1 ** 2
    n1 = _A / np.sqrt(1 - _E2 * sin1 ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * sin1 ** 2) ** 1.5
    d = x / (n1 * k0)
    lat = lat1 - (n1 * tan1 / r1) * (
        d ** 2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2) * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2 - 3 * c1 ** 2)
        * d ** 6 / 720
    )
    lon = math.radians(lon0_deg) + (
        d - (1 + 2 * t1 + c1) * d ** 3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2 + 24 * t1 ** 2)
        * d ** 5 / 120
    ) / cos1
    return np.degrees(lon), np.degrees(lat)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

Transform = Callable[[np.ndarray, np.ndarray], tuple[np.ndarray, np.ndarray]]
_REGISTRY: dict[str, tuple[Transform, Transform]] = {}


def register_crs(name: str, to_merc: Transform, from_merc: Transform) -> None:
    """Register a custom CRS pair (the PROJ-pipeline hook)."""
    _REGISTRY[name] = (to_merc, from_merc)


def _utm_pair(zone: int, south: bool) -> tuple[Transform, Transform]:
    lon0 = zone * 6.0 - 183.0
    fn_n = 10_000_000.0 if south else 0.0

    def to_merc(X, Y):
        lon, lat = tm_inverse(X, Y, lon0, false_n=fn_n)
        return mercator.np_lonlat_to_merc(np.asarray(lon), np.clip(lat, -85.06, 85.06))

    def from_merc(mx, my):
        lon = np.degrees(np.asarray(mx, float) / mercator.R)
        lat = np.degrees(
            2.0 * np.arctan(np.exp(np.asarray(my, float) / mercator.R)) - np.pi / 2.0
        )
        return tm_forward(lon, lat, lon0, false_n=fn_n)

    return to_merc, from_merc


def _tmerc_pair(
    lon0: float, lat0: float, k0: float, x0: float, y0: float
) -> tuple[Transform, Transform]:
    """Generic Transverse Mercator pair from PROJ-style parameters.
    lat_0 != 0 folds into the false northing via the meridional arc
    (y = k0*(M - M0) + y_0, Snyder 8-9 with an origin-latitude offset)."""
    m0 = float(_m_arc(np.asarray([math.radians(lat0)]))[0]) if lat0 else 0.0
    fn = y0 - k0 * m0

    def to_merc(X, Y):
        lon, lat = tm_inverse(X, Y, lon0, k0=k0, false_e=x0, false_n=fn)
        return mercator.np_lonlat_to_merc(np.asarray(lon), np.clip(lat, -85.06, 85.06))

    def from_merc(mx, my):
        lon = np.degrees(np.asarray(mx, float) / mercator.R)
        lat = np.degrees(
            2.0 * np.arctan(np.exp(np.asarray(my, float) / mercator.R)) - np.pi / 2.0
        )
        return tm_forward(lon, lat, lon0, k0=k0, false_e=x0, false_n=fn)

    return to_merc, from_merc


def parse_proj_pipeline(proj: str) -> str:
    """Common `+proj=...` pipeline strings -> a CRS name this registry
    resolves (the reference accepts a PROJ pipeline via --transform-
    pipeline, src/args.rs:36-38 / src/warp.rs:22-77).  Supported:
    longlat/latlong (-> EPSG:4326), webmerc/3857-style merc, utm
    (+zone, +south), and general tmerc (+lon_0 +lat_0 +k/+k_0 +x_0
    +y_0) — the WGS84-ellipsoid forms the tiler's sources use.  tmerc
    strings register their transform pair under the normalized string
    and return it."""
    kv: dict[str, str | bool] = {}
    for tok in proj.split():
        tok = tok.lstrip("+")
        if not tok:
            continue
        k, _, v = tok.partition("=")
        kv[k] = v if v else True
    p = kv.get("proj")
    if p in ("longlat", "latlong", "lonlat"):
        return "EPSG:4326"
    if p == "webmerc" or (
        p == "merc" and kv.get("a") == "6378137" and kv.get("b") == "6378137"
    ):
        return "EPSG:3857"
    if p == "utm":
        zone = int(str(kv.get("zone", 0)))
        if not 1 <= zone <= 60:
            raise ValueError(f"utm pipeline needs +zone=1..60: {proj!r}")
        return f"EPSG:{327 if kv.get('south') else 326}{zone:02d}"
    if p == "tmerc":
        lon0 = float(str(kv.get("lon_0", 0.0)))
        lat0 = float(str(kv.get("lat_0", 0.0)))
        k0 = float(str(kv.get("k", kv.get("k_0", 1.0))))
        x0 = float(str(kv.get("x_0", 0.0)))
        y0 = float(str(kv.get("y_0", 0.0)))
        name = (f"+proj=tmerc +lat_0={lat0!r} +lon_0={lon0!r} +k={k0!r} "
                f"+x_0={x0!r} +y_0={y0!r}")
        if name not in _REGISTRY:
            _REGISTRY[name] = _tmerc_pair(lon0, lat0, k0, x0, y0)
        return name
    raise ValueError(
        f"unsupported PROJ pipeline {proj!r}: longlat/webmerc/utm/tmerc "
        f"forms are parsed; register_crs(...) covers anything else"
    )


def normalize_crs(name: str) -> str:
    """Canonical registry name for ``name``: `+proj=...` strings parse to
    their EPSG/tmerc-registered equivalent, everything else passes
    through — so string comparisons against 'EPSG:4326'/'EPSG:3857'
    route pipeline spellings onto the native separable warp paths."""
    return parse_proj_pipeline(name) if name.startswith("+") else name


def lookup_crs(name: str) -> tuple[Transform, Transform] | None:
    """Resolve a registered (or auto-registrable) CRS pair; None if the
    warp should use its separable native paths (3857/4326).  Accepts
    EPSG names, previously-registered custom names, and `+proj=...`
    pipeline strings (parse_proj_pipeline)."""
    name = normalize_crs(name)
    if name in ("EPSG:3857", "EPSG:4326"):
        return None
    if name not in _REGISTRY and name.startswith("EPSG:"):
        code = name[5:]
        if len(code) == 5 and code[:3] in ("326", "327") and code[3:].isdigit():
            zone = int(code[3:])
            if 1 <= zone <= 60:
                _REGISTRY[name] = _utm_pair(zone, south=code[:3] == "327")
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown CRS {name!r}: supported natively EPSG:3857/4326, "
            f"auto EPSG:326xx/327xx (UTM), or register_crs(...) a custom pair"
        )
    return _REGISTRY[name]


def densified_merc_bbox(
    to_merc: Transform, x0: float, y0: float, x1: float, y1: float, n: int = 21
) -> tuple[float, float, float, float]:
    """3857 bbox of a source-CRS rectangle, sampling n points per edge
    (curved edges under reprojection — transform_bounds-style densify)."""
    ts = np.linspace(0.0, 1.0, n)
    xs = np.concatenate([
        x0 + (x1 - x0) * ts, np.full(n, x1), x0 + (x1 - x0) * ts, np.full(n, x0),
    ])
    ys = np.concatenate([
        np.full(n, y0), y0 + (y1 - y0) * ts, np.full(n, y1), y0 + (y1 - y0) * ts,
    ])
    mx, my = to_merc(xs, ys)
    return float(mx.min()), float(my.min()), float(mx.max()), float(my.max())
