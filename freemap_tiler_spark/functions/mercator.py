"""Web-Mercator (EPSG:3857) math: forward/inverse projection and tile bounds.

Replaces the reference's PROJ-based CRS transforms (src/main.rs:154-169,
src/geojson.rs:44-55, src/warp.rs:15-99) with the closed-form spherical
Web-Mercator formulas (the only target CRS the reference's tile grid uses):

    x = R * lon_rad
    y = R * ln(tan(pi/4 + lat_rad/2))

and tile bounds (src/main.rs:185, src/processor.rs:339-342 semantics):

    world extent = +/- pi * R = +/- 20037508.342789244 m
    tile span at zoom z = 2 * pi * R / 2^z

Both numpy kernels (for pandas UDFs / oracles) and Spark Column expressions
(JVM-side, codegen-friendly) are provided; plus the exact SQL-text twins used
by the DuckDB oracle so correctness is checked end-to-end.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

R = 6378137.0
ORIGIN = math.pi * R  # 20037508.342789244
WORLD = 2.0 * ORIGIN


# ---------------------------------------------------------------------------
# numpy
# ---------------------------------------------------------------------------

def np_lonlat_to_merc(lon, lat) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = R * np.radians(lon)
    y = R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def np_merc_to_lonlat(x, y) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / R)) - np.pi / 2.0)
    return lon, lat


def np_lonlat_to_tile(lon, lat, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """XYZ tile indices (y grows southward) at ``zoom`` for lon/lat degrees.

    Matches the slippy-map standard: tx = floor(2^z * (lon+180)/360),
    ty = floor(2^z * (1 - asinh(tan(lat))/pi) / 2); clamped to [0, 2^z-1].
    """
    n = np.int64(1) << zoom
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    tx = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    lat_r = np.radians(lat)
    ty = np.floor((1.0 - np.arcsinh(np.tan(lat_r)) / np.pi) / 2.0 * n).astype(np.int64)
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def np_tile_bounds(z, x, y, size: float = WORLD) -> tuple[np.ndarray, ...]:
    """EPSG:3857 (min_x, min_y, max_x, max_y) of a tile (src/main.rs:185)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    span = size / (np.int64(1) << z).astype(np.float64)
    min_x = x * span - size / 2.0
    max_y = size / 2.0 - y * span
    return min_x, max_y - span, min_x + span, max_y


# ---------------------------------------------------------------------------
# Spark Columns
# ---------------------------------------------------------------------------

def _c(v) -> Column:
    return v if isinstance(v, Column) else F.col(v)


def merc_x(lon) -> Column:
    return F.lit(R) * F.radians(_c(lon))


def merc_y(lat) -> Column:
    return F.lit(R) * F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(_c(lat)) / 2.0))


def zoom_n(zoom) -> Column:
    """2^zoom as a long Column (exact for zoom <= 29)."""
    if isinstance(zoom, int):
        return F.lit(1 << zoom).cast("long")
    return F.pow(F.lit(2.0), _c(zoom).cast("double")).cast("long")


def tile_x(lon, zoom) -> Column:
    """XYZ tile column from lon degrees; JVM-side, clamped to [0, 2^z-1]."""
    n = zoom_n(zoom)
    tx = F.floor((_c(lon) + 180.0) / 360.0 * n)
    return F.greatest(F.lit(0).cast("long"), F.least(tx, n - 1))


def tile_y(lat, zoom) -> Column:
    """XYZ tile row (southward) from lat degrees; uses asinh(tan(lat))."""
    n = zoom_n(zoom)
    lat_r = F.radians(_c(lat))
    t = F.tan(lat_r)
    asinh = F.log(t + F.sqrt(t * t + 1.0))
    ty = F.floor((1.0 - asinh / F.lit(math.pi)) / 2.0 * n)
    return F.greatest(F.lit(0).cast("long"), F.least(ty, n - 1))


# ---------------------------------------------------------------------------
# DuckDB oracle SQL twins (text templates; {lon}/{lat}/{z} substituted)
# ---------------------------------------------------------------------------

TILE_X_SQL = (
    "greatest(0, least(CAST(floor((({lon}) + 180.0) / 360.0 * (1::BIGINT << {z})) AS BIGINT),"
    " (1::BIGINT << {z}) - 1))"
)
TILE_Y_SQL = (
    "greatest(0, least(CAST(floor((1.0 - ln(tan(radians({lat})) +"
    " sqrt(tan(radians({lat})) * tan(radians({lat})) + 1.0)) / pi()) / 2.0"
    " * (1::BIGINT << {z})) AS BIGINT), (1::BIGINT << {z}) - 1))"
)
