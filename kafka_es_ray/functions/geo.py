"""Geo kernels for the ES geo query/aggregation family.

ES models geo_point fields as (lat, lon) doubles per doc; this engine
maps a geo field ``F`` onto two numeric docstore columns ``{F}_lat`` /
``{F}_lon`` (cfg.numeric_cols), so geo filters/aggs ride the existing
numeric machinery with no new storage format.

Float contract (CLAUDE.md rule 4): every derived quantity that feeds a
comparison or a floor() is rounded half-away-from-zero to 6 decimals
FIRST, on both the engine side and the DuckDB-oracle side, so last-ulp
libm differences can never flip a bucket or a threshold.
"""

from __future__ import annotations

import numpy as np

# ES GeoUtils.EARTH_MEAN_RADIUS (meters) — the constant Elasticsearch
# uses for arc distances; the SQL oracles embed the same literal.
EARTH_RADIUS_M = 6371008.7714


def _round6(x: np.ndarray) -> np.ndarray:
    """Round half-away-from-zero to 6 decimals (matches DuckDB round)."""
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x * 1e6 + 0.5), np.ceil(x * 1e6 - 0.5)) / 1e6


def haversine_m(
    lat: np.ndarray, lon: np.ndarray, lat0: float, lon0: float
) -> np.ndarray:
    """Vectorized great-circle distance (meters) from each (lat, lon) to
    the origin — the ES arc distance.  float64 throughout, round6 so the
    caller can compare against thresholds/edges deterministically."""
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    la0, lo0 = np.radians(float(lat0)), np.radians(float(lon0))
    s1 = np.sin((la - la0) * 0.5)
    s2 = np.sin((lo - lo0) * 0.5)
    h = s1 * s1 + np.cos(la) * np.cos(la0) * s2 * s2
    return _round6(2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.minimum(h, 1.0))))


def geotile_xy(
    lat: np.ndarray, lon: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """ES geotile_grid cell coordinates: web-mercator tile (x, y) at
    ``zoom`` (the map-tile scheme; key = "z/x/y").  The continuous tile
    coordinate is round6-ed BEFORE floor so engines sharing the formula
    can never disagree at a cell edge.  Latitudes are clamped to the
    web-mercator domain (±85.0511…) like ES does."""
    n = float(1 << zoom)
    lo = np.asarray(lon, dtype=np.float64)
    la = np.clip(np.asarray(lat, dtype=np.float64), -85.05112878, 85.05112878)
    xc = _round6((lo + 180.0) / 360.0 * n)
    lar = np.radians(la)
    yc = _round6(
        (1.0 - np.log(np.tan(lar) + 1.0 / np.cos(lar)) / np.pi) / 2.0 * n
    )
    x = np.clip(np.floor(xc), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor(yc), 0, n - 1).astype(np.int64)
    return x, y


def geotile_pack(x: np.ndarray, y: np.ndarray, zoom: int) -> np.ndarray:
    """Pack (x, y) tile coords into one float64-exact key x*2^zoom + y
    (exact for zoom <= 26 — both factors < 2^26, product < 2^52)."""
    return (
        np.asarray(x, dtype=np.int64) * np.int64(1 << zoom)
        + np.asarray(y, dtype=np.int64)
    ).astype(np.float64)


def geotile_unpack(key: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.asarray(key, dtype=np.float64).astype(np.int64)
    return k // np.int64(1 << zoom), k % np.int64(1 << zoom)


# Standard geohash base32 (no a/i/l/o); ascending ASCII, so equal-length
# geohash string order == packed cell integer order (deterministic cuts
# can rank by the int key and render late).
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cells(lat: np.ndarray, lon: np.ndarray, precision: int) -> np.ndarray:
    """Packed geohash cell index at ``precision`` base32 chars: the
    standard interleaved bit string (first/most-significant bit is
    longitude) as an int64 (exact in float64 for precision <= 10).
    Cell coordinates come from the round6-ed continuous position like
    geotile_xy, so engines sharing the formula agree at cell edges."""
    bits = 5 * int(precision)
    nlon, nlat = (bits + 1) // 2, bits // 2
    lo = np.asarray(lon, dtype=np.float64)
    la = np.asarray(lat, dtype=np.float64)
    xi = np.clip(
        np.floor(_round6((lo + 180.0) / 360.0 * float(1 << nlon))),
        0, (1 << nlon) - 1,
    ).astype(np.int64)
    yi = np.clip(
        np.floor(_round6((la + 90.0) / 180.0 * float(1 << nlat))),
        0, (1 << nlat) - 1,
    ).astype(np.int64)
    out = np.zeros(xi.shape, dtype=np.int64)
    for j in range(bits):  # <= 50 vectorized passes, never per-row
        if j % 2 == 0:
            b = (xi >> np.int64(nlon - 1 - j // 2)) & 1
        else:
            b = (yi >> np.int64(nlat - 1 - j // 2)) & 1
        out = (out << 1) | b
    return out


def geohash_render(cells: np.ndarray, precision: int) -> list[str]:
    """Packed cell index -> base32 geohash string (5 bits per char)."""
    out = []
    for c in np.asarray(cells, dtype=np.int64):
        s = [GEOHASH32[(int(c) >> (5 * i)) & 31] for i in range(precision)]
        out.append("".join(reversed(s)))
    return out
