"""Geohash function family (SURVEY.md §2.7 F1-F3) with zero dependencies.

The reference uses pygeohash (`Assignment_3.ipynb:636,694,704,706`; week7
cell [104]). We implement the standard public base-32 geohash algorithm in
pure Python (driver/UDF side) and expose three Spark surfaces:

- ``encode_udf`` / ``decode_lat_udf``/``decode_lon_udf`` — Arrow-batched
  pandas UDFs (the only part that genuinely needs Python);
- ``approx_distance_expr`` — pygeohash's common-prefix distance class as a
  pure Catalyst CASE expression (JVM-side, codegen'd);
- ``haversine_expr`` — haversine meters from lat/lon columns as built-in
  trig expressions (JVM-side).

Known answers used by tests: ``geohash_approximate_distance('bcd3u','bc83n')
= 625441`` m (`Assignment_3.ipynb:662-670`) and 12-char precision goldens of
the `results/geoindex/**` records.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_IDX = {c: i for i, c in enumerate(_BASE32)}

# pygeohash's published distance-class table (meters) keyed by the length of
# the common prefix of the two geohashes (its `geohash_approximate_distance`).
PRECISION_METERS: dict[int, float] = {
    0: 20000000.0,
    1: 5003530.0,
    2: 625441.0,
    3: 123264.0,
    4: 19545.0,
    5: 3803.0,
    6: 610.0,
    7: 118.0,
    8: 19.0,
    9: 3.71,
    10: 0.6,
}
_MAX_PREFIX = max(PRECISION_METERS)


def encode(latitude: float, longitude: float, precision: int = 12) -> str:
    """Base-32 geohash encode (public algorithm), with pygeohash's strict
    ``>`` midpoint comparison: a coordinate exactly equal to a bisection
    midpoint goes to the LOW half.  This matters in practice — the
    reference's coordinates are float32-derived dyadic rationals that hit
    midpoints exactly at deep precision, and the committed golden tree
    (`results/geoindex/**`) encodes 1,202 of 67,180 records differently
    under the ``>=`` convention.  Verified char-identical to the committed
    pygeohash output for all 67,180 (tests/test_geoindex_golden.py)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    chars: list[str] = []
    bit = 0
    ch = 0
    even = True  # even bit -> longitude
    while len(chars) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if longitude > mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if latitude > mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            chars.append(_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(chars)


def decode_bounds(gh: str) -> tuple[float, float, float, float]:
    """(lat_lo, lat_hi, lon_lo, lon_hi) cell bounds of a geohash."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in gh:
        cd = _BASE32_IDX[c]
        for mask in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if cd & mask:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if cd & mask:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def decode(gh: str) -> tuple[float, float]:
    """Cell-center (lat, lon) of a geohash."""
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bounds(gh)
    return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2


def approximate_distance(gh1: str, gh2: str) -> float:
    """pygeohash-compatible distance class from common-prefix length."""
    n = 0
    for a, b in zip(gh1, gh2):
        if a != b:
            break
        n += 1
    return PRECISION_METERS[min(n, _MAX_PREFIX)]


def haversine(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Great-circle distance in meters (public formula, R=6371 km)."""
    phi1, phi2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlmb = math.radians(lon2 - lon1)
    a = math.sin(dphi / 2) ** 2 + math.cos(phi1) * math.cos(phi2) * math.sin(dlmb / 2) ** 2
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


# --- Spark surfaces ---------------------------------------------------------


# pandas_udf registration needs an active SparkSession, so the UDFs are
# created lazily on first use and cached.
from functools import lru_cache  # noqa: E402


@lru_cache(maxsize=1)
def _udfs():
    @pandas_udf("string")
    def _encode(lat: pd.Series, lon: pd.Series) -> pd.Series:
        out = []
        for la, lo in zip(lat, lon):
            if pd.isna(la) or pd.isna(lo):
                out.append(None)
            else:
                out.append(encode(float(la), float(lo), 12))
        return pd.Series(out, dtype="object")

    @pandas_udf("double")
    def _dec_lat(g: pd.Series) -> pd.Series:
        return g.map(lambda x: decode(x)[0] if isinstance(x, str) and x else None)

    @pandas_udf("double")
    def _dec_lon(g: pd.Series) -> pd.Series:
        return g.map(lambda x: decode(x)[1] if isinstance(x, str) and x else None)

    return _encode, _dec_lat, _dec_lon


def encode_udf(lat: Column, lon: Column) -> Column:
    """Arrow-batched geohash-12 encode; null-safe (null in -> null out)."""
    return _udfs()[0](lat, lon)


def decode_lat_udf(g: Column) -> Column:
    return _udfs()[1](g)


def decode_lon_udf(g: Column) -> Column:
    return _udfs()[2](g)


def common_prefix_len_expr(a: Column, b: Column, max_len: int = 12) -> Column:
    """Length of the common prefix of two strings as a JVM-side expression:
    sum over i of (substring(a,1,i) == substring(b,1,i))."""
    # The length guard stops substring() from saturating past the string end
    # (substring('abc',1,9)=='abc' would overcount equal short strings).
    min_len = F.least(F.length(a), F.length(b))
    terms = [
        F.when(
            (min_len >= i) & (F.substring(a, 1, i) == F.substring(b, 1, i)), 1
        ).otherwise(0)
        for i in range(1, max_len + 1)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return total


def approx_distance_expr(a: Column | str, b: Column | str) -> Column:
    """pygeohash ``geohash_approximate_distance`` as a pure Catalyst
    expression — common-prefix length mapped through the published table.
    Reproduces the documented constant ('bcd3u','bc83n') -> 625441."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    n = common_prefix_len_expr(ca, cb)
    expr = F.lit(PRECISION_METERS[_MAX_PREFIX])
    for k in sorted(PRECISION_METERS)[:-1][::-1]:
        expr = F.when(n == k, F.lit(PRECISION_METERS[k])).otherwise(expr)
    return F.when(n >= _MAX_PREFIX, F.lit(PRECISION_METERS[_MAX_PREFIX])).otherwise(expr)


def haversine_expr(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Haversine meters as built-in trig expressions (whole-stage codegen)."""
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (
        F.sin(dphi / 2) * F.sin(dphi / 2)
        + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2)
    )
    return F.lit(2 * 6371000.0) * F.asin(F.sqrt(a))


def min_distance_to_region_boundary(lat: float, lon: float, cell: str) -> float:
    """Conservative lower bound (meters) on the distance from probe
    ``(lat, lon)`` — inside ``cell`` — to any point OUTSIDE the 3x3
    neighborhood of ``cell``.

    A candidate found inside the pruned 3x3 region is only provably the
    global nearest when its distance does not exceed this bound (otherwise
    a closer record could sit in an unscanned cell just across the region
    edge). North/south edges use exact meridian arc length; east/west
    edges use the cross-track distance to the edge meridian
    (``asin(cos(lat)*sin(dlon))``).  All clamps round the bound DOWN, so
    an underestimate only triggers a wider (never a wrong) search.
    """
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bounds(cell)
    dlat, dlon = lat_hi - lat_lo, lon_hi - lon_lo
    top = min(lat_hi + dlat, 90.0)
    bot = max(lat_lo - dlat, -90.0)
    r = 6371000.0
    dists = [
        math.radians(max(top - lat, 0.0)) * r,
        math.radians(max(lat - bot, 0.0)) * r,
    ]
    for edge in (lon_hi + dlon, lon_lo - dlon):
        d = abs(edge - lon) % 360.0
        d = min(d, 360.0 - d)
        x = math.cos(math.radians(lat)) * math.sin(math.radians(min(d, 90.0)))
        dists.append(abs(math.asin(max(-1.0, min(1.0, x)))) * r)
    return min(dists)


def neighbors(gh_str: str) -> list[str]:
    """The up-to-8 adjacent cells of a geohash at the same precision
    (decode bounds -> offset center by one cell width/height -> re-encode;
    latitude clamps at the poles, longitude wraps at the antimeridian).
    Needed for boundary-correct prefix-pruned search: a probe near a cell
    edge can have its true nearest record in the adjacent cell."""
    lat_lo, lat_hi, lon_lo, lon_hi = decode_bounds(gh_str)
    clat, clon = (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2
    dlat, dlon = lat_hi - lat_lo, lon_hi - lon_lo
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            lat = clat + dy * dlat
            lon = clon + dx * dlon
            if not -90.0 <= lat <= 90.0:
                continue
            lon = ((lon + 180.0) % 360.0) - 180.0
            n = encode(lat, lon, len(gh_str))
            if n != gh_str and n not in out:
                out.append(n)
    return out
