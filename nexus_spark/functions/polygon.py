"""Point-in-polygon filtering without a geo library.

The reference masks tiles to WKT polygons via Shapely
(reference: data-access/nexustiles/nexustiles.py:258-277 mask_tiles_to_polygon;
Solr `Intersects()` pre-filter SolrProxy.pyx:219-281). Shapely is not in
this container — and a per-row Python UDF would be the slow path anyway —
so the crossing-number (even-odd) test is expressed directly in JVM
higher-order functions over the vertex array: O(|V|) per row, inside
whole-stage codegen, no UDF.

Usage: polygon as [(lon, lat), ...] (closed or open ring). The fast path
is still a bbox prefilter (free via column stats); the exact test runs on
the survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ring(polygon: list[tuple[float, float]]) -> list[tuple[float, float]]:
    ring = list(polygon)
    if ring[0] != ring[-1]:
        ring.append(ring[0])
    return ring


def polygon_bbox(polygon: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in polygon]
    ys = [p[1] for p in polygon]
    return min(ys), max(ys), min(xs), max(xs)


def point_in_polygon(lon: Column, lat: Column,
                     polygon: list[tuple[float, float]]) -> Column:
    """Even-odd crossing-number predicate as a pure column expression.

    For each edge (x1,y1)->(x2,y2): crosses iff (y1 > lat) != (y2 > lat)
    and lon < x1 + (lat - y1) * (x2 - x1) / (y2 - y1). Odd crossing count
    → inside. Boundary behavior matches the standard even-odd rule.
    """
    ring = _ring(polygon)
    edges = list(zip(ring[:-1], ring[1:]))
    crossings: Column = F.lit(0)
    for (x1, y1), (x2, y2) in edges:
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray test
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at = F.lit(x1) + (lat - F.lit(y1)) * F.lit((x2 - x1) / (y2 - y1))
        crossings = crossings + F.when(straddles & (lon < x_at), 1).otherwise(0)
    return F.pmod(crossings, F.lit(2)) == 1


def filter_polygon(obs: DataFrame, polygon: list[tuple[float, float]],
                   lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """bbox prefilter (pushes to the scan) + exact crossing-number test."""
    min_lat, max_lat, min_lon, max_lon = polygon_bbox(polygon)
    pre = obs.where(
        (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
        & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon))
    return pre.where(point_in_polygon(F.col(lon_col), F.col(lat_col), polygon))


def polygon_sql_predicate(polygon: list[tuple[float, float]],
                          lon_expr: str = "lon", lat_expr: str = "lat") -> str:
    """The same even-odd test as ANSI SQL (oracle parity)."""
    ring = _ring(polygon)
    terms = []
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        if y1 == y2:
            continue
        slope = (x2 - x1) / (y2 - y1)
        terms.append(
            f"(CASE WHEN (({y1} > {lat_expr}) <> ({y2} > {lat_expr})) "
            f"AND {lon_expr} < {x1} + ({lat_expr} - {y1}) * {slope} "
            f"THEN 1 ELSE 0 END)")
    total = " + ".join(terms) if terms else "0"
    return f"(({total}) % 2 = 1)"
