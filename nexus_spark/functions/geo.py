"""Geospatial column expressions: cos-lat weighting, haversine, cell ids.

All JVM-side Column expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def cos_lat_weight(lat: Column | str) -> Column:
    """Latitude area weight cos(radians(lat)).

    The reference weights every areal mean by cos(latitude)
    (reference: analysis/webservice/algorithms_spark/TimeSeriesSpark.py:538-540,
    nexusmodel.py:102-103).
    """
    lat = F.col(lat) if isinstance(lat, str) else lat
    return F.cos(F.radians(lat))


def weighted_mean(value: Column | str, lat: Column | str) -> Column:
    """cos-lat-weighted mean over non-null values (np.ma.average parity)."""
    value = F.col(value) if isinstance(value, str) else value
    lat = F.col(lat) if isinstance(lat, str) else lat
    w = F.when(value.isNotNull(), cos_lat_weight(lat))
    return F.sum(value * cos_lat_weight(lat)) / F.sum(w)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine formula).

    Replaces the reference's per-partition cKDTree in azimuthal-equidistant
    projection (reference: Matchup.py:584-636) — as a plain column expression
    it stays inside codegen and scales with the join, no index build.
    """
    dlat_h = F.sin(F.radians(lat2 - lat1) / 2)
    dlon_h = F.sin(F.radians(lon2 - lon1) / 2)
    # squares via multiplication: pow() differs across engines at ulp level
    a = dlat_h * dlat_h + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * dlon_h * dlon_h
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """Integer (lat_cell, lon_cell) bucket ids at cell_deg resolution.

    The scale path for spatial joins: equi-join on cell ids (plus neighbor
    expansion) instead of a cross join — see operators.matchup.
    """
    return (
        F.floor(lat / F.lit(cell_deg)).cast("int"),
        F.floor(lon / F.lit(cell_deg)).cast("int"),
    )


def bbox_filter(lat: Column, lon: Column, min_lat: float, max_lat: float,
                min_lon: float, max_lon: float) -> Column:
    """Inclusive bbox predicate (reference: nexusmodel.py:108-117)."""
    return (
        (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
        & (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    )
