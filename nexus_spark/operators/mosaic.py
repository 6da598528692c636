"""Public mosaic API: merge tiles into one grid, nearest-cell value lookup
(reference: data-access/nexustiles/model/nexusmodel.py:120-250 —
merge_tiles concatenates non-overlapping tile arrays onto sorted lat/lon
axes with masked gaps; get_approximate_value_for_lat_lon returns the value
at the independently-nearest lat and lon axis points, NaN when out of
bounds / masked / tiles span multiple times).

Spark-first shape: the long observations frame already IS the merged
mosaic — one row per (lat, lon) cell — so "merge" is a guard + pivot
(render.to_grid), not array surgery; block_diag/hstack/vstack vanish. The
nearest lookup is a single bounded aggregation (min_by on axis distance),
never a collect of the field.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class OverlappingTilesError(ValueError):
    """Two tiles claim the same (lat, lon) cell at the merge time
    (reference nexusmodel.py:139 'Can't handle overlapping tiles')."""


def merge_tiles(obs_slice: DataFrame, value_col: str = "value"
                ) -> dict[str, Any]:
    """Merge a single-time observation slice into one dense mosaic.

    obs_slice: rows (time, lat, lon, value) for ONE time step, any number
    of source tiles. Returns {"time": t, "lats", "lons", "grid"} with NaN
    where no cell exists (the masked gaps block_diag produces).

    Raises ValueError when rows span multiple times (the reference's
    same-time assert, nexusmodel.py:121-122) and OverlappingTilesError on
    duplicate cells. One aggregation computes both guards; the pivot
    collects only the |cells| aggregated rows.
    """
    from nexus_spark.plans.render import to_grid

    guard = obs_slice.agg(
        F.countDistinct("time").alias("n_times"),
        (F.count(F.lit(1))
         - F.countDistinct("lat", "lon")).alias("n_overlap"),
        F.first("time").alias("t0")).collect()[0]
    if guard.n_times > 1:
        raise ValueError(
            f"merge_tiles requires a single time step, got {guard.n_times}")
    if guard.n_overlap > 0:
        raise OverlappingTilesError(
            f"{guard.n_overlap} overlapping cell(s) in merge input")
    out = to_grid(obs_slice, value_col)
    out["time"] = guard.t0
    return out


def approximate_value_at(obs: DataFrame, lat: float, lon: float,
                         dataset: str | None = None, time=None,
                         value_col: str = "value") -> float:
    """Value at the cell nearest to (lat, lon) — axis-independent nearest,
    exactly the reference's find_nearest-per-axis then index lookup
    (nexusmodel.py:228-250). NaN when the point is outside the covered
    bounds, the nearest cell is masked, or no rows match.

    Plan: one filter + one aggregation — min_by over |lat-x| picks the
    nearest lat AXIS value, min_by over |lon-y| the nearest lon axis
    value, and a bounds check rides the same pass; a second bounded
    lookup fetches that cell's value. No window over the field, no
    driver-side axis arrays.
    """
    df = obs
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if time is not None:
        df = df.where(F.col("time") == F.lit(time))

    probe = df.agg(
        F.min_by("lat", F.abs(F.col("lat") - F.lit(lat))).alias("nlat"),
        F.min_by("lon", F.abs(F.col("lon") - F.lit(lon))).alias("nlon"),
        F.min("lat").alias("lo_lat"), F.max("lat").alias("hi_lat"),
        F.min("lon").alias("lo_lon"), F.max("lon").alias("hi_lon"),
        F.countDistinct("time").alias("n_times"),
    ).collect()[0]
    if probe.nlat is None:  # empty selection
        return float("nan")
    if probe.n_times > 1:  # tiles not all at the same time -> NaN
        return float("nan")  # (nexusmodel.py:243-245 AssertionError path)
    # contains_point: out-of-bounds -> NaN (nexusmodel.py:240-242)
    if not (probe.lo_lat <= lat <= probe.hi_lat
            and probe.lo_lon <= lon <= probe.hi_lon):
        return float("nan")

    cell = df.where((F.col("lat") == probe.nlat)
                    & (F.col("lon") == probe.nlon)) \
             .select(value_col).limit(1).collect()
    if not cell or cell[0][0] is None:  # masked cell -> NaN
        return float("nan")
    v = cell[0][0]
    return float(v) if not (isinstance(v, float) and math.isnan(v)) else v
