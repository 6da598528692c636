"""Result rendering: mosaic assembly + CSV/JSON writers.

Reference content negotiation returns JSON/PNG/CSV/NetCDF
(reference: analysis/webservice/webapp.py:99-136; CSV writer
DataInBoundsSearch.py:165-205; mosaic index arithmetic
NexusHandler.py:494-504, TimeAvgMapSpark.py:204-233). In the rebuild,
map-shaped output is a driver-side pivot of the (small) collected result —
a presentation step, never a storage concern. PNG/NetCDF writers need
matplotlib/netCDF4 (absent here) and are stubbed behind import guards.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np
from pyspark.sql import DataFrame


def to_grid(map_df: DataFrame, value_col: str, lat_col: str = "lat",
            lon_col: str = "lon", fill: float = np.nan) -> dict[str, Any]:
    """Assemble a per-pixel map result into a dense 2-D grid.

    Returns {"lats": [...], "lons": [...], "grid": 2-D ndarray
    [lat x lon]} — the mosaic the reference builds with lat2ind/lon2ind
    index arithmetic. The input is an already-aggregated map (|cells| rows),
    so collecting is the correct final step, not a scale concern.
    """
    rows = map_df.select(lat_col, lon_col, value_col).collect()
    lats = sorted({r[lat_col] for r in rows})
    lons = sorted({r[lon_col] for r in rows})
    lat_idx = {v: i for i, v in enumerate(lats)}
    lon_idx = {v: i for i, v in enumerate(lons)}
    grid = np.full((len(lats), len(lons)), fill, dtype=float)
    for r in rows:
        if r[value_col] is not None:
            grid[lat_idx[r[lat_col]], lon_idx[r[lon_col]]] = r[value_col]
    return {"lats": lats, "lons": lons, "grid": grid}


def to_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV writer. single_file coalesces for a download-style artifact;
    leave False for a distributed write at scale."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", "true").csv(path)


def to_json_records(df: DataFrame, limit: int | None = None) -> str:
    """JSON records payload (HTTP response analog). Caller bounds the
    result size (the reference enforced resultSizeLimit; at scale always
    pass a limit)."""
    if limit is not None:
        df = df.limit(limit)
    return json.dumps([row.asDict(recursive=True) for row in df.collect()],
                      default=str)


def to_png(*_args, **_kwargs):  # pragma: no cover
    raise NotImplementedError(
        "PNG rendering requires matplotlib (not in this environment); the "
        "reference's plotters consume exactly the to_grid() payload")


def to_netcdf(*_args, **_kwargs):  # pragma: no cover
    raise NotImplementedError(
        "NetCDF export requires netCDF4 (not in this environment); consumes "
        "the to_grid() payload")
