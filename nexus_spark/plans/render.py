"""Result rendering: mosaic assembly + CSV/JSON writers.

Reference content negotiation returns JSON/PNG/CSV/NetCDF
(reference: analysis/webservice/webapp.py:99-136; CSV writer
DataInBoundsSearch.py:165-205; mosaic index arithmetic
NexusHandler.py:494-504, TimeAvgMapSpark.py:204-233). In the rebuild,
map-shaped output is a driver-side pivot of the (small) collected result —
a presentation step, never a storage concern. PNG and NetCDF-3 writers are
from-scratch struct/zlib implementations (no matplotlib/netCDF4 needed).
"""

from __future__ import annotations

import csv
import io
import json
import struct
import zipfile
import zlib
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


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _png_encode(rgba: np.ndarray) -> bytes:
    """Encode an (H, W, 4) uint8 array as a PNG byte string (zlib/struct
    only — no imaging deps). Filter type 0 on every scanline; 8-bit RGBA."""
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(raw, 9))
            + _png_chunk(b"IEND", b""))


# RdYlBu-reversed anchor ramp (cold→hot), the shape of the reference's SST
# map palettes. Interpolated linearly between anchors.
_RAMP = np.array([[49, 54, 149], [116, 173, 209], [255, 255, 191],
                  [244, 109, 67], [165, 0, 38]], dtype=float)


def colorize(grid: np.ndarray, vmin: float | None = None,
             vmax: float | None = None) -> np.ndarray:
    """Map a 2-D float grid to (H, W, 4) uint8 RGBA; NaN → transparent."""
    grid = np.asarray(grid, dtype=float)
    mask = ~np.isfinite(grid)
    if vmin is None:
        vmin = float(np.nanmin(grid)) if (~mask).any() else 0.0
    if vmax is None:
        vmax = float(np.nanmax(grid)) if (~mask).any() else 1.0
    span = (vmax - vmin) or 1.0
    t = np.clip((np.nan_to_num(grid, nan=vmin) - vmin) / span, 0.0, 1.0)
    pos = t * (len(_RAMP) - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, len(_RAMP) - 2)
    frac = (pos - i0)[..., None]
    rgb = _RAMP[i0] * (1.0 - frac) + _RAMP[i0 + 1] * frac
    rgba = np.concatenate(
        [rgb, np.full((*grid.shape, 1), 255.0)], axis=-1)
    rgba[mask] = 0.0  # fully transparent where no data
    return np.ascontiguousarray(np.round(rgba).astype(np.uint8))


def to_png(grid_payload: dict[str, Any], vmin: float | None = None,
           vmax: float | None = None, scale: int = 1) -> bytes:
    """Render a to_grid() payload as PNG bytes — the content-negotiation
    branch the reference serves per endpoint (reference:
    analysis/webservice/webapp.py:99-136; map plotters e.g.
    algorithms/TimeAvgMapSpark.py:204-233 consume the same mosaic).

    Pure-Python encoder (no matplotlib/PIL). Row 0 renders the NORTHMOST
    latitude (image origin top-left, map origin bottom-left — same flip the
    reference's plotters apply). `scale` integer-upscales with nearest
    neighbor for visibility of coarse grids.
    """
    grid = np.asarray(grid_payload["grid"], dtype=float)[::-1, :]
    rgba = colorize(grid, vmin=vmin, vmax=vmax)
    if scale > 1:
        rgba = np.ascontiguousarray(
            rgba.repeat(scale, axis=0).repeat(scale, axis=1))
    return _png_encode(rgba)


def _csv_bytes(df: DataFrame, limit: int | None = None) -> str:
    rows = (df.limit(limit) if limit else df).collect()
    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(df.columns)
    for r in rows:
        w.writerow([r[c] for c in df.columns])
    return buf.getvalue()


def to_zip_subset(frames: dict[str, DataFrame], date_range: str = "",
                  bounds: str = "", limit: int | None = None) -> bytes:
    """ZIP-of-CSVs subset delivery (reference: doms/subsetter.py:200-218 —
    one CSV per dataset, arcname '{dataset}.{date_range}.{bounds}.csv',
    zipped for a single download artifact).

    Subset downloads are bounded responses by contract (the reference
    enforces resultSizeLimit), so the driver-side CSV build here is a
    presentation step, not a scale path; pass `limit` to enforce the bound.
    For unbounded exports use to_csv(single_file=False) per frame instead.
    """
    out = io.BytesIO()
    suffix = "".join(f".{part}" for part in (date_range, bounds) if part)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for name, df in frames.items():
            z.writestr(f"{name}{suffix}.csv", _csv_bytes(df, limit=limit))
    return out.getvalue()


def histogram_payload(df: DataFrame, col: str, bins: int = 50,
                      vmin: float | None = None,
                      vmax: float | None = None) -> dict[str, Any]:
    """Distributed histogram: bin counts computed as a single Spark
    aggregate (reference: doms/histogramplot.py — numpy hist over collected
    values; here the bin assignment shuffles counts, never values, so it
    holds at any scale).

    Returns {"edges": [bins+1 floats], "counts": [bins ints]}.
    """
    from pyspark.sql import functions as F
    if vmin is None or vmax is None:
        lo, hi = df.agg(F.min(col), F.max(col)).first()
        if lo is None or hi is None:  # empty frame / all-NULL column
            vmin = 0.0 if vmin is None else vmin
            vmax = vmin + 1.0 if vmax is None else vmax
            span = vmax - vmin
            return {"edges": [vmin + span * i / bins for i in range(bins + 1)],
                    "counts": [0] * bins}
        vmin = float(lo) if vmin is None else vmin
        vmax = float(hi) if vmax is None else vmax
    span = (vmax - vmin) or 1.0
    # Clamp into [0, bins-1] so max lands in the last bin, as numpy does.
    bucket = F.least(
        F.lit(bins - 1),
        F.floor((F.col(col) - F.lit(vmin)) / F.lit(span) * bins)
    ).cast("int")
    got = {r["b"]: r["n"] for r in
           df.where(F.col(col).isNotNull())
             .where((F.col(col) >= vmin) & (F.col(col) <= vmax))
             .groupBy(bucket.alias("b")).count()
             .withColumnRenamed("count", "n").collect()}
    edges = [vmin + span * i / bins for i in range(bins + 1)]
    return {"edges": edges, "counts": [int(got.get(i, 0)) for i in range(bins)]}


def histogram_png(payload: dict[str, Any], height: int = 120) -> bytes:
    """Rasterize a histogram_payload as a bar chart PNG (2px/bar)."""
    counts = np.asarray(payload["counts"], dtype=float)
    peak = counts.max() or 1.0
    levels = np.round(counts / peak * (height - 1)).astype(int)
    grid = np.full((height, len(counts)), np.nan)
    for x, lv in enumerate(levels):
        if lv > 0:
            grid[height - lv:, x] = counts[x]
    return to_png({"grid": grid[::-1, :]}, scale=2)


def scatter_png(df: DataFrame, x_col: str, y_col: str, width: int = 256,
                height: int = 256, limit: int = 50000) -> bytes:
    """Density scatter (reference: doms/scatterplot.py). The 2-D binning is
    a Spark aggregate (counts per pixel cell, bounded by width×height), so
    only the raster — never the points — reaches the driver."""
    from pyspark.sql import functions as F
    pts = df.select(F.col(x_col).cast("double").alias("x"),
                    F.col(y_col).cast("double").alias("y")).dropna()
    if limit:
        # limit() is nondeterministic across jobs — pin ONE sample so the
        # bounds job and the binning job see identical points.
        pts = pts.limit(limit).cache()
    try:
        bounds = pts.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
        if bounds[0] is None:  # no points
            return to_png({"grid": np.full((height, width), np.nan)})
        xmin, xmax, ymin, ymax = bounds
        xs = (xmax - xmin) or 1.0
        ys = (ymax - ymin) or 1.0
        # Clamp both ends: symmetric guard against any point outside the
        # sampled bounds mapping to a negative (numpy-wrapping) index.
        px = F.greatest(F.lit(0), F.least(
            F.lit(width - 1),
            F.floor((F.col("x") - xmin) / xs * width))).cast("int")
        py = F.greatest(F.lit(0), F.least(
            F.lit(height - 1),
            F.floor((F.col("y") - ymin) / ys * height))).cast("int")
        cells = pts.groupBy(px.alias("px"), py.alias("py")).count().collect()
    finally:
        if limit:
            pts.unpersist()
    grid = np.full((height, width), np.nan)
    for r in cells:
        grid[r["py"], r["px"]] = r["count"]
    return to_png({"grid": grid})


# --------------------------------------------------------------------------
# NetCDF-3 classic writer — pure struct, no netCDF4/scipy dependency.
# Format constants from the public NetCDF classic format spec
# (CDF-1: magic 'CDF\x01', big-endian header + padded data section).
# --------------------------------------------------------------------------

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_NC_CHAR, _NC_INT, _NC_DOUBLE = 2, 4, 6


def _nc_pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _nc_name(name: str) -> bytes:
    raw = name.encode("utf-8")
    return struct.pack(">I", len(raw)) + _nc_pad(raw)


def _nc_att(name: str, value) -> bytes:
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return (_nc_name(name) + struct.pack(">II", _NC_CHAR, len(raw))
                + _nc_pad(raw))
    vals = np.atleast_1d(np.asarray(value, dtype=">f8"))
    return (_nc_name(name) + struct.pack(">II", _NC_DOUBLE, vals.size)
            + vals.tobytes())


def _nc_att_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)  # ABSENT
    return (struct.pack(">II", _NC_ATTRIBUTE, len(attrs))
            + b"".join(_nc_att(k, v) for k, v in attrs.items()))


def to_netcdf(grid_payload: dict[str, Any], var_name: str = "value",
              units: str | None = None,
              global_attrs: dict | None = None) -> bytes:
    """Serialize a to_grid() payload as NetCDF-3 classic bytes (the
    content-negotiation branch the reference serves per endpoint —
    reference: analysis/webservice/NexusHandler.py:506-550,
    doms/BaseDomsHandler.py:243-534, which use netCDF4; this is a
    from-scratch struct writer of the documented CDF-1 classic format,
    readable by scipy.io.netcdf_file / netCDF4 / ncdump).

    Layout: dims (lat, lon); coordinate vars lat(lat), lon(lon) as doubles
    with degree units; data var `var_name`(lat, lon) double with NaN fill.
    Like the PNG path, this consumes an already-aggregated raster — a
    bounded presentation artifact, not a scale path.
    """
    lats = np.asarray(grid_payload["lats"], dtype=">f8")
    lons = np.asarray(grid_payload["lons"], dtype=">f8")
    grid = np.ascontiguousarray(
        np.asarray(grid_payload["grid"], dtype=float), dtype=">f8")
    if grid.shape != (lats.size, lons.size):
        raise ValueError(f"grid shape {grid.shape} != "
                         f"(n_lats={lats.size}, n_lons={lons.size})")

    dims = [("lat", lats.size), ("lon", lons.size)]
    variables = [  # (name, dimids, attrs, big-endian payload)
        ("lat", [0], {"units": "degrees_north"}, lats.tobytes()),
        ("lon", [1], {"units": "degrees_east"}, lons.tobytes()),
        (var_name, [0, 1],
         ({"units": units} if units else {}) | {"_FillValue": np.nan},
         grid.tobytes()),
    ]

    def header(begins: list[int]) -> bytes:
        out = [b"CDF\x01", struct.pack(">I", 0)]  # magic, numrecs
        out.append(struct.pack(">II", _NC_DIMENSION, len(dims)))
        for name, size in dims:
            out.append(_nc_name(name) + struct.pack(">I", size))
        out.append(_nc_att_list(global_attrs or {}))
        out.append(struct.pack(">II", _NC_VARIABLE, len(variables)))
        for (name, dimids, attrs, payload), begin in zip(variables, begins):
            out.append(_nc_name(name))
            out.append(struct.pack(">I", len(dimids)))
            out.append(b"".join(struct.pack(">I", d) for d in dimids))
            out.append(_nc_att_list(attrs))
            vsize = len(payload) + (-len(payload) % 4)
            out.append(struct.pack(">III", _NC_DOUBLE, vsize, begin))
        return b"".join(out)

    # begin offsets appear inside the header, but CDF-1 offsets are fixed
    # 4-byte ints, so header length is independent of their values: size
    # with zeros, then fill in the real offsets.
    offset = len(header([0] * len(variables)))
    begins = []
    for _, _, _, payload in variables:
        begins.append(offset)
        offset += len(payload) + (-len(payload) % 4)
    return (header(begins)
            + b"".join(_nc_pad(p) for _, _, _, p in variables))
