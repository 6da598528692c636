"""NetCDF granule ingest: section-spec slicing -> long observation rows.

Reference semantics: nexus-ingest tilereadingprocessor.py:57-248 — inputs are
``"dim:start:stop,dim:start:stop;file_path"`` strings; each spec slices the
granule's variable (masked cells -> NaN) and emits one tile. GRIDTILE reads
1-D lat/lon + a scalar time per tile (timevar[slice.start],
tilereadingprocessor.py:160-162); SWATHTILE reads lat/lon/time arrays sliced
by the data variable's own dimension order (:174-218).

Spark-first shape: the granule list is a tiny driver-side work list; the
reads fan out as ONE ``mapInPandas`` stage (each task opens only its own
granules — the classic Hadoop "binary blob ingest" pattern), emitting the
long ``(granule, section_spec, dataset, time, lat, lon, value)`` rows that
``sources.lake.write_observations`` partitions into the lake. No shuffle:
ingest is scan -> project -> write, and at 100 TB the parallelism is the
granule x section-spec count.

Reader backends: xarray/netCDF4 when importable (the production path for
NetCDF-4/HDF5 granules); otherwise a from-scratch NetCDF-3 *classic* parser
(CDF-1/CDF-2, record variables included) implemented from the public format
spec with struct+numpy only — the exact mirror of plans/render.to_netcdf, so
write -> ingest round-trips with zero optional dependencies.
"""

from __future__ import annotations

import re
import struct
from datetime import datetime, timedelta, timezone
from typing import Any, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# Pure-struct NetCDF-3 classic parser (CDF-1 / CDF-2).
# ---------------------------------------------------------------------------

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
# nc_type -> (numpy dtype, external size in bytes)
_NC_DTYPES = {
    1: (">i1", 1),  # NC_BYTE
    2: ("S1", 1),   # NC_CHAR
    3: (">i2", 2),  # NC_SHORT
    4: (">i4", 4),  # NC_INT
    5: (">f4", 4),  # NC_FLOAT
    6: (">f8", 8),  # NC_DOUBLE
}


class _Cursor:
    __slots__ = ("buf", "pos", "offsize")

    def __init__(self, buf: bytes, offsize: int):
        self.buf, self.pos, self.offsize = buf, 0, offsize

    def u4(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def offset(self) -> int:
        if self.offsize == 8:
            (v,) = struct.unpack_from(">Q", self.buf, self.pos)
            self.pos += 8
            return v
        return self.u4()

    def name(self) -> str:
        n = self.u4()
        raw = self.buf[self.pos:self.pos + n]
        self.pos += n + (-n % 4)
        return raw.decode("utf-8")

    def att_value(self):
        nc_type, n = self.u4(), self.u4()
        dt, sz = _NC_DTYPES[nc_type]
        raw = self.buf[self.pos:self.pos + n * sz]
        self.pos += n * sz + (-(n * sz) % 4)
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr[0] if arr.size == 1 else arr

    def att_list(self) -> dict:
        tag, n = self.u4(), self.u4()
        if tag == 0:  # ABSENT
            return {}
        assert tag == _NC_ATTRIBUTE, f"bad attribute tag 0x{tag:x}"
        return {self.name(): self.att_value() for _ in range(n)}


def parse_netcdf3(buf: bytes, apply_mask: bool = True) -> dict[str, Any]:
    """Parse NetCDF-3 classic bytes (CDF-1 or CDF-2, record vars included).

    Returns ``{"dims": {name: size}, "attrs": {...}, "variables":
    {name: {"dims": [names], "attrs": {...}, "data": ndarray}}}``.
    With ``apply_mask`` (default), CF ``_FillValue``/``missing_value`` cells
    become NaN and ``scale_factor``/``add_offset`` are applied — the
    ``numpy.ma.filled(..., NaN)`` semantics of the reference reader
    (tilereadingprocessor.py:146-153).
    """
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF-3 classic stream (CDF-1/CDF-2)")
    cur = _Cursor(buf, 8 if buf[3] == 2 else 4)
    cur.pos = 4
    numrecs = cur.u4()  # 0xFFFFFFFF = STREAMING (records counted below)

    tag, ndims = cur.u4(), cur.u4()
    assert tag in (0, _NC_DIMENSION), f"bad dim tag 0x{tag:x}"
    dim_names: list[str] = []
    dim_sizes: list[int] = []
    for _ in range(ndims):
        dim_names.append(cur.name())
        dim_sizes.append(cur.u4())
    unlimited = dim_sizes.index(0) if 0 in dim_sizes else None

    global_attrs = cur.att_list()

    tag, nvars = cur.u4(), cur.u4()
    assert tag in (0, _NC_VARIABLE), f"bad var tag 0x{tag:x}"
    headers = []
    for _ in range(nvars):
        name = cur.name()
        nd = cur.u4()
        dimids = [cur.u4() for _ in range(nd)]
        attrs = cur.att_list()
        nc_type, vsize, begin = cur.u4(), cur.u4(), cur.offset()
        headers.append((name, dimids, attrs, nc_type, vsize, begin))

    rec_vars = [h for h in headers
                if h[1] and unlimited is not None and h[1][0] == unlimited]
    # Per the spec: record slabs are padded to 4 bytes UNLESS there is
    # exactly one record variable (then packed contiguously, no padding).
    def _slab(h) -> int:
        _, dimids, _, nc_type, _, _ = h
        n = int(np.prod([dim_sizes[d] for d in dimids[1:]], dtype=np.int64)
                ) if len(dimids) > 1 else 1
        raw = n * _NC_DTYPES[nc_type][1]
        return raw if len(rec_vars) == 1 else raw + (-raw % 4)

    recsize = sum(_slab(h) for h in rec_vars)
    if numrecs == 0xFFFFFFFF:  # streaming: infer from file length
        first = min(h[5] for h in rec_vars) if rec_vars else len(buf)
        numrecs = (len(buf) - first) // recsize if recsize else 0

    variables: dict[str, Any] = {}
    for h in headers:
        name, dimids, attrs, nc_type, vsize, begin = h
        dt, sz = _NC_DTYPES[nc_type]
        shape = [dim_sizes[d] for d in dimids]
        if h in rec_vars:
            shape[0] = numrecs
            per = (int(np.prod(shape[1:], dtype=np.int64))
                   if len(shape) > 1 else 1)
            parts = [np.frombuffer(buf, dtype=dt, count=per,
                                   offset=begin + r * recsize)
                     for r in range(numrecs)]
            data = (np.stack(parts).reshape(shape) if parts
                    else np.empty(shape, dtype=dt))
        else:
            count = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(buf, dtype=dt, count=count,
                                 offset=begin).reshape(shape)
        if apply_mask and nc_type != 2:
            data = data.astype("f8")
            for key in ("_FillValue", "missing_value"):
                fv = attrs.get(key)
                if fv is not None and not np.isnan(np.asarray(fv)).all():
                    data = np.where(data == float(np.asarray(fv).ravel()[0]),
                                    np.nan, data)
            if "scale_factor" in attrs or "add_offset" in attrs:
                data = (data * float(attrs.get("scale_factor", 1.0))
                        + float(attrs.get("add_offset", 0.0)))
        variables[name] = {"dims": [dim_names[d] for d in dimids],
                           "attrs": attrs, "data": data}
    return {"dims": dict(zip(dim_names, dim_sizes)),
            "attrs": global_attrs, "variables": variables}


def _open_granule(path: str) -> dict[str, Any]:
    """Open a granule into the parse_netcdf3 dict shape.

    Tries xarray (handles NetCDF-4/HDF5 — the production backend) behind an
    optional import; falls back to the built-in classic parser.
    """
    path = path[len("file://"):] if path.startswith("file://") else path
    try:
        import xarray as xr  # optional — absent in this container
    except ImportError:
        with open(path, "rb") as fh:
            return parse_netcdf3(fh.read())
    ds = xr.open_dataset(path, mask_and_scale=True, decode_times=False)
    out = {"dims": dict(ds.sizes), "attrs": dict(ds.attrs), "variables": {}}
    for name, var in ds.variables.items():
        out["variables"][name] = {"dims": list(var.dims),
                                  "attrs": dict(var.attrs),
                                  "data": np.asarray(var.values)}
    ds.close()
    return out


# ---------------------------------------------------------------------------
# Section specs (the reference's slicing contract).
# ---------------------------------------------------------------------------

def parse_section_input(the_input: str) -> tuple[list[tuple[str, dict]], str]:
    """``"lat:0:10,lon:0:10;lat:10:20,lon:0:10;/path"`` -> (specs, path)
    (reference parse_input/slices_from_spec, tilereadingprocessor.py:57-93)."""
    parts = [p.strip() for p in str(the_input).split(";")]
    specs = []
    for section_spec in parts[:-1]:
        dimtoslice = {}
        for dimension in section_spec.split(","):
            name, start, stop = dimension.split(":")
            dimtoslice[name] = slice(int(start), int(stop))
        specs.append((section_spec, dimtoslice))
    return specs, parts[-1]


def section_specs(dim_sizes: dict[str, int],
                  tile_shape: dict[str, int]) -> list[str]:
    """Chunk a granule's dims into tile section-spec strings — the slicer
    that feeds the reader (the reference computes these upstream of the
    tile processor). Dims absent from tile_shape stay whole."""
    axes = []
    for name, size in dim_sizes.items():
        step = tile_shape.get(name, size)
        axes.append([(name, lo, min(lo + step, size))
                     for lo in range(0, size, step)])
    specs = [""]
    for axis in axes:
        specs = [f"{acc},{n}:{lo}:{hi}" if acc else f"{n}:{lo}:{hi}"
                 for acc in specs for (n, lo, hi) in axis]
    return specs


_SINCE_RE = re.compile(
    r"^\s*(second|minute|hour|day)s?\s+since\s+(.+?)\s*$", re.IGNORECASE)
_SECONDS_PER = {"second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0}


def time_to_epoch(values, units: str | None,
                  time_offset: int | None = None) -> np.ndarray:
    """CF "X since <datetime>" -> float64 epoch seconds (reference
    to_seconds_from_epoch, tilereadingprocessor.py:96-111; num2date is
    replaced by direct unit arithmetic — exact for the standard calendar)."""
    arr = np.asarray(values, dtype="f8")
    if units:
        m = _SINCE_RE.match(units)
        if not m:
            raise ValueError(f"unsupported time units: {units!r}")
        scale = _SECONDS_PER[m.group(1).lower()]
        ref_txt = m.group(2).replace("T", " ").replace("Z", "")
        ref = None
        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                    "%Y-%m-%d %H:%M", "%Y-%m-%d"):
            try:
                ref = datetime.strptime(ref_txt, fmt)
                break
            except ValueError:
                continue
        if ref is None:
            raise ValueError(f"unparseable reference date: {ref_txt!r}")
        epoch0 = (ref.replace(tzinfo=timezone.utc)
                  - datetime(1970, 1, 1, tzinfo=timezone.utc)).total_seconds()
        arr = arr * scale + epoch0
    if time_offset is not None:
        arr = arr + float(time_offset)
    return arr


# ---------------------------------------------------------------------------
# The mapInPandas ingest stage.
# ---------------------------------------------------------------------------

GRANULE_ROWS_SCHEMA = ("granule string, section_spec string, "
                       "time double, lat double, lon double, value double")


def _emit_grid(nc: dict, spec: str, dimtoslice: dict, variable: str,
               latitude: str, longitude: str, time: str | None,
               time_offset: int | None):
    """One GridTile -> long rows: 1-D lat x 1-D lon, scalar tile time
    (reference read_grid_data, tilereadingprocessor.py:133-171)."""
    var = nc["variables"][variable]
    ordered = tuple(dimtoslice.get(d, slice(None)) for d in var["dims"])
    data = np.asarray(var["data"][ordered], dtype="f8")

    latv = nc["variables"][latitude]
    lats = np.asarray(latv["data"][
        tuple(dimtoslice.get(d, slice(None)) for d in latv["dims"])], "f8")
    lonv = nc["variables"][longitude]
    lons = np.asarray(lonv["data"][
        tuple(dimtoslice.get(d, slice(None)) for d in lonv["dims"])], "f8")

    t_s = np.nan
    if time is not None:
        tvar = nc["variables"][time]
        t_sl = dimtoslice.get(time, slice(0, 1))
        t_s = float(time_to_epoch(
            np.asarray(tvar["data"]).ravel()[t_sl.start],
            tvar["attrs"].get("units"), time_offset))
        # drop the time axis from the data slab (slice.start, like the
        # reference's scalar tile.time)
        if time in var["dims"]:
            axis = var["dims"].index(time)
            data = np.take(data, 0, axis=axis)
    data = data.reshape(lats.size, lons.size)
    glat, glon = np.meshgrid(lats, lons, indexing="ij")
    return (np.full(data.size, t_s), glat.ravel(), glon.ravel(), data.ravel())


def _emit_swath(nc: dict, spec: str, dimtoslice: dict, variable: str,
                latitude: str, longitude: str, time: str,
                time_offset: int | None):
    """One SwathTile -> long rows: lat/lon/time arrays share the data
    variable's dimension order (reference read_swath_data, :174-218)."""
    var = nc["variables"][variable]
    ordered = tuple(dimtoslice.get(d, slice(None)) for d in var["dims"])
    data = np.asarray(var["data"][ordered], dtype="f8").ravel()

    def sliced(name: str) -> np.ndarray:
        v = nc["variables"][name]
        sl = tuple(dimtoslice.get(d, slice(None)) for d in v["dims"])
        return np.asarray(v["data"][sl], dtype="f8").ravel()

    tvar = nc["variables"][time]
    t_s = time_to_epoch(sliced(time), tvar["attrs"].get("units"), time_offset)
    return (t_s, sliced(latitude), sliced(longitude), data)


def read_granules(spark: SparkSession, section_inputs: list[str],
                  variable: str, latitude: str = "lat",
                  longitude: str = "lon", time: str | None = None,
                  reader: str = "GRIDTILE",
                  time_offset: int | None = None,
                  drop_nan: bool = False) -> DataFrame:
    """Distributed granule ingest: one mapInPandas stage over the
    section-input work list -> long observation rows.

    ``section_inputs`` follow the reference's contract (specs ';' path,
    tilereadingprocessor.py:57-83); ``reader`` is GRIDTILE or SWATHTILE
    (reference start(), :225-236). Each Arrow batch of inputs is processed
    by one task; a granule opened once serves all its specs in that batch.
    Returns (granule, section_spec, time epoch-seconds, lat, lon, value)
    — ``value`` keeps NaN cells as NULL unless drop_nan (the empty-tile
    filter is a separate ETL step, operators/etl.py).
    """
    if reader not in ("GRIDTILE", "SWATHTILE"):
        raise NotImplementedError(
            f"READER must be GRIDTILE or SWATHTILE, got {reader!r}")
    if reader == "SWATHTILE" and time is None:
        raise ValueError("SWATHTILE requires a time variable")
    emit = _emit_grid if reader == "GRIDTILE" else _emit_swath

    import pandas as pd

    def ingest(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for the_input in pdf["section_input"]:
                specs, path = parse_section_input(the_input)
                nc = _open_granule(path)
                gname = path.rsplit("/", 1)[-1]
                for spec, dimtoslice in specs:
                    t_s, lats, lons, vals = emit(
                        nc, spec, dimtoslice, variable, latitude, longitude,
                        time, time_offset)
                    out = pd.DataFrame({
                        "granule": gname, "section_spec": spec,
                        "time": t_s, "lat": lats, "lon": lons, "value": vals,
                    })
                    if drop_nan:
                        out = out[out["value"].notna()]
                    yield out

    n = max(1, len(section_inputs))
    work = spark.createDataFrame([(s,) for s in section_inputs],
                                 "section_input string")
    # One task per input keeps granule reads embarrassingly parallel; at
    # real scale the work list is thousands of entries and this is the
    # only parallelism knob the stage needs.
    return work.repartition(min(n, spark.sparkContext.defaultParallelism)) \
               .mapInPandas(ingest, GRANULE_ROWS_SCHEMA)
