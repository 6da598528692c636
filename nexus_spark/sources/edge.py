"""Paged EDGE in-situ source adapter (DOMS D8).

Reference contract (analysis/webservice/algorithms/doms/fetchedgeimpl.py):
`fetch` issues a first non-parallel page request to learn `totalResults`
and the server-forced `itemsPerPage`, then fans the remaining startIndex
offsets across a ThreadPool (fetchedgeimpl.py:141-173); records are
normalized by `__resultRawToUsable` (:34-59 — ISO time -> ms epoch,
`point` -> lat/lon, platform/device/mission id -> description,
sea_surface_temperature -> sea_water_temperature, "id-" prefix). The
serial variant follows `next` links (insitusubset.py:query_edge:235-247).

Spark-first shape: the ThreadPool becomes `spark.range` over page offsets
+ `mapInPandas` — each executor task fetches and parses ONE page, so a
1000-executor cluster pages a large EDGE store with the same code that
tests against an in-memory fixture. The fetcher is an injected callable
`(url, params) -> decoded-JSON dict`; `http_fetcher` (stdlib urllib, retry
x5 mirroring fetchedgeimpl.__fetchJson:62-77) is the production default
and anything picklable works for tests. The `next`-link protocol is
inherently serial, so `read_edge_next_links` stays driver-side and is the
documented fallback for endpoints without offset paging.
"""

from __future__ import annotations

import json
import math
from datetime import datetime, timezone
from typing import Any, Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str, dict], dict]

# Controlled vocabularies (reference doms/values.py:1-27 — public API data).
PLATFORMS = {1: "ship", 2: "moored surface buoy", 3: "drifting surface float",
             4: "drifting subsurface profiling float",
             5: "autonomous underwater vehicle", 6: "offshore structure",
             7: "coastal structure", 8: "towed unmanned submersible",
             9: "orbiting satellite"}
DEVICES = {1: "bathythermographs", 2: "discrete water samplers", 3: "CTD",
           4: "Current profilers  / acousticDopplerCurrentProfiler",
           5: "radiometers", 6: "scatterometers"}
MISSIONS = {1: "SAMOS", 2: "ICOADS", 3: "Aquarius", 4: "SPURS1"}

# In-situ parameter -> measurement field (insitusubset.py params table).
PARAMETER_FIELDS = {"sst": "sea_water_temperature",
                    "sss": "sea_water_salinity",
                    "wind": "wind_speed"}

EDGE_SCHEMA = ("id string, source string, time double, lat double, "
               "lon double, platform string, device string, mission string, "
               "depth double, data map<string,double>")

_CORE_KEYS = frozenset(("id", "source", "time", "point", "x", "y", "lat",
                        "lon", "latitude", "longitude", "platform", "device",
                        "mission", "depth", "metadata"))


def http_fetcher(url: str, params: dict) -> dict:
    """Stdlib GET-with-retry page fetcher (fetchedgeimpl.__fetchJson:62-77:
    5 tries, any non-200 or bad JSON retries). Module-level so executors
    can pickle it."""
    from urllib.parse import urlencode
    from urllib.request import urlopen

    qs = urlencode({k: v for k, v in params.items() if v is not None},
                   doseq=True)
    last_err: Exception | None = None
    for _ in range(5):
        try:
            with urlopen(f"{url}?{qs}", timeout=500.0) as resp:
                if resp.status != 200:
                    last_err = OSError(f"HTTP {resp.status}")
                    continue
                return json.loads(resp.read().decode())
        except Exception as exc:  # noqa: BLE001 — retry loop boundary
            last_err = exc
    raise RuntimeError(f"Maximum retries attempted: {last_err}")


def _parse_time_ms(raw: Any) -> float:
    """ISO-8601Z (or epoch seconds) -> float ms since epoch
    (fetchedgeimpl.__parseDatetime:13-17)."""
    if isinstance(raw, (int, float)):
        return float(raw) * 1000.0
    dt = datetime.strptime(raw, "%Y-%m-%dT%H:%M:%SZ")
    return dt.replace(tzinfo=timezone.utc).timestamp() * 1000.0


def _parse_location(raw: str) -> tuple[float, float]:
    """'Point(lon lat)' or 'lat,lon' -> (lat, lon)
    (fetchedgeimpl.__parseLocation:20-31)."""
    if "Point" in raw:
        raw = raw[raw.index("(") + 1:-1]
    if "," in raw:
        lat, lon = (float(x) for x in raw.split(","))
    else:
        parts = raw.split(" ")
        lat, lon = float(parts[1]), float(parts[0])
    return lat, lon


def parse_edge_record(rec: dict, source: str) -> tuple:
    """One raw EDGE result dict -> one EDGE_SCHEMA row
    (fetchedgeimpl.__resultRawToUsable:34-59 semantics)."""
    rec = dict(rec)
    if "sea_surface_temperature" in rec:
        rec["sea_water_temperature"] = rec.pop("sea_surface_temperature")
    if "point" in rec:
        lat, lon = _parse_location(rec["point"])
    else:
        lat = rec.get("y", rec.get("lat", rec.get("latitude")))
        lon = rec.get("x", rec.get("lon", rec.get("longitude")))
    rid = rec.get("id", rec.get("metadata"))
    data = {k: float(v) for k, v in rec.items()
            if k not in _CORE_KEYS and isinstance(v, (int, float))
            and not (isinstance(v, float) and math.isnan(v))}
    depth = rec.get("depth", rec.get("sea_water_temperature_depth"))
    return (f"id-{rid}", source, _parse_time_ms(rec["time"]),
            float(lat), float(lon),
            PLATFORMS.get(rec.get("platform"), str(rec.get("platform"))) if
            rec.get("platform") is not None else None,
            DEVICES.get(rec.get("device"), str(rec.get("device"))) if
            rec.get("device") is not None else None,
            MISSIONS.get(rec.get("mission"), str(rec.get("mission"))) if
            rec.get("mission") is not None else None,
            float(depth) if depth is not None else None, data)


_EDGE_COLUMNS = ["id", "source", "time", "lat", "lon", "platform",
                 "device", "mission", "depth", "data"]


def parse_edge_page(records: list, source: str):
    """Vectorized page normalization: one raw EDGE `results` list -> one
    pandas frame in EDGE_SCHEMA column order. Same semantics as mapping
    parse_edge_record over the page (__resultRawToUsable:34-59), but with
    pandas column ops instead of a per-record Python loop — the page task
    is the d8 hot path and the row loop was ~half its cost. The only
    per-row python left is assembling the extras `data` dict (map-typed
    output) and object-dtype fallbacks for mixed-type columns a real
    server should never send.
    """
    import numpy as np
    import pandas as pd

    if not records:
        return pd.DataFrame(columns=_EDGE_COLUMNS)
    df = pd.DataFrame.from_records(records)

    # sea_surface_temperature -> sea_water_temperature. The reference
    # pops per record, so rows WITHOUT sst must keep a native swt value —
    # a column-level overwrite would null them out.
    if "sea_surface_temperature" in df.columns:
        sst = df["sea_surface_temperature"]
        if "sea_water_temperature" in df.columns:
            df["sea_water_temperature"] = sst.where(
                sst.notna(), df["sea_water_temperature"])
        else:
            df["sea_water_temperature"] = sst
        df = df.drop(columns=["sea_surface_temperature"])

    # time: ISO-8601Z string or epoch seconds -> float ms
    t = df["time"]
    if pd.api.types.is_numeric_dtype(t):
        time_ms = t.astype("float64") * 1000.0
    elif pd.api.types.is_string_dtype(t) or t.dtype == object:
        try:
            time_ms = (pd.to_datetime(t, format="%Y-%m-%dT%H:%M:%SZ",
                                      utc=True).astype("int64") / 1e6)
        except (ValueError, TypeError):  # mixed numeric/string page
            time_ms = t.map(_parse_time_ms)
    else:
        time_ms = t.map(_parse_time_ms)

    # location: 'Point(lon lat)' / 'lat,lon' column, else x/y-style fields
    if "point" in df.columns:
        pt = df["point"].astype(str)
        inner = pt.str.extract(r"\((.*)\)", expand=False).where(
            pt.str.contains("Point"), pt)
        is_csv = inner.str.contains(",")
        csv = inner.str.split(",", expand=True).reindex(columns=[0, 1])
        ssv = inner.str.split(" ", expand=True).reindex(columns=[0, 1])
        lat = pd.to_numeric(csv[0].where(is_csv, ssv[1]), errors="raise")
        lon = pd.to_numeric(csv[1].where(is_csv, ssv[0]), errors="raise")
    else:
        lat = lon = None
        for cand in ("y", "lat", "latitude"):
            if cand in df.columns:
                lat = df[cand]
                break
        for cand in ("x", "lon", "longitude"):
            if cand in df.columns:
                lon = df[cand]
                break
        lat = pd.to_numeric(lat, errors="coerce")
        lon = pd.to_numeric(lon, errors="coerce")

    rid = df["id"] if "id" in df.columns else df.get("metadata")
    ids = "id-" + rid.astype(str)

    def vocab_col(name: str, vocab: dict) -> pd.Series:
        if name not in df.columns:
            return pd.Series([None] * len(df), index=df.index, dtype=object)
        s = df[name]
        mapped = s.map(vocab)
        # out-of-vocab -> str(value); missing -> None (reference's
        # None-guard). int columns NaN-coerced to float by pandas render
        # back through int so '3.0' never leaks for an integer code.
        fallback = s.map(
            lambda v: None if v is None
            or (isinstance(v, float) and math.isnan(v))
            else str(int(v)) if isinstance(v, float) and v.is_integer()
            else str(v))
        return mapped.where(mapped.notna(), fallback).astype(object)

    if "depth" in df.columns:
        depth = pd.to_numeric(df["depth"], errors="coerce")
        if "sea_water_temperature_depth" in df.columns:
            depth = depth.fillna(
                pd.to_numeric(df["sea_water_temperature_depth"],
                              errors="coerce"))
    elif "sea_water_temperature_depth" in df.columns:
        depth = pd.to_numeric(df["sea_water_temperature_depth"],
                              errors="coerce")
    else:
        depth = pd.Series(np.nan, index=df.index)

    # extras map: every non-core numeric field, NaN-stripped per row
    extras = [c for c in df.columns if c not in _CORE_KEYS
              and c != "sea_water_temperature_depth"]
    num_extras = {}
    for c in extras:
        col = df[c]
        if pd.api.types.is_numeric_dtype(col):
            num_extras[c] = col.astype("float64").to_numpy()
        elif col.dtype == object:  # mixed page: keep per-value semantics
            num_extras[c] = col.map(
                lambda v: float(v)
                if isinstance(v, (int, float)) and not (
                    isinstance(v, float) and math.isnan(v))
                else np.nan).to_numpy()
    names = list(num_extras)
    cols = [num_extras[c] for c in names]
    data = [{n: v for n, v in zip(names, vals) if v == v}
            for vals in zip(*cols)] if names else [{}] * len(df)

    return pd.DataFrame({
        "id": ids.to_numpy(),
        "source": source,
        "time": np.asarray(time_ms, dtype="float64"),
        "lat": np.asarray(lat, dtype="float64"),
        "lon": np.asarray(lon, dtype="float64"),
        "platform": vocab_col("platform", PLATFORMS),
        "device": vocab_col("device", DEVICES),
        "mission": vocab_col("mission", MISSIONS),
        # NaN -> None so absent depth surfaces as SQL NULL (like the
        # row-wise parser), not a NaN double
        "depth": depth.astype(object).where(depth.notna(), None).to_numpy(),
        "data": data,
    }, columns=_EDGE_COLUMNS)


def _page_params(start_time: str, end_time: str, bbox: str,
                 items_per_page: int, start_index: int,
                 depth_min: float | None, depth_max: float | None,
                 platforms: str | None, variable: str | None) -> dict:
    p = {"startTime": start_time, "endTime": end_time, "bbox": bbox,
         "itemsPerPage": items_per_page, "startIndex": start_index,
         "stats": "true"}
    if depth_min is not None:
        p["minDepth"] = depth_min
    if depth_max is not None:
        p["maxDepth"] = depth_max
    if platforms is not None:
        p["platform"] = platforms.split(",")
    if variable is not None:
        p["variable"] = variable
    return p


def edge_count(endpoint: dict, start_time: str, end_time: str, bbox: str,
               depth_min: float | None = None, depth_max: float | None = None,
               platforms: str | None = None) -> int:
    """totalResults without fetching rows — itemsPerPage=0 probe
    (fetchedgeimpl.getCount:132-138)."""
    fetcher: Fetcher = endpoint.get("fetcher", http_fetcher)
    page = fetcher(endpoint["url"], _page_params(
        start_time, end_time, bbox, 0, 0, depth_min, depth_max,
        platforms, None))
    return int(page["totalResults"])


def read_edge(spark: SparkSession, endpoint: dict, start_time: str,
              end_time: str, bbox: str, depth_min: float | None = None,
              depth_max: float | None = None, platforms: str | None = None,
              variable: str | None = None) -> DataFrame:
    """Distributed offset-paged read of one EDGE endpoint -> EDGE_SCHEMA
    DataFrame.

    Page 1 is fetched at the driver (exactly the reference's first
    non-parallel call, fetchedgeimpl.fetch:147-155 — it alone knows
    `totalResults` and the server-FORCED page size, which may differ from
    the requested one). Remaining offsets become `spark.range` rows, one
    page per task via mapInPandas — the executor-pool analog of
    fetchThreads (:157-162) that scales with the cluster instead of one
    process's threads. Each task holds one page (<= itemsPerPage rows) in
    memory; no driver accumulation of the full result set.
    """
    # The page-fetch closure references this module's parse helpers; ship
    # the module by value with the task so executors need no --py-files
    # deployment of nexus_spark (documented cloudpickle API — the same
    # mechanism Spark uses for any dynamic closure).
    import sys

    import pyspark.cloudpickle as _cp
    _cp.register_pickle_by_value(sys.modules[__name__])

    fetcher: Fetcher = endpoint.get("fetcher", http_fetcher)
    url, name = endpoint["url"], endpoint.get("name", "edge")
    req_ipp = int(endpoint.get("itemsPerPage", 1000))

    first = fetcher(url, _page_params(start_time, end_time, bbox, req_ipp, 0,
                                      depth_min, depth_max, platforms,
                                      variable))
    total = int(first["totalResults"])
    first_results = first.get("results", [])
    n0 = len(first_results)
    if n0 == 0:
        return spark.createDataFrame([], EDGE_SCHEMA)
    ipp = int(first.get("itemsPerPage", req_ipp)) or req_ipp
    # Page count including the already-fetched first page: its raw
    # results ride into the page tasks inside the closure (bounded by one
    # page size), so NO page is fetched twice and NO record is parsed at
    # the driver — normalization runs vectorized on executors only.
    n_pages = 1 + max(0, -(-(total - n0) // ipp))

    def fetch_pages(batches: Iterator) -> Iterator:
        for batch in batches:
            for start in batch["start"]:
                results = first_results if int(start) < 0 else fetcher(
                    url, _page_params(start_time, end_time, bbox, ipp,
                                      int(start), depth_min, depth_max,
                                      platforms, variable)).get("results", [])
                yield parse_edge_page(results, name)

    # spark.range with an explicit partition count: one task per page (up
    # to 64) with NO shuffle — a parallelize+repartition would spin up
    # defaultParallelism empty tasks plus an exchange just to seed the
    # offset list. start<0 marks the embedded first page; later pages
    # begin at n0 (the server may have forced a different page size than
    # requested, so page-2+ offsets stride by ITS ipp from n0).
    return (spark.range(0, n_pages, 1, min(n_pages, 64))
            .select(F.when(F.col("id") == 0, F.lit(-1).cast("long"))
                    .otherwise(F.lit(n0) + (F.col("id") - 1) * ipp)
                    .alias("start"))
            .mapInPandas(fetch_pages, EDGE_SCHEMA))


def read_edge_next_links(spark: SparkSession, endpoint: dict,
                         params: dict) -> DataFrame:
    """Serial `next`-link pager (insitusubset.query_edge:235-247) for
    endpoints without offset paging. Driver-side by protocol necessity —
    each page's URL is only known after the previous page arrives — so use
    only for bounded subsets; `read_edge` is the scale path."""
    fetcher: Fetcher = endpoint.get("fetcher", http_fetcher)
    name = endpoint.get("name", "edge")
    page = fetcher(endpoint["url"], params)
    rows = [parse_edge_record(r, name) for r in page.get("results", [])]
    next_url = page.get("next")
    while next_url:
        page = fetcher(next_url, {})
        rows.extend(parse_edge_record(r, name)
                    for r in page.get("results", []))
        next_url = page.get("next")
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def insitu_subset(spark: SparkSession, endpoint: dict, start_time: str,
                  end_time: str, bbox: str, parameter: str | None = None,
                  depth_min: float | None = None,
                  depth_max: float | None = None,
                  platforms: str | None = None) -> DataFrame:
    """D8 /domsinsitusubset (insitusubset.py:161-171): paged fetch of one
    in-situ source filtered to the search domain; `parameter` narrows to
    one measurement ('sst'|'sss'|'wind') surfaced as a `value` column."""
    if parameter is not None and parameter not in PARAMETER_FIELDS:
        raise ValueError(f"Parameter {parameter} not supported. Must be one "
                         "of 'sst', 'sss', 'wind'.")
    if (depth_min is not None and depth_max is not None
            and depth_min >= depth_max):
        raise ValueError("Depth Min should be less than Depth Max")
    field = PARAMETER_FIELDS.get(parameter) if parameter else None
    df = read_edge(spark, endpoint, start_time, end_time, bbox,
                   depth_min=depth_min, depth_max=depth_max,
                   platforms=platforms, variable=field)
    if field is not None:
        df = (df.withColumn("value", F.col("data")[field])
                .where(F.col("value").isNotNull()))
    return df


def edge_bounds(df: DataFrame) -> dict[str, float]:
    """Actual data bounds of a fetched frame — the BoundsConstrainer fold
    (fetchedgeimpl.py:94-111) as one aggregate."""
    row = df.agg(F.max("lat").alias("north"), F.min("lat").alias("south"),
                 F.min("lon").alias("west"), F.max("lon").alias("east")
                 ).collect()[0]
    return {"north": row.north, "south": row.south,
            "west": row.west, "east": row.east}


def make_fixture_endpoint(records: list[dict], name: str = "fixture",
                          items_per_page: int = 25,
                          forced_items_per_page: int | None = None,
                          spark: SparkSession | None = None) -> dict:
    """In-memory EDGE endpoint for tests: offset paging + totalResults
    over a records list, honoring bbox/time/depth/platform filters the way
    a real EDGE server would. `forced_items_per_page` simulates a server
    that overrides the requested page size (the reason read_edge trusts
    the response's itemsPerPage, not its own request).

    The filterable fields (location, time, depth, platform, variable
    presence) are parsed ONCE at construction into numpy columns, so
    each page request evaluates the filters as vectorized boolean masks
    over the whole corpus instead of a per-record Python loop — a real
    EDGE server does its filtering in an index, and without this the
    fixture (not the adapter) dominates benchmarks superlinearly: every
    page TASK deserializes a fresh fetcher copy (the per-process memo
    never hits across tasks), so a record-loop fixture costs
    O(records x pages) parses end-to-end. The matched-index array is
    additionally memoized per filter key for tasks that serve several
    pages of one query; only the served page materializes record dicts.

    Pass `spark` to ship the corpus + columns as a Spark broadcast
    instead of inside the task closure: with many pages the closure
    otherwise re-serializes everything to every page task (measured
    seconds at 10k records x 30 pages), while a broadcast moves it once
    per executor — the same fix production code uses for any large
    side-input."""
    import numpy as np
    import pandas as pd

    n = len(records)
    # time: ISO-8601Z strings parsed with pandas' vectorized C parser;
    # numeric epochs pass straight through (both _parse_time_ms forms).
    time_raw = pd.Series([r["time"] for r in records], dtype=object)
    as_num = pd.to_numeric(time_raw, errors="coerce")
    time_ms = as_num.to_numpy(dtype=np.float64) * 1000.0
    str_mask = as_num.isna().to_numpy()
    if str_mask.any():
        parsed = pd.to_datetime(time_raw[str_mask],
                                format="%Y-%m-%dT%H:%M:%SZ", utc=True)
        time_ms[str_mask] = parsed.astype("int64").to_numpy() / 1e6
    # location: 'Point(lon lat)' / 'lat,lon' (_parse_location), via
    # vectorized string ops instead of 200k-iteration Python loops.
    pts = pd.Series([r["point"] for r in records], dtype=object) \
        .astype("string")
    inner = pts.str.extract(r"\(([^)]*)\)", expand=False).fillna(pts)
    lat = np.empty(n); lon = np.empty(n)
    cm = inner.str.contains(",").fillna(False).to_numpy()
    if cm.any():
        seg = inner[cm].str.split(",", expand=True)
        lat[cm] = pd.to_numeric(seg[0], errors="coerce")
        lon[cm] = pd.to_numeric(seg[1], errors="coerce")
    if (~cm).any():
        seg = inner[~cm].str.strip().str.split(r"\s+", expand=True,
                                               regex=True)
        lon[~cm] = pd.to_numeric(seg[0], errors="coerce")
        lat[~cm] = pd.to_numeric(seg[1], errors="coerce")
    cols = {
        "lat": lat, "lon": lon, "time_ms": time_ms,
        "depth": np.array([float(r.get("depth", 0.0)) for r in records],
                          dtype=np.float64),
        # platform may be absent: sentinel that matches no real id
        "platform": np.array([int(r.get("platform", -(2 ** 31)))
                              for r in records], dtype=np.int64),
    }
    for v in set(PARAMETER_FIELDS.values()):
        cols[f"has:{v}"] = np.array(
            [v in r or (v == "sea_water_temperature"
                        and "sea_surface_temperature" in r)
             for r in records], dtype=bool)

    payload = (records, cols)
    b_payload = None
    if spark is not None:
        b_payload = spark.sparkContext.broadcast(payload)
        # Drop the local reference so fetcher/_select close over ONLY the
        # broadcast handle: otherwise every page task re-pickles the full
        # corpus + parsed columns into its closure and the broadcast
        # saves nothing.
        payload = None
    memo: dict[tuple, Any] = {}

    def _payload():
        return b_payload.value if b_payload is not None else payload

    def _select(params: dict):
        """Indices (np.ndarray, corpus order) of records matching the
        query filters."""
        key = (str(params.get("bbox")), str(params["startTime"]),
               str(params["endTime"]), str(params.get("minDepth")),
               str(params.get("maxDepth")),
               str(sorted(params.get("platform") or [])),
               str(params.get("variable")))
        got = memo.get(key)
        if got is not None:
            return got
        _, c = _payload()
        mask = ((c["time_ms"] >= _parse_time_ms(params["startTime"]))
                & (c["time_ms"] <= _parse_time_ms(params["endTime"])))
        if "bbox" in params:
            w, s, e, n = (float(x) for x in str(params["bbox"]).split(","))
            mask &= ((c["lat"] >= s) & (c["lat"] <= n)
                     & (c["lon"] >= w) & (c["lon"] <= e))
        if params.get("minDepth") is not None:
            mask &= c["depth"] >= float(params["minDepth"])
        if params.get("maxDepth") is not None:
            mask &= c["depth"] <= float(params["maxDepth"])
        if params.get("platform"):
            mask &= np.isin(c["platform"],
                            [int(p) for p in params["platform"]])
        if params.get("variable"):
            has = c.get(f"has:{params['variable']}")
            if has is None:  # variable outside the precomputed set
                recs = _payload()[0]
                has = np.array([params["variable"] in r for r in recs],
                               dtype=bool)
            mask &= has
        idx = np.nonzero(mask)[0]
        memo[key] = idx
        return idx

    def fetcher(url: str, params: dict) -> dict:
        idx = _select(params)
        recs = _payload()[0]
        ipp = forced_items_per_page or int(params.get("itemsPerPage", 1000))
        start = int(params.get("startIndex", 0))
        page = ([recs[i] for i in idx[start:start + ipp]] if ipp else [])
        return {"totalResults": int(idx.size), "startIndex": start,
                "itemsPerPage": ipp, "results": page}

    return {"name": name, "url": f"fixture://{name}",
            "itemsPerPage": items_per_page, "fetchThreads": 8,
            "fetcher": fetcher}
