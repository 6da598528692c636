"""Python convenience client for the nexus_spark HTTP facade.

Mirror of the reference's notebook client (reference:
client/nexuscli/nexuscli.py:42-198 — module-level ``set_target`` +
``dataset_list`` / ``time_series`` / ``daily_difference_average``
returning ``TimeSeries`` namedtuples of numpy arrays), adapted to this
facade's row-record JSON shape and built on stdlib urllib so notebooks
need no extra dependency.

Usage::

    from nexus_spark import client
    client.set_target("http://127.0.0.1:8083")
    client.dataset_list()
    client.time_series(["sst_a"], (-60, -10, 60, 10),
                       datetime(1995, 1, 1), datetime(1995, 6, 30))
"""

from __future__ import annotations

import json
from collections import namedtuple
from datetime import datetime
from typing import Any, Sequence
from urllib.parse import urlencode
from urllib.request import urlopen

ISO_FORMAT = "%Y-%m-%dT%H:%M:%SZ"

TimeSeries = namedtuple(
    "TimeSeries",
    ("dataset", "time", "mean", "standard_deviation", "count",
     "minimum", "maximum"))

Matchup = namedtuple(
    "Matchup",
    ("primary_id", "secondary_id", "dist_km", "dt_s",
     "p_value", "s_value"))

target = "http://localhost:8083"


def set_target(url: str) -> None:
    """Set the facade endpoint URL (nexuscli.set_target:42-51)."""
    global target
    target = url.rstrip("/")


def _get(path: str, params: dict[str, Any] | None = None):
    qs = "?" + urlencode({k: v for k, v in (params or {}).items()
                          if v is not None}) if params else ""
    with urlopen(f"{target}{path}{qs}", timeout=300) as resp:
        return json.loads(resp.read().decode())


def _bounds(bounding_box) -> str:
    """Accept a (min_lon, min_lat, max_lon, max_lat) sequence or any
    object with a shapely-style ``.bounds``."""
    b = getattr(bounding_box, "bounds", bounding_box)
    return ",".join(str(x) for x in b)


def _iso(dt) -> str:
    return dt.strftime(ISO_FORMAT) if isinstance(dt, datetime) else str(dt)


def dataset_list() -> list[dict]:
    """Datasets with observation count and time extent
    (nexuscli.dataset_list:53-74; /list)."""
    return _get("/list")


def time_series(datasets: Sequence[str] | str, bounding_box,
                start_datetime, end_datetime) -> list[TimeSeries]:
    """Area-averaged time series per dataset
    (nexuscli.time_series:133-198; /stats). Returns one TimeSeries
    namedtuple per dataset, arrays parallel over days."""
    if isinstance(datasets, str):
        datasets = [datasets]
    if not 0 < len(datasets) <= 2:
        raise ValueError("datasets must be a sequence of 1 or 2 items")
    rows = _get("/stats", {
        "ds": ",".join(datasets), "b": _bounds(bounding_box),
        "startTime": _iso(start_datetime), "endTime": _iso(end_datetime)})
    if not rows:
        raise ValueError(
            f"No data found in {_bounds(bounding_box)} between "
            f"{_iso(start_datetime)} and {_iso(end_datetime)} for "
            f"Datasets {list(datasets)}.")
    out = []
    for ds in datasets:
        sel = sorted((r for r in rows if r["dataset"] == ds),
                     key=lambda r: r["ts_date"])
        if sel:
            out.append(TimeSeries(
                dataset=ds,
                time=[r["ts_date"] for r in sel],
                mean=[r["ts_mean"] for r in sel],
                standard_deviation=[r.get("ts_std") for r in sel],
                count=[r.get("ts_cnt") for r in sel],
                minimum=[r.get("ts_min") for r in sel],
                maximum=[r.get("ts_max") for r in sel]))
    return out


def daily_difference_average(dataset: str, bounding_box,
                             start_datetime, end_datetime
                             ) -> list[TimeSeries]:
    """Anomaly (data-minus-climatology) time series
    (nexuscli.daily_difference_average:76-130;
    /dailydifferenceaverage_spark)."""
    rows = _get("/dailydifferenceaverage_spark", {
        "ds": dataset, "climatology": f"{dataset}_CLIM",
        "b": _bounds(bounding_box),
        "startTime": _iso(start_datetime), "endTime": _iso(end_datetime)})
    if not rows:
        raise ValueError(f"No data found for Dataset {dataset}.")
    sel = sorted(rows, key=lambda r: r["dd_date"])
    return [TimeSeries(
        dataset=dataset,
        time=[r["dd_date"] for r in sel],
        mean=[r["dd_mean"] for r in sel],
        standard_deviation=[r.get("dd_std") for r in sel],
        count=None, minimum=None, maximum=None)]


def match_spark(radius_km: float, time_tolerance_s: float,
                match_once: bool = False,
                result_size_limit: int | None = None) -> list[Matchup]:
    """Radius/time matchup pairs (/match_spark). Raises ValueError with
    the 202 payload message when the result exceeds result_size_limit
    (the reference's over-limit response)."""
    import urllib.error

    try:
        rows = _get("/match_spark", {
            "rt": radius_km * 1000.0, "tt": time_tolerance_s,
            "matchOnce": str(match_once).lower(),
            "resultSizeLimit": result_size_limit})
    except urllib.error.HTTPError as err:  # pragma: no cover - transport
        raise ValueError(json.loads(err.read()).get("error", str(err)))
    if isinstance(rows, dict):  # 202 over-limit payload
        raise ValueError(rows.get("message", "result over size limit"))
    return [Matchup(r["primary_id"], r["secondary_id"], r["dist_km"],
                    r["dt_s"], r["p_value"], r["s_value"]) for r in rows]


def subset(datasets: Sequence[str] | str, bounding_box=None,
           start_datetime=None, end_datetime=None,
           limit: int = 100000) -> bytes:
    """ZIP of per-dataset CSVs (/domssubset) — the bulk-download path."""
    if isinstance(datasets, str):
        datasets = [datasets]
    params: dict[str, Any] = {"ds": ",".join(datasets), "output": "ZIP",
                              "limit": limit}
    if bounding_box is not None:
        params["b"] = _bounds(bounding_box)
    if start_datetime is not None:
        params["startTime"] = _iso(start_datetime)
    if end_datetime is not None:
        params["endTime"] = _iso(end_datetime)
    qs = "?" + urlencode(params)
    with urlopen(f"{target}/domssubset{qs}", timeout=300) as resp:
        return resp.read()
