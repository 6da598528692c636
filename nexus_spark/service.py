"""Thin HTTP facade over the operator library.

The reference's entire query surface is HTTP (reference:
analysis/webservice/webapp.py:169-256 route table; webmodel.py:138-341
parameter parsing/validation — malformed requests get a 400 before any
compute). This module reproduces that surface with the stdlib
ThreadingHTTPServer: each route is ~3 lines of param parsing plus one
operator call from MIGRATION.md's table, and the content negotiation
(`output=JSON|CSV|PNG|ZIP`, webapp.py:99-136) reuses plans/render.

The service is a presentation shim, not an execution layer — every
request plans a Spark job; Spark schedules concurrent jobs from the
threaded handlers (FAIR/FIFO is a SparkConf concern, not ours). At
deployment the session would point at the production lake instead of a
test sf_dir.
"""

from __future__ import annotations

import json
import re
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession

_SHORTNAME = re.compile(r"^[a-zA-Z0-9_\-,.]+$")


class RequestError(ValueError):
    """Maps to HTTP 400 — the NexusProcessingException(code=400) analog."""


class Accepted(Exception):
    """Maps to HTTP 202 with a JSON body — the reference's over-limit
    matchup response (Matchup.py:269-275 returns a 202-style payload when
    the result exceeds resultSizeLimit instead of streaming it)."""

    def __init__(self, payload: dict):
        super().__init__(payload.get("message", "accepted"))
        self.payload = payload


class Params:
    """Query-param accessors mirroring the reference's getters
    (webmodel.py:148-233): typed parses with defaults, shortname
    validation, ISO-8601-Z-or-epoch datetimes."""

    def __init__(self, query: dict[str, list[str]]):
        self._q = {k: v[-1] for k, v in query.items()}

    def get(self, name: str, default: str | None = None) -> str | None:
        return self._q.get(name, default)

    def get_float(self, name: str, default: float | None = None) -> float | None:
        raw = self._q.get(name)
        if raw is None:
            return default
        try:
            return float(raw)
        except ValueError:
            raise RequestError(f"'{name}' is not a number: {raw!r}")

    def get_int(self, name: str, default: int | None = None) -> int | None:
        raw = self._q.get(name)
        if raw is None:
            return default
        try:
            return int(raw)
        except ValueError:
            raise RequestError(f"'{name}' is not an integer: {raw!r}")

    _TRUE = ("true", "1", "t", "y", "yes", "True", "T", "Y", "Yes")
    _FALSE = ("false", "0", "f", "n", "no", "False", "F", "N", "No")

    def get_bool(self, name: str, default: bool = False) -> bool:
        raw = self._q.get(name)
        if raw is None:
            return default
        return raw in self._TRUE

    def get_strict_bool(self, name: str, default: bool = False) -> bool:
        """Boolean that 400s on unrecognized values (webmodel.py boolean
        getters reject rather than coerce)."""
        raw = self._q.get(name)
        if raw is None:
            return default
        if raw in self._TRUE:
            return True
        if raw in self._FALSE:
            return False
        raise RequestError(f"'{name}' is not a boolean: {raw!r}")

    def get_datetime(self, name: str, default: str | None = None) -> str | None:
        """Accepts %Y-%m-%dT%H:%M:%SZ or epoch seconds (webmodel.py:196-204);
        returns the 'YYYY-mm-dd HH:MM:SS' form the operators take."""
        raw = self._q.get(name)
        if raw is None:
            return default
        try:
            dt = datetime.strptime(raw, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            try:
                dt = datetime.fromtimestamp(int(raw), tz=timezone.utc)
            except (ValueError, OverflowError):
                raise RequestError(f"'{name}' is not ISO8601Z or epoch: {raw!r}")
        return dt.strftime("%Y-%m-%d %H:%M:%S")

    def get_dataset(self, name: str = "ds", required: bool = True) -> str | None:
        ds = self._q.get(name)
        if ds is None:
            if required:
                raise RequestError(f"missing required parameter '{name}'")
            return None
        if not _SHORTNAME.match(ds):
            raise RequestError(f"invalid shortname: {ds!r}")
        return ds

    def get_datasets(self, name: str = "ds") -> list[str]:
        return self.get_dataset(name).split(",")

    def get_bbox(self) -> dict[str, float]:
        """`b=minLon,minLat,maxLon,maxLat` (webmodel.py:226-229), validated
        with the library's 400-table (functions/validation.py)."""
        from nexus_spark.functions.validation import validate_bbox

        raw = self._q.get("b")
        if raw is None:
            box = dict(min_lon=-180.0, min_lat=-90.0,
                       max_lon=180.0, max_lat=90.0)
        else:
            try:
                w, s, e, n = (float(x) for x in raw.split(","))
            except ValueError:
                raise RequestError(f"'b' must be minLon,minLat,maxLon,maxLat: {raw!r}")
            box = dict(min_lon=w, min_lat=s, max_lon=e, max_lat=n)
        try:
            validate_bbox(box["min_lat"], box["max_lat"],
                          box["min_lon"], box["max_lon"])
        except ValueError as exc:
            raise RequestError(str(exc))
        return box

    def bounds(self) -> dict[str, Any]:
        out: dict[str, Any] = dict(self.get_bbox())
        out["start_time"] = self.get_datetime("startTime")
        out["end_time"] = self.get_datetime("endTime")
        return out


def _with_lowpass(spark: SparkSession, ts: DataFrame) -> DataFrame:
    """Join a Butterworth low-pass column onto a time-series result.

    The filtfilt recursion is inherently sequential over one
    already-day-aggregated series (reference Filtering.py:87-97), so each
    dataset's series — bounded at |days| rows by construction — is filtered
    driver-side and joined back on (dataset, ts_date)."""
    import numpy as np

    from nexus_spark.functions.filtering import low_pass_filter

    rows = ts.select("dataset", "ts_date", "ts_mean") \
             .orderBy("dataset", "ts_date").collect()
    out: list[tuple] = []
    by_ds: dict[str, list] = {}
    for r in rows:
        by_ds.setdefault(r["dataset"], []).append(r)
    for ds, series in by_ds.items():
        vals = np.array([r["ts_mean"] if r["ts_mean"] is not None else np.nan
                         for r in series])
        idx = np.arange(len(vals))
        good = ~np.isnan(vals)
        if good.sum() < 2:
            smooth = vals
        else:
            filled = np.interp(idx, idx[good], vals[good])
            smooth = low_pass_filter(filled, cutoff=12.0, order=9)
        out.extend((ds, r["ts_date"], float(v))
                   for r, v in zip(series, smooth))
    lp = spark.createDataFrame(out, "dataset string, ts_date date,"
                                    " ts_mean_lowpass double")
    return ts.join(lp, ["dataset", "ts_date"], "left")


def build_routes(spark: SparkSession, sf_dir: str,
                 edge_endpoints: dict[str, dict] | None = None,
                 warehouse_dir: str | None = None
                 ) -> dict[str, Callable[[Params], Any]]:
    """Route table (webapp.py:169-256). Each handler returns a DataFrame
    (content-negotiated) or a plain dict/list (JSON only). Handlers that
    are map-shaped return (df, grid_value_col) so `output=PNG` can render."""
    from pyspark.sql import functions as F

    from nexus_spark import capabilities, domain
    from nexus_spark.operators.correlation import corr_map
    from nexus_spark.operators.daily_difference import daily_difference
    from nexus_spark.operators.hofmoeller import hofmoeller
    from nexus_spark.operators.maps import clim_map, lonlat_map, time_avg_map
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.tile_service import (data_in_bounds,
                                                    dataset_list,
                                                    doms_dataset_list,
                                                    nearest_value,
                                                    tiles_in_box)
    from nexus_spark.operators.timeseries import time_series
    from nexus_spark.functions.validation import (validate_month,
                                                  validate_tolerances)

    def obs() -> DataFrame:
        return domain.observations(spark, sf_dir)

    def r_time_series(p: Params):
        ts = time_series(obs(), datasets=p.get_datasets(), **p.bounds())
        # Optional series filters (reference TimeSeriesSpark.py:192-227
        # applies seasonalFilter/lowPassFilter from request params).
        if p.get_strict_bool("seasonalFilter"):
            from nexus_spark.functions.filtering import seasonal_cycle_filter
            ts = seasonal_cycle_filter(ts, "ts_mean", "ts_date",
                                       partition_cols=["dataset"],
                                       out_col="ts_mean_seasonal")
        if p.get_strict_bool("lowPassFilter"):
            ts = _with_lowpass(spark, ts)
        return ts

    def r_time_avg_map(p: Params):
        return time_avg_map(obs(), dataset=p.get_dataset(), **p.bounds()), "map_mean"

    def r_clim_map(p: Params):
        month = p.get_int("month", 1)
        try:
            validate_month(month)
        except ValueError as exc:
            raise RequestError(str(exc))
        return clim_map(obs(), month=month, dataset=p.get_dataset(),
                        **p.get_bbox()), "clim_mean"

    def r_corr_map(p: Params):
        return corr_map(obs(), p.get_dataset("ds1"), p.get_dataset("ds2"),
                        **p.bounds()), "corr_r"

    def r_lonlat_map(p: Params):
        return lonlat_map(obs(), dataset=p.get_dataset(), **p.bounds()), "ll_mean"

    def r_hofmoeller(axis: str):
        def handler(p: Params):
            return hofmoeller(obs(), axis=axis, dataset=p.get_dataset(),
                              **p.bounds())
        return handler

    def r_daily_difference(p: Params):
        ds = p.get_dataset()
        clim_ds = p.get("climatology", f"{ds}_CLIM")
        return daily_difference(obs(), domain.climatology(spark, sf_dir),
                                ds, clim_ds)

    def r_matchup(p: Params):
        radius_m = p.get_float("rt", 1000.0)
        tt = p.get_float("tt", 86400.0)
        try:
            validate_tolerances(radius_m / 1000.0, tt)
        except ValueError as exc:
            raise RequestError(str(exc))
        result = matchup(domain.matchup_primary(spark, sf_dir),
                         domain.matchup_secondary(spark, sf_dir),
                         radius_km=radius_m / 1000.0, time_tolerance_s=tt,
                         match_once=p.get_bool("matchOnce"))
        # resultSizeLimit gate (reference Matchup.py:111-118,269-275): an
        # over-limit result returns a 202-style JSON instead of the rows.
        # The count is one extra aggregate job over the already-planned
        # join — never a second matchup materialization at the driver.
        limit = p.get_int("resultSizeLimit", 0)
        if limit and limit > 0:
            n = result.count()
            if n > limit:
                raise Accepted({
                    "code": 202,
                    "message": f"result size {n} exceeds "
                               f"resultSizeLimit {limit}; narrow the "
                               "query or raise the limit",
                    "result_count": n,
                    "resultSizeLimit": limit,
                })
        return result

    def r_data_in_bounds(p: Params):
        return data_in_bounds(obs(), dataset=p.get_dataset(required=False),
                              **p.bounds())

    def r_nearest(p: Params):
        lat, lon = p.get_float("latitude"), p.get_float("longitude")
        if lat is None or lon is None:
            raise RequestError("latitude and longitude are required")
        return nearest_value(obs(), p.get_dataset(), lat, lon)

    def r_tiles(p: Params):
        return tiles_in_box(domain.tiles(spark, sf_dir), **p.get_bbox())

    def r_subset(p: Params):
        from pyspark.sql import functions as F
        frames = {ds: obs().where(F.col("dataset") == ds)
                  for ds in p.get_datasets()}
        return frames  # ZIP-only payload

    def _fetch_insitu(p: Params, parameter: str | None):
        # Shared EDGE fetch for /domsinsitusubset (insitusubset.py:100-171)
        # and /domsvalues (doms/ValuesQuery.py:14-55 — same datafetch, no
        # parameter narrowing). The endpoint registry is injected at
        # serve() time (the reference's doms/config.py endpoint list);
        # tests inject a fixture endpoint.
        from nexus_spark.sources.edge import insitu_subset
        source = p.get("source")
        if source is None or source.strip() == "":
            raise RequestError("'source' argument is required")
        endpoint = (edge_endpoints or {}).get(source)
        if endpoint is None:
            raise RequestError(f"unknown in situ source: {source!r}")
        start = p.get_datetime("startTime")
        end = p.get_datetime("endTime")
        if start is None or end is None:
            raise RequestError("startTime and endTime are required")
        if start > end:
            raise RequestError("The starting time must be before the "
                               "ending time. Received startTime: "
                               f"{start}, endTime: {end}")
        platforms = p.get("platforms")
        if platforms is not None:
            try:
                [int(x) for x in platforms.split(",")]
            except ValueError:
                raise RequestError("platforms must be a comma-delimited "
                                   "list of integers")
        box = p.get_bbox()
        bbox = (f"{box['min_lon']},{box['min_lat']},"
                f"{box['max_lon']},{box['max_lat']}")
        iso = "%Y-%m-%dT%H:%M:%SZ"
        try:
            return insitu_subset(
                spark, endpoint,
                datetime.strptime(start, "%Y-%m-%d %H:%M:%S").strftime(iso),
                datetime.strptime(end, "%Y-%m-%d %H:%M:%S").strftime(iso),
                bbox, parameter=parameter,
                depth_min=p.get_float("depthMin"),
                depth_max=p.get_float("depthMax"), platforms=platforms)
        except ValueError as exc:
            raise RequestError(str(exc))

    def r_insitu_subset(p: Params):
        return _fetch_insitu(p, p.get("parameter"))

    def r_stats_summary(p: Params):
        # /statsSolr (A2, reference algorithms/TimeSeriesSolr.py:284-329):
        # metadata-accelerated area stats — interior tiles from the
        # ingest-maintained summary table, boundary slivers recomputed.
        from nexus_spark import domain as _domain
        from nexus_spark.plans.summary import stats_from_summary
        box = p.get_bbox()
        return stats_from_summary(
            obs(),
            _domain.summary_table(spark, sf_dir,
                                  lat_tile_deg=10.0, lon_tile_deg=60.0),
            p.get_dataset(), box["min_lat"], box["max_lat"],
            box["min_lon"], box["max_lon"],
            lat_tile_deg=10.0, lon_tile_deg=60.0)

    def r_delay(p: Params):
        # /delay (reference DelayTest.py:11-29 sleeps a fixed 10 s); the
        # optional `t` param keeps the route testable without the wait.
        import time as _time
        _time.sleep(min(p.get_float("t", 10.0), 10.0))
        return ""

    def r_makeerror(p: Params):
        # /makeerror (ErrorTosserTest.py:8-23): unhandled error -> 500.
        return 100 / 0.0

    def r_correlation_map(p: Params):
        # /correlationMap (reference algorithms/CorrelationMap.py:16-129):
        # gridded two-dataset correlation at a user resolution (`res`,
        # default 1.0 degree).
        ds = p.get_datasets()
        if len(ds) != 2:
            raise RequestError(
                "Requires two datasets for comparison. Specify request "
                "parameter ds=Dataset_1,Dataset_2")
        res = p.get_float("res", 1.0)
        if res is None or res <= 0:
            raise RequestError(f"'res' must be a positive number: {res!r}")
        return corr_map(obs(), ds[0], ds[1], resolution=res,
                        **p.bounds()), "corr_r"

    def r_doms_values(p: Params):
        # /domsvalues (doms/ValuesQuery.py:14-55): full-record in-situ
        # value lookup over the search domain — the insitu fetch without
        # parameter narrowing.
        return _fetch_insitu(p, None)

    def r_doms_metadata(p: Params):
        # /domsmetadata (doms/MetadataQuery.py:13-50). The reference
        # proxies an external UMM metadata URL per dataset; lake-native
        # form serves the catalog row (counts + extents) for the dataset.
        dataset = p.get("dataset")
        if dataset is None or len(dataset) == 0:
            raise RequestError("'dataset' parameter not specified")
        rows = (doms_dataset_list(obs(), load_table(spark, sf_dir, "events"))
                .where(F.col("dataset") == dataset).collect())
        if not rows:
            raise RequestError(f"Dataset '{dataset}' not found")
        return rows[0].asDict()

    def r_doms_stats(p: Params):
        # /domsstats (doms/StatsQuery.py:10-52): in-situ result count for
        # a search domain without fetching rows (datafetch.getCount — the
        # itemsPerPage=0 probe). Mirrors the reference's raw `s`/`e`
        # time params passed through to the endpoint.
        from nexus_spark.sources.edge import edge_count
        source = p.get("source")
        if source is None or source.strip() == "":
            raise RequestError("'source' argument is required")
        endpoint = (edge_endpoints or {}).get(source)
        if endpoint is None:
            raise RequestError(f"Source '{source}' not found")
        start = p.get("s") or p.get("startTime")
        end = p.get("e") or p.get("endTime")
        if start is None or end is None:
            raise RequestError("'s' and 'e' time arguments are required")
        box = p.get_bbox()
        bbox = (f"{box['min_lon']},{box['min_lat']},"
                f"{box['max_lon']},{box['max_lat']}")
        n = edge_count(endpoint, start, end, bbox,
                       depth_min=p.get_float("depthMin"),
                       depth_max=p.get_float("depthMax"),
                       platforms=p.get("platforms"))
        return {"count": n, "source": source, "startTime": start,
                "endTime": end, "bbox": bbox}

    def _load_results(p: Params):
        import uuid as _uuid

        from nexus_spark.operators.results_store import load_execution
        eid = p.get("id")
        try:
            _uuid.UUID(eid)
        except (ValueError, TypeError):
            raise RequestError("'id' argument must be a valid uuid")
        if warehouse_dir is None:
            raise RequestError("results warehouse not configured")
        try:
            return load_execution(spark, warehouse_dir, eid)
        except FileNotFoundError:
            raise RequestError(f"Execution '{eid}' not found")

    def r_doms_results(p: Params):
        # /domsresults (doms/ResultsRetrieval.py:10-30): re-serve a stored
        # matchup execution by id; simpleResults trims to the core match
        # columns (trim_data analog).
        df, _meta = _load_results(p)
        if p.get_strict_bool("simpleResults"):
            df = df.select("primary_id", "secondary_id", "dist_km", "dt_s")
        return df

    def r_doms_plot(p: Params):
        # /domsplot (doms/ResultsPlotQuery.py:15-40): scatter | map |
        # histogram rendering of a stored execution. Returns PNG bytes
        # directly (the reference returns the rendered image payload).
        from nexus_spark.plans.render import (histogram_payload,
                                              histogram_png, scatter_png)
        df, _meta = _load_results(p)
        plot_type = p.get("type", "scatter")
        if plot_type == "scatter":
            return scatter_png(df, "p_value", "s_value")
        if plot_type == "map":
            # match-density map: 2-D binned counts over primary locations
            return scatter_png(df, "p_lon", "p_lat")
        if plot_type == "histogram":
            diff = df.withColumn("value_diff",
                                 F.col("p_value") - F.col("s_value"))
            return histogram_png(histogram_payload(diff, "value_diff"))
        raise RequestError(f"Unsupported plot type '{plot_type}' specified.")

    return {
        "/timeSeriesSpark": r_time_series,
        "/stats": r_time_series,
        "/statsSolr": r_stats_summary,
        "/timeAvgMapSpark": r_time_avg_map,
        "/timeAvgMap": r_time_avg_map,
        "/climMapSpark": r_clim_map,
        "/corrMapSpark": r_corr_map,
        "/longitudeLatitudeMap": r_lonlat_map,
        "/latitudeTimeHofMoellerSpark": r_hofmoeller("lat"),
        "/longitudeTimeHofMoellerSpark": r_hofmoeller("lon"),
        "/latitudeTimeHofMoeller": r_hofmoeller("lat"),
        "/longitudeTimeHofMoeller": r_hofmoeller("lon"),
        "/dailydifferenceaverage_spark": r_daily_difference,
        "/dailydifferenceaverage": r_daily_difference,
        "/match_spark": r_matchup,
        "/domsmatchup": r_matchup,
        "/delay": r_delay,
        "/makeerror": r_makeerror,
        "/datainbounds": r_data_in_bounds,
        "/standardDeviation": r_nearest,
        "/tiles": r_tiles,
        "/list": lambda p: dataset_list(obs()),
        "/domslist": lambda p: doms_dataset_list(
            obs(), load_table(spark, sf_dir, "events")),
        "/domssubset": r_subset,
        "/domsinsitusubset": r_insitu_subset,
        "/correlationMap": r_correlation_map,
        "/domsvalues": r_doms_values,
        "/domsmetadata": r_doms_metadata,
        "/domsstats": r_doms_stats,
        "/domsresults": r_doms_results,
        "/domsplot": r_doms_plot,
        "/capabilities": lambda p: capabilities(),
        "/heartbeat": lambda p: {"online": True},
        "/version": lambda p: {"version": __import__("nexus_spark").__version__},
    }


def _negotiate(result: Any, p: Params) -> tuple[bytes, str]:
    """Content negotiation (webapp.py:99-136): JSON default; CSV and PNG
    and ZIP per `output`."""
    from nexus_spark.plans.render import (_csv_bytes, to_grid, to_json_records,
                                          to_png, to_zip_subset)

    output = (p.get("output", "JSON") or "JSON").upper()
    grid_col = None
    if isinstance(result, tuple):
        result, grid_col = result

    if isinstance(result, bytes):  # pre-rendered image payload (/domsplot)
        return result, "image/png"

    if isinstance(result, dict) and result and all(
            isinstance(v, DataFrame) for v in result.values()):
        if output != "ZIP":
            raise RequestError("this endpoint only supports output=ZIP")
        return to_zip_subset(result, limit=p.get_int("limit", 100000)), \
            "application/zip"
    if not isinstance(result, DataFrame):
        return json.dumps(result).encode(), "application/json"

    # Every DataFrame response is size-bounded (the reference enforces a
    # result bound on every endpoint); callers raise the cap explicitly.
    row_cap = p.get_int("limit", 100000)
    if output == "JSON":
        return to_json_records(result, limit=row_cap).encode(), \
            "application/json"
    if output == "CSV":
        return _csv_bytes(result, limit=row_cap).encode(), "text/csv"
    if output == "PNG":
        if grid_col is None:
            raise RequestError("output=PNG is only valid for map endpoints")
        return to_png(to_grid(result, grid_col)), "image/png"
    raise RequestError(f"unsupported output type: {output}")


class _ResponseCache:
    """TTL response cache keyed on the full request path — the reference
    decorates every handler with a 60-second results cache
    (webmodel.py:481-514 cached(ttl=timedelta(seconds=...))). Entries are
    (expiry, body, ctype); expired entries are dropped on access, and the
    store is bounded (oldest-expiry eviction) so a scan of distinct URLs
    cannot grow it without limit."""

    def __init__(self, ttl_s: float = 60.0, max_entries: int = 256):
        self.ttl_s, self.max_entries = ttl_s, max_entries
        self._d: dict[str, tuple[float, bytes, str]] = {}
        self._lock = threading.Lock()

    def get(self, key: str):
        import time
        with self._lock:
            hit = self._d.get(key)
            if hit is None:
                return None
            if hit[0] < time.monotonic():
                del self._d[key]
                return None
            return hit[1], hit[2]

    def put(self, key: str, body: bytes, ctype: str) -> None:
        import time
        with self._lock:
            if len(self._d) >= self.max_entries:
                oldest = min(self._d, key=lambda k: self._d[k][0])
                del self._d[oldest]
            self._d[key] = (time.monotonic() + self.ttl_s, body, ctype)

    def clear(self) -> None:
        with self._lock:
            self._d.clear()


class _Handler(BaseHTTPRequestHandler):
    routes: dict[str, Callable[[Params], Any]] = {}
    spark: SparkSession | None = None
    cache: _ResponseCache | None = None

    def log_message(self, *args):  # quiet test output
        pass

    def do_GET(self):
        url = urlparse(self.path)
        handler = self.routes.get(url.path)
        if handler is None:
            self._send(404, json.dumps(
                {"error": f"no such endpoint: {url.path}"}).encode(),
                "application/json")
            return
        if self.cache is not None:
            hit = self.cache.get(self.path)
            if hit is not None:
                self._send(200, hit[0], hit[1])
                return
        p = Params(parse_qs(url.query))
        # Each request runs in its own handler thread; tagging the thread
        # with a scheduler pool gives concurrent requests FAIR sharing of
        # the one SparkContext (the reference's spark.scheduler.mode=FAIR,
        # webapp.py:219 — pool config is a SparkConf concern, the tag is
        # ours). Local properties are per-thread, so this is safe under
        # the ThreadingHTTPServer.
        if self.spark is not None:
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", "interactive")
        try:
            body, ctype = _negotiate(handler(p), p)
            if self.cache is not None:
                self.cache.put(self.path, body, ctype)
            self._send(200, body, ctype)
        except Accepted as exc:
            self._send(202, json.dumps(exc.payload).encode(),
                       "application/json")
        except RequestError as exc:
            self._send(400, json.dumps({"error": str(exc)}).encode(),
                       "application/json")
        except Exception as exc:  # noqa: BLE001 — 500 boundary
            self._send(500, json.dumps({"error": repr(exc)}).encode(),
                       "application/json")

    def _send(self, status: int, body: bytes, ctype: str):
        self.send_response(status)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def serve(spark: SparkSession, sf_dir: str, port: int = 0,
          edge_endpoints: dict[str, dict] | None = None,
          cache_ttl_s: float = 0.0,
          warehouse_dir: str | None = None) -> ThreadingHTTPServer:
    """Start the facade on `port` (0 = ephemeral); returns the server —
    `server.server_address[1]` is the bound port; call `.shutdown()` to
    stop. Runs daemon-threaded so tests and notebooks can use it inline.
    `edge_endpoints` maps in-situ source names to EDGE endpoint dicts
    (sources/edge.py) for /domsinsitusubset, /domsvalues and /domsstats.
    `cache_ttl_s` > 0 enables the reference's TTL result cache (60 s
    there) on 200 responses; the cache handle is exposed as
    `server.response_cache` for invalidation. `warehouse_dir` points
    /domsresults and /domsplot at a results_store warehouse."""
    cache = _ResponseCache(ttl_s=cache_ttl_s) if cache_ttl_s > 0 else None
    handler = type("BoundHandler", (_Handler,),
                   {"routes": build_routes(spark, sf_dir, edge_endpoints,
                                           warehouse_dir),
                    "spark": spark, "cache": cache})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    server.response_cache = cache  # type: ignore[attr-defined]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server
