"""HTTP facade tests: route → operator parity, content negotiation, and
the reference's 400 table (reference: webmodel.py:138-341 validation;
tests/algorithms/StandardDeviationSearch_test.py's 400/200 style)."""

from __future__ import annotations

import io
import json
import urllib.error
import urllib.request
import zipfile

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def server(spark):
    from nexus_spark.service import serve

    srv = serve(spark, SF_DIR, port=0)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=120) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def _get_status(base: str, path: str) -> tuple[int, dict]:
    try:
        status, _, body = _get(base, path)
        return status, json.loads(body)
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_time_series_json_matches_library(spark, server):
    from nexus_spark import domain
    from nexus_spark.operators.timeseries import time_series

    status, ctype, body = _get(
        server, "/timeSeriesSpark?ds=sst_a&b=-60,-10,60,10"
                "&startTime=1995-01-01T00:00:00Z&endTime=1995-06-30T00:00:00Z")
    assert status == 200 and ctype == "application/json"
    rows = json.loads(body)
    expected = time_series(
        domain.observations(spark, SF_DIR), datasets=["sst_a"],
        min_lat=-10, max_lat=10, min_lon=-60, max_lon=60,
        start_time="1995-01-01 00:00:00",
        end_time="1995-06-30 00:00:00").count()
    assert len(rows) == expected > 0
    assert {"dataset", "ts_date", "ts_mean"} <= set(rows[0])


def test_map_png_and_csv(server):
    status, ctype, body = _get(server, "/timeAvgMapSpark?ds=sst_a&output=PNG")
    assert (status, ctype) == (200, "image/png")
    assert body[:8] == b"\x89PNG\r\n\x1a\n"

    status, ctype, body = _get(server, "/timeAvgMapSpark?ds=sst_a&output=CSV")
    assert (status, ctype) == (200, "text/csv")
    header = body.decode().splitlines()[0]
    assert "lat" in header and "map_mean" in header


def test_matchup_route_matches_library(spark, server):
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup

    status, _, body = _get(server, "/match_spark?rt=80000&tt=86400&matchOnce=true")
    assert status == 200
    expected = matchup(domain.matchup_primary(spark, SF_DIR),
                       domain.matchup_secondary(spark, SF_DIR),
                       radius_km=80.0, time_tolerance_s=86400,
                       match_once=True).count()
    assert len(json.loads(body)) == expected


def test_subset_zip(server):
    status, ctype, body = _get(server,
                               "/domssubset?ds=sst_a,sst_b&output=ZIP&limit=10")
    assert (status, ctype) == (200, "application/zip")
    zf = zipfile.ZipFile(io.BytesIO(body))
    assert sorted(zf.namelist()) == ["sst_a.csv", "sst_b.csv"]


def test_trivial_endpoints(server):
    assert _get_status(server, "/heartbeat") == (200, {"online": True})
    status, caps = _get_status(server, "/capabilities")
    assert status == 200 and isinstance(caps, list) and len(caps) > 10
    status, dsl = _get_status(server, "/list")
    assert status == 200 and {d["dataset"] for d in dsl} == {"sst_a", "sst_b"}


@pytest.mark.parametrize("path,frag", [
    ("/timeSeriesSpark", "missing required parameter 'ds'"),
    ("/timeSeriesSpark?ds=sst%20a", "invalid shortname"),
    ("/timeSeriesSpark?ds=sst_a&b=1,2,3", "minLon,minLat,maxLon,maxLat"),
    ("/timeSeriesSpark?ds=sst_a&b=-60,-95,60,10", "latitude out of range"),
    ("/timeSeriesSpark?ds=sst_a&b=60,-10,-60,10", "min_lon"),
    ("/timeSeriesSpark?ds=sst_a&startTime=not-a-time", "ISO8601Z or epoch"),
    ("/climMapSpark?ds=sst_a&month=13", "month must be 1..12"),
    ("/match_spark?rt=-5", "must be positive"),
    ("/standardDeviation?ds=sst_a", "latitude and longitude are required"),
    ("/list?output=BMP", "unsupported output type"),
    ("/timeSeriesSpark?ds=sst_a&output=PNG", "only valid for map endpoints"),
])
def test_400_table(server, path, frag):
    status, err = _get_status(server, path)
    assert status == 400, (path, err)
    assert frag in err["error"]


def test_404_unknown_route(server):
    status, err = _get_status(server, "/noSuchThing")
    assert status == 404 and "no such endpoint" in err["error"]

def test_time_series_seasonal_filter(server):
    status, _, body = _get(
        server, "/timeSeriesSpark?ds=sst_a&b=-60,-10,60,10"
                "&startTime=1995-01-01T00:00:00Z&endTime=1995-12-31T00:00:00Z"
                "&seasonalFilter=true")
    assert status == 200
    rows = json.loads(body)
    assert rows and "ts_mean_seasonal" in rows[0]
    # Deseasoned = value minus same-calendar-month mean → near-zero mean
    # within each month group; spot-check it differs from the raw mean.
    assert any(abs(r["ts_mean_seasonal"] - r["ts_mean"]) > 1e-9
               for r in rows if r["ts_mean"] is not None)


def test_time_series_lowpass_filter(server):
    status, _, body = _get(
        server, "/timeSeriesSpark?ds=sst_a&b=-60,-10,60,10"
                "&startTime=1995-01-01T00:00:00Z&endTime=1995-12-31T00:00:00Z"
                "&lowPassFilter=true")
    assert status == 200
    rows = json.loads(body)
    assert rows and "ts_mean_lowpass" in rows[0]
    assert all(r["ts_mean_lowpass"] is not None for r in rows)


def test_time_series_bad_filter_param_400(server):
    status, err = _get_status(
        server, "/timeSeriesSpark?ds=sst_a&seasonalFilter=maybe")
    assert status == 400 and "not a boolean" in err["error"]


def test_matchup_result_size_limit_202(server):
    status, payload = _get_status(
        server, "/match_spark?rt=500000&tt=432000&resultSizeLimit=5")
    assert status == 202
    assert payload["resultSizeLimit"] == 5
    assert payload["result_count"] > 5
    assert "exceeds" in payload["message"]
    # Under the limit, normal 200 with rows.
    status, rows = _get_status(
        server, "/match_spark?rt=500000&tt=432000&resultSizeLimit=10000000")
    assert status == 200 and isinstance(rows, list) and len(rows) > 0


def test_domslist_includes_insitu(server):
    status, rows = _get_status(server, "/domslist")
    assert status == 200
    kinds = {r["kind"] for r in rows}
    assert kinds == {"gridded", "insitu"}
    assert {r["dataset"] for r in rows if r["kind"] == "gridded"} == \
        {"sst_a", "sst_b"}


def test_json_default_row_cap(server):
    # /datainbounds over everything would be huge; the default cap bounds it.
    status, _, body = _get(server, "/datainbounds?limit=7")
    assert status == 200
    assert len(json.loads(body)) == 7


def test_ttl_response_cache_and_fair_pool(spark):
    """cache_ttl_s>0 serves repeat GETs from the TTL cache (the
    reference's 60s results cache) and request threads carry the FAIR
    scheduler pool tag."""
    import time as _time

    from nexus_spark.service import serve

    srv = serve(spark, SF_DIR, port=0, cache_ttl_s=60.0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        path = ("/timeSeriesSpark?ds=sst_a&b=-60,-10,60,10"
                "&startTime=1995-01-01T00:00:00Z"
                "&endTime=1995-03-31T00:00:00Z")
        t0 = _time.time()
        s1, _, b1 = _get(base, path)
        cold = _time.time() - t0
        t0 = _time.time()
        s2, _, b2 = _get(base, path)
        warm = _time.time() - t0
        assert (s1, s2) == (200, 200) and b1 == b2
        assert warm < cold / 5  # cache hit never plans a Spark job
        # invalidation handle works
        srv.response_cache.clear()
        assert srv.response_cache.get(path) is None
        # errors are not cached
        s3, _ = _get_status(base, "/timeSeriesSpark?b=0,0,bad")
        assert s3 == 400
    finally:
        srv.shutdown()


# --------------------------------------------------------------------------
# DOMS facade routes (reference: doms/ValuesQuery.py:14-55,
# MetadataQuery.py:13-50, StatsQuery.py:10-52, ResultsRetrieval.py:10-30,
# ResultsPlotQuery.py:15-40) + /correlationMap
# (algorithms/CorrelationMap.py:16-129) — 200/400 per route, mirroring the
# reference's StandardDeviationSearch_test.py parameter-validation style.
# --------------------------------------------------------------------------

def _doms_records(n: int = 60) -> list[dict]:
    return [{"id": i, "time": f"2013-10-{(i % 28) + 1:02d}T06:00:00Z",
             "point": f"Point({-40 + (i % 20) * 0.5} {10 + (i // 20) * 0.5})",
             "platform": (i % 9) + 1, "depth": float(i % 10),
             "sea_water_temperature": 15.0 + (i % 50) * 0.1}
            for i in range(n)]


@pytest.fixture(scope="module")
def doms_server(spark, tmp_path_factory):
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup
    from nexus_spark.operators.results_store import save_execution
    from nexus_spark.service import serve
    from nexus_spark.sources.edge import make_fixture_endpoint

    wh = str(tmp_path_factory.mktemp("doms_wh"))
    results = matchup(domain.matchup_primary(spark, SF_DIR),
                      domain.matchup_secondary(spark, SF_DIR),
                      radius_km=300.0, time_tolerance_s=86400.0)
    eid = save_execution(results, {"rt_km": 300.0}, wh)
    srv = serve(spark, SF_DIR, port=0,
                edge_endpoints={"spurs": make_fixture_endpoint(
                    _doms_records(), name="spurs", items_per_page=25)},
                warehouse_dir=wh)
    yield f"http://127.0.0.1:{srv.server_address[1]}", eid
    srv.shutdown()


_DOMS_WINDOW = ("startTime=2013-10-01T00:00:00Z"
                "&endTime=2013-10-31T23:59:59Z&b=-45,5,-25,25")


def test_correlation_map_route_matches_library(spark, doms_server):
    from nexus_spark import domain
    from nexus_spark.operators.correlation import corr_map

    base, _ = doms_server
    status, _, body = _get(base, "/correlationMap?ds=sst_a,sst_b&res=30")
    assert status == 200
    rows = json.loads(body)
    expected = corr_map(domain.observations(spark, SF_DIR),
                        "sst_a", "sst_b", resolution=30.0).count()
    assert len(rows) == expected > 0
    assert {"lat", "lon", "corr_r", "corr_cnt"} <= set(rows[0])
    # PNG negotiation works for the gridded map
    status, ctype, _ = _get(base, "/correlationMap?ds=sst_a,sst_b&res=30"
                                  "&output=PNG")
    assert (status, ctype) == (200, "image/png")


def test_doms_values_route(doms_server):
    base, _ = doms_server
    status, _, body = _get(base, f"/domsvalues?source=spurs&{_DOMS_WINDOW}")
    assert status == 200
    rows = json.loads(body)
    assert len(rows) == 60  # full records, no parameter narrowing
    assert {"id", "lat", "lon", "platform", "data"} <= set(rows[0])
    assert "value" not in rows[0]


def test_doms_metadata_route(doms_server):
    base, _ = doms_server
    status, meta = _get_status(base, "/domsmetadata?dataset=sst_a")
    assert status == 200
    assert meta["dataset"] == "sst_a" and meta["kind"] == "gridded"
    assert meta["obs_cnt"] > 0 and meta["min_time"] <= meta["max_time"]


def test_doms_stats_route(doms_server):
    base, _ = doms_server
    status, stats = _get_status(
        base, "/domsstats?source=spurs&s=2013-10-01T00:00:00Z"
              "&e=2013-10-31T23:59:59Z&b=-45,5,-25,25")
    assert status == 200
    assert stats["count"] == 60 and stats["source"] == "spurs"


def test_doms_results_route(spark, doms_server):
    base, eid = doms_server
    status, _, body = _get(base, f"/domsresults?id={eid}")
    assert status == 200
    rows = json.loads(body)
    assert rows and {"primary_id", "secondary_id", "dist_km",
                     "p_value", "s_value"} <= set(rows[0])
    status, _, body = _get(base, f"/domsresults?id={eid}&simpleResults=true")
    simple = json.loads(body)
    assert set(simple[0]) == {"primary_id", "secondary_id", "dist_km", "dt_s"}
    assert len(simple) == len(rows)


def test_doms_plot_route(doms_server):
    base, eid = doms_server
    for ptype in ("scatter", "map", "histogram"):
        status, ctype, body = _get(base, f"/domsplot?id={eid}&type={ptype}")
        assert (status, ctype) == (200, "image/png"), ptype
        assert body.startswith(b"\x89PNG"), ptype


@pytest.mark.parametrize("path,frag", [
    ("/correlationMap?ds=sst_a", "Requires two datasets"),
    ("/correlationMap?ds=sst_a,sst_b&res=0", "positive number"),
    ("/domsvalues?" + _DOMS_WINDOW, "'source' argument is required"),
    ("/domsvalues?source=nope&" + _DOMS_WINDOW, "unknown in situ source"),
    ("/domsmetadata", "'dataset' parameter not specified"),
    ("/domsmetadata?dataset=nope", "not found"),
    ("/domsstats?s=1&e=2", "'source' argument is required"),
    ("/domsstats?source=nope&s=1&e=2", "not found"),
    ("/domsstats?source=spurs", "time arguments are required"),
    ("/domsresults", "must be a valid uuid"),
    ("/domsresults?id=not-a-uuid", "must be a valid uuid"),
    ("/domsresults?id=00000000-0000-0000-0000-000000000000", "not found"),
])
def test_doms_400_table(doms_server, path, frag):
    base, _ = doms_server
    status, err = _get_status(base, path)
    assert status == 400, (path, err)
    assert frag in err["error"]


def test_doms_plot_bad_type_400(doms_server):
    base, eid = doms_server
    status, err = _get_status(base, f"/domsplot?id={eid}&type=pie")
    assert status == 400 and "Unsupported plot type" in err["error"]


def test_reference_alias_routes(spark, server):
    """Route-table parity with the reference's full path list
    (webapp.py:169-256): non-Spark aliases serve the same handlers,
    /statsSolr is the summary fast path, /delay and /makeerror mirror
    the reference's debug handlers."""
    # aliases answer like their Spark twins
    s1, _, b1 = _get(server, "/timeAvgMap?ds=sst_a")
    s2, _, b2 = _get(server, "/timeAvgMapSpark?ds=sst_a")
    assert (s1, s2) == (200, 200) and json.loads(b1) == json.loads(b2)
    s1, _, b1 = _get(server, "/latitudeTimeHofMoeller?ds=sst_a")
    assert s1 == 200 and json.loads(b1)
    s1, _, b1 = _get(server, "/dailydifferenceaverage?ds=sst_a")
    assert s1 == 200 and json.loads(b1)
    s1, _, b1 = _get(server, "/domsmatchup?rt=500000&tt=432000")
    assert s1 == 200 and json.loads(b1)

    # /statsSolr: summary fast path equals the direct time series per day
    status, _, body = _get(server, "/statsSolr?ds=sst_a&b=-160,-25,160,25")
    assert status == 200
    from nexus_spark import domain
    from nexus_spark.operators.timeseries import time_series
    rows = json.loads(body)
    rnd = lambda v: None if v is None else round(v, 6)
    direct = {str(r["ts_date"]): (r["ts_cnt"], rnd(r["ts_mean"]))
              for r in time_series(
                  domain.observations(spark, SF_DIR), datasets=["sst_a"],
                  min_lat=-25, max_lat=25, min_lon=-160,
                  max_lon=160).collect()
              if r["ts_cnt"] > 0}  # summary path drops empty days
    got = {r["ts_date"][:10]: (r["ts_cnt"], rnd(r["ts_mean"]))
           for r in rows}
    assert got == direct and len(got) > 0

    # debug handlers
    status, _, _ = _get(server, "/delay?t=0.01")
    assert status == 200
    status, err = _get_status(server, "/makeerror")
    assert status == 500 and "ZeroDivision" in err["error"]
