"""Paged EDGE in-situ adapter tests (D8): distributed offset paging,
record normalization, next-link serial fallback, and the facade route
(reference: doms/fetchedgeimpl.py fetch/getCount paging contract;
doms/insitusubset.py parameter table and query_edge next-link loop)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from nexus_spark.sources.edge import (edge_bounds, edge_count, insitu_subset,
                                      make_fixture_endpoint,
                                      parse_edge_record, read_edge,
                                      read_edge_next_links)
from tests.conftest import SF_DIR


def _records(n: int = 137) -> list[dict]:
    """Deterministic fixture records in 'Point(lon lat)' EDGE form."""
    out = []
    for i in range(n):
        out.append({
            "id": i,
            "time": f"2013-10-{(i % 28) + 1:02d}T06:00:00Z",
            "point": f"Point({-40 + (i % 20) * 0.5} {10 + (i // 20) * 0.5})",
            "platform": (i % 9) + 1,
            "device": (i % 6) + 1,
            "depth": float(i % 10),
            "sea_water_temperature": 15.0 + (i % 50) * 0.1,
            "sea_water_salinity": 30.0 + (i % 30) * 0.05,
        })
    return out


START, END = "2013-10-01T00:00:00Z", "2013-10-31T23:59:59Z"
BBOX = "-45,5,-25,25"


def test_offset_paged_read_fetches_every_page(spark):
    recs = _records(137)
    ep = make_fixture_endpoint(recs, items_per_page=25)
    df = read_edge(spark, ep, START, END, BBOX)
    got = {r.id for r in df.collect()}
    assert got == {f"id-{i}" for i in range(137)}  # no page lost or duped
    assert edge_count(ep, START, END, BBOX) == 137


def test_server_forced_page_size_is_honored(spark):
    # Request 25/page; server forces 10/page (fetchedgeimpl.fetch reads
    # itemsPerPage back from the first response, not its own request).
    ep = make_fixture_endpoint(_records(47), items_per_page=25,
                               forced_items_per_page=10)
    df = read_edge(spark, ep, START, END, BBOX)
    assert df.count() == 47


def test_record_normalization_matches_reference_semantics():
    row = parse_edge_record(
        {"id": 7, "time": "2013-10-21T00:00:00Z", "point": "Point(-30.5 12.25)",
         "platform": 2, "device": 3, "mission": 4, "depth": 1.5,
         "sea_surface_temperature": 18.5}, "spurs")
    (rid, source, t_ms, lat, lon, platform, device, mission, depth,
     data) = row
    assert rid == "id-7" and source == "spurs"
    assert t_ms == 1382313600000.0  # ISO -> ms epoch
    assert (lat, lon) == (12.25, -30.5)  # Point(lon lat) ordering
    assert platform == "moored surface buoy" and device == "CTD"
    assert mission == "SPURS1" and depth == 1.5
    # sea_surface_temperature renamed (fetchedgeimpl.py:55-57)
    assert data == {"sea_water_temperature": 18.5}


def test_vectorized_page_parse_matches_row_parser():
    """parse_edge_page (the executor hot path) must agree with the
    row-wise reference parser on every normalization rule: both point
    forms, epoch vs ISO time, out-of-vocab codes, missing depth,
    NaN-stripped extras map."""
    from nexus_spark.sources.edge import parse_edge_page

    page = [
        {"id": 1, "time": "2013-10-21T00:00:00Z",
         "point": "Point(-30.5 12.25)", "platform": 2, "device": 3,
         "mission": 4, "depth": 1.5, "sea_surface_temperature": 18.5},
        {"id": 2, "time": "2013-10-22T06:30:00Z", "point": "11.5,-29.0",
         "platform": 99,                       # out-of-vocab -> "99"
         "sea_water_salinity": 35.25},         # no depth -> NULL
        {"id": 3, "time": "2013-10-23T00:00:00Z",
         "point": "Point(-31.0 13.0)", "device": 6,
         "depth": 0.0, "wind_speed": 7.5, "sea_water_temperature": 16.0},
    ]
    expected = [parse_edge_record(dict(r), "src") for r in page]
    got = parse_edge_page(page, "src")
    assert list(got.columns) == ["id", "source", "time", "lat", "lon",
                                 "platform", "device", "mission", "depth",
                                 "data"]
    for exp, (_, row) in zip(expected, got.iterrows()):
        for i, col in enumerate(got.columns):
            v = row[col]
            if col == "depth" and exp[i] is None:
                assert v is None or v != v
            elif isinstance(exp[i], float):
                assert abs(v - exp[i]) < 1e-9, (col, v, exp[i])
            else:
                assert v == exp[i], (col, v, exp[i])


def test_filters_and_parameter_value_column(spark):
    ep = make_fixture_endpoint(_records(100), items_per_page=30)
    df = insitu_subset(spark, ep, START, END, BBOX, parameter="sst",
                       depth_min=2.0, depth_max=6.0, platforms="1,2,3")
    rows = df.collect()
    assert rows and all(2.0 <= r.depth <= 6.0 for r in rows)
    assert all(r.platform in ("ship", "moored surface buoy",
                              "drifting surface float") for r in rows)
    assert all(r.value == r.data["sea_water_temperature"] for r in rows)
    with pytest.raises(ValueError, match="not supported"):
        insitu_subset(spark, ep, START, END, BBOX, parameter="chlorophyll")
    with pytest.raises(ValueError, match="Depth Min"):
        insitu_subset(spark, ep, START, END, BBOX, depth_min=5.0,
                      depth_max=1.0)


def test_bbox_restricts_and_bounds_constrain(spark):
    ep = make_fixture_endpoint(_records(120), items_per_page=40)
    df = read_edge(spark, ep, START, END, "-40,10,-35,12")
    b = edge_bounds(df)
    assert -40 <= b["west"] <= b["east"] <= -35
    assert 10 <= b["south"] <= b["north"] <= 12


def test_next_link_serial_fallback(spark):
    recs = _records(55)
    pages = [recs[i:i + 20] for i in range(0, 55, 20)]

    def fetcher(url: str, params: dict) -> dict:
        i = int(url.rsplit("page=", 1)[1]) if "page=" in url else 0
        out = {"totalResults": 55, "results": pages[i]}
        if i + 1 < len(pages):
            out["next"] = f"fixture://next?page={i + 1}"
        return out

    ep = {"name": "serial", "url": "fixture://next", "fetcher": fetcher}
    df = read_edge_next_links(spark, ep, {})
    assert df.count() == 55


@pytest.fixture(scope="module")
def edge_server(spark):
    from nexus_spark.service import serve

    srv = serve(spark, SF_DIR, port=0, edge_endpoints={
        "spurs": make_fixture_endpoint(_records(90), name="spurs",
                                       items_per_page=40)})
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get_json(base: str, path: str):
    try:
        with urllib.request.urlopen(base + path, timeout=120) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as err:
        return err.code, json.loads(err.read())


def test_facade_route_and_400_table(edge_server):
    ok = ("/domsinsitusubset?source=spurs&parameter=sst"
          f"&startTime={START}&endTime={END}&b={BBOX}")
    status, body = _get_json(edge_server, ok)
    assert status == 200 and len(body) > 0
    assert {"id", "source", "time", "lat", "lon", "value"} <= set(body[0])

    for bad in (
        "/domsinsitusubset?startTime=%s&endTime=%s" % (START, END),  # no src
        "/domsinsitusubset?source=nope&startTime=%s&endTime=%s" % (START, END),
        "/domsinsitusubset?source=spurs&startTime=%s&endTime=%s"
        "&parameter=chlorophyll" % (START, END),
        "/domsinsitusubset?source=spurs&startTime=%s&endTime=%s"
        "&platforms=ship" % (START, END),  # non-integer platforms
        "/domsinsitusubset?source=spurs&startTime=%s&endTime=%s" % (END, START),
    ):
        status, body = _get_json(edge_server, bad)
        assert status == 400, (bad, body)


def _freevar(fn, name):
    return dict(zip(fn.__code__.co_freevars,
                    fn.__closure__))[name].cell_contents


def test_fixture_endpoint_closure_holds_broadcast_only(spark):
    """With a live SparkSession the fixture's page tasks must close over
    the broadcast HANDLE, not the corpus: the r8 ADVICE found the local
    `payload` reference riding every task closure, defeating the
    broadcast. The fix nulls the local and routes reads through
    _payload(); this pins it by introspecting the closure cell."""
    from nexus_spark.sources.edge import make_fixture_endpoint

    records = [{"id": i, "time": "2024-01-01T00:00:00Z",
                "point": "Point(0 1)"} for i in range(100)]
    ep = make_fixture_endpoint(records, name="slim", spark=spark)
    payload_fn = _freevar(ep["fetcher"], "_payload")
    assert _freevar(payload_fn, "payload") is None
    assert _freevar(payload_fn, "b_payload") is not None
    # and the endpoint still serves through the broadcast
    out = ep["fetcher"]("u", {"startTime": "2024-01-01T00:00:00Z",
                              "endTime": "2024-01-02T00:00:00Z",
                              "itemsPerPage": 10, "startIndex": 0})
    assert out["totalResults"] == 100 and len(out["results"]) == 10

    # without a session the local payload is the only store
    ep2 = make_fixture_endpoint(records, name="local", spark=None)
    payload_fn2 = _freevar(ep2["fetcher"], "_payload")
    assert _freevar(payload_fn2, "payload") is not None


def test_d8_endpoint_cache_scoped_to_spark_context(spark):
    """The D8 fixture-endpoint memo must not outlive the SparkContext
    that owns its broadcast (r8 ADVICE: a restarted session would
    dereference a destroyed broadcast). Entries keyed by a dead
    applicationId are evicted on the next build."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as mod
    from tests.conftest import SF_DIR

    mod._D8_EP_CACHE.clear()
    mod._D8_EP_CACHE[(SF_DIR, "app-of-a-dead-context")] = {"stale": True}
    df = mod.q_d8_insitu_subset(spark, SF_DIR)
    assert df.count() > 0
    keys = list(mod._D8_EP_CACHE)
    live = (SF_DIR, spark.sparkContext.applicationId)
    assert live in keys
    assert (SF_DIR, "app-of-a-dead-context") not in keys
