"""Client convenience module round-trips against the in-process facade
(reference: client/nexuscli/nexuscli.py usage contract)."""

from __future__ import annotations

import io
import zipfile
from datetime import datetime

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def client(spark):
    from nexus_spark import client as cl
    from nexus_spark.service import serve

    srv = serve(spark, SF_DIR, port=0)
    cl.set_target(f"http://127.0.0.1:{srv.server_address[1]}")
    yield cl
    srv.shutdown()


def test_dataset_list(client):
    rows = client.dataset_list()
    assert {r["dataset"] for r in rows} == {"sst_a", "sst_b"}
    assert all(r["obs_cnt"] > 0 for r in rows)


def test_time_series_roundtrip(spark, client):
    from nexus_spark import domain
    from nexus_spark.operators.timeseries import time_series as lib_ts

    got = client.time_series(
        ["sst_a"], (-60, -10, 60, 10),
        datetime(1995, 1, 1), datetime(1995, 6, 30))
    assert len(got) == 1 and got[0].dataset == "sst_a"
    expected = lib_ts(domain.observations(spark, SF_DIR),
                      datasets=["sst_a"], min_lat=-10, max_lat=10,
                      min_lon=-60, max_lon=60,
                      start_time="1995-01-01 00:00:00",
                      end_time="1995-06-30 00:00:00").count()
    assert len(got[0].time) == expected > 0
    assert len(got[0].mean) == len(got[0].time)
    # sorted by date, arrays parallel
    assert got[0].time == sorted(got[0].time)

    # bounds-shaped object (shapely-style .bounds) also accepted
    class Box:
        bounds = (-60, -10, 60, 10)

    got2 = client.time_series("sst_a", Box(), datetime(1995, 1, 1),
                              datetime(1995, 6, 30))
    assert got2[0].time == got[0].time

    with pytest.raises(ValueError, match="1 or 2 items"):
        client.time_series([], Box(), datetime(1995, 1, 1),
                           datetime(1995, 6, 30))


def test_daily_difference_average(client):
    got = client.daily_difference_average(
        "sst_a", (-180, -90, 180, 90),
        datetime(1995, 1, 1), datetime(1995, 12, 31))
    assert len(got) == 1
    assert len(got[0].time) > 0 and len(got[0].mean) == len(got[0].time)


def test_match_spark_roundtrip(client):
    pairs = client.match_spark(radius_km=500.0, time_tolerance_s=432000)
    assert pairs and all(p.dist_km <= 500.0 for p in pairs)
    # over-limit surfaces the 202 payload as an error
    with pytest.raises(ValueError, match="exceeds"):
        client.match_spark(radius_km=500.0, time_tolerance_s=432000,
                           result_size_limit=5)


def test_subset_zip(client):
    blob = client.subset(["sst_a"], limit=100)
    z = zipfile.ZipFile(io.BytesIO(blob))
    assert any(n.endswith(".csv") for n in z.namelist())
