"""Parameter-validation table (semantic port of the reference's 400/200
HTTP tests, StandardDeviationSearch_test.py:23-157 — malformed requests
fail fast at plan build, well-formed ones plan)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def obs(spark):
    from nexus_spark import domain

    return domain.observations(spark, SF_DIR)


@pytest.mark.parametrize("bbox", [
    (-91, 0, 0, 10),      # lat below range
    (0, 91, 0, 10),       # lat above range
    (0, 10, -181, 0),     # lon below range
    (0, 10, 0, 181),      # lon above range
    (10, -10, 0, 10),     # min_lat > max_lat
    (0, 10, 50, -50),     # min_lon > max_lon
])
def test_bad_bbox_rejected(obs, bbox):
    from nexus_spark.operators.timeseries import time_series

    min_lat, max_lat, min_lon, max_lon = bbox
    with pytest.raises(ValueError):
        time_series(obs, min_lat=min_lat, max_lat=max_lat,
                    min_lon=min_lon, max_lon=max_lon)


def test_good_bbox_plans(obs):
    from nexus_spark.operators.timeseries import time_series

    df = time_series(obs, min_lat=-10, max_lat=10, min_lon=-20, max_lon=20)
    assert len(df.schema.fields) == 7  # plans without executing


@pytest.mark.parametrize("month", [0, 13, -1])
def test_bad_month_rejected(obs, month):
    from nexus_spark.operators.maps import clim_map

    with pytest.raises(ValueError):
        clim_map(obs, month=month)


@pytest.mark.parametrize("rt,tt", [(0, 60), (-5, 60), (10, 0), (10, -1)])
def test_bad_matchup_tolerances_rejected(spark, rt, tt):
    from nexus_spark import domain
    from nexus_spark.operators.matchup import matchup

    p = domain.matchup_primary(spark, SF_DIR)
    s = domain.matchup_secondary(spark, SF_DIR)
    with pytest.raises(ValueError):
        matchup(p, s, radius_km=rt, time_tolerance_s=tt)


def test_bad_hofmoeller_axis_rejected(obs):
    from nexus_spark.operators.hofmoeller import hofmoeller

    with pytest.raises(ValueError):
        hofmoeller(obs, axis="depth")
