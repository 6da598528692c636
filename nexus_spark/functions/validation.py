"""Request-parameter validation — the reference rejects malformed requests
with HTTP 400 before running anything (reference:
analysis/webservice/webmodel.py:138-341 parses/validates args;
tests/algorithms/StandardDeviationSearch_test.py:23-157 is a table of
400/200 cases). The library equivalent: fail fast with ValueError at plan
build, not with a confusing executor error mid-job.
"""

from __future__ import annotations


def validate_bbox(min_lat: float, max_lat: float,
                  min_lon: float, max_lon: float) -> None:
    if not (-90 <= min_lat <= 90 and -90 <= max_lat <= 90):
        raise ValueError(f"latitude out of range [-90, 90]: "
                         f"({min_lat}, {max_lat})")
    if not (-180 <= min_lon <= 180 and -180 <= max_lon <= 180):
        raise ValueError(f"longitude out of range [-180, 180]: "
                         f"({min_lon}, {max_lon})")
    if min_lat > max_lat:
        raise ValueError(f"min_lat {min_lat} > max_lat {max_lat}")
    if min_lon > max_lon:
        raise ValueError(f"min_lon {min_lon} > max_lon {max_lon}")


def validate_tolerances(radius_km: float, time_tolerance_s: float) -> None:
    if radius_km <= 0:
        raise ValueError(f"radius_km must be positive: {radius_km}")
    if time_tolerance_s <= 0:
        raise ValueError(f"time_tolerance_s must be positive: {time_tolerance_s}")


def validate_month(month: int) -> None:
    if not 1 <= month <= 12:
        raise ValueError(f"month must be 1..12: {month}")
