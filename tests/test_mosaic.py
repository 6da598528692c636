"""Mosaic merge + nearest-value public API (reference nexusmodel.py)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexus_spark.operators.mosaic import (OverlappingTilesError,
                                          approximate_value_at, merge_tiles)


def _slice(spark, rows):
    return (spark.createDataFrame(
        rows, "time string, lat double, lon double, value double")
        .withColumn("time", F.to_timestamp("time")))


T = "2020-06-01"


def test_merge_two_tiles_block_layout(spark):
    # Tile A covers lats {0,1} x lons {0,1}; tile B lats {2} x lons {2,3}
    # -> block-diagonal mosaic with NaN gaps (reference block_diag).
    df = _slice(spark, [
        (T, 0.0, 0.0, 1.0), (T, 0.0, 1.0, 2.0),
        (T, 1.0, 0.0, 3.0), (T, 1.0, 1.0, 4.0),
        (T, 2.0, 2.0, 5.0), (T, 2.0, 3.0, 6.0),
    ])
    out = merge_tiles(df)
    assert out["lats"] == [0.0, 1.0, 2.0]
    assert out["lons"] == [0.0, 1.0, 2.0, 3.0]
    g = out["grid"]
    assert g[0, 0] == 1.0 and g[1, 1] == 4.0 and g[2, 2] == 5.0
    assert np.isnan(g[0, 2]) and np.isnan(g[2, 0])  # uncovered gaps
    assert out["time"] is not None


def test_merge_rejects_multiple_times(spark):
    df = _slice(spark, [(T, 0.0, 0.0, 1.0), ("2020-06-02", 0.0, 1.0, 2.0)])
    with pytest.raises(ValueError, match="single time step"):
        merge_tiles(df)


def test_merge_rejects_overlap(spark):
    df = _slice(spark, [(T, 0.0, 0.0, 1.0), (T, 0.0, 0.0, 2.0)])
    with pytest.raises(OverlappingTilesError, match="overlapping"):
        merge_tiles(df)


def test_approximate_value_nearest_cell(spark):
    df = _slice(spark, [
        (T, 0.0, 0.0, 1.0), (T, 0.0, 1.0, 2.0),
        (T, 1.0, 0.0, 3.0), (T, 1.0, 1.0, 4.0),
    ])
    # (0.4, 0.9) -> nearest lat 0.0, nearest lon 1.0 -> value 2.0
    assert approximate_value_at(df, 0.4, 0.9) == 2.0
    assert approximate_value_at(df, 1.0, 0.1) == 3.0


def test_approximate_value_out_of_bounds_nan(spark):
    df = _slice(spark, [(T, 0.0, 0.0, 1.0), (T, 1.0, 1.0, 4.0)])
    assert math.isnan(approximate_value_at(df, 5.0, 0.5))
    assert math.isnan(approximate_value_at(df, 0.5, -2.0))


def test_approximate_value_masked_and_empty(spark):
    df = _slice(spark, [(T, 0.0, 0.0, None), (T, 1.0, 1.0, 4.0)])
    assert math.isnan(approximate_value_at(df, 0.1, 0.1))  # masked cell
    assert math.isnan(approximate_value_at(
        df.where(F.col("value") > 100), 0.0, 0.0))  # empty selection


def test_approximate_value_multi_time_nan_unless_filtered(spark):
    df = _slice(spark, [(T, 0.0, 0.0, 1.0), ("2020-06-02", 0.0, 0.0, 9.0)])
    assert math.isnan(approximate_value_at(df, 0.0, 0.0))
    from datetime import datetime

    assert approximate_value_at(
        df, 0.0, 0.0, time=datetime(2020, 6, 2)) == 9.0
