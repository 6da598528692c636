"""Unit tests: point-in-polygon predicate, mosaic assembly, CSV/JSON
renderers, stateful streaming operator."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_point_in_polygon_triangle(spark):
    from nexus_spark.functions.polygon import filter_polygon

    pts = [(0.5, 0.5, "in"), (2.0, 2.0, "out"), (0.1, 0.1, "in"),
           (0.9, 0.05, "in"), (1.5, 0.4, "in"),  # x+y=1.9 < 2 → inside
           (1.9, 0.2, "out"),                    # x+y=2.1 > 2 → outside
           (-0.1, 0.0, "out")]
    df = spark.createDataFrame(
        [(lon, lat, tag) for lon, lat, tag in pts], "lon double, lat double, tag string")
    tri = [(0.0, 0.0), (2.0, 0.0), (0.0, 2.0)]  # right triangle
    got = {r["tag"] for r in filter_polygon(df, tri).collect()}
    inside = filter_polygon(df, tri).count()
    assert inside == 4
    assert got == {"in"}


def test_polygon_sql_matches_spark(spark, duck):
    """The SQL predicate and the column predicate agree on the grid."""
    from nexus_spark.functions.polygon import (filter_polygon,
                                               polygon_sql_predicate)

    poly = [(-120.0, -20.0), (30.0, -26.0), (150.0, 15.0), (-60.0, 27.0)]
    cells = [(float(lat), float(lon)) for lat in range(-30, 31, 5)
             for lon in range(-180, 181, 30)]
    df = spark.createDataFrame(cells, "lat double, lon double")
    spark_in = {(r["lat"], r["lon"]) for r in filter_polygon(df, poly).collect()}
    import duckdb

    pred = polygon_sql_predicate(poly)
    rows = duck.sql(
        "SELECT lat, lon FROM (SELECT unnest(range(-30, 31, 5))::DOUBLE AS lat) "
        "CROSS JOIN (SELECT unnest(range(-180, 181, 30))::DOUBLE AS lon) "
        f"WHERE {pred}").fetchall()
    duck_in = {(r[0], r[1]) for r in rows}
    assert spark_in == duck_in
    assert len(spark_in) > 5


def test_to_grid_mosaic(spark):
    from nexus_spark import domain
    from nexus_spark.operators.maps import time_avg_map
    from nexus_spark.plans.render import to_grid

    obs = domain.observations(spark, SF_DIR)
    grid = to_grid(time_avg_map(obs, dataset="sst_a"), "map_mean")
    assert len(grid["lats"]) == 12 and len(grid["lons"]) == 12
    assert grid["grid"].shape == (12, 12)
    assert np.isfinite(grid["grid"]).sum() > 100


def test_csv_json_render(spark, tmp_path):
    from nexus_spark import domain
    from nexus_spark.operators.tile_service import dataset_list
    from nexus_spark.plans.render import to_csv, to_json_records

    obs = domain.observations(spark, SF_DIR)
    dl = dataset_list(obs)
    out = str(tmp_path / "csv_out")
    to_csv(dl, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1
    payload = json.loads(to_json_records(dl, limit=10))
    assert {p["dataset"] for p in payload} == {"sst_a", "sst_b"}


def test_stateful_running_stats(spark, tmp_path):
    from nexus_spark.catalog import load_table
    from nexus_spark.streaming.events import read_events_stream
    from nexus_spark.streaming.stateful import running_user_stats

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev_stream")
    ev.repartition(3).write.parquet(src)

    stream = read_events_stream(spark, src)
    from nexus_spark.streaming.events import _normalize_ts

    result = running_user_stats(_normalize_ts(stream))
    q = (result.writeStream.format("memory").queryName("run_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # Final state per user must equal the batch totals.
    final = (spark.table("run_stats")
             .groupBy("user_id")
             .agg(F.max("n_events").alias("n_events"),
                  F.max("total_value").alias("total_value"),
                  F.max("max_value").alias("max_value")))
    batch = ev.groupBy("user_id").agg(
        F.count("value").alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"))
    f = {r["user_id"]: (r["n_events"], round(r["total_value"], 6),
                        round(r["max_value"], 6)) for r in final.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["total_value"], 6),
                        round(r["max_value"], 6)) for r in batch.collect()}
    assert f == b
    assert len(b) > 0
