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


def test_png_encoder_golden_2x2():
    """Decode our own PNG byte stream and verify pixels end-to-end."""
    import struct
    import zlib

    from nexus_spark.plans.render import to_png

    grid = np.array([[0.0, 1.0], [np.nan, 0.5]])
    png = to_png({"grid": grid})
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: width=2 height=2, bit depth 8, color type 6 (RGBA)
    w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, ctype) == (2, 2, 8, 6)
    # Decode IDAT scanlines (filter 0) back to RGBA
    idat_len = struct.unpack(">I", png[33:37])[0]
    raw = zlib.decompress(png[41:41 + idat_len])
    rows = [raw[i * 9 + 1:(i + 1) * 9] for i in range(2)]  # strip filter byte
    # Render flips rows: image row 0 = grid row 1 = [nan, 0.5]
    nan_px = rows[0][0:4]
    assert nan_px == b"\x00\x00\x00\x00"  # NaN → fully transparent
    lo_px, hi_px = rows[1][0:4], rows[1][4:8]
    assert lo_px[3] == 255 and hi_px[3] == 255
    assert lo_px[2] > lo_px[0]   # vmin → blue end of ramp
    assert hi_px[0] > hi_px[2]   # vmax → red end of ramp


def test_zip_subset_two_csvs(spark):
    import zipfile

    from nexus_spark import domain
    from nexus_spark.plans.render import to_zip_subset

    obs = domain.observations(spark, SF_DIR)
    frames = {
        "sst_a": obs.where(F.col("dataset") == "sst_a").limit(25),
        "sst_b": obs.where(F.col("dataset") == "sst_b").limit(25),
    }
    blob = to_zip_subset(frames, date_range="20190101-20190301",
                         bounds="30.0000W_10.0000S_60.0000E_20.0000N")
    zf = zipfile.ZipFile(__import__("io").BytesIO(blob))
    names = sorted(zf.namelist())
    assert names == [
        "sst_a.20190101-20190301.30.0000W_10.0000S_60.0000E_20.0000N.csv",
        "sst_b.20190101-20190301.30.0000W_10.0000S_60.0000E_20.0000N.csv"]
    for n in names:
        lines = zf.read(n).decode().strip().split("\n")
        assert len(lines) == 26  # header + 25 rows
        assert lines[0].split(",")[:1] == ["dataset"] or "dataset" in lines[0]


def test_histogram_distributed_matches_numpy(spark):
    from nexus_spark import domain
    from nexus_spark.plans.render import histogram_payload, histogram_png

    obs = domain.observations(spark, SF_DIR).limit(5000)
    vals = np.array([r["value"] for r in obs.select("value").collect()
                     if r["value"] is not None])
    payload = histogram_payload(obs, "value", bins=20)
    np_counts, np_edges = np.histogram(vals, bins=20,
                                       range=(vals.min(), vals.max()))
    assert payload["counts"] == np_counts.tolist()
    assert np.allclose(payload["edges"], np_edges)
    png = histogram_png(payload)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_scatter_png_smoke(spark):
    from nexus_spark import domain
    from nexus_spark.plans.render import scatter_png

    obs = domain.observations(spark, SF_DIR)
    png = scatter_png(obs, "lon", "lat", width=64, height=64, limit=2000)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 100

def _parse_netcdf3(buf: bytes) -> dict:
    """Minimal independent CDF-1 reader (big-endian classic format) used to
    round-trip-verify the struct writer without scipy/netCDF4."""
    import struct

    pos = [0]

    def take(n):
        b = buf[pos[0]:pos[0] + n]
        pos[0] += n
        return b

    def u32():
        return struct.unpack(">I", take(4))[0]

    def name():
        n = u32()
        raw = take(n + (-n % 4))[:n]
        return raw.decode()

    def att_list():
        tag, n = u32(), u32()
        out = {}
        for _ in range(n):
            k = name()
            typ, ne = u32(), u32()
            if typ == 2:  # NC_CHAR
                out[k] = take(ne + (-ne % 4))[:ne].decode()
            elif typ == 6:  # NC_DOUBLE
                out[k] = list(struct.unpack(f">{ne}d", take(8 * ne)))
            else:
                raise AssertionError(f"unexpected att type {typ}")
        return out

    assert take(4) == b"CDF\x01"
    assert u32() == 0  # numrecs
    tag, ndims = u32(), u32()
    assert tag == 0x0A
    dims = [(name(), u32()) for _ in range(ndims)]
    gatts = att_list()
    tag, nvars = u32(), u32()
    assert tag == 0x0B
    variables = {}
    for _ in range(nvars):
        vname = name()
        dimids = [u32() for _ in range(u32())]
        vatts = att_list()
        typ, vsize, begin = u32(), u32(), u32()
        assert typ == 6
        shape = tuple(dims[d][1] for d in dimids)
        count = int(np.prod(shape)) if shape else 1
        data = np.frombuffer(buf[begin:begin + 8 * count],
                             dtype=">f8").reshape(shape)
        variables[vname] = {"dims": [dims[d][0] for d in dimids],
                            "atts": vatts, "data": data}
    return {"dims": dict(dims), "gatts": gatts, "vars": variables}


def test_netcdf3_roundtrip_2x3():
    from nexus_spark.plans.render import to_netcdf

    payload = {"lats": [-5.0, 5.0], "lons": [0.0, 10.0, 20.0],
               "grid": np.array([[1.0, 2.0, np.nan], [4.0, 5.0, 6.0]])}
    buf = to_netcdf(payload, var_name="sst", units="degC",
                    global_attrs={"title": "nexus-spark export"})
    nc = _parse_netcdf3(buf)
    assert nc["dims"] == {"lat": 2, "lon": 3}
    assert nc["gatts"] == {"title": "nexus-spark export"}
    assert nc["vars"]["lat"]["atts"]["units"] == "degrees_north"
    assert nc["vars"]["lat"]["data"].tolist() == [-5.0, 5.0]
    assert nc["vars"]["lon"]["data"].tolist() == [0.0, 10.0, 20.0]
    v = nc["vars"]["sst"]
    assert v["dims"] == ["lat", "lon"]
    assert v["atts"]["units"] == "degC"
    assert np.isnan(v["atts"]["_FillValue"][0])
    got = v["data"]
    assert got[0, 0] == 1.0 and got[1, 2] == 6.0 and np.isnan(got[0, 2])
    # Data section is 4-aligned and offsets don't overlap the header.
    assert len(buf) % 4 == 0


def test_netcdf3_shape_mismatch_raises():
    from nexus_spark.plans.render import to_netcdf

    with pytest.raises(ValueError, match="grid shape"):
        to_netcdf({"lats": [0.0], "lons": [0.0],
                   "grid": np.zeros((2, 2))})


def test_histogram_empty_frame_zero_counts(spark):
    from nexus_spark import domain
    from nexus_spark.plans.render import histogram_payload

    obs = domain.observations(spark, SF_DIR).where(F.lit(False))
    payload = histogram_payload(obs, "value", bins=10)
    assert payload["counts"] == [0] * 10
    assert len(payload["edges"]) == 11
