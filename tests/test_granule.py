"""Granule ingest: pure-struct NetCDF-3 parser + mapInPandas reader.

Round-trips plans/render.to_netcdf (writer) through sources/granule
(parser + distributed reader) with no optional dependencies, plus a
hand-crafted record-variable file to cover the record data layout.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nexus_spark.plans.render import to_netcdf
from nexus_spark.sources.granule import (GRANULE_ROWS_SCHEMA,
                                         parse_netcdf3, parse_section_input,
                                         read_granules, section_specs,
                                         time_to_epoch)


def _grid_payload():
    return {
        "lats": [10.0, 20.0, 30.0],
        "lons": [100.0, 110.0],
        "grid": [[1.0, 2.0], [3.0, float("nan")], [5.0, 6.0]],
    }


def test_parse_roundtrip_writer():
    buf = to_netcdf(_grid_payload(), var_name="sst", units="degC",
                    global_attrs={"title": "t"})
    nc = parse_netcdf3(buf)
    assert nc["dims"] == {"lat": 3, "lon": 2}
    assert nc["attrs"]["title"] == "t"
    np.testing.assert_allclose(nc["variables"]["lat"]["data"], [10, 20, 30])
    np.testing.assert_allclose(nc["variables"]["lon"]["data"], [100, 110])
    got = nc["variables"]["sst"]["data"]
    assert got.shape == (3, 2)
    assert np.isnan(got[1, 1]) and got[2, 0] == 5.0
    assert nc["variables"]["sst"]["dims"] == ["lat", "lon"]
    assert nc["variables"]["sst"]["attrs"]["units"] == "degC"


def test_parse_rejects_non_netcdf():
    with pytest.raises(ValueError, match="not a NetCDF-3"):
        parse_netcdf3(b"PK\x03\x04 not netcdf")


def _record_file() -> bytes:
    """Hand-crafted CDF-1 with unlimited time dim: time(time) int record
    var + v(time, x) double record var, 2 records, x=3. Exercises the
    interleaved record layout (recsize = sum of padded slabs)."""
    def name(s):
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)

    hdr = [b"CDF\x01", struct.pack(">I", 2)]          # magic, numrecs=2
    hdr.append(struct.pack(">II", 0x0A, 2))           # dim list
    hdr.append(name("time") + struct.pack(">I", 0))   # unlimited
    hdr.append(name("x") + struct.pack(">I", 3))
    hdr.append(struct.pack(">II", 0, 0))              # no global attrs
    hdr.append(struct.pack(">II", 0x0B, 2))           # var list
    # offsets: header length computed with placeholder then patched would
    # be overkill for a fixture — lay out header, then compute.
    var_hdrs = []
    # time(time): NC_INT, vsize=4 (padded per-record slab)
    var_hdrs.append(name("time") + struct.pack(">I", 1)
                    + struct.pack(">I", 0)
                    + struct.pack(">II", 0x0C, 1)
                    + name("units")
                    + struct.pack(">II", 2, 30)
                    + b"seconds since 2020-01-01 00:00" + b"\x00" * 2
                    + struct.pack(">III", 4, 4, 0))
    # v(time, x): NC_DOUBLE, vsize=24
    var_hdrs.append(name("v") + struct.pack(">I", 2)
                    + struct.pack(">II", 0, 1)
                    + struct.pack(">II", 0, 0)
                    + struct.pack(">III", 6, 24, 0))
    base = b"".join(hdr) + b"".join(var_hdrs)
    begin_time = len(base)
    begin_v = begin_time + 4  # time slab (4B, already 4-aligned)
    # Patch the two begin offsets (last 4 bytes of each var header).
    vh0 = var_hdrs[0][:-4] + struct.pack(">I", begin_time)
    vh1 = var_hdrs[1][:-4] + struct.pack(">I", begin_v)
    data = b""
    for rec, (t, row) in enumerate([(0, [1.0, 2.0, 3.0]),
                                    (3600, [4.0, 5.0, 6.0])]):
        data += struct.pack(">i", t)
        data += np.asarray(row, dtype=">f8").tobytes()
    return b"".join(hdr) + vh0 + vh1 + data


def test_parse_record_variables():
    nc = parse_netcdf3(_record_file())
    np.testing.assert_allclose(nc["variables"]["time"]["data"], [0, 3600])
    v = nc["variables"]["v"]["data"]
    assert v.shape == (2, 3)
    np.testing.assert_allclose(v, [[1, 2, 3], [4, 5, 6]])
    assert nc["variables"]["time"]["attrs"]["units"].startswith("seconds")


def test_section_spec_parsing():
    specs, path = parse_section_input(
        "lat:0:2,lon:0:2;lat:2:4,lon:0:2;file:///tmp/g.nc")
    assert path == "file:///tmp/g.nc"
    assert specs[0][0] == "lat:0:2,lon:0:2"
    assert specs[1][1]["lat"] == slice(2, 4)


def test_section_specs_generator():
    specs = section_specs({"lat": 5, "lon": 4}, {"lat": 2, "lon": 2})
    assert "lat:0:2,lon:0:2" in specs and "lat:4:5,lon:2:4" in specs
    assert len(specs) == 3 * 2
    # dim absent from tile_shape stays whole
    assert section_specs({"lat": 5, "lon": 4}, {"lat": 5}) == [
        "lat:0:5,lon:0:4"]


def test_time_to_epoch_units():
    out = time_to_epoch([0.0, 1.0], "hours since 2020-01-02")
    assert out[1] - out[0] == 3600.0
    assert out[0] == 1577923200.0  # 2020-01-02T00:00:00Z
    np.testing.assert_allclose(
        time_to_epoch([5.0], "days since 2000-01-01 12:00:00",
                      time_offset=7),
        [946728000.0 + 5 * 86400 + 7])
    with pytest.raises(ValueError, match="unsupported time units"):
        time_to_epoch([0.0], "fortnights since 2020-01-01")


def test_read_granules_grid(spark, tmp_path):
    buf = to_netcdf(_grid_payload(), var_name="sst")
    p = tmp_path / "g1.nc"
    p.write_bytes(buf)
    inputs = [f"lat:0:2,lon:0:2;{p}", f"lat:2:3,lon:0:2;file://{p}"]
    df = read_granules(spark, inputs, variable="sst").orderBy("lat", "lon")
    rows = df.collect()
    assert df.columns == ["granule", "section_spec", "time", "lat", "lon",
                          "value"]
    assert len(rows) == 6  # 2x2 + 1x2 cells
    by_cell = {(r.lat, r.lon): r.value for r in rows}
    assert by_cell[(10.0, 100.0)] == 1.0
    assert by_cell[(30.0, 110.0)] == 6.0
    assert by_cell[(20.0, 110.0)] is None  # NaN -> NULL
    assert all(r.granule == "g1.nc" for r in rows)
    # drop_nan filters the masked cell
    assert read_granules(spark, inputs, variable="sst",
                         drop_nan=True).count() == 5


def test_read_granules_swath(spark, tmp_path):
    # Swath: lat/lon/time are per-point 2-D arrays sharing the data
    # variable's dims (scan, pix) — no separate coordinate axes.
    p = tmp_path / "sw.nc"
    p.write_bytes(_swath_file())
    df = read_granules(spark, [f"scan:0:2,pix:0:2;{p}"], variable="obs",
                       latitude="latitude", longitude="longitude",
                       time="ts", reader="SWATHTILE")
    rows = sorted(df.collect(), key=lambda r: (r.lat, r.lon))
    assert len(rows) == 4
    assert rows[0].lat == 1.0 and rows[0].value == 10.0
    assert rows[0].time == 0.0 and rows[3].time == 3.0


def _swath_file() -> bytes:
    """CDF-1 swath granule: dims (scan=2, pix=2); latitude, longitude, ts,
    obs all (scan, pix) doubles; ts in epoch seconds (no units attr)."""
    def name(s):
        b = s.encode()
        return struct.pack(">I", len(b)) + b + b"\x00" * (-len(b) % 4)

    hdr = [b"CDF\x01", struct.pack(">I", 0)]
    hdr.append(struct.pack(">II", 0x0A, 2))
    hdr.append(name("scan") + struct.pack(">I", 2))
    hdr.append(name("pix") + struct.pack(">I", 2))
    hdr.append(struct.pack(">II", 0, 0))
    names = ["latitude", "longitude", "ts", "obs"]
    arrays = [
        np.array([[1.0, 1.1], [2.0, 2.1]]),
        np.array([[5.0, 5.1], [6.0, 6.1]]),
        np.array([[0.0, 1.0], [2.0, 3.0]]),
        np.array([[10.0, 11.0], [12.0, 13.0]]),
    ]
    hdr.append(struct.pack(">II", 0x0B, len(names)))
    var_hdrs = [name(n) + struct.pack(">I", 2) + struct.pack(">II", 0, 1)
                + struct.pack(">II", 0, 0)
                + struct.pack(">III", 6, 32, 0) for n in names]
    base_len = len(b"".join(hdr) + b"".join(var_hdrs))
    out = b"".join(hdr)
    for i, vh in enumerate(var_hdrs):
        out += vh[:-4] + struct.pack(">I", base_len + 32 * i)
    for arr in arrays:
        out += np.ascontiguousarray(arr, dtype=">f8").tobytes()
    return out


def test_read_granules_bad_reader(spark):
    with pytest.raises(NotImplementedError, match="GRIDTILE or SWATHTILE"):
        read_granules(spark, [], variable="v", reader="CUBE")
    with pytest.raises(ValueError, match="requires a time"):
        read_granules(spark, [], variable="v", reader="SWATHTILE")


def test_ingest_to_lake_schema(spark, tmp_path):
    """Ingested rows feed straight into the observation pipeline: epoch
    seconds -> timestamp, NaN filter, the etl empty-tile contract."""
    from pyspark.sql import functions as F

    buf = to_netcdf(_grid_payload(), var_name="sst")
    p = tmp_path / "g.nc"
    p.write_bytes(buf)
    df = read_granules(spark, [f"lat:0:3,lon:0:2;{p}"], variable="sst",
                       drop_nan=True)
    obs = df.select(
        F.lit("sst_granule").alias("dataset"),
        F.timestamp_seconds(F.coalesce(F.col("time"), F.lit(0.0)))
         .alias("time"),
        "lat", "lon", "value")
    assert [f.name for f in obs.schema.fields] == [
        "dataset", "time", "lat", "lon", "value"]
    assert obs.count() == 5
    assert GRANULE_ROWS_SCHEMA.startswith("granule string")
