"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (S1 time-series area stats) on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
each a callable (spark, sf_dir) -> DataFrame built from the nexus_spark
library API.
``oracle_sql()`` — the DuckDB-equivalent ANSI SQL for each query, sharing
the exact domain-adapter SQL text with the Spark side (nexus_spark.domain),
so the hash compare tests operator semantics, not adapter drift.

Hash-match discipline: every floating column is rounded to 6 decimals and
NaN-normalized to NULL on BOTH sides; every aggregate is aliased identically
on both sides.
"""

from __future__ import annotations

import contextlib
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DateType, DoubleType, FloatType,
                               TimestampNTZType, TimestampType)

from nexus_spark import domain
from nexus_spark.session import tune

ND = 6  # rounding digits for float hash stability


def _finish(df: DataFrame, nd: int = ND) -> DataFrame:
    """Normalize the hashed surface: round float columns, NaN → NULL (Spark
    returns NaN where DuckDB returns NULL for undefined corr/stddev), and
    render date/timestamp columns as canonical strings (engines disagree on
    date object rendering, strings are unambiguous)."""
    # ONE select projection (not a withColumn chain: each withColumn is a
    # separate analysis pass + Py4J round trip — at ~10 float columns that
    # was ~0.2s of driver-side plan-build latency per query).
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (DoubleType, FloatType)):
            # Round through DECIMAL: double ROUND disagrees across engines
            # on exact half-boundaries (e.g. -8.0359375 → -8.035937 in
            # DuckDB, -8.035938 in Spark); decimal rounding is
            # half-away-from-zero in both. The oracle side gets the same
            # treatment via _stable_round_sql.
            rounded = F.round(c.cast("decimal(38,7)"), nd).cast("double")
            cols.append(F.when(F.isnan(c), F.lit(None)).otherwise(rounded)
                        .alias(f.name))
        elif isinstance(f.dataType, DateType):
            cols.append(F.date_format(c, "yyyy-MM-dd").alias(f.name))
        elif isinstance(f.dataType, (TimestampType, TimestampNTZType)):
            cols.append(F.date_format(c, "yyyy-MM-dd HH:mm:ss")
                        .alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)


def _with(*ctes: str) -> str:
    return "WITH " + ", ".join(ctes)


OBS = domain.cte(domain.OBSERVATIONS_SQL, "obs")
CLIM = domain.cte(domain.CLIMATOLOGY_SQL, "clim")
MP = domain.cte(domain.MATCHUP_PRIMARY_SQL, "mp")
MS = domain.cte(domain.MATCHUP_SECONDARY_SQL, "ms")

# Shared oracle fragment: cos-lat weighted mean over non-null values.
WMEAN = ("SUM(value * COS(RADIANS(lat))) / "
         "SUM(CASE WHEN value IS NOT NULL THEN COS(RADIANS(lat)) END)")


# --------------------------------------------------------------------------
# S1 — time-series area statistics
# --------------------------------------------------------------------------

def q_s1_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    out = time_series(obs, datasets=["sst_a", "sst_b"],
                      min_lat=-25, max_lat=25, min_lon=-160, max_lon=160,
                      start_time="1994-01-01", end_time="1996-12-31 23:59:59")
    return _finish(out)


SQL_S1 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS ts_date,
       ROUND(MIN(value), {ND}) AS ts_min,
       ROUND(MAX(value), {ND}) AS ts_max,
       ROUND({WMEAN}, {ND}) AS ts_mean,
       COUNT(value) AS ts_cnt,
       ROUND(STDDEV_POP(value), {ND}) AS ts_std
FROM obs
WHERE lat BETWEEN -25 AND 25 AND lon BETWEEN -160 AND 160
  AND time >= TIMESTAMP '1994-01-01'
  AND time <= TIMESTAMP '1996-12-31 23:59:59'
GROUP BY dataset, strftime(time, '%Y-%m-%d')
"""


def q_s1_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.timeseries import time_series_compare

    obs = domain.observations(spark, sf_dir)
    return _finish(time_series_compare(obs, "sst_a", "sst_b"))


def _sql_s1_compare() -> str:
    from nexus_spark.functions.stats import (pvalue_from_z_sql, stderr_sql,
                                             tstat_sql, zstat_sql)

    return _with(OBS) + f"""
, ts AS (
  SELECT dataset, CAST(time AS DATE) AS ts_date, {WMEAN} AS ts_mean
  FROM obs GROUP BY dataset, CAST(time AS DATE)
),
base AS (
  SELECT REGR_SLOPE(y.ts_mean, x.ts_mean) AS cmp_slope,
         REGR_INTERCEPT(y.ts_mean, x.ts_mean) AS cmp_intercept,
         CORR(x.ts_mean, y.ts_mean) AS cmp_r,
         COUNT(*) AS cmp_n,
         REGR_SXX(y.ts_mean, x.ts_mean) AS _sxx,
         REGR_SYY(y.ts_mean, x.ts_mean) AS _syy,
         REGR_SXY(y.ts_mean, x.ts_mean) AS _sxy
  FROM ts x JOIN ts y ON x.ts_date = y.ts_date
  WHERE x.dataset = 'sst_a' AND y.dataset = 'sst_b'),
se AS (SELECT *, {stderr_sql("cmp_slope", "_sxx", "_syy", "_sxy", "cmp_n")}
              AS cmp_stderr FROM base),
zs AS (SELECT *, {zstat_sql(tstat_sql("cmp_slope", "cmp_stderr"), "cmp_n")}
              AS _z FROM se)
SELECT ROUND(cmp_slope, {ND}) AS cmp_slope,
       ROUND(cmp_intercept, {ND}) AS cmp_intercept,
       ROUND(cmp_r, {ND}) AS cmp_r,
       cmp_n,
       ROUND(cmp_stderr, {ND}) AS cmp_stderr,
       ROUND({pvalue_from_z_sql("_z", "cmp_stderr")}, {ND}) AS cmp_pvalue
FROM zs
"""


SQL_S1_COMPARE = _sql_s1_compare()


# --------------------------------------------------------------------------
# S2/S3/A5 — map family
# --------------------------------------------------------------------------

def q_s2_time_avg_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import time_avg_map

    obs = domain.observations(spark, sf_dir)
    return _finish(time_avg_map(obs, dataset="sst_a"))


SQL_S2 = _with(OBS) + f"""
SELECT lat, lon, ROUND(AVG(value), {ND}) AS map_mean,
       COUNT(value) AS map_cnt
FROM obs WHERE dataset = 'sst_a'
GROUP BY lat, lon
"""


def q_s3_clim_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import clim_map

    obs = domain.observations(spark, sf_dir)
    return _finish(clim_map(obs, month=3, dataset="sst_a",
                            start_year=1993, end_year=1997))


SQL_S3 = _with(OBS) + f"""
SELECT lat, lon, ROUND(AVG(value), {ND}) AS clim_mean,
       COUNT(value) AS clim_cnt
FROM obs
WHERE dataset = 'sst_a' AND MONTH(time) = 3
  AND YEAR(time) BETWEEN 1993 AND 1997
GROUP BY lat, lon
"""


def q_a5_lonlat_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.maps import lonlat_map

    obs = domain.observations(spark, sf_dir)
    return _finish(lonlat_map(obs, dataset="sst_b"))


def _sql_a5() -> str:
    from nexus_spark.functions.stats import (pvalue_from_z_sql, stderr_sql,
                                             tstat_sql, zstat_sql)

    return _with(OBS) + f"""
, base AS (
  SELECT lat, lon,
         REGR_SLOPE(value, t_day) AS ll_slope,
         REGR_INTERCEPT(value, t_day) AS ll_intercept,
         CORR(t_day, value) AS ll_r,
         AVG(value) AS ll_mean,
         MAX(value) AS ll_max,
         MIN(value) AS ll_min,
         STDDEV_POP(value) AS ll_std,
         COUNT(value) AS ll_cnt,
         REGR_SXX(value, t_day) AS _sxx,
         REGR_SYY(value, t_day) AS _syy,
         REGR_SXY(value, t_day) AS _sxy
  FROM (SELECT lat, lon, value, CAST(epoch(time) AS DOUBLE) / 86400.0 AS t_day
        FROM obs WHERE dataset = 'sst_b') o
  GROUP BY lat, lon),
se AS (SELECT *, {stderr_sql("ll_slope", "_sxx", "_syy", "_sxy", "ll_cnt")}
              AS ll_stderr FROM base),
ts AS (SELECT *, {tstat_sql("ll_slope", "ll_stderr")} AS _t FROM se),
zs AS (SELECT *, {zstat_sql("_t", "ll_cnt")} AS _z FROM ts)
SELECT lat, lon,
       ROUND(ll_slope, {ND}) AS ll_slope,
       ROUND(ll_intercept, {ND}) AS ll_intercept,
       ROUND(ll_r, {ND}) AS ll_r,
       ROUND(ll_mean, {ND}) AS ll_mean,
       ROUND(ll_max, {ND}) AS ll_max,
       ROUND(ll_min, {ND}) AS ll_min,
       ROUND(ll_std, {ND}) AS ll_std,
       ll_cnt,
       ROUND(ll_stderr, {ND}) AS ll_stderr,
       ROUND({pvalue_from_z_sql("_z", "ll_stderr")}, {ND}) AS ll_pvalue
FROM zs
"""


SQL_A5 = _sql_a5()


# --------------------------------------------------------------------------
# S5/S6 — Hovmöller
# --------------------------------------------------------------------------

def q_s5_hofmoeller_lat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.hofmoeller import hofmoeller

    obs = domain.observations(spark, sf_dir)
    return _finish(hofmoeller(obs, axis="lat", dataset="sst_a"))


def q_s6_hofmoeller_lon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.hofmoeller import hofmoeller

    obs = domain.observations(spark, sf_dir)
    return _finish(hofmoeller(obs, axis="lon", dataset="sst_a"))


def _sql_hof(axis: str) -> str:
    return _with(OBS) + f"""
SELECT strftime(time, '%Y-%m-%d') AS hm_date, {axis},
       COUNT(value) AS hm_cnt,
       ROUND(AVG(value), {ND}) AS hm_avg,
       ROUND(MAX(value), {ND}) AS hm_max,
       ROUND(MIN(value), {ND}) AS hm_min,
       ROUND(STDDEV_POP(value), {ND}) AS hm_std
FROM obs WHERE dataset = 'sst_a'
GROUP BY strftime(time, '%Y-%m-%d'), {axis}
"""


# --------------------------------------------------------------------------
# A7/A10 — projection + catalog
# --------------------------------------------------------------------------

def q_a7_data_in_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import data_in_bounds

    obs = domain.observations(spark, sf_dir)
    out = data_in_bounds(obs, dataset="sst_a",
                         min_lat=-10, max_lat=10,
                         min_lon=-60, max_lon=60,
                         start_time="1995-01-01",
                         end_time="1995-12-31 23:59:59")
    # obs.time is midnight-only (verified across all sf dirs); render
    # date-only — ms-precision HH:MM:SS strings are the one surface the
    # driver's canonicalization diverges on (CORRECTNESS_r01).
    return _finish(out.withColumn("time", F.col("time").cast("date")))


SQL_A7 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS time, lat, lon,
       ROUND(value, {ND}) AS value
FROM obs
WHERE dataset = 'sst_a' AND value IS NOT NULL
  AND lat BETWEEN -10 AND 10 AND lon BETWEEN -60 AND 60
  AND time >= TIMESTAMP '1995-01-01' AND time <= TIMESTAMP '1995-12-31 23:59:59'
"""


def q_a10_dataset_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import dataset_list

    obs = domain.observations(spark, sf_dir)
    # Midnight-only timestamps → date-only render (see q_a7_data_in_bounds).
    return _finish(dataset_list(obs)
                   .withColumn("min_time", F.col("min_time").cast("date"))
                   .withColumn("max_time", F.col("max_time").cast("date")))


SQL_A10 = _with(OBS) + """
SELECT dataset, COUNT(value) AS obs_cnt,
       strftime(MIN(time), '%Y-%m-%d') AS min_time,
       strftime(MAX(time), '%Y-%m-%d') AS max_time
FROM obs GROUP BY dataset
"""


# --------------------------------------------------------------------------
# S4/A4 — correlation maps
# --------------------------------------------------------------------------

def q_s4_corr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.correlation import corr_map

    obs = domain.observations(spark, sf_dir)
    return _finish(corr_map(obs, "sst_a", "sst_b"))


SQL_S4 = _with(OBS) + f"""
SELECT x.lat AS lat, x.lon AS lon,
       ROUND(CORR(x.value, y.value), {ND}) AS corr_r,
       COUNT(CASE WHEN x.value IS NOT NULL AND y.value IS NOT NULL
             THEN 1 END) AS corr_cnt
FROM (SELECT time, lat, lon, value FROM obs WHERE dataset = 'sst_a') x
JOIN (SELECT time, lat, lon, value FROM obs WHERE dataset = 'sst_b') y
  ON x.time = y.time AND x.lat = y.lat AND x.lon = y.lon
GROUP BY x.lat, x.lon
"""


def q_a4_corr_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.correlation import corr_map

    obs = domain.observations(spark, sf_dir)
    return _finish(corr_map(obs, "sst_a", "sst_b", resolution=30.0))


SQL_A4 = _with(OBS) + f"""
, g AS (
  SELECT dataset, time,
         FLOOR(lat / 30.0) * 30.0 AS lat, FLOOR(lon / 30.0) * 30.0 AS lon,
         AVG(value) AS value
  FROM obs
  GROUP BY dataset, time, FLOOR(lat / 30.0) * 30.0, FLOOR(lon / 30.0) * 30.0
)
SELECT x.lat AS lat, x.lon AS lon,
       ROUND(CORR(x.value, y.value), {ND}) AS corr_r,
       COUNT(CASE WHEN x.value IS NOT NULL AND y.value IS NOT NULL
             THEN 1 END) AS corr_cnt
FROM (SELECT time, lat, lon, value FROM g WHERE dataset = 'sst_a') x
JOIN (SELECT time, lat, lon, value FROM g WHERE dataset = 'sst_b') y
  ON x.time = y.time AND x.lat = y.lat AND x.lon = y.lon
GROUP BY x.lat, x.lon
"""


# --------------------------------------------------------------------------
# S7 — daily-difference anomaly (as-of climatology join)
# --------------------------------------------------------------------------

def q_s7_daily_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.daily_difference import daily_difference

    obs = domain.observations(spark, sf_dir)
    clim = domain.climatology(spark, sf_dir)
    return _finish(daily_difference(obs, clim, "sst_a", "sst_a_CLIM"))


SQL_S7 = _with(OBS, CLIM) + f"""
, o AS (SELECT time, lat, lon, value, DAYOFYEAR(time) AS doy
        FROM obs WHERE dataset = 'sst_a')
, iv AS (
  SELECT lat, lon, doy AS doy_from,
         COALESCE(LEAD(doy) OVER (PARTITION BY dataset, lat, lon
                                  ORDER BY doy) - 1, 366) AS doy_to,
         value AS clim_value
  FROM clim)
SELECT strftime(o.time, '%Y-%m-%d') AS dd_date,
       ROUND(AVG(o.value - iv.clim_value), {ND}) AS dd_mean,
       ROUND(STDDEV_SAMP(o.value - iv.clim_value), {ND}) AS dd_std,
       COUNT(o.value - iv.clim_value) AS dd_cnt
FROM o JOIN iv
  ON o.lat = iv.lat AND o.lon = iv.lon
 AND o.doy BETWEEN iv.doy_from AND iv.doy_to
GROUP BY strftime(o.time, '%Y-%m-%d')
"""


# --------------------------------------------------------------------------
# S8 — matchup (geodesic radius + time-tolerance join)
# --------------------------------------------------------------------------

_MU_R = 300.0      # km
_MU_TT = 86400.0   # s (reference default tolerance)

_HAVERSINE = """2*6371.0*ASIN(SQRT(
    SIN(RADIANS(ms.lat - mp.lat)/2) * SIN(RADIANS(ms.lat - mp.lat)/2)
    + COS(RADIANS(mp.lat)) * COS(RADIANS(ms.lat))
      * SIN(RADIANS(ms.lon - mp.lon)/2) * SIN(RADIANS(ms.lon - mp.lon)/2)))"""


def q_s8_matchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.matchup import matchup

    p = domain.matchup_primary(spark, sf_dir)
    s = domain.matchup_secondary(spark, sf_dir)
    return _finish(matchup(p, s, radius_km=_MU_R, time_tolerance_s=_MU_TT))


def q_s8_matchup_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.matchup import matchup

    p = domain.matchup_primary(spark, sf_dir)
    s = domain.matchup_secondary(spark, sf_dir)
    return _finish(matchup(p, s, radius_km=_MU_R, time_tolerance_s=_MU_TT,
                           match_once=True))


def _sql_matchup(match_once: bool) -> str:
    base = _with(MP, MS) + f"""
, pairs AS (
  SELECT mp.primary_id,
         strftime(mp.time, '%Y-%m-%d %H:%M:%S') AS p_time,
         mp.lat AS p_lat, mp.lon AS p_lon, mp.value AS p_value,
         ms.secondary_id,
         strftime(ms.time, '%Y-%m-%d %H:%M:%S') AS s_time,
         ms.lat AS s_lat, ms.lon AS s_lon, ms.value AS s_value,
         {_HAVERSINE} AS dist_km,
         ABS(CAST(FLOOR(epoch(mp.time)) AS BIGINT)
             - CAST(FLOOR(epoch(ms.time)) AS BIGINT)) AS dt_s
  FROM mp JOIN ms
    ON ABS(CAST(FLOOR(epoch(mp.time)) AS BIGINT)
           - CAST(FLOOR(epoch(ms.time)) AS BIGINT)) <= {_MU_TT:.0f}
 WHERE {_HAVERSINE} <= {_MU_R}
)
SELECT primary_id, p_time, p_lat, p_lon, p_value,
       secondary_id, s_time, s_lat, s_lon, s_value,
       ROUND(dist_km, {ND}) AS dist_km, dt_s
FROM pairs
"""
    if match_once:
        base += """QUALIFY ROW_NUMBER() OVER (
    PARTITION BY primary_id
    ORDER BY ROUND(dist_km, 6) ASC, secondary_id ASC) = 1
"""
    return base


# --------------------------------------------------------------------------
# A2 — summary-table (zone-map) fast path; oracle = direct aggregation,
# proving the interior+boundary recombination is EXACT
# --------------------------------------------------------------------------

def q_a2_stats_from_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.plans.summary import stats_from_summary

    obs = domain.observations(spark, sf_dir)
    summary = domain.summary_table(spark, sf_dir,
                                   lat_tile_deg=10.0, lon_tile_deg=60.0)
    return _finish(stats_from_summary(
        obs, summary, "sst_a", -25, 25, -160, 160,
        lat_tile_deg=10.0, lon_tile_deg=60.0))


SQL_A2 = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS ts_date,
       ROUND(MIN(value), {ND}) AS ts_min,
       ROUND(MAX(value), {ND}) AS ts_max,
       ROUND({WMEAN}, {ND}) AS ts_mean,
       COUNT(value) AS ts_cnt
FROM obs
WHERE dataset = 'sst_a'
  AND lat BETWEEN -25 AND 25 AND lon BETWEEN -160 AND 160
GROUP BY dataset, strftime(time, '%Y-%m-%d')
HAVING COUNT(value) > 0
"""


# --------------------------------------------------------------------------
# A8 — nearest-value lookup (argmin per day; exercises the equidistant
# tie-break: (5.0, 20.0) is equidistant from lat cells 2.5 and 7.5)
# --------------------------------------------------------------------------

_NV_LAT, _NV_LON = 5.0, 20.0


# One tiled lake per (session, sf_dir): a lake is WRITE-TIME state in a
# deployment (built once at ingest, read by every query) — the same
# ingest-maintained-state rationale as domain.summary_table.
_TILED_LAKE: dict[tuple, str] = {}


def tiled_lake(spark: SparkSession, sf_dir: str) -> str:
    from nexus_spark.operators.dedup import _session_key

    key = (_session_key(spark), sf_dir)
    lake = _TILED_LAKE.get(key)
    if lake is None:
        import tempfile

        lake = tempfile.mkdtemp(prefix="a2_lake_") + "/obs"
        # sst_a only: the sole dataset the A2 queries touch.
        (domain.observations(spark, sf_dir)
         .where(F.col("dataset") == "sst_a")
         .withColumn("lat_tile", F.floor(F.col("lat") / 10.0))
         .withColumn("lon_tile", F.floor(F.col("lon") / 60.0))
         .write.mode("overwrite")
         .partitionBy("lat_tile", "lon_tile").parquet(lake))
        _TILED_LAKE[key] = lake
    return lake


def q_a2_tiled_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 summary fast path over a TILE-PARTITIONED lake with native
    lat_tile/lon_tile partition columns — the deployment shape where the
    boundary recompute's ring predicate becomes real PARTITION PRUNING
    (interior files never open; asserted in test_plans). The observations
    are written out partitioned (once per session — ingest state), read
    back, and aggregated through stats_from_summary with
    use_native_tiles=True; the oracle is the plain full-scan SQL, so
    pruning must lose NOTHING."""
    from nexus_spark.plans.summary import stats_from_summary

    pobs = spark.read.parquet(tiled_lake(spark, sf_dir))
    summary = domain.summary_table(spark, sf_dir,
                                   lat_tile_deg=10.0, lon_tile_deg=60.0)
    return _finish(stats_from_summary(
        pobs, summary, "sst_a", -25, 25, -160, 160,
        lat_tile_deg=10.0, lon_tile_deg=60.0, use_native_tiles=True))


def q_a8_nearest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import nearest_value

    obs = domain.observations(spark, sf_dir)
    return _finish(nearest_value(obs, "sst_a", _NV_LAT, _NV_LON))


SQL_A8 = _with(OBS) + f"""
, o AS (
  SELECT strftime(time, '%Y-%m-%d') AS nv_date,
         lat AS nv_lat, lon AS nv_lon, value AS nv_value,
         ROUND((lat - {_NV_LAT}) * (lat - {_NV_LAT})
               + (lon - {_NV_LON}) * (lon - {_NV_LON}), 9) AS d2
  FROM obs WHERE dataset = 'sst_a' AND value IS NOT NULL)
SELECT nv_date, nv_lat, nv_lon, ROUND(nv_value, {ND}) AS nv_value
FROM o
QUALIFY ROW_NUMBER() OVER (PARTITION BY nv_date
                           ORDER BY d2, nv_lat, nv_lon, nv_value) = 1
"""


# --------------------------------------------------------------------------
# Tile-service predicate vocabulary (SURVEY §2.2)
# --------------------------------------------------------------------------

TILES = domain.cte(domain.TILES_SQL, "tiles")


def q_t_tiles_in_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import tiles_in_box

    t = domain.tiles(spark, sf_dir)
    return _finish(tiles_in_box(t, -20, 20, -100, 100, dataset="sst_a",
                                start_time="1995-01-01", end_time="1995-06-30"))


SQL_T_TILES = _with(TILES) + f"""
SELECT dataset, strftime(tile_date, '%Y-%m-%d') AS tile_date,
       min_lat, max_lat, min_lon, max_lon,
       ROUND(stats_min, {ND}) AS stats_min,
       ROUND(stats_max, {ND}) AS stats_max,
       ROUND(stats_mean, {ND}) AS stats_mean,
       stats_count
FROM tiles
WHERE dataset = 'sst_a'
  AND min_lat <= 20 AND max_lat >= -20 AND min_lon <= 100 AND max_lon >= -100
  AND tile_date >= DATE '1995-01-01' AND tile_date <= DATE '1995-06-30'
"""


def q_t_days_in_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import days_in_range

    obs = domain.observations(spark, sf_dir)
    return _finish(days_in_range(obs, "sst_b", "1996-03-01",
                                 "1996-09-30 23:59:59"))


SQL_T_DAYS = _with(OBS) + """
SELECT DISTINCT strftime(time, '%Y-%m-%d') AS day
FROM obs
WHERE dataset = 'sst_b'
  AND time >= TIMESTAMP '1996-03-01' AND time <= TIMESTAMP '1996-09-30 23:59:59'
"""


def q_t_asof_doy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import asof_day_of_year

    clim = domain.climatology(spark, sf_dir)
    return _finish(asof_day_of_year(clim, 200))


SQL_T_ASOF = _with(CLIM) + f"""
SELECT dataset, lat, lon, MAX(doy) AS asof_doy,
       ROUND(ARG_MAX(value, doy), {ND}) AS asof_value
FROM clim WHERE doy <= 200
GROUP BY dataset, lat, lon
"""


_ASOF_TOL_S = 7200  # purchase matches the latest click <= 2h before it


def q_t_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic keyed event-time AS-OF join (operators/asof.py): every
    purchase event picks the user's most recent click at-or-before it,
    within a 2h tolerance — the point-in-time alignment a feature store
    / trade-vs-quote pipeline runs. The Spark plan is the union +
    running-carry formulation (ONE shuffle, no join node, no range-join
    candidate blow-up); the oracle is DuckDB's NATIVE ASOF LEFT JOIN —
    two independent algorithms checking the same semantics. Right side
    pre-aggregated unique per (user, ts) (ARG_MAX by event_id), the
    operator's documented uniqueness contract."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    right = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("click_id")))
    left = (ev.where(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    "ts"))
    out = asof_join(left, right, ["user_id"], "ts", ["click_id"],
                    tolerance_s=_ASOF_TOL_S)
    return _finish(out)


SQL_T_ASOF_EVENTS = f"""
WITH r AS (SELECT user_id, ts, MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
l AS (SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
j AS (SELECT l.user_id, l.ts, l.purchase_id, r.click_id, r.ts AS rts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts),
t AS (SELECT *,
             rts IS NOT NULL AND FLOOR(epoch(ts)) - FLOOR(epoch(rts))
               <= {_ASOF_TOL_S} AS in_tol
      FROM j)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, purchase_id,
       CASE WHEN in_tol THEN click_id END AS click_id,
       CASE WHEN in_tol THEN strftime(rts, '%Y-%m-%d %H:%M:%S') END
         AS asof_ts
FROM t
"""


def q_sql_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation (functions/skew.salted_count) over a
    synthesized hot key (two of five user-id residues collapse onto one
    'hot' value = ~40% of all events): groupBy(key, content-salt) ->
    groupBy(key), spreading the hot reducer over 16. The driver check
    pins the technique's EXACTNESS — the salted two-phase result must
    hash-match the plain GROUP BY the oracle runs."""
    from nexus_spark.catalog import load_table
    from nexus_spark.functions.skew import salted_count

    ev = (load_table(spark, sf_dir, "events")
          .withColumn("k", F.when(F.col("user_id") % 5 < 2, F.lit("hot"))
                      .otherwise(F.col("user_id").cast("string"))))
    return _finish(salted_count(ev, ["k"], salts=16,
                                out_col="n_events"))


SQL_SALTED_HOT_KEY = """
SELECT CASE WHEN user_id % 5 < 2 THEN 'hot'
            ELSE CAST(user_id AS VARCHAR) END AS k,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


def q_t_distinct_bboxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.tile_service import distinct_bounding_boxes

    t = domain.tiles(spark, sf_dir)
    return _finish(distinct_bounding_boxes(t))


SQL_T_BBOXES = _with(TILES) + """
SELECT DISTINCT min_lat, max_lat, min_lon, max_lon FROM tiles
"""


# --------------------------------------------------------------------------
# Filters — seasonal-cycle removal as a window function
# --------------------------------------------------------------------------

def q_f_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.functions.filtering import seasonal_cycle_filter
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    ts = time_series(obs, datasets=["sst_a"]).select("ts_date", "ts_mean")
    return _finish(seasonal_cycle_filter(ts, "ts_mean", "ts_date"))


SQL_F_SEASONAL = _with(OBS) + f"""
, ts AS (
  SELECT CAST(time AS DATE) AS d, {WMEAN} AS ts_mean
  FROM obs WHERE dataset = 'sst_a'
  GROUP BY CAST(time AS DATE)
)
SELECT strftime(d, '%Y-%m-%d') AS ts_date,
       ROUND(ts_mean, {ND}) AS ts_mean,
       ROUND(ts_mean - AVG(ts_mean) OVER (PARTITION BY MONTH(d)), {ND})
         AS deseasoned
FROM ts
"""


# --------------------------------------------------------------------------
# ETL transforms (SURVEY §2.4) — unit conversions + regrid
# --------------------------------------------------------------------------

def q_etl_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.etl import (
        kelvin_to_celsius, month_start, normalize_longitude,
        uv_to_speed_dir, wind_dir_speed_to_uv)

    ev = load_table(spark, sf_dir, "events")
    direction = (F.col("event_id") % 360).cast("double")
    u, v = wind_dir_speed_to_uv(F.col("value"), direction)
    ev = ev.withColumn("wind_u", u).withColumn("wind_v", v)
    speed2, dir2 = uv_to_speed_dir(F.col("wind_u"), F.col("wind_v"))
    lon0 = (F.col("event_id") % 400).cast("double")
    out = ev.select(
        "event_id",
        kelvin_to_celsius(F.col("value")).alias("celsius"),
        F.col("wind_u").alias("wind_u"),
        F.col("wind_v").alias("wind_v"),
        speed2.alias("speed_rt"),
        dir2.alias("dir_rt"),
        normalize_longitude(lon0).alias("lon_norm"),
        month_start(F.col("ts")).alias("month_start"),
    )
    return _finish(out)


SQL_ETL = f"""
WITH ev AS (
  SELECT event_id, ts, value,
         value * SIN(RADIANS(CAST(event_id % 360 AS DOUBLE))) AS wind_u,
         value * COS(RADIANS(CAST(event_id % 360 AS DOUBLE))) AS wind_v,
         CAST(event_id % 400 AS DOUBLE) AS lon0
  FROM events)
SELECT event_id,
       ROUND(value - 273.15, {ND}) AS celsius,
       ROUND(wind_u, {ND}) AS wind_u,
       ROUND(wind_v, {ND}) AS wind_v,
       ROUND(SQRT(wind_u * wind_u + wind_v * wind_v), {ND}) AS speed_rt,
       ROUND(FMOD(FMOD(DEGREES(ATAN2(-wind_u, -wind_v)), 360.0) + 360.0,
                  360.0), {ND}) AS dir_rt,
       ROUND(CASE WHEN lon0 > 180 THEN lon0 - 360.0 ELSE lon0 END, {ND})
         AS lon_norm,
       strftime(DATE_TRUNC('month', ts), '%Y-%m-%d %H:%M:%S') AS month_start
FROM ev
"""


def q_etl_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.etl import regrid

    obs = domain.observations(spark, sf_dir)
    # Midnight-only timestamps → date-only render (see q_a7_data_in_bounds).
    out = regrid(obs, lat_res=10.0, lon_res=60.0)
    return _finish(out.withColumn("time", F.col("time").cast("date")))


SQL_REGRID = _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS time,
       (FLOOR(lat / 10.0) + 0.5) * 10.0 AS g_lat,
       (FLOOR(lon / 60.0) + 0.5) * 60.0 AS g_lon,
       ROUND(AVG(value), {ND}) AS value,
       COUNT(value) AS cnt
FROM obs
GROUP BY dataset, strftime(time, '%Y-%m-%d'),
         (FLOOR(lat / 10.0) + 0.5) * 10.0, (FLOOR(lon / 60.0) + 0.5) * 60.0
"""


# --------------------------------------------------------------------------
# LLM-pipeline: deduplication (documents table)
# --------------------------------------------------------------------------

def q_d_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import exact_duplicates

    docs = load_table(spark, sf_dir, "documents")
    return _finish(exact_duplicates(docs))


SQL_D_EXACT = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
       COUNT(*) AS dup_cnt
FROM documents GROUP BY md5(text)
"""

_JACCARD_T = 0.2


def q_d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(ngram_jaccard_pairs(docs, threshold=_JACCARD_T))


SQL_D_JACCARD = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END) AS shingles
  FROM d),
e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle FROM sh)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)), {ND}) AS jaccard
FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(COUNT(*) AS DOUBLE)
       / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) >= {_JACCARD_T}
"""


def q_d_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: ngram-jaccard pairs -> connected components ->
    (doc_id, component=min reachable doc id). The cluster-resolution step
    every pair-emitting dedup needs before it can pick survivors."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (connected_components,
                                             ngram_jaccard_pairs)

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=_JACCARD_T)
    return _finish(connected_components(pairs, docs))


def q_d_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size rollup over the components: representative id, member
    count, discarded-duplicate count."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (cluster_representatives,
                                             connected_components,
                                             ngram_jaccard_pairs)

    docs = load_table(spark, sf_dir, "documents")
    comps = connected_components(
        ngram_jaccard_pairs(docs, threshold=_JACCARD_T), docs)
    return _finish(cluster_representatives(comps))


# Recursive-CTE transitive closure gives the oracle the same min-reachable
# label the iterative Spark propagation converges to.
_SQL_CC_CTES = f"""
WITH RECURSIVE d AS (SELECT doc_id, string_split(text, ' ') AS words
                     FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END) AS shingles
  FROM d),
e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle FROM sh),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING CAST(COUNT(*) AS DOUBLE)
         / (ANY_VALUE(a.n) + ANY_VALUE(b.n) - COUNT(*)) >= {_JACCARD_T}),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
m AS (SELECT src AS node, MIN(dst) AS mn FROM reach GROUP BY src),
comp AS (
  SELECT doc.doc_id AS doc_id,
         LEAST(doc.doc_id, COALESCE(m.mn, doc.doc_id)) AS component
  FROM documents doc LEFT JOIN m ON doc.doc_id = m.node)
"""

SQL_D_COMPONENTS = _SQL_CC_CTES + "SELECT doc_id, component FROM comp"

SQL_D_CLUSTER_STATS = _SQL_CC_CTES + """
SELECT component, COUNT(*) AS cluster_size,
       CAST(SUM(CASE WHEN doc_id <> component THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicates
FROM comp GROUP BY component
"""


# Per-language mixing rates for the stratified-sample query (down-weight the
# dominant language, keep the low-resource tail — the standard data-mixing
# shape). Thresholds are md5-prefix hex strings shared with the oracle.
_SAMPLE_RATES = {"en": 0.1, "es": 0.5, "fr": 0.5, "de": 0.5, "zh": 0.25}
_SAMPLE_EXACT_N = 20
_PACK_BUDGET = 512
_PACK_BUCKETS = 8


def q_d_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language fraction sampling: pure filter, no
    shuffle, reproducible at any scale (md5(doc_id)-keyed)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import stratified_sample_fraction

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample_fraction(docs, "lang", _SAMPLE_RATES)
    return _finish(kept.select("doc_id", "lang", "source", "n_chars"))


def q_d_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-stratum reservoir sample (md5 rank order)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import stratified_sample_exact

    docs = load_table(spark, sf_dir, "documents")
    picked = stratified_sample_exact(docs, "lang", _SAMPLE_EXACT_N)
    return _finish(picked.select("doc_id", "lang", "sample_rank"))


def q_d_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 512-token context windows."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return _finish(pack_sequences(docs, budget=_PACK_BUDGET,
                                  n_buckets=_PACK_BUCKETS))


def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return _finish(tfidf_top_terms(docs, k=3))


def _sample_case_sql() -> str:
    from nexus_spark.operators.sampling import fraction_threshold

    arms = " ".join(
        f"WHEN '{lang}' THEN '{fraction_threshold(rate)}'"
        for lang, rate in sorted(_SAMPLE_RATES.items()))
    return f"CASE lang {arms} ELSE '{fraction_threshold(0.0)}' END"


SQL_D_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_sample_case_sql()}
"""

SQL_D_SAMPLE_EXACT_N = f"""
WITH r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id)
           AS sample_rank
  FROM documents)
SELECT doc_id, lang, CAST(sample_rank AS INT) AS sample_rank
FROM r WHERE sample_rank <= {_SAMPLE_EXACT_N}
"""

SQL_D_TOKEN_PACKING = f"""
WITH t AS (
  SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, bucket, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
           AS cum_excl
  FROM t)
SELECT doc_id, bucket, n_tokens,
       CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT)
         AS pack_id,
       CAST(cum_excl % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
FROM c
"""

SQL_TEXT_TFIDF = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY doc_id, word),
dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
s AS (SELECT tf.doc_id, tf.word,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df) AS tfidf
      FROM tf JOIN dfq USING (word) CROSS JOIN n),
r AS (SELECT doc_id, word, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word ASC) AS term_rank
      FROM s)
SELECT doc_id, word, CAST(term_rank AS INT) AS term_rank,
       ROUND(tfidf, {ND}) AS tfidf
FROM r WHERE term_rank <= 3
"""


def q_text_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring: corpus-fit unigram LM, per-doc
    mean negative log-likelihood."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import unigram_nll

    return _finish(unigram_nll(load_table(spark, sf_dir, "documents")))


SQL_TEXT_UNIGRAM_NLL = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
freq AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word),
tot AS (SELECT SUM(cnt) AS total FROM freq),
s AS (SELECT w.doc_id,
             -ln(CAST(freq.cnt AS DOUBLE) / tot.total) AS nl
      FROM w JOIN freq USING (word) CROSS JOIN tot)
SELECT doc_id, COUNT(*) AS n_tokens_m,
       ROUND(AVG(nl), {ND}) AS nll,
       ROUND(EXP(AVG(nl)), {ND}) AS ppl
FROM s GROUP BY doc_id
"""


def q_d_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (mT5/XLM-R alpha-sampling,
    alpha=0.3) over the predicted-language groups: data-dependent rates
    computed in-plan, md5-fraction keep test, per-language achieved
    counts as the surface. The oracle recomputes rates and re-selects
    the exact row set."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import temperature_sample
    from nexus_spark.operators.text import text_stats

    stats = text_stats(load_table(spark, sf_dir, "documents"))
    samp = temperature_sample(stats, "lang_pred", alpha=0.3)
    return _finish(samp.groupBy("lang_pred", "group_rate")
                   .agg(F.count(F.lit(1)).alias("n_sampled"))
                   .select("lang_pred", "n_sampled", "group_rate"))


def _sql_temperature_mix() -> str:
    return f"""
WITH ts AS ({_sql_text_stats()}),
c AS (SELECT lang_pred, COUNT(*) AS n_g FROM ts GROUP BY lang_pred),
t AS (SELECT SUM(POW(CAST(n_g AS DOUBLE), 0.3)) AS z,
             MIN(n_g) * COUNT(*) AS t_default FROM c),
r AS (SELECT lang_pred,
             ROUND(LEAST(1.0, CAST(t_default AS DOUBLE)
                   * POW(CAST(n_g AS DOUBLE), 0.3) / z / n_g), 6)
               AS group_rate
      FROM c, t),
s AS (SELECT ts.doc_id, ts.lang_pred, r.group_rate
      FROM ts JOIN r USING (lang_pred)
      WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                 AS BIGINT) / 4294967296.0 < group_rate)
SELECT lang_pred, COUNT(*) AS n_sampled, group_rate
FROM s GROUP BY lang_pred, group_rate
"""


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-distribution PSI between two snapshot halves of the corpus
    (doc_id parity) — ingest monitoring over token-count deciles (a
    richer category set than the 4-value quality score on this fixture).
    Smoothing, per-category terms and the total are recomputed exactly
    by the oracle."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import distribution_drift, token_count

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(token_count(F.col("text")) / F.lit(10),
                     F.lit(9)).cast("int")
    return _finish(distribution_drift(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1), bucket))


def _sql_corpus_drift() -> str:
    return f"""
WITH q AS (
  SELECT doc_id,
         CAST(LEAST(len(string_split(text, ' ')) // 10, 9) AS INT)
           AS score
  FROM documents),
a AS (SELECT score, COUNT(*) AS cnt_a FROM q WHERE doc_id % 2 = 0
      GROUP BY score),
b AS (SELECT score, COUNT(*) AS cnt_b FROM q WHERE doc_id % 2 = 1
      GROUP BY score),
j AS (SELECT COALESCE(a.score, b.score) AS score,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
      FROM a FULL OUTER JOIN b ON a.score = b.score),
p AS (
  SELECT score,
         (cnt_a + 0.5) / (SUM(cnt_a) OVER ()
                          + 0.5 * COUNT(*) OVER ()) AS pa,
         (cnt_b + 0.5) / (SUM(cnt_b) OVER ()
                          + 0.5 * COUNT(*) OVER ()) AS pb
  FROM j)
SELECT score,
       ROUND(pa, {ND}) AS frac_a,
       ROUND(pb, {ND}) AS frac_b,
       ROUND((pa - pb) * ln(pa / pb), {ND}) AS psi_term,
       ROUND(SUM((pa - pb) * ln(pa / pb)) OVER (), {ND}) AS psi
FROM p
"""


def q_text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram LM perplexity per document (CCNet-role filter,
    one order up from text_unigram_nll)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import bigram_nll

    return _finish(bigram_nll(load_table(spark, sf_dir, "documents")))


SQL_TEXT_BIGRAM_NLL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
big AS (
  SELECT doc_id, words[i] AS prev, words[i + 1] AS cur
  FROM d, LATERAL unnest(generate_series(1, len(words) - 1)) AS t(i)),
cb AS (SELECT prev, cur, COUNT(*) AS c_bc FROM big GROUP BY prev, cur),
cu AS (SELECT prev, SUM(c_bc) AS c_b FROM cb GROUP BY prev),
s AS (SELECT doc_id, -ln(CAST(c_bc AS DOUBLE) / c_b) AS nl
      FROM big JOIN cb USING (prev, cur) JOIN cu USING (prev))
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(nl), {ND}) AS nll,
       ROUND(EXP(AVG(nl)), {ND}) AS ppl
FROM s GROUP BY doc_id
"""


_CHUNK_T, _CHUNK_S = 24, 16


def q_d_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping RAG-style chunking of the documents table (24-token
    windows, stride 16 — 8-token overlap)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import chunk_documents

    out = chunk_documents(load_table(spark, sf_dir, "documents"),
                          chunk_tokens=_CHUNK_T, stride=_CHUNK_S)
    return _finish(out.withColumnRenamed("id", "doc_id"))


SQL_D_CHUNKING = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
SELECT doc_id,
       CAST(i AS INT) AS chunk_idx,
       CAST(i * {_CHUNK_S} AS INT) AS chunk_start,
       array_to_string(words[i*{_CHUNK_S}+1:i*{_CHUNK_S}+{_CHUNK_T}], ' ')
         AS chunk_text,
       CAST(LEAST(len(words) - i*{_CHUNK_S}, {_CHUNK_T}) AS INT)
         AS n_chunk_tokens
FROM d, LATERAL unnest(generate_series(
          0, (GREATEST(len(words) - 1, 0)) // {_CHUNK_S})) AS t(i)
WHERE i * {_CHUNK_S} < len(words) OR i = 0
"""


def q_text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-32 corpus vocabulary + per-doc OOV rate (tokenizer prep)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import vocab_oov

    return _finish(vocab_oov(load_table(spark, sf_dir, "documents"),
                             vocab_size=32))


SQL_TEXT_VOCAB_OOV = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
           FROM documents),
v AS (SELECT word FROM (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word)
      ORDER BY cnt DESC, word LIMIT 32)
SELECT doc_id,
       COUNT(*) AS n_tokens_v,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), {ND}) AS oov_rate
FROM w LEFT JOIN v USING (word)
GROUP BY doc_id
"""


def q_text_zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token frequencies + Zipf slope (corpus distributional
    health check; operators/text.zipf_profile)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import zipf_profile

    return _finish(zipf_profile(load_table(spark, sf_dir, "documents"),
                                k=50))


SQL_TEXT_ZIPF = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
c AS (SELECT word, COUNT(*) AS freq FROM w WHERE word <> ''
      GROUP BY word),
t AS (SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word ASC) AS rank
      FROM c ORDER BY freq DESC, word ASC LIMIT 50),
s AS (SELECT REGR_SLOPE(ln(freq), ln(rank)) AS zipf_slope FROM t)
SELECT word, freq, rank, ROUND(zipf_slope, {ND}) AS zipf_slope
FROM t CROSS JOIN s
"""


def q_text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-word collocations by PMI with min pair count 5
    (operators/text.pmi_bigrams; Church & Hanks 1990)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import pmi_bigrams

    return _finish(pmi_bigrams(load_table(spark, sf_dir, "documents"),
                               k=20, min_count=5))


SQL_TEXT_PMI = f"""
WITH d AS (SELECT string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
big AS (
  SELECT words[i] AS w1, words[i + 1] AS w2
  FROM d, LATERAL unnest(generate_series(1, len(words) - 1)) AS t(i)),
uni AS (SELECT w, COUNT(*) AS c_u FROM
        (SELECT unnest(words) AS w FROM d) GROUP BY w),
nu AS (SELECT SUM(c_u) AS n_u FROM uni),
nb AS (SELECT COUNT(*) AS n_b FROM big),
cb AS (SELECT w1, w2, COUNT(*) AS c_p FROM big GROUP BY w1, w2
       HAVING COUNT(*) >= 5),
s AS (
  SELECT w1, w2, c_p AS pair_count,
         ln(CAST(c_p AS DOUBLE) / n_b)
           - ln(CAST(u1.c_u AS DOUBLE) / n_u)
           - ln(CAST(u2.c_u AS DOUBLE) / n_u) AS pmi
  FROM cb JOIN uni u1 ON cb.w1 = u1.w
          JOIN uni u2 ON cb.w2 = u2.w
  CROSS JOIN nu CROSS JOIN nb),
t AS (SELECT *, ROW_NUMBER() OVER (ORDER BY ROUND(pmi, 6) DESC,
                                   w1 ASC, w2 ASC) AS rank
      FROM s ORDER BY ROUND(pmi, 6) DESC, w1 ASC, w2 ASC LIMIT 20)
SELECT w1, w2, pair_count, ROUND(pmi, {ND}) AS pmi, rank FROM t
"""


def q_text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, first 3 merges learned from the documents
    corpus (operators/text.learn_bpe_merges; Sennrich ACL'16): per round
    the most frequent frequency-weighted adjacent symbol pair (ties:
    lexicographic) merges across the whole vocabulary. The oracle
    replays the identical loop in SQL using a delimiter-string replace:
    applying merge (l, r) to a '\\x1f\\x1f'-delimited symbolization via
    global replace('\\x1fl\\x1f\\x1fr\\x1f' -> '\\x1flr\\x1f') IS
    left-to-right non-overlapping BPE (SQL replace rescans after each
    substitution, and the half-separator boundary keeps back-to-back
    matches intact — 'a a a a' under (a,a) becomes [aa, aa])."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import learn_bpe_merges

    merges = learn_bpe_merges(load_table(spark, sf_dir, "documents"),
                              n_merges=3)
    return spark.createDataFrame(
        merges, "rank long, left_sym string, right_sym string, "
                "pair_count long")


def _bpe_rounds_cte(rounds: int) -> str:
    """Shared CTE text for the DuckDB replay of BPE training: `rounds`
    chained (pair-count -> argmax -> replace-apply) rounds over the
    unit-separator-delimited vocabulary, `word` key carried through so
    the apply side can join back (see q_text_bpe_learn for why the
    replace trick is exact)."""
    sep, s2 = "\x1f", "\x1f\x1f"
    parts = [f"""
WITH w0 AS (
  SELECT word,
         '{s2}' || array_to_string(regexp_extract_all(word, '.'),
                                   '{s2}') || '{s2}' AS s, f
  FROM (SELECT word, COUNT(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> '' GROUP BY word))"""]
    for i in range(1, rounds + 1):
        parts.append(f""",
p{i} AS (
  SELECT cs[j] AS l, cs[j + 1] AS r, f
  FROM (SELECT list_filter(string_split(s, '{s2}'),
                           x -> x <> '') AS cs, f
        FROM w{i - 1}),
       LATERAL unnest(generate_series(1, len(cs) - 1)) AS t(j)),
c{i} AS (SELECT l, r, SUM(f) AS pc FROM p{i} GROUP BY l, r),
m{i} AS (SELECT l, r, pc FROM c{i} ORDER BY pc DESC, l, r LIMIT 1),
w{i} AS (
  SELECT word,
         replace(s,
                 '{sep}' || (SELECT l FROM m{i}) || '{s2}'
                         || (SELECT r FROM m{i}) || '{sep}',
                 '{sep}' || (SELECT l FROM m{i})
                         || (SELECT r FROM m{i}) || '{sep}') AS s, f
  FROM w{i - 1})""")
    return "".join(parts)


def _sql_bpe_learn(rounds: int = 3) -> str:
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS left_sym, "
        f"r AS right_sym, CAST(pc AS BIGINT) AS pair_count FROM m{i}"
        for i in range(1, rounds + 1)]
    return _bpe_rounds_cte(rounds) + "\n" + "\nUNION ALL\n".join(selects)


def _sql_bpe_apply(rounds: int = 3) -> str:
    """DuckDB replay of bpe_apply_counts: the same training rounds, then
    per-doc token counts via the final vocabulary symbolization."""
    s2 = "\x1f\x1f"
    return _bpe_rounds_cte(rounds) + f""",
wl AS (SELECT doc_id, word
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents)
       WHERE word <> ''),
tok AS (SELECT word,
               len(list_filter(string_split(s, '{s2}'),
                               x -> x <> '')) AS w_tokens
        FROM w{rounds})
SELECT doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(w_tokens) AS BIGINT) AS n_tokens_bpe
FROM wl JOIN tok USING (word)
GROUP BY doc_id"""


def q_text_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-tokenize end to end: learn 3 BPE merges from the
    corpus (q_text_bpe_learn's loop), apply them in order over the
    vocabulary, and count per-document BPE tokens
    (operators/text.bpe_apply_counts). The oracle replays training AND
    application with the same delimiter-replace rounds, joining the
    final vocabulary symbolization back onto the per-doc word stream."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import (bpe_apply_counts,
                                            learn_bpe_merges)

    docs = load_table(spark, sf_dir, "documents")
    merges = learn_bpe_merges(docs, n_merges=3)
    out = bpe_apply_counts(docs, merges)
    return _finish(out.withColumnRenamed("id", "doc_id"))


def q_d_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution capping (domain-cap curation,
    operators/sampling.cap_per_group): each source keeps its 40
    hash-selected documents; output is the capped doc set with ranks."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    out = cap_per_group(docs, "source", 40, id_col="doc_id")
    return _finish(out.select("doc_id", "source", "group_rank"))


SQL_D_SOURCE_CAPS = """
SELECT doc_id, source, group_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8) ASC,
                            doc_id ASC) AS group_rank
  FROM documents)
WHERE group_rank <= 40
"""


def q_d_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination audit: docs overlapping a benchmark slice (every
    20th doc stands in for the eval corpus) by distinct 3-gram shingles.
    The benchmark set reduces to a broadcast distinct-hash set."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import contamination_check

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 20 == 0)
    train = docs.where(F.col("doc_id") % 20 != 0)
    return _finish(contamination_check(train, bench))


SQL_D_CONTAMINATION = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE doc_id % 20 <> 0),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END) AS shingles
  FROM d),
e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle
      FROM sh),
bd AS (SELECT string_split(text, ' ') AS words
       FROM documents WHERE doc_id % 20 = 0),
bsh AS (
  SELECT DISTINCT unnest(
           CASE WHEN len(words) >= 3 THEN
             [array_to_string(words[i:i+2], ' ')
              FOR i IN generate_series(1, len(words) - 2)]
           ELSE [array_to_string(words, ' ')] END) AS shingle
  FROM bd)
SELECT e.doc_id, COUNT(*) AS n_hits, ANY_VALUE(e.n) AS n_shingles,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(e.n), {ND})
         AS contamination
FROM e JOIN bsh ON e.shingle = bsh.shingle
GROUP BY e.doc_id
"""


_WINNOW_T = 0.3


def q_d_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint near-dup pairs (SIGMOD'03 fingerprinting):
    sparser postings than full shingling at the same match guarantee."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import winnow_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(winnow_pairs(docs, threshold=_WINNOW_T))


SQL_D_WINNOW = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (SELECT doc_id,
        CASE WHEN len(words) >= 4 THEN
          [md5(array_to_string(words[i:i+3], ' '))
           FOR i IN generate_series(1, len(words) - 3)]
        ELSE [md5(array_to_string(words, ' '))] END AS grams
      FROM d),
s AS (SELECT doc_id,
        CASE WHEN len(grams) >= 4 THEN
          list_distinct([list_min(grams[j:j+3])
           FOR j IN generate_series(1, len(grams) - 3)])
        ELSE [list_min(grams)] END AS fps
      FROM g),
e AS (SELECT doc_id, len(fps) AS n, unnest(fps) AS fp FROM s)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / LEAST(ANY_VALUE(a.n), ANY_VALUE(b.n)), {ND}) AS overlap
FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING CAST(COUNT(*) AS DOUBLE)
       / LEAST(ANY_VALUE(a.n), ANY_VALUE(b.n)) >= {_WINNOW_T}
"""


def q_d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup (no SQL oracle: xxhash64 signatures are not
    reproducible in DuckDB; recall vs exact jaccard is covered by unit
    tests)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(minhash_lsh_pairs(docs, threshold=_JACCARD_T))


def q_d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup banding (no SQL oracle: xxhash64-based)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(simhash_pairs(docs, max_hamming=6))


# Top pairwise cosines in the synthetic embeddings peak near ~0.5; 0.4
# yields a real (non-empty) near-dup set to verify.
_COS_T = 0.4


def q_d_near_dup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import embedding_near_dup

    emb = load_table(spark, sf_dir, "embeddings")
    return _finish(embedding_near_dup(emb, threshold=_COS_T))


_VECS = """
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
n AS (SELECT vec_id, vec,
             sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm FROM v)
"""

def q_d_near_dup_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS mapInPandas brute-force near-dup (no SQL oracle: BLAS sum
    order differs from sequential; equivalence to the oracled JVM path is
    unit-tested to 1e-9)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import embedding_near_dup_gemm

    emb = load_table(spark, sf_dir, "embeddings")
    return _finish(embedding_near_dup_gemm(emb, threshold=_COS_T))


def q_d_near_dup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed embedding near-dup — the 100 TB route (pair volume
    sum(|cell|^2), not n^2). Oracle-checkable because every stage is
    deterministic: md5-seeded centroid pick, ROUND(cos,6)+cent_id
    tie-broken multi-probe assignment, exact cosine on surviving pairs —
    the same technique that oracles SQL_SIM_IVF."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import embedding_near_dup_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    return _finish(embedding_near_dup_ivf(emb, threshold=_COS_T))


# Deterministic IVF candidate CTEs shared by the IVF near-dup oracle and
# the semantic-dedup oracle (mirrors dedup.embedding_near_dup_ivf:
# n_centroids=32, nprobe=2).
_IVF_CAND = """
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
cells AS (
  SELECT vec_id AS id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 2),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM cells x JOIN cells y USING (cent_id)
  WHERE x.id < y.id)
"""


SQL_D_EMB_IVF = f"""
WITH {_VECS},
{_IVF_CAND},
scored AS (
  SELECT id_a, id_b,
         list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) AS cosine
  FROM cand JOIN n a ON a.vec_id = id_a JOIN n b ON b.vec_id = id_b)
SELECT id_a, id_b, ROUND(cosine, {ND}) AS cosine
FROM scored WHERE cosine >= {_COS_T}
"""


def q_d_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end semantic dedup: embedding cosine near-dup pairs →
    connected components → per-cluster survivor stats. The full pipeline a
    pretraining corpus runs (pairs alone are not dedup decisions). The
    pair stage is the IVF-bucketed scale path (sum(|cell|^2) pair volume);
    the oracle rebuilds the same deterministic cells, so the driver checks
    the IVF route end-to-end — d_near_dup_embedding keeps the brute
    baseline oracled separately."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (cluster_representatives,
                                             connected_components,
                                             embedding_near_dup_ivf)

    emb = load_table(spark, sf_dir, "embeddings")
    comps = connected_components(
        embedding_near_dup_ivf(emb, threshold=_COS_T), emb, id_col="vec_id")
    return _finish(cluster_representatives(comps, id_col="vec_id"))


SQL_D_SEMANTIC_DEDUP = f"""
WITH RECURSIVE {_VECS},
{_IVF_CAND},
p AS (
  SELECT id_a, id_b
  FROM cand JOIN n a ON a.vec_id = id_a JOIN n b ON b.vec_id = id_b
  WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= {_COS_T}),
edges AS (SELECT id_a AS src, id_b AS dst FROM p
          UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src),
m AS (SELECT src AS node, MIN(dst) AS mn FROM reach GROUP BY src),
comp AS (
  SELECT e.vec_id AS vec_id,
         LEAST(e.vec_id, COALESCE(m.mn, e.vec_id)) AS component
  FROM embeddings e LEFT JOIN m ON e.vec_id = m.node)
SELECT component, COUNT(*) AS cluster_size,
       CAST(SUM(CASE WHEN vec_id <> component THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicates
FROM comp GROUP BY component
"""


SQL_D_EMB = f"""
WITH {_VECS}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm), {ND}) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.vec, b.vec) / (a.nrm * b.nrm) >= {_COS_T}
"""


# --------------------------------------------------------------------------
# LLM-pipeline: similarity search (embeddings table)
# --------------------------------------------------------------------------

_KNN_QUERIES = 20
_KNN_K = 5


def q_sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(knn_bruteforce(emb, queries_df, k=_KNN_K))


SQL_SIM_KNN = f"""
WITH {_VECS},
q AS (SELECT * FROM n WHERE vec_id < {_KNN_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM q JOIN n c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cosine, {ND}) AS cosine
FROM ranked WHERE rank <= {_KNN_K}
"""


def q_sim_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search (PRE-filter formulation): top-5 neighbors
    among documents with >= 40 tokens only — true top-k among the
    qualifying corpus, not a post-filtered ANN result."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import filtered_knn

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    pred = F.size(F.split(F.col("text"), " ")) >= 40
    return _finish(filtered_knn(emb, queries_df, docs, pred, k=_KNN_K))


SQL_SIM_FILTERED = f"""
WITH {_VECS},
ok AS (SELECT doc_id FROM documents
       WHERE len(string_split(text, ' ')) >= 40),
q AS (SELECT * FROM n WHERE vec_id < {_KNN_QUERIES}),
cand AS (SELECT n.* FROM n JOIN ok ON n.vec_id = ok.doc_id),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM q JOIN cand c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cosine, {ND}) AS cosine
FROM ranked WHERE rank <= {_KNN_K}
"""


def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN. Approximate vs brute force, but fully
    DETERMINISTIC: the hyperplanes are seeded-RNG literals baked into the
    plan, so DuckDB reproduces the exact buckets (same float constants,
    same sequential dot products) and the oracle hash-compares the whole
    bucket→candidate→score→top-k pipeline."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_lsh(emb, queries_df, k=_KNN_K))


def _sql_sim_lsh(n_planes: int = 4, n_tables: int = 8, seed: int = 42) -> str:
    """DuckDB mirror of similarity.ann_lsh: same seeded hyperplane
    literals (similarity._bucket_sql), same sign-bit bucket packing, same
    candidate equi-join and scoring tie-breaks as SQL_SIM_IVF."""
    import numpy as np

    selects = []
    for t in range(n_tables):
        rng = np.random.RandomState(seed + 1000 * t)
        planes = rng.randn(n_planes, 64)
        bits = []
        for p in range(n_planes):
            arr = ", ".join(repr(float(h)) for h in planes[p])
            proj = f"list_dot_product(vec, [{arr}])"
            bits.append(f"CASE WHEN {proj} >= 0 THEN {2 ** p} ELSE 0 END")
        selects.append(f"SELECT vec_id, {t} AS tbl, "
                       + " + ".join(bits) + " AS bucket FROM n")
    buckets = "\nUNION ALL ".join(selects)
    return f"""
WITH {_VECS},
buckets AS ({buckets}),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM buckets q JOIN buckets c USING (tbl, bucket)
  WHERE q.vec_id < {_KNN_QUERIES} AND q.vec_id <> c.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = query_id
            JOIN n c ON c.vec_id = neighbor_id)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank,
       ROUND(cosine, {ND}) AS cosine
FROM scored
QUALIFY rank <= {_KNN_K}
"""


# --------------------------------------------------------------------------
# LLM-pipeline: text analysis (documents table)
# --------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import text_stats

    docs = load_table(spark, sf_dir, "documents")
    return _finish(text_stats(docs))


def q_d_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pretraining-corpus curation (text.curate): quality gate
    → exact dedup on the normalized fingerprint, one scan + one hash
    aggregate. The oracle composes the text-stats SQL with the same gate
    and a fingerprint GROUP BY."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import curate

    docs = load_table(spark, sf_dir, "documents")
    return _finish(curate(docs, min_quality=0.6))


def _sql_curation(source: str = "documents") -> str:
    return f"""
WITH stats AS ({_sql_text_stats(source)}),
gated AS (SELECT * FROM stats WHERE quality >= 0.6),
kept AS (SELECT fingerprint, MIN(doc_id) AS doc_id,
                COUNT(*) AS dup_cnt
         FROM gated GROUP BY fingerprint)
SELECT g.doc_id, g.n_tokens, g.quality, g.lang_pred, g.fingerprint,
       k.dup_cnt
FROM gated g JOIN kept k USING (fingerprint, doc_id)
"""


def q_d_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus-construction pipeline in ONE declarative plan:
    quality-gated curation (text.curate) → deterministic per-language
    mixing sample (md5-threshold filter on the PREDICTED language) →
    concat-and-chunk packing into 512-token context windows using the
    token counts the curation pass already computed. Catalyst fuses the
    gate+sample filters into the curation scan; the only shuffles are the
    curation fingerprint aggregate and the packing bucket window."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import (pack_sequences,
                                                stratified_sample_fraction)
    from nexus_spark.operators.text import curate

    docs = load_table(spark, sf_dir, "documents")
    curated = curate(docs, min_quality=0.6)
    sampled = stratified_sample_fraction(curated, "lang_pred",
                                         _SAMPLE_RATES)
    return _finish(pack_sequences(sampled, budget=_PACK_BUDGET,
                                  n_buckets=_PACK_BUCKETS,
                                  tokens_col="n_tokens"))


def _sql_corpus_mix() -> str:
    from nexus_spark.operators.sampling import fraction_threshold

    arms = " ".join(
        f"WHEN '{lang}' THEN '{fraction_threshold(rate)}'"
        for lang, rate in sorted(_SAMPLE_RATES.items()))
    case = f"CASE lang_pred {arms} ELSE '{fraction_threshold(0.0)}' END"
    return f"""
WITH cur AS ({_sql_curation()}),
samp AS (SELECT * FROM cur
         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {case}),
t AS (SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
             CAST(n_tokens AS INT) AS n_tokens
      FROM samp),
c AS (SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_excl
      FROM t)
SELECT doc_id, bucket, n_tokens,
       CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT)
         AS pack_id,
       CAST(cum_excl % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack
FROM c
"""


def q_d_export_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete training-data EXPORT pipeline in one declarative
    plan: quality-gated curation (scan-fused filters + one fingerprint
    dedup aggregate) → concat-and-chunk packing into 512-token context
    windows (one bucket-window cumsum, reusing the token counts the
    curation pass computed) → deterministic global shuffle + balanced
    shard assignment (md5 permutation, one per-shard rank window). The
    surface is exactly what a shard writer consumes: for every surviving
    document, its pack, its offset in the pack, its shard, and its
    position within the shard."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import pack_sequences, shuffle_shards
    from nexus_spark.operators.text import curate

    docs = load_table(spark, sf_dir, "documents")
    curated = curate(docs, min_quality=0.6)
    packed = pack_sequences(curated, budget=_PACK_BUDGET,
                            n_buckets=_PACK_BUCKETS, tokens_col="n_tokens")
    sharded = shuffle_shards(packed, n_shards=_N_SHARDS, seed="r4")
    return _finish(sharded.select("doc_id", "n_tokens", "pack_id",
                                  "offset_in_pack", "shard",
                                  "pos_in_shard"))


def _sql_export_pipeline() -> str:
    return f"""
WITH cur AS ({_sql_curation()}),
t AS (SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
             CAST(n_tokens AS INT) AS n_tokens
      FROM cur),
c AS (SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_excl
      FROM t),
p AS (SELECT doc_id, n_tokens,
             CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {_PACK_BUDGET})
                  AS BIGINT) AS pack_id,
             CAST(cum_excl % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack,
             substr(md5('r4:' || CAST(doc_id AS VARCHAR)), 1, 8) AS skey
      FROM c),
s AS (SELECT *, ('0x' || skey)::BIGINT % {_N_SHARDS} AS shard FROM p)
SELECT doc_id, n_tokens, pack_id, offset_in_pack, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
            ORDER BY skey, doc_id) AS INT) AS pos_in_shard
FROM s
"""


def q_d_gated_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPORT WITH THE EXPECTATIONS GATE IN THE PIPELINE: row-level
    quality rules (the streaming gate's rule compiler,
    streaming/quality.fails_column) route documents BEFORE curation —
    failing rows land in the quarantine branch tagged with the names of
    the rules they failed; passing rows flow through the unchanged
    curate → pack → shard export. One declarative plan, two branches of
    one scan: the gate is a JVM predicate fused into the document scan,
    so the hard-rule enforcement costs nothing at 100 TB beyond the
    export scan it now fronts. (Curation's quality/dup cuts are NOT
    quarantine — a below-threshold doc is simply not exported; the
    quarantine branch is for rule VIOLATIONS that need replay/fixing.)

    Output: doc_id, route ('export'|'quarantine'), fails, and the shard-
    writer surface (n_tokens, pack_id, offset_in_pack, shard,
    pos_in_shard — NULL on the quarantine branch)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import pack_sequences, shuffle_shards
    from nexus_spark.operators.text import curate
    from nexus_spark.streaming.quality import fails_column

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.withColumn("fails", fails_column(_GATE_RULES()))
    # Row-level gate + row-wise stats: curation of the gated subset is
    # served from the shared corpus stats frame via keep_ids (round 13)
    # instead of re-running the HOF projection on the filtered plan.
    curated = curate(docs, min_quality=0.6,
                     keep_ids=tagged.where(F.col("fails") == "")
                     .select("doc_id"))
    packed = pack_sequences(curated, budget=_PACK_BUDGET,
                            n_buckets=_PACK_BUCKETS, tokens_col="n_tokens")
    sharded = shuffle_shards(packed, n_shards=_N_SHARDS, seed="r4")
    exported = sharded.select(
        "doc_id", F.lit("export").alias("route"), F.lit("").alias("fails"),
        "n_tokens", "pack_id", "offset_in_pack", "shard", "pos_in_shard")
    qsel = [F.col("doc_id"), F.lit("quarantine").alias("route"),
            F.col("fails")]
    qsel += [F.lit(None).cast(f.dataType).alias(f.name)
             for f in exported.schema.fields[3:]]
    quarantined = tagged.where(F.col("fails") != "").select(*qsel)
    return _finish(exported.unionByName(quarantined))


def _GATE_RULES() -> list:
    """The shared hard-rule set of the gated export and the executed
    streaming quality gate — declared once so batch enforcement, stream
    enforcement and both oracles stay in lockstep."""
    return [
        ("len_range", F.col("n_chars").between(1, 400)),
        ("lang_ok", F.col("lang").isin("de", "en", "es", "fr")),
        ("text_nonempty", F.col("text").isNotNull()
         & (F.length("text") > 0)),
    ]


_SQL_GATE_FAILS = """concat_ws(',',
  CASE WHEN n_chars BETWEEN 1 AND 400 THEN NULL ELSE 'len_range' END,
  CASE WHEN lang IN ('de', 'en', 'es', 'fr') THEN NULL
       ELSE 'lang_ok' END,
  CASE WHEN text IS NOT NULL AND length(text) > 0 THEN NULL
       ELSE 'text_nonempty' END)"""


def _sql_gated_export() -> str:
    return f"""
WITH f AS (SELECT *, {_SQL_GATE_FAILS} AS fails FROM documents),
gdocs AS (SELECT * EXCLUDE (fails) FROM f WHERE fails = ''),
cur AS ({_sql_curation(source="gdocs")}),
t AS (SELECT doc_id, doc_id % {_PACK_BUCKETS} AS bucket,
             CAST(n_tokens AS INT) AS n_tokens
      FROM cur),
c AS (SELECT doc_id, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS cum_excl
      FROM t),
p AS (SELECT doc_id, n_tokens,
             CAST(FLOOR(CAST(cum_excl AS DOUBLE) / {_PACK_BUDGET})
                  AS BIGINT) AS pack_id,
             CAST(cum_excl % {_PACK_BUDGET} AS BIGINT) AS offset_in_pack,
             substr(md5('r4:' || CAST(doc_id AS VARCHAR)), 1, 8) AS skey
      FROM c),
s AS (SELECT *, ('0x' || skey)::BIGINT % {_N_SHARDS} AS shard FROM p)
SELECT doc_id, 'export' AS route, '' AS fails, n_tokens, pack_id,
       offset_in_pack, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
            ORDER BY skey, doc_id) AS INT) AS pos_in_shard
FROM s
UNION ALL
SELECT doc_id, 'quarantine' AS route, fails, CAST(NULL AS INT),
       CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
       CAST(NULL AS INT)
FROM f WHERE fails <> ''
"""


_SEG_T = 16


def q_text_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language detection: chunk-level language ID + per-doc mix
    profile (dominant language, minority chunk fraction)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import language_segments

    docs = load_table(spark, sf_dir, "documents")
    return _finish(language_segments(docs, chunk_tokens=_SEG_T))


def _sql_lang_segments() -> str:
    from nexus_spark.operators.text import LANG_MARKERS

    scores = {lang: _sql_lang_score(m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs):
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1:])
        cases.append(f"WHEN {cond} THEN '{lang}'" if cond
                     else f"ELSE '{lang}'")
    lang_case = "CASE " + " ".join(cases) + " END"
    t = _SEG_T
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS allwords
           FROM documents),
ch AS (SELECT doc_id, allwords[i*{t}+1:i*{t}+{t}] AS words
       FROM d, LATERAL unnest(generate_series(
                 0, (GREATEST(len(allwords) - 1, 0)) // {t})) AS g(i)
       WHERE i * {t} < len(allwords) OR i = 0),
sc AS (SELECT doc_id,
              {", ".join(f"{s} AS s_{lang}"
                         for lang, s in scores.items())}
       FROM ch),
cl AS (SELECT doc_id, {lang_case} AS lang_c FROM sc),
ct AS (SELECT doc_id, lang_c, COUNT(*) AS c FROM cl
       GROUP BY doc_id, lang_c),
pr AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chunks,
              COUNT(*) AS n_langs
       FROM ct GROUP BY doc_id),
dom AS (SELECT doc_id, lang_c AS dom_lang, c AS dom_c FROM ct
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY c DESC, lang_c) = 1)
SELECT pr.doc_id AS id, pr.n_chunks, pr.n_langs, dom.dom_lang,
       ROUND(1.0 - dom.dom_c / CAST(pr.n_chunks AS DOUBLE), {ND})
         AS minority_frac
FROM pr JOIN dom USING (doc_id)
"""


_DSIR_K = 200


def q_d_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: unigram-LM log-likelihood ratio of the
    target slice (lang='en') vs the raw corpus per document, then
    deterministic top-k selection by the rounded score (exp(score) is
    the weight the weighted resampler would consume)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import importance_scores
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sc = importance_scores(docs, F.col("lang") == "en")
    w = Window.orderBy(F.round(F.col("importance"), 6).desc(),
                       F.col("doc_id").asc())
    return _finish(sc.withColumn("sel_rank", F.row_number().over(w))
                   .where(F.col("sel_rank") <= _DSIR_K))


SQL_D_IMPORTANCE = f"""
WITH w AS (SELECT doc_id, lang = 'en' AS is_target,
                  unnest(string_split(text, ' ')) AS word
           FROM documents),
raw AS (SELECT word, COUNT(*) AS c_r FROM w GROUP BY word),
tgt AS (SELECT word, COUNT(*) AS c_t FROM w WHERE is_target
        GROUP BY word),
lm AS (SELECT raw.word, raw.c_r, COALESCE(tgt.c_t, 0) AS c_t
       FROM raw LEFT JOIN tgt USING (word)),
tot AS (SELECT SUM(c_r) AS t_r, SUM(c_t) AS t_t, COUNT(*) AS v FROM lm),
ratio AS (SELECT word,
                 ln((c_t + 1.0) / (t_t + v)) - ln((c_r + 1.0) / (t_r + v))
                   AS lr
          FROM lm CROSS JOIN tot),
sc AS (SELECT w.doc_id, COUNT(*) AS n_tokens_i, AVG(ratio.lr)
         AS importance
       FROM w JOIN ratio USING (word) GROUP BY w.doc_id),
r AS (SELECT doc_id, n_tokens_i, importance,
             CAST(ROW_NUMBER() OVER (ORDER BY ROUND(importance, 6) DESC,
                                     doc_id) AS INT) AS sel_rank
      FROM sc)
SELECT doc_id, n_tokens_i, ROUND(importance, {ND}) AS importance,
       sel_rank
FROM r WHERE sel_rank <= {_DSIR_K}
"""


def q_d_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus topic-clustering profile: every document's embedding is
    assigned to its nearest deterministic centroid (the same md5-seeded
    spherical assignment the IVF index uses, nprobe=1 = cluster
    membership), then each cluster is profiled against the text surface:
    size, token volume, mean quality, dominant predicted language
    (count-desc, lang-asc tie-break). The 'what is in my corpus'
    unsupervised report, as one plan: O(k) centroid broadcast, one
    assignment pass, two map-side-combined aggregates."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators import similarity
    from nexus_spark.operators.text import text_stats
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    flat = similarity._flat_cached(emb, "vec_id", "embedding",
                                   similarity.DIM, "c")
    cells = similarity.ivf_cells_cached(flat, similarity.DIM, 32, 1)
    stats = text_stats(docs)
    j = cells.join(stats, cells.id == stats.doc_id)
    prof = (j.groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens_total"),
                 F.avg("quality").alias("avg_quality")))
    lc = (j.groupBy("cent_id", "lang_pred")
          .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("cent_id").orderBy(F.col("c").desc(),
                                              F.col("lang_pred").asc())
    dom = (lc.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("cent_id", F.col("lang_pred").alias("dominant_lang")))
    return _finish(prof.join(dom, "cent_id"))


def _sql_topic_clusters() -> str:
    return f"""
WITH {_VECS},
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
cells AS (
  SELECT vec_id AS id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 1),
stats AS ({_sql_text_stats()}),
j AS (SELECT cells.cent_id, s.* FROM cells
      JOIN stats s ON cells.id = s.doc_id),
prof AS (SELECT cent_id, COUNT(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_total,
                ROUND(AVG(quality), {ND}) AS avg_quality
         FROM j GROUP BY cent_id),
lc AS (SELECT cent_id, lang_pred, COUNT(*) AS c
       FROM j GROUP BY cent_id, lang_pred),
dom AS (SELECT cent_id, lang_pred AS dominant_lang FROM lc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY cent_id
                 ORDER BY c DESC, lang_pred) = 1)
SELECT prof.cent_id, prof.n_docs, prof.n_tokens_total, prof.avg_quality,
       dom.dominant_lang
FROM prof JOIN dom USING (cent_id)
"""


_KM_K = 16


def q_d_kmeans_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One spherical k-means (Lloyd) round, driver-checked end to end —
    iterative ML with the same semantics both engines compute:
    md5-seeded init → max-cosine assignment (rounded tie-breaks) →
    per-component member means (ROUNDED to 6dp on both sides, so the
    refined centroid is the identical double everywhere) → per-cluster
    profile against the refined centroid (member count, refined norm,
    mean member cosine). The in-library kmeans_refine runs the same
    round unrounded for more iterations; this query pins one round to
    the oracle.

    Round-9 shape: ONE Arrow-batched mapInPandas pass emitting per-cell
    sufficient statistics — count, per-dim sums, and per-dim NORMALIZED
    sums (sum of v/|v|) — k*(2*dim+1) scalars per Arrow batch; the
    driver finishes the k-row profile exactly:
    avg_cosine = dot(sum(v/|v|), m) / (n * |m|), which equals
    AVG(dot(v, m) / (|v| |m|)) by linearity. The former relational plan
    (crossJoin assign + a 64-avg decimal aggregate + a re-join scoring
    pass) was the measured wide-plan/Py4J floor mechanism — same fix as
    d_embed_outliers and the streaming PQ encode (PLANS.md r9)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from nexus_spark.catalog import load_table
    from nexus_spark.operators import similarity as S

    dim = S.DIM
    emb = load_table(spark, sf_dir, "embeddings")
    flat = S._flat_cached(emb, "vec_id", "embedding", dim, "c")
    cent_rows = S._select_centroids(flat, _KM_K, dim).collect()
    cent_ids = np.array([r["cent_id"] for r in cent_rows],
                        dtype=np.int64)
    cent_nrm = np.array([r["cent_nrm"] for r in cent_rows])
    C = np.array([[r[f"t{i}"] for i in range(dim)] for r in cent_rows])
    imax = np.iinfo(np.int64).max

    def partials(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["vec"]])
            nrm2 = np.zeros(n)
            dots = np.zeros((n, len(cent_ids)))
            for i in range(dim):
                nrm2 += X[:, i] * X[:, i]
                dots += X[:, i, None] * C[None, :, i]
            nrm = np.sqrt(nrm2)
            cos = dots / (nrm[:, None] * cent_nrm[None, :])
            # ROUND(cc, 6) DESC, cent_id ASC — the shared tie contract;
            # half-away-from-zero matches F.round away from the exact
            # .5 boundary (measure-zero for quotient doubles)
            r = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
            best = r.max(axis=1)
            cell = np.where(r == best[:, None], cent_ids[None, :],
                            imax).min(axis=1)
            Xn = X / nrm[:, None]
            rows = []
            for cid in np.unique(cell):
                m = cell == cid
                rows.append({"cent_id": int(cid),
                             "n": float(m.sum()),
                             **{f"s{i}": X[m, i].sum()
                                for i in range(dim)},
                             **{f"u{i}": Xn[m, i].sum()
                                for i in range(dim)}})
            yield pd.DataFrame(rows)

    pschema = ("cent_id long, n double, "
               + ", ".join(f"s{i} double" for i in range(dim)) + ", "
               + ", ".join(f"u{i} double" for i in range(dim)))
    parts = flat.select("vec").mapInPandas(partials, pschema).collect()

    q7, q6 = Decimal("1e-7"), Decimal("1e-6")

    def r6d(x):  # round(cast(x AS DECIMAL(38,7)), 6) — two-step HALF_UP
        return float(Decimal(repr(x)).quantize(q7, rounding=ROUND_HALF_UP)
                     .quantize(q6, rounding=ROUND_HALF_UP))

    out = []
    for cid in sorted({r["cent_id"] for r in parts}):
        grp = [r for r in parts if r["cent_id"] == cid]
        n = sum(r["n"] for r in grp)
        m = np.array([r6d(sum(r[f"s{i}"] for r in grp) / n)
                      for i in range(dim)])
        u = np.array([sum(r[f"u{i}"] for r in grp) for i in range(dim)])
        mnrm = 0.0
        for i in range(dim):  # left-to-right like the sqrt(m0*m0 + ...)
            mnrm += m[i] * m[i]
        mnrm = float(np.sqrt(mnrm))
        dot_um = 0.0
        for i in range(dim):
            dot_um += u[i] * m[i]
        out.append((int(cid), int(n), float(mnrm),
                    float(dot_um / (n * mnrm))))
    prof = spark.createDataFrame(
        out, "cent_id long, n_members long, refined_nrm double, "
             "avg_cosine double")
    return _finish(prof)


def _sql_kmeans_round() -> str:
    return f"""
WITH {_VECS},
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {_KM_K}),
asg AS (
  SELECT vec_id AS id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 1),
mem AS (SELECT asg.cent_id, n.vec, n.nrm FROM asg
        JOIN n ON n.vec_id = asg.id),
mx AS (SELECT cent_id, pos, ROUND(AVG(val), 6) AS m
       FROM (SELECT cent_id, unnest(vec) AS val,
                    generate_subscripts(vec, 1) AS pos FROM mem)
       GROUP BY cent_id, pos),
ml AS (SELECT cent_id, list(m ORDER BY pos) AS mvec FROM mx
       GROUP BY cent_id),
mn AS (SELECT cent_id, mvec,
              sqrt(list_sum(list_transform(mvec, x -> x * x))) AS mnrm
       FROM ml),
p AS (SELECT mem.cent_id, mn.mnrm,
             list_dot_product(mem.vec, mn.mvec) / (mem.nrm * mn.mnrm)
               AS cs
      FROM mem JOIN mn USING (cent_id))
SELECT cent_id, COUNT(*) AS n_members,
       ROUND(MAX(mnrm), {ND}) AS refined_nrm,
       ROUND(AVG(cs), {ND}) AS avg_cosine
FROM p GROUP BY cent_id
"""


def q_d_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup with the md5 60-bit word hash — the fully
    oracle-checkable variant (mirror of d_dedup_minhash_md5): every bit of
    the fingerprint is reproducible from the md5 hex string in both
    engines, so banding, candidates and hamming verify hash-compare."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(simhash_pairs(docs, hash_fn="md5", bits=60))


# DuckDB reconstructs the same 60-bit hash bit-by-bit from the md5 hex:
# bit j of conv(substr(md5,1,15),16,10) = bit (j%4) of hex digit at string
# position 15 - j//4 (1-indexed, c1 most significant).
SQL_D_SIMHASH_MD5 = """
WITH w AS (
  SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word
  FROM documents),
wb AS (
  SELECT id, bit,
         CASE WHEN ((strpos('0123456789abcdef',
                  substring(md5(word), 15 - CAST(FLOOR(bit / 4) AS INT), 1))
                 - 1) >> (bit % 4)) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM w, (SELECT unnest(generate_series(0, 59)) AS bit) bits),
v AS (SELECT id, bit, SUM(vote) AS v FROM wb GROUP BY id, bit),
fp AS (SELECT id, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                           ELSE 0 END) AS simhash
       FROM v GROUP BY id),
segs AS (SELECT id, simhash, band,
                (simhash >> (band * 15)) & 32767 AS segment
         FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) bands),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM segs a JOIN segs b ON a.band = b.band AND a.segment = b.segment
  WHERE a.id < b.id)
SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3
"""


def _sql_lang_score(lang_markers) -> str:
    return ("list_sum(list_transform(words, w -> CASE WHEN w IN ({m}) "
            "THEN 1 ELSE 0 END))").format(
        m=", ".join(f"'{w}'" for w in lang_markers))


def _sql_text_stats(source: str = "documents") -> str:
    from nexus_spark.operators.text import LANG_MARKERS, STOPWORDS

    scores = {lang: _sql_lang_score(m) for lang, m in LANG_MARKERS.items()}
    langs = sorted(LANG_MARKERS)
    # alphabetically-first language wins ties (matches the Spark struct-max)
    cases = []
    for i, lang in enumerate(langs):
        others = [scores[o] for o in langs[i + 1:]]
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in langs[i + 1:])
        cases.append(f"WHEN {cond} THEN '{lang}'" if cond else f"ELSE '{lang}'")
    lang_case = "CASE " + " ".join(cases) + " END"
    stop_in = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS words FROM {source}),
scored AS (
  SELECT doc_id, text, words,
         {", ".join(f"{s} AS s_{lang}" for lang, s in scores.items())},
         CAST(len(words) AS INT) AS n_tokens,
         CAST(length(text) AS INT) AS n_chars_m,
         CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
              AS DOUBLE) / length(text) AS punct_ratio,
         CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
           / len(words) AS mean_word_len,
         CAST(list_sum(list_transform(words, w -> CASE WHEN w IN ({stop_in})
              THEN 1 ELSE 0 END)) AS DOUBLE) / len(words) AS stopword_ratio
  FROM d)
SELECT doc_id, n_tokens, n_chars_m,
       ROUND(punct_ratio, {ND}) AS punct_ratio,
       ROUND(mean_word_len, {ND}) AS mean_word_len,
       ROUND(stopword_ratio, {ND}) AS stopword_ratio,
       ROUND((CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END
              + CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END
              + CASE WHEN mean_word_len BETWEEN 2.0 AND 12.0
                     THEN 1.0 ELSE 0.0 END) / 3.0, {ND}) AS quality,
       {lang_case} AS lang_pred,
       md5(lower(regexp_replace(trim(text), ' +', ' ', 'g'))) AS fingerprint
FROM scored
"""


# --------------------------------------------------------------------------
# LLM-pipeline: multimodal binary columns (documents as payload fixture)
# --------------------------------------------------------------------------

_MEDIA_TYPE_SQL = ("CASE WHEN doc_id % 3 = 0 THEN 'image' "
                   "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END")


def q_m_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (media_from_documents,
                                                  media_metadata)

    docs = load_table(spark, sf_dir, "documents")
    return _finish(media_metadata(media_from_documents(docs)))


SQL_M_META = f"""
SELECT doc_id AS media_id,
       {_MEDIA_TYPE_SQL} AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
       sha256(text) AS digest,
       CAST(CEIL(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
FROM documents
"""


def q_m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (frame_sample,
                                                  media_from_documents)

    docs = load_table(spark, sf_dir, "documents")
    return _finish(frame_sample(media_from_documents(docs), every_ms=100))


SQL_M_FRAMES = f"""
SELECT doc_id AS media_id,
       {_MEDIA_TYPE_SQL} AS media_type,
       unnest(generate_series(0, octet_length(encode(text)) - 1, 100))
         AS frame_ms
FROM documents
"""


def q_m_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode pipeline, fully oracle-checked: synthetic_media encodes
    genuine PNG (from-scratch encoder) / WAV / raw-byte payloads whose
    pixel/sample values are closed-form in doc_id; extract_features
    decodes them back (from-scratch PNG decoder, stdlib wave) and the
    oracle recomputes the feature stats from the closed forms — a decode
    bug anywhere in the encode->decode->feature chain diverges from the
    SQL. payload_len stays out of the surface (zlib-compressed size is
    not SQL-expressible); it is covered by q_m_metadata."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (extract_features,
                                                  synthetic_media)

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthetic_media(docs))
    return _finish(feats.select("media_id", "media_type", "feat_mean",
                                "feat_std", "feat_dim"))


SQL_M_FEATURES = f"""
WITH m AS (SELECT doc_id AS media_id, doc_id % 3 AS m3, doc_id AS d
           FROM documents),
v AS (
  SELECT media_id,
         CASE m3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                 ELSE 'video' END AS media_type,
         CASE m3
           WHEN 0 THEN [CAST((d + 13*i) % 256 AS DOUBLE)/255.0
                        FOR i IN generate_series(
                          0, (4+(d//3)%5)*(4+(d//3)%4)*3 - 1)]
           WHEN 1 THEN [CAST((31*d + 17*i) % 2001 - 1000 AS DOUBLE)/32768.0
                        FOR i IN generate_series(0, 64 + d%32 - 1)]
           ELSE [CAST((3*d + 7*i) % 256 AS DOUBLE)/255.0
                 FOR i IN generate_series(0, 128 + d%64 - 1)]
         END AS vals
  FROM m)
SELECT media_id, media_type,
       ROUND(list_avg(vals), {ND}) AS feat_mean,
       ROUND(list_aggregate(vals, 'stddev_pop'), {ND}) AS feat_std,
       CAST(len(vals) AS INT) AS feat_dim
FROM v
"""


# --------------------------------------------------------------------------
# Corpus scrubbing: PII, repetition, exact-substring span dedup
# --------------------------------------------------------------------------

# The documents fixture contains no PII, so the PII query PLANTS a
# deterministic synthetic tail per doc (same expression in both engines):
# an email, an IPv4, and a phone number derived from doc_id — then
# detection/redaction runs over real text + planted PII and the oracle
# checks counts AND the md5 of the redacted text.
def _pii_augmented(docs: DataFrame) -> DataFrame:
    return docs.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit(" user"), F.col("doc_id"),
                 F.lit("@mail.example.com from 10."),
                 (F.col("doc_id") % 256), F.lit(".0.1 call +1415"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))


_SQL_PII_TEXT = ("text || ' user' || CAST(doc_id AS VARCHAR)"
                 " || '@mail.example.com from 10.'"
                 " || CAST(doc_id % 256 AS VARCHAR) || '.0.1 call +1415'"
                 " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WARC corpus ingest: the documents table is rendered as
    crawler-layout WARC archives (one gzip-member-per-record .warc.gz
    PER PARTITION, written by the executors — no driver I/O), read back
    through sources/warc.py's from-scratch parser, and reduced to the
    corpus-pipeline document surface. The oracle recomputes the expected
    (url, text, n_tokens) directly from the source table, so any parse/
    extraction defect anywhere in the encode->parse->extract chain
    mismatches."""
    import os
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.sources.warc import (_make_warc_codec, read_warc,
                                          warc_to_documents)

    docs = load_table(spark, sf_dir, "documents")
    out_dir = tempfile.mkdtemp(prefix="warc_fixture_")
    # nested-function codec -> pickled BY VALUE into the task closure;
    # executors need no nexus_spark on their sys.path
    _, encode_warc = _make_warc_codec()

    def write_part(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"n": []})
                continue
            recs = []
            for d, t in zip(pdf["doc_id"], pdf["text"]):
                body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html"
                        "\r\n\r\n<html><body><p>" + t
                        + "</p></body></html>").encode()
                recs.append({"warc_type": "response",
                             "record_id": f"<urn:uuid:{int(d)}>",
                             "target_uri":
                             f"https://corpus.example/{int(d)}",
                             "date": "2026-01-01T00:00:00Z",
                             "content_type":
                             "application/http; msgtype=response",
                             "payload": body})
            part = int(pdf["doc_id"].iloc[0]) % 1_000_000
            path = os.path.join(out_dir, f"crawl-{part}.warc.gz")
            with open(path, "wb") as fh:
                fh.write(encode_warc(recs, gzip_per_record=True))
            yield pd.DataFrame({"n": [len(recs)]})

    # Executor-side write (repartition bounds archive count), one action.
    (docs.select("doc_id", "text").repartition(8, "doc_id")
     .mapInPandas(write_part, "n long").count())

    extracted = warc_to_documents(read_warc(spark, out_dir))
    return _finish(extracted.select(
        "url", "text",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens")))


SQL_WARC_INGEST = """
SELECT 'https://corpus.example/' || CAST(doc_id AS VARCHAR) AS url,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text,
       CAST(len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                             ' ')) AS INT) AS n_tokens
FROM documents
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token budgeting: whitespace count vs GPT-2-style pre-tokenizer
    count (the BPE lower bound). Same regex string runs in both engines
    (RE2-compatible subset, parity asserted across unicode/contraction/
    digit cases in tests)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import bpe_token_count, token_count

    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return _finish(docs.select(
        "doc_id",
        token_count(t).alias("n_ws_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens")))


def _sql_bpe_tokens() -> str:
    from nexus_spark.operators.text import BPE_TOKEN_PATTERN

    pat = BPE_TOKEN_PATTERN.replace("'", "''")  # SQL string-literal quote
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{pat}')) AS INT)
         AS n_bpe_tokens
FROM documents
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over documents with planted PII (see
    _pii_augmented). Patterns are the RE2-compatible shared contract in
    operators/scrub.py — Spark and DuckDB run the SAME regexes and must
    agree on both match counts and the redacted-text fingerprint."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import pii_stats

    docs = _pii_augmented(load_table(spark, sf_dir, "documents"))
    return _finish(pii_stats(docs))


def _sql_scrub_pii() -> str:
    from nexus_spark.operators.scrub import PII_PATTERNS

    em, ip, ph = (PII_PATTERNS[k][0] for k in ("email", "ipv4", "phone"))
    red = "t"
    for pat, tok in PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return f"""
WITH d AS (SELECT doc_id, {_SQL_PII_TEXT} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{em}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{ip}')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '{ph}')) AS INT) AS n_phones,
       md5({red}) AS redacted_fp
FROM d
"""


def q_scrub_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc n-gram repetition ratio (quality signal for boilerplate
    / degenerate text); shingle formula shared with the dedup family."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import repetition_stats

    return _finish(repetition_stats(load_table(spark, sf_dir,
                                               "documents")))


SQL_SCRUB_REPETITION = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END AS grams
  FROM d)
SELECT doc_id,
       CAST(len(grams) AS INT) AS n_grams,
       CAST(len(list_distinct(grams)) AS INT) AS n_distinct,
       ROUND(1.0 - len(list_distinct(grams))
             / CAST(len(grams) AS DOUBLE), {ND}) AS rep_ratio
FROM g
"""


_SPAN_W = 8  # span-dedup window length (tokens); docs are 10-99 tokens


def q_scrub_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring span marks (relational Lee-et-al-
    style span dedup): maximal token spans whose 8-gram windows occur in
    >= 2 distinct documents. Runs the xxhash64 window-hash fast path
    (one JVM hash over the token-slice array, no concat/digest — the
    r6 verdict's md5-bound tokenize fix); the hash is equality-only
    plumbing, so the md5-based oracle still matches exactly, and
    scrub_span_dedup_md5_parity pins the md5 family green as well."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import span_dedup_marks

    marks = span_dedup_marks(load_table(spark, sf_dir, "documents"),
                             window=_SPAN_W)
    return _finish(marks.withColumnRenamed("id", "doc_id"))


def q_scrub_span_md5_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-parity sibling of scrub_span_dedup (the d_dedup_lsh_xx_parity
    pattern): the identical span-mark plan with the engine-portable md5
    window digest, checked against the same DuckDB oracle — any
    divergence between the xxhash64 fast path and the md5 family's
    window-equality classes surfaces as a hash mismatch on one of the
    two rows."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import span_dedup_marks

    marks = span_dedup_marks(load_table(spark, sf_dir, "documents"),
                             window=_SPAN_W, hash_fn="md5")
    return _finish(marks.withColumnRenamed("id", "doc_id"))


_SQL_SPAN_CTES = f"""
d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(words[i:i+{_SPAN_W - 1}], ' ')) AS h
  FROM d, LATERAL unnest(generate_series(1, len(words) - {_SPAN_W} + 1))
       AS t(i)
  WHERE len(words) >= {_SPAN_W}),
shared AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
marked AS (SELECT doc_id, pos FROM wins JOIN shared USING (h)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_SPAN_W} - 1) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM marked),
grp AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl)"""

SQL_SCRUB_SPAN = f"""
WITH {_SQL_SPAN_CTES}
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {_SPAN_W} - 1 AS span_end,
       COUNT(*) AS n_windows
FROM grp GROUP BY doc_id, island
"""


def q_scrub_cross_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level train-vs-benchmark decontamination: maximal TRAIN-doc
    spans whose window-grams appear anywhere in the benchmark slice
    (doc_id % 10 == 0) — cut-the-passage decontamination instead of
    drop-the-document."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import cross_contamination_spans

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    out = cross_contamination_spans(train, bench, window=_SPAN_W)
    return _finish(out.select(F.col("id").alias("doc_id"), "span_start",
                              "span_end", "n_windows"))


SQL_SCRUB_CROSS_CONTAM = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(words[i:i+{_SPAN_W - 1}], ' ')) AS h
  FROM d, LATERAL unnest(generate_series(1, len(words) - {_SPAN_W} + 1))
       AS t(i)
  WHERE len(words) >= {_SPAN_W}),
bh AS (SELECT DISTINCT h FROM wins WHERE doc_id % 10 = 0),
marked AS (SELECT doc_id, pos FROM wins
           WHERE doc_id % 10 <> 0 AND h IN (SELECT h FROM bh)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_SPAN_W} - 1) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM marked),
grp AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {_SPAN_W} - 1 AS span_end,
       COUNT(*) AS n_windows
FROM grp GROUP BY doc_id, island
"""


def q_scrub_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decontamination: mark every train-doc span leaked from
    the benchmark slice, CUT those spans and reassemble the text —
    the full cut-the-passage decontamination pipeline (marks + apply) as
    one plan over the train corpus."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import (apply_span_dedup,
                                             cross_contamination_spans)

    docs = load_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    marks = cross_contamination_spans(train, bench, window=_SPAN_W)
    return _finish(apply_span_dedup(train, marks))


SQL_SCRUB_DECONTAMINATE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE doc_id % 10 <> 0),
db AS (SELECT doc_id, string_split(text, ' ') AS words
       FROM documents WHERE doc_id % 10 = 0),
wt AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(words[i:i+{_SPAN_W - 1}], ' ')) AS h
  FROM d, LATERAL unnest(generate_series(1, len(words) - {_SPAN_W} + 1))
       AS t(i)
  WHERE len(words) >= {_SPAN_W}),
wb AS (
  SELECT md5(array_to_string(words[i:i+{_SPAN_W - 1}], ' ')) AS h
  FROM db, LATERAL unnest(generate_series(1, len(words) - {_SPAN_W} + 1))
       AS t(i)
  WHERE len(words) >= {_SPAN_W}),
bh AS (SELECT DISTINCT h FROM wb),
marked AS (SELECT doc_id, pos FROM wt WHERE h IN (SELECT h FROM bh)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {_SPAN_W} - 1) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_island
  FROM marked),
grp AS (
  SELECT doc_id, pos,
         SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_W} - 1 AS e
  FROM grp GROUP BY doc_id, island),
toks AS (
  SELECT doc_id, i - 1 AS pos, words[i] AS word
  FROM d, LATERAL unnest(generate_series(1, len(words))) AS t(i)),
cov AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM toks t JOIN spans s
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.s AND s.e),
kept AS (SELECT * FROM toks ANTI JOIN cov USING (doc_id, pos)),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
         COUNT(*) AS n_tokens_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, len(string_split(text, ' ')) AS n_total
        FROM documents WHERE doc_id % 10 <> 0)
SELECT tot.doc_id,
       COALESCE(agg.text, '') AS text,
       COALESCE(agg.n_tokens_kept, 0) AS n_tokens_kept,
       tot.n_total - COALESCE(agg.n_tokens_kept, 0) AS n_tokens_cut
FROM tot LEFT JOIN agg USING (doc_id)
"""


def q_scrub_span_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the span-dedup decisions: cut every marked span, return
    the scrubbed text + kept/cut token counts per document."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.scrub import (apply_span_dedup,
                                             span_dedup_marks)

    docs = load_table(spark, sf_dir, "documents")
    marks = span_dedup_marks(docs, window=_SPAN_W)
    return _finish(apply_span_dedup(docs, marks))


SQL_SCRUB_SPAN_APPLY = f"""
WITH {_SQL_SPAN_CTES},
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_SPAN_W} - 1 AS e
  FROM grp GROUP BY doc_id, island),
toks AS (
  SELECT doc_id, i - 1 AS pos, words[i] AS word
  FROM d, LATERAL unnest(generate_series(1, len(words))) AS t(i)),
cov AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM toks t JOIN spans s
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.s AND s.e),
kept AS (SELECT * FROM toks ANTI JOIN cov USING (doc_id, pos)),
agg AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text,
         COUNT(*) AS n_tokens_kept
  FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, len(string_split(text, ' ')) AS n_total
        FROM documents)
SELECT tot.doc_id,
       COALESCE(agg.text, '') AS text,
       COALESCE(agg.n_tokens_kept, 0) AS n_tokens_kept,
       tot.n_total - COALESCE(agg.n_tokens_kept, 0) AS n_tokens_cut
FROM tot LEFT JOIN agg USING (doc_id)
"""


def q_m_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> nearest-neighbor resize (8x8) -> re-encode -> decode ->
    features, end-to-end through the real PNG codecs. The integer floor
    resample contract keeps the closed-form source image closed-form, so
    the oracle recomputes the resized pixel stats exactly — a defect in
    EITHER codec direction or the resampler mismatches."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (extract_features,
                                                  resize_images,
                                                  synthetic_media)

    docs = load_table(spark, sf_dir, "documents")
    media = synthetic_media(docs).where(F.col("media_type") == "image")
    feats = extract_features(resize_images(media, 8, 8))
    return _finish(feats.select("media_id", "media_type", "feat_mean",
                                "feat_std", "feat_dim"))


SQL_M_RESIZE = f"""
WITH m AS (SELECT doc_id AS media_id, doc_id AS d FROM documents
           WHERE doc_id % 3 = 0),
v AS (
  SELECT media_id,
         [CAST((d + 13*(
             (((i//24) * (4+(d//3)%4)) // 8 * (4+(d//3)%5)
              + (((i%24)//3) * (4+(d//3)%5)) // 8) * 3 + i%3)) % 256
           AS DOUBLE)/255.0
          FOR i IN generate_series(0, 191)] AS vals
  FROM m)
SELECT media_id, 'image' AS media_type,
       ROUND(list_avg(vals), {ND}) AS feat_mean,
       ROUND(list_aggregate(vals, 'stddev_pop'), {ND}) AS feat_std,
       CAST(len(vals) AS INT) AS feat_dim
FROM v
"""


def q_m_resample_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV decode -> nearest-index resample to 48 samples -> re-encode ->
    decode -> features; the integer-floor pick preserves the closed-form
    sample values exactly (int16 round trip is lossless), so the oracle
    recomputes the resampled stats in SQL."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.multimodal import (extract_features,
                                                  resample_audio,
                                                  synthetic_media)

    docs = load_table(spark, sf_dir, "documents")
    media = synthetic_media(docs).where(F.col("media_type") == "audio")
    feats = extract_features(resample_audio(media, 48))
    return _finish(feats.select("media_id", "media_type", "feat_mean",
                                "feat_std", "feat_dim"))


SQL_M_RESAMPLE = f"""
WITH m AS (SELECT doc_id AS media_id, doc_id AS d FROM documents
           WHERE doc_id % 3 = 1),
v AS (
  SELECT media_id,
         [CAST((31*d + 17*((i*(64+d%32))//48)) % 2001 - 1000 AS DOUBLE)
            / 32768.0
          FOR i IN generate_series(0, 47)] AS vals
  FROM m)
SELECT media_id, 'audio' AS media_type,
       ROUND(list_avg(vals), {ND}) AS feat_mean,
       ROUND(list_aggregate(vals, 'stddev_pop'), {ND}) AS feat_std,
       CAST(len(vals) AS INT) AS feat_dim
FROM v
"""


# --------------------------------------------------------------------------
# Generic SQL surface (star schema) — joins/windows/rollup/set-ops
# --------------------------------------------------------------------------

ND_MONEY = 4  # large-magnitude money sums: 1e9-scale, keep rounding robust


def q_sql_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import pricing_summary

    return _finish(pricing_summary(load_table(spark, sf_dir, "lineitem")),
                   nd=ND_MONEY)


SQL_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), {ND_MONEY}) AS sum_qty,
       ROUND(SUM(l_extendedprice), {ND_MONEY}) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {ND_MONEY}) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
             {ND_MONEY}) AS sum_charge,
       ROUND(AVG(l_quantity), {ND_MONEY}) AS avg_qty,
       ROUND(AVG(l_extendedprice), {ND_MONEY}) AS avg_price,
       ROUND(AVG(l_discount), {ND_MONEY}) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_sql_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import shipping_priority

    out = shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"))
    # o_orderdate is midnight-only → date-only render (see q_a7).
    out = out.withColumn("o_orderdate", F.col("o_orderdate").cast("date"))
    return _finish(out, nd=ND_MONEY)


SQL_Q3 = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {ND_MONEY}) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1996-03-15' AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) DESC, l_orderkey
LIMIT 10
"""


def q_sql_regional(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import regional_revenue

    t = {n: load_table(spark, sf_dir, n)
         for n in ("region", "nation", "customer", "orders", "lineitem",
                   "supplier")}
    return _finish(regional_revenue(
        t["region"], t["nation"], t["customer"], t["orders"], t["lineitem"],
        t["supplier"]), nd=ND_MONEY)


SQL_Q5 = f"""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), {ND_MONEY}) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


def q_sql_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import topk_per_group

    return _finish(topk_per_group(load_table(spark, sf_dir, "part")))


SQL_TOPK = f"""
SELECT p_brand, p_partkey, ROUND(p_retailprice, {ND}) AS p_retailprice,
       price_rank
FROM (SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey) AS INT)
               AS price_rank
      FROM part) t
WHERE price_rank <= 3
"""


def q_sql_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import orders_rollup

    return _finish(orders_rollup(load_table(spark, sf_dir, "orders")),
                   nd=ND_MONEY)


SQL_ROLLUP = f"""
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year, o_orderpriority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), {ND_MONEY}) AS total_price
FROM orders
GROUP BY ROLLUP(CAST(YEAR(o_orderdate) AS INT), o_orderpriority)
"""


def q_sql_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import customer_set_ops

    return _finish(customer_set_ops(load_table(spark, sf_dir, "customer"),
                                    load_table(spark, sf_dir, "orders")))


SQL_SETOPS = """
WITH wo AS (
  SELECT c_custkey FROM customer
  INTERSECT SELECT o_custkey FROM orders),
hb AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
al AS (SELECT DISTINCT c_custkey FROM
       (SELECT c_custkey FROM wo EXCEPT ALL SELECT c_custkey FROM hb))
SELECT c_custkey, 'with_orders' AS tag FROM wo
UNION ALL
SELECT c_custkey, 'active_low_balance' AS tag FROM al
"""


def q_sql_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import customers_without_orders

    return _finish(customers_without_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"), min_price=100000.0))


SQL_ANTI = f"""
SELECT c_custkey, c_name, ROUND(c_acctbal, {ND}) AS c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000.0)
"""


def q_sql_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import customer_order_counts

    return _finish(customer_order_counts(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders")), nd=ND_MONEY)


SQL_LEFT_JOIN = f"""
SELECT c_custkey, c_mktsegment,
       COALESCE(n, 0) AS n_orders,
       ROUND(COALESCE(tot, 0.0), {ND_MONEY}) AS total_spend
FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS n, SUM(o_totalprice) AS tot
           FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
"""


def q_sql_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import customers_with_urgent_orders

    return _finish(customers_with_urgent_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders")))


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


def q_sql_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import sessionize

    return _finish(sessionize(load_table(spark, sf_dir, "events")))


SQL_SESSIONS = f"""
WITH b AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) IS NULL
              OR FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
              THEN 1 ELSE 0 END AS is_break
  FROM events),
s AS (
  SELECT *, CAST(SUM(is_break) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS session_seq
  FROM b)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       ROUND(SUM(value), {ND}) AS session_value
FROM s GROUP BY user_id, session_seq
"""


def q_sql_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import hourly_events

    return _finish(hourly_events(load_table(spark, sf_dir, "events")))


SQL_HOURLY = f"""
SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
       event_type, COUNT(*) AS ev_cnt,
       ROUND(AVG(value), {ND}) AS ev_avg,
       ROUND(MIN(value), {ND}) AS ev_min,
       ROUND(MAX(value), {ND}) AS ev_max
FROM events GROUP BY DATE_TRUNC('hour', ts), event_type
"""


# --------------------------------------------------------------------------
# Climatology batch family (SURVEY §2.5) + neighborhood smoothing
# --------------------------------------------------------------------------

def q_clim_nday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.climatology_batch import nday_climatology

    obs = domain.observations(spark, sf_dir)
    return _finish(nday_climatology(obs, "sst_a", n_days=5))


SQL_CLIM_NDAY = _with(OBS) + f"""
SELECT CAST(FLOOR((DAYOFYEAR(time) - 1) / 5) AS INT) AS doy_bin, lat, lon,
       COUNT(value) AS cl_cnt,
       ROUND(AVG(value), {ND}) AS cl_mean,
       ROUND(STDDEV_SAMP(value), {ND}) AS cl_std,
       ROUND(MIN(value), {ND}) AS cl_min,
       ROUND(MAX(value), {ND}) AS cl_max
FROM obs WHERE dataset = 'sst_a'
GROUP BY CAST(FLOOR((DAYOFYEAR(time) - 1) / 5) AS INT), lat, lon
"""


def q_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.climatology_batch import pixel_stats

    obs = domain.observations(spark, sf_dir)
    return _finish(pixel_stats(obs))


SQL_PIXEL_STATS = _with(OBS) + f"""
SELECT dataset, lat, lon,
       COUNT(value) AS px_cnt,
       ROUND(AVG(value), {ND}) AS px_mean,
       ROUND(STDDEV_SAMP(value), {ND}) AS px_std,
       ROUND(MIN(value), {ND}) AS px_min,
       ROUND(MAX(value), {ND}) AS px_max
FROM obs GROUP BY dataset, lat, lon
"""


def q_spatial_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.climatology_batch import spatial_smooth
    from nexus_spark.operators.maps import time_avg_map

    obs = domain.observations(spark, sf_dir)
    grid = time_avg_map(obs, dataset="sst_a").select("lat", "lon", "map_mean")
    return _finish(spatial_smooth(grid, lat_step=5.0, lon_step=30.0,
                                  value_col="map_mean"))


SQL_SMOOTH = _with(OBS) + f"""
, g AS (SELECT lat, lon, AVG(value) AS v FROM obs WHERE dataset = 'sst_a'
        GROUP BY lat, lon)
, contrib AS (
  SELECT ROUND(g.lat + dy * 5.0, 6) AS lat,
         ROUND(g.lon + dx * 30.0, 6) AS lon, g.v
  FROM g, (SELECT unnest([-1, 0, 1]) AS dy) a,
       (SELECT unnest([-1, 0, 1]) AS dx) b)
, cells AS (SELECT DISTINCT ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon FROM g)
SELECT c.lat, c.lon, ROUND(AVG(v), {ND}) AS sm_mean, COUNT(v) AS sm_n
FROM contrib co JOIN cells c ON co.lat = c.lat AND co.lon = c.lon
GROUP BY c.lat, c.lon
"""


def q_gauss_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.operators.climatology_batch import gaussian_interp
    from nexus_spark.operators.maps import time_avg_map

    obs = domain.observations(spark, sf_dir)
    grid = time_avg_map(obs, dataset="sst_a").select("lat", "lon", "map_mean")
    return _finish(gaussian_interp(grid, lat_step=5.0, lon_step=30.0,
                                   value_col="map_mean"))


def _sql_gauss_interp() -> str:
    import math

    parts = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            w = math.exp(-0.6931 * (dy * dy + dx * dx))
            parts.append(
                f"  SELECT ROUND(lat + {dy} * 5.0, 6) AS lat, "
                f"ROUND(lon + {dx} * 30.0, 6) AS lon, "
                f"v * {w!r} AS wv, "
                f"CASE WHEN v IS NOT NULL THEN {w!r} END AS w FROM g")
    scattered = "\n  UNION ALL\n".join(parts)
    return _with(OBS) + f"""
, g AS (SELECT lat, lon, AVG(value) AS v FROM obs WHERE dataset = 'sst_a'
        GROUP BY lat, lon)
, scattered AS (
{scattered}
)
, cells AS (SELECT DISTINCT ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon FROM g)
SELECT c.lat, c.lon,
       ROUND(SUM(wv) / SUM(w), {ND}) AS gi_mean,
       ROUND(SUM(w), {ND}) AS gi_wsum
FROM scattered s JOIN cells c ON s.lat = c.lat AND s.lon = c.lon
GROUP BY c.lat, c.lon
"""


def q_gauss_interp_offgrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-grid gaussian interpolation with time downweighting: source
    observations weighted onto a target set SHIFTED off the native grid
    (+1.7 deg lat, -8.3 deg lon) — the arbitrary-target-grid + time-sigma
    case of reference gaussInterp (climatology/clim/gaussInterp.pyx:60-130)
    that the grid-aligned g_gaussian_interp cannot express."""
    from nexus_spark.operators.climatology_batch import gaussian_interp_to

    obs = domain.observations(spark, sf_dir)
    pts = obs.where(F.col("dataset") == "sst_a")
    targets = (pts.select((F.col("lat") + 1.7).alias("out_lat"),
                          (F.col("lon") - 8.3).alias("out_lon"))
               .distinct())
    return _finish(gaussian_interp_to(
        pts, targets, wlat=10.0, wlon=60.0, slat=2.0, slon=10.0,
        stime_days=365.0, vfactor=-0.6931))


SQL_GAUSS_OFFGRID = _with(OBS) + """
, pts AS (SELECT lat, lon, value, EPOCH(time) AS secs FROM obs
          WHERE dataset = 'sst_a' AND value IS NOT NULL)
, mid AS (SELECT (MIN(secs) + MAX(secs)) / 2.0 AS m FROM pts)
, targets AS (SELECT DISTINCT lat + 1.7 AS out_lat, lon - 8.3 AS out_lon
              FROM obs WHERE dataset = 'sst_a')
, weighted AS (
  SELECT t.out_lat, t.out_lon,
         EXP(-0.6931 * (
             ((p.lat - t.out_lat) / 2.0) * ((p.lat - t.out_lat) / 2.0)
           + ((p.lon - t.out_lon) / 10.0) * ((p.lon - t.out_lon) / 10.0)
           + ((p.secs - mid.m) / 86400.0 / 365.0)
             * ((p.secs - mid.m) / 86400.0 / 365.0))) AS w,
         p.value AS v
  FROM pts p, mid
  JOIN targets t
    ON ABS(p.lat - t.out_lat) <= 5.0 AND ABS(p.lon - t.out_lon) <= 30.0
)
SELECT out_lat, out_lon,
       ROUND(SUM(w * v) / SUM(w), 6) AS gi_mean,
       ROUND(SUM(w), 6) AS gi_wsum,
       COUNT(w) AS gi_n
FROM weighted
GROUP BY out_lat, out_lon
"""


def q_f_hof_deseason(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.functions.filtering import seasonal_cycle_filter
    from nexus_spark.operators.hofmoeller import hofmoeller

    obs = domain.observations(spark, sf_dir)
    hof = hofmoeller(obs, axis="lat", dataset="sst_a").select(
        "hm_date", "lat", "hm_avg")
    return _finish(seasonal_cycle_filter(hof, "hm_avg", "hm_date",
                                         partition_cols=["lat"]))


SQL_HOF_DESEASON = _with(OBS) + f"""
, hof AS (
  SELECT CAST(time AS DATE) AS d, lat, AVG(value) AS hm_avg
  FROM obs WHERE dataset = 'sst_a'
  GROUP BY CAST(time AS DATE), lat)
SELECT strftime(d, '%Y-%m-%d') AS hm_date, lat,
       ROUND(hm_avg, {ND}) AS hm_avg,
       ROUND(hm_avg - AVG(hm_avg) OVER (PARTITION BY MONTH(d), lat), {ND})
         AS deseasoned
FROM hof
"""


# --------------------------------------------------------------------------
# DOMS catalog (D2) + streaming sliding window + quantiles
# --------------------------------------------------------------------------

def q_doms_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.tile_service import doms_dataset_list

    obs = domain.observations(spark, sf_dir)
    # Gridded obs timestamps are midnight-only ms-precision → the operator
    # pre-renders date-only strings (the driver-fragile surface, see q_a7);
    # the insitu events branch keeps HH:mm:ss, which round-trips cleanly.
    ev = load_table(spark, sf_dir, "events")
    return _finish(doms_dataset_list(obs, ev))


SQL_DOMS_LIST = _with(OBS) + """
SELECT dataset, COUNT(value) AS obs_cnt,
       strftime(MIN(time), '%Y-%m-%d') AS min_time,
       strftime(MAX(time), '%Y-%m-%d') AS max_time,
       'gridded' AS kind
FROM obs GROUP BY dataset
UNION ALL
SELECT event_type AS dataset, COUNT(value) AS obs_cnt,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_time,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_time,
       'insitu' AS kind
FROM events GROUP BY event_type
"""


_STREAM_Q_N = [0]


_STREAM_STAGE: dict[tuple, str] = {}


@contextlib.contextmanager
def _stream_job_conf(spark: SparkSession, partitions: str = "8"):
    """Scope `spark.sql.shuffle.partitions` around an executed stream.

    Stateful streaming FIXES its state-store count at stream start (no
    AQE re-plan ever — the checkpoint pins the partitioning), so a
    streaming job sizes shuffle partitions to its state volume
    explicitly: that is the deployment knob every streaming pipeline
    sets per job, unlike batch where AQE coalesces at runtime. At bench
    scale, 32 near-empty state stores per stateful operator are pure
    constant overhead (measured: stream-stream matchup 9.3s -> 5.3s,
    watermark window 2.6s -> 1.3s at 8 partitions, identical results);
    a production feed with large state raises the number back. The
    session value is restored after the drain completes.

    Also spaces out the state-store maintenance cadence: each drained
    availableNow query leaves loaded providers whose 60s-default
    snapshot/cleanup passes contend with LATER queries in a long
    session (observed as a mid-sweep 3x inflation of one stream's
    steady run); hourly maintenance is correct for drain-and-exit jobs
    whose state dirs are temp-scoped anyway."""
    conf = {"spark.sql.shuffle.partitions": partitions,
            "spark.sql.streaming.stateStore.maintenanceInterval": "3600s"}
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)
        # Unload the drained query's state-store providers NOW (round
        # 12): with maintenance pinned hourly they otherwise sit on
        # heap holding the final state version until session end —
        # later queries in a long session run under that dead weight
        # (sf1 matchup: steady 135.5s with orphaned providers vs
        # 52-57s unloaded, ~0.05s to unload; smaller streams leak less
        # but the 11-stream x3-run sweep accumulates all of them, the
        # same class as the roving maintenance-tick contamination this
        # context manager exists to stop). Spark restarts maintenance
        # lazily at the next stream start, so serial drains are
        # unaffected (re-run and cross-stream re-drains verified).
        # PRECONDITION (r12 ADVICE): StateStore.stop() unloads
        # providers GLOBALLY and stops the maintenance pool — safe
        # only because this harness drains streams strictly serially
        # (trigger availableNow + awaitTermination inside the context
        # manager, so no other stream is live here). A future
        # concurrent-stream harness must guard this unload on
        # spark.streams.active being empty or drop it entirely.
        # Best-effort internal API; a miss restores the old
        # session-end reclamation.
        try:
            spark._jvm.org.apache.spark.sql.execution.streaming.state \
                .StateStore.stop()
        except Exception:
            pass


def _staged_feed(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Session-memoized watch directory for the executed-stream queries.

    Staging simulates the ARRIVAL directory a deployment's ingest keeps —
    write-time state under the bench warm-state policy, like the
    observations cache and vector index — so repeated/timed runs of the
    e_stream_* trio pay stream startup + state + drain, not a fresh
    re-copy (and, for matchup, two fresh Spark writes) of the same feed.
    Cleaned up at interpreter exit."""
    import atexit
    import os
    import shutil
    import tempfile

    key = (sf_dir, kind)
    got = _STREAM_STAGE.get(key)
    if got is not None and os.path.isdir(got):
        return got
    base = tempfile.mkdtemp(prefix=f"nexus_stream_{kind}_")
    if kind == "matchup":
        domain.matchup_primary(spark, sf_dir).write.mode(
            "overwrite").parquet(f"{base}/p")
        domain.matchup_secondary(spark, sf_dir).write.mode(
            "overwrite").parquet(f"{base}/s")
    elif kind == "neardup_feed":
        # the INCOMING two-thirds of documents, written as 4 files so a
        # maxFilesPerTrigger=1 drain exercises multi-micro-batch commits
        from nexus_spark.catalog import load_table
        (load_table(spark, sf_dir, "documents")
         .where(F.col("doc_id") % 3 != 0).repartition(4)
         .write.mode("overwrite").parquet(base))
    elif kind == "vec_feed":
        # the full embeddings table as a 4-file arrival directory (same
        # multi-micro-batch drain shape as neardup_feed)
        from nexus_spark.catalog import load_table
        (load_table(spark, sf_dir, "embeddings").repartition(4)
         .write.mode("overwrite").parquet(base))
    elif kind == "error_feed":
        # the error-event slice as a 4-file arrival directory for the
        # streaming as-of enrichment drain
        from nexus_spark.catalog import load_table
        (load_table(spark, sf_dir, "events")
         .where(F.col("event_type") == "error")
         .select("user_id", F.col("event_id").alias("error_id"), "ts")
         .repartition(4).write.mode("overwrite").parquet(base))
    elif kind == "cdc_feed":
        # deterministic CDC change batch over documents (upserts,
        # tombstones, inserts; per-key-unique seqs) as a 4-file arrival
        # directory for the streaming MERGE drain
        from nexus_spark.catalog import load_table
        docs = load_table(spark, sf_dir, "documents")
        cols = docs.columns
        upd = (docs.where(F.col("doc_id") % 5 == 0)
               .withColumn("text", F.upper(F.col("text")))
               .withColumn("seq", F.lit(1)).withColumn("op", F.lit("U")))
        dels = (docs.where(F.col("doc_id") % 7 == 0)
                .withColumn("seq", F.lit(2)).withColumn("op", F.lit("D")))
        ins = (docs.where(F.col("doc_id") % 6 == 0)
               .withColumn("doc_id", F.col("doc_id") + _MERGE_NEW_OFFSET)
               .withColumn("seq", F.lit(1)).withColumn("op", F.lit("U")))
        (upd.select(*cols, "seq", "op")
         .unionByName(dels.select(*cols, "seq", "op"))
         .unionByName(ins.select(*cols, "seq", "op"))
         .repartition(4).write.mode("overwrite").parquet(base))
    else:
        table = {"docs": "documents", "events": "events"}[kind]
        src = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(src):
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    shutil.copy(os.path.join(src, f), base)
        else:
            shutil.copy(src, os.path.join(base, "batch0.parquet"))
    _STREAM_STAGE[key] = base
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    return base


def q_e_stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup executed as a REAL Structured Streaming query (not
    the batch-parity shortcut): the documents parquet is staged into a
    watch directory, read with readStream, content-hashed and
    dropDuplicates'd, and drained to completion with an availableNow
    trigger into a memory sink. The returned frame is the stream's
    output — the distinct content-hash set, which is order-independent
    and therefore oracle-checkable even though micro-batch arrival order
    is not deterministic. Driver-checks the streaming execution path
    itself (source discovery, state store, sink), not just the
    transformation's batch shadow."""
    from nexus_spark.streaming.dedup import with_content_hash

    watch = _staged_feed(spark, sf_dir, "docs")
    schema = spark.read.parquet(watch).schema
    stream = (spark.readStream.schema(schema).parquet(watch))
    _STREAM_Q_N[0] += 1
    name = f"stream_dedup_out_{_STREAM_Q_N[0]}"
    with _stream_job_conf(spark):
        q = (with_content_hash(stream)
             .select("content_hash").dropDuplicates(["content_hash"])
             .writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        # awaitTermination returns False on timeout (it does NOT raise);
        # reading the memory table then would silently return a partial
        # drain — fail loudly instead.
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming dedup drain exceeded 300s")
    return spark.table(name)


SQL_E_STREAM_DEDUP = """
SELECT DISTINCT md5(text) AS content_hash FROM documents
"""


def q_e_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup as a REAL executed stream — the production
    loop the round-5 incremental MinHash store (dedup.write_minhash_index
    / incremental_near_dup) was built for: history docs (doc_id%3==0)
    seed a persistent signature store; the remaining docs arrive as a
    4-file stream drained one file per micro-batch; each micro-batch is
    LSH-banded against the store AND itself, its matches are emitted,
    and its signatures are committed to the store before the next batch.

    Oracle-checkable because the emitted PAIR SET is batching-
    independent: any band-sharing pair with estimated jaccard >= t is
    caught exactly once — within a micro-batch if both docs share one,
    else via the store when the later one arrives. The oracle recomputes
    the full-batch md5-MinHash banding + the matching-components/k
    estimator over every pair with >= 1 incoming endpoint. Store is
    re-seeded per invocation (one tiny history-signature job), so the
    query is replay-idempotent; the feed directory is session-staged
    like the other e_stream_* entries.

    Output: id_a, id_b (unordered pair, a < b), est_jaccard."""
    import atexit
    import os
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (incremental_near_dup,
                                             write_minhash_index)

    feed = _staged_feed(spark, sf_dir, "neardup_feed")
    # The seed store (history's signatures) is write-time ingest state —
    # computed ONCE per session into a staged directory, then restored
    # into each run's store by file copy so the stream's own commits
    # never leak between invocations (replay-idempotence with a flat,
    # non-growing store).
    seed_key = (sf_dir, "neardup_seed")
    seed = _STREAM_STAGE.get(seed_key)
    if seed is None or not os.path.isdir(seed):
        seed = tempfile.mkdtemp(prefix="nexus_neardup_seed_")
        history = (load_table(spark, sf_dir, "documents")
                   .where(F.col("doc_id") % 3 == 0))
        write_minhash_index(history, seed, k=_MH_K, hash_fn="md5",
                            mode="overwrite")
        _STREAM_STAGE[seed_key] = seed
        atexit.register(shutil.rmtree, seed, ignore_errors=True)
    work = tempfile.mkdtemp(prefix="nexus_neardup_run_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    store, out_dir, ckpt = (f"{work}/store", f"{work}/out", f"{work}/ckpt")
    os.makedirs(store)
    for f in os.listdir(seed):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(seed, f), store)

    kw = dict(k=_MH_K, bands=_MH_BANDS, threshold=0.5, hash_fn="md5")

    def step(batch_df, _batch_id):
        # one signature job per micro-batch: localCheckpoint feeds the
        # banding, both estimator joins AND the store commit (else the
        # k-seeded md5 aggregation re-executes ~5x per batch)
        from nexus_spark.operators.dedup import minhash_signatures
        sigs = minhash_signatures(batch_df, k=_MH_K,
                                  hash_fn="md5").localCheckpoint()
        (incremental_near_dup(batch_df, spark, store, signatures=sigs,
                              **kw)
         .select(F.least("id_new", "id_matched").alias("id_a"),
                 F.greatest("id_new", "id_matched").alias("id_b"),
                 "est_jaccard")
         .write.mode("append").parquet(out_dir))
        sigs.write.mode("append").parquet(store)

    schema = spark.read.parquet(feed).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("pathGlobFilter", "*.parquet").parquet(feed))
    with _stream_job_conf(spark):
        q = (stream.writeStream.foreachBatch(step)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming near-dup drain exceeded 300s")
    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [], "id_a long, id_b long, est_jaccard double")
    # a within-batch pair can ALSO resurface as a store pair on replay
    # runs; the canonical unordered-pair surface is distinct by design
    return _finish(spark.read.parquet(out_dir).distinct())


def _sql_stream_near_dup() -> str:
    est = " + ".join(
        f"(CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END)"
        for i in range(_MH_K))
    # reuse the md5-MinHash signature + banding CTEs, swap the verify
    # stage for the signature-component estimator and keep only pairs
    # with >= 1 incoming (streamed, doc_id%3<>0) endpoint
    head = _sql_minhash_md5().split("ver AS (")[0].rstrip().rstrip(",")
    return f"""{head},
est AS (
  SELECT id_a, id_b,
         CAST({est} AS DOUBLE) / {_MH_K} AS est_jaccard
  FROM cand JOIN sig x ON x.doc_id = id_a JOIN sig y ON y.doc_id = id_b
  WHERE id_a % 3 <> 0 OR id_b % 3 <> 0)
SELECT id_a, id_b, ROUND(est_jaccard, {ND}) AS est_jaccard
FROM est WHERE est_jaccard >= 0.5
"""


def q_e_stream_pq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ index MAINTENANCE as a REAL executed stream — the loop a
    production vector lake runs as new documents are embedded: vectors
    arrive as a 4-file stream (one per micro-batch); each batch is
    encoded against the session's trained PQ codebook, assigned its
    coarse cell, and appended to the cell-partitioned index store —
    exactly the rows ivf_write_pq lays down at bulk-build time, built
    incrementally. The codebook/centroids are FIXED training-time state
    (k-row broadcasts); per-batch work is one encode+assign pass over
    the batch, so ingest cost is O(batch), independent of index size.

    Batching-independent by construction (encoding and cell assignment
    are per-vector deterministic), so the drained store must equal the
    batch replay: the oracle recomputes every vector's cell and m codes
    with the shared trainer CTEs.

    Round-9 mechanism: the per-batch encode is pq_stream_encoder's
    single mapInPandas stage over broadcast-by-closure numpy state
    (bit-exact with the relational bulk encode, unit-pinned) — the
    earlier relational per-batch plan paid ~0.6s Py4J construction +
    three near-empty shuffle stages per micro-batch (stage attribution
    in BENCH_NOTES.md).

    Output: vec_id, cell_id, sub, code (long format, one row per
    vector-subspace)."""
    import atexit
    import os
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import (_flat_cached,
                                                  _select_centroids,
                                                  pq_index_cached,
                                                  pq_stream_encoder)

    emb = load_table(spark, sf_dir, "embeddings")
    codebook, _ = pq_index_cached(emb, m=_PQ_M, ksub=_PQ_KSUB)
    corpus = _flat_cached(emb, "vec_id", "embedding", 64, "c")
    # k-row training-time state, collected once for the batch loop: the
    # encoder captures it as numpy arrays so each micro-batch is ONE
    # narrow mapInPandas stage (scan -> encode -> partitioned write, no
    # shuffle, no 64-column plan to rebuild per batch). Bit-exact with
    # the relational bulk-build encode — see pq_stream_encoder.
    cent_rows = _select_centroids(corpus, 32, 64).collect()
    enc, enc_schema = pq_stream_encoder(cent_rows, codebook.collect(),
                                        64, _PQ_M)

    feed = _staged_feed(spark, sf_dir, "vec_feed")
    work = tempfile.mkdtemp(prefix="nexus_pq_ingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    store, ckpt = f"{work}/store", f"{work}/ckpt"

    def step(batch_df, _batch_id):
        (batch_df.mapInPandas(enc, enc_schema)
         .write.mode("append").partitionBy("cell_id").parquet(store))

    schema = spark.read.parquet(feed).schema
    # 2 files per trigger: still a multi-commit incremental drain, but
    # each micro-batch is a single narrow stage + partitioned append
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2)
              .option("pathGlobFilter", "*.parquet").parquet(feed))
    with _stream_job_conf(spark):
        q = (stream.writeStream.foreachBatch(step)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming PQ ingest drain exceeded 300s")
    if not os.path.isdir(store):
        return spark.createDataFrame(
            [], "vec_id long, cell_id long, sub int, code int")
    return _finish(spark.read.parquet(store)
                   .select("vec_id",
                           F.col("cell_id").cast("long").alias("cell_id"),
                           "sub", "code"))


def _sql_stream_pq_ingest() -> str:
    """Oracle: the drained incremental store must equal the batch
    replay — cell assignment (SQL_SIM_IVF's CTEs) joined with the
    shared PQ trainer/encoder CTEs, one row per vector-subspace."""
    return f"""
WITH {_VECS},
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
cell AS (
  SELECT vec_id, cent_id AS cell_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 1),
{_sql_pq_ctes()}
SELECT c.vec_id, a.cell_id, c.sub, c.code
FROM codes c JOIN cell a USING (vec_id)
"""


def q_e_stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor as a REAL executed stream: the incoming
    two-thirds of documents (the near-dup feed's 4-file arrival
    directory) stream through a foreachBatch counting job that appends
    per-(arrival_day, token-decile) counts to a tiny store; after the
    drain, each day's merged distribution is PSI-scored against the
    frozen baseline snapshot (doc_id%3==0) — the batch corpus_drift_psi
    monitor promoted to ingest-time operation.

    Oracle-checkable because the store is keyed by DATA-derived columns
    (arrival_day = doc_id % 4) and counts are associative: any
    micro-batch partitioning merges to the same per-day counts, so the
    batch replay computes the identical PSI grid. Exercises the
    streaming execution path (source discovery, foreachBatch commits,
    append-only monitoring state) end-to-end.

    Output: day, score, frac_base, frac_obs, psi_term, psi."""
    import atexit
    import os
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import token_count
    from nexus_spark.streaming.drift import (merged_counts, psi_vs_baseline,
                                             stream_category_counts)

    feed = _staged_feed(spark, sf_dir, "neardup_feed")
    schema = spark.read.parquet(feed).schema
    bucket = F.least(token_count(F.col("text")) / F.lit(10),
                     F.lit(9)).cast("int")

    work = tempfile.mkdtemp(prefix="nexus_drift_run_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    out_dir, ckpt = f"{work}/counts", f"{work}/ckpt"
    os.makedirs(out_dir)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feed)
              .select((F.col("doc_id") % 4).alias("day"),
                      bucket.alias("score")))
    with _stream_job_conf(spark):
        q = stream_category_counts(stream, ["day", "score"], out_dir, ckpt)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming drift drain exceeded 300s")

    baseline = (load_table(spark, sf_dir, "documents")
                .where(F.col("doc_id") % 3 == 0)
                .groupBy(bucket.alias("score"))
                .agg(F.count(F.lit(1)).alias("cnt")))
    observed = merged_counts(spark, out_dir, ["day", "score"])
    return _finish(psi_vs_baseline(baseline, observed, "day", "score"))


def _sql_stream_drift_psi() -> str:
    """Oracle: batch replay of the per-day PSI grid — baseline deciles
    (doc_id%3==0) vs each arrival day's deciles (doc_id%3!=0, day =
    doc_id%4), Laplace-0.5 smoothing over each day's category union
    (same formula as _sql_corpus_drift, plus the day dimension)."""
    return f"""
WITH q AS (
  SELECT doc_id, doc_id % 4 AS day,
         CAST(LEAST(len(string_split(text, ' ')) // 10, 9) AS INT)
           AS score
  FROM documents),
a AS (SELECT score, COUNT(*) AS cnt_a FROM q WHERE doc_id % 3 = 0
      GROUP BY score),
b AS (SELECT day, score, COUNT(*) AS cnt_b FROM q WHERE doc_id % 3 <> 0
      GROUP BY day, score),
days AS (SELECT DISTINCT day FROM b),
da AS (SELECT days.day, a.score, a.cnt_a FROM days CROSS JOIN a),
j AS (SELECT COALESCE(da.day, b.day) AS day,
             COALESCE(da.score, b.score) AS score,
             COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b
      FROM da FULL OUTER JOIN b
        ON da.day = b.day AND da.score = b.score),
p AS (
  SELECT day, score,
         (cnt_a + 0.5) / (SUM(cnt_a) OVER (PARTITION BY day)
                          + 0.5 * COUNT(*) OVER (PARTITION BY day))
           AS frac_base,
         (cnt_b + 0.5) / (SUM(cnt_b) OVER (PARTITION BY day)
                          + 0.5 * COUNT(*) OVER (PARTITION BY day))
           AS frac_obs
  FROM j)
SELECT day, score,
       ROUND(frac_base, {ND}) AS frac_base,
       ROUND(frac_obs, {ND}) AS frac_obs,
       ROUND((frac_base - frac_obs) * ln(frac_base / frac_obs), {ND})
         AS psi_term,
       ROUND(SUM((frac_base - frac_obs) * ln(frac_base / frac_obs))
             OVER (PARTITION BY day), {ND}) AS psi
FROM p
"""


def q_e_stream_window_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation executed as a REAL
    streaming query in append mode, drained with availableNow — the
    driver-checkable pin of Spark's WATERMARK SEMANTICS themselves: the
    emitted set is exactly the windows finalized by the final watermark
    (max event time − 30 min); later windows stay in state and are NOT
    emitted. The oracle recomputes that boundary relationally
    (window_end <= max(ts) − 30 min), so a regression in how the
    pipeline advances or applies the watermark shows up as a row-set
    mismatch, not just a flaky test."""
    watch = _staged_feed(spark, sf_dir, "events")
    schema = spark.read.parquet(watch).schema
    stream = spark.readStream.schema(schema).parquet(watch)
    agg = (stream.withColumn("ts2", F.col("ts").cast("timestamp"))
           .withWatermark("ts2", "30 minutes")
           .groupBy(F.window("ts2", "1 hour").alias("w"), "event_type")
           .agg(F.count(F.lit(1)).alias("n_events")))
    _STREAM_Q_N[0] += 1
    name = f"stream_win_out_{_STREAM_Q_N[0]}"
    with _stream_job_conf(spark):
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(300):  # False = timeout (no raise)
            q.stop()
            raise TimeoutError("streaming window drain exceeded 300s")
    out = spark.table(name).select(
        F.col("w.start").alias("w_start"),
        F.col("w.end").alias("w_end"),
        "event_type", "n_events")
    return _finish(out)


SQL_E_STREAM_WINDOW = """
WITH x AS (SELECT event_type, epoch(ts) AS es FROM events),
m AS (SELECT MAX(es) AS mx FROM x),
w AS (SELECT CAST(FLOOR(es / 3600) * 3600 AS BIGINT) AS ws, event_type
      FROM x)
SELECT strftime(make_timestamp(ws * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_start,
       strftime(make_timestamp((ws + 3600) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_end,
       event_type, COUNT(*) AS n_events
FROM w CROSS JOIN m
WHERE ws + 3600 <= mx - 1800
GROUP BY ws, event_type
"""


def q_e_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization executed as a REAL streaming query over
    Spark's session_window state (the fourth executed-streaming pin:
    after fixed-window, dedup and stream-stream join state, this checks
    the MERGING-window state shape). Append mode + availableNow drain
    emits exactly the sessions whose window end (last event + 30-min
    gap) precedes the final watermark (max ts − 30 min); the oracle
    rebuilds that set relationally: gaps-and-islands sessions with the
    merge-on-touch break condition (delta > gap — per-event windows
    merge when they touch, so an event exactly gap after the last still
    EXTENDS the session) and the same emission cut.

    Sink is parquet + schema-pinned read-back (round 9): the memory
    sink collected every emitted session to the driver — ~2s of the
    4.1s sf1 steady for 953k rows, and a driver-memory ceiling a real
    deployment doesn't have; the distributed sink keeps emission
    executor-side (sf1 steady 4.1 -> ~2.5s, attribution in
    BENCH_NOTES.md)."""
    import atexit
    import shutil
    import tempfile

    from nexus_spark.streaming.events import session_stats

    watch = _staged_feed(spark, sf_dir, "events")
    schema = spark.read.parquet(watch).schema
    stream = spark.readStream.schema(schema).parquet(watch)
    out = session_stats(stream, gap="30 minutes", watermark="30 minutes")
    work = tempfile.mkdtemp(prefix="nexus_sess_out_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    with _stream_job_conf(spark):
        q = (out.writeStream.format("parquet")
             .option("path", f"{work}/out")
             .option("checkpointLocation", f"{work}/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(300):  # False = timeout (no raise)
            q.stop()
            raise TimeoutError("streaming sessionize drain exceeded 300s")
    # Explicit schema: a zero-emission drain leaves only _spark_metadata
    return _finish(spark.read.schema(out.schema).parquet(f"{work}/out"))


SQL_E_STREAM_SESSIONS = f"""
WITH x AS (SELECT user_id, value, ts FROM events),
m AS (SELECT MAX(ts) AS mx FROM x),
b AS (
  SELECT user_id, value, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seq
  FROM b),
g AS (
  SELECT user_id, seq, COUNT(*) AS n_events,
         MIN(ts) AS st, MAX(ts) AS en, SUM(value) AS sv
  FROM s GROUP BY user_id, seq)
SELECT user_id,
       strftime(st, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(en + INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS session_end,
       n_events, ROUND(sv, {ND}) AS session_value
FROM g CROSS JOIN m
WHERE en + INTERVAL 30 MINUTE <= mx - INTERVAL 30 MINUTE
"""


def q_e_stream_matchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8's radius/time matchup executed as a REAL streaming join (the
    third executed-streaming pin, after stateful dedup and the
    watermarked window): the primary feed streams from a watch
    directory, joined with streaming_matchup's cell-equi + event-time
    range condition, and drained with availableNow. The emitted set
    must equal the batch matchup (match_once=False) — the
    kappa-architecture guarantee, checked here by the driver against
    the batch oracle SQL.

    Secondary-side size guard (round 14, the s8 guard applied to the
    stream — guide §3.1/§5): an in-situ secondary that fits the batch
    operator's broadcast budget is fed as STATIC reference data, so
    each micro-batch plans a stateless broadcast join building on the
    bounded secondary and the ~45x-exploded primary stream never
    shuffles and holds NO join state (measured at sf1: the
    stream-stream state stores passed ~5M exploded rows per side
    through HDFS-backed state for an 89s steady drain the driver
    flagged as the registry's worst row). A secondary above the budget
    keeps the watermarked stream-stream join — bounded state per side
    is the only plan that survives BOTH feeds growing unboundedly, and
    with the full-span watermark both paths emit the identical set
    (the parity oracle pins it)."""
    from nexus_spark.operators.matchup import (_broadcast_budget_bytes,
                                               _plan_size_bytes)
    from nexus_spark.streaming.matchup import streaming_matchup

    base = _staged_feed(spark, sf_dir, "matchup")
    pdir, sdir = f"{base}/p", f"{base}/s"
    ps = (spark.readStream.schema(spark.read.parquet(pdir).schema)
          .parquet(pdir))
    s_static = spark.read.parquet(sdir)
    if 0 <= _plan_size_bytes(s_static) <= _broadcast_budget_bytes(spark):
        # Bounded secondary: static reference side; streaming_matchup
        # pins the broadcast build on it (no state store, no shuffle
        # of the exploded stream). Shuffle-partition sizing is moot —
        # the micro-batch plan has no exchange before the sink.
        ss = s_static
        parts = "8"
    else:
        # Unbounded secondary: the r12 stream-stream path, state-store
        # count sized to the FEED volume instead of the flat 8 every
        # other executed stream uses (round-11 verdict ask #3): the
        # stream-stream join passes every input row through a state
        # store, the neighbor-cell explode multiplies the primary ~9x,
        # and at sf1 the flat 8 left 24 of 32 cores idle on ~5M state
        # rows (measured 152.4s; 32 stores -> 84.7s, same 18.0M-row
        # result). One store per ~150k state rows, floor 8 (below
        # that, near-empty stores cost more than they parallelize —
        # the r9 measurement that set the flat 8), cap at the host's
        # parallelism. The counts are parquet-footer metadata reads.
        n_p = spark.read.parquet(pdir).count()
        n_s = s_static.count()
        parts = max(8, min(int(spark.sparkContext.defaultParallelism),
                           (9 * n_p + n_s) // 150_000 + 1))
        ss = (spark.readStream.schema(s_static.schema).parquet(sdir))
    out = streaming_matchup(ps, ss, radius_km=_MU_R,
                            time_tolerance_s=_MU_TT,
                            watermark="3650 days")
    # Parquet file sink, not a memory sink: matched pairs land
    # executor-side like a real deployment's lake append — a memory
    # sink serializes every match to the driver, which breaks
    # spark.driver.maxResultSize at sf1's ~100x pair volume.
    import atexit
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="nexus_smu_run_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    with _stream_job_conf(spark, partitions=str(parts)):
        q = (out.writeStream.format("parquet")
             .option("path", f"{work}/out")
             .option("checkpointLocation", f"{work}/ckpt")
             .outputMode("append").trigger(availableNow=True).start())
        if not q.awaitTermination(300):  # False = timeout (no raise)
            q.stop()
            raise TimeoutError("streaming matchup drain exceeded 300s")
    # Explicit schema on the read-back: a zero-match drain leaves only
    # _spark_metadata in the sink directory, and schema inference would
    # raise 'Unable to infer schema' where the old memory sink returned
    # an empty table.
    return _finish(spark.read.schema(out.schema)
                   .parquet(f"{work}/out").select(
        "primary_id", "p_time", "p_lat", "p_lon", "p_value",
        "secondary_id", "s_time", "s_lat", "s_lon", "s_value",
        "dist_km", "dt_s"))


def q_e_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.streaming.events import windowed_stats

    ev = load_table(spark, sf_dir, "events")
    return _finish(windowed_stats(ev, window="1 hour", slide="30 minutes"))


SQL_SLIDING = f"""
WITH x AS (SELECT event_type, value,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events),
w AS (
  SELECT CAST(FLOOR((es - o) / 3600) * 3600 + o AS BIGINT) AS ws,
         event_type, value
  FROM x, (SELECT unnest([0, 1800]) AS o) offs)
SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS w_start,
       strftime(make_timestamp((ws + 3600) * 1000000),
                '%Y-%m-%d %H:%M:%S') AS w_end,
       event_type, COUNT(*) AS ev_cnt,
       ROUND(AVG(value), {ND}) AS ev_avg,
       ROUND(MIN(value), {ND}) AS ev_min,
       ROUND(MAX(value), {ND}) AS ev_max
FROM w GROUP BY ws, event_type
"""


def q_sql_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import json_props_stats

    return _finish(json_props_stats(load_table(spark, sf_dir, "events")))


SQL_JSON = f"""
WITH e AS (
  SELECT event_type, value,
         CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events)
SELECT event_type, CAST(FLOOR(k / 10) AS INT) AS k_bucket,
       COUNT(*) AS n,
       ROUND(AVG(k), {ND}) AS k_avg,
       ROUND(AVG(value), {ND}) AS v_avg
FROM e GROUP BY event_type, CAST(FLOOR(k / 10) AS INT)
"""


def q_sql_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import distinct_counts

    return _finish(distinct_counts(load_table(spark, sf_dir, "lineitem")))


SQL_DISTINCT = """
SELECT COUNT(DISTINCT l_partkey) AS d_parts,
       COUNT(DISTINCT l_suppkey) AS d_supps,
       COUNT(DISTINCT l_orderkey) AS d_orders,
       COUNT(DISTINCT (l_returnflag, l_linestatus)) AS d_flag_status
FROM lineitem
"""


def q_sql_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import value_quantiles

    return _finish(value_quantiles(load_table(spark, sf_dir, "events")))


SQL_QUANTILES = f"""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), {ND}) AS p50,
       ROUND(quantile_cont(value, 0.9), {ND}) AS p90,
       ROUND(quantile_cont(value, 0.99), {ND}) AS p99,
       COUNT(value) AS n
FROM events GROUP BY event_type
"""


def q_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch profile (HLL++ distinct + GK quantiles), surfaced
    as deterministic accuracy flags so it IS oracle-checkable: the oracle
    recomputes the exact columns and asserts every flag TRUE.  Sketch
    internals stay engine-specific; what both engines agree on is the
    exact ground truth and the published error contract."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import approx_profile_checked

    return _finish(approx_profile_checked(load_table(spark, sf_dir,
                                                     "events")))


SQL_SKETCH_PROFILE = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS users_exact,
       TRUE AS users_ok,
       TRUE AS p50_ok,
       TRUE AS p95_ok,
       TRUE AS p99_ok
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Polygon masking (non-rectangular) + low-pass filter
# --------------------------------------------------------------------------

# A non-rectangular quadrilateral cutting through the cell grid.
_POLY = [(-120.0, -20.0), (30.0, -26.0), (150.0, 15.0), (-60.0, 27.0)]


def q_s1_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.functions.polygon import filter_polygon
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    masked = filter_polygon(obs, _POLY)
    return _finish(time_series(masked, datasets=["sst_a"]))


def _sql_s1_polygon() -> str:
    from nexus_spark.functions.polygon import (polygon_bbox,
                                               polygon_sql_predicate)

    min_lat, max_lat, min_lon, max_lon = polygon_bbox(_POLY)
    pred = polygon_sql_predicate(_POLY)
    return _with(OBS) + f"""
SELECT dataset, strftime(time, '%Y-%m-%d') AS ts_date,
       ROUND(MIN(value), {ND}) AS ts_min,
       ROUND(MAX(value), {ND}) AS ts_max,
       ROUND({WMEAN}, {ND}) AS ts_mean,
       COUNT(value) AS ts_cnt,
       ROUND(STDDEV_POP(value), {ND}) AS ts_std
FROM obs
WHERE dataset = 'sst_a'
  AND lat BETWEEN {min_lat} AND {max_lat}
  AND lon BETWEEN {min_lon} AND {max_lon}
  AND {pred}
GROUP BY dataset, strftime(time, '%Y-%m-%d')
"""


def q_f_lowpass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterworth low-pass over the daily-mean series (reference
    Filtering.applyLowPassFilter). The filter is inherently sequential over
    one already-aggregated series — the one legitimate driver-side numpy
    step. No SQL oracle for THIS full-length variant (the filter design
    depends on n); the pinned-length sibling f_lowpass_checked replays
    the whole chain in DuckDB and is the driver-checked row. numpy
    kernel also golden-tested in tests/test_filtering.py."""
    from nexus_spark.functions.filtering import low_pass_filter
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    ts = (time_series(obs, datasets=["sst_a"])
          .select("ts_date", "ts_mean").orderBy("ts_date").collect())
    import numpy as np

    vals = np.array([r["ts_mean"] if r["ts_mean"] is not None else np.nan
                     for r in ts])
    # NaN-fill via neighbor interpolation before filtering (mask semantics).
    idx = np.arange(len(vals))
    good = ~np.isnan(vals)
    filled = np.interp(idx, idx[good], vals[good])
    smooth = low_pass_filter(filled, cutoff=12.0, order=9)
    out = spark.createDataFrame(
        [(str(r["ts_date"]), float(v)) for r, v in zip(ts, smooth)],
        "ts_date string, lowpass double")
    return _finish(out)


_LP_N, _LP_PAD = 365, 30  # pinned series length -> fixed filter design


def q_f_lowpass_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-CHECKABLE sibling of f_lowpass: the same Butterworth
    filtfilt chain (reference Filtering.py:87-97) over the FIRST
    {_LP_N} days of the sst_a daily series. Pinning n fixes the filter
    design (wn = 12 / (n/2)), so the oracle can embed the (b, a, zi)
    coefficient literals — whose derivation is behavior-pinned by the
    golden tests in test_filtering.py (unity DC gain, half-power
    cutoff) — and independently recompute EVERYTHING else in SQL: the
    daily aggregation, null interpolation, odd-extension padding, both
    directional IIR recurrences (recursive CTE carrying the DF2T state
    vector), reversal and slicing. Closes the last rows-only §2 row."""
    import numpy as np

    from nexus_spark.functions.filtering import low_pass_filter
    from nexus_spark.operators.timeseries import time_series

    obs = domain.observations(spark, sf_dir)
    ts = _finish(time_series(obs, datasets=["sst_a"])
                 .select("ts_date", "ts_mean"))
    rows = ts.orderBy("ts_date").limit(_LP_N).collect()
    vals = np.array([r["ts_mean"] if r["ts_mean"] is not None else np.nan
                     for r in rows])
    idx = np.arange(len(vals))
    good = ~np.isnan(vals)
    filled = np.interp(idx, idx[good], vals[good])
    smooth = low_pass_filter(filled, cutoff=12.0, order=9)
    out = spark.createDataFrame(
        [(r["ts_date"], float(v)) for r, v in zip(rows, smooth)],
        "ts_date string, lowpass double")
    return _finish(out)


def _sql_lowpass_checked() -> str:
    """DuckDB replay of the pinned-length filtfilt (see
    q_f_lowpass_checked). The two lfilter passes are recursive CTEs
    stepping the direct-form-II-transposed state vector with the SAME
    floating-point operation order as functions/filtering.lfilter, so
    the recurrence is bit-reproducible; b/a/zi enter as literals."""
    import numpy as np

    from nexus_spark.functions.filtering import _lfilter_zi, butter_lowpass

    n, pad, order = _LP_N, _LP_PAD, 9
    wn = min(12.0 / (0.5 * n), 0.99)
    b, a = butter_lowpass(order, wn)
    bn = np.asarray(b, dtype=float) / a[0]
    an = np.asarray(a, dtype=float) / a[0]
    zi = _lfilter_zi(bn, an)
    big_l = n + 2 * pad

    def dlist(vs):
        # QUOTED-string casts: a bare numeric literal inside CAST(x AS
        # DOUBLE) is parsed as DECIMAL first and loses ulps; the string
        # form goes through strtod and round-trips the double exactly.
        # One ulp matters here: the order-9 direct-form transient
        # amplifies a 1-ulp state perturbation ~1e7x (measured 5.7e-14
        # -> 5.4e-7 over the 425-step backward pass).
        return ("[" + ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)"
                                for v in vs) + "]")

    # DF2T state update, same op order as filtering.lfilter:
    #   y  = b[0]*x + z[0]
    #   z'[j] = b[j+1]*x + z[j+1] - a[j+1]*y   (j = 0..order-2)
    #   z'[order-1] = b[order]*x - a[order]*y
    znew = ", ".join(
        [f"cb[{j + 2}]*xi + z[{j + 2}] - ca[{j + 2}]*yi"
         for j in range(order - 1)]
        + [f"cb[{order + 1}]*xi - ca[{order + 1}]*yi"])

    def pass_cte(name: str, src: str) -> str:
        # src must expose: xs (input list), dates, cb, ca
        return f"""
{name} AS (
  SELECT 0 AS t, [zz * xs[1] FOR zz IN {dlist(zi)}] AS z,
         CAST([] AS DOUBLE[]) AS acc, xs, dates, cb, ca
  FROM {src}
  UNION ALL
  SELECT t + 1, [{znew}], list_append(acc, yi), xs, dates, cb, ca
  FROM (SELECT t, z, acc, xs, dates, cb, ca, xs[t+1] AS xi,
               cb[1]*xs[t+1] + z[1] AS yi
        FROM {name} WHERE t < {big_l})
)"""

    return f"""
WITH RECURSIVE {OBS},
ts AS (
  SELECT strftime(time, '%Y-%m-%d') AS ts_date,
         ROUND({WMEAN}, {ND}) AS m
  FROM obs WHERE dataset = 'sst_a'
  GROUP BY strftime(time, '%Y-%m-%d')
  ORDER BY ts_date LIMIT {n}
),
idx AS (SELECT ts_date, m, ROW_NUMBER() OVER (ORDER BY ts_date) AS i
        FROM ts),
pn AS (
  SELECT ts_date, i, m,
    LAST_VALUE(CASE WHEN m IS NOT NULL THEN i END IGNORE NULLS)
      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS pi,
    LAST_VALUE(m IGNORE NULLS)
      OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS pm,
    FIRST_VALUE(CASE WHEN m IS NOT NULL THEN i END IGNORE NULLS)
      OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS ni,
    FIRST_VALUE(m IGNORE NULLS)
      OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      AS nm
  FROM idx),
fill AS (
  SELECT ts_date, i,
    CASE WHEN m IS NOT NULL THEN m
         WHEN pi IS NULL THEN nm
         WHEN ni IS NULL THEN pm
         -- np.interp op order exactly: slope*(x - x_lo) + y_lo, so the
         -- filled series is bit-identical and the IIR replay cannot
         -- amplify an interpolation ulp into a 6th-decimal flip
         ELSE ((nm - pm) / (CAST(ni AS DOUBLE) - pi))
              * (CAST(i AS DOUBLE) - pi) + pm
    END AS v
  FROM pn),
base AS (SELECT LIST(v ORDER BY i) AS x,
                LIST(ts_date ORDER BY i) AS dates,
                {dlist(bn)} AS cb, {dlist(an)} AS ca
         FROM fill),
padded AS (
  SELECT list_concat(list_concat(
           [2*x[1] - x[{pad + 2} - k] FOR k IN generate_series(1, {pad})],
           x),
           [2*x[{n}] - x[{n} - k] FOR k IN generate_series(1, {pad})])
         AS xs, dates, cb, ca
  FROM base),
{pass_cte('fwd', 'padded')},
rev AS (SELECT list_reverse(acc) AS xs, dates, cb, ca
        FROM fwd WHERE t = {big_l}),
{pass_cte('bwd', 'rev')},
fin AS (SELECT list_reverse(acc) AS y2, dates
        FROM bwd WHERE t = {big_l})
SELECT dates[k] AS ts_date, ROUND(y2[{pad} + k], {ND}) AS lowpass
FROM fin, (SELECT unnest(generate_series(1, {n})) AS k)
"""


# --------------------------------------------------------------------------
# Oracle-checkable MinHash (md5 string order) + IVF ANN
# --------------------------------------------------------------------------

_MH_K, _MH_BANDS = 16, 4


def q_d_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with md5-string hashing — same banding/verify machinery
    as the xxhash64 fast path, but fully reproducible in the oracle."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents")
    return _finish(minhash_lsh_pairs(docs, k=_MH_K, bands=_MH_BANDS,
                                     threshold=_JACCARD_T, hash_fn="md5"))


def q_d_lsh_xx_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect oracle for the xxhash64 MinHash+LSH fast path: both hash
    families band differently but VERIFY candidates with the same exact
    jaccard, so at full banding recall their verified pair sets are
    identical. The surface is the full-outer union of the two sets with
    per-variant membership flags; the oracle rebuilds the md5 set exactly
    (DuckDB-reproducible hashes) and asserts both flags TRUE — a recall
    miss in EITHER family surfaces as a flag flip / extra row, turning
    the previously-unverifiable xx variant into a driver-checked one.

    Plan note: both families share ONE exact-jaccard verify over the
    union of their candidate sets (a pair's jaccard is hash-family-
    independent) — the flags are candidate-set membership, which is
    equivalent to membership in the per-family verified sets for every
    row that survives the threshold. Verifying per family doubled the
    postings-index consumers, which is what made this query degrade
    when sweep-wide memory pressure evicted the postings cache."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (distinct_postings,
                                             jaccard_verify,
                                             minhash_lsh_candidates)

    docs = load_table(spark, sf_dir, "documents")
    kw = dict(k=_MH_K, bands=_MH_BANDS)
    xx = (minhash_lsh_candidates(docs, hash_fn="xxhash64", **kw)
          .withColumn("c_xx", F.lit(True)))
    md = (minhash_lsh_candidates(docs, hash_fn="md5", **kw)
          .withColumn("c_md", F.lit(True)))
    cand = (xx.join(md, ["id_a", "id_b"], "full_outer")
            .select("id_a", "id_b",
                    F.coalesce("c_xx", F.lit(False)).alias("in_xx"),
                    F.coalesce("c_md", F.lit(False)).alias("in_md5")))
    ver = jaccard_verify(cand.select("id_a", "id_b"),
                         distinct_postings(docs), _JACCARD_T)
    out = (ver.join(cand, ["id_a", "id_b"])
           .select("id_a", "id_b", "jaccard", "in_xx", "in_md5"))
    return _finish(out)


def _sql_lsh_parity() -> str:
    return (_sql_minhash_md5()
            .replace(f"AS jaccard\nFROM ver",
                     "AS jaccard,\n       TRUE AS in_xx, TRUE AS in_md5"
                     "\nFROM ver"))


def q_d_simhash_xx_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect oracle for the xxhash64 SimHash fingerprint: every TRUE
    strong duplicate (exact word-3-gram jaccard >= 0.9 — an oracle-able
    set) must land within hamming 20/64 under the xx projection and
    20/60 under the md5 projection. No banding in the check — fingerprints
    join directly onto the strong pairs, so there is no recall knob to
    excuse a miss; observed strong-pair hamming tops out at ~12 across
    rounds, so 20 asserts the estimator works while staying far from the
    noise floor. (Set-parity of the banded pair sets would be WRONG here:
    the two projections legitimately disagree near the hamming boundary,
    unlike MinHash where exact-jaccard verification makes the sets
    comparable.)"""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (ngram_jaccard_pairs,
                                             simhash_fingerprints)

    docs = load_table(spark, sf_dir, "documents")
    strong = ngram_jaccard_pairs(docs, threshold=0.9)
    fpx = simhash_fingerprints(docs, hash_fn="xxhash64")
    fpm = simhash_fingerprints(docs, hash_fn="md5")

    def ham(fp, suffix):
        a = fp.select(F.col("id").alias("id_a"),
                      F.col("simhash").alias(f"sa_{suffix}"))
        b = fp.select(F.col("id").alias("id_b"),
                      F.col("simhash").alias(f"sb_{suffix}"))
        return a, b

    ax, bx = ham(fpx, "x")
    am, bm = ham(fpm, "m")
    out = (strong.join(ax, "id_a").join(bx, "id_b")
           .join(am, "id_a").join(bm, "id_b")
           .select(
               "id_a", "id_b", "jaccard",
               (F.bit_count(F.col("sa_x").bitwiseXOR(F.col("sb_x"))) <= 20)
               .alias("xx_close"),
               (F.bit_count(F.col("sa_m").bitwiseXOR(F.col("sb_m"))) <= 20)
               .alias("md5_close")))
    return _finish(out)


SQL_D_SIMHASH_RECALL = SQL_D_JACCARD.replace(
    "AS jaccard\nFROM e a",
    "AS jaccard,\n       TRUE AS xx_close, TRUE AS md5_close\nFROM e a"
).replace(f">= {_JACCARD_T}", ">= 0.9")


def _sql_minhash_md5() -> str:
    rows = _MH_K // _MH_BANDS
    mins = ",\n         ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(_MH_K))
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_idx, md5({concat}) AS band_hash FROM sig"
        .format(b=b, concat=" || ',' || ".join(
            f"h{i}" for i in range(b * rows, (b + 1) * rows)))
        for b in range(_MH_BANDS))
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END) AS shingles
  FROM d),
e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
sig AS (SELECT doc_id,
         {mins}
        FROM e GROUP BY doc_id),
bands AS (
{band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
ver AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
           / (len(x.shingles) + len(y.shingles)
              - len(list_intersect(x.shingles, y.shingles))) AS jaccard
  FROM cand JOIN sh x ON x.doc_id = id_a JOIN sh y ON y.doc_id = id_b)
SELECT id_a, id_b, ROUND(jaccard, {ND}) AS jaccard
FROM ver WHERE jaccard >= {_JACCARD_T}
"""


def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_ivf(emb, queries_df, k=_KNN_K))


SQL_SIM_IVF = f"""
WITH {_VECS},
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
assign AS (
  SELECT vec_id AS neighbor_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 1),
probes AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c WHERE n.vec_id < {_KNN_QUERIES}) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 2),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM probes JOIN assign USING (cent_id)
  WHERE query_id <> neighbor_id),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = query_id
            JOIN n c ON c.vec_id = neighbor_id)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank,
       ROUND(cosine, {ND}) AS cosine
FROM scored
QUALIFY rank <= {_KNN_K}
"""


def q_sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a driver-checked metric: per-query recall@k of the
    IVF search against the exact brute-force top-k. Both sides are
    deterministic (seeded centroids, rounded tie-breaks), so the oracle
    recomputes the same recall exactly — the eval harness every ANN
    deployment runs, expressed as one query."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_ivf, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    brute = (knn_bruteforce(emb, queries_df, k=_KNN_K)
             .select("query_id", "neighbor_id"))
    ann = (ann_ivf(emb, queries_df, k=_KNN_K)
           .select("query_id", "neighbor_id", F.lit(1).alias("hit")))
    out = (brute.join(ann, ["query_id", "neighbor_id"], "left")
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("k_eff"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .alias("n_matched")))
    return _finish(out.select(
        "query_id", "k_eff", "n_matched",
        (F.col("n_matched") / F.col("k_eff").cast("double"))
        .alias("recall")))


def _sql_sim_recall() -> str:
    """Oracle: brute top-k left-joined against IVF top-k, CTEs prefixed
    to avoid collisions between the two reused oracle bodies."""
    ivf_body = SQL_SIM_IVF.split("WITH", 1)[1]
    knn_body = SQL_SIM_KNN.split("WITH", 1)[1]
    return f"""
WITH ivf_res AS (WITH {ivf_body}),
knn_res AS (WITH {knn_body})
SELECT b.query_id,
       COUNT(*) AS k_eff,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), {ND}) AS recall
FROM knn_res b LEFT JOIN ivf_res a
  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
GROUP BY b.query_id
"""


def q_sim_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization-quality eval as a driver-checked metric: per-query
    recall@k of the int8-compressed search against the exact float
    top-k — the measured answer to 'what does 4x compression cost in
    recall'. Both sides deterministic, so the oracle recomputes the
    identical recall."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_int8, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    brute = (knn_bruteforce(emb, queries_df, k=_KNN_K)
             .select("query_id", "neighbor_id"))
    q8 = (ann_int8(emb, queries_df, k=_KNN_K)
          .select("query_id", "neighbor_id", F.lit(1).alias("hit")))
    out = (brute.join(q8, ["query_id", "neighbor_id"], "left")
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("k_eff"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .alias("n_matched")))
    return _finish(out.select(
        "query_id", "k_eff", "n_matched",
        (F.col("n_matched") / F.col("k_eff").cast("double"))
        .alias("recall")))


def _sql_sim_int8_recall() -> str:
    """Oracle: exact top-k left-joined against int8 top-k (same CTE
    surgery as _sql_sim_recall)."""
    q8_body = SQL_SIM_ANN_INT8.split("WITH", 1)[1]
    knn_body = SQL_SIM_KNN.split("WITH", 1)[1]
    return f"""
WITH q8_res AS (WITH {q8_body}),
knn_res AS (WITH {knn_body})
SELECT b.query_id,
       COUNT(*) AS k_eff,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), {ND}) AS recall
FROM knn_res b LEFT JOIN q8_res a
  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
GROUP BY b.query_id
"""


def q_sim_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-quality eval for the PQ index: per-query recall@k of
    ADC search against the exact float top-k — the measured answer to
    'what does 32x compression cost in recall' (vs int8's 4x, eval'd by
    sim_int8_recall_at_k). Deterministic on both sides, so the oracle
    recomputes the identical recall."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_pq, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    brute = (knn_bruteforce(emb, queries_df, k=_KNN_K)
             .select("query_id", "neighbor_id"))
    pq = (ann_pq(emb, queries_df, k=_KNN_K, m=_PQ_M, ksub=_PQ_KSUB)
          .select("query_id", "neighbor_id", F.lit(1).alias("hit")))
    out = (brute.join(pq, ["query_id", "neighbor_id"], "left")
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("k_eff"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .alias("n_matched")))
    return _finish(out.select(
        "query_id", "k_eff", "n_matched",
        (F.col("n_matched") / F.col("k_eff").cast("double"))
        .alias("recall")))


def _sql_sim_pq_recall() -> str:
    """Oracle: exact top-k left-joined against PQ/ADC top-k (same CTE
    surgery as _sql_sim_int8_recall)."""
    pq_body = _sql_sim_pq().split("WITH", 1)[1]
    knn_body = SQL_SIM_KNN.split("WITH", 1)[1]
    return f"""
WITH pq_res AS (WITH {pq_body}),
knn_res AS (WITH {knn_body})
SELECT b.query_id,
       COUNT(*) AS k_eff,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), {ND}) AS recall
FROM knn_res b LEFT JOIN pq_res a
  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
GROUP BY b.query_id
"""


# Rerank pool: 8x k (FAISS-style refinement ratio). Measured recall@5 on
# the sf0.001 fixture: 0.40 @ pool 20, 0.58 @ 40, 0.92 @ 80 — 1-bit codes
# trade recall for a 32x-smaller first-stage scan, and the pool size is
# the recovery knob.
_BIN_RERANK = 40


def _sql_bin_pack_words(dim: int = 64) -> list[str]:
    """DuckDB word-pack expressions over the 1-based `vec` DOUBLE[] CTE
    column — the exact SUM(CASE v[i] > 0 THEN 2^j) arithmetic
    similarity._bin_pack_exprs emits Spark-side (0-based there)."""
    words = []
    for w in range((dim + 31) // 32):
        terms = [f"(CASE WHEN vec[{w * 32 + j + 1}] > 0.0"
                 f" THEN {1 << j} ELSE 0 END)"
                 for j in range(32) if w * 32 + j < dim]
        words.append("CAST(" + " + ".join(terms) + " AS BIGINT)")
    return words


def q_sim_quantize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit sign) quantization of the embedding column — the
    32x compression point of the index family (float32 1x, int8 4x,
    PQ 32x-with-tables, binary 32x-with-popcount). Packed 32-bit words,
    population-count checksum, and bit-density diagnostic per vector."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import quantize_binary

    return _finish(quantize_binary(load_table(spark, sf_dir, "embeddings")))


def _sql_sim_quantize_binary() -> str:
    w0, w1 = _sql_bin_pack_words(64)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
pk AS (SELECT vec_id, {w0} AS b0, {w1} AS b1 FROM v)
SELECT vec_id, b0, b1,
       CAST(bit_count(b0) + bit_count(b1) AS BIGINT) AS nbits,
       ROUND((bit_count(b0) + bit_count(b1)) / 64.0, {ND}) AS density
FROM pk
"""


def q_sim_ann_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage binary search: Hamming scan over packed sign bits
    (XOR+popcount, 1/32 the scan bytes) keeps 20 candidates per query,
    then exact float cosine reranks them (asymmetric refinement) — the
    first-stage-filter mode of a binary-quantized 100 TB index. Codes
    and tie-breaks are exact integers, so the oracle replays the whole
    pack->hamming->candidates->rerank pipeline."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_hamming

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_hamming(emb, queries_df, k=_KNN_K,
                               rerank_n=_BIN_RERANK))


def _sql_sim_ann_hamming() -> str:
    w0, w1 = _sql_bin_pack_words(64)
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
pk AS (SELECT vec_id, {w0} AS b0, {w1} AS b1 FROM v),
qp AS (SELECT * FROM pk WHERE vec_id < {_KNN_QUERIES}),
ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         bit_count(xor(q.b0, c.b0)) + bit_count(xor(q.b1, c.b1))
           AS hamming
  FROM qp q JOIN pk c ON q.vec_id <> c.vec_id),
cand AS (
  SELECT query_id, neighbor_id FROM ham
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY hamming, neighbor_id) <= {_BIN_RERANK}),
n AS (SELECT vec_id, vec,
             sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
      FROM v),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN n q ON q.vec_id = cand.query_id
            JOIN n c ON c.vec_id = cand.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cosine, {ND}) AS cosine
FROM ranked WHERE rank <= {_KNN_K}
"""


def q_sim_binary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-quality eval for the binary index: per-query recall@k
    of Hamming-filter + float-rerank search against the exact float
    top-k — the measured answer to 'what does 1-bit quantization cost
    in recall' (vs int8's and PQ's, eval'd by their recall queries).
    Deterministic on both sides, so the oracle recomputes it."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_hamming, knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    brute = (knn_bruteforce(emb, queries_df, k=_KNN_K)
             .select("query_id", "neighbor_id"))
    ham = (ann_hamming(emb, queries_df, k=_KNN_K, rerank_n=_BIN_RERANK)
           .select("query_id", "neighbor_id", F.lit(1).alias("hit")))
    out = (brute.join(ham, ["query_id", "neighbor_id"], "left")
           .groupBy("query_id")
           .agg(F.count(F.lit(1)).alias("k_eff"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .alias("n_matched")))
    return _finish(out.select(
        "query_id", "k_eff", "n_matched",
        (F.col("n_matched") / F.col("k_eff").cast("double"))
        .alias("recall")))


def _sql_sim_binary_recall() -> str:
    """Oracle: exact top-k left-joined against Hamming+rerank top-k
    (same CTE surgery as _sql_sim_int8_recall)."""
    ham_body = _sql_sim_ann_hamming().split("WITH", 1)[1]
    knn_body = SQL_SIM_KNN.split("WITH", 1)[1]
    return f"""
WITH ham_res AS (WITH {ham_body}),
knn_res AS (WITH {knn_body})
SELECT b.query_id,
       COUNT(*) AS k_eff,
       CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched,
       ROUND(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), {ND}) AS recall
FROM knn_res b LEFT JOIN ham_res a
  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
GROUP BY b.query_id
"""


# Deterministic line-structure carve: the fixture documents are single-
# line word salad, so the Gopher line rules would be degenerate on them.
# Plant every failure mode by doc_id class (dup lines, bullets, trailing
# ellipsis, symbol runs) — same carve-the-fixture pattern as
# q_d_corpus_diff. Identical SQL text evaluates on both engines.
_GOPHER_CARVE = """
CASE
  WHEN doc_id % 7 = 0 THEN substr(text, 1, 40) || chr(10) || text
                           || chr(10) || substr(text, 1, 40)
  WHEN doc_id % 7 = 1 THEN text || chr(10) || '- bullet one'
                           || chr(10) || '* bullet two'
  WHEN doc_id % 7 = 2 THEN text || chr(10) || 'trailing thought...'
  WHEN doc_id % 7 = 3 THEN text || ' ### ## #'
  ELSE text
END
"""


def q_text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule suite (Rae et al. 2021 Table A1): per-doc
    word/word-length/symbol/bullet/ellipsis/alpha/stopword/dup-line
    metrics, failed-rule count and keep decision — the standard
    pretraining repetition+format filter, one shuffle-free projection
    over the documents scan."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import gopher_quality

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_GOPHER_CARVE).alias("text"))
    return _finish(gopher_quality(docs))


def _sql_text_gopher_quality() -> str:
    stop_pred = " OR ".join(f"w = '{s}'" for s in
                            ("the", "be", "to", "of", "and", "that",
                             "have", "with"))
    return f"""
WITH carved AS (SELECT doc_id, {_GOPHER_CARVE} AS text FROM documents),
arr AS (
  SELECT doc_id, text,
         regexp_split_to_array(text, '\\s+') AS words,
         string_split(text, chr(10)) AS lines
  FROM carved),
m AS (
  SELECT doc_id,
         CAST(len(words) AS BIGINT) AS n_words,
         list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT)))
           / CAST(len(words) AS DOUBLE) AS mean_word_len,
         ((length(text) - length(replace(text, '#', '')))
          + (length(text) - length(replace(text, '...', ''))) / 3)
           / CAST(len(words) AS DOUBLE) AS symbol_ratio,
         len(list_filter(lines, l -> l LIKE '-%' OR l LIKE '*%'))
           / CAST(len(lines) AS DOUBLE) AS bullet_frac,
         len(list_filter(lines, l -> l LIKE '%...'))
           / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
           / CAST(len(words) AS DOUBLE) AS alpha_frac,
         CAST(len(list_filter(words, w -> {stop_pred})) AS BIGINT)
           AS stop_hits,
         len(list_filter(lines,
                         x -> len(list_filter(lines, y -> y = x)) > 1))
           / CAST(len(lines) AS DOUBLE) AS dup_line_frac,
         COALESCE(list_sum(list_transform(
             list_filter(lines,
                         x -> len(list_filter(lines, y -> y = x)) > 1),
             x -> CAST(length(x) AS BIGINT))), 0)
           / CAST(list_sum(list_transform(
                 lines, l -> CAST(length(l) AS BIGINT))) AS DOUBLE)
           AS dup_char_frac
  FROM arr),
r AS (
  SELECT *,
         CAST((CASE WHEN n_words NOT BETWEEN 50 AND 100000
                    THEN 1 ELSE 0 END)
              + (CASE WHEN mean_word_len NOT BETWEEN 3.0 AND 10.0
                      THEN 1 ELSE 0 END)
              + (CASE WHEN symbol_ratio > 0.1 THEN 1 ELSE 0 END)
              + (CASE WHEN bullet_frac > 0.9 THEN 1 ELSE 0 END)
              + (CASE WHEN ellipsis_frac > 0.3 THEN 1 ELSE 0 END)
              + (CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END)
              + (CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END)
              + (CASE WHEN dup_line_frac > 0.3 THEN 1 ELSE 0 END)
              + (CASE WHEN dup_char_frac > 0.3 THEN 1 ELSE 0 END)
              AS INT) AS rules_failed
  FROM m)
SELECT doc_id, n_words, ROUND(mean_word_len, {ND}) AS mean_word_len,
       ROUND(symbol_ratio, {ND}) AS symbol_ratio,
       ROUND(bullet_frac, {ND}) AS bullet_frac,
       ROUND(ellipsis_frac, {ND}) AS ellipsis_frac,
       ROUND(alpha_frac, {ND}) AS alpha_frac,
       stop_hits,
       ROUND(dup_line_frac, {ND}) AS dup_line_frac,
       ROUND(dup_char_frac, {ND}) AS dup_char_frac,
       rules_failed,
       CAST(CASE WHEN rules_failed = 0 THEN 1 ELSE 0 END AS INT) AS keep
FROM r
"""


_MMR_K = 5
_MMR_POOL = 20


def q_sim_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (Carbonell & Goldstein SIGIR'98):
    greedy lam*rel - pen_w*max-sim-to-selected over a per-query exact
    kNN pool — the dedup-aware ranking step of a retrieval pipeline.
    Greedy steps are deterministic (rounded-score/id tie-breaks), so
    the oracle replays the full selection as k unrolled CTE layers."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(mmr_select(emb, queries_df, k=_MMR_K, pool_n=_MMR_POOL))


def _sql_sim_mmr(k: int = _MMR_K, pool_n: int = _MMR_POOL,
                 lam: str = "0.7", pen: str = "0.3") -> str:
    """Oracle: the greedy loop unrolled into k CTE layers (the
    _sql_bpe_learn pattern) — sel{i} accumulates the chosen set, p{i+1}
    scores the remaining pool against it, QUALIFY picks the argmax."""
    head = f"""
WITH {_VECS},
q AS (SELECT * FROM n WHERE vec_id < {_KNN_QUERIES}),
sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS rel
       FROM q JOIN n c ON q.vec_id <> c.vec_id),
pool AS (SELECT query_id, neighbor_id, rel FROM sc
         QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY ROUND(rel, 6) DESC, neighbor_id) <= {pool_n}),
pr AS (SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
              list_dot_product(na.vec, nb.vec) / (na.nrm * nb.nrm) AS sim
       FROM pool a JOIN pool b
         ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
       JOIN n na ON na.vec_id = a.neighbor_id
       JOIN n nb ON nb.vec_id = b.neighbor_id),
s1 AS (SELECT query_id, neighbor_id, {lam} * rel AS mmr FROM pool
       QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY ROUND({lam} * rel, 6) DESC, neighbor_id) = 1)"""
    parts = [head]
    sel_union = "SELECT query_id, neighbor_id FROM s1"
    for i in range(2, k + 1):
        parts.append(f""",
sel{i - 1} AS ({sel_union}),
p{i} AS (SELECT pr.query_id, pr.ca AS neighbor_id, MAX(pr.sim) AS pen
         FROM pr JOIN sel{i - 1} s
           ON pr.query_id = s.query_id AND pr.cb = s.neighbor_id
         LEFT JOIN sel{i - 1} x
           ON pr.query_id = x.query_id AND pr.ca = x.neighbor_id
         WHERE x.neighbor_id IS NULL
         GROUP BY pr.query_id, pr.ca),
s{i} AS (SELECT p.query_id, p.neighbor_id,
                {lam} * pool.rel - {pen} * p.pen AS mmr
         FROM p{i} p JOIN pool
           ON pool.query_id = p.query_id
          AND pool.neighbor_id = p.neighbor_id
         QUALIFY ROW_NUMBER() OVER (PARTITION BY p.query_id
                 ORDER BY ROUND({lam} * pool.rel - {pen} * p.pen, 6) DESC,
                          p.neighbor_id) = 1)""")
        sel_union += f" UNION ALL SELECT query_id, neighbor_id FROM s{i}"
    final = "\nUNION ALL\n".join(
        f"SELECT query_id, neighbor_id, CAST({i} AS INT) AS mmr_rank,"
        f" ROUND(mmr, {ND}) AS mmr FROM s{i}"
        for i in range(1, k + 1))
    return "".join(parts) + "\n" + final


# Shared CTE block: feature-hashed document embeddings in sparse long
# format — the exact md5-bucket/sign contract of text.hash_embed.
_HASH_EMBED_CTES = f"""
wl AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       FROM documents),
ht AS (SELECT doc_id, md5(word) AS h FROM wl WHERE word <> ''),
hb AS (SELECT doc_id,
              CAST(('0x' || substr(h, 1, 8))::BIGINT % 64 AS INT) AS pos,
              CASE WHEN substr(h, 9, 1) IN
                   ('0','1','2','3','4','5','6','7')
                   THEN 1 ELSE -1 END AS s
       FROM ht),
ha AS (SELECT doc_id, pos, CAST(SUM(s) AS DOUBLE) AS raw
       FROM hb GROUP BY doc_id, pos),
he AS (SELECT doc_id, pos,
              raw / NULLIF(sqrt(SUM(raw * raw)
                                OVER (PARTITION BY doc_id)), 0) AS val
       FROM ha)"""


def q_text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing document embedder (Weinberger et al. ICML'09):
    md5-bucketed signed word counts, L2-normalized, sparse long format —
    the deterministic, training-free step that closes the
    docs -> vectors -> dedup/ANN loop in-engine. One explode + one
    map-side-combined (doc, bucket) aggregate + a per-doc norm window."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import hash_embed

    return _finish(hash_embed(load_table(spark, sf_dir, "documents")))


SQL_TEXT_HASH_EMBED = f"""
WITH {_HASH_EMBED_CTES}
SELECT doc_id, pos, ROUND(val, {ND}) AS val FROM he
"""


def q_sim_hash_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The closed loop: hash-embed the corpus, then exact top-k cosine
    between documents as a SPARSE inner-product equi-join on bucket
    (vectors are L2-normalized, so the dot IS the cosine; pairs join
    only on shared buckets — no dense materialization, no cross join).
    The sparse-similarity-join shape a 100 TB text corpus can actually
    run end-to-end without a trained model.

    The embedding table is session-memoized index state
    (`hash_embed_cached`, same policy as `pq_index_cached`): the plan
    references it twice (query side + corpus side) and would otherwise
    re-derive the explode/aggregate/norm subtree per branch."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import hash_embed_cached

    emb = hash_embed_cached(load_table(spark, sf_dir, "documents"))
    q = (emb.where(F.col("doc_id") < _KNN_QUERIES)
         .select(F.col("doc_id").alias("query_id"), "pos",
                 F.col("val").alias("qval")))
    c = emb.select(F.col("doc_id").alias("neighbor_id"), "pos",
                   F.col("val").alias("cval"))
    from pyspark.sql import Window

    scored = (F.broadcast(q).join(c, "pos")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum(F.col("qval") * F.col("cval")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc())
    return _finish(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _KNN_K)
        .select("query_id", "neighbor_id", "rank", "cosine"))


SQL_SIM_HASH_EMBED_KNN = f"""
WITH {_HASH_EMBED_CTES},
hq AS (SELECT doc_id AS query_id, pos, val AS qval FROM he
       WHERE doc_id < {_KNN_QUERIES}),
hs AS (
  SELECT q.query_id, c.doc_id AS neighbor_id,
         SUM(q.qval * c.val) AS cosine
  FROM hq q JOIN he c ON q.pos = c.pos AND q.query_id <> c.doc_id
  GROUP BY q.query_id, c.doc_id),
hr AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank
  FROM hs)
SELECT query_id, neighbor_id, rank, ROUND(cosine, {ND}) AS cosine
FROM hr WHERE rank <= {_KNN_K}
"""


# The synthesized EDGE "server" per sf_dir (see q_d8_insitu_subset's
# docstring): fixture-not-adapter, so built once per process.
_D8_EP_CACHE: dict[tuple, dict] = {}


def q_d8_insitu_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 paged EDGE in-situ subset end-to-end through the paging adapter
    (reference: doms/fetchedgeimpl.py:141-173 offset-parallel fetch,
    doms/insitusubset.py:161-171 handler): a bounded slice of the events
    table becomes an in-memory EDGE endpoint serving 'Point(lon lat)'
    records over offset paging; read_edge pages it back via mapInPandas
    (one page per executor task), records run the reference's
    normalization, and the result must equal a plain SQL scan of the same
    slice — which is exactly what the oracle does. The fixture ENDPOINT
    (the stand-in for the remote EDGE server, not part of the measured
    Spark pipeline) is built with a direct pyarrow read of the events
    parquet — no Spark job — and MEMOIZED per sf_dir: a remote EDGE
    service exists before the query does, so re-synthesizing its corpus
    on every repeat would bill server construction to the paging
    adapter under measurement; production points the same adapter at a
    real EDGE HTTP service (sources/edge.py:http_fetcher)."""
    import os

    import pyarrow.parquet as pq

    from nexus_spark.sources.edge import insitu_subset, make_fixture_endpoint

    # Key on (sf_dir, applicationId): the endpoint holds a Spark
    # broadcast bound to the creating SparkContext, so a cached entry
    # must not outlive its context — a restarted session in the same
    # process would dereference a destroyed broadcast.
    cache_key = (sf_dir, spark.sparkContext.applicationId)
    ep = _D8_EP_CACHE.get(cache_key)
    if ep is None:
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_id", "user_id", "ts", "value",
                                   "event_type"]).to_pandas()
        t = t[t["event_type"] == "error"].sort_values("event_id")
        iso = t["ts"].dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        records = [
            {"id": int(e), "time": s,
             "point":
                 f"Point({(e % 40) * 0.5 - 10.0} {(u % 20) * 0.5 - 5.0})",
             "platform": int(u % 9) + 1,
             "depth": float(u % 10),
             "sea_water_temperature": float(v)}
            for e, u, s, v in zip(t["event_id"], t["user_id"], iso,
                                  t["value"])]
        ep = make_fixture_endpoint(records, name="events_edge",
                                   items_per_page=2000, spark=spark)
        for k in [k for k in _D8_EP_CACHE if k[1] != cache_key[1]]:
            del _D8_EP_CACHE[k]  # drop endpoints of dead contexts
        _D8_EP_CACHE[cache_key] = ep
    df = insitu_subset(spark, ep, "2024-01-01T00:00:00Z",
                       "2027-12-31T23:59:59Z", "-10,-5,5,3",
                       parameter="sst", depth_min=2.0, depth_max=8.0,
                       platforms="1,2,3,4,5")
    return _finish(df.select("id", "source", "time", "lat", "lon",
                             "platform", "depth", "value"))


SQL_D8_INSITU = """
SELECT 'id-' || CAST(event_id AS VARCHAR) AS id,
       'events_edge' AS source,
       CAST(FLOOR(epoch(ts)) AS DOUBLE) * 1000 AS time,
       CAST(user_id % 20 AS DOUBLE) * 0.5 - 5.0 AS lat,
       CAST(event_id % 40 AS DOUBLE) * 0.5 - 10.0 AS lon,
       CASE user_id % 9 + 1
            WHEN 1 THEN 'ship' WHEN 2 THEN 'moored surface buoy'
            WHEN 3 THEN 'drifting surface float'
            WHEN 4 THEN 'drifting subsurface profiling float'
            WHEN 5 THEN 'autonomous underwater vehicle' END AS platform,
       CAST(user_id % 10 AS DOUBLE) AS depth,
       ROUND(value, 6) AS value
FROM events
WHERE event_type = 'error'
  AND user_id % 9 + 1 <= 5
  AND user_id % 10 BETWEEN 2 AND 8
  AND user_id % 20 <= 16
  AND event_id % 40 <= 30
"""


# --------------------------------------------------------------------------
# LLM-pipeline: retrieval (BM25, hybrid RRF), NB classifier, shard export,
# int8 quantization
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K = 20
_RRF_DEPTH = 50
_RRF_QUERY_VEC = 7
_N_SHARDS = 8


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical retrieval (Okapi with the Lucene idf floor)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return _finish(bm25_topk(docs, _BM25_TERMS, k=_BM25_K))


def _sql_bm25_ctes(depth: int) -> str:
    """Shared BM25 CTE chain (terms baked as literals, same constants and
    parenthesization as retrieval.bm25_scores)."""
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents),
h AS (SELECT doc_id, word FROM w WHERE word IN ({terms})),
tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM h GROUP BY doc_id, word),
dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
ts AS (SELECT tf.doc_id,
              ln(1.0 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                * (tf.tf * 2.2)
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                   / (CAST(st.sum_dl AS DOUBLE) / st.n_docs))) AS s
       FROM tf JOIN dfq USING (word) JOIN dl USING (doc_id) CROSS JOIN st),
ag AS (SELECT doc_id, COUNT(*) AS n_terms_hit, SUM(s) AS bm25
       FROM ts GROUP BY doc_id),
lr AS (SELECT doc_id, n_terms_hit, bm25,
              CAST(ROW_NUMBER() OVER (ORDER BY ROUND(bm25, 6) DESC,
                                      doc_id) AS INT) AS lex_rank
       FROM ag QUALIFY lex_rank <= {depth})"""


SQL_TEXT_BM25 = f"""
WITH {_sql_bm25_ctes(_BM25_K)}
SELECT doc_id, n_terms_hit, ROUND(bm25, {ND}) AS bm25, lex_rank FROM lr
"""


def q_sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal-rank fusion
    (Cormack/Clarke/Buettcher SIGIR'09): BM25 top-50 and exact cosine
    top-50 around one query embedding, fused by 1/(60+rank) — the RAG
    retrieval stack as one deterministic relational plan."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.retrieval import hybrid_rrf

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return _finish(hybrid_rrf(docs, emb, _BM25_TERMS,
                              query_vec_id=_RRF_QUERY_VEC, k=_BM25_K,
                              depth=_RRF_DEPTH))


SQL_SIM_HYBRID = f"""
WITH {_VECS},
{_sql_bm25_ctes(_RRF_DEPTH).lstrip()},
qv AS (SELECT * FROM n WHERE vec_id = {_RRF_QUERY_VEC}),
sc AS (SELECT c.vec_id AS doc_id,
              list_dot_product(qv.vec, c.vec) / (qv.nrm * c.nrm) AS cosine
       FROM qv JOIN n c ON c.vec_id <> qv.vec_id),
vr AS (SELECT doc_id,
              CAST(ROW_NUMBER() OVER (ORDER BY ROUND(cosine, 6) DESC,
                                      doc_id) AS INT) AS vec_rank
       FROM sc QUALIFY vec_rank <= {_RRF_DEPTH}),
f AS (SELECT COALESCE(lr.doc_id, vr.doc_id) AS doc_id,
             lr.lex_rank, vr.vec_rank,
             COALESCE(1.0 / (60 + lr.lex_rank), 0.0)
               + COALESCE(1.0 / (60 + vr.vec_rank), 0.0) AS rrf_score
      FROM lr FULL OUTER JOIN vr ON lr.doc_id = vr.doc_id)
SELECT doc_id, lex_rank, vec_rank, ROUND(rrf_score, {ND}) AS rrf_score,
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(rrf_score, 9) DESC,
                               doc_id) AS INT) AS fused_rank
FROM f QUALIFY fused_rank <= {_BM25_K}
"""


def q_text_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multinomial Naive Bayes language classifier,
    trained and scored in one relational plan (Laplace-smoothed over the
    full vocab x classes grid)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import nb_lang_classifier

    return _finish(nb_lang_classifier(
        load_table(spark, sf_dir, "documents")))


SQL_TEXT_NB = f"""
WITH w AS (SELECT doc_id, lang AS cls,
                  unnest(string_split(text, ' ')) AS word
           FROM documents),
cd AS (SELECT lang AS cls, COUNT(*) AS n_docs_c FROM documents
       GROUP BY lang),
ndq AS (SELECT COUNT(*) AS n_docs FROM documents),
pr AS (SELECT cls, ln(CAST(n_docs_c AS DOUBLE) / n_docs) AS logprior
       FROM cd CROSS JOIN ndq),
wc AS (SELECT cls, word, COUNT(*) AS c_wc FROM w GROUP BY cls, word),
tc AS (SELECT cls, SUM(c_wc) AS tok_c FROM wc GROUP BY cls),
vo AS (SELECT DISTINCT word FROM wc),
vs AS (SELECT COUNT(*) AS v FROM vo),
grid AS (SELECT vo.word, cd.cls FROM vo CROSS JOIN cd),
lik AS (SELECT grid.cls, grid.word,
               ln((COALESCE(wc.c_wc, 0) + 1.0) / (tc.tok_c + vs.v))
                 AS loglik
        FROM grid LEFT JOIN wc ON grid.cls = wc.cls
                              AND grid.word = wc.word
        JOIN tc ON grid.cls = tc.cls CROSS JOIN vs),
tfq AS (SELECT doc_id, word, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents) w2
        GROUP BY doc_id, word),
sc AS (SELECT tfq.doc_id, lik.cls, SUM(tfq.tf * lik.loglik) AS sum_ll
       FROM tfq JOIN lik USING (word) GROUP BY tfq.doc_id, lik.cls),
po AS (SELECT sc.doc_id, sc.cls, sc.sum_ll + pr.logprior AS logpost
       FROM sc JOIN pr USING (cls)),
best AS (SELECT doc_id, cls, logpost,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY ROUND(logpost, 6) DESC, cls) AS rk
         FROM po)
SELECT b.doc_id, d.lang AS lang_true, b.cls AS lang_pred,
       ROUND(b.logpost, {ND}) AS logpost
FROM best b JOIN documents d USING (doc_id) WHERE rk = 1
"""


def q_text_nb_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier eval harness: the NB language classifier's confusion
    matrix against the true labels (count per (true, predicted) pair,
    plus per-true-class recall) — the accuracy report a pipeline records
    whenever it swaps the quality/language gate model. One aggregate
    over the classifier's per-doc output; the oracle reruns the full NB
    fit+score as a subquery."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import nb_lang_classifier
    from pyspark.sql import Window

    scored = nb_lang_classifier(load_table(spark, sf_dir, "documents"))
    cm = (scored.groupBy("lang_true", "lang_pred")
          .agg(F.count(F.lit(1)).alias("n_docs")))
    w = Window.partitionBy("lang_true")
    return _finish(cm.withColumn(
        "recall_of_true",
        F.when(F.col("lang_true") == F.col("lang_pred"),
               F.col("n_docs") / F.sum("n_docs").over(w))
        .otherwise(F.lit(None).cast("double"))))


def _sql_nb_confusion() -> str:
    return f"""
WITH scored AS ({SQL_TEXT_NB}),
cm AS (SELECT lang_true, lang_pred, COUNT(*) AS n_docs
       FROM scored GROUP BY lang_true, lang_pred)
SELECT lang_true, lang_pred, n_docs,
       CASE WHEN lang_true = lang_pred THEN
         ROUND(n_docs / CAST(SUM(n_docs) OVER (PARTITION BY lang_true)
                             AS DOUBLE), {ND})
       END AS recall_of_true
FROM cm
"""


def q_d_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + balanced shard assignment — the
    training-export layout (md5-keyed permutation, hash-mod sharding,
    within-shard hash order = source-interleaved shards)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    out = shuffle_shards(docs, n_shards=_N_SHARDS, seed="r4")
    return _finish(out.select("doc_id", "lang", "shard", "pos_in_shard"))


SQL_D_SHUFFLE_SHARDS = f"""
WITH k AS (SELECT doc_id, lang,
                  substr(md5('r4:' || CAST(doc_id AS VARCHAR)), 1, 8)
                    AS skey
           FROM documents),
s AS (SELECT doc_id, lang, skey,
             ('0x' || skey)::BIGINT % {_N_SHARDS} AS shard FROM k)
SELECT doc_id, lang, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
            ORDER BY skey, doc_id) AS INT) AS pos_in_shard
FROM s
"""


def q_sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (FAISS-SQ8-style
    per-vector scale): codes checksum + range + reconstruction MSE."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import quantize_int8

    return _finish(quantize_int8(load_table(spark, sf_dir, "embeddings")))


SQL_SIM_QUANTIZE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
s AS (SELECT vec_id, vec,
             list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
      FROM v),
q AS (SELECT vec_id, vec, scale,
             list_transform(vec, x -> CASE WHEN scale = 0 THEN 0.0
                  ELSE floor(x / scale + 0.5) END) AS qv
      FROM s)
SELECT vec_id, ROUND(scale, {ND}) AS scale,
       CAST(list_sum(qv) AS BIGINT) AS qsum,
       CAST(list_min(qv) AS BIGINT) AS qmin,
       CAST(list_max(qv) AS BIGINT) AS qmax,
       ROUND((list_dot_product(vec, vec)
              - 2.0 * scale * list_dot_product(vec, qv)
              + scale * scale * list_dot_product(qv, qv))
             / len(vec), {ND}) AS mse
FROM q
"""


_WSAMPLE_N = 100


def q_d_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys, md5-uniform draws): top-100 documents weighted by
    length — deterministic, engine-portable, TakeOrdered at scale."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sampling import weighted_sample_topn

    docs = load_table(spark, sf_dir, "documents")
    return _finish(weighted_sample_topn(docs, "n_chars", n=_WSAMPLE_N,
                                        seed="w"))


SQL_D_WEIGHTED_SAMPLE = f"""
WITH k AS (
  SELECT doc_id, n_chars AS weight,
         -ln((('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8))
              ::BIGINT + 1) / 4294967297.0) / n_chars AS es_key
  FROM documents WHERE n_chars > 0)
SELECT doc_id, weight, ROUND(es_key, {ND}) AS es_key,
       CAST(ROW_NUMBER() OVER (ORDER BY es_key, doc_id) AS INT)
         AS sample_rank
FROM k QUALIFY sample_rank <= {_WSAMPLE_N}
"""


def q_d_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions (added / removed /
    changed / unchanged via normalized content fingerprints). The two
    snapshots are carved deterministically from the documents fixture:
    'old' drops ids divisible by 10, 'new' appends a token to ids
    divisible by 7 — so every status appears."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text")).alias("text"))
    return _finish(corpus_diff(old, new))


SQL_D_CORPUS_DIFF = """
WITH fp AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(COALESCE(text, '')),
                                  ' +', ' ', 'g'))) AS fp
  FROM documents),
o AS (SELECT doc_id, fp AS old_fp FROM fp WHERE doc_id % 10 <> 0),
nw AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(COALESCE(
           CASE WHEN doc_id % 7 = 0 THEN text || ' edited' ELSE text END,
           '')), ' +', ' ', 'g'))) AS new_fp
  FROM documents)
SELECT COALESCE(o.doc_id, nw.doc_id) AS doc_id,
       CASE WHEN o.old_fp IS NULL THEN 'added'
            WHEN nw.new_fp IS NULL THEN 'removed'
            WHEN o.old_fp = nw.new_fp THEN 'unchanged'
            ELSE 'changed' END AS status,
       o.old_fp, nw.new_fp
FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id
"""


def q_sim_mean_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk->document embedding mean-pooling (the chunk_documents ->
    embed -> pool pipeline step), long format: vectors grouped into
    pseudo-documents by vec_id % 50, one pooled component per (doc,
    pos)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import mean_pool

    emb = load_table(spark, sf_dir, "embeddings")
    chunks = emb.select((F.col("vec_id") % 50).alias("doc_id"),
                        "embedding")
    return _finish(mean_pool(chunks, "doc_id"))


SQL_SIM_MEAN_POOL = f"""
WITH e AS (SELECT vec_id % 50 AS doc_id,
                  CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
x AS (SELECT doc_id, unnest(vec) AS val,
             CAST(generate_subscripts(vec, 1) - 1 AS INT) AS pos FROM e)
SELECT doc_id, pos, ROUND(AVG(val), {ND}) AS pooled
FROM x GROUP BY doc_id, pos
"""


def q_sim_ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-index search: exact top-k over the int8-quantized
    corpus (asymmetric: float queries vs dequantized codes) — the
    1/4-scan-bytes search mode of a quantized 100 TB index,
    oracle-checked end-to-end because codes and scales are exact."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_int8

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_int8(emb, queries_df, k=_KNN_K))


SQL_SIM_ANN_INT8 = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
s AS (SELECT vec_id, vec,
             list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
      FROM v),
dq AS (SELECT vec_id,
              list_transform(vec, x -> CASE WHEN scale = 0 THEN 0.0
                   ELSE floor(x / scale + 0.5) * scale END) AS vec
       FROM s),
nc AS (SELECT vec_id, vec,
              sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
       FROM dq),
nq AS (SELECT vec_id, vec,
              sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
       FROM v WHERE vec_id < {_KNN_QUERIES}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.vec, c.vec) / (q.nrm * c.nrm) AS cosine
  FROM nq q JOIN nc c ON q.vec_id <> c.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cosine, {ND}) AS cosine
FROM ranked WHERE rank <= {_KNN_K}
"""


def q_sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (Jegou et al. TPAMI 2011) — the
    third compression point of the index family after float32 and int8
    SQ: m=8 one-byte codes per 64-dim vector (32x scan-byte reduction),
    scored by per-query lookup tables instead of full dot products.
    Deterministic trainer (md5-ordered seeds, one rounded-argmin Lloyd
    round), so codebook, codes and ADC scores are all oracle-checked."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_pq(emb, queries_df, k=_KNN_K,
                          m=_PQ_M, ksub=_PQ_KSUB))


_PQ_M = 8       # subspaces (dim 64 -> 8 dims each)
_PQ_KSUB = 16   # centroids per subspace


def q_sim_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ combined search (the FAISS IVFPQ layout): md5-seeded
    coarse cells bound the candidate set to nprobe partitions, PQ codes
    bound the bytes per candidate to m lookups — the billion-vector
    configuration. Both stages reuse their standalone deterministic
    machinery, so the composition is oracle-checked end-to-end."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import ann_ivf_pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < _KNN_QUERIES)
    return _finish(ann_ivf_pq(emb, queries_df, k=_KNN_K,
                              m=_PQ_M, ksub=_PQ_KSUB))


def _sql_pq_ctes() -> str:
    """Shared PQ CTE block (assumes v/n from _VECS are in scope): seed
    codebook -> one Lloyd round -> re-encode -> per-query ADC LUT.
    Ends at `lut`; callers add their own candidate/scored/rank tail."""
    dsub = 64 // _PQ_M
    d2 = ("list_dot_product(sv, sv) - 2*list_dot_product(sv, tv)"
          " + list_dot_product(tv, tv)")
    mv = "[" + ", ".join(f"avg(sv[{i + 1}])" for i in range(dsub)) + "]"
    return f"""subs AS (
  SELECT vec_id, CAST(s.sub AS INT) AS sub,
         vec[CAST(s.sub*{dsub}+1 AS INT):CAST(s.sub*{dsub}+{dsub} AS INT)]
           AS sv
  FROM v, (SELECT UNNEST(range({_PQ_M})) AS sub) s),
seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) - 1
           AS code
  FROM (SELECT vec_id FROM v
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_PQ_KSUB})),
cb0 AS (SELECT s.sub, seeds.code, s.sv AS tv
        FROM subs s JOIN seeds USING (vec_id)),
a1 AS (
  SELECT vec_id, sub, code FROM (
    SELECT subs.vec_id, subs.sub, cb0.code, {d2} AS d2
    FROM subs JOIN cb0 USING (sub))
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                             ORDER BY ROUND(d2, 6), code) = 1),
means AS (
  SELECT sub, code, {mv} AS mv
  FROM subs JOIN a1 USING (vec_id, sub) GROUP BY sub, code),
cb AS (
  SELECT cb0.sub, cb0.code,
         CASE WHEN m.code IS NULL THEN cb0.tv ELSE m.mv END AS tv
  FROM cb0 LEFT JOIN means m ON cb0.sub = m.sub AND cb0.code = m.code),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT subs.vec_id, subs.sub, cb.code, {d2} AS d2
    FROM subs JOIN cb USING (sub))
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                             ORDER BY ROUND(d2, 6), code) = 1),
lut AS (
  SELECT q.vec_id AS query_id, cb.sub, cb.code,
         list_dot_product(q.sv, cb.tv) AS pdot,
         list_dot_product(cb.tv, cb.tv) AS cn2
  FROM (SELECT * FROM subs WHERE vec_id < {_KNN_QUERIES}) q
       JOIN cb USING (sub))"""


_SQL_PQ_RANK_TAIL = f"""fin AS (
  SELECT s.query_id, s.neighbor_id,
         s.adot / (n.nrm * sqrt(s.rn2)) AS cosine
  FROM scored s JOIN n ON n.vec_id = s.query_id)
SELECT query_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY ROUND(cosine, 6) DESC, neighbor_id) AS INT) AS rank,
       ROUND(cosine, {ND}) AS cosine
FROM fin QUALIFY rank <= {_KNN_K}
"""


def _sql_sim_pq() -> str:
    """PQ trainer + encoder + ADC replay: md5-ordered seed codebook, one
    Lloyd round with ROUND(d2,6)+code argmin and empty-cell carry-over,
    re-encode, per-query LUT join, reconstruction-norm cosine."""
    return f"""
WITH {_VECS},
{_sql_pq_ctes()},
scored AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         SUM(l.pdot) AS adot, SUM(l.cn2) AS rn2
  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
  WHERE c.vec_id <> l.query_id
  GROUP BY l.query_id, c.vec_id),
{_SQL_PQ_RANK_TAIL}"""


def _sql_sim_ivf_pq() -> str:
    """IVF+PQ replay: SQL_SIM_IVF's md5-seeded cells bound the candidate
    pairs, the shared PQ CTEs supply codes and the per-query ADC LUT."""
    return f"""
WITH {_VECS},
cents AS (SELECT vec_id AS cent_id, vec AS cvec, nrm AS cnrm
          FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
assign AS (
  SELECT vec_id AS neighbor_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 1),
probes AS (
  SELECT vec_id AS query_id, cent_id FROM (
    SELECT n.vec_id, c.cent_id,
           list_dot_product(n.vec, c.cvec) / (n.nrm * c.cnrm) AS cc
    FROM n, cents c WHERE n.vec_id < {_KNN_QUERIES}) s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY ROUND(cc, 6) DESC, cent_id) <= 2),
cand AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM probes JOIN assign USING (cent_id)
  WHERE query_id <> neighbor_id),
{_sql_pq_ctes()},
scored AS (
  SELECT ca.query_id, ca.neighbor_id,
         SUM(l.pdot) AS adot, SUM(l.cn2) AS rn2
  FROM cand ca
       JOIN codes c ON c.vec_id = ca.neighbor_id
       JOIN lut l ON l.query_id = ca.query_id
                 AND l.sub = c.sub AND l.code = c.code
  GROUP BY ca.query_id, ca.neighbor_id),
{_SQL_PQ_RANK_TAIL}"""


def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((flag, status), (flag), ()) — detail cells,
    subtotals and grand total in ONE aggregation pass, with the
    portable grouping(a)*2+grouping(b) level id."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import lineitem_grouping_sets

    return _finish(lineitem_grouping_sets(
        load_table(spark, sf_dir, "lineitem")))


SQL_SQL_GROUPING_SETS = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT)
         AS gid,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), {ND}) AS sum_qty,
       ROUND(AVG(l_extendedprice), {ND}) AS avg_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_d_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-gate funnel: survivors of each successive
    Gopher-style gate + final retention — the per-source attrition
    report a curation pipeline logs before committing to a mix. One
    projection + one conditional aggregate (map-side combined)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import quality_funnel

    return _finish(quality_funnel(
        load_table(spark, sf_dir, "documents")))


_FUNNEL_STOP_PRED = " OR ".join(
    f"w = '{s}'" for s in ("the", "be", "to", "of", "and", "that",
                           "have", "with"))

SQL_D_QUALITY_FUNNEL = f"""
WITH arr AS (
  SELECT source,
         regexp_split_to_array(COALESCE(text, ''), '\\s+') AS words
  FROM documents),
m AS (
  SELECT source,
         CAST(len(words) AS BIGINT) AS n_words,
         list_sum(list_transform(words, w -> CAST(length(w) AS BIGINT)))
           / CAST(len(words) AS DOUBLE) AS mean_wl,
         len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
           / CAST(len(words) AS DOUBLE) AS alpha_frac,
         len(list_filter(words, w -> {_FUNNEL_STOP_PRED})) AS stop_hits
  FROM arr),
g AS (
  SELECT source,
         CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS g1,
         CASE WHEN n_words BETWEEN 50 AND 100000
               AND mean_wl BETWEEN 3.0 AND 10.0 THEN 1 ELSE 0 END AS g2,
         CASE WHEN n_words BETWEEN 50 AND 100000
               AND mean_wl BETWEEN 3.0 AND 10.0
               AND alpha_frac >= 0.8 THEN 1 ELSE 0 END AS g3,
         CASE WHEN n_words BETWEEN 50 AND 100000
               AND mean_wl BETWEEN 3.0 AND 10.0
               AND alpha_frac >= 0.8
               AND stop_hits >= 2 THEN 1 ELSE 0 END AS g4
  FROM m)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(g1) AS BIGINT) AS pass_words,
       CAST(SUM(g2) AS BIGINT) AS pass_word_len,
       CAST(SUM(g3) AS BIGINT) AS pass_alpha,
       CAST(SUM(g4) AS BIGINT) AS pass_stopwords,
       ROUND(SUM(g4) / CAST(COUNT(*) AS DOUBLE), {ND}) AS retention
FROM g GROUP BY source
"""


_CONTAIN_T = 0.8
_CONTAIN_MIN_SH = 5


def q_d_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed n-gram containment |Sa∩Sb|/|Sa| >= t — subset-dup
    detection (quotes/boilerplate swallowed by longer docs) that
    symmetric Jaccard misses; same shared inverted-index join as the
    jaccard family, only the denominator differs."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import ngram_containment

    return _finish(ngram_containment(
        load_table(spark, sf_dir, "documents"),
        threshold=_CONTAIN_T, min_shingles=_CONTAIN_MIN_SH))


SQL_D_DEDUP_CONTAINMENT = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(words) >= 3 THEN
           [array_to_string(words[i:i+2], ' ')
            FOR i IN generate_series(1, len(words) - 2)]
         ELSE [array_to_string(words, ' ')] END) AS shingles
  FROM d),
e AS (SELECT doc_id, len(shingles) AS n, unnest(shingles) AS shingle FROM sh)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS n_inter, ANY_VALUE(a.n) AS n_a,
       ROUND(CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(a.n), {ND})
         AS containment
FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
WHERE a.n >= {_CONTAIN_MIN_SH}
GROUP BY a.doc_id, b.doc_id
HAVING CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(a.n) >= {_CONTAIN_T}
"""


_KNN_GRAPH_K = 5


def q_sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN graph over the corpus via IVF cell blocking
    (candidates = cell co-residents, sum(|cell|^2) pair volume) —
    the neighborhood structure graph-clustering / manifold methods
    consume; an edge survives only if each endpoint ranks in the
    other's top-k."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import knn_graph_ivf

    return _finish(knn_graph_ivf(
        load_table(spark, sf_dir, "embeddings"), k=_KNN_GRAPH_K))


SQL_SIM_KNN_GRAPH = f"""
WITH {_VECS},
{_IVF_CAND},
dir AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM cand),
scored AS (
  SELECT d.src, d.dst,
         list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm) AS cosine
  FROM dir d JOIN n x ON x.vec_id = d.src
             JOIN n y ON y.vec_id = d.dst),
edges AS (
  SELECT src, dst, cosine,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY src
             ORDER BY ROUND(cosine, 6) DESC, dst) AS INT) AS rank
  FROM scored
  QUALIFY rank <= {_KNN_GRAPH_K})
SELECT f.src AS id_a, f.dst AS id_b,
       f.rank AS rank_ab, r.rank AS rank_ba,
       ROUND(f.cosine, {ND}) AS cosine
FROM edges f JOIN edges r ON r.src = f.dst AND r.dst = f.src
WHERE f.src < f.dst
"""


_MERGE_NEW_OFFSET = 10_000_000


def q_d_lake_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC MERGE (upsert+delete+insert) applied to the
    documents table with a deterministic synthetic change batch —
    union + one key window, single shuffle; the relational core of
    `lake.merge_into_partitions`, whose physical form rewrites only
    the partitions a batch touches."""
    from nexus_spark.catalog import load_table
    from nexus_spark.sources.lake import merge_upsert

    docs = load_table(spark, sf_dir, "documents")
    cols = docs.columns  # doc_id, text, lang, source, n_chars
    upd = (docs.where(F.col("doc_id") % 7 == 0)
           .withColumn("text", F.upper(F.col("text")))
           .withColumn("op", F.lit("U")).withColumn("seq", F.lit(1)))
    dels = (docs.where(F.col("doc_id") % 13 == 3)
            .withColumn("op", F.lit("D")).withColumn("seq", F.lit(2)))
    ins = (docs.where(F.col("doc_id") % 11 == 0)
           .withColumn("doc_id", F.col("doc_id") + _MERGE_NEW_OFFSET)
           .withColumn("op", F.lit("U")).withColumn("seq", F.lit(1)))
    updates = (upd.select(*cols, "op", "seq")
               .unionByName(dels.select(*cols, "op", "seq"))
               .unionByName(ins.select(*cols, "op", "seq")))
    merged = merge_upsert(docs, updates, ["doc_id"],
                          seq_col="seq", op_col="op")
    return _finish(merged.select(
        "doc_id", "source", F.md5("text").alias("content_hash")))


SQL_D_LAKE_MERGE_UPSERT = f"""
WITH ups AS (
  SELECT doc_id, upper(text) AS text, lang, source, n_chars,
         'U' AS op, 1 AS seq
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, text, lang, source, n_chars, 'D' AS op, 2 AS seq
  FROM documents WHERE doc_id % 13 = 3
  UNION ALL
  SELECT doc_id + {_MERGE_NEW_OFFSET} AS doc_id, text, lang, source,
         n_chars, 'U' AS op, 1 AS seq
  FROM documents WHERE doc_id % 11 = 0),
unioned AS (
  SELECT doc_id, text, source, -1 AS seq, 'U' AS op FROM documents
  UNION ALL
  SELECT doc_id, text, source, seq, op FROM ups),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY seq DESC) AS rn
  FROM unioned)
SELECT doc_id, source, md5(text) AS content_hash
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


def q_sql_step_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over events (view -> click -> purchase,
    each step strictly after the previous step's arrival): per-step
    aggregates chained on the prior step's min-ts, all sharing the
    user_id shuffle. Counts are non-increasing by construction."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import event_step_funnel

    return _finish(event_step_funnel(load_table(spark, sf_dir, "events")))


SQL_SQL_STEP_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id)
SELECT 'all_users' AS step, 0 AS step_idx,
       COUNT(DISTINCT user_id) AS n_users FROM events
UNION ALL SELECT 'view', 1, COUNT(*) FROM s1
UNION ALL SELECT 'click', 2, COUNT(*) FROM s2
UNION ALL SELECT 'purchase', 3, COUNT(*) FROM s3
"""


def q_sql_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: first-event week x weeks-since
    offset, distinct users per cell — two aggregates sharing the
    user_id shuffle; the output matrix is always tiny."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import event_retention_cohorts

    return _finish(event_retention_cohorts(
        load_table(spark, sf_dir, "events")))


SQL_SQL_RETENTION_COHORTS = """
WITH fst AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events GROUP BY user_id)
SELECT strftime(first_day - CAST(date_diff('day', DATE '2024-01-01',
                                           first_day) % 7 AS INT),
                '%Y-%m-%d') AS cohort_week,
       CAST(FLOOR(date_diff('day', first_day, CAST(e.ts AS DATE)) / 7.0)
            AS INT)
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN fst ON e.user_id = fst.user_id
GROUP BY 1, 2
"""


_PAGERANK_ITERS = 8
_PAGERANK_D = 0.85


def q_sim_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the mutual kNN graph (fixed 8
    supersteps, damping 0.85, mean-normalized so rank magnitudes are
    corpus-size-free): the connectivity signal a curation pipeline
    layers on its neighborhood graph to pick canonical representatives
    and weight samples. Each superstep is one map-side-combined
    shuffle keyed by destination node; per-node state is a single
    double and the edge list materializes once (localCheckpoint), so
    the whole run is a fixed-depth lazy plan with no driver-side data."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.graph import pagerank
    from nexus_spark.operators.similarity import knn_graph_ivf

    edges = knn_graph_ivf(load_table(spark, sf_dir, "embeddings"),
                          k=_KNN_GRAPH_K)
    return _finish(pagerank(edges, iterations=_PAGERANK_ITERS,
                            damping=_PAGERANK_D))


def _sql_pagerank() -> str:
    """Unrolled power-iteration layers over the same mutual edge list
    the knn-graph oracle derives. Damping literals are generated from
    the SAME Python doubles the Spark plan uses (1.0-0.85 is not 0.15
    in binary — repr round-trips the exact value into both engines)."""
    d, omd = repr(_PAGERANK_D), repr(1.0 - _PAGERANK_D)
    layers = []
    for i in range(1, _PAGERANK_ITERS + 1):
        layers.append(f"""r{i} AS (
  SELECT t.dst AS node, {omd} + {d} * SUM(r.rank / g.dg) AS rank
  FROM dirs t JOIN r{i - 1} r ON r.node = t.src
              JOIN deg g ON g.src = t.src
  GROUP BY t.dst)""")
    return f"""
WITH {_VECS},
{_IVF_CAND},
dir AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM cand),
scored AS (
  SELECT d.src, d.dst,
         list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm) AS cosine
  FROM dir d JOIN n x ON x.vec_id = d.src
             JOIN n y ON y.vec_id = d.dst),
edges AS MATERIALIZED (
  SELECT src, dst,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY src
             ORDER BY ROUND(cosine, 6) DESC, dst) AS INT) AS rank
  FROM scored
  QUALIFY rank <= {_KNN_GRAPH_K}),
mut AS MATERIALIZED (
  SELECT f.src AS id_a, f.dst AS id_b
  FROM edges f JOIN edges r ON r.src = f.dst AND r.dst = f.src
  WHERE f.src < f.dst),
dirs AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mut
         UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS dg FROM dirs GROUP BY src),
r0 AS (SELECT DISTINCT src AS node, 1.0 AS rank FROM dirs),
{','.join(layers)}
SELECT node, ROUND(rank, {ND}) AS rank FROM r{_PAGERANK_ITERS}
"""


_LPA_ITERS = 4
_LPA_SEED_MOD = 4


def q_sim_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation: clamp the labels of the 25%
    seeded vectors (vec_id % 4 == 0) and spread them through the
    mutual kNN graph for 4 synchronous rounds (majority vote, ties to
    the smallest label, unlabeled-neighborhood nodes keep their
    previous label). Integer votes + integer tie-breaks — no float
    ordering anywhere, so the unrolled SQL replay is exact."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.graph import label_propagation
    from nexus_spark.operators.similarity import knn_graph_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    seeds = (emb.where(F.col("vec_id") % _LPA_SEED_MOD == 0)
             .select(F.col("vec_id").alias("node"), "label"))
    edges = knn_graph_ivf(emb, k=_KNN_GRAPH_K)
    out = label_propagation(edges, seeds, iterations=_LPA_ITERS)
    return _finish(out.select("node", "label",
                              F.col("is_seed").cast("int").alias("is_seed")))


def _sql_label_propagation() -> str:
    """Unrolled synchronous LPA layers over the mutual kNN edge list
    (same graph CTEs as the pagerank oracle)."""
    # MATERIALIZED layers: DuckDB inlines plain CTEs, so a re-referenced
    # layer re-evaluates its whole prefix (the kNN-graph CTEs included).
    # The previous-label fallback is gone on both sides — provably dead
    # under monotone labels + clamped seeds (see graph.label_propagation).
    layers = []
    for i in range(1, _LPA_ITERS + 1):
        layers.append(f"""v{i} AS (
  SELECT t.dst AS node, l.label, COUNT(*) AS c
  FROM dirs t JOIN lab{i - 1} l ON l.node = t.src
  WHERE l.label IS NOT NULL
  GROUP BY t.dst, l.label),
b{i} AS (
  SELECT node, label AS vote_label FROM v{i}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node
                             ORDER BY c DESC, label ASC) = 1),
lab{i} AS MATERIALIZED (
  SELECT n.node, COALESCE(s.seed_label, b.vote_label) AS label
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
               LEFT JOIN b{i} b ON b.node = n.node)""")
    return f"""
WITH {_VECS},
{_IVF_CAND},
dir AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM cand),
scored AS (
  SELECT d.src, d.dst,
         list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm) AS cosine
  FROM dir d JOIN n x ON x.vec_id = d.src
             JOIN n y ON y.vec_id = d.dst),
edges AS MATERIALIZED (
  SELECT src, dst,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY src
             ORDER BY ROUND(cosine, 6) DESC, dst) AS INT) AS rank
  FROM scored
  QUALIFY rank <= {_KNN_GRAPH_K}),
mut AS MATERIALIZED (
  SELECT f.src AS id_a, f.dst AS id_b
  FROM edges f JOIN edges r ON r.src = f.dst AND r.dst = f.src
  WHERE f.src < f.dst),
dirs AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mut
         UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM dirs),
seeds AS MATERIALIZED (SELECT vec_id AS node, label AS seed_label
          FROM embeddings WHERE vec_id % {_LPA_SEED_MOD} = 0),
lab0 AS (SELECT n.node, s.seed_label AS label
         FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
{','.join(layers)}
SELECT l.node, l.label,
       CAST(s.seed_label IS NOT NULL AS INT) AS is_seed
FROM lab{_LPA_ITERS} l LEFT JOIN seeds s ON s.node = l.node
"""


def q_sim_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    mutual kNN graph — the structure audit before transitive dedup:
    tight communities (high clustering) collapse safely to one
    representative; a high-degree low-clustering hub is an LSH/kNN
    false-positive magnet that transitive closure would over-merge.
    Exact integer counts, so the id-ordered SQL replay is exact."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.graph import triangle_stats
    from nexus_spark.operators.similarity import knn_graph_ivf

    edges = knn_graph_ivf(load_table(spark, sf_dir, "embeddings"),
                          k=_KNN_GRAPH_K)
    return _finish(triangle_stats(edges))


def _sql_triangle_stats() -> str:
    """Oracle: id-ordered triangle enumeration (a<b<c over the mutual
    a<b edge list) — equivalent to the Spark side's degree-ordered
    compact-forward scheme, which only changes WHERE each triangle is
    counted, never the count."""
    return f"""
WITH {_VECS},
{_IVF_CAND},
dir AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM cand),
scored AS (
  SELECT d.src, d.dst,
         list_dot_product(x.vec, y.vec) / (x.nrm * y.nrm) AS cosine
  FROM dir d JOIN n x ON x.vec_id = d.src
             JOIN n y ON y.vec_id = d.dst),
edges AS MATERIALIZED (
  SELECT src, dst,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY src
             ORDER BY ROUND(cosine, 6) DESC, dst) AS INT) AS rank
  FROM scored
  QUALIFY rank <= {_KNN_GRAPH_K}),
mut AS MATERIALIZED (
  SELECT f.src AS id_a, f.dst AS id_b
  FROM edges f JOIN edges r ON r.src = f.dst AND r.dst = f.src
  WHERE f.src < f.dst),
dirs AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mut
         UNION ALL SELECT id_b AS src, id_a AS dst FROM mut),
degt AS (SELECT src AS node, COUNT(*) AS degree FROM dirs GROUP BY src),
tri AS (
  SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
  FROM mut e1
  JOIN mut e2 ON e2.id_a = e1.id_b
  JOIN mut e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
tn AS (SELECT a AS node FROM tri UNION ALL SELECT b AS node FROM tri
       UNION ALL SELECT c AS node FROM tri),
tc AS (SELECT node, COUNT(*) AS triangles FROM tn GROUP BY node)
SELECT d.node, d.degree,
       COALESCE(t.triangles, 0) AS triangles,
       ROUND(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(t.triangles, 0)
                  / (d.degree * (d.degree - 1.0))
             ELSE 0.0 END, {ND}) AS clustering
FROM degt d LEFT JOIN tc t ON t.node = d.node
"""


_PCA_ITERS = 8


def q_d_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample covariance matrix (upper triangle) of the embedding
    corpus — the d x d summary PCA/whitening/Mahalanobis scoring start
    from, computed as one corpus pass of per-Arrow-batch partial Gram
    blocks (d^2 scalars per batch on the wire, never vector-scaled
    data)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import embedding_covariance

    return _finish(embedding_covariance(
        load_table(spark, sf_dir, "embeddings")))


def _sql_embed_covariance() -> str:
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
g AS (SELECT i FROM generate_series(1, 64) t(i))
SELECT gi.i - 1 AS i, gj.i - 1 AS j,
       ROUND(COVAR_SAMP(vec[gi.i], vec[gj.i]), {ND}) AS cov
FROM v, g gi, g gj
WHERE gi.i <= gj.i
GROUP BY gi.i, gj.i
"""


def q_d_embed_pca1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principal-component score per vector (centered projection)
    — the 1-d corpus summary behind embedding drift plots and coarse
    diversity bucketing. Power iteration runs driver-side on the
    collected d x d covariance (fixed, corpus-size-independent state;
    same contract as the k-row kmeans centroids) for a FIXED iteration
    count from v0 = 1/sqrt(d), so the unrolled SQL replay performs the
    identical arithmetic; the projection itself is one JVM-side
    unrolled expression."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import pca_top_component

    return _finish(pca_top_component(
        load_table(spark, sf_dir, "embeddings"), iterations=_PCA_ITERS))


def _sql_embed_pca1() -> str:
    """Unrolled power-iteration layers (matvec + normalize per layer)
    over the full covariance CTE, then the centered projection."""
    # MATERIALIZED everywhere state is re-referenced: DuckDB inlines
    # plain CTEs, and p{{t}} reads w{{t}} twice (matvec + norm scalar
    # subquery) — inlined, that doubles the evaluation of the whole
    # prefix per layer (2^iters re-aggregations of the covariance).
    layers = []
    for t in range(1, _PCA_ITERS + 1):
        layers.append(f"""w{t} AS MATERIALIZED (
  SELECT c.i AS i, SUM(c.c * p.p) AS w
  FROM cov c JOIN p{t - 1} p ON p.i = c.j GROUP BY c.i),
p{t} AS MATERIALIZED (
  SELECT i, w / sqrt((SELECT SUM(w * w) FROM w{t})) AS p FROM w{t})""")
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
g AS (SELECT i FROM generate_series(1, 64) t(i)),
mu AS (SELECT g.i AS i, AVG(vec[g.i]) AS m FROM v, g GROUP BY g.i),
cov AS MATERIALIZED (SELECT gi.i AS i, gj.i AS j,
               COVAR_SAMP(vec[gi.i], vec[gj.i]) AS c
        FROM v, g gi, g gj GROUP BY gi.i, gj.i),
p0 AS (SELECT i, 1.0 / sqrt(64.0) AS p FROM g),
{','.join(layers)}
SELECT v.vec_id, ROUND(SUM((vec[p.i] - mu.m) * p.p), {ND}) AS pc1
FROM v, p{_PCA_ITERS} p JOIN mu ON mu.i = p.i
GROUP BY v.vec_id
"""


def q_e_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quality gate executed as a REAL stream: the near-dup
    arrival directory drains through a foreachBatch router that lands
    every row in ONE route-partitioned append (route=good passing,
    route=quarantine tagged with the failed rule names) — the
    enforcement counterpart of the batch d_expectations_audit report.
    Routing is row-level (no cross-row state), so any micro-batch
    partitioning produces the same split and the batch oracle replays
    it exactly. (r7: the two-sink commit was merged into one
    partitioned write — the r6 flat-steady item was two file commits
    per micro-batch on 10-row batches.)

    Output: route, fails, lang, n_docs."""
    import atexit
    import shutil
    import tempfile

    from pyspark.sql.types import StringType, StructField

    from nexus_spark.streaming.quality import stream_quality_gate

    feed = _staged_feed(spark, sf_dir, "neardup_feed")
    schema = spark.read.parquet(feed).schema
    rules = _GATE_RULES()  # shared with the batch d_gated_export
    work = tempfile.mkdtemp(prefix="nexus_qgate_run_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    gated, ckpt = f"{work}/gated", f"{work}/ckpt"

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    with _stream_job_conf(spark):
        q = stream_quality_gate(stream, rules, gated, ckpt)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming quality-gate drain exceeded 300s")

    # Explicit schema (feed + fails + route partition col): readable
    # even if a drain leaves one route empty.
    gschema = (schema.add(StructField("fails", StringType()))
               .add(StructField("route", StringType())))
    out = (spark.read.schema(gschema).parquet(gated)
           .groupBy("route", "fails", "lang")
           .agg(F.count(F.lit(1)).alias("n_docs")))
    return _finish(out)


def _sql_stream_quality_gate() -> str:
    """Oracle: batch replay of the row-level rule routing over the same
    feed subset (doc_id % 3 <> 0), with the identical declaration-order
    fails string (concat_ws skips NULLs in both engines)."""
    return """
WITH feed AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
r AS (SELECT lang,
             concat_ws(',',
               CASE WHEN n_chars BETWEEN 1 AND 400 THEN NULL
                    ELSE 'len_range' END,
               CASE WHEN lang IN ('de', 'en', 'es', 'fr') THEN NULL
                    ELSE 'lang_ok' END,
               CASE WHEN text IS NOT NULL AND length(text) > 0 THEN NULL
                    ELSE 'text_nonempty' END) AS fails
      FROM feed)
SELECT CASE WHEN fails = '' THEN 'good' ELSE 'quarantine' END AS route,
       fails, lang, COUNT(*) AS n_docs
FROM r GROUP BY 1, 2, 3
"""


_OUTLIER_TOP = 50


def q_d_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-QA outlier pass: top-50 vectors by diagonal
    Mahalanobis distance (sum of squared population z-scores per
    dimension) — one moment pass (2*dim sums) + one scoring pass
    against the broadcast constants, top-N via sort+limit
    (TakeOrderedAndProject, no global window)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.similarity import embedding_outliers

    return _finish(embedding_outliers(
        load_table(spark, sf_dir, "embeddings"), top_n=_OUTLIER_TOP))


def _sql_embed_outliers() -> str:
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
g AS (SELECT i FROM generate_series(1, 64) t(i)),
st AS (SELECT g.i, SUM(vec[g.i]) AS s,
              SUM(vec[g.i] * vec[g.i]) AS q, COUNT(*) AS n
       FROM v, g GROUP BY g.i),
ms AS (SELECT i, s / n AS mu, q / n - (s / n) * (s / n) AS var FROM st),
sc AS (SELECT v.vec_id,
              SUM(CASE WHEN m.var > 0.0
                  THEN (vec[m.i] - m.mu) * (vec[m.i] - m.mu) / m.var
                  ELSE 0.0 END) AS score
       FROM v, ms m GROUP BY v.vec_id)
SELECT vec_id, ROUND(score, {ND}) AS score, rank
FROM (SELECT vec_id, score,
             CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, 6) DESC,
                                     vec_id) AS INT) AS rank
      FROM sc)
WHERE rank <= {_OUTLIER_TOP}
"""


def q_d_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over three tables in four scans
    total (one aggregate pass per table + two anti-join referential
    checks): null rates, key uniqueness, value ranges, accepted sets,
    FK orphans — the validation report a lake pipeline runs after every
    ingest batch. Two checks intentionally fail on the fixture (zh
    outside the accepted lang set, n_chars above 400) so the report
    exercises both verdicts."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.validate import expectations, ref_integrity

    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    tag = lambda df, t: df.select(F.lit(t).alias("tbl"), "*")  # noqa: E731
    out = (
        tag(expectations(docs, not_null={"text": 0.0},
                         unique=["doc_id"],
                         ranges={"n_chars": (1.0, 400.0)},
                         accepted={"lang": ["de", "en", "es", "fr"]},
                         min_rows=1), "documents")
        .unionByName(tag(expectations(
            li, not_null={"l_shipdate": 0.0},
            ranges={"l_quantity": (1.0, 50.0)}), "lineitem"))
        .unionByName(tag(expectations(
            events, accepted={"event_type": ["click", "purchase",
                                             "signup", "view"]}),
            "events"))
        .unionByName(tag(ref_integrity(li, orders, "l_orderkey",
                                       "o_orderkey"), "lineitem"))
        .unionByName(tag(ref_integrity(orders, customer, "o_custkey",
                                       "c_custkey"), "orders")))
    return _finish(out)


def _sql_expectations_audit() -> str:
    return f"""
SELECT 'documents' AS tbl, 'not_null' AS "check", 'text' AS "column",
       ROUND(CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), {ND}) AS metric,
       CAST(0.0 AS DOUBLE) AS threshold,
       CAST(CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) <= 0.0 AS INT) AS ok
FROM documents
UNION ALL
SELECT 'documents', 'unique', 'doc_id',
       ROUND(CAST(COUNT(*) - SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0
                                 END) - COUNT(DISTINCT doc_id) AS DOUBLE)
             + (CASE WHEN SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                > 1 THEN SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                - 1 ELSE 0 END), {ND}),
       0.0,
       CAST((COUNT(*) - SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
             - COUNT(DISTINCT doc_id))
            + (CASE WHEN SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
               > 1 THEN SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
               - 1 ELSE 0 END) <= 0.0 AS INT)
FROM documents
UNION ALL
SELECT 'documents', 'in_range', 'n_chars',
       ROUND(CAST(SUM(CASE WHEN n_chars IS NOT NULL
                       AND (n_chars < 1.0 OR n_chars > 400.0)
                       THEN 1 ELSE 0 END) AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(SUM(CASE WHEN n_chars IS NOT NULL
                AND (n_chars < 1.0 OR n_chars > 400.0)
                THEN 1 ELSE 0 END) <= 0.0 AS INT)
FROM documents
UNION ALL
SELECT 'documents', 'accepted_values', 'lang',
       ROUND(CAST(SUM(CASE WHEN lang IS NOT NULL AND lang NOT IN
                       ('de', 'en', 'es', 'fr') THEN 1 ELSE 0 END)
                  AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(SUM(CASE WHEN lang IS NOT NULL AND lang NOT IN
                ('de', 'en', 'es', 'fr') THEN 1 ELSE 0 END) <= 0.0
            AS INT)
FROM documents
UNION ALL
SELECT 'documents', 'min_rows', '*',
       ROUND(CAST(COUNT(*) AS DOUBLE), {ND}), CAST(1.0 AS DOUBLE),
       CAST(COUNT(*) >= 1.0 AS INT)
FROM documents
UNION ALL
SELECT 'lineitem', 'not_null', 'l_shipdate',
       ROUND(CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), {ND}), CAST(0.0 AS DOUBLE),
       CAST(CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*) <= 0.0 AS INT)
FROM lineitem
UNION ALL
SELECT 'lineitem', 'in_range', 'l_quantity',
       ROUND(CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                       AND (l_quantity < 1.0 OR l_quantity > 50.0)
                       THEN 1 ELSE 0 END) AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                AND (l_quantity < 1.0 OR l_quantity > 50.0)
                THEN 1 ELSE 0 END) <= 0.0 AS INT)
FROM lineitem
UNION ALL
SELECT 'events', 'accepted_values', 'event_type',
       ROUND(CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type
                       NOT IN ('click', 'purchase', 'signup', 'view')
                       THEN 1 ELSE 0 END) AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type
                NOT IN ('click', 'purchase', 'signup', 'view')
                THEN 1 ELSE 0 END) <= 0.0 AS INT)
FROM events
UNION ALL
SELECT 'lineitem', 'ref_integrity', 'l_orderkey',
       ROUND(CAST(COUNT(*) AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(COUNT(*) <= 0.0 AS INT)
FROM lineitem l
WHERE l.l_orderkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders', 'ref_integrity', 'o_custkey',
       ROUND(CAST(COUNT(*) AS DOUBLE), {ND}), CAST(0.0 AS DOUBLE),
       CAST(COUNT(*) <= 0.0 AS INT)
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
"""


_ANOM_MIN_Z = 2.0


def q_e_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomalies per event type (|z| >= 2 hours of the
    per-type hourly count distribution) — the ingest-ledger monitoring
    pass. One map-side-combined count + one window whose state is
    hours-per-type rows (bounded by the time range, not the volume)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.sql_surface import anomaly_zscore

    return _finish(anomaly_zscore(load_table(spark, sf_dir, "events"),
                                  min_abs_z=_ANOM_MIN_Z))


SQL_E_ANOMALY_ZSCORE = f"""
WITH h AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hr, COUNT(*) AS ev_cnt
  FROM events GROUP BY 1, 2),
s AS (
  SELECT event_type, hr, ev_cnt,
         (ev_cnt - AVG(ev_cnt) OVER (PARTITION BY event_type))
           / STDDEV_SAMP(ev_cnt) OVER (PARTITION BY event_type) AS z
  FROM h)
SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS w_start,
       ev_cnt, ROUND(z, {ND}) AS z
FROM s WHERE ABS(z) >= {_ANOM_MIN_Z}
"""


_JSONL_STAGE: dict[tuple, str] = {}


def q_d_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL interchange round-trip: export documents as gzip JSONL
    shards (sources/corpus.py — the de-facto LLM-corpus wire format),
    read them back schema-ENFORCED (no inference scan), aggregate per
    (source, lang). The oracle aggregates the ORIGINAL parquet, so any
    serialization loss (escaping, unicode, null handling) breaks the
    distinct-content-hash match. Export memoized per sf_dir (write-time
    state, same policy as the stream feeds/vector indexes); gzip shard
    count = read parallelism, set explicitly at write."""
    import atexit
    import os
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.sources.corpus import (clean, read_jsonl,
                                            write_jsonl_shards)

    docs = load_table(spark, sf_dir, "documents")
    path = _JSONL_STAGE.get((sf_dir,))
    if path is None or not os.path.isdir(path):
        base = tempfile.mkdtemp(prefix="nexus_jsonl_")
        path = f"{base}/docs"
        write_jsonl_shards(docs, path, n_shards=8)
        _JSONL_STAGE[(sf_dir,)] = path
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    back = clean(read_jsonl(spark, path))
    return _finish(
        back.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.count_distinct(F.md5("text")).alias("n_distinct_texts")))


SQL_D_JSONL_ROUNDTRIP = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts
FROM documents GROUP BY source, lang
"""


def q_e_stream_lake_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE INTO as a REAL executed stream, MERGE-ON-READ
    (round 9): a 4-file CDC arrival directory (upserts/tombstones/
    inserts over documents) drains through foreachBatch; each commit
    appends ONLY its micro-batch as a delta — O(batch), independent of
    the table and of the batch's key spread — and every compact_every
    commits fold base ∪ pending deltas into a new base snapshot. The
    live view resolves latest-change-wins with TOMBSTONES RETAINED, so
    a late-arriving lower-seq update can never resurrect a deleted key
    and any micro-batch partitioning converges to the same state.

    Oracle-checkable for exactly that reason: the batch replay (global
    latest-wins over base ∪ all changes) computes the identical final
    table. compact_every=3 on a 4-batch feed makes the driver row
    exercise BOTH paths: one fold commit (d0-d2 → base) and one
    merge-on-read final view (base ∪ d3). Exercises source discovery,
    the delta commit log, fold + covered-delta retention and the
    exactly-once checkpoint end-to-end.

    Output: doc_id, source, content_hash of the live post-merge state."""
    import atexit
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.streaming.ingest import (read_cdc_state,
                                              stream_cdc_apply)

    feed = _staged_feed(spark, sf_dir, "cdc_feed")
    schema = spark.read.parquet(feed).schema

    work = tempfile.mkdtemp(prefix="nexus_cdc_run_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    state_dir, ckpt = f"{work}/state", f"{work}/ckpt"

    docs = load_table(spark, sf_dir, "documents")
    (docs.withColumn("seq", F.lit(0)).withColumn("op", F.lit("U"))
     .select(*[f.name for f in schema.fields])
     .write.mode("overwrite").parquet(state_dir))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(feed))
    with _stream_job_conf(spark):
        q = stream_cdc_apply(stream, state_dir, ckpt, ["doc_id"],
                             compact_every=3)
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming CDC drain exceeded 300s")

    final = read_cdc_state(spark, state_dir)
    return _finish(final.select(
        "doc_id", "source", F.md5("text").alias("content_hash")))


SQL_E_STREAM_LAKE_UPSERT = f"""
WITH ch AS (
  SELECT doc_id, upper(text) AS text, source, 1 AS seq, 'U' AS op
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id, text, source, 2 AS seq, 'D' AS op
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + {_MERGE_NEW_OFFSET} AS doc_id, text, source,
         1 AS seq, 'U' AS op
  FROM documents WHERE doc_id % 6 = 0),
unioned AS (
  SELECT doc_id, text, source, 0 AS seq, 'U' AS op FROM documents
  UNION ALL
  SELECT doc_id, text, source, seq, op FROM ch),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY seq DESC) AS rn
  FROM unioned)
SELECT doc_id, source, md5(text) AS content_hash
FROM ranked WHERE rn = 1 AND op <> 'D'
"""


# --------------------------------------------------------------------------
# round 8: interval operators, pivot/cumulative SQL surface, perplexity
# buckets, dedup survivorship, streaming as-of enrichment
# --------------------------------------------------------------------------

_RJ_BIN_S = 3600          # range-join bin width (s)
_IU_DAYS = 7              # interval-union window length per order
_PPL_T1, _PPL_T2 = 29.0, 30.0   # fixed CCNet-style ppl bucket cuts
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_SQL_SESSION_CTES = f"""
b AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) IS NULL
              OR FLOOR(epoch(ts)) - FLOOR(epoch(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id))) > 1800
              THEN 1 ELSE 0 END AS is_break
  FROM events),
s AS (
  SELECT *, CAST(SUM(is_break) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
            AS session_seq
  FROM b),
g AS (SELECT user_id, session_seq, MIN(ts) AS st, MAX(ts) AS en
      FROM s GROUP BY user_id, session_seq)
"""


def q_t_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic keyed interval-overlap join (operators/range_join.py):
    every error event is attributed to the enclosing 30-min-gap session
    of the same user. The Spark plan is the BINNED formulation — the
    interval side explodes to its covered hour bins and the join is a
    plain (key, bin) equi-join with an exact range post-filter — so no
    per-key point x interval pair blow-up ever materializes; the oracle
    is DuckDB's native inequality join over the identical session CTE,
    two independent algorithms checking the same semantics."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.range_join import range_join
    from nexus_spark.operators.sql_surface import sessionize

    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize(ev).select(
        "user_id", "session_seq", "session_start", "session_end")
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("error_id"), "ts")
    out = range_join(errors, sessions, ["user_id"], "ts",
                     "session_start", "session_end",
                     bin_seconds=_RJ_BIN_S)
    return _finish(out.select("user_id", "error_id", "ts", "session_seq",
                              "session_start", "session_end"))


SQL_T_RANGE_JOIN = _with(_SQL_SESSION_CTES.strip()) + """,
p AS (SELECT user_id, event_id AS error_id, ts FROM events
      WHERE event_type = 'error')
SELECT p.user_id, p.error_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       g.session_seq,
       strftime(g.st, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(g.en, '%Y-%m-%d %H:%M:%S') AS session_end
FROM p JOIN g ON p.user_id = g.user_id AND p.ts BETWEEN g.st AND g.en
"""


def q_t_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union / island merge (operators/range_join.py): each
    customer's 7-day post-order windows merged into contiguous coverage
    islands — one windowed running-max pass per key, the coverage-report
    primitive (on-call rosters, SLA windows, validity periods)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.range_join import interval_union

    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey", F.col("o_orderdate").alias("w_start"),
        F.expr(f"o_orderdate + INTERVAL {_IU_DAYS} DAYS").alias("w_end"))
    return _finish(interval_union(iv, ["o_custkey"], "w_start", "w_end"))


SQL_T_INTERVAL_UNION = f"""
WITH iv AS (SELECT o_custkey, o_orderdate AS s,
                   o_orderdate + INTERVAL {_IU_DAYS} DAY AS e
            FROM orders),
b AS (
  SELECT *, CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                 THEN 1 ELSE 0 END AS brk
  FROM iv
  WINDOW w AS (PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
r AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY o_custkey ORDER BY s, e
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM b)
SELECT o_custkey, island,
       strftime(MIN(s), '%Y-%m-%d %H:%M:%S') AS island_start,
       strftime(MAX(e), '%Y-%m-%d %H:%M:%S') AS island_end,
       COUNT(*) AS n_intervals
FROM r GROUP BY o_custkey, island
"""


def q_sql_pivot_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational pivot: monthly event counts spread into one column
    per event type (groupBy().pivot() with EXPLICIT values — no extra
    distinct-scan job, stable column order). Missing cells coalesce to
    0 to match the oracle's FILTER counts."""
    from nexus_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    m = ev.withColumn(
        "month",
        F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM"))
    out = (m.groupBy("month").pivot("event_type", list(_EVENT_TYPES))
           .agg(F.count(F.lit(1))))
    return _finish(out.select(
        "month", *[F.coalesce(F.col(t), F.lit(0)).alias(t)
                   for t in _EVENT_TYPES]))


SQL_PIVOT_MONTHLY = """
SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY 1
"""


def q_sql_cumulative_revenue(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """Running-total window surface: monthly order revenue with a
    cumulative sum and cumulative share of total. The global running
    window is a single-partition window over the MONTHLY aggregate
    (tens of rows at any corpus scale — the reduction happened in the
    map-side-combined groupBy, so the unpartitioned window is safe by
    construction)."""
    from nexus_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    m = (o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                                 "yyyy-MM").alias("month"))
         .agg(F.sum("o_totalprice").alias("rev_raw"),
              F.count(F.lit(1)).alias("n_orders")))
    # Accumulate in DECIMAL, not double: the cumulative sum reaches
    # ~1e9+ where the 6-decimal hash granularity sits below the double
    # ulp, and windowed sums don't even fix an addition order (DuckDB's
    # running aggregate is a segment tree). Rounding each month's rev
    # to decimal(38,6) and summing decimals makes the accumulation
    # EXACT on both engines; the share division happens double/double
    # at ~O(1) magnitude where round-6 is safe.
    m = m.select(
        "month", "n_orders",
        F.round(F.col("rev_raw").cast("decimal(38,7)"), ND).alias("rev"))
    run = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0)
    full = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return _finish(m.select(
        "month", "n_orders", F.col("rev").cast("double").alias("rev"),
        F.sum("rev").over(run).cast("double").alias("cum_rev"),
        (F.sum("rev").over(run).cast("double")
         / F.sum("rev").over(full).cast("double")).alias("cum_share")))


SQL_CUMULATIVE_REVENUE = f"""
WITH m AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         CAST(ROUND(SUM(o_totalprice), {ND}) AS DECIMAL(38,6)) AS rev,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT month, n_orders, CAST(rev AS DOUBLE) AS rev,
       CAST(SUM(rev) OVER w AS DOUBLE) AS cum_rev,
       ROUND(CAST(SUM(rev) OVER w AS DOUBLE)
             / CAST(SUM(rev) OVER () AS DOUBLE), {ND}) AS cum_share
FROM m
WINDOW w AS (ORDER BY month ROWS UNBOUNDED PRECEDING)
"""


def q_text_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: every document scored by the
    corpus-fit bigram LM (text.bigram_nll), assigned head/middle/tail
    by FIXED ppl cuts, rolled up per (lang, bucket). Fixed thresholds
    (not ntile) keep the bucket boundary independent of cross-engine
    float ordering; the boundary test uses the same decimal round-6
    as every hashed float."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.text import bigram_nll

    docs = load_table(spark, sf_dir, "documents")
    ppl = bigram_nll(docs).select("doc_id", "ppl")
    r = F.round(F.col("ppl").cast("decimal(38,7)"), ND).cast("double")
    bucket = (F.when(r <= _PPL_T1, "head")
              .when(r <= _PPL_T2, "middle").otherwise("tail"))
    j = (ppl.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
         .withColumn("bucket", bucket))
    return _finish(j.groupBy("lang", "bucket")
                   .agg(F.count(F.lit(1)).alias("n_docs"),
                        F.avg("ppl").alias("avg_ppl"),
                        F.avg("n_chars").alias("avg_chars")))


SQL_TEXT_PPL_BUCKETS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS words
           FROM documents WHERE len(string_split(text, ' ')) >= 2),
big AS (
  SELECT doc_id, words[i] AS prev, words[i + 1] AS cur
  FROM d, LATERAL unnest(generate_series(1, len(words) - 1)) AS t(i)),
cb AS (SELECT prev, cur, COUNT(*) AS c_bc FROM big GROUP BY prev, cur),
cu AS (SELECT prev, SUM(c_bc) AS c_b FROM cb GROUP BY prev),
sc AS (SELECT doc_id, -ln(CAST(c_bc AS DOUBLE) / c_b) AS nl
       FROM big JOIN cb USING (prev, cur) JOIN cu USING (prev)),
pp AS (SELECT doc_id, EXP(AVG(nl)) AS ppl FROM sc GROUP BY doc_id),
bk AS (
  SELECT doc_id, ppl,
         CASE WHEN ROUND(ppl, {ND}) <= {_PPL_T1} THEN 'head'
              WHEN ROUND(ppl, {ND}) <= {_PPL_T2} THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM pp)
SELECT doc.lang, bk.bucket, COUNT(*) AS n_docs,
       ROUND(AVG(bk.ppl), {ND}) AS avg_ppl,
       ROUND(AVG(doc.n_chars), {ND}) AS avg_chars
FROM bk JOIN documents doc USING (doc_id)
GROUP BY doc.lang, bk.bucket
"""


def q_d_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster survivorship: the canonical (keep-the-best) document per
    near-dup cluster, chosen by (n_chars DESC, doc_id ASC) — the step
    after cluster resolution that decides which member ships to the
    training mix (dedup.canonical_survivors: one id-equi join + one
    max_by aggregate, no window)."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.dedup import (canonical_survivors,
                                             connected_components,
                                             ngram_jaccard_pairs)

    docs = load_table(spark, sf_dir, "documents")
    comps = connected_components(
        ngram_jaccard_pairs(docs, threshold=_JACCARD_T), docs)
    return _finish(canonical_survivors(comps, docs))


SQL_D_CANONICAL = _SQL_CC_CTES + """,
j AS (SELECT c.component, c.doc_id, d.n_chars
      FROM comp c JOIN documents d USING (doc_id)),
ag AS (SELECT component, COUNT(*) AS n_members,
              MAX(n_chars) AS canonical_n_chars
       FROM j GROUP BY component),
wn AS (SELECT component, doc_id AS canonical_id FROM j
       QUALIFY ROW_NUMBER() OVER (PARTITION BY component
               ORDER BY n_chars DESC, doc_id ASC) = 1)
SELECT ag.component, wn.canonical_id, ag.canonical_n_chars, ag.n_members
FROM ag JOIN wn USING (component)
"""


def q_t_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided NEAREST-in-time join (operators/asof.asof_nearest):
    every purchase picks the user's closest click in EITHER direction
    within 2h — sensor-alignment semantics. One shuffle, two
    in-partition sorts (backward + forward carry), ties resolve to the
    earlier right row. Oracle composes DuckDB's native ASOF in both
    directions and replays the pick."""
    from nexus_spark.catalog import load_table
    from nexus_spark.operators.asof import asof_nearest

    ev = load_table(spark, sf_dir, "events")
    right = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("click_id")))
    left = (ev.where(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    "ts"))
    return _finish(asof_nearest(left, right, ["user_id"], "ts",
                                ["click_id"], tolerance_s=_ASOF_TOL_S))


SQL_T_ASOF_NEAREST = f"""
WITH r AS (SELECT user_id, ts, MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
l AS (SELECT user_id, event_id AS purchase_id, ts
      FROM events WHERE event_type = 'purchase'),
jb AS (SELECT l.user_id, l.ts, l.purchase_id,
              r.click_id AS b_click, r.ts AS bt
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.ts >= r.ts),
jf AS (SELECT l.user_id, l.ts, l.purchase_id,
              r.click_id AS f_click, r.ts AS ft
       FROM l ASOF LEFT JOIN r
         ON l.user_id = r.user_id AND l.ts <= r.ts),
j AS (SELECT jb.user_id, jb.ts, jb.purchase_id,
             jb.b_click, jb.bt, jf.f_click, jf.ft
      FROM jb JOIN jf USING (user_id, ts, purchase_id)),
p AS (SELECT *,
        bt IS NOT NULL
          AND FLOOR(epoch(ts)) - FLOOR(epoch(bt)) <= {_ASOF_TOL_S}
          AS b_ok,
        ft IS NOT NULL
          AND FLOOR(epoch(ft)) - FLOOR(epoch(ts)) <= {_ASOF_TOL_S}
          AS f_ok,
        FLOOR(epoch(ts)) - FLOOR(epoch(bt)) AS dtb,
        FLOOR(epoch(ft)) - FLOOR(epoch(ts)) AS dtf
      FROM j)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, purchase_id,
       CASE WHEN b_ok AND (NOT f_ok OR dtb <= dtf) THEN b_click
            WHEN f_ok THEN f_click END AS click_id,
       CASE WHEN b_ok AND (NOT f_ok OR dtb <= dtf)
              THEN strftime(bt, '%Y-%m-%d %H:%M:%S')
            WHEN f_ok THEN strftime(ft, '%Y-%m-%d %H:%M:%S') END
         AS nearest_ts
FROM p
"""


def q_sql_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame rolling window: 7-day rolling revenue over the daily
    order aggregate (rangeBetween on epoch seconds — the time-frame
    window feature, distinct from every ROWS frame in the registry).
    The global window runs over the DAILY aggregate (thousands of rows
    at any corpus scale — the reduction happened in the
    map-side-combined groupBy). Revenue accumulates in DECIMAL for the
    same cross-engine exactness as sql_cumulative_revenue."""
    from nexus_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    m = (o.groupBy(F.date_format(F.date_trunc("day", "o_orderdate"),
                                 "yyyy-MM-dd").alias("day"))
         .agg(F.sum("o_totalprice").alias("rev_raw"),
              F.count(F.lit(1)).alias("n_orders")))
    m = m.select(
        "day", "n_orders",
        F.round(F.col("rev_raw").cast("decimal(38,7)"), ND).alias("rev"))
    w = (Window.orderBy(F.to_date("day").cast("timestamp").cast("long"))
         .rangeBetween(-6 * 86400, 0))
    return _finish(m.select(
        "day", "n_orders", F.col("rev").cast("double").alias("rev"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("n_days_7d")))


SQL_ROLLING_REVENUE = f"""
WITH m AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(ROUND(SUM(o_totalprice), {ND}) AS DECIMAL(38,6)) AS rev,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT strftime(d, '%Y-%m-%d') AS day, n_orders,
       CAST(rev AS DOUBLE) AS rev,
       CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
       COUNT(*) OVER w AS n_days_7d
FROM m
WINDOW w AS (ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
"""


_HIST_LO, _HIST_HI, _HIST_NBINS = 0.0, 500.0, 25


def q_sql_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram with DENSIFIED buckets: every bin in
    [lo, hi) appears even when empty (the reporting contract a chart
    needs), out-of-range values clamp into the edge bins. One map-side-
    combined aggregate; the empty-bucket frame explodes from a literal
    sequence (no data scan) and left-joins the counts — bin-count-
    bounded, never data-bounded."""
    from nexus_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    width = (_HIST_HI - _HIST_LO) / _HIST_NBINS
    bin_ = F.least(F.lit(_HIST_NBINS - 1), F.greatest(F.lit(0), F.floor(
        (F.col("value") - F.lit(_HIST_LO)) / F.lit(width)))).cast("int")
    counts = (ev.where(F.col("value").isNotNull())
              .groupBy(bin_.alias("bin"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("value").alias("v_sum")))
    bins = spark.range(_HIST_NBINS).select(F.col("id").cast("int")
                                           .alias("bin"))
    return _finish(
        bins.join(counts, "bin", "left")
        .select("bin",
                (F.lit(_HIST_LO) + F.col("bin") * F.lit(width))
                .alias("bin_lo"),
                F.coalesce(F.col("n"), F.lit(0)).alias("n"),
                F.coalesce(F.col("v_sum"), F.lit(0.0)).alias("v_sum")))


SQL_VALUE_HISTOGRAM = f"""
WITH c AS (
  SELECT LEAST({_HIST_NBINS - 1}, GREATEST(0, CAST(FLOOR(
           (value - {_HIST_LO}) / {(_HIST_HI - _HIST_LO) / _HIST_NBINS})
           AS INT))) AS bin,
         COUNT(*) AS n, SUM(value) AS v_sum
  FROM events WHERE value IS NOT NULL GROUP BY 1)
SELECT b.bin,
       CAST({_HIST_LO} + b.bin * {(_HIST_HI - _HIST_LO) / _HIST_NBINS}
            AS DOUBLE) AS bin_lo,
       COALESCE(c.n, 0) AS n,
       ROUND(COALESCE(c.v_sum, 0.0), {ND}) AS v_sum
FROM (SELECT CAST(i AS INT) AS bin
      FROM unnest(generate_series(0, {_HIST_NBINS - 1})) AS t(i)) b
LEFT JOIN c USING (bin)
"""


def q_t_interval_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downtime report: the GAPS between a key's coverage islands
    (interval_union composed with one lag window) — the complement view
    an SLA/on-call audit reads. Gap rows exist only between consecutive
    islands; single-island keys produce none."""
    from pyspark.sql import Window as W

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.range_join import interval_union

    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey", F.col("o_orderdate").alias("w_start"),
        F.expr(f"o_orderdate + INTERVAL {_IU_DAYS} DAYS").alias("w_end"))
    isl = interval_union(iv, ["o_custkey"], "w_start", "w_end")
    w = W.partitionBy("o_custkey").orderBy("island")
    prev_end = F.lag("island_end").over(w)
    return _finish(
        isl.withColumn("gap_start", prev_end)
        .where(F.col("gap_start").isNotNull())
        .select("o_custkey",
                (F.col("island") - 1).alias("after_island"),
                "gap_start",
                F.col("island_start").alias("gap_end"),
                ((F.col("island_start").cast("timestamp").cast("long")
                  - F.col("gap_start").cast("timestamp").cast("long"))
                 / F.lit(86400.0)).alias("gap_days")))


SQL_T_INTERVAL_GAPS = f"""
WITH iv AS (SELECT o_custkey, o_orderdate AS s,
                   o_orderdate + INTERVAL {_IU_DAYS} DAY AS e
            FROM orders),
b AS (
  SELECT *, CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                 THEN 1 ELSE 0 END AS brk
  FROM iv
  WINDOW w AS (PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
r AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY o_custkey ORDER BY s, e
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM b),
g AS (SELECT o_custkey, island, MIN(s) AS island_start,
             MAX(e) AS island_end
      FROM r GROUP BY o_custkey, island),
lagged AS (
  SELECT *, LAG(island_end) OVER (PARTITION BY o_custkey
                                  ORDER BY island) AS gap_start
  FROM g)
SELECT o_custkey, island - 1 AS after_island,
       strftime(gap_start, '%Y-%m-%d %H:%M:%S') AS gap_start,
       strftime(island_start, '%Y-%m-%d %H:%M:%S') AS gap_end,
       ROUND((FLOOR(epoch(island_start)) - FLOOR(epoch(gap_start)))
             / 86400.0, {ND}) AS gap_days
FROM lagged WHERE gap_start IS NOT NULL
"""


def q_e_stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time AS-OF enrichment as a REAL executed stream: error
    events arrive as a 4-file feed and every micro-batch is enriched with
    the user's most recent click at-or-before it (operators/asof.py
    against the static click-state snapshot), landing in a parquet
    sink. As-of against a fixed right side is per-row deterministic, so
    the drained sink must equal the batch replay — the oracle is
    DuckDB's native ASOF LEFT JOIN over the same feed cut."""
    import atexit
    import shutil
    import tempfile

    from nexus_spark.catalog import load_table
    from nexus_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    right = (ev.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("click_id")))

    feed = _staged_feed(spark, sf_dir, "error_feed")
    schema = spark.read.parquet(feed).schema
    work = tempfile.mkdtemp(prefix="nexus_asof_enrich_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)

    def step(batch_df, _batch_id):
        out = asof_join(batch_df, right, ["user_id"], "ts",
                        ["click_id"], tolerance_s=_ASOF_TOL_S)
        out.write.mode("append").parquet(f"{work}/out")

    # Pin the read-back schema (asof_join output on a zero-row batch):
    # an empty error-feed cut drains nothing, leaving only
    # _spark_metadata in the sink, and schema inference would raise
    # 'Unable to infer schema' — same failure mode the streaming-matchup
    # read-back fixed in round 8.
    out_schema = asof_join(
        spark.read.schema(schema).parquet(feed).limit(0), right,
        ["user_id"], "ts", ["click_id"], tolerance_s=_ASOF_TOL_S).schema

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2).parquet(feed))
    with _stream_job_conf(spark):
        q = (stream.writeStream.foreachBatch(step)
             .option("checkpointLocation", f"{work}/ckpt")
             .trigger(availableNow=True).start())
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("streaming as-of drain exceeded 300s")
    return _finish(spark.read.schema(out_schema)
                   .parquet(f"{work}/out").select(
        "user_id", "error_id", "ts", "click_id", "asof_ts"))


SQL_E_STREAM_ASOF = f"""
WITH r AS (SELECT user_id, ts, MAX(event_id) AS click_id
           FROM events WHERE event_type = 'click' GROUP BY 1, 2),
l AS (SELECT user_id, event_id AS error_id, ts
      FROM events WHERE event_type = 'error'),
j AS (SELECT l.user_id, l.ts, l.error_id, r.click_id, r.ts AS rts
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts),
t AS (SELECT *,
             rts IS NOT NULL AND FLOOR(epoch(ts)) - FLOOR(epoch(rts))
               <= {_ASOF_TOL_S} AS in_tol
      FROM j)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, error_id,
       CASE WHEN in_tol THEN click_id END AS click_id,
       CASE WHEN in_tol THEN strftime(rts, '%Y-%m-%d %H:%M:%S') END
         AS asof_ts
FROM t
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Dict order matters: the driver's correctness sweep checks the FIRST 50
# entries. STANDING ROTATION INVARIANT (per-round, oldest-checked first):
#   1. every entry whose latest driver row is >= 2 rounds old leads the
#      window, so no query is ever more than 1 round stale;
#   2. then queries that are NEW or whose implementation CHANGED this
#      round (they need a fresh row against the regenerated testdata);
#   3. the window is padded with last-round-checked entries; the
#      displaced tail (all checked last round) is next round's group 1.
# Rule 2 is MECHANIZED since round 13: tests/test_rotation_honesty.py
# hash-compares every query's implementation (q_ function + entry-module
# closure + directly imported nexus_spark modules, comment/docstring-
# insensitive) against the previous round's final commit (pinned in
# tests/rotation_baseline.json) and fails if a changed query is outside
# the first 50.
# Round 14 layout: group A (8) = the r13-changed rows the r13 driver
# window never saw (r13 verdict ask #1); group B (26) = every consumer
# of the modules round 14 touches (operators/dedup.py 20 rows,
# matchup/streaming-matchup, etl, correlation, the nb-confusion entry
# edit); group C (16) = stalest-first pad (3 r09 + 13 r10 rows). The
# remaining 21 r10-checked rows queue at the tail head for round 15.
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- ROUND-14 WINDOW (first 50) ---
    # group A (8): rows whose implementation changed in round 13 but
    # sat OUTSIDE that round's 50-seat driver window (builder-verified
    # only — the r13 verdict's ask #1 names exactly these): they lead
    # so CORRECTNESS_r14 finally gives them a driver row. ---
    "text_unigram_nll": q_text_unigram_nll,
    "text_bigram_nll": q_text_bigram_nll,
    "text_ppl_buckets": q_text_ppl_buckets,
    "d_gated_export": q_d_gated_export,
    "d_embed_covariance": q_d_embed_covariance,
    "d_embed_pca1": q_d_embed_pca1,
    "a4_corr_grid": q_a4_corr_grid,
    "s8_matchup": q_s8_matchup,
    # group B (26): implementation CHANGED in round 14 (rotation rule
    # 2, mechanized by tests/test_rotation_honesty.py): the dedup
    # pair-stage + incremental_near_dup build-side edits re-window
    # every operators/dedup.py consumer; the streaming-matchup size
    # guard re-windows the matchup family; plus the etl_regrid /
    # corr-map conditioning / nb-confusion rows touched this round. ---
    "d_near_dup_embedding": q_d_near_dup_embedding,
    "d_contamination": q_d_contamination,
    "d_dedup_ngram_jaccard": q_d_ngram_jaccard,
    "d_dedup_minhash_md5": q_d_minhash_md5,
    "d_dedup_simhash_md5": q_d_simhash_md5,
    "d_dedup_lsh_xx_parity": q_d_lsh_xx_parity,
    "d_dedup_winnow": q_d_dedup_winnow,
    "d_dedup_minhash_lsh": q_d_minhash_lsh,
    "e_stream_near_dup": q_e_stream_near_dup,
    "d_dedup_containment": q_d_dedup_containment,
    "d_dedup_components": q_d_dedup_components,
    "d_cluster_stats": q_d_cluster_stats,
    "d_semantic_dedup": q_d_semantic_dedup,
    "d_dedup_canonical": q_d_dedup_canonical,
    "d_dedup_simhash_xx_recall": q_d_simhash_xx_recall,
    "d_near_dup_embedding_ivf": q_d_near_dup_ivf,
    "a2_tiled_lake_pruned": q_a2_tiled_lake,
    "d_dedup_exact": q_d_dedup_exact,
    "d_dedup_simhash": q_d_simhash,
    "d_near_dup_embedding_gemm": q_d_near_dup_gemm,
    "s8_matchup_once": q_s8_matchup_once,
    "e_stream_matchup": q_e_stream_matchup,
    "etl_regrid": q_etl_regrid,
    "etl_transforms": q_etl_transforms,
    "s4_corr_map": q_s4_corr_map,
    "text_nb_confusion": q_text_nb_confusion,
    # group C (16): stalest-first pad (rotation rule 1): the 3
    # r09-checked rows that yielded their seats to r13's group B2,
    # then the 13 longest-waiting r10-checked rows in registry order. ---
    "a10_dataset_list": q_a10_dataset_list,
    "t_asof_doy": q_t_asof_doy,
    "f_lowpass": q_f_lowpass,
    "sim_knn_bruteforce": q_sim_knn,
    "d_stratified_sample": q_d_stratified_sample,
    "e_sliding_events": q_e_sliding_events,
    "f_seasonal_filter": q_f_seasonal,
    "sql_quantiles": q_sql_quantiles,
    "sql_json_extract": q_sql_json,
    "sql_distinct_counts": q_sql_distinct,
    "g_gaussian_interp_offgrid": q_gauss_interp_offgrid,
    "d_curation_pipeline": q_d_curation_pipeline,
    "d_sample_exact_n": q_d_sample_exact_n,
    "d_token_packing": q_d_token_packing,
    "s1_time_series_compare": q_s1_compare,
    "sim_ann_pq": q_sim_ann_pq,
    # --- tail (entry 51+): rotates in for round 15, stalest first.
    # 21 r10-checked rows remain ahead of the r11/r12 cohorts; they
    # MUST lead round 15's window (they will be the registry's
    # deepest staleness after this round). ---
    "a2_stats_from_summary": q_a2_stats_from_summary,
    "s1_time_series": q_s1_time_series,
    "sim_ann_ivf": q_sim_ann_ivf,
    "d_corpus_mix": q_d_corpus_mix,
    "doms_list": q_doms_list,
    "s1_polygon_time_series": q_s1_polygon,
    "s2_time_avg_map": q_s2_time_avg_map,
    "s5_hofmoeller_lat": q_s5_hofmoeller_lat,
    "a5_lonlat_map": q_a5_lonlat_map,
    "a7_data_in_bounds": q_a7_data_in_bounds,
    "s7_daily_difference": q_s7_daily_difference,
    "a8_nearest_value": q_a8_nearest_value,
    "t_tiles_in_box": q_t_tiles_in_box,
    "d_embed_outliers": q_d_embed_outliers,
    "d8_insitu_subset": q_d8_insitu_subset,
    "sim_knn_graph": q_sim_knn_graph,
    "d_kmeans_round": q_d_kmeans_round,
    "f_lowpass_checked": q_f_lowpass_checked,
    "sim_ann_recall_at_k": q_sim_ann_recall,
    "d_topic_clusters": q_d_topic_clusters,
    "sim_ann_ivf_pq": q_sim_ann_ivf_pq,
    "scrub_span_dedup": q_scrub_span_dedup,
    "scrub_span_dedup_md5_parity": q_scrub_span_md5_parity,
    "scrub_span_apply": q_scrub_span_apply,
    "scrub_cross_contamination": q_scrub_cross_contamination,
    "scrub_decontaminate": q_scrub_decontaminate,
    "scrub_pii": q_scrub_pii,
    "scrub_repetition": q_scrub_repetition,
    "sim_pq_recall_at_k": q_sim_pq_recall,
    "text_gopher_quality": q_text_gopher_quality,
    "sim_mmr_select": q_sim_mmr_select,
    "text_hash_embed": q_text_hash_embed,
    "sim_hash_embed_knn": q_sim_hash_embed_knn,
    "sql_grouping_sets": q_sql_grouping_sets,
    "d_quality_funnel": q_d_quality_funnel,
    "d_lake_merge_upsert": q_d_lake_merge_upsert,
    "g_gaussian_interp": q_gauss_interp,
    "text_nb_classifier": q_text_nb_classifier,
    "clim_nday": q_clim_nday,
    "s3_clim_map": q_s3_clim_map,
    "text_stats": q_text_stats,
    "d_temperature_mix": q_d_temperature_mix,
    "d_export_pipeline": q_d_export_pipeline,
    "text_bm25_topk": q_text_bm25,
    "sim_hybrid_rrf": q_sim_hybrid_rrf,
    "sim_ann_lsh": q_sim_ann_lsh,
    "sql_retention_cohorts": q_sql_retention_cohorts,
    "e_anomaly_zscore": q_e_anomaly_zscore,
    "d_jsonl_roundtrip": q_d_jsonl_roundtrip,
    "d_expectations_audit": q_d_expectations_audit,
    "sql_salted_hot_key": q_sql_salted_hot_key,
    "sketch_profile": q_sketch_profile,
    "m_multimodal_metadata": q_m_metadata,
    "warc_ingest": q_warc_ingest,
    "m_frame_sample": q_m_frame_sample,
    "m_resize_features": q_m_resize_features,
    "m_resample_audio": q_m_resample_audio,
    "sim_filtered_knn": q_sim_filtered_knn,
    "m_multimodal_features": q_m_features,
    "corpus_drift_psi": q_corpus_drift,
    "sql_pricing_summary": q_sql_pricing,
    "sql_shipping_priority": q_sql_shipping,
    "sql_regional_revenue": q_sql_regional,
    "sql_anti_join": q_sql_anti,
    "sql_sessionize": q_sql_sessionize,
    "clim_pixel_stats": q_pixel_stats,
    "text_bpe_tokenize": q_text_bpe_tokenize,
    "text_bpe_learn": q_text_bpe_learn,
    "g_spatial_smooth": q_spatial_smooth,
    "f_hof_deseason": q_f_hof_deseason,
    "s6_hofmoeller_lon": q_s6_hofmoeller_lon,
    "t_days_in_range": q_t_days_in_range,
    "t_distinct_bboxes": q_t_distinct_bboxes,
    "sql_topk_per_group": q_sql_topk,
    "sql_rollup": q_sql_rollup,
    "sql_hourly_events": q_sql_hourly_events,
    "text_bpe_tokens": q_text_bpe_tokens,
    "d_chunking": q_d_chunking,
    "text_vocab_oov": q_text_vocab_oov,
    "d_shuffle_shards": q_d_shuffle_shards,
    "sim_quantize_int8": q_sim_quantize_int8,
    "t_range_join": q_t_range_join,
    "t_interval_union": q_t_interval_union,
    "sql_pivot_monthly": q_sql_pivot_monthly,
    "sql_cumulative_revenue": q_sql_cumulative_revenue,
    "t_asof_nearest": q_t_asof_nearest,
    "sql_rolling_revenue": q_sql_rolling_revenue,
    "sql_value_histogram": q_sql_value_histogram,
    "t_interval_gaps": q_t_interval_gaps,
    "t_asof_events": q_t_asof_events,
    "sim_quantize_binary": q_sim_quantize_binary,
    "sim_ann_hamming": q_sim_ann_hamming,
    "sim_binary_recall_at_k": q_sim_binary_recall,
    "d_weighted_sample": q_d_weighted_sample,
    "sim_ann_int8": q_sim_ann_int8,
    "d_corpus_diff": q_d_corpus_diff,
    "sim_mean_pool": q_sim_mean_pool,
    "sim_int8_recall_at_k": q_sim_int8_recall,
    "e_stream_dedup_exact": q_e_stream_dedup_exact,
    "e_stream_window_watermark": q_e_stream_window_watermark,
    "d_importance_select": q_d_importance_select,
    "text_lang_segments": q_text_lang_segments,
    "text_zipf_profile": q_text_zipf_profile,
    "text_pmi_bigrams": q_text_pmi_bigrams,
    "d_source_caps": q_d_source_caps,
    "sql_set_ops": q_sql_setops,
    "sql_step_funnel": q_sql_step_funnel,
    "sim_pagerank": q_sim_pagerank,
    "sim_label_propagation": q_sim_label_propagation,
    "sim_triangle_stats": q_sim_triangle_stats,
    "e_stream_pq_ingest": q_e_stream_pq_ingest,
    "e_stream_sessionize": q_e_stream_sessionize,
    "e_stream_asof_enrich": q_e_stream_asof_enrich,
    "e_stream_lake_upsert": q_e_stream_lake_upsert,
    "e_stream_drift_psi": q_e_stream_drift_psi,
    "e_stream_quality_gate": q_e_stream_quality_gate,
    "text_tfidf_top_terms": q_text_tfidf,
    "sql_left_join": q_sql_left_join,
    "sql_semi_join": q_sql_semi_join,
}

_ORACLES: dict[str, str] = {
    "s1_time_series": SQL_S1,
    "s1_time_series_compare": SQL_S1_COMPARE,
    "s2_time_avg_map": SQL_S2,
    "s3_clim_map": SQL_S3,
    "s5_hofmoeller_lat": _sql_hof("lat"),
    "s6_hofmoeller_lon": _sql_hof("lon"),
    "a5_lonlat_map": SQL_A5,
    "a7_data_in_bounds": SQL_A7,
    "a10_dataset_list": SQL_A10,
    "s4_corr_map": SQL_S4,
    "a4_corr_grid": SQL_A4,
    "s7_daily_difference": SQL_S7,
    "s8_matchup": _sql_matchup(False),
    "s8_matchup_once": _sql_matchup(True),
    "a2_stats_from_summary": SQL_A2,
    "a8_nearest_value": SQL_A8,
    "t_tiles_in_box": SQL_T_TILES,
    "t_days_in_range": SQL_T_DAYS,
    "t_asof_doy": SQL_T_ASOF,
    "t_asof_events": SQL_T_ASOF_EVENTS,
    "t_range_join": SQL_T_RANGE_JOIN,
    "t_interval_union": SQL_T_INTERVAL_UNION,
    "sql_pivot_monthly": SQL_PIVOT_MONTHLY,
    "sql_cumulative_revenue": SQL_CUMULATIVE_REVENUE,
    "text_ppl_buckets": SQL_TEXT_PPL_BUCKETS,
    "d_dedup_canonical": SQL_D_CANONICAL,
    "e_stream_asof_enrich": SQL_E_STREAM_ASOF,
    "t_asof_nearest": SQL_T_ASOF_NEAREST,
    "sql_rolling_revenue": SQL_ROLLING_REVENUE,
    "sql_value_histogram": SQL_VALUE_HISTOGRAM,
    "t_interval_gaps": SQL_T_INTERVAL_GAPS,
    "sql_salted_hot_key": SQL_SALTED_HOT_KEY,
    "t_distinct_bboxes": SQL_T_BBOXES,
    "f_seasonal_filter": SQL_F_SEASONAL,
    "f_lowpass_checked": _sql_lowpass_checked(),
    "etl_transforms": SQL_ETL,
    "etl_regrid": SQL_REGRID,
    "d_dedup_exact": SQL_D_EXACT,
    "d_dedup_ngram_jaccard": SQL_D_JACCARD,
    "d_dedup_components": SQL_D_COMPONENTS,
    "d_cluster_stats": SQL_D_CLUSTER_STATS,
    "d_stratified_sample": SQL_D_STRATIFIED_SAMPLE,
    "d_sample_exact_n": SQL_D_SAMPLE_EXACT_N,
    "d_token_packing": SQL_D_TOKEN_PACKING,
    "text_tfidf_top_terms": SQL_TEXT_TFIDF,
    "d_dedup_winnow": SQL_D_WINNOW,
    "d_semantic_dedup": SQL_D_SEMANTIC_DEDUP,
    # d_dedup_minhash_lsh, d_dedup_simhash: no direct oracle (xxhash64 is
    # not reproducible in DuckDB), but each is now INDIRECTLY driver-
    # checked by an oracled sibling: d_dedup_lsh_xx_parity (xx pair set ==
    # md5 pair set, md5 side rebuilt exactly) and d_dedup_simhash_xx_recall
    # (every exact-jaccard>=0.9 pair within hamming 20 under the xx
    # projection).
    "d_near_dup_embedding": SQL_D_EMB,
    "d_near_dup_embedding_ivf": SQL_D_EMB_IVF,
    "sim_knn_bruteforce": SQL_SIM_KNN,
    "text_stats": _sql_text_stats(),
    "m_multimodal_metadata": SQL_M_META,
    "m_frame_sample": SQL_M_FRAMES,
    "m_multimodal_features": SQL_M_FEATURES,
    "sql_pricing_summary": SQL_Q1,
    "sql_shipping_priority": SQL_Q3,
    "sql_regional_revenue": SQL_Q5,
    "sql_topk_per_group": SQL_TOPK,
    "sql_rollup": SQL_ROLLUP,
    "sql_set_ops": SQL_SETOPS,
    "sql_anti_join": SQL_ANTI,
    "sql_left_join": SQL_LEFT_JOIN,
    "sql_semi_join": SQL_SEMI_JOIN,
    "sql_sessionize": SQL_SESSIONS,
    "sql_hourly_events": SQL_HOURLY,
    "clim_nday": SQL_CLIM_NDAY,
    "clim_pixel_stats": SQL_PIXEL_STATS,
    "g_spatial_smooth": SQL_SMOOTH,
    "g_gaussian_interp": _sql_gauss_interp(),
    "g_gaussian_interp_offgrid": SQL_GAUSS_OFFGRID,
    "d8_insitu_subset": SQL_D8_INSITU,
    "d_curation_pipeline": _sql_curation(),
    "d_corpus_mix": _sql_corpus_mix(),
    "d_contamination": SQL_D_CONTAMINATION,
    "text_unigram_nll": SQL_TEXT_UNIGRAM_NLL,
    "d_dedup_simhash_md5": SQL_D_SIMHASH_MD5,
    "sim_ann_lsh": _sql_sim_lsh(),
    "f_hof_deseason": SQL_HOF_DESEASON,
    "doms_list": SQL_DOMS_LIST,
    "e_sliding_events": SQL_SLIDING,
    "sql_quantiles": SQL_QUANTILES,
    "sql_json_extract": SQL_JSON,
    "sql_distinct_counts": SQL_DISTINCT,
    "s1_polygon_time_series": _sql_s1_polygon(),
    "sketch_profile": SQL_SKETCH_PROFILE,
    # f_lowpass: no oracle (sequential numpy filtfilt; golden-tested)
    "d_dedup_minhash_md5": _sql_minhash_md5(),
    "d_dedup_lsh_xx_parity": _sql_lsh_parity(),
    "d_dedup_simhash_xx_recall": SQL_D_SIMHASH_RECALL,
    "scrub_pii": _sql_scrub_pii(),
    "scrub_repetition": SQL_SCRUB_REPETITION,
    "scrub_span_dedup": SQL_SCRUB_SPAN,
    "scrub_span_dedup_md5_parity": SQL_SCRUB_SPAN,
    "scrub_span_apply": SQL_SCRUB_SPAN_APPLY,
    "text_bpe_tokens": _sql_bpe_tokens(),
    "warc_ingest": SQL_WARC_INGEST,
    "a2_tiled_lake_pruned": SQL_A2,
    "m_resize_features": SQL_M_RESIZE,
    "m_resample_audio": SQL_M_RESAMPLE,
    "corpus_drift_psi": _sql_corpus_drift(),
    "d_temperature_mix": _sql_temperature_mix(),
    "text_bigram_nll": SQL_TEXT_BIGRAM_NLL,
    "d_chunking": SQL_D_CHUNKING,
    "text_vocab_oov": SQL_TEXT_VOCAB_OOV,
    "sim_filtered_knn": SQL_SIM_FILTERED,
    "sim_ann_recall_at_k": _sql_sim_recall(),
    "sim_ann_ivf": SQL_SIM_IVF,
    "text_bm25_topk": SQL_TEXT_BM25,
    "sim_hybrid_rrf": SQL_SIM_HYBRID,
    "text_nb_classifier": SQL_TEXT_NB,
    "d_shuffle_shards": SQL_D_SHUFFLE_SHARDS,
    "sim_quantize_int8": SQL_SIM_QUANTIZE,
    "d_weighted_sample": SQL_D_WEIGHTED_SAMPLE,
    "sim_ann_int8": SQL_SIM_ANN_INT8,
    "sim_ann_pq": _sql_sim_pq(),
    "sim_ann_ivf_pq": _sql_sim_ivf_pq(),
    "sim_pq_recall_at_k": _sql_sim_pq_recall(),
    "e_stream_pq_ingest": _sql_stream_pq_ingest(),
    "sim_quantize_binary": _sql_sim_quantize_binary(),
    "sim_ann_hamming": _sql_sim_ann_hamming(),
    "sim_binary_recall_at_k": _sql_sim_binary_recall(),
    "text_gopher_quality": _sql_text_gopher_quality(),
    "e_stream_drift_psi": _sql_stream_drift_psi(),
    "sim_mmr_select": _sql_sim_mmr(),
    "text_hash_embed": SQL_TEXT_HASH_EMBED,
    "sim_hash_embed_knn": SQL_SIM_HASH_EMBED_KNN,
    "sql_grouping_sets": SQL_SQL_GROUPING_SETS,
    "d_quality_funnel": SQL_D_QUALITY_FUNNEL,
    "d_dedup_containment": SQL_D_DEDUP_CONTAINMENT,
    "sim_knn_graph": SQL_SIM_KNN_GRAPH,
    "d_lake_merge_upsert": SQL_D_LAKE_MERGE_UPSERT,
    "e_stream_lake_upsert": SQL_E_STREAM_LAKE_UPSERT,
    "sql_step_funnel": SQL_SQL_STEP_FUNNEL,
    "sql_retention_cohorts": SQL_SQL_RETENTION_COHORTS,
    "sim_pagerank": _sql_pagerank(),
    "e_anomaly_zscore": SQL_E_ANOMALY_ZSCORE,
    "d_jsonl_roundtrip": SQL_D_JSONL_ROUNDTRIP,
    "sim_label_propagation": _sql_label_propagation(),
    "sim_triangle_stats": _sql_triangle_stats(),
    "d_embed_covariance": _sql_embed_covariance(),
    "d_embed_pca1": _sql_embed_pca1(),
    "d_expectations_audit": _sql_expectations_audit(),
    "d_embed_outliers": _sql_embed_outliers(),
    "e_stream_quality_gate": _sql_stream_quality_gate(),
    "d_corpus_diff": SQL_D_CORPUS_DIFF,
    "sim_mean_pool": SQL_SIM_MEAN_POOL,
    "sim_int8_recall_at_k": _sql_sim_int8_recall(),
    "d_export_pipeline": _sql_export_pipeline(),
    "d_gated_export": _sql_gated_export(),
    "d_topic_clusters": _sql_topic_clusters(),
    "d_kmeans_round": _sql_kmeans_round(),
    "e_stream_dedup_exact": SQL_E_STREAM_DEDUP,
    "e_stream_window_watermark": SQL_E_STREAM_WINDOW,
    "e_stream_sessionize": SQL_E_STREAM_SESSIONS,
    "text_zipf_profile": SQL_TEXT_ZIPF,
    "text_pmi_bigrams": SQL_TEXT_PMI,
    "d_source_caps": SQL_D_SOURCE_CAPS,
    "text_bpe_learn": _sql_bpe_learn(),
    "text_bpe_tokenize": _sql_bpe_apply(),
    "d_importance_select": SQL_D_IMPORTANCE,
    "text_lang_segments": _sql_lang_segments(),
    "text_nb_confusion": _sql_nb_confusion(),
    "scrub_cross_contamination": SQL_SCRUB_CROSS_CONTAM,
    "scrub_decontaminate": SQL_SCRUB_DECONTAMINATE,
    "e_stream_matchup": _sql_matchup(False),
    "e_stream_near_dup": _sql_stream_near_dup(),
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return q_s1_time_series(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def _stable_round_sql(sql: str) -> str:
    """Rewrite every ROUND(expr, n) to round through DECIMAL(38,7) — see
    _finish for why (cross-engine half-boundary disagreement on doubles).
    Paren-matching rewrite; placeholder avoids re-matching the wrapper."""
    out = sql
    while True:
        i = out.find("ROUND(")
        if i < 0:
            break
        j = i + len("ROUND(")
        depth = 1
        while depth:
            if out[j] == "(":
                depth += 1
            elif out[j] == ")":
                depth -= 1
            j += 1
        inner = out[i + len("ROUND("):j - 1]
        k, depth = len(inner) - 1, 0
        while k >= 0:
            ch = inner[k]
            if ch == ")":
                depth += 1
            elif ch == "(":
                depth -= 1
            elif ch == "," and depth == 0:
                break
            k -= 1
        expr, nd = inner[:k], inner[k + 1:].strip()
        out = (out[:i]
               + f"CAST(R0UND__(CAST({expr} AS DECIMAL(38,7)), {nd}) AS DOUBLE)"
               + out[j:])
    return out.replace("R0UND__(", "ROUND(")


# DuckDB inlines plain CTEs, so a CTE referenced N times re-evaluates
# its whole subtree N times — across unrolled iteration layers that
# compounds exponentially (the hand-materialized graph oracles above
# went 52s/203s -> ~1s each). This allowlist holds every oracle where
# rewriting multiply-referenced CTEs to AS MATERIALIZED was MEASURED
# hash-identical and >=20% (and >=50ms) faster at sf0.1; blanket
# rewriting would not do: materialization is a pushdown barrier and
# measurably SLOWS ~half the flagged oracles (e.g. d_dedup_minhash_md5
# 0.94s -> 1.47s). Keeping the slow default would flatter the recorded
# Spark/DuckDB ratio with an optimizer artifact, not a real win.
_MATERIALIZE_ORACLES = frozenset({
    "d_dedup_canonical", "text_ppl_buckets",
    "d_cluster_stats", "d_semantic_dedup", "sim_mmr_select",
    "d_dedup_components", "d_dedup_winnow", "d_dedup_containment",
    "text_bpe_tokenize", "d_dedup_ngram_jaccard", "sim_pagerank",
    "d_dedup_simhash_xx_recall", "d_corpus_mix", "d_curation_pipeline",
    "text_nb_classifier", "scrub_span_dedup",
    "scrub_span_dedup_md5_parity", "sim_ann_lsh",
    "g_gaussian_interp", "text_bpe_learn",
})


def _materialize_hot_ctes(sql: str) -> str:
    """Rewrite every multiply-referenced plain CTE definition in `sql`
    to `AS MATERIALIZED` (DuckDB syntax). Reference counting is by
    FROM/JOIN word-boundary occurrences, so WINDOW-clause aliases and
    column aliases never match; applied only to _MATERIALIZE_ORACLES
    (see the allowlist rationale above)."""
    out = sql
    for cte, mat in re.findall(r"(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", sql):
        if mat:
            continue
        refs = len(re.findall(r"(?:FROM|JOIN)\s+" + cte + r"\b", out,
                              re.IGNORECASE))
        if refs >= 2:
            out = re.sub(r"\b" + cte + r"\s+AS\s+\(",
                         cte + " AS MATERIALIZED (", out, count=1)
    return out


def oracle_sql() -> dict[str, str]:
    return {k: _stable_round_sql(_materialize_hot_ctes(v)
                                 if k in _MATERIALIZE_ORACLES else v)
            for k, v in _ORACLES.items()}
