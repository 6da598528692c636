"""Per-pixel map operators: time-average map, climatology map, lat-lon stats
map (reference /timeAvgMapSpark, /climMapSpark, /longitudeLatitudeMap).

All three are one groupBy(lat, lon) over the pruned scan. The reference's
30/90-day chunked fetch loops (TimeAvgMapSpark.py:41-45, ClimMapSpark.py:41-46)
exist only to bound per-task memory — Spark spills, so they vanish. The
shuffle key (lat, lon) is the output grid: high-cardinality, uniform, ideal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter


def _bounded(obs: DataFrame, dataset: str | None, min_lat, max_lat, min_lon,
             max_lon, start_time, end_time) -> DataFrame:
    from nexus_spark.functions.validation import validate_bbox

    validate_bbox(min_lat, max_lat, min_lon, max_lon)
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if dataset is not None:
        df = df.where(F.col("dataset") == dataset)
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    return df


def time_avg_map(obs: DataFrame, dataset: str | None = None,
                 min_lat: float = -90, max_lat: float = 90,
                 min_lon: float = -180, max_lon: float = 180,
                 start_time=None, end_time=None) -> DataFrame:
    """Per-pixel temporal mean + count
    (reference: algorithms_spark/TimeAvgMapSpark.py:28-96,183-187 — the
    combineByKey sum/cnt pair is Spark's partial-agg, for free)."""
    df = _bounded(obs, dataset, min_lat, max_lat, min_lon, max_lon,
                  start_time, end_time)
    return df.groupBy("lat", "lon").agg(
        F.avg("value").alias("map_mean"),
        F.count("value").alias("map_cnt"),
    )


def clim_map(obs: DataFrame, month: int, dataset: str | None = None,
             start_year: int | None = None, end_year: int | None = None,
             **bounds) -> DataFrame:
    """Climatology map: per-pixel mean over one calendar month across years
    (reference: algorithms_spark/ClimMapSpark.py:16-252, per-year month
    windows :176-184 — replaced by a month() predicate)."""
    df = _bounded(obs, dataset, bounds.get("min_lat", -90),
                  bounds.get("max_lat", 90), bounds.get("min_lon", -180),
                  bounds.get("max_lon", 180), None, None)
    from nexus_spark.functions.validation import validate_month

    validate_month(month)
    df = df.where(F.month("time") == month)
    if start_year is not None:
        df = df.where(F.year("time") >= start_year)
    if end_year is not None:
        df = df.where(F.year("time") <= end_year)
    return df.groupBy("lat", "lon").agg(
        F.avg("value").alias("clim_mean"),
        F.count("value").alias("clim_cnt"),
    )


def lonlat_map(obs: DataFrame, dataset: str | None = None,
               min_lat: float = -90, max_lat: float = 90,
               min_lon: float = -180, max_lon: float = 180,
               start_time=None, end_time=None) -> DataFrame:
    """Per-pixel stats incl. trend-vs-time regression
    (reference: algorithms/LongitudeLatitudeMap.py:192-244 — scipy.linregress
    per pixel over (epoch-seconds, value) → regr_* aggregates, with the
    reference's p-value and stderr from the closed form on (slope, Sxx,
    Syy, Sxy, n); see functions/stats.py for the approximation contract).

    Output: lat, lon, ll_slope (per DAY — the reference regresses on an
    epoch-seconds axis; we use days so slopes stay in a numerically
    meaningful range), ll_intercept, ll_r, ll_mean, ll_max, ll_min, ll_std
    (population), ll_cnt, ll_stderr, ll_pvalue.
    """
    from nexus_spark.functions.stats import (pvalue_from_z_sql, stderr_sql,
                                             tstat_sql, zstat_sql)

    df = _bounded(obs, dataset, min_lat, max_lat, min_lon, max_lon,
                  start_time, end_time)
    # One shared regressor column (not an expression repeated inside every
    # aggregate — codegen does not CSE across aggregate buffers), and the
    # minimal sufficient-stat buffer set: slope/intercept/r/std all derive
    # from (Sxx, Syy, Sxy, avgx, avgy, n) in the post-aggregation
    # projection, instead of regr_slope/regr_intercept/corr/stddev_pop
    # each folding their own covariance buffer over every row.
    t = (F.unix_timestamp("time").cast("double") / F.lit(86400.0)).alias("_t")
    base = df.select("lat", "lon", "value", t).groupBy("lat", "lon").agg(
        F.max("value").alias("ll_max"),
        F.min("value").alias("ll_min"),
        F.count("value").alias("ll_cnt"),
        F.regr_avgx(F.col("value"), F.col("_t")).alias("_avgx"),
        F.regr_avgy(F.col("value"), F.col("_t")).alias("_avgy"),
        F.regr_sxx(F.col("value"), F.col("_t")).alias("_sxx"),
        F.regr_syy(F.col("value"), F.col("_t")).alias("_syy"),
        F.regr_sxy(F.col("value"), F.col("_t")).alias("_sxy"),
    ).select(
        "lat", "lon", "ll_max", "ll_min", "ll_cnt",
        "_sxx", "_syy", "_sxy",
        # try_divide: NULL on zero denominators — exactly regr_slope /
        # corr's undefined-variance semantics (ANSI division would throw).
        F.try_divide(F.col("_sxy"), F.col("_sxx")).alias("ll_slope"),
        (F.col("_avgy") - F.try_divide(F.col("_sxy"), F.col("_sxx"))
         * F.col("_avgx")).alias("ll_intercept"),
        F.try_divide(F.col("_sxy"),
                     F.sqrt(F.col("_sxx") * F.col("_syy"))).alias("ll_r"),
        F.col("_avgy").alias("ll_mean"),
        F.sqrt(F.try_divide(F.col("_syy"), F.col("ll_cnt"))).alias("ll_std"),
    )
    # Staged projections keep the expensive intermediates named (the
    # p-value text references _z seven times — naming it bounds the tree),
    # while the cheap t-stat nests textually into the z-stage so the whole
    # chain is three select passes, not five withColumn analysis passes.
    se = base.select("*", F.expr(
        stderr_sql("ll_slope", "_sxx", "_syy", "_sxy", "ll_cnt"))
        .alias("ll_stderr"))
    z_txt = zstat_sql(f"({tstat_sql('ll_slope', 'll_stderr')})", "ll_cnt")
    zs = se.select("*", F.expr(z_txt).alias("_z"))
    return (zs.select("*", F.expr(pvalue_from_z_sql("_z", "ll_stderr"))
                      .alias("ll_pvalue"))
            .drop("_sxx", "_syy", "_sxy", "_z"))
