"""Time-series area statistics (reference /timeSeriesSpark + /stats).

Per-day min, max, cos-lat-weighted mean, count, population std over a
bbox/time range, per dataset; optional two-dataset comparison stats
(reference: analysis/webservice/algorithms_spark/TimeSeriesSpark.py:31-259,
per-day kernel :493-554; comparison linregress :337-355).

Spark-first design: the reference's whole "facet distinct days → parallelize
day chunks → per-task Solr+Cassandra refetch" machinery collapses into ONE
groupBy over the partition-pruned observations scan. Partial aggregation is
map-side automatic; the shuffle key (dataset, day) is low-cardinality and
unskewed, so this plan holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter, weighted_mean


def time_series(
    obs: DataFrame,
    datasets: list[str] | None = None,
    min_lat: float = -90.0,
    max_lat: float = 90.0,
    min_lon: float = -180.0,
    max_lon: float = 180.0,
    start_time=None,
    end_time=None,
) -> DataFrame:
    """Per-(dataset, day) area statistics.

    Output columns: dataset, ts_date, ts_min, ts_max, ts_mean (cos-lat
    weighted), ts_cnt, ts_std (population, np.ma.std ddof=0 parity —
    reference TimeSeriesSpark.py:536-542).
    """
    from nexus_spark.functions.validation import validate_bbox

    validate_bbox(min_lat, max_lat, min_lon, max_lon)
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if datasets:
        df = df.where(F.col("dataset").isin(datasets))
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    return (
        df.groupBy("dataset", F.to_date("time").alias("ts_date"))
        .agg(
            F.min("value").alias("ts_min"),
            F.max("value").alias("ts_max"),
            weighted_mean("value", "lat").alias("ts_mean"),
            F.count("value").alias("ts_cnt"),
            F.stddev_pop("value").alias("ts_std"),
        )
    )


def time_series_compare(obs: DataFrame, dataset_x: str, dataset_y: str,
                        **bounds) -> DataFrame:
    """Two-dataset comparison: per-day means self-joined on day, then
    slope/intercept/r over the aligned series (reference
    TimeSeriesSpark.py:337-355 uses scipy.linregress on the merged means —
    including its p-value and stderr, reproduced here via the closed form
    in functions/stats.py).

    Returns one row: cmp_slope, cmp_intercept, cmp_r, cmp_n, cmp_stderr,
    cmp_pvalue.
    """
    from nexus_spark.functions.stats import (pvalue_from_z_sql, stderr_sql,
                                             tstat_sql, zstat_sql)

    ts = time_series(obs, datasets=[dataset_x, dataset_y], **bounds)
    x = ts.where(F.col("dataset") == dataset_x).select(
        "ts_date", F.col("ts_mean").alias("mean_x"))
    y = ts.where(F.col("dataset") == dataset_y).select(
        "ts_date", F.col("ts_mean").alias("mean_y"))
    # Daily-mean series are tiny relative to obs; this join is never the
    # bottleneck — AQE will broadcast one side.
    aligned = x.join(y, "ts_date")
    base = aligned.agg(
        F.regr_slope("mean_y", "mean_x").alias("cmp_slope"),
        F.regr_intercept("mean_y", "mean_x").alias("cmp_intercept"),
        F.corr("mean_x", "mean_y").alias("cmp_r"),
        F.count(F.lit(1)).alias("cmp_n"),
        F.regr_sxx(F.col("mean_y"), F.col("mean_x")).alias("_sxx"),
        F.regr_syy(F.col("mean_y"), F.col("mean_x")).alias("_syy"),
        F.regr_sxy(F.col("mean_y"), F.col("mean_x")).alias("_sxy"),
    )
    se = base.withColumn("cmp_stderr", F.expr(
        stderr_sql("cmp_slope", "_sxx", "_syy", "_sxy", "cmp_n")))
    zs = (se.withColumn("_t", F.expr(tstat_sql("cmp_slope", "cmp_stderr")))
          .withColumn("_z", F.expr(zstat_sql("_t", "cmp_n"))))
    return (zs.withColumn("cmp_pvalue",
                          F.expr(pvalue_from_z_sql("_z", "cmp_stderr")))
            .drop("_sxx", "_syy", "_sxy", "_t", "_z"))
