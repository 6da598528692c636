"""Daily-difference anomaly series (reference /dailydifferenceaverage_spark).

anomaly(t) = mean over space of (obs(t, x) − climatology(doy(t), x)), with a
per-day std. The climatology lookup is an AS-OF match on day-of-year: the
most recent climatology row with doy <= doy(t) per pixel (reference:
algorithms_spark/DailyDifferenceAverageSpark.py:27-391; as-of lookup via Solr
`day_of_year_i <= d, sort desc, take 1` in
data-access/nexustiles/dao/SolrProxy.pyx:137-153; parallel variance merge
:263-282 → Spark stddev).

Scale design: the climatology is bounded (≤366 rows per pixel) so the as-of
resolution is done ON THE CLIMATOLOGY SIDE — expand each clim row into the
doy interval it covers (doy .. next_doy-1) via a lag window, then EQUI-join
obs on exact doy. No range join, no per-row subquery; the expanded clim table
is still small → Catalyst broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def climatology_asof_intervals(clim: DataFrame) -> DataFrame:
    """Turn (doy, lat, lon, value) climatology rows into coverage intervals
    [doy, next_doy-1] per pixel, plus wraparound: days before the first
    available doy of a year fall back to the pixel's last (max-doy) row —
    matching "most recent doy <= d, else none" semantics EXCEPT that the
    reference returns nothing for d < min(doy); we keep that by leaving the
    gap uncovered (doy_from of the first row = its own doy)."""
    w = Window.partitionBy("dataset", "lat", "lon").orderBy("doy")
    return (
        clim.withColumn("doy_to",
                        F.lead("doy").over(w) - F.lit(1))
        .withColumn("doy_to", F.coalesce("doy_to", F.lit(366)))
        .withColumnRenamed("doy", "doy_from")
    )


def daily_difference(obs: DataFrame, clim: DataFrame, dataset: str,
                     clim_dataset: str | None = None,
                     min_lat: float = -90, max_lat: float = 90,
                     min_lon: float = -180, max_lon: float = 180,
                     start_time=None, end_time=None) -> DataFrame:
    """Per-day anomaly mean + sample std.

    obs columns: dataset, time, lat, lon, value.
    clim columns: dataset, doy, lat, lon, value.
    Output: dd_date, dd_mean, dd_std, dd_cnt.
    """
    df = obs.where(
        (F.col("lat") >= min_lat) & (F.col("lat") <= max_lat)
        & (F.col("lon") >= min_lon) & (F.col("lon") <= max_lon)
        & (F.col("dataset") == dataset)
    )
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))
    df = df.withColumn("doy", F.dayofyear("time"))

    c = clim
    if clim_dataset is not None:
        c = c.where(F.col("dataset") == clim_dataset)
    # Expand each coverage interval to one row per covered doy: the join
    # key (lat, lon, doy) becomes UNIQUE, so the broadcast hash probe is
    # O(1) per obs row. (Joining on pixel equality with a doy-range
    # residual would probe ~366 interval rows per pixel key — two orders
    # of magnitude more comparisons.) Expanded size is bounded by
    # |grid| x 366 regardless of obs scale.
    expanded = (
        climatology_asof_intervals(c)
        .withColumn("doy", F.explode(F.sequence("doy_from", "doy_to")))
        .select(F.col("lat").alias("c_lat"), F.col("lon").alias("c_lon"),
                "doy", F.col("value").alias("clim_value"))
    )

    joined = df.join(
        F.broadcast(expanded),
        (F.col("lat") == F.col("c_lat")) & (F.col("lon") == F.col("c_lon"))
        & (df["doy"] == expanded["doy"]),
        "inner",
    ).withColumn("diff", F.col("value") - F.col("clim_value"))

    return joined.groupBy(F.to_date("time").alias("dd_date")).agg(
        F.avg("diff").alias("dd_mean"),
        F.stddev_samp("diff").alias("dd_std"),
        F.count("diff").alias("dd_cnt"),
    )
