"""Two-dataset correlation maps (reference /corrMapSpark, /correlationMap).

Per-pixel (or per-resolution-cell) Pearson correlation of two time-aligned
datasets. The reference hand-rolls the one-pass sufficient statistics
Σx,Σy,Σxx,Σyy,Σxy,n per pixel (reference:
algorithms_spark/CorrMapSpark.py:29-151, r formula :263-271); Spark's `corr`
aggregate computes the same formula with a stabler parallel merge.

Evaluation strategy at scale: no join at all. The x-side/y-side equi-join on
(time, cell) emits the per-key cross product of rows, so every pairwise sum
Pearson needs factorizes into per-key per-side sums; one conditional
aggregation keyed on (time, cell) — map-side partials doing the fact-scale
reduction — replaces two filtered scans, two join shuffles and the
sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexus_spark.functions.geo import bbox_filter


def corr_map(obs: DataFrame, dataset_x: str, dataset_y: str,
             min_lat: float = -90, max_lat: float = 90,
             min_lon: float = -180, max_lon: float = 180,
             start_time=None, end_time=None,
             resolution: float | None = None) -> DataFrame:
    """Per-pixel Pearson correlation map.

    resolution=None → native grid join on exact (time, lat, lon)
    (/corrMapSpark). resolution=R → bin lat/lon to an R-degree grid and
    average within (time, cell) before correlating (/correlationMap's
    user-resolution sampling, reference: algorithms/CorrelationMap.py:67-115
    — we use the cell mean rather than nearest-point sampling; same
    asymptotic semantics, strictly better estimator).

    Output: lat, lon, corr_r, corr_cnt.
    """
    df = obs.where(bbox_filter(F.col("lat"), F.col("lon"),
                               min_lat, max_lat, min_lon, max_lon))
    if start_time is not None:
        df = df.where(F.col("time") >= F.lit(start_time))
    if end_time is not None:
        df = df.where(F.col("time") <= F.lit(end_time))

    # Join-free evaluation: the x-side/y-side equi-join on (time, cell)
    # emits, per key, the full nx*ny cross product of rows — so every
    # pairwise sum the correlation needs FACTORIZES into per-key per-side
    # sums (sum over pairs of x*y = sum_x * sum_y per key, etc.). One
    # conditional aggregation per (time, cell) replaces the two filtered
    # scans + two join shuffles + sort-merge join: a single exchange whose
    # width is bounded by the key space, with map-side partial aggregation
    # doing the heavy reduction (at fact scale rows >> keys). The closed
    # form reproduces F.corr-over-the-join's null contract: zero valid
    # pairs or zero variance leave the corr_r guard unsatisfied -> NULL,
    # exactly where corr gave NULL/NaN (oracle-verified at every fixture
    # SF).
    v = F.col("value")
    is_x = F.col("dataset") == dataset_x
    is_y = F.col("dataset") == dataset_y
    both = df.where(is_x | is_y)
    if resolution is not None:
        # User-resolution sampling: ONE sample per (dataset, time, cell)
        # — the cell mean. Folded into the same single per-key
        # aggregation (no separate pre-collapse exchange): the side's
        # sample is avg(value) over the cell, present iff the side has
        # any row, valid iff the avg is non-null.
        both = both.withColumn(
            "lat", F.floor(F.col("lat") / resolution) * resolution
        ).withColumn(
            "lon", F.floor(F.col("lon") / resolution) * resolution)
        ax, ay = F.avg(F.when(is_x, v)), F.avg(F.when(is_y, v))
        one_if = [
            (F.count(F.when(is_x, 1)) > 0).cast("long").alias("rx"),
            (F.count(F.when(is_y, 1)) > 0).cast("long").alias("ry"),
            ax.isNotNull().cast("long").alias("cx"),
            ay.isNotNull().cast("long").alias("cy"),
        ]
        per_key = both.groupBy("time", "lat", "lon").agg(
            *one_if,
            ax.alias("sx"), ay.alias("sy"),
            (ax * ax).alias("sxx"), (ay * ay).alias("syy"),
        )
    else:
        per_key = both.groupBy("time", "lat", "lon").agg(
            F.count(F.when(is_x, 1)).alias("rx"),
            F.count(F.when(is_y, 1)).alias("ry"),
            F.count(F.when(is_x, v)).alias("cx"),
            F.count(F.when(is_y, v)).alias("cy"),
            F.sum(F.when(is_x, v)).alias("sx"),
            F.sum(F.when(is_y, v)).alias("sy"),
            F.sum(F.when(is_x, v * v)).alias("sxx"),
            F.sum(F.when(is_y, v * v)).alias("syy"),
        )
    c = F.col
    n = c("n").cast("double")
    num = n * c("sxy") - c("swx") * c("swy")
    vx = n * c("swxx") - c("swx") * c("swx")
    vy = n * c("swyy") - c("swy") * c("swy")
    # Guard, not try_divide: ANSI double division by zero raises, and
    # corr-over-join is NULL exactly when either variance is 0 (or no
    # valid pair exists, which makes both variances 0).
    corr_r = F.when((vx > 0) & (vy > 0),
                    num / (F.sqrt(vx) * F.sqrt(vy)))
    return (
        per_key.groupBy("lat", "lon").agg(
            F.sum(c("rx") * c("ry")).alias("pairs"),
            F.sum(c("cx") * c("cy")).alias("n"),
            F.sum(c("sx") * c("cy")).alias("swx"),
            F.sum(c("cx") * c("sy")).alias("swy"),
            F.sum(c("sxx") * c("cy")).alias("swxx"),
            F.sum(c("cx") * c("syy")).alias("swyy"),
            F.sum(c("sx") * c("sy")).alias("sxy"),
        )
        .where(c("pairs") > 0)
        .select("lat", "lon", corr_r.alias("corr_r"),
                c("n").alias("corr_cnt"))
    )
