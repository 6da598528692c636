"""Climatology batch operators (reference climatology/clim/, SURVEY §2.5).

- nday_climatology: N-day-bin climatologies over multi-year data
  (reference ClimatologySpark2.climByAveragingPeriods splits granule lists
  into day-of-year keyed groups, ClimatologySpark2.py:100-156). Relational
  form: one groupBy on (doy bin, pixel).
- pixel_stats: per-pixel count/mean/sample-std/min/max — the Welford
  accumulate/combine path (ClimatologySpark2.py:333-451) is exactly
  Spark's avg/var_samp/stddev_samp stable merge.
- spatial_smooth: 3x3 neighborhood mean smoothing (reference
  spatialFilter.py:12-36 Fortran kernel) — re-expressed as a neighbor-offset
  explode + equi-join-free re-aggregation: each cell SCATTERS its value to
  its 9 neighbors and the smoothed value is the per-cell mean of what it
  received. One explode + one groupBy, no join, no UDF; scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nday_climatology(obs: DataFrame, dataset: str, n_days: int = 5) -> DataFrame:
    """Per (doy_bin, lat, lon): count/mean/sample-std/min/max across years.

    doy_bin = (dayofyear-1) / n_days — 73 bins/year at n=5 like the
    reference's 5-day climatology products.
    """
    df = obs.where(F.col("dataset") == dataset)
    return (
        df.withColumn("doy_bin",
                      F.floor((F.dayofyear("time") - 1) / n_days).cast("int"))
        .groupBy("doy_bin", "lat", "lon")
        .agg(F.count("value").alias("cl_cnt"),
             F.avg("value").alias("cl_mean"),
             F.stddev_samp("value").alias("cl_std"),
             F.min("value").alias("cl_min"),
             F.max("value").alias("cl_max"))
    )


def pixel_stats(obs: DataFrame, dataset: str | None = None) -> DataFrame:
    """Per-pixel stats over the full record (reference pixelStats.py:37-156)."""
    df = obs if dataset is None else obs.where(F.col("dataset") == dataset)
    return df.groupBy("dataset", "lat", "lon").agg(
        F.count("value").alias("px_cnt"),
        F.avg("value").alias("px_mean"),
        F.stddev_samp("value").alias("px_std"),
        F.min("value").alias("px_min"),
        F.max("value").alias("px_max"),
    )


def gaussian_interp(grid: DataFrame, lat_step: float, lon_step: float,
                    value_col: str = "value",
                    wlat: int = 1, wlon: int = 1,
                    slat: float = 1.0, slon: float = 1.0,
                    vfactor: float = -0.6931) -> DataFrame:
    """Gaussian-weighted neighborhood interpolation onto the same grid
    (reference: climatology/clim/gaussInterp.py:14-42 — a Fortran kernel
    with window (wlat, wlon), sigmas (slat, slon), and exponent scale
    vfactor; SURVEY §2.5 marked it out of relational scope, but the
    scatter-gather neighborhood pattern expresses it exactly for the
    grid-aligned case).

    out(cell) = Σ_nbr w·v / Σ_nbr w with
    w = exp(vfactor · ((Δlat/slat)² + (Δlon/slon)²)), Δ in cell units.
    Output: lat, lon, gi_mean, gi_wsum.
    """
    import math

    # Single-subtree scatter: explode one literal array of (dy, dx, w)
    # structs instead of unioning (2w+1)^2 copies of the grid subtree —
    # the weights are compile-time constants of the offset, so the whole
    # neighborhood is one generate over one scan (same rewrite as
    # spatial_smooth below; the union form planned the aggregation
    # subtree 9x and lost exchange reuse on re-execution).
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"),
                 F.lit(math.exp(vfactor * ((dy / slat) ** 2
                                           + (dx / slon) ** 2))).alias("w"))
        for dy in range(-wlat, wlat + 1)
        for dx in range(-wlon, wlon + 1)])
    scattered = (
        grid.select(value_col, "lat", "lon",
                    F.explode(offsets).alias("_o"))
        .select(
            F.round(F.col("lat") + F.col("_o.dy") * lat_step, 6).alias("lat"),
            F.round(F.col("lon") + F.col("_o.dx") * lon_step, 6).alias("lon"),
            (F.col(value_col) * F.col("_o.w")).alias("wv"),
            F.when(F.col(value_col).isNotNull(),
                   F.col("_o.w")).alias("w"),
        ))
    cells = grid.select(F.round("lat", 6).alias("lat"),
                        F.round("lon", 6).alias("lon")).distinct()
    return (
        scattered.join(cells, ["lat", "lon"])
        .groupBy("lat", "lon")
        .agg((F.sum("wv") / F.sum("w")).alias("gi_mean"),
             F.sum("w").alias("gi_wsum"))
    )


def gaussian_interp_to(points: DataFrame, targets: DataFrame,
                       wlat: float, wlon: float,
                       slat: float = 1.0, slon: float = 1.0,
                       stime_days: float | None = None,
                       vfactor: float = -0.6931,
                       value_col: str = "value",
                       time_col: str = "time") -> DataFrame:
    """Off-grid gaussian interpolation: weight source points onto an
    ARBITRARY target lat/lon set, with optional time downweighting
    (reference: climatology/clim/gaussInterp.pyx:60-130 / gaussInterp_f.f —
    neighbors within the (wlat/2, wlon/2) degree half-windows, ALL time
    epochs included, w = exp(vfactor * ((dlat/slat)^2 + (dlon/slon)^2 +
    (dtime/stime)^2)), out = sum(w*v)/sum(w), masked where weight 0).

    Scale shape: the O(targets x points) scan in the Fortran kernel becomes
    a cell-bucketed equi-join — points are bucketed into half-window-sized
    cells, each target scatters to its 3x3 neighbor cells (a bounded
    explode of the SMALL side, which Catalyst broadcasts), and the exact
    window test runs post-join. Shuffle is one aggregation on the target
    key; no all-pairs stage at any scale.

    Contract deltas vs the reference kernel: mid-time is
    (min(time)+max(time))/2 over the filtered points rather than the
    middle ELEMENT of the time axis (identical for a regular axis, and
    computable as a broadcast scalar without collecting the axis);
    `targets` rows are (out_lat, out_lon).

    Output: out_lat, out_lon, gi_mean, gi_wsum, gi_n (targets with zero
    in-window neighbors are absent — the reference masks them).
    """
    if wlat <= 0 or wlon <= 0:
        raise ValueError("wlat/wlon windows must be positive degrees")
    hw_lat, hw_lon = wlat / 2.0, wlon / 2.0

    pts = points.where(F.col(value_col).isNotNull())
    t_term = None
    if stime_days is not None:
        secs = F.unix_timestamp(time_col).cast("double")
        mid = pts.agg(((F.min(secs) + F.max(secs)) / 2.0).alias("_mid"))
        pts = pts.crossJoin(F.broadcast(mid))
        t_term = ((secs - F.col("_mid")) / F.lit(86400.0)
                  / F.lit(float(stime_days)))

    pts = pts.withColumn("_clat", F.floor(F.col("lat") / hw_lat)) \
             .withColumn("_clon", F.floor(F.col("lon") / hw_lon))
    tgt = (targets
           .withColumn("_dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
           .withColumn("_dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
           .select("out_lat", "out_lon",
                   (F.floor(F.col("out_lat") / hw_lat) + F.col("_dy"))
                   .alias("_clat"),
                   (F.floor(F.col("out_lon") / hw_lon) + F.col("_dx"))
                   .alias("_clon")))

    joined = pts.join(F.broadcast(tgt), ["_clat", "_clon"]).where(
        (F.abs(F.col("lat") - F.col("out_lat")) <= hw_lat)
        & (F.abs(F.col("lon") - F.col("out_lon")) <= hw_lon))
    dl = (F.col("lat") - F.col("out_lat")) / F.lit(float(slat))
    dn = (F.col("lon") - F.col("out_lon")) / F.lit(float(slon))
    arg = dl * dl + dn * dn
    if t_term is not None:
        arg = arg + t_term * t_term
    w = F.exp(F.lit(float(vfactor)) * arg)
    return (joined
            .select("out_lat", "out_lon", w.alias("_w"),
                    (w * F.col(value_col)).alias("_wv"))
            .groupBy("out_lat", "out_lon")
            .agg((F.sum("_wv") / F.sum("_w")).alias("gi_mean"),
                 F.sum("_w").alias("gi_wsum"),
                 F.count("_w").alias("gi_n")))


def spatial_smooth(grid: DataFrame, lat_step: float, lon_step: float,
                   value_col: str = "value") -> DataFrame:
    """3x3 neighborhood mean over a regular grid.

    grid: (lat, lon, value) — one row per cell (pre-aggregate duplicates
    first). Scatter-gather formulation: explode each cell's value to the 9
    cells it contributes to, then mean per receiving cell. Cells on the
    grid edge average over their existing neighbors only (same behavior as
    a mask-aware 3x3 convolution).

    Output: lat, lon, sm_mean (smoothed), sm_n (neighbors contributing).
    """
    contrib = (
        grid.withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            # receiving cell coordinates, snapped back to grid values.
            F.round(F.col("lat") + F.col("dy") * lat_step, 6).alias("lat"),
            F.round(F.col("lon") + F.col("dx") * lon_step, 6).alias("lon"),
            F.col(value_col).alias("v"),
        )
    )
    # Inner-join against the actual cell set so halo cells (receivers that
    # do not exist in the grid) are dropped.
    cells = grid.select(F.round("lat", 6).alias("lat"),
                        F.round("lon", 6).alias("lon")).distinct()
    return (
        contrib.join(cells, ["lat", "lon"])
        .groupBy("lat", "lon")
        .agg(F.avg("v").alias("sm_mean"),
             F.count("v").alias("sm_n"))
    )
