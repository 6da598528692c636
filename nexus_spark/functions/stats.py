"""Statistical aggregate expressions (the math kernels from SURVEY §2.3).

Every kernel is a built-in Spark aggregate (stable parallel merge for free):
the reference's hand-rolled Chan/Welford variance merges
(reference: DailyDifferenceAverageSpark.py:263-282,
climatology/clim/ClimatologySpark2.py:333-451) are exactly what Spark's
``stddev``/``var_samp``/``corr`` implement internally.

ddof conventions (documented per SURVEY §7 hard-part b):
- time-series / map stats use POPULATION std (np.ma.std, ddof=0) →
  ``stddev_pop``;
- climatology Welford path uses SAMPLE std → ``stddev_samp``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def linregress_columns(x: Column, y: Column) -> dict[str, Column]:
    """slope/intercept/r for per-group OLS (scipy.linregress parity).

    Reference computes scipy.stats.linregress per pixel/cell
    (reference: analysis/webservice/algorithms/LongitudeLatitudeMap.py:186-244,
    CorrelationMap.py:83-93). slope/intercept/r are exact closed forms via
    Spark's regr_* / corr aggregates; p-value and stderr follow from (r, n)
    driver-side if needed (t-distribution) — not part of the hashed surface.
    """
    return {
        "slope": F.regr_slope(y, x),
        "intercept": F.regr_intercept(y, x),
        "r": F.corr(x, y),
        "cnt": F.regr_count(y, x),
    }


def pearson_from_sufficient_stats(x: Column, y: Column) -> Column:
    """Pearson r — identical to the reference's one-pass sufficient-stats
    formula (Σxy − ΣxΣy/n)/sqrt((Σxx−Σx²/n)(Σyy−Σy²/n))
    (reference: algorithms_spark/CorrMapSpark.py:263-271). Spark's ``corr``
    aggregate computes exactly this with a numerically stabler merge.
    """
    return F.corr(x, y)
