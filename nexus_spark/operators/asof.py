"""Generic event-time AS-OF join: for every left row, the most recent
right row at-or-before its timestamp (per key, optionally within a
tolerance) — the point-in-time join every feature store / trade-vs-quote
/ sensor-alignment pipeline needs, and one Spark has no native operator
for. The reference's only as-of shapes are day-of-year climatology
alignment (analysis/webservice DailyDifferenceAverageSparkHandlerImpl —
see operators/daily_difference.py) and tolerance matchup (matchup.py);
this generalizes the same semantics to arbitrary keyed event streams.

Scale design — the union + running-carry formulation, NOT a range join:
tag both sides, union them, and carry the latest right-side payload
forward with one `last(..., ignorenulls=True)` window ordered by
(time, side). ONE shuffle total (the window exchange on the key), no
join node, no candidate blow-up: a range join materializes
O(left x right-in-window) candidate pairs per key before picking the
max, while the carry pass streams each row exactly once — at 100 TB the
cost is a sort within key partitions, the same bound as any sessionize.
Per-key skew is bounded by that key's event count, exactly like every
window operator in the engine.

Tie semantics: a right row AT the left timestamp matches (<=); right
rows sort before left rows at equal time. Contract: the right side must
be unique per (key, time) — pre-aggregate ties (e.g. ARG_MAX by a seq
column) or the carried payload would depend on partition order. This is
the same uniqueness contract DuckDB's native ASOF JOIN and kdb's aj
assume.

NULL-payload safety: the carry moves ONE struct per right row (all
payload columns + the right timestamp together), not one `last()` per
column — a matched right row whose payload value is NULL therefore
carries that NULL forward instead of skipping back to an older right
row's value, which a per-column carry would do (it would stitch a
"frankenrow" mixing fields of different right rows).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              time_col: str, payload_cols: list[str],
              tolerance_s: int | None = None,
              right_time_alias: str = "asof_ts") -> DataFrame:
    """AS-OF LEFT join `right` onto `left`.

    Output: every `left` row + `payload_cols` and `right_time_alias`
    from the matched right row (NULL when no right row at-or-before, or
    when the match is older than `tolerance_s` seconds).
    """
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left: {clash}")

    lcols = [c for c in left.columns
             if c not in key_cols and c != time_col]
    l_tagged = left.select(
        *key_cols, F.col(time_col), F.lit(1).alias("_side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in payload_cols],
        F.lit(None).cast(right.schema[time_col].dataType)
        .alias("_r_ts"))
    r_tagged = right.select(
        *key_cols, F.col(time_col), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        *payload_cols,
        F.col(time_col).alias("_r_ts"))

    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(time_col).asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    # One atomic struct per right row: NULL for left rows, non-NULL for
    # every right row even when individual payload VALUES are NULL, so
    # last(ignorenulls) either carries a whole right row or none of it.
    r_row = F.when(F.col("_side") == 0,
                   F.struct(*[F.col(c) for c in payload_cols],
                            F.col("_r_ts")))
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last(r_row, ignorenulls=True).over(w).alias("_c"))

    in_tol = F.col("_c").isNotNull()
    if tolerance_s is not None:
        # cast through TIMESTAMP: TIMESTAMP_NTZ has no direct long cast,
        # and the session-tz offset cancels in the difference
        def secs(c):
            return F.col(c).cast("timestamp").cast("long")
        in_tol = in_tol & (secs(time_col) - secs("_c._r_ts")
                           <= F.lit(int(tolerance_s)))
    return (carried.where(F.col("_side") == 1)
            .select(*key_cols, time_col, *lcols,
                    *[F.when(in_tol, F.col(f"_c.{c}")).alias(c)
                      for c in payload_cols],
                    F.when(in_tol, F.col("_c._r_ts"))
                    .alias(right_time_alias)))


def asof_nearest(left: DataFrame, right: DataFrame, key_cols: list[str],
                 time_col: str, payload_cols: list[str],
                 tolerance_s: int | None = None,
                 right_time_alias: str = "nearest_ts") -> DataFrame:
    """NEAREST-in-time LEFT join: for every left row, the right row of
    the same key closest in EITHER direction (sensor alignment /
    gap-tolerant enrichment — the two-sided sibling of asof_join).

    Same union + running-carry scale shape, run in both directions:
    one shuffle on the key, two in-partition sorts (ascending carries
    the latest right at-or-before, descending carries the earliest
    right at-or-after — Catalyst reuses the exchange, only the sort
    differs), then one projection picks whichever side is closer.
    Ties (equidistant before/after) resolve to the EARLIER right row —
    a fixed convention so results are engine-replayable. `tolerance_s`
    nulls out matches farther than the tolerance in their direction.
    Carries are struct-atomic like asof_join (NULL payload values ride
    with their row).
    """
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left: {clash}")

    lcols = [c for c in left.columns
             if c not in key_cols and c != time_col]
    l_tagged = left.select(
        *key_cols, F.col(time_col), F.lit(1).alias("_side"),
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in payload_cols],
        F.lit(None).cast(right.schema[time_col].dataType)
        .alias("_r_ts"))
    r_tagged = right.select(
        *key_cols, F.col(time_col), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols],
        *payload_cols,
        F.col(time_col).alias("_r_ts"))

    # right rows sort before left rows at equal time in BOTH directions,
    # so an exactly-simultaneous right row is eligible either way
    wb = (Window.partitionBy(*key_cols)
          .orderBy(F.col(time_col).asc(), F.col("_side").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*key_cols)
          .orderBy(F.col(time_col).desc(), F.col("_side").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    r_row = F.when(F.col("_side") == 0,
                   F.struct(*[F.col(c) for c in payload_cols],
                            F.col("_r_ts")))
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        F.last(r_row, ignorenulls=True).over(wb).alias("_b"),
        F.last(r_row, ignorenulls=True).over(wf).alias("_f"))

    def secs(c):
        return F.col(c).cast("timestamp").cast("long")

    dt_b = secs(time_col) - secs("_b._r_ts")
    dt_f = secs("_f._r_ts") - secs(time_col)
    if tolerance_s is not None:
        tol = F.lit(int(tolerance_s))
        b_ok = F.col("_b").isNotNull() & (dt_b <= tol)
        f_ok = F.col("_f").isNotNull() & (dt_f <= tol)
    else:
        b_ok = F.col("_b").isNotNull()
        f_ok = F.col("_f").isNotNull()
    use_b = b_ok & (~f_ok | (dt_b <= dt_f))
    chosen = F.when(use_b, F.col("_b")).when(f_ok, F.col("_f"))
    return (carried.where(F.col("_side") == 1)
            .withColumn("_c", chosen)
            .select(*key_cols, time_col, *lcols,
                    *[F.col(f"_c.{c}").alias(c) for c in payload_cols],
                    F.col("_c._r_ts").alias(right_time_alias)))
