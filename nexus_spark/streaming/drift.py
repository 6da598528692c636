"""Streaming distribution-drift monitoring.

The production shape: an ingest stream's category counts (length deciles,
source shares, language mix) accumulate into a tiny append-only store as
micro-batches commit; a monitor scores each arrival window's distribution
against a frozen baseline snapshot with PSI (population stability index —
the standard drift score; same smoothing as text.distribution_drift).

Counts are associative and the store is keyed by DATA-derived window
columns (not batch ids), so the merged result is independent of
micro-batch boundaries and arrival order — which is what makes an
executed stream's drift output exactly replayable by a batch oracle.

At 100 TB: the per-batch aggregate is a map-side-combined groupBy over
the micro-batch only; the store grows by (windows x categories) rows per
batch — a compaction-friendly kilobyte-scale append, never the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_category_counts(stream_df: DataFrame, group_cols: list[str],
                           out_dir: str, checkpoint: str):
    """Start a foreachBatch job appending per-micro-batch category counts
    to `out_dir`. Returns the StreamingQuery (caller drains it)."""
    def step(batch_df: DataFrame, _batch_id: int) -> None:
        (batch_df.groupBy(*group_cols).count()
         .write.mode("append").parquet(out_dir))

    return (stream_df.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())


def merged_counts(spark: SparkSession, out_dir: str,
                  group_cols: list[str]) -> DataFrame:
    """Merge the appended per-batch counts back to one count per key."""
    return (spark.read.parquet(out_dir)
            .groupBy(*group_cols).agg(F.sum("count").alias("cnt")))


def psi_vs_baseline(baseline: DataFrame, observed: DataFrame,
                    window_col: str = "day",
                    category_col: str = "score") -> DataFrame:
    """Per-window PSI of observed category counts against a baseline.

    baseline: (category_col, cnt) — the frozen snapshot distribution.
    observed: (window_col, category_col, cnt) — merged stream counts.

    Laplace-0.5 smoothing over the per-window category union, identical
    to text.distribution_drift so the two monitors report on one scale.
    Output: window, category, frac_base, frac_obs, psi_term, psi
    (per-window total). The grid is (windows x categories) rows — always
    broadcast-sized regardless of corpus size.
    """
    from pyspark.sql import Window as W

    days = observed.select(window_col).distinct()
    grid = (days.crossJoin(
        baseline.withColumnRenamed("cnt", "cnt_a"))
        .join(observed.withColumnRenamed("cnt", "cnt_b"),
              [window_col, category_col], "full")
        .select(window_col, category_col,
                F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
                F.coalesce("cnt_b", F.lit(0)).alias("cnt_b")))
    w = W.partitionBy(window_col)
    pa = ((F.col("cnt_a") + 0.5)
          / (F.sum("cnt_a").over(w) + 0.5 * F.count(F.lit(1)).over(w)))
    pb = ((F.col("cnt_b") + 0.5)
          / (F.sum("cnt_b").over(w) + 0.5 * F.count(F.lit(1)).over(w)))
    g = grid.select(window_col, category_col,
                    pa.alias("frac_base"), pb.alias("frac_obs"))
    term = ((F.col("frac_base") - F.col("frac_obs"))
            * F.log(F.col("frac_base") / F.col("frac_obs")))
    return (g.withColumn("psi_term", term)
            .withColumn("psi", F.sum("psi_term").over(w)))
