"""Streaming data-quality gate: the ingest-time enforcement of the
batch expectations suite (operators/validate) — every micro-batch is
routed ROW-level through declarative rules, passing rows append to the
lake, failing rows append to a quarantine directory WITH the names of
the rules they failed. The batch gate reports; this gate enforces.

At 100 TB the point is placement: a bad feed is stopped at the arrival
directory, before it reaches dedup signatures, vector indexes or
training shards — all downstream state stays clean, and the quarantine
side is replayable (fix the rule or the data, re-ingest the directory).

Scale shape: rules are plain JVM column predicates evaluated inside
the micro-batch (no Python, no shuffle — the router is two filters over
the batch); per-batch output is two appends. Routing is
micro-batch-partitioning-independent (row-level rules, no cross-row
state), which is what makes the executed stream's output exactly
replayable by a batch oracle.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fails_column(rules: list[tuple[str, Column]]) -> Column:
    """Comma-joined names of FAILED rules, in declaration order; ''
    when every rule passes. A rule with a NULL verdict counts as
    failed (NULL n_chars is not 'in range')."""
    return F.concat_ws(",", *[
        F.when(cond, F.lit(None).cast("string")).otherwise(F.lit(name))
        for name, cond in rules])


def stream_quality_gate(stream_df: DataFrame,
                        rules: list[tuple[str, Column]],
                        good_dir: str, quarantine_dir: str,
                        checkpoint: str):
    """Start a foreachBatch router: rows passing ALL rules append to
    `good_dir` (original schema); the rest append to `quarantine_dir`
    with a `fails` column naming the failed rules. Returns the
    StreamingQuery (caller drains it)."""
    fails = fails_column(rules)

    def step(batch_df: DataFrame, _batch_id: int) -> None:
        tagged = batch_df.withColumn("_fails", fails).persist()
        try:
            (tagged.where(F.col("_fails") == "").drop("_fails")
             .write.mode("append").parquet(good_dir))
            (tagged.where(F.col("_fails") != "")
             .withColumnRenamed("_fails", "fails")
             .write.mode("append").parquet(quarantine_dir))
        finally:
            tagged.unpersist()

    return (stream_df.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
