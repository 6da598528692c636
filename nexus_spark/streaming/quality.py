"""Streaming data-quality gate: the ingest-time enforcement of the
batch expectations suite (operators/validate) — every micro-batch is
routed ROW-level through declarative rules into a route-partitioned
lake directory: passing rows land under route=good, failing rows under
route=quarantine WITH the names of the rules they failed. The batch
gate reports; this gate enforces.

At 100 TB the point is placement: a bad feed is stopped at the arrival
directory, before it reaches dedup signatures, vector indexes or
training shards — all downstream state stays clean, and the quarantine
side is replayable (fix the rule or the data, re-ingest the directory).

Scale shape: rules are plain JVM column predicates evaluated inside
the micro-batch (no Python, no shuffle), and the router is ONE
partitionBy(route) append per micro-batch — a single job, a single
file commit, one pass over the batch. (The first cut filtered the
tagged batch twice into two sink directories; merging the sinks halved
the per-batch commit latency, which dominated the drain on small
batches.) Routing is micro-batch-partitioning-independent (row-level
rules, no cross-row state), which is what makes the executed stream's
output exactly replayable by a batch oracle; downstream readers get
partition pruning on the route column for free.
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
                        base_dir: str, checkpoint: str):
    """Start a foreachBatch router: every row lands in ONE partitioned
    append under `base_dir` — route=good for rows passing ALL rules
    (fails=''), route=quarantine for the rest with `fails` naming the
    failed rules. Returns the StreamingQuery (caller drains it)."""
    clash = {"fails", "route"} & set(stream_df.columns)
    if clash:
        # withColumn would silently overwrite user data and the route
        # partition column would collide with an input column.
        raise ValueError(
            f"stream columns {sorted(clash)} are reserved by the "
            "quality gate ('fails', 'route') — rename them upstream")
    fails = fails_column(rules)

    def step(batch_df: DataFrame, _batch_id: int) -> None:
        (batch_df
         .withColumn("fails", fails)
         .withColumn("route",
                     F.when(F.col("fails") == "", F.lit("good"))
                     .otherwise(F.lit("quarantine")))
         .write.mode("append").partitionBy("route").parquet(base_dir))

    return (stream_df.writeStream.foreachBatch(step)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True).start())
