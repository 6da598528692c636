"""SparkSession bootstrap with scale-minded defaults.

The reference shares one SparkContext across all handlers (FAIR scheduler,
6g executors — reference: analysis/webservice/webapp.py:210-225). We keep the
shared-session idea but let AQE own partition sizing instead of the
reference's hand-rolled heuristics (<=1500 tiles/partition etc.,
reference: analysis/webservice/algorithms_spark/HofMoellerSpark.py:132-138).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-level knobs that are safe (and important) to apply even to a
# session we did not create: deterministic UTC time semantics and
# Arrow-accelerated pandas interchange.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events fixture stores TIMESTAMP(NANOS); Spark 4 rejects nanos
    # unless read as long (catalog.load_table converts back to timestamp).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Constraint propagation is O(n^2)+ in projection width during
    # optimization: on the 64-column flat-vector self-joins
    # (operators/similarity.py) getAllValidConstraints spends MINUTES in
    # semanticEquals once no cached subtree truncates the plan. Our
    # filters are all explicit — the inferred constraints buy nothing.
    "spark.sql.constraintPropagation.enabled": "false",
}


def get_session(
    app_name: str = "nexus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster the master comes
    from spark-submit and these configs still apply.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("NEXUS_SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode runs every executor thread inside the driver JVM,
        # whose default 1g heap OOMs ~10x above the test scale; size it
        # like the reference's 6g executors scaled to 32 threads
        # (webapp.py:210-225). Applies only when this call creates the
        # JVM; a cluster deployment sets memory via spark-submit.
        .config("spark.driver.memory",
                os.environ.get("NEXUS_SPARK_DRIVER_MEMORY", "16g"))
        # Let AQE coalesce small shuffle partitions and split skewed ones at
        # runtime — this is what replaces the reference's manual partition
        # count heuristics, and what makes the same plan survive 100x data.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Columnar parquet IO: pushdown + pruning are the Solr-index analog.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Python<->JVM interchange is Arrow-batched everywhere.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # 512m code cache: a 130+-query session of 64-column whole-stage
        # codegen can exhaust the 240m default, after which the JVM
        # disables the JIT and execution falls back to the interpreter in
        # sustained multi-second windows (observed as roving steady-run
        # inflations late in full sweeps that never reproduce in
        # isolation).
        .config("spark.driver.extraJavaOptions",
                "-Djava.net.preferIPv4Stack=true "
                "-XX:ReservedCodeCacheSize=512m")
    )
    spark = builder.getOrCreate()
    tune(spark)
    return spark


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (e.g. the driver's)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment; proceed with its value
    return spark
