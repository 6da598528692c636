"""Partitioned Parquet lake layout — the rebuild's replacement for the
reference's Solr index + Cassandra blob store.

Layout: observations partitioned by (dataset, obs_date). What Solr did for
the reference (reference: data-access/nexustiles/dao/SolrProxy.pyx — bbox /
time / dataset predicate pushdown against an external index) is done here by
three native mechanisms:

1. partition pruning on dataset/obs_date directories (time + dataset
   predicates never touch excluded files),
2. parquet row-group min/max statistics (zone maps) for lat/lon/value,
3. column pruning via the scan's ReadSchema.

delete-by-query (reference: tools/deletebyquery/deletebyquery.py:51-120 —
coordinated Solr+Cassandra deletes) becomes a partition-level overwrite: no
two-store consistency problem exists.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def zorder_key(lat, lon, bits: int = 16):
    """Morton (Z-curve) interleave of quantized (lat, lon) — a single
    long whose sort order keeps spatially-close cells close in the file.

    Pure Catalyst bit arithmetic (shiftleft/or over `bits` positions, no
    UDF): lat/lon are scaled to [0, 2^bits) fixed-point, then their bits
    interleaved. 16 bits/axis ≈ 0.003° cells — far below any tile size.
    """
    qlat = F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << bits)))
        .cast("long")))
    qlon = F.least(F.lit((1 << bits) - 1), F.greatest(F.lit(0), F.floor(
        (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << bits)))
        .cast("long")))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (z
             .bitwiseOR(F.shiftleft(F.shiftright(qlat, i)
                                    .bitwiseAND(F.lit(1)), 2 * i + 1))
             .bitwiseOR(F.shiftleft(F.shiftright(qlon, i)
                                    .bitwiseAND(F.lit(1)), 2 * i)))
    return z


def write_observations(obs: DataFrame, path: str,
                       mode: str = "overwrite",
                       zorder: bool = False,
                       options: dict | None = None) -> None:
    """Write the long-format observations partitioned by (dataset, date).

    `zorder=True` adds the 100 TB co-location pass: rows are sorted
    within partitions by the Morton key of (lat, lon), so parquet
    row-group min/max statistics (the zone maps the scan prunes on)
    become tight boxes instead of full-extent ranges — a bbox predicate
    then skips most row groups instead of none. Costs one sort at write
    time, nothing at read time; the directory scheme is what partition
    pruning keys on either way.
    """
    out = obs.withColumn("obs_date", F.to_date("time"))
    if zorder:
        out = (out.withColumn("_z", zorder_key(F.col("lat"), F.col("lon")))
               .sortWithinPartitions("dataset", "obs_date", "_z")
               .drop("_z"))
    writer = out.write.mode(mode)
    if options:
        writer = writer.options(**options)
    writer.partitionBy("dataset", "obs_date").parquet(path)
    _invalidate_views(path)


def read_observations(spark: SparkSession, path: str) -> DataFrame:
    """Read back with the partition columns restored into query shape."""
    df = spark.read.parquet(path)
    return df.drop("obs_date")  # time column still carries full fidelity


def delete_partitions(spark: SparkSession, path: str, dataset: str,
                      start_date: str | None = None,
                      end_date: str | None = None) -> int:
    """Delete-by-query at partition granularity: remove (dataset, date)
    directories matching the predicate. Returns directories removed.

    Partition-aligned deletes need no rewrite; sub-partition predicates
    would be an overwrite of the affected partitions (read-filter-rewrite),
    which `write_observations(mode='overwrite')` covers.
    """
    removed = 0
    ds_dir = os.path.join(path, f"dataset={dataset}")
    if not os.path.isdir(ds_dir):
        return 0
    for entry in sorted(os.listdir(ds_dir)):
        if not entry.startswith("obs_date="):
            continue
        date_val = entry.split("=", 1)[1]
        if start_date is not None and date_val < start_date:
            continue
        if end_date is not None and date_val > end_date:
            continue
        shutil.rmtree(os.path.join(ds_dir, entry))
        removed += 1
    if removed:
        _invalidate_views(path)
    return removed


def compact_partitions(spark: SparkSession, path: str,
                       target_bytes: int = 128 * 1024 * 1024,
                       min_files: int = 2) -> dict[str, int]:
    """Small-file compaction pass for a partitioned lake — the
    maintenance job every streaming-ingested table needs (each
    micro-batch append leaves one file per trigger per partition; at
    100 TB a year of 5-minute triggers is millions of kilobyte files
    whose open/footer cost dwarfs the data read).

    Per leaf partition directory holding >= `min_files` parquet files:
    read the partition, coalesce to ceil(bytes / target_bytes) files,
    write to a sibling tmp dir, then atomically swap directories. Only
    rewrites partitions that need it — an already-compacted partition
    (or one actively small) is untouched, so the pass is incremental
    and re-runnable. Row contents are preserved exactly (coalesce, no
    shuffle, no reordering guarantee needed by the layout contract).

    Returns {partition_relpath: files_before} for the rewritten
    partitions.
    """
    import math

    done: dict[str, int] = {}
    for dirpath, _dirnames, filenames in os.walk(path):
        parts = [f for f in filenames if f.endswith(".parquet")]
        if len(parts) < min_files or os.path.basename(
                dirpath).startswith("_"):
            continue
        size = sum(os.path.getsize(os.path.join(dirpath, f))
                   for f in parts)
        n_out = max(1, math.ceil(size / target_bytes))
        if n_out >= len(parts):
            continue
        tmp = dirpath + "._compact_tmp"
        (spark.read.parquet(dirpath).coalesce(n_out)
         .write.mode("overwrite").parquet(tmp))
        old = dirpath + "._compact_old"
        os.rename(dirpath, old)
        os.rename(tmp, dirpath)
        shutil.rmtree(old)
        done[os.path.relpath(dirpath, path)] = len(parts)
    if done:
        _invalidate_views(path)
    return done


def _invalidate_views(path: str) -> None:
    """Drop any session-memoized derived frames built over this directory —
    a rewritten/deleted lake path must never be served from a stale cache."""
    from nexus_spark import domain

    domain.invalidate(sf_dir=path)


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 16, sort: bool = True) -> None:
    """Write a hash-bucketed (optionally bucket-sorted) managed table —
    the co-located-join layout for fact-fact joins at scale.

    Bucketing pre-shuffles ONCE at write time: every subsequent equi-join
    or aggregation on `key` between tables bucketed the same way runs with
    ZERO Exchange (Spark's bucket spec matches the join's required
    distribution), turning the recurring 100 TB shuffle of a fact-fact
    join into a write-time cost paid once at ingest. sortBy additionally
    enables sort-merge joins without a per-query sort.

    Uses saveAsTable (bucket metadata lives in the session catalog —
    plain parquet paths cannot carry a bucket spec).
    """
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").mode("overwrite").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (possibly bucketed) table back from the catalog."""
    return spark.table(table)


def write_corpus_shards(df: DataFrame, path: str, n_shards: int = 8,
                        seed: str = "r4", id_col: str = "doc_id",
                        fmt: str = "json") -> None:
    """Materialize a curated corpus as N well-mixed training shards —
    the physical counterpart of sampling.shuffle_shards: one
    `shard=<i>/` directory per shard, rows written in the deterministic
    within-shard permutation order (pos_in_shard), default JSONL (the
    dataloader-native format; pass fmt='parquet' for columnar shards).

    The repartition-on-shard + sortWithinPartitions IS the shard write's
    natural physical plan (one hash shuffle + per-shard sort — the same
    cost the assignment rank pays), so the export adds no extra pass.
    Re-running with the same seed rewrites byte-identical shard
    contents: the export is reproducible end to end.
    """
    from nexus_spark.operators.sampling import shuffle_shards

    sharded = shuffle_shards(df, n_shards=n_shards, seed=seed,
                             id_col=id_col)
    (sharded.repartition(n_shards, "shard")
     .sortWithinPartitions("shard", "pos_in_shard")
     .write.mode("overwrite").partitionBy("shard").format(fmt).save(path))


def write_shard_manifest(spark: SparkSession, path: str,
                         tokens_col: str | None = None,
                         fmt: str = "json") -> DataFrame:
    """Write `<path>/_manifest` (parquet, underscore-prefixed so shard
    reads skip it) summarizing a write_corpus_shards export: one row per
    shard with row count and optional token total — the audit artifact a
    training run records next to its shards. Returns the manifest frame.

    `fmt` must match the export's format (write_corpus_shards' own
    default is json) — declared by the caller, not sniffed from the
    filesystem, so the manifest works on any Hadoop-compatible path
    (object store, HDFS), not just local disk.

    One aggregate over the shard partition column (partition-pruned
    columnar scan), written by the executors — no driver-side collect.
    """
    from pyspark.sql import functions as F

    shards = spark.read.format(fmt).load(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if tokens_col and tokens_col in shards.columns:
        aggs.append(F.sum(tokens_col).alias("n_tokens"))
    manifest = shards.groupBy("shard").agg(*aggs)
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def merge_upsert(current: DataFrame, updates: DataFrame,
                 key_cols: list[str], seq_col: str = "seq",
                 op_col: str = "op") -> DataFrame:
    """Latest-wins CDC merge (the MERGE INTO / upsert primitive):
    `updates` carries per-row (op, seq) where op is 'U' (upsert) or 'D'
    (delete) and seq orders changes to the same key; the highest-seq
    change wins, a winning 'D' removes the key, keys untouched by
    updates pass through.

    Relational plan: union the base (as seq = -1 implicit 'U') with the
    change rows, ONE window over the key ordered by seq descending,
    keep rank 1 where the winner is not a delete. A single shuffle on
    the key — the same cost as the join a MERGE would do, with no
    driver-side state. At 100 TB the base side is never rewritten
    wholesale: `merge_into_partitions` prunes to the partitions the
    batch actually touches and this plan runs per affected partition.

    Output: the merged table with exactly `current`'s columns.
    """
    data_cols = [c for c in current.columns]
    base = (current.withColumn("_seq", F.lit(-1).cast("long"))
            .withColumn("_op", F.lit("U")))
    ups = (updates.withColumn("_seq", F.col(seq_col).cast("long"))
           .withColumn("_op", F.col(op_col))
           .select(*data_cols, "_seq", "_op"))
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc())
    return (base.select(*data_cols, "_seq", "_op").unionByName(ups)
            .withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("_op") != "D"))
            .select(*data_cols))


def merge_into_partitions(spark: SparkSession, path: str,
                          updates: DataFrame,
                          key_cols: list[str] | None = None,
                          seq_col: str = "seq",
                          op_col: str = "op") -> int:
    """Physical partition-pruned MERGE into the (dataset, obs_date)
    lake: only the partitions the update batch touches are read, merged
    (`merge_upsert`) and rewritten via DYNAMIC partition overwrite —
    untouched partitions are never opened. This is the idempotent
    ingest/correction path a 100 TB lake needs: cost scales with the
    batch's partition footprint, not the table size.

    `updates` must carry the observation columns plus (seq, op); keys
    default to (dataset, time, lat, lon). Returns the number of
    partitions rewritten.
    """
    keys = key_cols or ["dataset", "time", "lat", "lon"]
    ups = updates.withColumn("obs_date", F.to_date("time"))
    parts = [tuple(r) for r in ups.select(
        "dataset", F.col("obs_date").cast("string")).distinct().collect()]
    if not parts:
        return 0
    pred = F.lit(False)
    for ds, d in parts:
        pred = pred | ((F.col("dataset") == ds)
                       & (F.col("obs_date") == F.lit(d).cast("date")))
    cur = spark.read.parquet(path).where(pred)
    data_cols = [c for c in cur.columns]
    merged = merge_upsert(
        cur, ups.select(*data_cols, seq_col, op_col), keys,
        seq_col, op_col)
    # The merged plan READS the files the overwrite is about to replace —
    # materialize it first (bounded by the batch's partition footprint,
    # never the table) or the scan races its own deletes.
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (merged.write.mode("overwrite")
         .partitionBy("dataset", "obs_date").parquet(path))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # The checkpoint existed only to outlive the files it replaced;
        # after the write (or its failure) nothing references it —
        # release the blocks eagerly so a long CDC ingest session does
        # not hold one batch-sized orphan per commit until a driver GC
        # (round-11, same class as the CC loop intermediates).
        from nexus_spark.operators.dedup import _release_checkpoint
        _release_checkpoint(merged)
    _invalidate_views(path)
    return len(parts)
