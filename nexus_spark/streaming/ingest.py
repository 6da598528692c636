"""Continuous granule ingest: watch a directory, tile new granules, append
to the partitioned lake.

Reference: the Spring-XD message pipeline (SURVEY §2.4 row 1; nexus-ingest
tilereadingprocessor.py) — granules arrive, get sliced into tiles, land in
the store. The Spark-native equivalent is a file-source Structured
Streaming query: `binaryFile` discovers new granules exactly-once via the
checkpoint log, the same pure-struct NetCDF parser used by the batch
reader (sources/granule.py) tiles each granule inside `mapInPandas`, and
`foreachBatch` appends through sources.lake.write_observations so the
streaming lake layout is byte-identical to the batch one (partition
pruning, zone maps and all).

Scale shape: one task per granule file (binaryFile splits at file
boundaries for unsplittable content), parse + tile entirely executor-side,
append writes only the touched (dataset, obs_date) partitions. No shuffle
anywhere in the pipeline; throughput is bounded by granule-read
parallelism, exactly like the batch reader.
"""

from __future__ import annotations

import sys
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

INGEST_SCHEMA = ("granule string, section_spec string, dataset string, "
                 "time timestamp, lat double, lon double, value double")


def stream_granules(spark: SparkSession, watch_dir: str, variable: str,
                    dataset: str, latitude: str = "lat",
                    longitude: str = "lon", time: str | None = None,
                    tile_shape: dict[str, int] | None = None,
                    time_offset: int | None = None,
                    reader: str = "GRIDTILE",
                    max_files_per_trigger: int | None = None,
                    glob: str = "*.nc") -> DataFrame:
    """Streaming frame of tiled observation rows from granules appearing
    under `watch_dir`.

    Unlike the batch reader (whose work list carries explicit section
    specs), a watched granule's specs aren't known up front — each task
    parses its granule's dims and auto-tiles them with
    granule.section_specs (`tile_shape` chunks named dims; absent dims
    stay whole), then emits through the same GRIDTILE/SWATHTILE slicers.
    """
    from nexus_spark.sources import granule as g

    # Worker closure references the granule parser module; ship it by
    # value so executors need no --py-files deployment (same mechanism as
    # sources/edge.py).
    import pyspark.cloudpickle as _cp
    _cp.register_pickle_by_value(sys.modules[g.__name__])

    if reader not in ("GRIDTILE", "SWATHTILE"):
        raise NotImplementedError(
            f"READER must be GRIDTILE or SWATHTILE, got {reader!r}")
    if reader == "SWATHTILE" and time is None:
        raise ValueError("SWATHTILE requires a time variable")
    emit = g._emit_grid if reader == "GRIDTILE" else g._emit_swath
    parse = g.parse_netcdf3
    make_specs = g.section_specs
    tiling = dict(tile_shape or {})

    # binaryFile's schema is fixed by the format, but the streaming source
    # still demands it explicitly.
    src = spark.readStream.format("binaryFile") \
        .schema("path string, modificationTime timestamp, "
                "length long, content binary") \
        .option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", str(max_files_per_trigger))

    def tile_granules(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                nc = parse(bytes(content))
                gname = str(path).rsplit("/", 1)[-1]
                data_dims = {d: nc["dims"][d]
                             for d in nc["variables"][variable]["dims"]}
                for spec in make_specs(data_dims, tiling):
                    dimtoslice = {}
                    for dimension in spec.split(","):
                        nm, lo, hi = dimension.split(":")
                        dimtoslice[nm] = slice(int(lo), int(hi))
                    t_s, lats, lons, vals = emit(
                        nc, spec, dimtoslice, variable, latitude,
                        longitude, time, time_offset)
                    yield pd.DataFrame({
                        "granule": gname, "section_spec": spec,
                        "dataset": dataset,
                        "time": pd.to_datetime(t_s, unit="s"),
                        "lat": lats, "lon": lons, "value": vals,
                    })

    return src.load(watch_dir).select("path", "content") \
              .mapInPandas(tile_granules, INGEST_SCHEMA)


def ingest_to_lake(rows: DataFrame, lake_path: str, checkpoint: str,
                   available_now: bool = True) -> StreamingQuery:
    """Append the streaming tile rows to the lake through the SAME writer
    the batch path uses (sources/lake.write_observations — dataset/obs_date
    partition layout), via foreachBatch. The checkpoint log is the
    exactly-once contract: a granule file is tiled and appended once even
    across restarts.

    `available_now=True` drains everything currently in the watch dir and
    stops (the test/backfill trigger); False runs continuously.
    """
    from nexus_spark.sources.lake import write_observations

    def append_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        write_observations(batch.drop("granule", "section_spec"),
                           lake_path, mode="append")

    writer = (rows.writeStream.foreachBatch(append_batch)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_compact(state: DataFrame, batch: DataFrame,
                key_cols: list[str], seq_col: str = "seq",
                op_col: str = "op") -> DataFrame:
    """One CDC apply step: latest-change-wins over state ∪ batch,
    TOMBSTONES RETAINED. Keeping the winning 'D' row in state (rather
    than dropping the key) is what makes the apply order-independent:
    a late-arriving lower-seq update can never resurrect a deleted key,
    so any micro-batch partitioning of the same change set converges to
    the same state (the compaction semantics log-structured stores use).
    Readers filter op != 'D' (`read_cdc_state`).

    Tie-breaking is fully deterministic so the convergence guarantee
    holds even for ill-behaved feeds that reuse a seq per key: equal-seq
    ties resolve delete-first (a tombstone is terminal, so 'D' beats a
    same-seq 'U'), then by a stable hash of the whole row — never by
    partition-order row_number, which would make the winner depend on
    micro-batch layout."""
    from pyspark.sql import Window

    cols = state.columns
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc(),
        F.xxhash64(*cols).asc())
    return (state.unionByName(batch.select(*cols))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


def _state_fs(spark: SparkSession, state_dir: str):
    """(Hadoop FileSystem, jvm) for `state_dir` — works for local paths
    in tests and for HDFS/object-store URIs on a cluster."""
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jvm


def _committed_versions(spark: SparkSession, state_dir: str) -> list[int]:
    """Version numbers of COMMITTED state snapshots under `state_dir`:
    v{N} directories that contain the parquet committer's _SUCCESS
    marker. A directory without the marker is an interrupted write and
    is invisible to readers."""
    fs, jvm = _state_fs(spark, state_dir)
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (st.isDirectory() and name.startswith("v")
                and name[1:].isdigit()
                and fs.exists(jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS"))):
            out.append(int(name[1:]))
    return sorted(out)


def resolve_cdc_state(spark: SparkSession, state_dir: str) -> str:
    """Path of the newest committed state snapshot: the highest
    _SUCCESS-marked v{N} directory, or `state_dir` itself for the seeded
    base-snapshot layout (plain parquet files, no versions yet)."""
    versions = _committed_versions(spark, state_dir)
    return (f"{state_dir}/v{versions[-1]:08d}" if versions
            else state_dir)


def stream_cdc_apply(changes: DataFrame, state_dir: str, checkpoint: str,
                     key_cols: list[str], seq_col: str = "seq",
                     op_col: str = "op", available_now: bool = True,
                     keep_versions: int = 2) -> StreamingQuery:
    """Continuously apply a CDC change stream to a persistent state
    table via foreachBatch — the streaming MERGE INTO. `state_dir` must
    be pre-seeded with the base snapshot (base rows carry seq below any
    change seq, op='U').

    Each commit compacts state ∪ micro-batch to one winning row per key
    (`cdc_compact`) and publishes it as a NEW snapshot version
    `state_dir/v{N}` — never an in-place overwrite of files a reader (or
    the merge plan itself) may hold open. The _SUCCESS marker the
    parquet committer writes is the commit point: a crash mid-write
    leaves an uncommitted directory that `resolve_cdc_state` ignores,
    the previous version (and the seeded base) stay intact, and the
    checkpoint replay overwrites the partial directory — so recovery is
    exactly-once with no lost state. The last `keep_versions` committed
    snapshots are retained; older ones are pruned after each commit.
    At 100 TB the rewrite is partition-pruned
    (lake.merge_into_partitions): cost follows the batch's partition
    footprint, not the table.

    Retention / read-latency contract: `read_cdc_state` resolves the
    snapshot path at PLAN time but executes lazily, so pruning can
    delete a snapshot a concurrent reader's DataFrame still references.
    `keep_versions` must therefore be >= 2 (enforced): a reader that
    planned against version N stays valid until at least version N+1
    has committed AND a further commit prunes N — i.e. for at least one
    full commit interval. Readers that may lag more than
    `keep_versions - 1` commits between planning and executing must
    either raise `keep_versions` accordingly or re-resolve (call
    `read_cdc_state` again) per action.
    """
    if keep_versions < 2:
        raise ValueError(
            f"keep_versions must be >= 2, got {keep_versions}: pruning "
            "the only previous snapshot would break concurrent readers "
            "whose plans still reference it (see retention contract)")

    def step(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        cur = spark.read.parquet(resolve_cdc_state(spark, state_dir))
        merged = cdc_compact(cur, batch, key_cols, seq_col, op_col)
        versions = _committed_versions(spark, state_dir)
        nxt = (versions[-1] if versions else 0) + 1
        # overwrite mode cleans a partial directory left by a crashed
        # attempt of this same version before rewriting it
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/v{nxt:08d}")
        fs, jvm = _state_fs(spark, state_dir)
        for old in _committed_versions(spark, state_dir)[:-keep_versions]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(
                f"{state_dir}/v{old:08d}"), True)

    writer = (changes.writeStream.foreachBatch(step)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_state(spark: SparkSession, state_dir: str,
                   op_col: str = "op") -> DataFrame:
    """The live view of a CDC state table: winners minus tombstones,
    read from the newest committed snapshot version."""
    return (spark.read.parquet(resolve_cdc_state(spark, state_dir))
            .where(F.col(op_col) != "D"))
