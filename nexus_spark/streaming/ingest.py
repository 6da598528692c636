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


def _committed_dirs(spark: SparkSession, state_dir: str,
                    prefix: str) -> list[int]:
    """Numbers of COMMITTED `{prefix}{N:08d}` directories under
    `state_dir` — those holding the parquet committer's _SUCCESS
    marker. A directory without the marker is an interrupted write and
    is invisible to readers."""
    fs, jvm = _state_fs(spark, state_dir)
    root = jvm.org.apache.hadoop.fs.Path(state_dir)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (st.isDirectory() and name.startswith(prefix)
                and name[len(prefix):].isdigit()
                and fs.exists(jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "_SUCCESS"))):
            out.append(int(name[len(prefix):]))
    return sorted(out)


def _committed_versions(spark: SparkSession, state_dir: str) -> list[int]:
    """Committed BASE snapshots `v{D}`: each covers every delta with
    number <= D (its name is the highest delta folded into it)."""
    return _committed_dirs(spark, state_dir, "v")


def _committed_deltas(spark: SparkSession, state_dir: str) -> list[int]:
    """Committed DELTA commits `d{N}`: one micro-batch each, appended
    by `stream_cdc_apply` in O(batch)."""
    return _committed_dirs(spark, state_dir, "d")


_CDC_SPEC_FILE = "_cdc_spec.json"


def _write_cdc_spec(spark: SparkSession, state_dir: str,
                    key_cols: list[str], seq_col: str,
                    op_col: str) -> None:
    """Persist the merge spec next to the data so the state table is
    self-describing (the moral equivalent of a Delta/Iceberg table
    protocol file): any reader can resolve the live view without being
    told the key columns. Content is deterministic per deployment, so
    the overwrite is idempotent across stream restarts."""
    import json

    fs, jvm = _state_fs(spark, state_dir)
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(state_dir))
    out = fs.create(jvm.org.apache.hadoop.fs.Path(
        state_dir, _CDC_SPEC_FILE), True)
    try:
        out.write(bytearray(json.dumps(
            {"key_cols": key_cols, "seq_col": seq_col,
             "op_col": op_col}).encode()))
    finally:
        out.close()


def _read_cdc_spec(spark: SparkSession, state_dir: str) -> dict | None:
    import json

    fs, jvm = _state_fs(spark, state_dir)
    p = jvm.org.apache.hadoop.fs.Path(state_dir, _CDC_SPEC_FILE)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def resolve_cdc_sources(spark: SparkSession,
                        state_dir: str) -> tuple[str, list[str]]:
    """(base_path, pending_delta_paths) for the live view: the newest
    committed base snapshot (or the seeded `state_dir` root when no
    fold has committed yet) plus every committed delta the base does
    not cover."""
    bases = _committed_versions(spark, state_dir)
    cover = bases[-1] if bases else -1
    base = f"{state_dir}/v{cover:08d}" if bases else state_dir
    pend = [f"{state_dir}/d{n:08d}"
            for n in _committed_deltas(spark, state_dir) if n > cover]
    return base, pend


def resolve_cdc_state(spark: SparkSession, state_dir: str) -> str:
    """Path of the newest committed BASE snapshot (highest
    _SUCCESS-marked v{D} directory), or `state_dir` itself for the
    seeded layout. NOTE: since the merge-on-read rework the base alone
    is the live state only when `resolve_cdc_sources` reports no
    pending deltas — use `read_cdc_state` for the live view."""
    versions = _committed_versions(spark, state_dir)
    return (f"{state_dir}/v{versions[-1]:08d}" if versions
            else state_dir)


def _base_df(spark: SparkSession, state_dir: str,
             base: str) -> DataFrame:
    """Read a base snapshot. The seeded ROOT base shares its directory
    with d{N}/v{D} commit subdirectories, which Spark's directory
    listing would misread as a partition layout — so the root base is
    read as its explicit top-level data-file list instead."""
    if base != state_dir:
        return spark.read.parquet(base)
    fs, jvm = _state_fs(spark, state_dir)
    files = []
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(state_dir)):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            files.append(f"{state_dir}/{name}")
    return spark.read.parquet(*files)


def stream_cdc_apply(changes: DataFrame, state_dir: str, checkpoint: str,
                     key_cols: list[str], seq_col: str = "seq",
                     op_col: str = "op", available_now: bool = True,
                     keep_versions: int = 2,
                     compact_every: int = 8) -> StreamingQuery:
    """Continuously apply a CDC change stream to a persistent state
    table via foreachBatch — the streaming MERGE INTO, MERGE-ON-READ
    (the LSM / Iceberg-delta shape). `state_dir` must be pre-seeded
    with the base snapshot (base rows carry seq below any change seq,
    op='U').

    Each commit appends ONLY the micro-batch as a new delta directory
    `state_dir/d{N}` — O(batch) per commit, independent of both the
    table size and the batch's key spread (a copy-on-write snapshot
    rewrite costs O(table) per commit for uniformly-spread keys, the
    common CDC case). Readers (`read_cdc_state`) resolve the live view
    as latest-change-wins over base ∪ pending deltas — the identical
    `cdc_compact` semantics, so any batching converges to the same
    state. Read amplification is bounded: once `compact_every` deltas
    are pending, the commit FOLDS them into a new base snapshot
    `state_dir/v{D}` (D = highest folded delta), amortizing the
    O(state) rewrite over `compact_every` commits.

    The _SUCCESS marker the parquet committer writes is the commit
    point for deltas and bases alike: a crash mid-write leaves an
    uncommitted directory invisible to `resolve_cdc_sources`, and the
    checkpoint replay re-applies the batch. A replayed batch may land
    as a duplicate delta; latest-wins with fully deterministic
    tie-breaking (seq, op, whole-row hash — `cdc_compact`) collapses
    duplicates to the identical winner, so recovery is exactly-once in
    effect.

    Retention / read-latency contract: readers resolve paths at PLAN
    time but execute lazily, so pruning must never delete a path a
    recently-planned view references. The last `keep_versions`
    committed bases are retained (>= 2 enforced), and a delta is pruned
    only once the OLDEST retained base covers it — so every retained
    base can still serve its full live view, and a reader that planned
    against base B + pending deltas stays valid until at least
    `keep_versions - 1` further folds have committed. Readers that may
    lag longer must raise `keep_versions` or re-resolve per action.
    """
    if keep_versions < 2:
        raise ValueError(
            f"keep_versions must be >= 2, got {keep_versions}: pruning "
            "the only previous snapshot would break concurrent readers "
            "whose plans still reference it (see retention contract)")
    if compact_every < 1:
        raise ValueError(
            f"compact_every must be >= 1, got {compact_every}")

    spec_written = False

    def step(batch: DataFrame, _epoch: int) -> None:
        nonlocal spec_written
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        if not spec_written:
            _write_cdc_spec(spark, state_dir, key_cols, seq_col, op_col)
            spec_written = True
        bases = _committed_versions(spark, state_dir)
        deltas = _committed_deltas(spark, state_dir)
        cover = bases[-1] if bases else -1
        nxt = max(deltas + [cover]) + 1
        # overwrite mode cleans a partial directory left by a crashed
        # attempt of this same delta before rewriting it
        batch.write.mode("overwrite").parquet(f"{state_dir}/d{nxt:08d}")

        pending = [n for n in _committed_deltas(spark, state_dir)
                   if n > cover]
        if len(pending) < compact_every:
            return
        # fold: base ∪ pending deltas -> new base v{max(pending)}.
        # At 100 TB this is the compaction pass every log-structured
        # store schedules; here it rides the triggering commit.
        base = (f"{state_dir}/v{cover:08d}" if bases else state_dir)
        pend_df = spark.read.parquet(
            *[f"{state_dir}/d{n:08d}" for n in pending])
        merged = cdc_compact(_base_df(spark, state_dir, base), pend_df,
                             key_cols, seq_col, op_col)
        merged.write.mode("overwrite").parquet(
            f"{state_dir}/v{max(pending):08d}")
        fs, jvm = _state_fs(spark, state_dir)
        retained = _committed_versions(spark, state_dir)
        for old in retained[:-keep_versions]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(
                f"{state_dir}/v{old:08d}"), True)
        retained = retained[-keep_versions:]
        # prune deltas the OLDEST retained base already covers; while
        # fewer than keep_versions bases exist the seeded root base is
        # still a retained reader target, so nothing is prunable.
        if len(retained) >= keep_versions:
            for n in _committed_deltas(spark, state_dir):
                if n <= retained[0]:
                    fs.delete(jvm.org.apache.hadoop.fs.Path(
                        f"{state_dir}/d{n:08d}"), True)

    writer = (changes.writeStream.foreachBatch(step)
              .option("checkpointLocation", checkpoint))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cdc_state(spark: SparkSession, state_dir: str,
                   op_col: str | None = None,
                   key_cols: list[str] | None = None,
                   seq_col: str | None = None) -> DataFrame:
    """The live view of a CDC state table: latest-change-wins over the
    newest committed base snapshot ∪ its pending deltas, minus
    tombstones. The merge spec defaults to the `_cdc_spec.json` the
    apply stream persisted (explicit arguments override it). With no
    pending deltas this is a plain read of the base — no merge plan."""
    base, pend = resolve_cdc_sources(spark, state_dir)
    spec = _read_cdc_spec(spark, state_dir) or {}
    op = op_col or spec.get("op_col", "op")
    if not pend:
        return (_base_df(spark, state_dir, base)
                .where(F.col(op) != "D"))
    keys = key_cols or spec.get("key_cols")
    if not keys:
        raise ValueError(
            f"no merge spec at {state_dir}/{_CDC_SPEC_FILE} and no "
            "key_cols given: cannot resolve the live view over "
            f"{len(pend)} pending delta(s)")
    seq = seq_col or spec.get("seq_col", "seq")
    merged = cdc_compact(_base_df(spark, state_dir, base),
                         spark.read.parquet(*pend), keys, seq, op)
    return merged.where(F.col(op) != "D")
