"""Similarity search over an embedding column (array<float>).

- knn_bruteforce: exact cosine top-k — the correctness baseline. Query side
  must be small (it is broadcast); candidate side streams at any scale.
- ann_ivf: coarse quantization + probe-limited search with a FIXED-size
  centroid set (corpus-size independent), so the centroid broadcast and the
  per-vector assignment cost stay constant as the corpus grows.
- ann_lsh: random-hyperplane LSH — candidates share a signed-projection
  bucket, so the join is an equi-join on (table, bucket), not a cross join.
  Hyperplanes are seeded-RNG Gaussian vectors embedded as plan literals.

All vector math is JVM-side whole-stage-codegen arithmetic over FLAT double
columns (v0..v{dim-1}): on pair-volume workloads the lambda-HOF form
(aggregate/zip_with) costs ~5x more than static column expressions, and
per-pair array getItem falls out of efficient codegen entirely (measured
37s vs 7s at 12.5M pairs — see dedup.embedding_near_dup). Dot products
accumulate LEFT-TO-RIGHT to bit-match sequential list_dot_product oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DIM = 64  # fixture embedding dimensionality (embeddings.parquet)


# --------------------------------------------------------------------------
# flat-vector projection (shared, memoized per session+plan)
# --------------------------------------------------------------------------

def _flat(df: DataFrame, id_col: str, vec_col: str, dim: int,
          prefix: str) -> DataFrame:
    """Project to (id, nrm, {prefix}0..{prefix}{dim-1}) flat doubles.

    The norm is an unrolled left-to-right sum of squares so it matches a
    sequential list_sum(list_transform(v, x -> x*x)) oracle exactly.
    """
    flat = df.selectExpr(
        f"{id_col} AS id",
        f"transform({vec_col}, x -> CAST(x AS DOUBLE)) AS vec",
        *[f"CAST({vec_col}[{i}] AS DOUBLE) AS {prefix}{i}"
          for i in range(dim)])
    ss = " + ".join(f"{prefix}{i} * {prefix}{i}" for i in range(dim))
    return flat.withColumn("nrm", F.expr(f"sqrt({ss})"))


def _flat_dot(pa: str, pb: str, dim: int):
    """Unrolled left-to-right dot product of two flat column families.

    Built as ONE SQL expression string: composing 64 Column objects costs
    hundreds of Py4J round trips per use; a string parses JVM-side in one.
    """
    return F.expr(" + ".join(f"{pa}{i} * {pb}{i}" for i in range(dim)))


# Memo of cached flat frames per (session, input plan, params): repeated
# invocations in a long-lived session reuse one materialization instead of
# accumulating storage blocks (same rationale as domain._FRAME_CACHE).
# Entries store (source_df, result): semanticHash is a hash, not plan
# equality, so hits are confirmed with sameSemantics, and the session
# component is the JVM session UUID rather than a reusable CPython id
# (mirror of the dedup-side memo fix).
_FLAT_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _flat_cached(df: DataFrame, id_col: str, vec_col: str, dim: int,
                 prefix: str) -> DataFrame:
    from nexus_spark.functions.skew import ensure_parallelism
    from nexus_spark.operators.dedup import _session_key

    key = (_session_key(df.sparkSession), df.semanticHash(), id_col,
           vec_col, dim, prefix)
    hit = _FLAT_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(df):
        return hit[1]
    # Spread a single-split corpus before caching: the flat frame
    # feeds crossJoin/self-join consumers whose task count equals its
    # partition count (1 task would serialize every n^2 score).
    got = ensure_parallelism(
        _flat(df, id_col, vec_col, dim, prefix)).cache()
    from nexus_spark.operators.dedup import _bounded_put
    _bounded_put(_FLAT_CACHE, key, (df, got))
    return got


# Multi-probe cell-assignment memo: the (id -> cent_id) table IS the IVF
# index ivf_write persists at write time, so in-session it is maintained
# state, not a query result (same warm-state classification as the flat
# corpus above). Keyed/confirmed like _FLAT_CACHE.
_CELLS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}

# Centroid memo: the k-row md5-seeded centroid frame is training-time
# state (ivf_write persists it under _centroids). Reuse rebuilds a LOCAL
# k-row frame from the collected rows — zero jobs, no TakeOrdered re-run.
_CENTS_CACHE: dict[tuple, tuple[DataFrame, list, object]] = {}

# LSH corpus bucket table memo: the (neighbor_id, tbl, bucket) layout a
# random-hyperplane index persists at write time. Keyed/confirmed like
# _FLAT_CACHE.
_LSH_BUCKETS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def ivf_centroids_cached(corpus: DataFrame, n_centroids: int,
                         dim: int) -> DataFrame:
    """Memoized _select_centroids: one TakeOrdered over the corpus per
    (session, corpus, k); repeat calls rebuild a local k-row frame from
    the collected rows (broadcast-sized by construction)."""
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    key = (_session_key(corpus.sparkSession), corpus.semanticHash(),
           n_centroids, dim)
    hit = _CENTS_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(corpus):
        return corpus.sparkSession.createDataFrame(hit[1], hit[2])
    cents = _select_centroids(corpus, n_centroids, dim)
    rows = cents.collect()
    _bounded_put(_CENTS_CACHE, key, (corpus, rows, cents.schema))
    return corpus.sparkSession.createDataFrame(rows, cents.schema)


def ivf_cells_cached(corpus: DataFrame, dim: int, n_centroids: int,
                     nprobe: int) -> DataFrame:
    """Memoized multi-probe IVF assignment over a flat corpus frame:
    (id, cent_id) rows, one per probe. Deterministic (md5-seeded
    centroids, rounded tie-broken ranks) — the in-session analog of the
    persisted cell layout."""
    from nexus_spark.operators.dedup import _session_key

    key = (_session_key(corpus.sparkSession), corpus.semanticHash(),
           dim, n_centroids, nprobe)
    hit = _CELLS_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(corpus):
        return hit[1]
    cents = ivf_centroids_cached(corpus, n_centroids, dim)
    w = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    cells = (_cell_scores(corpus, cents, dim, "c")
             .withColumn("crank", F.row_number().over(w))
             .where(F.col("crank") <= nprobe)
             .select("id", "cent_id").cache())
    from nexus_spark.operators.dedup import _bounded_put
    _bounded_put(_CELLS_CACHE, key, (corpus, cells))
    return cells


# Largest-cell-size memo over a cell assignment: one scalar of driver
# state per (corpus, geometry), a pure function of the memoized
# assignment — callers (the IVF near-dup skew probe) read it instead of
# re-running a max aggregate per invocation.
_CELL_MAX_CACHE: dict[tuple, tuple[DataFrame, int]] = {}


def ivf_max_cell_cached(corpus: DataFrame, dim: int, n_centroids: int,
                        nprobe: int) -> int:
    """Memoized size of the largest multi-probe IVF cell — the skew
    probe embedding_near_dup_ivf branches on. Deterministic per
    (corpus, geometry) because the assignment is; one tiny aggregate
    job on first ask, a dict lookup after."""
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    key = (_session_key(corpus.sparkSession), corpus.semanticHash(),
           dim, n_centroids, nprobe)
    hit = _CELL_MAX_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(corpus):
        return hit[1]
    cells = ivf_cells_cached(corpus, dim, n_centroids, nprobe)
    m = int(cells.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n")).first()[0] or 0)
    _bounded_put(_CELL_MAX_CACHE, key, (corpus, m), frame_idx=None)
    return m


# Cell-annotated corpus memo: the flat corpus joined with its
# single-probe cell — byte-for-byte the layout ivf_write persists
# (cell_id as the partition column), so in-session it is maintained
# index state like the pieces it joins.
_LAYOUT_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def ivf_layout_cached(corpus: DataFrame, dim: int,
                      n_centroids: int) -> DataFrame:
    """Memoized cell-annotated corpus: (cent_id, neighbor_id, c_nrm,
    c0..c{dim-1}) — the in-session analog of the persisted IVF layout.
    Searches join a broadcast probe list against THIS frame on cent_id,
    so a steady query never shuffles the corpus (at 100 TB the same
    join is partition pruning on the cell_id directory column)."""
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    key = (_session_key(corpus.sparkSession), corpus.semanticHash(),
           dim, n_centroids)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(corpus):
        return hit[1]
    assign = (ivf_cells_cached(corpus, dim, n_centroids, 1)
              .withColumnRenamed("id", "neighbor_id"))
    layout = (corpus.drop("vec").withColumnRenamed("id", "neighbor_id")
              .withColumnRenamed("nrm", "c_nrm")
              .join(assign, "neighbor_id").cache())
    _bounded_put(_LAYOUT_CACHE, key, (corpus, layout))
    return layout


def warm_index(embeddings: DataFrame, id_col: str = "vec_id",
               vec_col: str = "embedding", dim: int = DIM) -> int:
    """Materialize the session's normalized flat-vector frame — the
    in-session analog of the write-time IVF index (similarity.ivf_write).
    A deployment maintains this state at ingest; calling warm_index once
    after load means subsequent knn/ANN calls measure SEARCH, not index
    build. Returns the corpus size."""
    return _flat_cached(embeddings, id_col, vec_col, dim, "c").count()


def clear_cache() -> None:
    """Unpersist and drop every memoized index frame this module holds:
    flat vectors, IVF cells/layout, LSH corpus buckets, PQ codes, and
    the MMR relevance pool. domain.invalidate() calls this after every
    in-place lake rewrite, so the list MUST stay exhaustive — a memo
    left out serves pre-rewrite data (the round-9 ADVICE staleness
    class)."""
    for cache in (_FLAT_CACHE, _CELLS_CACHE, _LSH_BUCKETS_CACHE,
                  _LAYOUT_CACHE):
        for _, frame in cache.values():
            try:
                frame.unpersist()
            except Exception:
                pass
        cache.clear()
    _CENTS_CACHE.clear()  # local k-row state, nothing persisted
    _CELL_MAX_CACHE.clear()  # scalar driver state, nothing persisted
    for cache, idx in ((_PQ_CACHE, 2), (_MMR_POOL_CACHE, 2)):
        for entry in cache.values():
            try:
                entry[idx].unpersist()
            except Exception:
                pass
        cache.clear()


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dim: int = DIM) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: query_id, neighbor_id, rank, cosine. Deterministic tie-break on
    (rounded cosine desc, neighbor_id asc). Queries broadcast; the candidate
    scan streams — one shuffle for the per-query top-k window.
    """
    q = (_flat(queries, id_col, vec_col, dim, "q").drop("vec")
         .withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    c = (_flat(embeddings, id_col, vec_col, dim, "c").drop("vec")
         .withColumnRenamed("id", "neighbor_id")
         .withColumnRenamed("nrm", "c_nrm"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine",
                    _flat_dot("q", "c", dim)
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def filtered_knn(embeddings: DataFrame, queries: DataFrame,
                 metadata: DataFrame, predicate, k: int = 5,
                 id_col: str = "vec_id", meta_id_col: str = "doc_id",
                 vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Filtered vector search with PRE-filtering: the metadata predicate
    restricts the candidate corpus BEFORE scoring, so every query gets a
    TRUE top-k among qualifying items. (Post-filtering an ANN result —
    search first, filter after — silently returns fewer than k when the
    filter is selective: the classic filtered-search pitfall. This
    operator is the correct-recall formulation.)

    Plan: predicate -> semi-join onto the vector corpus (the filter
    reaches the metadata scan; the semi-join shuffles only ids) -> exact
    scoring over the filtered corpus. At scale, compose the same
    pre-filter with the IVF cell layout instead: the allowed-id set
    semi-joins the cell-partitioned index and probes score only
    qualifying members per cell.

    Output: query_id, neighbor_id, rank, cosine.
    """
    allowed = (metadata.where(predicate)
               .select(F.col(meta_id_col).alias(id_col)))
    corpus = embeddings.join(allowed, id_col, "left_semi")
    return knn_bruteforce(corpus, queries, k, id_col=id_col,
                          vec_col=vec_col, dim=dim)


def ann_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_centroids: int = 32, nprobe: int = 2,
            dim: int = DIM) -> DataFrame:
    """IVF-style ANN: coarse quantization + probe-limited search.

    Centroids are a FIXED-k deterministic pseudo-random sample: the
    n_centroids vectors with the smallest md5(id) hex string. The centroid
    count is independent of corpus size, so the centroid broadcast and the
    per-vector nearest-centroid scan stay O(k) per row at any scale (the
    previous id % mod scheme grew the centroid set — and its broadcast —
    linearly with the corpus). Selection is one TakeOrdered over the corpus
    (O(n) scan, O(k) heap per partition, no full sort shuffle); a k-means
    refinement could replace the sample without touching the assign/probe
    machinery.

    Every vector is assigned to its nearest centroid — a broadcast
    crossJoin with the k-row centroid frame reduced by a map-side-combining
    max_by aggregate (no window sort over the corpus). A query scores only
    vectors in its `nprobe` nearest cells. At 100 TB the assignment is a
    write-time partitioning column, so a query touches nprobe partitions
    instead of the full corpus.

    Output: query_id, neighbor_id, rank, cosine (approximate).
    """
    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    # Training-time state rides the session memos (round 9): the k-row
    # centroid frame rebuilds locally from collected rows (no TakeOrdered
    # re-run) and the corpus is served from the cached CELL-ANNOTATED
    # layout — the same (cell_id, vector) table ivf_write persists — so
    # a steady search joins a broadcast probe list against the layout on
    # cent_id and never shuffles the corpus (at 100 TB: partition
    # pruning on the cell_id directory column). Tie-break = (rounded
    # cosine desc, cent_id asc), identical in both paths.
    cents = ivf_centroids_cached(corpus, n_centroids, dim)
    layout = ivf_layout_cached(corpus, dim, n_centroids)

    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))

    q = (qflat.drop("vec").withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    # Each neighbor belongs to exactly one cell, so (query, neighbor) pairs
    # out of the probe join are already unique — no distinct shuffle.
    scored = (
        F.broadcast(probes).join(layout, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine",
                    _flat_dot("q", "c", dim)
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def _select_centroids(corpus: DataFrame, n_centroids: int, dim: int,
                      src_prefix: str = "c") -> DataFrame:
    """Fixed-k deterministic pseudo-random centroid sample (md5-ordered
    LIMIT k — see ann_ivf docstring): one TakeOrdered over the corpus,
    O(k) result at any corpus size."""
    return (corpus.drop("vec")
            .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
            .limit(n_centroids)
            .select(F.col("id").alias("cent_id"),
                    F.col("nrm").alias("cent_nrm"),
                    *[F.col(f"{src_prefix}{i}").alias(f"t{i}")
                      for i in range(dim)]))


def _cell_scores(v: DataFrame, cents: DataFrame, dim: int,
                 prefix: str) -> DataFrame:
    return (v.drop("vec").crossJoin(F.broadcast(cents))
            .withColumn("c_cos", _flat_dot(prefix, "t", dim)
                        / (F.col("nrm") * F.col("cent_nrm")))
            .select("id", "cent_id", "c_cos"))


def kmeans_refine(corpus: DataFrame, cents: DataFrame, dim: int = DIM,
                  iters: int = 2) -> DataFrame:
    """Spherical k-means (Lloyd) refinement of an IVF centroid set.

    Each iteration: assign every vector to its max-cosine centroid (the
    same broadcast crossJoin + max_by partial aggregate the IVF assigner
    uses — no window, no shuffle beyond the k-group aggregate), then
    recompute each centroid as the mean of its members. Cosine scoring
    divides by the centroid norm, so the mean works unnormalized. A cell
    that loses all members keeps its previous centroid (k stays fixed).

    Cost per iteration is one corpus scan + one k-row aggregate — O(n*k)
    compute, O(k) driver/broadcast state — so refinement scales exactly
    like the IVF assignment itself. The spherical k-means objective
    (sum of member->centroid cosines) is non-decreasing over iterations;
    the tests assert that.

    `corpus` is a flat frame (`_flat` shape, prefix 'c'); `cents` the
    `_select_centroids` shape. Returns the refined centroid frame.
    """
    for _ in range(int(iters)):
        assign = (_cell_scores(corpus, cents, dim, "c")
                  .groupBy("id")
                  .agg(F.max_by(
                      "cent_id",
                      F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                               (-F.col("cent_id")).alias("t")))
                      .alias("cent_id")))
        means = (corpus.drop("vec").join(assign, "id")
                 .groupBy("cent_id")
                 .agg(*[F.avg(f"c{i}").alias(f"m{i}") for i in range(dim)]))
        ss = " + ".join(f"m{i} * m{i}" for i in range(dim))
        refined = means.withColumn("new_nrm", F.expr(f"sqrt({ss})"))
        cents = (cents.join(refined, "cent_id", "left")
                 .select("cent_id",
                         F.coalesce("new_nrm", "cent_nrm").alias("cent_nrm"),
                         *[F.coalesce(F.col(f"m{i}"), F.col(f"t{i}"))
                           .alias(f"t{i}") for i in range(dim)]))
        # Materialize: each iteration's plan otherwise nests the previous
        # crossJoin, and the k-row result is broadcast state anyway.
        cents = cents.sparkSession.createDataFrame(
            cents.collect(), cents.schema)
    return cents


def ivf_objective(corpus: DataFrame, cents: DataFrame,
                  dim: int = DIM) -> float:
    """Spherical k-means objective: mean best-centroid cosine over the
    corpus (higher = tighter cells = fewer probes needed for recall)."""
    return (_cell_scores(corpus, cents, dim, "c")
            .groupBy("id").agg(F.max("c_cos").alias("best"))
            .agg(F.avg("best")).collect()[0][0])


def ivf_write(embeddings: DataFrame, path: str, n_centroids: int = 32,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = DIM, refine_iters: int = 0) -> None:
    """Materialize the IVF index as a cell-partitioned parquet layout —
    the write-time form of ann_ivf's coarse quantization, and the actual
    100 TB serving path: a probe reads `nprobe` partition directories
    instead of the corpus.

    Layout: `path/cell_id=<cent_id>/...` holding flat vector rows
    (id, nrm, c0..c{dim-1}); `path/_centroids` (underscore-prefixed, so
    corpus reads skip it) holds the k centroid rows. Assignment is the
    same broadcast-crossJoin + max_by partial aggregate as ann_ivf — one
    shuffle-free scan plus the partitioned write.
    """
    corpus = _flat(embeddings, id_col, vec_col, dim, "c")
    cents = _select_centroids(corpus, n_centroids, dim)
    if refine_iters:
        cents = kmeans_refine(corpus, cents, dim, refine_iters)
    assign = (_cell_scores(corpus, cents, dim, "c")
              .groupBy("id")
              .agg(F.max_by(
                  "cent_id",
                  F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                           (-F.col("cent_id")).alias("t"))).alias("cell_id")))
    (corpus.drop("vec").join(assign, "id")
     .write.mode("overwrite").partitionBy("cell_id").parquet(path))
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_search(spark, path: str, queries: DataFrame, k: int = 5,
               nprobe: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Probe a written IVF index: score queries against the (tiny)
    centroid frame, take each query's `nprobe` best cells, then scan ONLY
    those `cell_id=` partitions (the literal isin predicate is a partition
    filter — Catalyst never lists the other directories). The probed-cell
    collect is bounded by |queries| x nprobe cell ids, not by data.

    Same output contract and tie-breaks as ann_ivf; given the same
    n_centroids/nprobe it returns ann_ivf's exact results.
    """
    cents = spark.read.parquet(f"{path}/_centroids")
    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))
    probe_rows = probes.collect()
    cells = sorted({r.cent_id for r in probe_rows})

    corpus = (spark.read.parquet(path)
              .where(F.col("cell_id").isin(cells)))
    q = (qflat.drop("vec").withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    c = (corpus.withColumnRenamed("id", "neighbor_id")
         .withColumnRenamed("nrm", "c_nrm"))
    probe_df = F.broadcast(spark.createDataFrame(
        [(r.query_id, r.cent_id) for r in probe_rows],
        "query_id long, cell_id long"))
    scored = (
        probe_df.join(c, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine",
                    _flat_dot("q", "c", dim)
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def _bucket_sql(vec_sql: str, dim: int, n_planes: int, table: int,
                seed: int = 42) -> str:
    """LSH bucket id for one hash table: n_planes sign bits packed into an
    int. Hyperplanes are standard-normal vectors from a seeded RNG,
    materialized as literal arrays inside ONE SQL expression string —
    deterministic, reproducible, and parsed JVM-side in a single Py4J
    call (building 256 literal Column objects per table through the
    Python API costs seconds of driver time). Projections stay in HOF
    (zip_with/aggregate) form ON PURPOSE: this runs once per ROW (not per
    pair), and unrolling n_tables*n_planes*dim scalar terms blows
    Janino's 64KB method limit into interpreted fallback (measured 5x
    slower end-to-end)."""
    import numpy as np

    rng = np.random.RandomState(seed + 1000 * table)
    planes = rng.randn(n_planes, dim)
    bits = []
    for p in range(n_planes):
        arr = ", ".join(f"{float(h)!r}D" for h in planes[p])
        proj = (f"aggregate(zip_with({vec_sql}, array({arr}), "
                f"(x, h) -> x * h), 0.0D, (a, x) -> a + x)")
        bits.append(f"IF({proj} >= 0, {2 ** p}, 0)")
    return " + ".join(bits)


def _lsh_bucket_structs(dim: int, n_planes: int, n_tables: int) -> str:
    return ", ".join(
        f"named_struct('tbl', {t}, 'bucket', "
        f"{_bucket_sql('vec', dim, n_planes, t)})"
        for t in range(n_tables))


def lsh_corpus_buckets_cached(cf: DataFrame, dim: int = DIM,
                              n_planes: int = 4,
                              n_tables: int = 8) -> DataFrame:
    """Memoized (neighbor_id, tbl, bucket) CORPUS bucket table — the
    write-time LSH index state (the analog of ivf_write's cell layout):
    memoized per (session, corpus, geometry) so a steady search buckets
    only its queries and equi-joins the maintained table. At 100 TB this
    table is the persisted layout partitioned by (tbl, bucket). `cf` is
    the flat frame from _flat_cached. Factored out of ann_lsh unchanged
    so the bench warm-state pass can build and attribute it directly."""
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    ckey = (_session_key(cf.sparkSession), cf.semanticHash(),
            dim, n_planes, n_tables)
    hit = _LSH_BUCKETS_CACHE.get(ckey)
    if hit is not None and hit[0].sameSemantics(cf):
        return hit[1]
    structs = _lsh_bucket_structs(dim, n_planes, n_tables)
    cbuckets = cf.selectExpr("id AS neighbor_id",
                             f"inline(array({structs}))").cache()
    _bounded_put(_LSH_BUCKETS_CACHE, ckey, (cf, cbuckets), cap=4)
    return cbuckets


def ann_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int = DIM, n_planes: int = 4, n_tables: int = 8) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    n_tables independent tables of n_planes bits; a candidate is scored iff
    it shares a bucket with the query in >= 1 table. Equi-join on
    (tbl, bucket) replaces the cross join — the 100 TB path. The bucketed
    frames carry only (id, tbl, bucket); vectors come back at scoring time
    from the one cached flat frame, so the bucket equi-join shuffles 3
    narrow columns instead of dim+2 wide rows per table. Output like
    knn_bruteforce (approximate; recall vs brute force covered in tests).

    Tuning: collision probability per plane is 1 - theta/pi; for weakly
    similar corpora (top-k cosine ~0.3, like the synthetic fixture) fewer
    planes + more tables is the right trade — the 4x8 default hits ~0.67
    expected recall there, and much higher on genuinely clustered data.
    """
    cf = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    qf = _flat_cached(queries, id_col, vec_col, dim, "q")

    # All n_tables buckets in ONE projection + inline(): an 8-way union of
    # per-table projections costs 8 passes of plan analysis and 8 scan
    # stages; inline() of an array of (tbl, bucket) structs is one.
    structs = _lsh_bucket_structs(dim, n_planes, n_tables)

    def bucketed(flat: DataFrame, ident: str) -> DataFrame:
        return flat.selectExpr(f"id AS {ident}", f"inline(array({structs}))")

    cbuckets = lsh_corpus_buckets_cached(cf, dim, n_planes, n_tables)

    candidates = (
        bucketed(qf, "query_id").join(cbuckets, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    q = (qf.drop("vec").withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    c = (cf.drop("vec").withColumnRenamed("id", "neighbor_id")
         .withColumnRenamed("nrm", "c_nrm"))
    scored = (
        candidates.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
        .withColumn("cosine",
                    _flat_dot("q", "c", dim)
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


# --------------------------------------------------------------------------
# int8 scalar quantization (index compression)
# --------------------------------------------------------------------------

def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Per-vector int8 scalar quantization of an embedding column — the
    standard 4x index-compression step (the FAISS SQ8 layout): each vector
    stores one float32 scale plus dim int8 codes, q_i = round(v_i/scale)
    with scale = max|v_i| / 127, so a 100 TB float32 vector index becomes
    ~25 TB with ~1e-2 relative reconstruction error.

    Pure columnar array expressions — a projection with NO shuffle; the
    quantized codes flow straight into ivf_write's partitioned layout.
    Rounding uses floor(x + 0.5) (identical semantics in every engine —
    double ROUND disagrees across engines on half-boundaries); the
    reconstruction error is reported as a per-vector MSE computed from
    three sequential dot products (sum v^2, sum v*q, sum q^2) so the
    accumulation order matches a list_dot_product oracle exactly.

    Output: vec_id, scale, qsum (sum of codes — the integer checksum of
    the code vector), qmin, qmax (range sanity, in [-127, 127]), mse.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = embeddings.select(
        F.col(id_col), v.alias("vec"),
        (F.array_max(F.transform(v, F.abs)) / 127.0).alias("scale"))
    q = F.transform(
        F.col("vec"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0.0))
        .otherwise(F.floor(x / F.col("scale") + 0.5).cast("double")))
    df = df.withColumn("qv", q)

    def sdot(a: str, b: str):
        # sequential left-to-right fold == DuckDB list_dot_product order
        return F.aggregate(
            F.zip_with(F.col(a), F.col(b),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)

    mse = ((sdot("vec", "vec")
            - 2.0 * F.col("scale") * sdot("vec", "qv")
            + F.col("scale") * F.col("scale") * sdot("qv", "qv"))
           / F.size(F.col("vec")))
    return df.select(
        F.col(id_col), F.col("scale"),
        F.aggregate(F.col("qv"), F.lit(0.0),
                    lambda a, x: a + x).cast("bigint").alias("qsum"),
        F.array_min(F.col("qv")).cast("bigint").alias("qmin"),
        F.array_max(F.col("qv")).cast("bigint").alias("qmax"),
        mse.alias("mse"))


def ann_int8(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = DIM) -> DataFrame:
    """Exact top-k search over the int8-QUANTIZED corpus (asymmetric
    distance computation: float queries vs dequantized int8 candidates) —
    the memory-bound search mode a compressed 100 TB index actually runs:
    the scan reads 1/4 the bytes of the float index, the math is
    identical, and recall degrades only by the quantization error
    (~1e-2 relative; sub-1e-3 cosine perturbation at dim 64).

    Candidate vectors are reconstructed as code * scale (deterministic —
    quantize_int8's floor(x+0.5) codes and max|v|/127 scale are exact
    double expressions in any engine), then scored by the same
    left-to-right dot products and (rounded cosine, id) tie-breaks as
    knn_bruteforce, so the whole compressed-search pipeline is
    oracle-checkable end-to-end.

    Output: query_id, neighbor_id, rank, cosine (cosine is the
    asymmetric approximate value).
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # Materialize the per-vector scale behind a JOIN barrier: inlined into
    # the 64 flat-column extractions, the array_max(transform(...)) scale
    # expression would be re-evaluated per component (64x common-
    # subexpression blowup after Catalyst's projection collapse — measured
    # 3.1s vs 1.0s at sf0.1). The join is id-co-partitioned at scale; the
    # PERSISTED form of this search (ivf_search_q8) reads the stored scale
    # and never pays the recomputation at all.
    scales = embeddings.select(
        F.col(id_col),
        (F.array_max(F.transform(v, F.abs)) / 127.0).alias("q8_scale"))
    s = F.col("q8_scale")
    deq = (embeddings.join(scales, id_col)
           .select(F.col(id_col),
                   F.transform(
                       v, lambda x: F.when(s == 0, F.lit(0.0))
                       .otherwise(F.floor(x / s + 0.5) * s)).alias("deq")))
    # Queries stay float (asymmetric distance): same column name, exact
    # double values.
    qf = queries.select(F.col(id_col), v.alias("deq"))
    return knn_bruteforce(deq, qf, k, id_col=id_col,
                          vec_col="deq", dim=dim)


def ivf_write_q8(embeddings: DataFrame, path: str, n_centroids: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = DIM, refine_iters: int = 0) -> None:
    """IVF + int8 scalar quantization as ONE persistent index (the
    FAISS IVF-SQ8 architecture): the cell-partitioned layout of
    ivf_write, but each row stores `codes` (array<tinyint>) + one
    float `scale` instead of dim float64 columns — 8x smaller rows than
    the flat-double layout, 4x smaller than float32, while probes still
    prune to nprobe partition directories. This is the shape a 100 TB
    vector corpus actually serves from: coarse cells bound the scan,
    quantization bounds the bytes per scanned row.

    Same deterministic cell assignment as ivf_write (md5-seeded
    centroids, rounded-cosine max_by); codes/scale are quantize_int8's
    exact floor(x+0.5) / max|v|/127 contract.
    """
    corpus = _flat(embeddings, id_col, vec_col, dim, "c")
    cents = _select_centroids(corpus, n_centroids, dim)
    if refine_iters:
        cents = kmeans_refine(corpus, cents, dim, refine_iters)
    assign = (_cell_scores(corpus, cents, dim, "c")
              .groupBy("id")
              .agg(F.max_by(
                  "cent_id",
                  F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                           (-F.col("cent_id")).alias("t"))).alias("cell_id")))
    scale = F.array_max(F.transform(F.col("vec"), F.abs)) / 127.0
    codes = F.transform(
        F.col("vec"),
        lambda x: F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(F.floor(x / F.col("scale") + 0.5)).cast("tinyint"))
    (corpus.select("id", "vec").withColumn("scale", scale)
     .select("id", "scale", codes.alias("codes"))
     .join(assign, "id")
     .write.mode("overwrite").partitionBy("cell_id").parquet(path))
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_search_q8(spark, path: str, queries: DataFrame, k: int = 5,
                  nprobe: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Probe a quantized IVF index: same nprobe partition pruning as
    ivf_search, but candidates are reconstructed from their int8 codes
    (code * scale) in the scan projection — asymmetric distance, float
    queries vs dequantized candidates, exactly ann_int8's math restricted
    to the probed cells. Output contract and tie-breaks match ann_ivf.
    """
    cents = spark.read.parquet(f"{path}/_centroids")
    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))
    probe_rows = probes.collect()
    cells = sorted({r.cent_id for r in probe_rows})

    # Dequantize in the scan projection: the partition-pruned read ships
    # dim tinyints + one double per row, the multiply happens JVM-side.
    raw = (spark.read.parquet(path)
           .where(F.col("cell_id").isin(cells)))
    deq = raw.selectExpr(
        "cell_id", "id AS neighbor_id",
        *[f"CAST(codes[{i}] AS DOUBLE) * scale AS c{i}"
          for i in range(dim)])
    ss = " + ".join(f"c{i} * c{i}" for i in range(dim))
    c = deq.withColumn("c_nrm", F.expr(f"sqrt({ss})"))

    q = (qflat.drop("vec").withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    probe_df = F.broadcast(spark.createDataFrame(
        [(r.query_id, r.cent_id) for r in probe_rows],
        "query_id long, cell_id long"))
    scored = (
        probe_df.join(c, "cell_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine",
                    _flat_dot("q", "c", dim)
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def mean_pool(chunks: DataFrame, group_col: str,
              vec_col: str = "embedding") -> DataFrame:
    """Mean-pool chunk embeddings into one vector per group (document) —
    the standard chunk->document aggregation of an embedding pipeline
    (chunk_documents -> embed -> mean_pool -> index/dedup).

    Long-format output (group, pos, pooled): one posexplode + ONE
    map-side-combined aggregate on (group, pos) — the explode multiplies
    rows by dim but each output row is 3 scalars, so the shuffle volume
    equals the input vector volume; nothing materializes per-group state
    wider than one component. Use pool_to_vectors to reassemble arrays
    for downstream search.

    `pos` is 0-based.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (chunks.select(F.col(group_col),
                          F.posexplode(v).alias("pos", "val"))
            .groupBy(group_col, "pos")
            .agg(F.avg("val").alias("pooled")))


def pool_to_vectors(pooled: DataFrame, group_col: str) -> DataFrame:
    """Reassemble mean_pool's long format into (group, embedding
    array<double>), ordered by pos (array_sort on (pos, val) structs —
    collect_list alone is order-nondeterministic)."""
    return (pooled.groupBy(group_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("pos"), F.col("pooled")))),
                lambda s: s.getField("pooled")).alias("embedding")))


# --------------------------------------------------------------------------
# product quantization (PQ) — codebook training, encoding, ADC search
# --------------------------------------------------------------------------

def _pq_subspaces(flat: DataFrame, dim: int, m: int,
                  prefix: str) -> DataFrame:
    """Long-format subspace view of a `_flat` frame: one row per
    (id, sub) with the sub-vector as flat doubles s0..s{dsub-1}. Built
    with a single explode over an m-element literal struct array (the
    single-subtree scatter pattern — the source is planned once)."""
    dsub = dim // m
    structs = [
        F.struct(F.lit(s).alias("sub"),
                 *[F.col(f"{prefix}{s * dsub + i}").alias(f"s{i}")
                   for i in range(dsub)])
        for s in range(m)]
    return (flat.select("id", F.explode(F.array(*structs)).alias("e"))
            .select("id", "e.*"))


def _pq_d2(dsub: int):
    """Squared L2 distance between sub-vector s* and centroid t* as the
    three-sequential-dot decomposition (ss - 2*st + tt, each sum
    left-to-right) — the same engine-portable form quantize_int8 uses,
    so the oracle's list_dot_product arithmetic matches term-for-term."""
    ss = " + ".join(f"s{i} * s{i}" for i in range(dsub))
    st = " + ".join(f"s{i} * t{i}" for i in range(dsub))
    tt = " + ".join(f"t{i} * t{i}" for i in range(dsub))
    return F.expr(f"({ss}) - 2 * ({st}) + ({tt})")


def _pq_assign(subs: DataFrame, codebook: DataFrame,
               dsub: int) -> DataFrame:
    """Nearest-centroid code per (id, sub): broadcast the O(m*ksub)-row
    codebook, equi-join on sub, min_by over (rounded d2, code) — one
    map-side-combined aggregate, no window."""
    return (subs.join(F.broadcast(codebook.drop("cn2")), "sub")
            .withColumn("d2", _pq_d2(dsub))
            .groupBy("id", "sub")
            .agg(F.min_by(
                "code",
                F.struct(F.round(F.col("d2"), 6).alias("d"),
                         F.col("code").alias("c"))).alias("code")))


def pq_stream_encoder(cent_rows, codebook_rows, dim: int, m: int,
                      id_col: str = "vec_id", vec_col: str = "embedding"):
    """Single-stage Arrow-batched IVFPQ encoder for incremental ingest.

    The streaming index-maintenance loop (e_stream_pq_ingest) runs the
    encode+assign pass once per micro-batch. The relational form — a
    64-column flat projection, a broadcast crossJoin + max_by for the
    coarse cell, a subspace explode + broadcast join + min_by for the
    codes, then an id-equi join — is right for the bulk build (it is
    the oracle-shared trainer path), but per micro-batch it pays ~0.6 s
    of Py4J plan construction plus three shuffle stages of near-empty
    tasks (measured round 9: 1.9 s per 10k-vector batch, of which the
    actual arithmetic is milliseconds). Here the training-time state —
    the k coarse centroids and the m*ksub codebook, a few KiB — is
    captured as plain numpy arrays in a mapInPandas closure, so each
    batch is ONE narrow stage: scan -> encode -> (partitioned) write,
    no shuffle, no wide plan to re-analyze.

    Bit-exact with the relational path by construction: every sum is
    accumulated left-to-right per dimension (matching the unrolled
    `c0*t0 + c1*t1 + ...` SQL expressions), d2 uses the same
    `(ss - 2*st) + tt` association, and tie-breaks use the same
    ROUND(x, 6) HALF_UP + id ordering (nested round6 — half-even fast
    path with a Decimal shortest-repr HALF_UP redo of .5-boundary
    elements, the exact BigDecimal.valueOf(d).setScale(6, HALF_UP)
    semantics; only the ORDER of the rounded values is consumed).
    Equality against the relational encode is pinned by a unit test.
    All state and helpers live in the closure (pickled by value), so
    executors never import this module — the repo is driver-side only.

    `cent_rows` / `codebook_rows` are the collected _select_centroids /
    pq_train rows (driver-side k-row state). Returns (fn, schema) for
    DataFrame.mapInPandas: output one row per (vector, subspace) —
    (vec_id long, cell_id long, sub int, code int).
    """
    import numpy as np

    dsub = dim // m
    cent_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    cent_nrm = np.array([r["cent_nrm"] for r in cent_rows],
                        dtype=np.float64)
    C = np.array([[r[f"t{i}"] for i in range(dim)] for r in cent_rows],
                 dtype=np.float64)
    # codebook[s]: (codes_sorted, T (ksub, dsub), tt (ksub,))
    book = {}
    for s in range(m):
        rows = sorted((r for r in codebook_rows if r["sub"] == s),
                      key=lambda r: r["code"])
        codes = np.array([r["code"] for r in rows], dtype=np.int64)
        T = np.array([[r[f"t{i}"] for i in range(dsub)] for r in rows],
                     dtype=np.float64)
        tt = np.zeros(len(rows))
        for i in range(dsub):
            tt += T[:, i] * T[:, i]
        book[s] = (codes, T, tt)
    imax = np.iinfo(np.int64).max

    def round6(a):
        import numpy as np

        out = np.round(a, 6)
        scaled = a * 1e6
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        sus = frac < 1e-7
        if sus.any():
            from decimal import ROUND_HALF_UP, Decimal
            q = Decimal("0.000001")
            flat, src = out.reshape(-1), a.reshape(-1)
            for i in np.nonzero(sus.reshape(-1))[0]:
                flat[i] = float(Decimal(repr(float(src[i])))
                                .quantize(q, rounding=ROUND_HALF_UP))
        return out

    def encode(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            # norms + coarse cosine scores, left-to-right per dim
            nrm2 = np.zeros(n)
            dots = np.zeros((n, len(cent_ids)))
            for i in range(dim):
                nrm2 += X[:, i] * X[:, i]
                dots += X[:, i, None] * C[None, :, i]
            cos = dots / (np.sqrt(nrm2)[:, None] * cent_nrm[None, :])
            r = round6(cos)
            best = r.max(axis=1)
            cell = np.where(r == best[:, None], cent_ids[None, :],
                            imax).min(axis=1)
            # per-subspace nearest codeword: (ss - 2*st) + tt
            code_mat = np.empty((n, m), dtype=np.int64)
            for s in range(m):
                codes, T, tt = book[s]
                S = X[:, s * dsub:(s + 1) * dsub]
                ss = np.zeros(n)
                st = np.zeros((n, len(codes)))
                for i in range(dsub):
                    ss += S[:, i] * S[:, i]
                    st += S[:, i, None] * T[None, :, i]
                d2 = (ss[:, None] - 2.0 * st) + tt[None, :]
                r2 = round6(d2)
                low = r2.min(axis=1)
                code_mat[:, s] = np.where(r2 == low[:, None],
                                          codes[None, :], imax).min(axis=1)
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, m),
                "cell_id": np.repeat(cell, m),
                "sub": np.tile(np.arange(m, dtype=np.int32), n),
                "code": code_mat.reshape(-1).astype(np.int32)})

    return encode, "vec_id long, cell_id long, sub int, code int"


def pq_train(embeddings: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = DIM, m: int = 8,
             ksub: int = 16, iters: int = 1) -> DataFrame:
    """Train a product-quantization codebook (Jegou, Douze & Schmid,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    split the dim-d space into m orthogonal subspaces of dim/m dims and
    learn ksub centroids per subspace by Lloyd refinement.

    Deterministic end-to-end, so the whole trainer is oracle-checkable:
    the initial codebook is the sub-vectors of the ksub md5-ordered seed
    vectors (code = 0-based rank in that order — the same fixed-k
    TakeOrdered seed rule as ann_ivf), each Lloyd round assigns by
    ROUND(d2,6)+code tie-broken argmin and re-centres by member mean,
    and a cell that loses all members keeps its previous centroid.

    Scale: each round is ONE corpus pass (the m-way subspace explode
    keeps row volume at n*m scalar-struct rows = the vector volume
    itself) against an O(m*ksub)-row broadcast, followed by an
    O(m*ksub)-group aggregate — O(n*m*ksub) compute with driver state
    that never exceeds the m*ksub codebook rows. At 100 TB the trainer
    runs on a fixed-size sample; encoding (pq_encode) streams the full
    corpus against the same broadcast codebook.

    Returns (sub, code, t0..t{dim/m-1}, cn2) where cn2 is the centroid's
    squared norm — the reconstruction-norm term ADC search needs.
    """
    dsub = dim // m
    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    subs = _pq_subspaces(corpus, dim, m, "c")
    seed_ids = [r[0] for r in
                (corpus.select("id")
                 .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
                 .limit(ksub).collect())]
    spark = embeddings.sparkSession
    seeds = spark.createDataFrame(
        [(int(i), c) for c, i in enumerate(seed_ids)], "id long, code int")
    codebook = (subs.join(F.broadcast(seeds), "id")
                .select("sub", "code",
                        *[f"s{i}" for i in range(dsub)])
                .toDF("sub", "code", *[f"t{i}" for i in range(dsub)]))
    tt = " + ".join(f"t{i} * t{i}" for i in range(dsub))
    codebook = codebook.withColumn("cn2", F.expr(tt))
    for _ in range(int(iters)):
        assign = _pq_assign(subs, codebook, dsub)
        means = (subs.join(assign, ["id", "sub"])
                 .groupBy("sub", "code")
                 .agg(*[F.avg(f"s{i}").alias(f"m{i}")
                        for i in range(dsub)]))
        mm = " + ".join(f"t{i} * t{i}" for i in range(dsub))
        codebook = (codebook.join(means, ["sub", "code"], "left")
                    .select("sub", "code",
                            *[F.coalesce(F.col(f"m{i}"), F.col(f"t{i}"))
                              .alias(f"t{i}") for i in range(dsub)])
                    .withColumn("cn2", F.expr(mm)))
        # materialize the m*ksub-row state (broadcast-sized by
        # construction) so each round's plan does not nest the previous
        # round's join tree — same policy as kmeans_refine
        codebook = spark.createDataFrame(codebook.collect(),
                                         codebook.schema)
    return codebook


# PQ index memo: the (codebook, packed codes) pair IS the index
# ivf_write_pq persists at write time, so in-session it is maintained
# state, not a query result (same warm-state classification as
# ivf_cells_cached). Keyed/confirmed like _FLAT_CACHE.
_PQ_CACHE: dict[tuple, tuple[DataFrame, DataFrame, DataFrame]] = {}


def pq_index_cached(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", dim: int = DIM,
                    m: int = 8, ksub: int = 16,
                    iters: int = 1) -> tuple:
    """Memoized (codebook, codes) for a corpus — the in-session analog
    of the persisted IVFPQ layout. The trainer and the full-corpus
    encode run once per (session, corpus, params); searches then pay
    only the LUT + scoring stages, the same way a deployment reading
    ivf_write_pq's layout never re-trains at query time."""
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    key = (_session_key(embeddings.sparkSession),
           embeddings.semanticHash(), id_col, vec_col, dim, m, ksub,
           iters)
    hit = _PQ_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(embeddings):
        return hit[1], hit[2]
    codebook = pq_train(embeddings, id_col, vec_col, dim, m, ksub, iters)
    codes = pq_encode(embeddings, codebook, id_col, vec_col,
                      dim, m).cache()
    # Flat (embeddings, codebook, codes) with frame_idx=2 so eviction
    # unpersists the cache()'d codes frame (a nested tuple at idx 1 made
    # the unpersist silently no-op and leak executor storage).
    _bounded_put(_PQ_CACHE, key, (embeddings, codebook, codes),
                 frame_idx=2)
    return codebook, codes


def pq_encode(embeddings: DataFrame, codebook: DataFrame,
              id_col: str = "vec_id", vec_col: str = "embedding",
              dim: int = DIM, m: int = 8) -> DataFrame:
    """Encode every vector as m one-byte codes against a trained
    codebook: (id, sub, code) long format — dim float32 components
    become m codes (32x compression at dim=64/m=8 plus the shared
    m*ksub-row codebook). One corpus pass against the broadcast
    codebook; no shuffle beyond the per-(id,sub) argmin combine."""
    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    return _pq_assign(_pq_subspaces(corpus, dim, m, "c"), codebook,
                      dim // m)


def ann_pq(embeddings: DataFrame, queries: DataFrame, k: int = 5,
           id_col: str = "vec_id", vec_col: str = "embedding",
           dim: int = DIM, m: int = 8, ksub: int = 16,
           iters: int = 1) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    the PQ-compressed corpus — the third compression point of the index
    family (float32 -> int8 SQ (ann_int8) -> m-byte PQ codes): the scan
    reads m bytes per vector instead of 4*dim, and each query scores a
    candidate with m table lookups instead of a dim-term dot product.

    Per query, the dot product against every sub-centroid is
    precomputed once (the LUT — nq*m*ksub rows, broadcast-sized), then
    ONE pass over the code table joins (sub, code) and sums the m
    looked-up partial dots per (query, candidate). The approximate
    cosine divides by the query norm and the RECONSTRUCTION norm
    sqrt(sum_sub ||centroid||^2) — fully deterministic given the
    deterministic trainer, hence oracle-checkable end-to-end, unlike
    sampled-training PQ.

    Output: query_id, neighbor_id, rank, cosine (ADC approximation).
    """
    codebook, codes = pq_index_cached(embeddings, id_col, vec_col,
                                      dim, m, ksub, iters)
    dsub = dim // m
    qflat = _flat(queries, id_col, vec_col, dim, "c")
    qsubs = _pq_subspaces(qflat, dim, m, "c")
    st = " + ".join(f"s{i} * t{i}" for i in range(dsub))
    lut = (qsubs.join(F.broadcast(codebook), "sub")
           .select(F.col("id").alias("query_id"), "sub", "code",
                   F.expr(st).alias("pdot"), "cn2"))
    scored = (codes.join(F.broadcast(lut), ["sub", "code"])
              .where(F.col("id") != F.col("query_id"))
              .groupBy("query_id", F.col("id").alias("neighbor_id"))
              .agg(F.sum("pdot").alias("adot"),
                   F.sum("cn2").alias("rn2")))
    qn = qflat.select(F.col("id").alias("query_id"),
                      F.col("nrm").alias("q_nrm"))
    return _topk(
        scored.join(F.broadcast(qn), "query_id")
        .withColumn("cosine",
                    F.col("adot") / (F.col("q_nrm") * F.sqrt("rn2"))), k)


def ann_ivf_pq(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_centroids: int = 32, nprobe: int = 2, dim: int = DIM,
               m: int = 8, ksub: int = 16, iters: int = 1) -> DataFrame:
    """IVF+PQ: coarse cells bound the CANDIDATE SET (a query touches
    nprobe cells, not the corpus) and PQ codes bound the BYTES PER
    CANDIDATE (m byte lookups, not a dim-term dot) — the combined
    billion-vector layout (FAISS IVFPQ; Jegou et al. TPAMI 2011 §V). At
    100 TB the cell is the write-time partition column and the code
    table is the only per-vector payload the search reads: nprobe
    partition scans of m-byte rows against a broadcast LUT.

    Both stages reuse their standalone deterministic machinery
    (ann_ivf's md5-seeded cells and rounded tie-breaks; pq_train's
    seeded Lloyd codebook), so the composition stays oracle-checkable.

    Output: query_id, neighbor_id, rank, cosine (ADC approximation).
    """
    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    # Coarse stage rides the session IVF memos (round 9): the k-row
    # centroid frame and the single-probe cell assignment are the same
    # write-time state ann_ivf serves from — the memo's window pick
    # (rounded cosine desc, cent_id asc at crank=1) selects the
    # identical cell the former per-call max_by did.
    cents = ivf_centroids_cached(corpus, n_centroids, dim)
    assign = (ivf_cells_cached(corpus, dim, n_centroids, 1)
              .withColumnRenamed("id", "neighbor_id"))
    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))
    cand = (F.broadcast(probes).join(assign, "cent_id")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id"))

    codebook, codes = pq_index_cached(embeddings, id_col, vec_col,
                                      dim, m, ksub, iters)
    dsub = dim // m
    qsubs = _pq_subspaces(qflat, dim, m, "q")
    st = " + ".join(f"s{i} * t{i}" for i in range(dsub))
    lut = (qsubs.join(F.broadcast(codebook), "sub")
           .select(F.col("id").alias("query_id"), "sub", "code",
                   F.expr(st).alias("pdot"), "cn2"))
    scored = (cand
              .join(codes.withColumnRenamed("id", "neighbor_id"),
                    "neighbor_id")
              .join(F.broadcast(lut), ["query_id", "sub", "code"])
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("pdot").alias("adot"),
                   F.sum("cn2").alias("rn2")))
    qn = qflat.select(F.col("id").alias("query_id"),
                      F.col("nrm").alias("q_nrm"))
    return _topk(
        scored.join(F.broadcast(qn), "query_id")
        .withColumn("cosine",
                    F.col("adot") / (F.col("q_nrm") * F.sqrt("rn2"))), k)


def ivf_write_pq(embeddings: DataFrame, path: str, n_centroids: int = 32,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 dim: int = DIM, m: int = 8, ksub: int = 16,
                 iters: int = 1) -> None:
    """IVF + product quantization as ONE persistent index (the FAISS
    IVFPQ architecture): the cell-partitioned layout of ivf_write, but
    each row stores only m one-byte PQ codes — 32x smaller rows than
    the float32 layout (vs SQ8's 4x), while probes still prune to
    nprobe partition directories. The m*ksub-row codebook and the
    coarse centroids are sidecar tables; at 100 TB the code table is
    the ONLY per-vector payload the search scans.

    Same deterministic cell assignment as ivf_write (md5-seeded
    centroids, rounded-cosine max_by); codes are pq_train/pq_encode's
    seeded-Lloyd contract, packed sub-major into one array<tinyint>.
    """
    corpus = _flat(embeddings, id_col, vec_col, dim, "c")
    cents = _select_centroids(corpus, n_centroids, dim)
    assign = (_cell_scores(corpus, cents, dim, "c")
              .groupBy("id")
              .agg(F.max_by(
                  "cent_id",
                  F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                           (-F.col("cent_id")).alias("t")))
                  .alias("cell_id")))
    codebook, codes = pq_index_cached(embeddings, id_col, vec_col,
                                      dim, m, ksub, iters)
    packed = (codes
              .groupBy("id")
              .agg(F.transform(
                  F.array_sort(F.collect_list(
                      F.struct(F.col("sub"), F.col("code")))),
                  lambda s: s.getField("code").cast("tinyint"))
                  .alias("pq_codes")))
    (packed.join(assign, "id")
     .write.mode("overwrite").partitionBy("cell_id").parquet(path))
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")
    codebook.write.mode("overwrite").parquet(f"{path}/_codebook")


def ivf_search_pq(spark, path: str, queries: DataFrame, k: int = 5,
                  nprobe: int = 2, id_col: str = "vec_id",
                  vec_col: str = "embedding", dim: int = DIM,
                  m: int = 8) -> DataFrame:
    """Probe a persisted IVFPQ index: nprobe partition pruning on
    cell_id, then ADC scoring of the scanned m-byte codes against the
    per-query LUT built from the sidecar codebook — ann_ivf_pq's math
    over the write-time layout. Output contract matches ann_ivf."""
    cents = spark.read.parquet(f"{path}/_centroids")
    codebook = spark.read.parquet(f"{path}/_codebook")
    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))
    probe_rows = probes.collect()
    cells = sorted({r.cent_id for r in probe_rows})

    dsub = dim // m
    qsubs = _pq_subspaces(qflat, dim, m, "q")
    st = " + ".join(f"s{i} * t{i}" for i in range(dsub))
    lut = (qsubs.join(F.broadcast(codebook), "sub")
           .select(F.col("id").alias("query_id"), "sub", "code",
                   F.expr(st).alias("pdot"), "cn2"))

    # Partition-pruned scan ships m tinyints per row; unpack sub-major.
    raw = (spark.read.parquet(path)
           .where(F.col("cell_id").isin(cells))
           .select("cell_id", F.col("id").alias("neighbor_id"),
                   F.posexplode("pq_codes").alias("sub", "code"))
           .withColumn("code", F.col("code").cast("int")))
    probe_df = F.broadcast(spark.createDataFrame(
        [(r.query_id, r.cent_id) for r in probe_rows],
        "query_id long, cell_id long"))
    scored = (probe_df.join(raw, "cell_id")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .join(F.broadcast(lut), ["query_id", "sub", "code"])
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("pdot").alias("adot"),
                   F.sum("cn2").alias("rn2")))
    qn = qflat.select(F.col("id").alias("query_id"),
                      F.col("nrm").alias("q_nrm"))
    return _topk(
        scored.join(F.broadcast(qn), "query_id")
        .withColumn("cosine",
                    F.col("adot") / (F.col("q_nrm") * F.sqrt("rn2"))), k)


# --------------------------------------------------------------------------
# binary (1-bit sign) quantization + Hamming search with asymmetric rerank
# --------------------------------------------------------------------------
#
# The fourth compression point of the index family after float32 (1x),
# int8 SQ (4x) and PQ (32x at m=8): 1 bit per component = 32x vs float32,
# but with a trivially cheap distance (XOR + popcount on packed words)
# instead of PQ's per-query lookup tables. This is the "binary
# quantization" mode modern vector stores ship for first-stage filtering;
# recall is recovered by reranking a small Hamming-candidate pool with
# exact float scores (asymmetric refinement), so the full-precision
# vectors are touched for only rerank_n rows per query.
#
# Packing is 32 bits per BIGINT word (not 64): both engines then evaluate
# the same SUM(CASE v[i] > 0 THEN 2^j) arithmetic without ever nearing
# the sign bit, so codes are exact cross-engine integers.

_BIN_WORD = 32


def _bin_pack_exprs(vec_col: str, dim: int, prefix: str) -> list[str]:
    """SQL expressions packing sign bits into ceil(dim/32) BIGINT words:
    bit j of word w is set iff component w*32+j > 0.

    Emitted as a compact aggregate-over-slice fold, NOT the unrolled
    64-term CASE sum: the unrolled form inflates the enclosing
    whole-stage-codegen method past HotSpot's JIT compile threshold, so
    the ENTIRE fused stage (scan + pack + join + popcount) ran
    interpreted — measured 8x on the hamming pair scan at sf1 (1.75s ->
    0.22s once the stage compiles). The fold keeps the generated method
    small; the per-element lambda cost is paid once per ROW at pack
    time, never per pair."""
    exprs = []
    for w in range((dim + _BIN_WORD - 1) // _BIN_WORD):
        width = min(_BIN_WORD, dim - w * _BIN_WORD)
        exprs.append(
            f"aggregate(transform(slice({vec_col}, {w * _BIN_WORD + 1}, "
            f"{width}), v -> CASE WHEN CAST(v AS DOUBLE) > 0.0 "
            "THEN 1 ELSE 0 END), "
            "named_struct('a', CAST(0 AS BIGINT), 'p', CAST(1 AS BIGINT)), "
            "(s, x) -> named_struct('a', s.a + x * s.p, 'p', s.p * 2), "
            f"s -> s.a) AS {prefix}{w}")
    return exprs


def quantize_binary(embeddings: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """1-bit sign quantization of the embedding column: 32x smaller than
    float32, the cheapest index representation in the family. Pure
    columnar projection, NO shuffle — codes flow straight into a
    partitioned index layout like the int8/PQ variants.

    Output: vec_id, b0..b{W-1} (packed 32-bit words as BIGINT), nbits
    (population count — the integer checksum of the code), density
    (nbits/dim — a balance diagnostic: healthy zero-centered embeddings
    sit near 0.5).
    """
    words = (dim + _BIN_WORD - 1) // _BIN_WORD
    packed = embeddings.selectExpr(
        id_col, *_bin_pack_exprs(vec_col, dim, "b"))
    nbits = F.expr(" + ".join(f"bit_count(b{w})" for w in range(words)))
    return packed.select(
        id_col, *[f"b{w}" for w in range(words)],
        nbits.cast("bigint").alias("nbits")).withColumn(
        "density", F.col("nbits") / F.lit(float(dim)))


def _hamming_candidates(scored: DataFrame, rerank_n: int) -> DataFrame:
    """Top-`rerank_n` Hamming candidates per query from a scored
    (query_id, neighbor_id, hamming) pair stream, WITHOUT windowing the
    full stream: a row_number window over all query x corpus pairs
    shuffles and sorts the entire scored set (measured 7.3s of a 7.7s
    stage-1 at sf1, vs 0.36s for the scan itself). Hamming distance
    has at most dim+1 distinct values, so a per-(query, hamming)
    histogram — map-side combined to <= n_queries * (dim+1) rows —
    yields each query's rank-rerank_n distance threshold; the exact
    tie-broken window then runs only on rows at-or-under the
    threshold (~rerank_n + final-bucket ties per query). Costs one
    extra scan of the pair stream, which is the cheap XOR+popcount
    part. Result is identical to windowing the full stream: the same
    (hamming asc, neighbor_id asc) row_number prunes the tie surplus.
    """
    hist = (scored.groupBy("query_id", "hamming")
            .agg(F.count(F.lit(1)).alias("n")))
    wcum = (Window.partitionBy("query_id").orderBy("hamming")
            .rowsBetween(Window.unboundedPreceding, 0))
    th = (hist.withColumn("cum", F.sum("n").over(wcum))
          .where(F.col("cum") - F.col("n") < rerank_n)
          .groupBy("query_id").agg(F.max("hamming").alias("_h_max")))
    wnd = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc())
    return (scored.join(F.broadcast(th), "query_id")
            .where(F.col("hamming") <= F.col("_h_max"))
            .withColumn("hrank", F.row_number().over(wnd))
            .where(F.col("hrank") <= rerank_n)
            .select("query_id", "neighbor_id"))


def ann_hamming(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                rerank_n: int = 20, id_col: str = "vec_id",
                vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Binary-quantized two-stage search: stage 1 scans ONLY the packed
    sign bits (1/32 of the float bytes; XOR+popcount per pair, no
    multiplies) and keeps the rerank_n Hamming-nearest candidates per
    query; stage 2 rescores just those candidates with exact float
    cosine (asymmetric refinement). At 100 TB the stage-1 scan is the
    whole cost — 2 BIGINT columns per row at dim 64 — and stage 2 is a
    k-row-per-query id-join back to the full-precision table.

    Deterministic end-to-end: codes are exact integers, stage-1 ties
    break on (hamming asc, neighbor_id asc), stage-2 ranks on (rounded
    cosine desc, neighbor_id asc) like every other ANN in the family.

    Output: query_id, neighbor_id, rank, cosine.
    """
    words = (dim + _BIN_WORD - 1) // _BIN_WORD
    cpk = embeddings.selectExpr(
        f"{id_col} AS neighbor_id", *_bin_pack_exprs(vec_col, dim, "cb"))
    qpk = queries.selectExpr(
        f"{id_col} AS query_id", *_bin_pack_exprs(vec_col, dim, "qb"))
    ham = F.expr(" + ".join(
        f"bit_count(qb{w} ^ cb{w})" for w in range(words)))
    scored = (F.broadcast(qpk).crossJoin(cpk)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("hamming", ham.cast("bigint")))
    cand = _hamming_candidates(scored, rerank_n)
    # Stage 2: exact float rerank of the candidate pool only.
    c = (_flat_cached(embeddings, id_col, vec_col, dim, "c")
         .drop("vec")
         .withColumnRenamed("id", "neighbor_id")
         .withColumnRenamed("nrm", "c_nrm"))
    q = (_flat(queries, id_col, vec_col, dim, "q").drop("vec")
         .withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    rescored = (cand.join(F.broadcast(q), "query_id")
                .join(c, "neighbor_id")
                .withColumn("cosine",
                            _flat_dot("q", "c", dim)
                            / (F.col("q_nrm") * F.col("c_nrm"))))
    return _topk(rescored, k)


def ivf_write_bin(embeddings: DataFrame, path: str, n_centroids: int = 32,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int = DIM) -> None:
    """IVF + binary quantization as ONE persistent index: the
    cell-partitioned layout of ivf_write, but each row stores only the
    packed sign-bit words (2 BIGINTs at dim 64) — 32x smaller rows than
    float32, the cheapest serving shape in the family (float > int8 >
    PQ/binary). Probes prune to nprobe partition directories and the
    per-row distance is XOR+popcount; full-precision rerank reads the
    PRIMARY vector store by id (the index deliberately does not
    duplicate the floats).

    Same deterministic cell assignment as ivf_write (md5-seeded
    centroids, rounded-cosine max_by); codes are quantize_binary's
    exact integer words.
    """
    corpus = _flat(embeddings, id_col, vec_col, dim, "c")
    cents = _select_centroids(corpus, n_centroids, dim)
    assign = (_cell_scores(corpus, cents, dim, "c")
              .groupBy("id")
              .agg(F.max_by(
                  "cent_id",
                  F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                           (-F.col("cent_id")).alias("t"))).alias("cell_id")))
    packed = embeddings.selectExpr(
        f"{id_col} AS id", *_bin_pack_exprs(vec_col, dim, "b"))
    (packed.join(assign, "id")
     .write.mode("overwrite").partitionBy("cell_id").parquet(path))
    cents.write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_search_bin(spark, path: str, queries: DataFrame,
                   rerank_src: DataFrame, k: int = 5, nprobe: int = 2,
                   rerank_n: int = 40, id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = DIM) -> DataFrame:
    """Probe a binary IVF index: nprobe partition pruning like
    ivf_search, Hamming (XOR+popcount) candidate selection over the
    packed words, then exact float rerank against the primary vector
    store (`rerank_src`) — ann_hamming's two-stage search restricted to
    the probed cells. Output contract and tie-breaks match ann_ivf.
    """
    words = (dim + _BIN_WORD - 1) // _BIN_WORD
    cents = spark.read.parquet(f"{path}/_centroids")
    qflat = _flat_cached(queries, id_col, vec_col, dim, "q")
    wq = Window.partitionBy("id").orderBy(
        F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
    probes = (_cell_scores(qflat, cents, dim, "q")
              .withColumn("crank", F.row_number().over(wq))
              .where(F.col("crank") <= nprobe)
              .select(F.col("id").alias("query_id"), "cent_id"))
    probe_rows = probes.collect()
    cells = sorted({r.cent_id for r in probe_rows})

    qpk = queries.selectExpr(
        f"{id_col} AS query_id", *_bin_pack_exprs(vec_col, dim, "qb"))
    # Partition-pruned scan ships `words` BIGINTs per row.
    raw = (spark.read.parquet(path)
           .where(F.col("cell_id").isin(cells))
           .selectExpr("cell_id", "id AS neighbor_id",
                       *[f"b{w} AS cb{w}" for w in range(words)]))
    probe_df = F.broadcast(spark.createDataFrame(
        [(r.query_id, r.cent_id) for r in probe_rows],
        "query_id long, cell_id long"))
    ham = F.expr(" + ".join(
        f"bit_count(qb{w} ^ cb{w})" for w in range(words)))
    cand_scored = (probe_df.join(raw, "cell_id")
                   .where(F.col("query_id") != F.col("neighbor_id"))
                   .join(F.broadcast(qpk), "query_id")
                   .withColumn("hamming", ham.cast("bigint")))
    cand = _hamming_candidates(cand_scored, rerank_n)
    c = (_flat_cached(rerank_src, id_col, vec_col, dim, "c")
         .drop("vec")
         .withColumnRenamed("id", "neighbor_id")
         .withColumnRenamed("nrm", "c_nrm"))
    q = (qflat.drop("vec")
         .withColumnRenamed("id", "query_id")
         .withColumnRenamed("nrm", "q_nrm"))
    rescored = (cand.join(F.broadcast(q), "query_id")
                .join(c, "neighbor_id")
                .withColumn("cosine",
                            _flat_dot("q", "c", dim)
                            / (F.col("q_nrm") * F.col("c_nrm"))))
    return _topk(rescored, k)


# MMR pool memo: the per-query candidate pool is reused by the pair
# matrix and the greedy cogroup within one call and across repeated
# calls in a session; bounded/evicting like _FLAT_CACHE.
_MMR_POOL_CACHE: dict[tuple, tuple[DataFrame, DataFrame, DataFrame]] = {}


def mmr_select(embeddings: DataFrame, queries: DataFrame, k: int = 5,
               pool_n: int = 20, lam: float = 0.7, pen_w: float = 0.3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int = DIM) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein SIGIR'98): greedily pick argmax
    lam * rel(q, d) - pen_w * max_{s in selected} sim(d, s), seeding
    with max relevance (empty-set penalty = 0, i.e. step-1 score is
    lam * rel). The dedup-aware ranking step of a retrieval pipeline —
    near-identical candidates can't crowd the top-k.

    Scale shape: the candidate pool (pool_n per query via exact kNN) and
    its pairwise sim matrix (pool_n^2 per query) are computed
    distributively with JVM dot products; the greedy loop itself runs
    INSIDE one cogrouped applyInPandas over query_id — the group is
    pool_n rel rows + pool_n^2 sim rows, BOUNDED BY CONSTRUCTION, so
    the sequential-in-k part touches only group-local numpy state. One
    shuffle total, no driver round trips (the previous driver-loop
    formulation paid k-1 collect+replan rounds: 5.4s steady vs this
    plan's sub-second at sf0.1, identical output). lam and pen_w are
    independent literals (NOT computed as 1-lam: 0.3 has an exact parse
    both engines share; 1.0-0.7 in binary does not); the scalar
    mult/subtract sequence is the same IEEE ops the JVM version ran.

    Output: query_id, neighbor_id, mmr_rank (1..k), mmr. Deterministic:
    (rounded score desc, neighbor_id asc) tie-breaks at every step,
    rounding half-away-from-zero at 6 dp — the F.round/DECIMAL contract
    the SQL replay shares.
    """
    import numpy as np
    import pandas as pd

    from nexus_spark.operators.dedup import _bounded_put, _session_key

    # Pool memo (bounded, session-keyed like _FLAT_CACHE): rel feeds
    # both the pair matrix and the cogroup, and the lazy return can't
    # unpersist after itself — an unbounded per-call persist would
    # accumulate storage across a sweep.
    mkey = (_session_key(embeddings.sparkSession),
            embeddings.semanticHash(), queries.semanticHash(),
            pool_n, id_col, vec_col, dim)
    hit = _MMR_POOL_CACHE.get(mkey)
    # Confirm on BOTH frames: the key carries queries only via
    # semanticHash, so a hash collision between different query sets
    # over the same corpus would otherwise return a wrong cached pool.
    if (hit is not None and hit[0].sameSemantics(embeddings)
            and hit[1].sameSemantics(queries)):
        rel = hit[2]
    else:
        rel = (knn_bruteforce(embeddings, queries, k=pool_n,
                              id_col=id_col, vec_col=vec_col, dim=dim)
               .select("query_id", "neighbor_id",
                       F.col("cosine").alias("rel"))
               .persist())
        _bounded_put(_MMR_POOL_CACHE, mkey, (embeddings, queries, rel),
                     frame_idx=2)
    flat = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    fa = flat.select(F.col("id").alias("ca"), F.col("nrm").alias("na"),
                     *[F.col(f"c{i}").alias(f"a{i}") for i in range(dim)])
    fb = flat.select(F.col("id").alias("cb"), F.col("nrm").alias("nb"),
                     *[F.col(f"c{i}").alias(f"b{i}") for i in range(dim)])
    pairs = (rel.select("query_id", F.col("neighbor_id").alias("ca"))
             .join(rel.select("query_id", F.col("neighbor_id").alias("cb")),
                   "query_id")
             .where(F.col("ca") != F.col("cb"))
             .join(fa, "ca").join(fb, "cb")
             # fresh key attribute (qid): pairs shares lineage with rel,
             # and cogrouping both sides on the SAME query_id exprId
             # trips the ambiguous-self-join analyzer check
             .select(F.col("query_id").alias("qid"), "ca", "cb",
                     (_flat_dot("a", "b", dim)
                      / (F.col("na") * F.col("nb"))).alias("sim")))

    def r6(x):  # round half-away-from-zero at 6 dp (F.round contract)
        return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6

    def greedy(rel_pdf, pairs_pdf):
        if not len(rel_pdf):
            return pd.DataFrame({"query_id": [], "neighbor_id": [],
                                 "mmr_rank": [], "mmr": []})
        qid = int(rel_pdf["query_id"].iloc[0])
        ids = rel_pdf["neighbor_id"].to_numpy()
        relv = rel_pdf["rel"].to_numpy()
        m = len(ids)
        pos = {int(v): i for i, v in enumerate(ids)}
        sim = np.zeros((m, m))
        if len(pairs_pdf):
            ia = pairs_pdf["ca"].map(pos).to_numpy()
            ib = pairs_pdf["cb"].map(pos).to_numpy()
            sim[ia, ib] = pairs_pdf["sim"].to_numpy()
        out_id, out_rank, out_mmr = [], [], []
        avail = np.ones(m, dtype=bool)
        pen = None
        for step in range(1, min(k, m) + 1):
            score = (lam * relv if pen is None
                     else lam * relv - pen_w * pen)
            cand = np.flatnonzero(avail)
            # argmax by (rounded score desc, neighbor_id asc)
            best = cand[np.lexsort((ids[cand], -r6(score[cand])))[0]]
            out_id.append(int(ids[best]))
            out_rank.append(step)
            out_mmr.append(float(score[best]))
            avail[best] = False
            col = sim[:, best]
            pen = col.copy() if pen is None else np.maximum(pen, col)
        return pd.DataFrame({"query_id": qid, "neighbor_id": out_id,
                             "mmr_rank": out_rank, "mmr": out_mmr})

    return (rel.groupBy("query_id")
            .cogroup(pairs.groupBy("qid"))
            .applyInPandas(
                greedy,
                "query_id long, neighbor_id long, mmr_rank int, "
                "mmr double"))


def knn_graph_ivf(embeddings: DataFrame, k: int = 5,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  dim: int = DIM, n_centroids: int = 32,
                  nprobe: int = 2) -> DataFrame:
    """MUTUAL k-NN graph over the corpus — the neighborhood structure
    clustering / manifold methods (kNN-graph CC, UMAP-style layouts,
    graph-dedup) consume. Every vector ranks its IVF-cell co-residents
    by exact cosine; an edge survives only if each endpoint is in the
    OTHER's top-k (mutuality is the standard noise filter: hubs collect
    thousands of one-way neighbors, mutual edges stay sparse).

    Scale shape: candidate volume is sum(|cell|^2) like the IVF
    near-dup (never n^2), ranks are one window per source node, and
    mutuality is a self-equi-join of the two directed edge lists on the
    reversed key. All deterministic (md5-seeded centroids, rounded
    tie-broken ranks) so the oracle replays it exactly.

    Pair scoring + the per-cell k-cut run in ONE cogrouped
    applyInPandas, not a relational self-join: the join formulation
    shipped the 64-column flat frame through TWO shuffles sized by the
    sum(|cell|^2) candidate stream (~65 cols x millions of pair rows),
    then windowed 2x that stream for the top-k. This shape shuffles
    only (cell, id, vec) rows — the corpus, once — scores each cell
    with a blocked BLAS Gram slab, and emits each vector's per-cell
    top-k DIRECTED edges as narrow map-side output: the global top-k is
    a subset of the union of per-cell top-ks (any neighbor in the
    global list ranks <= k inside the cell that produced it), so the
    exact Spark window runs over <= n * nprobe * k rows instead of the
    full pair stream (25.6M -> ~200k at sf1; 11.7s -> ~2s). The
    in-cell cut replicates the window's exact ordering — cosine rounded
    6dp HALF-UP, then neighbor id — including whole tie groups at the
    boundary before the final lexsort, so structured ties (exact
    duplicate vectors) cannot change the selected set. Per-task memory
    is one row-block x |cell| Gram slab; with the standard n_centroids
    ~ sqrt(n) IVF sizing the cell stays bounded as the corpus grows,
    the same contract the relational path's shuffle volume already
    assumed. An edge found in two shared probe cells is scored
    identically in both (deterministic per-cell numpy) and deduped by
    a max aggregate over the tiny directed stream.

    Output: id_a < id_b, rank_ab (b's rank in a's list), rank_ba,
    cosine.
    """
    from pyspark.sql import Window

    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    cells = ivf_cells_cached(corpus, dim, n_centroids, nprobe)

    vecs = cells.join(
        embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("_v")), "id")
    kk = int(k)

    def score_cell(pdf):
        import numpy as np
        import pandas as pd

        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        V = np.array(list(pdf["_v"]), dtype=np.float64)[order]
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        n = len(ids)
        out_s, out_d, out_c = [], [], []
        block = 1024
        for s in range(0, n, block):
            e = min(s + block, n)
            G = V[s:e] @ V.T
            # window-order key: round-6 half-away-from-zero (= Spark's
            # F.round on doubles for these magnitudes), desc
            R6 = np.sign(G) * np.floor(np.abs(G) * 1e6 + 0.5) / 1e6
            for r in range(e - s):
                i = s + r
                g, r6 = G[r].copy(), R6[r].copy()
                r6[i] = -np.inf  # never self
                m = n - 1
                if m <= 0:
                    continue
                if m > kk:
                    cut = np.argpartition(-r6, kk - 1)[:kk]
                    thresh = r6[cut].min()
                    cand = np.nonzero(r6 >= thresh)[0]  # + tie group
                else:
                    cand = np.nonzero(r6 > -np.inf)[0]
                sel = cand[np.lexsort((ids[cand], -r6[cand]))][:kk]
                out_s.append(np.full(len(sel), ids[i]))
                out_d.append(ids[sel])
                out_c.append(g[sel])
        if not out_s:
            return pd.DataFrame({"src": [], "dst": [], "cosine": []}) \
                .astype({"src": "int64", "dst": "int64",
                         "cosine": "float64"})
        return pd.DataFrame({"src": np.concatenate(out_s),
                             "dst": np.concatenate(out_d),
                             "cosine": np.concatenate(out_c)})

    directed = (vecs.groupBy("cent_id")
                .applyInPandas(score_cell,
                               "src long, dst long, cosine double")
                .groupBy("src", "dst")
                .agg(F.max("cosine").alias("cosine")))

    # Exact global rank over the pre-cut directed stream (<= nprobe * k
    # candidates per src), then fold the two surviving directions of a
    # pair back together with a conditional aggregate — an edge is
    # mutual iff both directions survived the top-k cut.
    w = Window.partitionBy("src").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("dst").asc())
    topk = (directed.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
    fwd_rank = F.max(F.when(F.col("src") < F.col("dst"),
                            F.col("rank"))).alias("rank_ab")
    rev_rank = F.max(F.when(F.col("src") > F.col("dst"),
                            F.col("rank"))).alias("rank_ba")
    return (topk.groupBy(F.least("src", "dst").alias("id_a"),
                         F.greatest("src", "dst").alias("id_b"))
            .agg(fwd_rank, rev_rank, F.first("cosine").alias("cosine"))
            .where(F.col("rank_ab").isNotNull()
                   & F.col("rank_ba").isNotNull())
            .select("id_a", "id_b", "rank_ab", "rank_ba", "cosine"))


def _gram_moments(embeddings: DataFrame, vec_col: str, dim: int):
    """ONE corpus pass → (n, s, G) on the driver: row count, per-
    component sums, and the upper-triangle Gram matrix X^T X.

    Each Arrow batch contributes its partial Gram block as a d x d
    numpy matmul (the BLAS-per-batch pattern embedding_near_dup_gemm
    uses) plus per-component sums and a row count, encoded as
    (i, j, v) rows — d(d+1)/2 + d + 1 rows per batch REGARDLESS of
    batch row count. The combine is one tiny groupBy(i, j) SUM
    collected straight to the driver — fixed ~d^2 scalars of
    corpus-size-independent state, the same contract as the k-row
    kmeans centroid state; no shuffle ever carries vector-scaled data.
    """
    import numpy as np
    import pandas as pd

    d = int(dim)
    iu, ju = (x.astype("int32") for x in np.triu_indices(d))
    ii = np.concatenate([iu, np.arange(d, dtype="int32"),
                         np.array([-1], dtype="int32")])
    jj = np.concatenate([ju, np.full(d, -1, dtype="int32"),
                         np.array([-1], dtype="int32")])

    def gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = x.T @ x
            yield pd.DataFrame({
                "i": ii, "j": jj,
                "v": np.concatenate([g[(iu, ju)], x.sum(axis=0),
                                     [float(x.shape[0])]])})

    n = 0.0
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in (embeddings.select(vec_col)
              .mapInPandas(gram, "i int, j int, v double")
              .groupBy("i", "j").agg(F.sum("v").alias("v"))
              .collect()):
        if r["i"] < 0:
            n = r["v"]
        elif r["j"] < 0:
            s[r["i"]] = r["v"]
        else:
            G[r["i"], r["j"]] = r["v"]
    return n, s, G


def embedding_covariance(embeddings: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int = DIM) -> DataFrame:
    """Sample covariance matrix of the embedding corpus as (i, j, cov)
    upper-triangle rows (0-based, ddof=1) — the fixed d x d summary
    that PCA, whitening, and Mahalanobis outlier scoring start from.

    Scale: ONE corpus pass (_gram_moments). cov =
    (S_ij - n*mu_i*mu_j) / (n - 1) is assembled DRIVER-side from the
    collected moments — round 13: the former JVM assembly expanded a
    checkpointed moment frame through 8 references and three broadcast
    joins (checkpoint job + join jobs per call); one collect of the
    same combined rows replaces all of it with d^2 scalar arithmetic,
    bit-identical because the formula and its double inputs are
    unchanged.
    """
    d = int(dim)
    n, s, G = _gram_moments(embeddings, vec_col, d)
    spark = embeddings.sparkSession
    if not n:
        return spark.createDataFrame([], "i int, j int, cov double")
    mu = s / n
    rows = [(i, j,
             float((G[i, j] - n * mu[i] * mu[j]) / (n - 1.0)))
            for i in range(d) for j in range(i, d)]
    return spark.createDataFrame(rows, "i int, j int, cov double")


def pca_top_component(embeddings: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", dim: int = DIM,
                      iterations: int = 8) -> DataFrame:
    """Score every vector against the corpus' first principal component
    (centered projection) — the 1-d summary behind embedding drift
    plots, coarse diversity bucketing, and PCA-whitening pipelines.

    Power iteration runs DRIVER-SIDE on the d x d covariance assembled
    from ONE _gram_moments corpus pass — fixed d^2 scalars of
    corpus-size-independent state, the same contract as the k-row
    kmeans centroid state — from the deterministic start
    v0 = 1/sqrt(d), w = C v / ||C v|| for a FIXED iteration count, so
    an unrolled SQL replay performs the identical arithmetic. The
    centering mean is served from the same pass (mu_i = s_i / n;
    round 13 — the former separate F.avg aggregate over the flat frame
    was a second corpus-pass job whose result differs only in
    summation order, i.e. below the 6-dp output rounding). The
    projection itself is one JVM-side unrolled expression over the
    cached flat frame (no Python in the corpus pass). No sign fix-up:
    both engines iterate from the same v0, so they converge to the
    same signed vector.

    Output: (id_col, pc1).
    """
    import numpy as np

    d = int(dim)
    n, s, G = _gram_moments(embeddings, vec_col, d)
    mu = s / n
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            cov[i, j] = cov[j, i] = ((G[i, j] - n * mu[i] * mu[j])
                                     / (n - 1.0))
    flat = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    v = np.full(d, 1.0 / np.sqrt(float(d)))
    for _ in range(int(iterations)):
        w = cov @ v
        v = w / np.sqrt(float((w * w).sum()))
    proj = " + ".join(f"(c{i} - {mu[i]!r}) * {v[i]!r}" for i in range(d))
    return flat.select(F.col("id").alias(id_col),
                       F.expr(proj).alias("pc1"))


def embedding_outliers(embeddings: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", dim: int = DIM,
                       top_n: int = 50) -> DataFrame:
    """Per-vector outlier score = sum of squared per-dimension z-scores
    (diagonal Mahalanobis distance), top-N — the embedding-QA pass that
    surfaces encoder failures (zero vectors, saturated dims, wrong-model
    batches) before they poison dedup thresholds or IVF training.

    One corpus pass for the per-dimension moments, one scoring pass
    against the resulting 2*dim broadcast constants — state bounded at
    2*dim scalars either way. The z-denominator is the POPULATION
    stddev (sqrt(E[x^2] - E[x]^2)); zero-variance dims contribute 0 by
    convention.

    Round-9 shape: both passes are narrow Arrow-batched mapInPandas
    stages instead of a 2*dim-column JVM aggregate + a dim-term unrolled
    scoring expression. At sf1 the arithmetic is milliseconds; the cost
    was Py4J construction and codegen of the 129-column plans (same
    mechanism the streaming PQ encode attribution measured), and the
    numpy passes cut sf1 steady 1.6 -> ~0.6s on the r9 host. Pass 1
    emits 2*dim+1 moment partials per Arrow batch (columnwise
    left-to-right sums), combined on the driver; pass 2 scores
    left-to-right over ascending dims — term-for-term the oracle's
    (x-mu)^2/var chain — and pre-cuts to a per-slice top-N before the
    global TakeOrdered merge, so the sort never sees more than
    top_n * n_slices rows.

    Output: (id_col, score, rank) — rank 1..top_n by (rounded score
    desc, id asc), the shared deterministic top-k contract.
    """
    import numpy as np

    # Feed both passes from the shared cached flat frame (warm index
    # state like every other sim_* query): column pruning on the
    # InMemoryTableScan keeps the Arrow transfer at (id, vec) width.
    src = (_flat_cached(embeddings, id_col, vec_col, dim, "c")
           .select("id", "vec"))

    def moments(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["vec"]])
            s = np.zeros(dim)
            q = np.zeros(dim)
            for i in range(dim):
                s[i] = X[:, i].sum()
                q[i] = (X[:, i] * X[:, i]).sum()
            yield pd.DataFrame({"n": [float(len(pdf))],
                                **{f"s{i}": [s[i]] for i in range(dim)},
                                **{f"q{i}": [q[i]] for i in range(dim)}})

    mschema = ("n double, "
               + ", ".join(f"s{i} double" for i in range(dim)) + ", "
               + ", ".join(f"q{i} double" for i in range(dim)))
    parts = src.select("vec").mapInPandas(moments, mschema).collect()
    n = sum(r["n"] for r in parts)
    mu = np.array([sum(r[f"s{i}"] for r in parts) / n
                   for i in range(dim)])
    var = np.array([sum(r[f"q{i}"] for r in parts) / n - mu[i] * mu[i]
                    for i in range(dim)])
    live = [i for i in range(dim) if var[i] > 0.0]

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64)
                          for v in pdf["vec"]])
            acc = np.zeros(len(pdf))
            for i in live:  # ascending dims, left-to-right like the SQL
                d = X[:, i] - mu[i]
                acc += d * d / var[i]
            out = pd.DataFrame({"id": pdf["id"].to_numpy(dtype=np.int64),
                                "score": acc})
            # per-slice pre-cut: the global merge sees <= top_n rows
            # per Arrow batch (same ordering key as the final sort)
            out["r6"] = np.sign(acc) * np.floor(np.abs(acc) * 1e6
                                                + 0.5) / 1e6
            out = out.sort_values(["r6", "id"],
                                  ascending=[False, True]).head(top_n)
            yield out[["id", "score"]]

    top = (src.mapInPandas(score, "id long, score double")
           .orderBy(F.round(F.col("score"), 6).desc(), F.col("id").asc())
           .limit(top_n))
    w = Window.orderBy(F.round(F.col("score"), 6).desc(),
                       F.col("id").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select(F.col("id").alias(id_col), "score", "rank"))
