"""Similarity search over an embedding column (array<float>).

- knn_bruteforce: exact cosine top-k — the correctness baseline. Query side
  must be small (it is broadcast); candidate side streams at any scale.
- ann_lsh: random-hyperplane LSH — the 100 TB path: candidates share a
  signed-projection bucket, so the join is an equi-join on (table, bucket),
  not a cross join. Hyperplanes are seeded-RNG Gaussian vectors embedded as
  plan literals, so the plan is reproducible run to run.

All vector math is JVM-side higher-order functions (zip_with/aggregate) in
double precision — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_vec(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Project to (id, vec double[], nrm)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"))
        .withColumn(
            "nrm",
            F.sqrt(F.aggregate(F.transform(F.col("vec"), lambda x: x * x),
                               F.lit(0.0), lambda a, x: a + x)))
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def knn_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Output: query_id, neighbor_id, rank, cosine. Deterministic tie-break on
    (rounded cosine desc, neighbor_id asc). Queries broadcast; the candidate
    scan streams — one shuffle for the per-query top-k window.
    """
    q = _with_vec(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"))
    c = _with_vec(embeddings, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine",
                    _dot(F.col("q_vec"), F.col("c_vec"))
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def _bucket_expr(vec, dim: int, n_planes: int, table: int, seed: int = 42):
    """LSH bucket id for one hash table: n_planes sign bits packed into an
    int. Hyperplanes are standard-normal vectors from a seeded RNG,
    materialized as literal arrays at plan-build time — deterministic and
    reproducible, with none of the correlation a closed-form pseudo-random
    sequence would have."""
    import numpy as np

    rng = np.random.RandomState(seed + 1000 * table)
    planes = rng.randn(n_planes, dim)
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(float(h)) for h in planes[p]])
        proj = F.aggregate(F.zip_with(vec, plane, lambda x, h: x * h),
                           F.lit(0.0), lambda a, x: a + x)
        bucket = bucket + F.when(proj >= 0, F.lit(2 ** p)).otherwise(F.lit(0))
    return bucket


def ann_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            centroid_mod: int = 31, nprobe: int = 2) -> DataFrame:
    """IVF-style ANN: coarse quantization + probe-limited search.

    Centroids are the deterministic subset id % centroid_mod == 0 (a
    k-means iteration could refine them; the partition/probe machinery is
    identical and this keeps the operator reproducible and oracle-checkable).
    Every vector is assigned to its nearest centroid (broadcast of the tiny
    centroid set); a query scores only vectors in its `nprobe` nearest
    cells. At scale the assignment is a write-time partitioning column, so
    a query touches nprobe partitions instead of the full corpus.

    Output: query_id, neighbor_id, rank, cosine (approximate).
    """
    # One normalized-vector frame serves centroid derivation, assignment,
    # probing, and final scoring — cache it instead of re-deriving 4x.
    vecs = _with_vec(embeddings, id_col, vec_col).cache()
    cents = (vecs.where(F.col("id") % centroid_mod == 0)
             .select(F.col("id").alias("cent_id"),
                     F.col("vec").alias("cent_vec"),
                     F.col("nrm").alias("cent_nrm")))

    def nearest_cells(v: DataFrame, ident: str, n: int) -> DataFrame:
        scored = (
            v.crossJoin(F.broadcast(cents))
            .withColumn("c_cos",
                        _dot(F.col("vec"), F.col("cent_vec"))
                        / (F.col("nrm") * F.col("cent_nrm")))
        )
        w = Window.partitionBy("id").orderBy(
            F.round(F.col("c_cos"), 6).desc(), F.col("cent_id").asc())
        return (scored.withColumn("crank", F.row_number().over(w))
                .where(F.col("crank") <= n)
                .select(F.col("id").alias(ident), "cent_id"))

    qvecs = _with_vec(queries, id_col, vec_col).cache()
    assign = nearest_cells(vecs, "neighbor_id", 1)
    probes = nearest_cells(qvecs, "query_id", nprobe)

    q = qvecs.select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"))
    c = vecs.select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"))
    scored = (
        probes.join(assign, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
        .join(F.broadcast(q), "query_id").join(c, "neighbor_id")
        .withColumn("cosine",
                    _dot(F.col("q_vec"), F.col("c_vec"))
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)


def ann_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int = 64, n_planes: int = 4, n_tables: int = 8) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    n_tables independent tables of n_planes bits; a candidate is scored iff
    it shares a bucket with the query in >= 1 table. Equi-join on
    (tbl, bucket) replaces the cross join — the 100 TB path. Output like
    knn_bruteforce (approximate; recall vs brute force covered in tests).

    Tuning: collision probability per plane is 1 - theta/pi; for weakly
    similar corpora (top-k cosine ~0.3, like the synthetic fixture) fewer
    planes + more tables is the right trade — the 4x8 default hits ~0.67
    expected recall there, and much higher on genuinely clustered data.
    """
    def bucketed(df: DataFrame, ident: str, vec_alias: str) -> DataFrame:
        v = _with_vec(df, id_col, vec_col)
        parts = []
        for t in range(n_tables):
            parts.append(v.select(
                F.col("id").alias(ident),
                F.col("vec").alias(f"{vec_alias}_vec"),
                F.col("nrm").alias(f"{vec_alias}_nrm"),
                F.lit(t).alias("tbl"),
                _bucket_expr(F.col("vec"), dim, n_planes, t).alias("bucket")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    qb = bucketed(queries, "query_id", "q")
    cb = bucketed(embeddings, "neighbor_id", "c")
    candidates = (
        qb.join(cb, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    q = _with_vec(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_nrm"))
    c = _with_vec(embeddings, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("c_vec"),
        F.col("nrm").alias("c_nrm"))
    scored = (
        candidates.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
        .withColumn("cosine",
                    _dot(F.col("q_vec"), F.col("c_vec"))
                    / (F.col("q_nrm") * F.col("c_nrm")))
    )
    return _topk(scored, k)
