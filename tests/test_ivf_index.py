"""Persistent IVF index: write-time cell partitioning + partition-pruned
probes — the materialized form of ann_ivf's coarse quantization (the
100 TB serving path its docstring commits to)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _emb(spark):
    from nexus_spark.catalog import load_table

    return load_table(spark, SF_DIR, "embeddings")


def test_ivf_write_layout_and_centroids(spark, tmp_path):
    from nexus_spark.operators.similarity import ivf_write

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, n_centroids=8)

    cells = [e for e in os.listdir(path) if e.startswith("cell_id=")]
    assert 1 < len(cells) <= 8  # every dir is one coarse cell
    cents = spark.read.parquet(f"{path}/_centroids")
    assert cents.count() == 8
    # Corpus read skips the _-prefixed metadata dir and covers every vector
    assert spark.read.parquet(path).count() == emb.count()


def test_ivf_search_matches_in_memory_ann(spark, tmp_path):
    """Same centroids + nprobe => the written index returns ann_ivf's
    exact results (the index is a layout change, not a semantics change)."""
    from nexus_spark.operators.similarity import ann_ivf, ivf_search, ivf_write

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, n_centroids=32)

    got = {(r.query_id, r.neighbor_id, r.rank)
           for r in ivf_search(spark, path, queries, k=5, nprobe=2).collect()}
    want = {(r.query_id, r.neighbor_id, r.rank)
            for r in ann_ivf(emb, queries, k=5, n_centroids=32,
                             nprobe=2).collect()}
    assert got == want and len(want) > 0


def test_ivf_search_prunes_partitions(spark, tmp_path):
    """The probe scan must carry the cell_id partition filter — only the
    probed directories are read (the entire point of the layout)."""
    from nexus_spark.operators.similarity import ivf_search, ivf_write

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")
    ivf_write(emb, path, n_centroids=8)

    plan = (ivf_search(spark, path, queries, k=5, nprobe=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan and "cell_id" in plan
    # and the filter is non-trivial: the scan node mentions cell_id IN (...)
    scan_lines = [ln for ln in plan.splitlines()
                  if "PartitionFilters" in ln and "cell_id" in ln]
    assert any("cell_id" in ln and "[]" not in ln.split(
        "PartitionFilters:")[-1][:40] for ln in scan_lines)


def test_kmeans_refinement_improves_objective(spark):
    """Lloyd iterations must not decrease the spherical k-means objective
    (mean best-centroid cosine), and typically strictly improve it over
    the md5 sample."""
    from nexus_spark.operators.similarity import (_flat, _select_centroids,
                                                  ivf_objective,
                                                  kmeans_refine)

    corpus = _flat(_emb(spark), "vec_id", "embedding", 64, "c").cache()
    cents0 = _select_centroids(corpus, 16, 64)
    obj0 = ivf_objective(corpus, cents0, 64)
    cents2 = kmeans_refine(corpus, cents0, 64, iters=2)
    obj2 = ivf_objective(corpus, cents2, 64)
    assert cents2.count() == 16  # k preserved (empty cells keep old seed)
    assert obj2 >= obj0 - 1e-9
    corpus.unpersist()


def test_refined_index_still_searches(spark, tmp_path):
    from nexus_spark.operators.similarity import ivf_search, ivf_write

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf_refined")
    ivf_write(emb, path, n_centroids=16, refine_iters=2)
    out = ivf_search(spark, path, queries, k=5, nprobe=2).collect()
    assert len(out) == 25  # 5 queries x k
    assert all(r.rank <= 5 for r in out)


def test_ivf_q8_layout_and_recall(spark, tmp_path):
    """Quantized index: codes are tinyint arrays + one scale; probing it
    returns (nearly) the float index's neighbors — quantization at dim 64
    perturbs cosine by <1e-2, so top-5 overlap stays high."""
    from pyspark.sql.types import ArrayType, ByteType

    from nexus_spark.operators.similarity import (ivf_search, ivf_search_q8,
                                                  ivf_write, ivf_write_q8)

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    pq8 = str(tmp_path / "ivf_q8")
    pf = str(tmp_path / "ivf_f")
    ivf_write_q8(emb, pq8, n_centroids=32)
    ivf_write(emb, pf, n_centroids=32)

    schema = {f.name: f.dataType for f in spark.read.parquet(pq8).schema}
    assert isinstance(schema["codes"], ArrayType)
    assert isinstance(schema["codes"].elementType, ByteType)

    got = {(r.query_id, r.neighbor_id)
           for r in ivf_search_q8(spark, pq8, queries, k=5,
                                  nprobe=2).collect()}
    want = {(r.query_id, r.neighbor_id)
            for r in ivf_search(spark, pf, queries, k=5, nprobe=2).collect()}
    assert len(want) > 0
    assert len(got & want) / len(want) >= 0.9


def test_ivf_q8_prunes_partitions(spark, tmp_path):
    """The quantized layout must keep the partition-pruning property."""
    from nexus_spark.operators.similarity import ivf_search_q8, ivf_write_q8

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_q8")
    ivf_write_q8(emb, path, n_centroids=8)
    df = ivf_search_q8(spark, path, queries, k=3, nprobe=1)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan


def test_ivf_pq_layout_matches_in_memory_and_prunes(spark, tmp_path):
    """The persisted IVFPQ index returns exactly ann_ivf_pq's results
    (same deterministic cells, codebook and ADC scores), stores only
    m tinyint codes per row, and the probe scan partition-prunes."""
    from pyspark.sql import functions as F

    from nexus_spark.operators.similarity import (ann_ivf_pq,
                                                  ivf_search_pq,
                                                  ivf_write_pq)

    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    path = str(tmp_path / "ivfpq")
    ivf_write_pq(emb, path)

    got = ivf_search_pq(spark, path, queries, k=5)
    want = {(r["query_id"], r["neighbor_id"], r["rank"],
             round(r["cosine"], 9))
            for r in ann_ivf_pq(emb, queries, k=5).collect()}
    assert {(r["query_id"], r["neighbor_id"], r["rank"],
             round(r["cosine"], 9)) for r in got.collect()} == want

    # row payload is m tinyint codes
    stored = spark.read.parquet(path)
    row = stored.select("pq_codes").first()
    assert len(row["pq_codes"]) == 8
    assert all(0 <= c <= 15 for c in row["pq_codes"])

    # probe scan partition-prunes on cell_id
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines()
                  if "PartitionFilters" in ln and "cell_id" in ln]
    assert any("[]" not in ln.split("PartitionFilters:")[-1][:40]
               for ln in scan_lines)


def test_ivf_bin_layout_recall_and_pruning(spark, tmp_path):
    """Binary index: rows store only packed BIGINT sign words; probing +
    Hamming + float rerank recovers most of the float index's neighbors,
    and the scan keeps the partition-pruning property."""
    from pyspark.sql.types import LongType

    from nexus_spark.operators.similarity import (ivf_search, ivf_search_bin,
                                                  ivf_write, ivf_write_bin)

    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    pb = str(tmp_path / "ivf_bin")
    pf = str(tmp_path / "ivf_f")
    ivf_write_bin(emb, pb, n_centroids=8)
    ivf_write(emb, pf, n_centroids=8)

    schema = {f.name: f.dataType for f in spark.read.parquet(pb).schema}
    assert isinstance(schema["b0"], LongType)
    assert isinstance(schema["b1"], LongType)
    assert "codes" not in schema  # no floats, no byte codes — words only

    got = {(r.query_id, r.neighbor_id)
           for r in ivf_search_bin(spark, pb, queries, emb, k=5, nprobe=2,
                                   rerank_n=60).collect()}
    want = {(r.query_id, r.neighbor_id)
            for r in ivf_search(spark, pf, queries, k=5, nprobe=2).collect()}
    assert len(want) > 0
    # 1-bit codes inside probed cells + wide rerank: most neighbors match
    assert len(got & want) / len(want) >= 0.7

    df = ivf_search_bin(spark, pb, queries.where(F.col("vec_id") < 3), emb,
                        k=3, nprobe=1)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan


def test_pq_stream_encoder_matches_relational_encode(spark):
    """The streaming ingest's single-stage numpy encoder must be
    bit-exact with the relational bulk-build encode (same left-to-right
    accumulation, same (ss - 2*st) + tt association, same HALF_UP 6-dp
    tie-breaks) — e_stream_pq_ingest's drained store is oracle-compared
    against the relational trainer CTEs, so any divergence here is a
    driver red row."""
    from nexus_spark.operators.similarity import (_cell_scores, _flat,
                                                  _flat_cached,
                                                  _pq_assign,
                                                  _pq_subspaces,
                                                  _select_centroids,
                                                  pq_stream_encoder,
                                                  pq_train)

    emb = _emb(spark)
    codebook = pq_train(emb, m=8, ksub=16)
    corpus = _flat_cached(emb, "vec_id", "embedding", 64, "c")
    cents_df = _select_centroids(corpus, 8, 64)
    cent_rows = cents_df.collect()
    cents = spark.createDataFrame(cent_rows, cents_df.schema)

    flat = _flat(emb, "vec_id", "embedding", 64, "c")
    cell = (_cell_scores(flat, cents, 64, "c").groupBy("id")
            .agg(F.max_by(
                "cent_id",
                F.struct(F.round(F.col("c_cos"), 6).alias("s"),
                         (-F.col("cent_id")).alias("t"))).alias("cell_id")))
    codes = _pq_assign(_pq_subspaces(flat, 64, 8, "c"), codebook, 8)
    relational = set(map(tuple, (
        codes.join(cell, "id")
        .select(F.col("id").alias("vec_id"),
                F.col("cell_id").cast("long").alias("cell_id"),
                "sub", "code")).collect()))

    enc, schema = pq_stream_encoder(cent_rows, codebook.collect(), 64, 8)
    streamed = set(map(tuple, emb.mapInPandas(enc, schema).collect()))
    assert streamed == relational
