"""Graph analytics over edge lists the other operators emit (mutual
kNN graphs from similarity.knn_graph_ivf, duplicate-pair graphs from
dedup.ngram_jaccard_pairs).

The reference has no graph engine; these are the standard centrality /
structure passes a curation pipeline layers on top of its duplicate and
neighborhood graphs (rank documents inside a duplicate cluster, pick
canonical representatives, weight corpus samples by connectivity).

Scale design: every superstep is ONE map-side-combinable shuffle keyed
by destination node; per-node state is a single double, edges are
materialized once (localCheckpoint) and re-scanned per superstep. A
fixed superstep count keeps the whole run a single lazy plan —
no driver-side data, no data-dependent convergence loop.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Checkpointed-edge memo (bounded, session-keyed like similarity's
# _FLAT_CACHE): every graph pass materializes its edge frame ONCE via
# eager localCheckpoint — without the memo, each invocation checkpoints
# a NEW frame whose blocks linger until driver GC, and a long sweep
# accumulates enough orphaned checkpoint storage to evict live cache
# mid-query (observed as roving steady>first inversions on the graph
# family). The edge list is maintained neighborhood state, the same
# warm-state classification as the IVF cell table.
_EDGE_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _release(df: DataFrame) -> None:
    """Eagerly free a localCheckpoint's storage blocks (round-10
    ADVICE) — shared implementation in dedup._release_checkpoint."""
    from nexus_spark.operators.dedup import _release_checkpoint
    _release_checkpoint(df)


def _checkpointed(src: DataFrame, tag: str, build) -> DataFrame:
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    key = (_session_key(src.sparkSession), src.semanticHash(), tag)
    hit = _EDGE_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(src):
        return hit[1]
    got = build().localCheckpoint(eager=True)
    # frame_idx=None: capacity eviction / collision overwrite must only
    # drop the reference — a caller may still hold the returned
    # lineage-truncated frame (round-12 ADVICE; the shared policy lives
    # on dedup._bounded_put). clear_cache() below stays eager.
    _bounded_put(_EDGE_CACHE, key, (src, got), frame_idx=None)
    return got


def clear_cache() -> None:
    """Drop the memoized checkpointed edge frames AND eagerly unpersist
    their localCheckpoint blocks (round-10 ADVICE — reference-drop
    alone left reclamation to nondeterministic driver GC).
    domain.invalidate() calls this after every in-place lake rewrite so
    graph queries never reuse a pre-rewrite localCheckpoint-frozen edge
    list (the round-9 ADVICE staleness class)."""
    for _, frame in _EDGE_CACHE.values():
        _release(frame)
    _EDGE_CACHE.clear()


def pagerank(edges: DataFrame, iterations: int = 8,
             damping: float = 0.85,
             src_col: str = "id_a", dst_col: str = "id_b") -> DataFrame:
    """PageRank over an UNDIRECTED edge list (each edge walked both
    ways), mean-normalized: ranks are initialized to 1.0 and updated as
    ``r = (1-d) + d * sum(r_nbr / deg_nbr)``, so the mean rank stays
    1.0 and output magnitudes are scale-independent (no 1/N term — no
    driver-side count, and rounding keeps the same precision at any
    corpus size).

    Nodes are the distinct edge endpoints, so every node has degree
    >= 1 and there is no dangling mass to redistribute. The superstep
    count is fixed (deterministic plan; the oracle unrolls the same
    number of layers).

    Output: node BIGINT, rank DOUBLE.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # Both directions + out-degree, materialized ONCE: every superstep
    # re-scans this frame, and checkpointing (not exchange-reuse luck)
    # is what guarantees the upstream pair plan runs a single time.
    def _build_out() -> DataFrame:
        directed = edges.select(F.explode(F.array(
            F.struct(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")),
            F.struct(F.col(dst_col).alias("src"),
                     F.col(src_col).alias("dst")),
        )).alias("e")).select("e.*")
        deg = directed.groupBy("src").agg(F.count("*").alias("deg"))
        return directed.join(deg, "src")

    out = _checkpointed(edges, f"pr:{src_col}:{dst_col}", _build_out)

    # r0 = 1.0 for every node. Each superstep: contributions grouped by
    # destination (one shuffle, partial aggregation map-side), then the
    # damped update. In-degree >= 1 everywhere (undirected), so the
    # grouped frame already covers every node — no outer join needed.
    ranks = out.select(F.col("src").alias("node")).distinct() \
        .withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        ranks = (out.join(ranks.withColumnRenamed("node", "src"), "src")
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum(F.col("rank") / F.col("deg")).alias("c"))
                 .select("node",
                         (F.lit(1.0 - damping)
                          + F.lit(damping) * F.col("c")).alias("rank")))
    return ranks


def label_propagation(edges: DataFrame, seeds: DataFrame,
                      iterations: int = 4,
                      src_col: str = "id_a", dst_col: str = "id_b",
                      node_col: str = "node",
                      label_col: str = "label") -> DataFrame:
    """Semi-supervised label propagation over an UNDIRECTED edge list:
    seed labels stay CLAMPED; every round each node takes the majority
    label of its labeled neighbors (ties broken by smallest label),
    keeping its previous label when no neighbor is labeled yet. The
    pipeline use: spread scarce quality/domain labels through the
    near-duplicate / kNN neighborhood structure.

    Votes are integer counts and ties break on the label value, so
    every round is exactly reproducible across engines — no float
    ordering anywhere. Fixed synchronous rounds (layer i reads only
    layer i-1), same superstep shape as pagerank: one shuffle keyed by
    destination per round plus one argmax window, per-node state one
    label.

    Labels are monotone (a label never becomes NULL and seeds are
    clamped), so a node labeled at round i-1 is either a seed or has a
    labeled neighbor that stays labeled — its round-i vote is always
    non-NULL. The "keep previous label" fallback is therefore provably
    dead after COALESCE(seed, vote), and each round references the
    previous layer exactly ONCE (the vote join): the plan stays LINEAR
    in the round count instead of doubling per round.

    Output: node, label (NULL while unreachable from any seed),
    is_seed.
    """
    from pyspark.sql import Window

    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    directed = _checkpointed(
        edges, f"lpa:{src_col}:{dst_col}",
        lambda: edges.select(F.explode(F.array(
            F.struct(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")),
            F.struct(F.col(dst_col).alias("src"),
                     F.col(src_col).alias("dst")),
        )).alias("e")).select("e.*"))
    nodes = directed.select(F.col("src").alias("node")).distinct()
    seed = seeds.select(F.col(node_col).alias("node"),
                        F.col(label_col).alias("seed_label"))
    labels = (nodes.join(seed, "node", "left")
              .select("node", F.col("seed_label").alias("label")))
    w = Window.partitionBy("node").orderBy(F.col("c").desc(),
                                           F.col("label").asc())
    for _ in range(iterations):
        votes = (directed
                 .join(labels.withColumnRenamed("node", "src"), "src")
                 .where(F.col("label").isNotNull())
                 .groupBy(F.col("dst").alias("node"), "label")
                 .agg(F.count(F.lit(1)).alias("c")))
        best = (votes.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", F.col("label").alias("vote_label")))
        labels = (nodes.join(seed, "node", "left")
                  .join(best, "node", "left")
                  .select("node",
                          F.coalesce("seed_label", "vote_label")
                          .alias("label")))
    return labels.join(seed, "node", "left") \
        .select("node", "label",
                F.col("seed_label").isNotNull().alias("is_seed"))


def triangle_stats(edges: DataFrame,
                   src_col: str = "id_a",
                   dst_col: str = "id_b") -> DataFrame:
    """Per-node triangle count and local clustering coefficient over an
    UNDIRECTED edge list — the structure check a curation pipeline runs
    on its duplicate/kNN graphs: high clustering = tight near-duplicate
    communities (safe to keep one representative), low clustering on a
    high-degree node = a hub stitching unrelated docs together (an LSH
    false-positive magnet worth auditing before transitive dedup).

    Algorithm: degree-ordered edge orientation (the "compact-forward" /
    node-iterator++ scheme, Latapy TCS 2008; Schank & Wagner 2005).
    Every edge is oriented from its lower-(degree, id) endpoint to the
    higher one, wedges are enumerated only at each triangle's SMALLEST
    endpoint, and a wedge closes by an equi-join back to the oriented
    edge set. Wedge volume is sum(out_deg^2) with out-degrees bounded
    by graph arboricity — on a k-NN graph out-degree <= k, so the
    wedge stage is O(n * k^2) rows, NOT the O(n * deg_max^2) a naive
    per-node enumeration pays on hub nodes. Three shuffles total
    (degree agg, wedge self-join, closing equi-join); counts are exact
    integers, so the replay is engine-independent.

    Output: node, degree, triangles, clustering
    (= 2*T / (deg*(deg-1)), 0.0 when degree < 2).
    """
    # Materialize the normalized edge set FIRST (the label_propagation
    # policy): deg and the orientation join below both re-consume it,
    # and without the checkpoint each consumer re-evaluates the whole
    # upstream pair plan (for a kNN-graph input, the 64-column scoring
    # subtree — measured ~2x the query's steady cost at sf0.1).
    e = _checkpointed(
        edges, f"tri:{src_col}:{dst_col}",
        lambda: edges.select(F.least(src_col, dst_col).alias("a"),
                             F.greatest(src_col, dst_col).alias("b"))
        .where(F.col("a") != F.col("b")).distinct())
    dirs = e.select(F.explode(F.array(
        F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
        F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
    )).alias("d")).select("d.*")
    deg = dirs.groupBy(F.col("src").alias("node")) \
        .agg(F.count("*").alias("degree"))
    # Orient each edge toward the higher (degree, id) endpoint; the
    # oriented set is materialized once and re-scanned by both the
    # wedge and the closing stage.
    ranked = (dirs
              .join(deg.withColumnRenamed("node", "src")
                    .withColumnRenamed("degree", "sd"), "src")
              .join(deg.withColumnRenamed("node", "dst")
                    .withColumnRenamed("degree", "dd"), "dst"))
    oriented = _checkpointed(e, "tri:oriented", lambda: ranked.where(
        (F.col("sd") < F.col("dd"))
        | ((F.col("sd") == F.col("dd")) & (F.col("src") < F.col("dst"))))
        .select("src", "dst",
                F.struct(F.col("dd").alias("d"),
                         F.col("dst").alias("n")).alias("dst_key")))
    # Wedges at the smallest endpoint u: (u->v, u->w); ordering the two
    # out-neighbors by the same (degree, id) total order — carried on
    # the oriented edge as dst_key, so no re-join against deg — counts
    # each wedge exactly once.
    lo = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                         F.col("dst_key").alias("kv"))
    hi = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                         F.col("dst_key").alias("kw"))
    wedges = (lo.join(hi, "u")
              .where(F.col("kv") < F.col("kw"))
              .select("u", "v", "w"))
    tri = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"])
    per_node = (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
                .groupBy("node").agg(F.count("*").alias("triangles")))
    return (deg.join(per_node, "node", "left")
            .select("node", "degree",
                    F.coalesce("triangles", F.lit(0)).alias("triangles"))
            .withColumn(
                "clustering",
                F.when(F.col("degree") >= 2,
                       2.0 * F.col("triangles")
                       / (F.col("degree")
                          * (F.col("degree") - F.lit(1.0))))
                .otherwise(F.lit(0.0))))
