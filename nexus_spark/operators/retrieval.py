"""Lexical and hybrid retrieval over a document corpus: BM25 scoring,
top-k search, and reciprocal-rank fusion with the vector-search path.

The reference engine has no text-retrieval surface; this implements the
standard public formulations — Okapi BM25 (Robertson & Sparck Jones, with
the Lucene ``ln(1 + ...)`` idf floor so scores stay positive on small
corpora) and reciprocal-rank fusion (Cormack, Clarke & Buettcher,
SIGIR'09) — as Catalyst-friendly relational plans. Together with
similarity.knn_bruteforce/ann_ivf they form the retrieval half of a RAG
data pipeline: lexical recall + semantic recall, fused rank.

Scale shape (the part that must survive 100 TB):

- the exploded token stream is filtered to the query terms IN THE SCAN
  STAGE (a handful of terms), so the per-(doc, term) tf aggregate shuffles
  only matching tokens — corpus-size-proportional work happens in one
  narrow projection;
- document lengths are one shuffle-free projection; corpus-level stats
  (N, avgdl) reduce to a single broadcast scalar row;
- the term document-frequency table is at most |query_terms| rows and
  broadcasts; the only O(corpus) shuffle is the final per-doc score
  aggregate, map-side combined on the doc key;
- RRF fusion joins two ALREADY top-k rank lists (k rows each) — a
  broadcastable full-outer join, independent of corpus size.

Determinism contract (oracle hash-match): ranks order by the 6-decimal
ROUNDED score with an id tie-break, the same discipline as
similarity._topk; BM25 per-term scores are exact given exact tf/df/dl
inputs, and the per-doc sum spans <= |query_terms| doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Okapi defaults (Robertson et al.; the Lucene defaults).
K1 = 1.2
B = 0.75
RRF_K = 60  # the SIGIR'09 constant


# Session-memoized BM25 inverted index: the (doc, term, dl, tf) postings
# table plus the 1-row corpus stats — the state a lexical-search
# deployment maintains at WRITE time (Lucene's segments), so a steady
# query reads postings instead of re-tokenizing the corpus. Mirrors the
# shingle-postings memo in operators.dedup and the flat/IVF index memos
# in operators.similarity; same bounded-eviction discipline.
_BM25_IDX_CACHE: dict[tuple, tuple] = {}


def bm25_index_cached(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> tuple[DataFrame,
                                                       DataFrame]:
    """(postings, stats): postings = one row per (doc, term) with the
    doc length riding along (tf aggregate is write-time work here);
    stats = one row (n_docs, sum_dl). Both storage-cached per
    (session, corpus). At 100 TB the postings table is the write-time
    index layout, partitioned by term so a query prunes to its terms'
    partitions; in-session the cache is the analog."""
    from nexus_spark.functions.skew import ensure_parallelism
    from nexus_spark.operators.dedup import _bounded_put, _session_key

    # A stream cannot be .cache()d (analysis-time error) and an
    # inverted index over an unbounded corpus is not meaningful batch
    # state — mirror the text_stats guard and build the plan uncached.
    if docs.isStreaming:
        key = None
    else:
        key = (_session_key(docs.sparkSession), docs.semanticHash(),
               id_col, text_col)
        hit = _BM25_IDX_CACHE.get(key)
        if hit is not None and hit[0].sameSemantics(docs):
            return hit[1], hit[2]
    src = ensure_parallelism(docs)
    words = src.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"))
    postings = (words.groupBy(id_col, "word", "dl")
                .agg(F.count(F.lit(1)).alias("tf")))
    stats = (src.select(
        F.size(F.split(F.col(text_col), " ")).alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("dl").alias("sum_dl")))
    if key is None:
        return postings, stats
    postings, stats = postings.cache(), stats.cache()
    # frame_idx=1 unpersists the postings frame on eviction; the 1-row
    # stats frame is too small to matter.
    _bounded_put(_BM25_IDX_CACHE, key, (docs, postings, stats), cap=4,
                 frame_idx=1)
    return postings, stats


def clear_cache() -> None:
    """Unpersist and drop the memoized BM25 index frames.
    domain.invalidate() calls this after every in-place lake rewrite so
    postings never serve pre-rewrite documents (round-9 ADVICE)."""
    for _, postings, stats in _BM25_IDX_CACHE.values():
        for frame in (postings, stats):
            try:
                frame.unpersist()
            except Exception:
                pass
    _BM25_IDX_CACHE.clear()


def bm25_scores(docs: DataFrame, query_terms: tuple[str, ...],
                k1: float = K1, b: float = B,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    score(d) = sum over DISTINCT query terms t present in d of
      qtf(t) * idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)), where qtf(t) is the
    term's multiplicity in the query — true bag-of-terms semantics
    (a repeated query term weights its contribution, it is not
    silently collapsed).

    Output: doc_id, n_terms_hit (distinct matching terms), bm25.
    Documents matching no term are absent (standard inverted-index
    semantics).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if any(not str(t) for t in query_terms):
        raise ValueError("query terms must be non-empty strings")
    qtf: dict[str, int] = {}
    for t in query_terms:
        qtf[str(t)] = qtf.get(str(t), 0) + 1
    terms = sorted(qtf)

    # Serve from the session BM25 index (round 9): the postings table
    # already carries (doc, term, dl, tf), so a steady query filters it
    # to the query terms — no corpus re-tokenization, no token-stream
    # shuffle. tf rows are unique per (doc, term), so COUNT(*) per term
    # over the filtered postings = df, exactly as before; the scores are
    # bit-identical (same tf/dl/df/N inputs, same expression).
    postings, stats = bm25_index_cached(docs, id_col, text_col)
    tf = postings.where(F.col("word").isin(terms))
    df_tbl = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    denom = (F.col("tf")
             + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    term_score = idf * (F.col("tf") * (k1 + 1.0)) / denom
    if any(c > 1 for c in qtf.values()):
        # query-term multiplicity as a literal CASE weight
        wexpr = None
        for t in terms:
            cond = F.col("word") == t
            wexpr = (F.when(cond, float(qtf[t])) if wexpr is None
                     else wexpr.when(cond, float(qtf[t])))
        term_score = term_score * wexpr.otherwise(1.0)

    scored = (tf.join(F.broadcast(df_tbl), "word")
              .crossJoin(F.broadcast(stats))
              .select(F.col(id_col), term_score.alias("s")))
    return (scored.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_terms_hit"),
                 F.sum("s").alias("bm25")))


def bm25_topk(docs: DataFrame, query_terms: tuple[str, ...], k: int = 10,
              k1: float = K1, b: float = B, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25. Deterministic tie-break on (rounded score
    desc, doc id asc) — the same contract as similarity._topk.

    The selection is ORDER BY ... LIMIT k, which Catalyst plans as
    TakeOrderedAndProject: per-partition top-k heaps reduced at the
    driver, NO single-partition sort of the corpus-sized score table. The
    rank column is then a window over the k-row result only — a bounded
    constant-size frame at any corpus scale.

    Output: doc_id, n_terms_hit, bm25, lex_rank.
    """
    order = (F.round(F.col("bm25"), 6).desc(), F.col(id_col).asc())
    picked = (bm25_scores(docs, query_terms, k1, b, id_col, text_col)
              .orderBy(*order).limit(int(k)))
    return picked.withColumn("lex_rank",
                             F.row_number().over(Window.orderBy(*order)))


def hybrid_rrf(docs: DataFrame, embeddings: DataFrame,
               query_terms: tuple[str, ...], query_vec_id: int,
               k: int = 10, depth: int = 50, rrf_k: int = RRF_K,
               doc_id_col: str = "doc_id", vec_id_col: str = "vec_id",
               vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Hybrid lexical+vector retrieval fused by reciprocal-rank fusion.

    Runs BM25 top-`depth` over the documents and exact cosine top-`depth`
    around the `query_vec_id` embedding (the fixture contract pairs
    doc_id==vec_id), then fuses:

      rrf(d) = sum over lists containing d of 1 / (rrf_k + rank_list(d))

    — rank-based fusion needs no score normalization across the two
    incomparable scales (BM25 vs cosine), which is exactly why RRF is the
    production default. Both input lists are k-row tables, so the
    full-outer fusion join broadcasts regardless of corpus size.

    Output: doc_id, lex_rank, vec_rank (NULL when absent from that list),
    rrf_score, fused_rank.

    Self-exclusion caveat: the vector branch reuses knn_bruteforce, whose
    dedup-oriented contract excludes query_id == neighbor_id. Under the
    doc_id==vec_id fixture pairing this means the query DOCUMENT itself can
    never receive a vec_rank — it fuses from the lexical list alone (its
    RRF score carries only the 1/(k+lex_rank) term). This is intentional
    and matched by the oracle: "retrieve documents LIKE this one" semantics
    exclude the probe; callers wanting the probe ranked should pass a
    query_vec_id outside the corpus id space.
    """
    from nexus_spark.operators.similarity import knn_bruteforce

    lex = bm25_topk(docs, query_terms, k=depth, id_col=doc_id_col)
    qv = embeddings.where(F.col(vec_id_col) == query_vec_id)
    vec = (knn_bruteforce(embeddings, qv, k=depth, id_col=vec_id_col,
                          vec_col=vec_col, dim=dim)
           .select(F.col("neighbor_id").alias(doc_id_col),
                   F.col("rank").alias("vec_rank")))
    fused = (lex.select(doc_id_col, "lex_rank")
             .join(vec, doc_id_col, "full_outer"))
    # 1/(c+r) terms are exact doubles of well-separated magnitudes; the
    # two-term sum is order-free (binary fp addition is commutative).
    contrib = (
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)))
    # Unpartitioned window over the fused list only: <= 2*depth rows by
    # construction (full-outer of two k-row lists), bounded at any scale.
    w = Window.orderBy(F.round(contrib, 9).desc(), F.col(doc_id_col).asc())
    return (fused.withColumn("rrf_score", contrib)
            .withColumn("fused_rank", F.row_number().over(w))
            .where(F.col("fused_rank") <= k)
            .select(doc_id_col, "lex_rank", "vec_rank", "rrf_score",
                    "fused_rank"))
