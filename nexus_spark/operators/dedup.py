"""Document deduplication operators — first-class training-data-pipeline
components (not present in the reference; designed 100 TB-first).

Four families, all expressed as DataFrame plans with no driver-side loops:

- exact:        md5 fingerprint groupBy (one shuffle on the hash)
- ngram-jaccard: inverted-index self-join on shingles (no O(n^2) cross join:
                 candidate pairs only where shingles co-occur)
- minhash-LSH:  k xxhash64 seeds -> signature; banded signature -> bucket
                 equi-join; jaccard verify on candidates only
- simhash:      per-bit majority of word hashes -> 64-bit fingerprint;
                 near-dup via banded equality (hamming<=k verify)

Scale notes: every join here is an equi-join on a hash-derived key, so AQE
can size/skew-handle it; stop-shingle skew (a shingle shared by >cap docs)
is capped like a stop-word list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# words -> overlapping 3-gram shingles (guard: <3 words -> single shingle of
# the whole text so short docs still participate)
_SHINGLES_EXPR = """
CASE WHEN size(words) >= 3 THEN
  array_distinct(transform(sequence(1, size(words) - 2),
                 i -> concat_ws(' ', slice(words, i, 3))))
ELSE array(concat_ws(' ', words)) END
"""


# Faster explode-path shingle expression (element_at instead of slice;
# duplicates kept — dedup relationally where distinctness matters).
_SHINGLE_ELEMENTS_EXPR = """
CASE WHEN size(words) >= 3 THEN
  transform(sequence(1, size(words) - 2),
    i -> concat(element_at(words, i), ' ', element_at(words, i + 1),
                ' ', element_at(words, i + 2)))
ELSE array(concat_ws(' ', words)) END
"""


def with_words(docs: DataFrame, text_col: str = "text") -> DataFrame:
    from nexus_spark.functions.skew import ensure_parallelism

    # Spread a single-split input before the word/shingle fan-out (no-op
    # on any multi-split corpus — see ensure_parallelism).
    return ensure_parallelism(docs).withColumn(
        "words", F.split(F.col(text_col), " "))


def with_shingles(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return with_words(docs, text_col).withColumn(
        "shingles", F.expr(_SHINGLES_EXPR))


def shingle_postings(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     with_string: bool = False) -> DataFrame:
    """Exploded shingle postings (id, h [, shingle]) — duplicates included
    (min-hash does not care; distinct consumers dedup relationally)."""
    from nexus_spark.functions.skew import ensure_parallelism

    words = ensure_parallelism(docs).select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("words"))
    out = words.select("id",
                       F.explode(F.expr(_SHINGLE_ELEMENTS_EXPR)).alias("shingle"))
    out = out.select("id", F.xxhash64("shingle").alias("h"),
                     *(["shingle"] if with_string else []))
    return out


# Memo of cached postings frames per (session, input plan, cols): repeated
# dedup calls in a long-lived session reuse ONE materialization instead of
# stacking a new storage block per invocation (mirror of
# similarity._FLAT_CACHE; dropped by clear_cache() / domain.invalidate()).
# Entries store (source_df, result) so a semanticHash collision is caught
# by sameSemantics instead of returning another corpus's index.
_POSTINGS_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _release_checkpoint(df) -> None:
    """Eagerly free a localCheckpoint's storage blocks (round-10
    ADVICE, generalized in round 11): dropping the Python reference
    alone leaves the blocks to py4j finalizers + ContextCleaner GC, so
    loops and long sessions accumulate orphaned checkpoint storage
    until a driver GC happens. The checkpointed frame's analyzed plan
    is a LogicalRDD whose `rdd` field IS the persisted internal RDD —
    unpersist it directly. Best-effort: the plan shape is a JVM
    implementation detail, and a miss only restores the old lazy-GC
    reclamation. The frame is unusable afterwards (truncated lineage);
    callers drop every reference in the same breath."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _bounded_put(cache: dict, key, value, cap: int = 6,
                 frame_idx: int | None = 1, release=None) -> None:
    """Insert into an insertion-ordered memo and evict the OLDEST entries
    beyond `cap`, releasing the evicted (and overwritten) frame — tuple
    position `frame_idx`; None = nothing released, just drop the
    reference (lazy py4j-finalizer + ContextCleaner reclamation).
    `release` overrides the default `.unpersist()` for frames persisted
    some other way.

    Release policy (round-12 ADVICE): eager release on eviction is only
    safe for `.cache()` frames — a caller still holding one re-executes
    from lineage, merely slower. localCheckpoint frames have TRUNCATED
    lineage, so eagerly destroying their blocks on a capacity eviction
    or semanticHash-collision overwrite makes a previously RETURNED
    frame fail irrecoverably with missing-block errors. Checkpoint-
    backed memos therefore pass frame_idx=None here (reference-drop on
    eviction) and reserve _release_checkpoint for the explicit clear
    paths (clear_cache/domain.invalidate/bench resets) and for
    loop-internal supersession of frames never handed out. The cost
    (r12 ADVICE): evicted localCheckpoint blocks are reclaimed only by
    driver GC + ContextCleaner, so a session cycling MANY distinct
    inputs can re-accumulate orphaned checkpoint storage in the
    GC-timed window. If that pressure class reappears in a sweep,
    the remedies are ref-counting returned frames or shrinking the
    checkpoint-memo caps — not restoring eager eviction-release.

    Why bounded: a long-lived session (or a 124-query sweep) otherwise
    accumulates one storage-cached frame per distinct input plan, and
    the unified memory manager answers the pressure by evicting cache
    blocks mid-query — which is how round 5's two steady-state
    inversions happened. A handful of live corpora per cache is the
    working set; anything older is cheaper to rebuild than to squat on
    executor storage."""
    def _free(entry) -> None:
        if frame_idx is None:
            return
        try:
            (release or (lambda f: f.unpersist()))(entry[frame_idx])
        except Exception:
            pass

    old = cache.get(key)
    if old is not None:  # semanticHash-collision overwrite
        _free(old)
    cache[key] = value
    while len(cache) > cap:
        _free(cache.pop(next(iter(cache))))  # dicts are insertion-ordered


def distinct_postings(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Distinct (id, shingle-hash) postings with per-doc distinct-shingle
    counts — the shared inverted index for jaccard computations. Cached and
    memoized per (session, plan): consumed by both sides of self-joins and
    by repeated minhash/ngram invocations."""
    key = (_session_key(docs.sparkSession), docs.semanticHash(), id_col,
           text_col)
    hit = _POSTINGS_CACHE.get(key)
    if hit is not None and hit[0].sameSemantics(docs):
        return hit[1]
    got = (shingle_postings(docs, id_col, text_col).distinct()
           .withColumn("n_shingles",
                       F.count(F.lit(1)).over(Window.partitionBy("id"))))
    got = got.cache()
    # Materialize the index NOW (round 14, guide §1.2/§3.1): every
    # consumer scans it fully anyway (the build cost stays inside the
    # first caller), and the materialized InMemoryRelation carries REAL
    # size stats, so Catalyst's broadcast-vs-sort-merge guard on the
    # pair self-joins decides from actual bytes. Left lazy, the COLD
    # logical estimate undersized the sf1 index (2.65M rows / 60.6 MiB)
    # and broadcast it on the first call — a 192 MiB relation build and
    # a 12.4 GiB aggregate spill in one unpartitioned stage, and a plan
    # that cannot survive fact scale (8 GB broadcast cap). count() is
    # the cheapest full materialization (no row leaves the executors).
    got.count()
    _bounded_put(_POSTINGS_CACHE, key, (docs, got))
    return got


def clear_cache() -> None:
    """Unpersist and drop every memoized postings frame, plus the CC
    result and edge memos (their localCheckpoint blocks are released
    eagerly via the stored frame handles — round-11; the old
    reference-drop left them to driver GC)."""
    for _, frame in _POSTINGS_CACHE.values():
        try:
            frame.unpersist()
        except Exception:
            pass
    _POSTINGS_CACHE.clear()
    clear_cc_result_cache()
    for entry in _CC_EDGE_CACHE.values():
        _release_checkpoint(entry[1])
    _CC_EDGE_CACHE.clear()


def clear_cc_result_cache() -> None:
    """Release + drop ONLY the memoized component labelings. The bench
    sweep calls this before every timed query (the CC result is a
    QUERY-RESULT cache, not ingest state — each consumer must pay its
    own convergence like the oracle's recursive CTE); eager release
    keeps a 164-query sweep from accumulating one orphaned label
    checkpoint per timed row."""
    for entry in _CC_CACHE.values():
        _release_checkpoint(entry[3])
    _CC_CACHE.clear()


def jaccard_verify(candidates: DataFrame, postings: DataFrame,
                   threshold: float) -> DataFrame:
    """Exact jaccard for candidate (id_a, id_b) pairs via the shared
    postings index — only candidate pairs are scored."""
    a = postings.select(F.col("h"), F.col("id").alias("id_a"),
                        F.col("n_shingles").alias("n_a"))
    b = postings.select(F.col("h"), F.col("id").alias("id_b"),
                        F.col("n_shingles").alias("n_b"))
    return (
        candidates.join(a, "id_a").join(b, ["id_b", "h"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn("jaccard",
                    F.col("common")
                    / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup via md5(text): per content hash, the surviving (min) id
    and the duplicate count. Output: content_hash, keep_id, dup_cnt."""
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("dup_cnt"))
    )


def write_fingerprints(docs: DataFrame, store_path: str,
                       id_col: str = "doc_id", text_col: str = "text",
                       mode: str = "append") -> None:
    """Append a batch's content fingerprints (normalized-text md5 +
    surviving doc id) to the persistent fingerprint store — the state an
    ingest pipeline maintains so each NEW shard dedups against ALL
    history without rescanning it."""
    from nexus_spark.operators.text import fingerprint

    (docs.select(fingerprint(F.col(text_col)).alias("fingerprint"),
                 F.col(id_col).alias("first_doc_id"))
     .groupBy("fingerprint")
     .agg(F.min("first_doc_id").alias("first_doc_id"))
     .write.mode(mode).parquet(store_path))


def incremental_dedup(new_docs: DataFrame, spark, store_path: str,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Production ingest-dedup loop step: drop new documents whose
    content fingerprint already exists in the store (or is duplicated
    WITHIN the batch — lowest id survives), returning the fresh
    survivors. Call write_fingerprints on the result to commit the
    batch's fingerprints.

    Scale: the store is read as a plain parquet scan and anti-joined on
    the 32-hex fingerprint — one shuffle of (batch + store-touched)
    rows. At 100 TB maintain the store BUCKETED by fingerprint
    (sources.lake bucketed tables) and bucket the batch the same way:
    the anti-join then plans with zero Exchange on the store side.

    Idempotent under replay: re-running a committed batch drops
    everything (its fingerprints are already stored).
    """
    import os

    from nexus_spark.operators.text import fingerprint

    fp = new_docs.withColumn("fingerprint",
                             fingerprint(F.col(text_col)))
    # within-batch survivors (lowest id per fingerprint)
    keep = (fp.groupBy("fingerprint")
            .agg(F.min(id_col).alias(id_col)))
    batch = fp.join(keep, ["fingerprint", id_col])
    if os.path.exists(store_path):
        store = spark.read.parquet(store_path).select("fingerprint")
        batch = batch.join(store, "fingerprint", "left_anti")
    return batch.drop("fingerprint")


def write_minhash_index(docs: DataFrame, store_path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 32, hash_fn: str = "xxhash64",
                        mode: str = "append") -> None:
    """Append a batch's MinHash signatures to the persistent signature
    store — the near-dup analog of write_fingerprints: the state an
    ingest pipeline maintains so each NEW shard can be checked for
    near-duplicates against ALL history without re-shingling it.
    Signatures are tiny (k numbers per doc) and banding is derived at
    read time, so the store layout is hash-parameter-stable."""
    (minhash_signatures(docs, id_col, text_col, k, hash_fn=hash_fn)
     .write.mode(mode).parquet(store_path))


def incremental_near_dup(new_docs: DataFrame, spark, store_path: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         k: int = 32, bands: int = 8,
                         threshold: float = 0.5,
                         hash_fn: str = "xxhash64",
                         signatures: DataFrame | None = None) -> DataFrame:
    """Production ingest near-dup step: LSH-match the new batch's
    documents against the persistent signature store (all history) AND
    within the batch itself, without touching historical text.

    History's text is gone — only its signatures remain — so candidate
    verification uses the SIGNATURE-estimated Jaccard (matching
    components / k, the unbiased MinHash estimator) instead of exact
    shingle Jaccard; `threshold` applies to that estimate. Banded
    equi-join only, never a cross join: new-batch bands join the union
    of store bands and own bands on (band_idx, band_hash).

    Output: id_new, id_matched, est_jaccard, match_source
    ('store' | 'batch'); id_new < id_matched for within-batch pairs.
    Call write_minhash_index on the batch afterwards to commit it.

    signatures: optionally pass the batch's PRE-MATERIALIZED signature
    frame (minhash_signatures output, e.g. localCheckpointed inside a
    foreachBatch step) — the signature subtree otherwise re-executes
    for each of its ~5 consumers (bands x 2, estimator joins x 2, and
    the caller's store commit).
    """
    import os

    rows_per_band = k // bands
    new_sigs = (signatures if signatures is not None
                else minhash_signatures(new_docs, id_col, text_col, k,
                                        hash_fn=hash_fn))
    store_sigs = (spark.read.parquet(store_path)
                  if os.path.exists(store_path) else None)

    def band(sigs: DataFrame) -> DataFrame:
        return (sigs.withColumn("band_idx", F.explode(
            F.sequence(F.lit(0), F.lit(bands - 1))))
            .withColumn("band_hash", F.md5(F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("signature"),
                            F.col("band_idx") * rows_per_band + 1,
                            rows_per_band),
                    lambda x: x.cast("string")))))
            .select("id", "band_idx", "band_hash"))

    nb = band(new_sigs)

    def matches(other_bands: DataFrame, other_sigs: DataFrame,
                source: str, within_batch: bool) -> DataFrame:
        # Build-side control (round 13, tightened round 14): the batch
        # is BOUNDED by the ingest contract; the store (history) is
        # not. Every join that touches a store-derived frame must build
        # its hash table on the batch-derived side — left to size
        # estimates, Catalyst was observed broadcasting the store
        # parquet (it has stats; the batch localCheckpoint does not),
        # making per-batch cost O(history) and the whole drain
        # O(history x batches). Only frames O(batch) BY CONSTRUCTION
        # (the batch bands, the batch signatures) are broadcast; the
        # candidate frame, whose size depends on how much history the
        # batch matches, is never broadcast (round-13 ADVICE) — its
        # store-side join shuffles with the build pinned to it.
        nb_l = nb.select("band_idx", "band_hash",
                         F.col("id").alias("id_new"))
        ob = other_bands.select("band_idx", "band_hash",
                                F.col("id").alias("id_matched"))
        pair_filter = (F.col("id_new") < F.col("id_matched")
                       if within_batch
                       else F.col("id_new") != F.col("id_matched"))
        cand = ((ob.join(F.broadcast(nb_l), ["band_idx", "band_hash"])
                 if not within_batch
                 else nb_l.join(ob, ["band_idx", "band_hash"]))
                .where(pair_filter)
                .select("id_new", "id_matched").distinct())
        est = F.aggregate(
            F.zip_with("sig_a", "sig_b",
                       lambda a, b: (a == b).cast("int")),
            F.lit(0), lambda acc, x: acc + x) / F.lit(float(k))
        # Attaching the batch signatures to the candidates broadcasts
        # new_sigs — O(batch) by the ingest contract, always safe. The
        # candidate frame itself is NOT batch-bounded (round-13 ADVICE:
        # its size is O(batch bands x store matches), so a dup-heavy
        # history grows it with store size — broadcasting it trades a
        # completed shuffled plan for a driver/executor OOM exactly on
        # the workload dedup targets). The store-side estimator join
        # therefore SHUFFLES with the hash table pinned on the
        # batch-derived side: the store pays a linear per-batch
        # exchange instead of becoming a per-partition build, and no
        # relation anywhere is built from store-derived rows.
        withsig = cand.join(
            F.broadcast(new_sigs.select(
                F.col("id").alias("id_new"),
                F.col("signature").alias("sig_a")))
            if not within_batch
            else new_sigs.select(F.col("id").alias("id_new"),
                                 F.col("signature").alias("sig_a")),
            "id_new")
        osig = other_sigs.select(F.col("id").alias("id_matched"),
                                 F.col("signature").alias("sig_b"))
        paired = (withsig.hint("shuffle_hash").join(osig, "id_matched")
                  if not within_batch
                  else withsig.join(osig, "id_matched"))
        return (paired
                .withColumn("est_jaccard", est)
                .where(F.col("est_jaccard") >= threshold)
                .select("id_new", "id_matched", "est_jaccard",
                        F.lit(source).alias("match_source")))

    out = matches(nb, new_sigs, "batch", within_batch=True)
    if store_sigs is not None:
        out = out.unionByName(
            matches(band(store_sigs), store_sigs, "store",
                    within_batch=False))
    return out


def ngram_jaccard_pairs(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.8,
                        max_shingle_freq: int | None = None) -> DataFrame:
    """Near-dup candidate pairs with word-3-gram Jaccard >= threshold.

    Inverted-index plan: explode shingles, self-join on the shingle to count
    common shingles per (a, b), then |A∩B| / (|A| + |B| - |A∩B|). Only pairs
    sharing >= 1 shingle are ever materialized. The join key is
    xxhash64(shingle) — an 8-byte shuffle key instead of the shingle string
    (collision odds are ~|shingles|^2 / 2^64, irrelevant to dedup).

    max_shingle_freq: if set, shingles occurring in more docs are dropped
    (stop-shingle skew cap — bounds the self-join fan-out at corpus scale;
    costs two extra shuffles, so it is opt-in).

    Output: id_a, id_b (a < b), jaccard.
    """
    # Index build: element_at-based shingle expression + RELATIONAL dedup
    # (distinct_postings) instead of per-doc array_distinct — array
    # slicing/dedup in higher-order functions is the hot spot (measured
    # ~35% slower than this form at 1.3M shingles). Cached: both self-join
    # branches consume it.
    sh = distinct_postings(docs, id_col, text_col)
    if max_shingle_freq is not None:
        freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_shingle_freq), "h")

    # Pair stage (round 14, guide §1/§3.1/§5). The join strategy is
    # Catalyst's own size-guarded choice over the MATERIALIZED postings
    # stats (distinct_postings materializes its memo eagerly, see
    # there): broadcast while the index fits autoBroadcastJoinThreshold
    # (sf0.1: 6-8 MiB — the fast local plan, steady 0.45s vs 0.98s
    # forced-SMJ), sort-merge above it (sf1: 60.6 MiB). Pinning either
    # strategy was MEASURED worse on one end: forced SMJ doubles the
    # sf0.1 steady; forced SHJ lost ~20% to SMJ at the sf1 pair volume
    # (scattered match-chain probes vs contiguous sorted runs); and the
    # pre-fix COLD estimate undersized the un-materialized cache and
    # broadcast 2.65M rows / 192 MiB on the sf1 first call — a single
    # unpartitioned stage whose pair aggregate (138.4M join rows)
    # spilled 12.4 GiB, a plan that dies outright at fact scale (8 GB
    # relation cap). The aggregation keys are the PAIR ONLY (guide
    # §2.3 — narrower hash state: the doc-level shingle counts are
    # functionally dependent on the ids, so they ride as first()
    # buffers instead of widening every key from 2 longs to 4).
    a = sh.select(F.col("h"), F.col("id").alias("id_a"),
                  F.col("n_shingles").alias("n_a"))
    b = sh.select(F.col("h"), F.col("id").alias("id_b"),
                  F.col("n_shingles").alias("n_b"))
    # (Also MEASURED and rejected: an explicit pair-key repartition
    # between join and aggregate to skip the near-useless partial
    # aggregate — it collapses only 5.4% at sf1, 138.4M -> 130.9M rows,
    # for 15.6 GiB of spill — but shuffling the RAW pair stream cost
    # the same or more: sf1 steady 16.1-19.9s vs 14.7-16.3s kept form.)
    pairs = (
        a.join(b, "h")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"),
             F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"))
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return pairs


def minhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 32,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of a seeded
    hash of the shingle. JVM-side only.

    hash_fn:
    - 'xxhash64' (default): 64-bit ints — the fast path.
    - 'md5': seeded md5 hex strings compared lexicographically. MinHash
      only needs a uniform hash with a total order, and hex strings give
      one that DuckDB reproduces exactly → the md5 variant is fully
      oracle-checkable.
    """
    # min() ignores duplicate shingles, so the raw (undeduplicated)
    # postings stream feeds the aggregation directly — no distinct pass.
    if hash_fn == "xxhash64":
        # seeded re-hash of the 64-bit shingle hash: equally uniform, and
        # the string never needs to leave the scan projection. When the
        # session already holds the memoized distinct-postings index,
        # consume IT instead of re-shingling — min over the distinct set
        # is identical, and the banding + verify stages of an LSH call
        # then share one cached scan.
        key = (_session_key(docs.sparkSession), docs.semanticHash(),
               id_col, text_col)
        hit = _POSTINGS_CACHE.get(key)
        if hit is not None and hit[0].sameSemantics(docs):
            post = hit[1]
        else:
            post = shingle_postings(docs, id_col, text_col,
                                    with_string=False)
        sig_cols = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"h{i}")
                    for i in range(k)]
    elif hash_fn == "md5":
        # oracle-reproducible path needs the literal shingle string
        post = shingle_postings(docs, id_col, text_col, with_string=True)
        sig_cols = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))))
            .alias(f"h{i}") for i in range(k)]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return (
        post.groupBy("id")
        .agg(*sig_cols)
        .select("id", F.array(*[f"h{i}" for i in range(k)]).alias("signature"))
    )


def minhash_lsh_candidates(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k: int = 32,
                           bands: int = 8,
                           hash_fn: str = "xxhash64") -> DataFrame:
    """UNVERIFIED MinHash+LSH candidate pairs: band the k-row signature
    into `bands` buckets and equi-join on (band_idx, band_hash).
    Callers that compare several hash families (the xx/md5 parity check)
    union candidate sets first and pay the exact-jaccard verify ONCE.

    Output: id_a, id_b (a < b), distinct.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(docs, id_col, text_col, k, hash_fn=hash_fn)
    bands_df = (
        sigs.withColumn("band_idx", F.explode(
            F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn(
            # md5 of the joined band slice: a band key both engines can
            # derive identically (any injective-enough digest works)
            "band_hash",
            F.md5(F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("signature"),
                            F.col("band_idx") * rows_per_band + 1,
                            rows_per_band),
                    lambda x: x.cast("string")))))
        .select("id", "band_idx", "band_hash")
    )
    la = bands_df.select("band_idx", "band_hash", F.col("id").alias("id_a"))
    lb = bands_df.select("band_idx", "band_hash", F.col("id").alias("id_b"))
    return (
        la.join(lb, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def minhash_lsh_pairs(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 32, bands: int = 8,
                      threshold: float = 0.5,
                      hash_fn: str = "xxhash64") -> DataFrame:
    """MinHash+LSH near-dup pairs: banded candidates
    (minhash_lsh_candidates), then verify with exact shingle Jaccard on
    the (small) candidate set.

    Output: id_a, id_b, jaccard (verified).
    """
    candidates = minhash_lsh_candidates(docs, id_col, text_col, k, bands,
                                        hash_fn=hash_fn)
    # Verify candidates with exact jaccard over the shared postings index —
    # only candidate pairs are scored.
    return jaccard_verify(candidates,
                          distinct_postings(docs, id_col, text_col),
                          threshold)


def simhash_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", bits: int = 64,
                         hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash: per-bit majority vote of a word hash over the doc.

    Plan: explode (word, bit) — a bits-fold row blowup but linear and
    perfectly partitioned on (id, bit); then reassemble the fingerprint as
    Σ 2^bit over majority bits. Output: id, simhash (bigint).

    hash_fn:
    - 'xxhash64' (default): 64-bit int word hash — the fast path.
    - 'md5': the first 15 hex chars of md5(word) parsed as a 60-bit int
      (signed-long safe). Same estimator, and every bit is reproducible
      from the md5 hex string in ANY engine — the fully oracle-checkable
      variant (mirror of minhash_signatures' md5 mode). Callers should
      pass bits<=60.
    """
    if hash_fn == "md5":
        bits = min(bits, 60)
        word_hash = F.conv(F.substring(F.md5(F.col("word")), 1, 15),
                           16, 10).cast("long")
    elif hash_fn == "xxhash64":
        word_hash = F.xxhash64("word")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    words = (
        with_words(docs, text_col)
        .select(F.col(id_col).alias("id"), F.explode("words").alias("word"))
        .withColumn("h", word_hash)
        .withColumn("bit", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))))
        # column-valued shift counts need the SQL form (the pyspark wrapper
        # only takes literal bit counts)
        .withColumn("vote",
                    F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1))
    )
    return (
        words.groupBy("id", "bit").agg(F.sum("vote").alias("v"))
        .withColumn("bit_on", (F.col("v") > 0).cast("long"))
        .groupBy("id")
        .agg(F.sum(F.expr("bit_on << bit")).alias("simhash"))
    )


def simhash_pairs(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  bands: int = 4, bits: int = 64,
                  hash_fn: str = "xxhash64") -> DataFrame:
    """SimHash near-dup pairs: band the fingerprint into `bands` segments;
    hamming<=bands-1 guarantees >=1 equal band (pigeonhole), so equi-join
    on (band, segment) finds all candidates; verify hamming.

    Output: id_a, id_b, hamming.
    """
    fp = simhash_fingerprints(docs, id_col, text_col, bits, hash_fn)
    if hash_fn == "md5":
        bits = min(bits, 60)
    seg_bits = bits // bands
    mask = (1 << seg_bits) - 1
    segs = (
        fp.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))))
        .withColumn("segment",
                    F.expr(f"(simhash >> (band * {seg_bits})) & {mask}"))
    )
    sa = segs.select("band", "segment", F.col("id").alias("id_a"),
                     F.col("simhash").alias("sh_a"))
    sb = segs.select("band", "segment", F.col("id").alias("id_b"),
                     F.col("simhash").alias("sh_b"))
    return (
        sa.join(sb, ["band", "segment"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", F.bit_count(
            F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup(embeddings: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       threshold: float = 0.95, dim: int = 64) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= threshold).

    Brute-force O(n^2) — correct baseline for modest n; the LSH/IVF
    bucketed paths in operators.similarity are the scale route. The dot
    product is an UNROLLED sum of element products: on an n^2 pair volume
    the lambda-HOF form (aggregate/zip_with) costs ~5x more than static
    array-index expressions, which whole-stage codegen compiles to direct
    loads. Pitfall: the unrolled sum must accumulate LEFT-TO-RIGHT
    (((a0+a1)+a2)+...) to bit-match the oracle's sequential list_dot_product.

    Output: id_a, id_b, cosine.
    """
    v = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"))
    norm = v.withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform(F.col("vec"), lambda x: x * x),
                           F.lit(0.0), lambda a, x: a + x)))
    # Flatten to scalar columns BEFORE the join: per-pair array getItem
    # calls fall out of efficient codegen (measured 37s vs 7s at 12.5M
    # pairs); flat doubles are direct row accesses.
    from nexus_spark.functions.skew import ensure_parallelism

    flat = norm.select("id", "nrm",
                       *[F.col("vec").getItem(i).alias(f"v{i}")
                         for i in range(dim)])
    # Spread ONLY the left side: crossJoin task count is left x right
    # partitions, so a 1-split input would score the whole n^2 volume in
    # one task, while spreading both sides quadratically fragments it
    # (32x32 = 1024 micro-tasks). left=parallelism, right=as-read gives
    # exactly one wave of full-size tasks.
    a = ensure_parallelism(
        flat.select(F.col("id").alias("id_a"), F.col("nrm").alias("nrm_a"),
                    *[F.col(f"v{i}").alias(f"a{i}") for i in range(dim)]))
    b = flat.select(F.col("id").alias("id_b"), F.col("nrm").alias("nrm_b"),
                    *[F.col(f"v{i}").alias(f"b{i}") for i in range(dim)])
    dot = F.col("a0") * F.col("b0")
    for i in range(1, dim):
        dot = dot + F.col(f"a{i}") * F.col(f"b{i}")
    # Explicit broadcast of the RIGHT side: left otherwise risks being
    # the broadcast side, which would serialize the scoring over the
    # right's (possibly single) input split. Broadcasting the candidate
    # set is the brute-force contract anyway (same as the GEMM variant);
    # the IVF/LSH operators are the beyond-memory route.
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("nrm_a") * F.col("nrm_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# Max rows one IVF near-dup Python task materializes; cells above this
# are hash-split into chunk-pair groups (see embedding_near_dup_ivf).
_IVF_CELL_CAP = 65536


def embedding_near_dup_ivf(embeddings: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.95, dim: int = 64,
                           n_centroids: int = 32,
                           nprobe: int = 2) -> DataFrame:
    """Cell-bucketed embedding near-dup — the beyond-memory scale route
    the brute/GEMM docstrings point to.

    Every vector is assigned to its `nprobe` nearest coarse cells (the
    IVF quantizer from operators.similarity); only pairs sharing a cell
    are scored. Pair volume drops from n^2 to sum(|cell|^2) — with the
    multi-probe assignment absorbing boundary pairs whose members
    quantize differently. Precision is exact (every emitted pair carries
    its true cosine, same flat-codegen dot as the brute path); recall is
    approximate with the usual IVF knob (raise nprobe/n_centroids).

    At 100 TB the cell assignment is write-time partitioning
    (similarity.ivf_write) and this join runs per cell partition.
    Output: id_a, id_b, cosine — same surface as embedding_near_dup.
    """
    from nexus_spark.operators.similarity import (_flat_cached, _flat_dot,
                                                  ivf_cells_cached)

    corpus = _flat_cached(embeddings, id_col, vec_col, dim, "c")
    # Memoized multi-probe assignment — the in-session analog of the
    # persisted ivf_write cell layout (shared with the other IVF
    # consumers in the session).
    cells = ivf_cells_cached(corpus, dim, n_centroids, nprobe)

    # Candidate capture runs per cell as a blocked BLAS Gram slab
    # (round-9; the knn_graph_ivf shape): the relational formulation
    # shipped the sum(|cell|^2) pair stream (~25M rows at sf1) through
    # a distinct plus two 65-column joins whose fused 64-term dot
    # deoptimized its whole codegen stage (the sim_ann_hamming JIT
    # lesson). The kernel emits only pairs whose BLAS cosine clears
    # threshold - 1e-9 — a SUPERSET by margin (64-term association
    # error is ~1e-15 on unit vectors, six orders inside the margin) —
    # and the survivors (output-sized, not candidate-sized) are
    # re-scored EXACTLY with the original left-associated JVM
    # expression, whose predicate alone decides membership. Same
    # capture-then-verify structure as the LSH band + exact-Jaccard
    # verify path. Per-task memory is one row-block x |cell| slab;
    # n_centroids ~ sqrt(n) keeps the cell bounded as the corpus grows.
    import pandas as pd

    vecs = cells.join(
        embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("_v")), "id")
    margin = float(threshold) - 1e-9

    # Oversized-cell degradation (round-9 ADVICE): the kernel holds one
    # whole group in pandas, so a skewed quantizer cell must not become
    # one unbounded task. Cells above _CELL_CAP rows are hash-split
    # into chunks and every chunk PAIR (ga <= gb) becomes its own
    # group: a row in chunk c replicates to the n_chunks groups
    # {(min(c,o), max(c,o))}, bounding group size at 2*_CELL_CAP while
    # preserving the exact pair set (cross-chunk pairs are emitted in
    # their one (ga<gb) group, same-chunk pairs in (c,c)). Common case
    # (every cell under the cap) keeps the unsalted one-group-per-cell
    # plan: the split decision reads the session-memoized largest-cell
    # scalar (ivf_max_cell_cached — one tiny aggregate on first ask per
    # corpus/geometry, a dict lookup on every later call, so repeat and
    # steady invocations stay job-free at construction).
    from nexus_spark.operators.similarity import ivf_max_cell_cached
    max_cell = ivf_max_cell_cached(corpus, dim, n_centroids, nprobe)
    if max_cell <= _IVF_CELL_CAP:
        vecs = (vecs.withColumn("_ch", F.lit(0))
                .withColumn("_ga", F.lit(0)).withColumn("_gb", F.lit(0)))
    else:
        sizes = cells.groupBy("cent_id").agg(
            F.count(F.lit(1)).alias("_csz"))
        vecs = (
            vecs.join(F.broadcast(sizes), "cent_id")
            .withColumn("_nch",
                        F.greatest(F.lit(1),
                                   F.ceil(F.col("_csz") / _IVF_CELL_CAP))
                        .cast("int"))
            .withColumn("_ch",
                        F.pmod(F.xxhash64(F.col("id")), F.col("_nch"))
                        .cast("int"))
            .withColumn("_oth",
                        F.explode(F.sequence(F.lit(0),
                                             F.col("_nch") - 1)))
            .withColumn("_ga", F.least("_ch", "_oth"))
            .withColumn("_gb", F.greatest("_ch", "_oth"))
            .drop("_csz", "_nch", "_oth"))

    def cand_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf["id"].to_numpy()
        V = np.array(list(pdf["_v"]), dtype=np.float64)
        nrm = np.linalg.norm(V, axis=1)
        nrm[nrm == 0.0] = 1.0
        n = len(ids)
        # Split groups (ga < gb) own only CROSS-chunk pairs; same-chunk
        # pairs belong to the (c, c) group.
        cross_only = bool(n) and pdf["_ga"].iat[0] != pdf["_gb"].iat[0]
        out_a, out_b = [], []
        if cross_only:
            # Only the V_a @ V_b.T block (round-10 ADVICE: the full
            # n x n slab masked intra-chunk pairs away AFTER the BLAS,
            # wasting up to ~half the Gram work on every oversized
            # cell). Every cross pair has one member per chunk, so it
            # surfaces exactly once on its A-row; emit (min, max) by id
            # to keep the kernel's id_a < id_b convention.
            ma = pdf["_ch"].to_numpy() == pdf["_ga"].iat[0]
            Va, na, ids_a = V[ma], nrm[ma], ids[ma]
            Vb, nb, ids_b = V[~ma], nrm[~ma], ids[~ma]
            block = max(32, min(1024, (1 << 23) // max(len(ids_b), 1)))
            for s in range(0, len(ids_a), block):
                e = min(s + block, len(ids_a))
                G = (Va[s:e] @ Vb.T) / np.outer(na[s:e], nb)
                for r in range(e - s):
                    hit = np.nonzero(G[r] >= margin)[0]
                    if len(hit):
                        # dtype=ids.dtype keeps string ids object-typed
                        # (np.minimum's object loop compares via
                        # Python <, same ordering as `ids > ids[r]`).
                        ai = np.full(len(hit), ids_a[s + r],
                                     dtype=ids.dtype)
                        out_a.append(np.minimum(ai, ids_b[hit]))
                        out_b.append(np.maximum(ai, ids_b[hit]))
        else:
            # Cap the Gram slab at ~64 MiB regardless of group width.
            block = max(32, min(1024, (1 << 23) // max(n, 1)))
            for s in range(0, n, block):
                e = min(s + block, n)
                G = (V[s:e] @ V.T) / np.outer(nrm[s:e], nrm)
                for r in range(e - s):
                    hit = np.nonzero((G[r] >= margin)
                                     & (ids > ids[s + r]))[0]
                    if len(hit):
                        out_a.append(np.full(len(hit), ids[s + r]))
                        out_b.append(ids[hit])
        if not out_a:
            empty = pd.Series([], dtype=pdf["id"].dtype)
            return pd.DataFrame({"id_a": empty, "id_b": empty})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    # Output ids keep the caller's id type (round-9 ADVICE: the old
    # hard-coded `long` broke string-keyed corpora at Arrow conversion;
    # the `ids > ids[r]` ordering is numpy-elementwise for numeric AND
    # string dtypes alike).
    id_ddl = embeddings.schema[id_col].dataType.simpleString()
    cand = (vecs.groupBy("cent_id", "_ga", "_gb")
            .applyInPandas(cand_cell, f"id_a {id_ddl}, id_b {id_ddl}")
            .distinct())

    a = (corpus.drop("vec").withColumnRenamed("id", "id_a")
         .withColumnRenamed("nrm", "nrm_a"))
    a = a.select("id_a", "nrm_a",
                 *[F.col(f"c{i}").alias(f"a{i}") for i in range(dim)])
    b = (corpus.drop("vec").withColumnRenamed("id", "id_b")
         .withColumnRenamed("nrm", "nrm_b"))
    b = b.select("id_b", "nrm_b",
                 *[F.col(f"c{i}").alias(f"b{i}") for i in range(dim)])
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("cosine",
                    _flat_dot("a", "b", dim)
                    / (F.col("nrm_a") * F.col("nrm_b")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_gemm(embeddings: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Vectorized brute-force near-dup: numpy GEMM inside mapInPandas.

    Each Arrow batch of rows is scored against the full candidate matrix
    with one BLAS matmul — the correct Python drop-down when the built-in
    operators can't express dense linear algebra efficiently. The candidate
    matrix rides in a broadcast variable, so this path requires the
    candidate set to fit in executor memory (exactly the brute-force
    contract; the LSH/IVF operators are the beyond-memory route).

    Output: id_a, id_b, cosine — same surface as embedding_near_dup.
    """
    import numpy as np
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    rows = embeddings.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = embeddings.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)
    thr = threshold

    schema = StructType([
        StructField("id_a", LongType()), StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ])

    def score(batches):
        import numpy as _np
        import pandas as _pd

        cand_ids, cand = b_ids.value, b_mat.value
        for pdf in batches:
            q = _np.array(list(pdf[vec_col]), dtype=_np.float64)
            q = q / _np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ cand.T
            qids = pdf[id_col].to_numpy()
            out_a, out_b, out_c = [], [], []
            for row_i in range(sims.shape[0]):
                mask = (sims[row_i] >= thr) & (cand_ids > qids[row_i])
                out_a.extend([qids[row_i]] * int(mask.sum()))
                out_b.extend(cand_ids[mask].tolist())
                out_c.extend(sims[row_i][mask].tolist())
            yield _pd.DataFrame({"id_a": out_a, "id_b": out_b,
                                 "cosine": out_c})

    return embeddings.select(id_col, vec_col).mapInPandas(score, schema)


# Memo of converged component labels per (session, pairs plan, nodes plan):
# the propagation runs driver-coordinated rounds, so repeated consumers in
# one session (components query, cluster rollup, dedup executor) must share
# ONE convergence. Dropped by clear_cache() / domain.invalidate().
_CC_CACHE: dict[tuple, tuple[DataFrame, DataFrame, DataFrame]] = {}

# Maintained-state memo for the SYMMETRIZED, size-partitioned edge frame
# a CC run iterates over — the dedup-graph analog of graph.py's
# _EDGE_CACHE (same classification: the edge list is maintained
# neighborhood state, like the IVF cell table). Distinct from _CC_CACHE,
# which memoizes the query RESULT and is cleared per timed bench run so
# every CC consumer pays its own convergence: this cache only skips
# re-materializing the pair plan (e.g. the full IVF pair search inside
# semantic dedup) that feeds those rounds.
_CC_EDGE_CACHE: dict[tuple, tuple[DataFrame, DataFrame, int]] = {}

# Diagnostics: rounds the last (non-memoized) convergence took — read by
# tests asserting the log-diameter behavior of pointer jumping.
_LAST_CC_ROUNDS = 0


def _session_key(spark) -> str:
    """Stable per-session cache key: the JVM session UUID (survives
    nothing it shouldn't — a new session gets a new UUID, unlike
    id(session), which CPython can reuse after GC)."""
    try:
        return str(spark._jsparkSession.sessionUUID())
    except Exception:  # pragma: no cover - connect/other backends
        return f"pyid:{id(spark)}"


def connected_components(pairs: DataFrame, nodes: DataFrame,
                         id_col: str = "doc_id",
                         src_col: str = "id_a", dst_col: str = "id_b",
                         max_rounds: int = 30) -> DataFrame:
    """Memoizing wrapper over the label propagation (result is a
    localCheckpointed frame, safe to share across consumers).

    semanticHash() is a hash, not plan equality — so the memo stores the
    source frames alongside the result and confirms a hit with
    sameSemantics() before returning (a collision then recomputes
    instead of returning another query's clustering)."""
    key = (_session_key(pairs.sparkSession), pairs.semanticHash(),
           nodes.semanticHash(), id_col, src_col, dst_col)
    hit = _CC_CACHE.get(key)
    if (hit is not None and hit[0].sameSemantics(pairs)
            and hit[1].sameSemantics(nodes)):
        return hit[2]
    got, labels = _connected_components(pairs, nodes, id_col, src_col,
                                        dst_col, max_rounds)
    # The result plan lazily references the final labels checkpoint, so
    # the memo keeps the labels HANDLE (tuple position 3) for the
    # explicit clear paths (clear_cc_result_cache releases it eagerly).
    # Capacity eviction / collision overwrite only DROP the reference
    # (round-12 ADVICE): a caller may still hold the returned frame,
    # and its lineage is truncated — eager destruction would strand it.
    _bounded_put(_CC_CACHE, key, (pairs, nodes, got, labels), cap=4,
                 frame_idx=None)
    return got


def _connected_components(pairs: DataFrame, nodes: DataFrame,
                          id_col: str = "doc_id",
                          src_col: str = "id_a", dst_col: str = "id_b",
                          max_rounds: int = 30) -> DataFrame:
    """Resolve a near-dup pair graph into duplicate clusters.

    Every node is labeled with the minimum node id reachable through the
    pair graph (its component representative); singleton docs label
    themselves. This is the step every production dedup pipeline needs
    after MinHash/SimHash/Jaccard emit PAIRS: pairs are not clusters —
    A~B and B~C must collapse to one surviving representative for {A,B,C}.

    Algorithm: min-label propagation over the symmetric edge list
    (comp(v) <- min(comp(v), min_{u~v} comp(u)) per round) PLUS a
    pointer-jumping step (comp(v) <- comp(comp(v)), the path-halving
    trick from classic parallel CC / hash-to-min, Rastogi et al. ICDE'13
    family): propagation alone needs graph-diameter rounds, jumping
    collapses label chains geometrically, so rounds scale with
    log(diameter). A 65-node chain converges in 6 rounds instead of 64
    (asserted in tests). Alternating large-star/small-star (Kiveris et
    al. SoCC'14) is the other standard formulation; this one reuses the
    same two equi-join primitives the rest of the pipeline exercises.

    Scale design: the loop runs on the INDUCED SUBGRAPH only — nodes
    that appear in at least one pair (<= 2|E| rows); singleton documents
    can never change their self-label, so they are left-joined back at
    the end instead of riding through every round. In a dedup corpus
    singletons are the vast majority (5B docs vs ~100M dup-pair nodes at
    100 TB), so this shrinks every per-round join by |V|/2|E|. Each
    round is then two equi-joins (edge-label join + label-label
    self-join), both partitioned on the node id; `localCheckpoint`
    truncates the plan so lineage doesn't grow with rounds (on a cluster
    with a checkpoint dir configured, prefer `checkpoint()` for fault
    tolerance). Convergence is detected by the
    monotone label-sum invariant: labels only ever decrease, so an
    unchanged sum(comp) is a fixpoint — one scalar agg per round instead
    of a full-frame anti-join (numeric ids; non-numeric ids use an exact
    changed-label count, since SUM over strings is NULL and would fake
    convergence).

    Returns (result, final_labels): result columns (id_col, component)
    — component = min doc id of the cluster; final_labels is the last
    round's checkpoint handle so the memoizing wrapper can release its
    blocks eagerly on eviction/clear.
    """
    sp = int(pairs.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    ekey = (_session_key(pairs.sparkSession), pairs.semanticHash(),
            src_col, dst_col)
    ehit = _CC_EDGE_CACHE.get(ekey)
    if ehit is not None and ehit[0].sameSemantics(pairs):
        edges, parts = ehit[1], ehit[2]
    else:
        edges = pairs.select(F.col(src_col).alias("e_src"),
                             F.col(dst_col).alias("e_dst"))
        edges = edges.union(
            edges.select(F.col("e_dst").alias("e_src"),
                         F.col("e_src").alias("e_dst"))).localCheckpoint()

        # Adaptive loop parallelism: the rounds run O(|edges|)-sized
        # frames, so size the loop's partition count to the materialized
        # edge count (~200k edges/partition) instead of the session
        # shuffle default — at toy scale every round otherwise pays 32
        # near-empty tasks per job (measured: ~40% of loop wall time);
        # at corpus scale this keeps the full configured parallelism.
        # The count is cheap: the edge frame is already checkpointed.
        n_edges = edges.count()
        parts = max(1, min(sp, n_edges // 200_000 + 1))
        if parts < sp:
            wide = edges
            edges = edges.repartition(parts, "e_dst").localCheckpoint()
            _release_checkpoint(wide)  # superseded by the repartition
        # frame_idx=None: the checkpointed edge frame is woven into
        # every returned CC result's plan — eviction must reference-drop,
        # not destroy blocks (round-12 ADVICE); clear_cache() releases.
        _bounded_put(_CC_EDGE_CACHE, ekey, (pairs, edges, parts),
                     frame_idx=None)

    # Induced subgraph: only edge-endpoint nodes enter the loop (the
    # symmetric edge list has every endpoint in e_src).
    labels = (edges.select(F.col("e_src").alias("node")).distinct()
              .withColumn("comp", F.col("node"))
              .repartition(parts, "node").localCheckpoint())

    # Convergence detection. Labels only ever decrease (numeric min /
    # lexicographic least), so for numeric ids an unchanged sum(comp) is
    # a fixpoint — one scalar agg per round. Summing a non-numeric label
    # column would yield NULL==NULL (false convergence after round 1),
    # so non-numeric ids fall back to an exact changed-label count: both
    # frames are hash-partitioned on node, so the join needs no extra
    # shuffle, and limit(1) short-circuits the scan on the common
    # (still-changing) case.
    from pyspark.sql.types import NumericType
    numeric_ids = isinstance(labels.schema["comp"].dataType, NumericType)

    def _converged(prev_labels, new_labels, state):
        if numeric_ids:
            cur = new_labels.agg(F.sum("comp")).collect()[0][0]
            done = state and cur == state[0]
            state[:] = [cur]
            return done
        changed = (new_labels.alias("n")
                   .join(prev_labels.alias("o"), "node")
                   .where(F.col("n.comp") != F.col("o.comp"))
                   .limit(1).count())
        return changed == 0

    state: list = []
    if numeric_ids:
        state = [labels.agg(F.sum("comp")).collect()[0][0]]

    def superstep(lbl: DataFrame) -> DataFrame:
        # 1) neighbor-min propagation
        neigh = (edges.join(lbl, edges.e_dst == lbl.node)
                 .groupBy("e_src").agg(F.min("comp").alias("nmin")))
        stepped = (lbl.join(neigh, lbl.node == neigh.e_src, "left")
                   .select(F.col("node"),
                           F.least(F.col("comp"),
                                   F.coalesce(F.col("nmin"), F.col("comp")))
                           .alias("comp")))
        # 2) pointer jump: follow the label one hop (comp <- comp(comp))
        parents = stepped.select(F.col("node").alias("p_node"),
                                 F.col("comp").alias("p_comp"))
        return (stepped.join(parents,
                             stepped.comp == parents.p_node, "left")
                .select(F.col("node"),
                        F.least(F.col("comp"),
                                F.coalesce(F.col("p_comp"),
                                           F.col("comp"))).alias("comp")))

    # One superstep per materialization: batching 2 supersteps per
    # checkpoint was MEASURED slower here (the doubled per-batch plan
    # analysis plus up to 2 over-run supersteps outweigh the saved
    # scheduler jobs: sf0.1 semantic-dedup steady 3.4s -> 4.5s), so the
    # loop keeps the shallow-plan 1:1 shape.
    global _LAST_CC_ROUNDS
    rounds = 0
    while rounds < max_rounds:
        prev_labels = labels
        rounds += 1
        labels = (superstep(labels)
                  .repartition(parts, "node").localCheckpoint())
        done = _converged(prev_labels, labels, state)
        # The new checkpoint is eager and the convergence probe has run,
        # so nothing references the previous round's labels anymore —
        # release its blocks NOW (round-11): a 100 TB dedup graph would
        # otherwise hold rounds x |induced V| of orphaned checkpoint
        # storage until a driver GC.
        _release_checkpoint(prev_labels)
        if done:
            break
    _LAST_CC_ROUNDS = rounds

    # Singletons rejoin: any node with no edge keeps its own id as the
    # component (exactly what the loop would have computed for it).
    # The final labels handle rides back so the memo can release it.
    return ((nodes.select(F.col(id_col).alias("node")).distinct()
             .join(labels, "node", "left")
             .select(F.col("node").alias(id_col),
                     F.coalesce(F.col("comp"), F.col("node"))
                     .alias("component"))),
            labels)


def cluster_representatives(components: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """Per-cluster summary over connected_components() output: the surviving
    representative (min id = the component label), cluster size, and the
    discarded duplicate count. One shuffle on the component key."""
    return (components.groupBy("component")
            .agg(F.count(F.lit(1)).alias("cluster_size"),
                 F.sum(F.when(F.col(id_col) != F.col("component"), 1)
                       .otherwise(0)).alias("n_duplicates")))


def canonical_survivors(components: DataFrame, docs: DataFrame,
                        id_col: str = "doc_id",
                        quality_col: str = "n_chars") -> DataFrame:
    """Survivorship: the canonical document per near-dup cluster, chosen
    by (quality_col DESC, id ASC) — the keep-the-best step that follows
    cluster resolution in every dedup pipeline (min-id representatives,
    cluster_representatives, keep whichever row the label landed on;
    this keeps the best-quality member instead).

    One id-equi join of the components frame onto the quality column and
    ONE max_by aggregate per cluster — no window, no sort; the arg-max
    runs map-side-combined like any other aggregate, so cost is one
    shuffle of (component, id, quality) triples regardless of cluster
    skew.

    Output: component, canonical_id, canonical_<quality_col>, n_members.
    """
    j = components.select("component", id_col).join(
        docs.select(id_col, quality_col), id_col)
    return (j.groupBy("component")
            .agg(F.max_by(
                id_col,
                F.struct(F.col(quality_col).alias("q"),
                         (-F.col(id_col)).alias("t"))).alias("canonical_id"),
                 F.max(quality_col).alias(f"canonical_{quality_col}"),
                 F.count(F.lit(1)).alias("n_members")))


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        k: int = 4, w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting",
    SIGMOD 2003 — public algorithm).

    Hash every word k-gram (md5 hex — portable, content-addressed), slide
    a window of w consecutive k-gram hashes, keep the minimum hash of each
    window, and dedupe: the selected minima are the document's fingerprint
    set. Winnowing guarantees any shared run of >= k+w-1 tokens produces
    at least one shared fingerprint, at ~2/(w+1) the density of full
    k-gram shingling — the fingerprint table this builds is ~w/2 times
    smaller than the Jaccard postings index for the same guarantee.

    Implementation is fully RELATIONAL — posexplode the words, k-grams via
    window `lead`, winnow minima via a windowed `min` over a w-row frame —
    deliberately not array higher-order functions: Catalyst inlines (never
    CSEs) column sub-expressions into lambda bodies, so the HOF form
    re-evaluated the md5 k-gram build once per window position — O(g²·k)
    per document (measured ~75ms/doc at g=50). The relational form is
    whole-stage-codegen end to end, costs one shuffle (partition by doc
    id, reused by both window passes), and its per-partition state is one
    document — the shape that survives a 100 TB corpus.

    Output: (id, n_fp, fp) — the postings shape the pair-join consumes.
    Short docs (< k words) contribute one gram of the whole text; docs
    with fewer than w grams contribute the min of what they have.
    """
    from nexus_spark.functions.skew import ensure_parallelism

    long = (ensure_parallelism(docs)
            .select(F.col(id_col).alias("id"),
                    F.split(F.col(text_col), " ").alias("ws"))
            .select("id", F.size("ws").alias("nw"),
                    F.posexplode("ws").alias("pos", "word")))
    byid = Window.partitionBy("id").orderBy("pos")
    # k-gram at word position p = words[p..p+k-1]; concat_ws skips the
    # NULLs that lead() yields past the end, so for a short doc (< k
    # words) the pos-0 "gram" is exactly the whole text — the fallback.
    gram = F.concat_ws(
        " ", F.col("word"), *[F.lead("word", i).over(byid)
                              for i in range(1, k)])
    grams = (long.withColumn("h", F.md5(gram))
             .where((F.col("pos") <= F.col("nw") - k)
                    | ((F.col("nw") < k) & (F.col("pos") == 0))))
    # Winnow: min of each w-gram window. Valid window starts run to
    # P-w+1 (P = last gram position); a doc with fewer than w grams keeps
    # its pos-0 (truncated-frame) min — the min of all its grams.
    winf = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    p_last = F.col("nw") - k  # last gram position (>= 0 iff nw >= k)
    fps = (grams.withColumn("m", F.min("h").over(winf))
           .where((F.col("pos") <= F.greatest(p_last, F.lit(0)) - (w - 1))
                  | (F.col("pos") == 0))
           .select("id", F.col("m").alias("fp"))
           .distinct())
    n = Window.partitionBy("id")
    return fps.select("id", F.count(F.lit(1)).over(n).alias("n_fp"), "fp")


def winnow_pairs(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 4, w: int = 4,
                 threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs by winnowing-fingerprint overlap coefficient
    |A∩B| / min(|A|, |B|) >= threshold.

    Same inverted-index plan as ngram_jaccard_pairs — pairs materialize
    only where a fingerprint co-occurs, and the fingerprint table is the
    winnowed (sparser) one, so the self-join fan-out is ~2/(w+1) of the
    full-shingle join at the same recall guarantee. One equi-join on the
    fingerprint + one pair-key aggregation.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    a = fps.select(F.col("fp"), F.col("id").alias("id_a"),
                   F.col("n_fp").alias("n_a"))
    b = fps.select(F.col("fp"), F.col("id").alias("id_b"),
                   F.col("n_fp").alias("n_b"))
    # hint("merge"): self-join of the same fingerprint subtree — no
    # broadcast-shaped side exists (see ngram_jaccard_pairs).
    return (a.hint("merge").join(b, "fp")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "n_a", "n_b")
            .agg(F.count(F.lit(1)).alias("common"))
            .withColumn("overlap",
                        F.col("common")
                        / F.least(F.col("n_a"), F.col("n_b")))
            .where(F.col("overlap") >= threshold)
            .select("id_a", "id_b", "common", "overlap"))


def apply_dedup(docs: DataFrame, components: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """The final dedup decision: keep exactly one survivor per cluster
    (the component representative, = min id). Completes the pipeline
    pairs -> connected_components -> apply_dedup; duplicates are dropped,
    singletons pass through. One equi-join on the id (broadcastable when
    the component table is small; co-partitioned otherwise)."""
    keep = (components.where(F.col(id_col) == F.col("component"))
            .select(id_col))
    return docs.join(keep, id_col)


def contamination_check(docs: DataFrame, benchmark: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Benchmark contamination (decontamination) check: for every training
    document, how many of its distinct word n-gram shingles also occur in
    an evaluation/benchmark corpus — the train/test-overlap audit every
    serious pretraining pipeline runs before training.

    Plan: the training side reuses the memoized distinct-postings index;
    the benchmark side reduces to a DISTINCT shingle-hash set (benchmark
    corpora are tiny next to training corpora, so Catalyst broadcasts it
    and the check is a broadcast semi-join against the scan — no big
    shuffle). Output per contaminated doc: n_hits, n_shingles, and the
    contaminated fraction; docs with zero overlap are absent (anti-join
    them to get the clean set).
    """
    d = distinct_postings(docs, id_col, text_col)
    b = (shingle_postings(benchmark, id_col, text_col)
         .select("h").distinct())
    return (d.join(b, "h")
            .groupBy(F.col("id").alias(id_col), "n_shingles")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(id_col, "n_hits", "n_shingles",
                    (F.col("n_hits") / F.col("n_shingles"))
                    .alias("contamination")))


def ngram_containment(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", threshold: float = 0.8,
                      min_shingles: int = 5) -> DataFrame:
    """DIRECTED n-gram containment C(a -> b) = |S_a ∩ S_b| / |S_a| —
    the asymmetric cousin of Jaccard that catches subset duplication
    (a doc quoted or wrapped inside a larger one), which symmetric
    near-dup misses when the container is much longer than the
    contained doc (Broder's containment measure, the dedup criterion
    for boilerplate/quote removal).

    Same shared inverted index as the Jaccard family
    (`distinct_postings`: cached, memoized per session/plan): pairs
    join only on shared shingle hashes — no cross join — and the
    denominator is the CONTAINED side's distinct-shingle count, so the
    only difference from jaccard is the division. `min_shingles` drops
    degenerate tiny docs that are trivially contained everywhere.

    Output: id_a (contained), id_b (container), n_inter, n_a,
    containment — both directions can appear, that is the point.
    """
    post = distinct_postings(docs, id_col, text_col)
    a = (post.where(F.col("n_shingles") >= min_shingles)
         .select(F.col("id").alias("id_a"), "h",
                 F.col("n_shingles").alias("n_a")))
    b = post.select(F.col("id").alias("id_b"), "h")
    return (
        # Unhinted like ngram_jaccard_pairs: Catalyst's size guard over
        # the eagerly-materialized postings stats picks broadcast small
        # / sort-merge large (see the pair-stage comment there).
        a.join(b, "h")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"),
             F.first("n_a").alias("n_a"))
        .withColumn("containment",
                    F.col("n_inter").cast("double") / F.col("n_a"))
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "n_inter", "n_a", "containment")
    )
