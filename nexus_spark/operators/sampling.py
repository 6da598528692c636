"""Deterministic sampling and sequence-packing operators for training-data
pipelines (not present in the reference; designed 100 TB-first).

Everything here is seed-free and engine-portable: selection is driven by
md5(id) — a content-addressed coin flip that is stable across runs, engines,
partitionings, and cluster sizes, so a sample drawn at 100 TB is reproducible
row-for-row. No randomness API, no driver-side state, no shuffle beyond what
the semantics require:

- fraction sampling: zero shuffle (pure filter, pushes down past the scan);
- exact-n per stratum: one shuffle on the stratum key (window row_number);
- sequence packing: one shuffle on the bucket key (window cumulative sum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nexus_spark.operators.text import token_count


def _hash_key(id_col: Column) -> Column:
    """Deterministic per-row sampling key: first 8 hex chars of
    md5(cast(id as string)). Lexicographic compare on the hex prefix is a
    uniform draw over [0, 16^8); both Spark and ANSI SQL render md5 as
    lowercase hex, so the same rows are selected in any engine."""
    return F.substring(F.md5(id_col.cast("string")), 1, 8)


def fraction_threshold(rate: float) -> str:
    """Hex threshold t such that P[md5-prefix < t] == rate (to 1/16^8).

    Thresholds are compared as 8-char strings, so rate=1.0 maps to "g"
    (sorts after every hex digit) rather than a 9-char numeral that would
    break the length-equal lexicographic==numeric equivalence."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * 16**8), "08x")


def stratified_sample_fraction(df: DataFrame, strata_col: str,
                               rates: dict[str, float],
                               id_col: str = "doc_id",
                               default_rate: float = 0.0) -> DataFrame:
    """Per-stratum fraction sampling as a pure filter — the scan-time
    downsampling step of a data-mixing pipeline (e.g. keep 10% of 'en',
    50% of low-resource languages).

    No shuffle, no randomness: row kept iff md5(id) prefix < the stratum's
    hex threshold. The filter is a plain column predicate, so Catalyst
    pushes it into the scan and the discarded rows never leave the reader.
    Deterministic at any scale and under any repartitioning.
    """
    key = _hash_key(F.col(id_col))
    default_thr = F.lit(fraction_threshold(default_rate))
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strata_col) == stratum
        thr = F.lit(fraction_threshold(rate))
        expr = F.when(cond, thr) if expr is None else expr.when(cond, thr)
    thr_col = expr.otherwise(default_thr) if expr is not None else default_thr
    return df.where(key < thr_col)


def temperature_sample(df: DataFrame, strata_col: str,
                       alpha: float = 0.3, target_total: int | None = None,
                       id_col: str = "doc_id") -> DataFrame:
    """Temperature-based corpus mixing (the multilingual alpha-sampling
    of mT5 / XLM-R): target group fractions p_g ∝ n_g^alpha flatten the
    head and boost the tail (alpha=1 keeps natural proportions, alpha=0
    gives uniform), realized with the same deterministic md5-threshold
    coin as the other samplers.

    Rates are DATA-DEPENDENT but fully in-plan: one group-count
    aggregate broadcasts back onto the scan (the count table is
    group-cardinality-sized), and the per-row keep test compares the
    integer value of the md5 prefix against rate * 16^8 — float
    arithmetic both engines evaluate identically, no driver collect, no
    randomness API. rate_g = min(1, T * p_g / n_g) where T is
    `target_total` (defaults to the smallest group size times the group
    count — the largest T at which no group exhausts under uniform).

    Output: the sampled rows (all input columns) plus `group_rate`.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = (df.groupBy(strata_col)
              .agg(F.count(F.lit(1)).alias("n_g")))
    tot = counts.agg(
        F.sum(F.pow(F.col("n_g").cast("double"), alpha)).alias("z"),
        (F.min("n_g") * F.count(F.lit(1))).alias("t_default"))
    # Rates rounded to 6 dp BEFORE the compare: the float chain (pow,
    # sum order in z) can drift ~1e-16 between engines; rounding pins
    # both to the identical double so the md5-fraction test selects the
    # same rows everywhere (the same stabilization every ROUND(x,6)
    # oracle in this repo uses).
    rates = (counts.crossJoin(F.broadcast(tot))
             .select(strata_col,
                     F.round(F.least(
                         F.lit(1.0),
                         (F.lit(float(target_total)) if target_total
                          is not None else F.col("t_default")
                          .cast("double"))
                         * F.pow(F.col("n_g").cast("double"), alpha)
                         / F.col("z") / F.col("n_g")), 6)
                     .alias("group_rate")))
    keyed = df.join(F.broadcast(rates), strata_col)
    frac = F.conv(_hash_key(F.col(id_col)), 16, 10).cast("double") \
        / F.lit(float(16 ** 8))
    return keyed.where(frac < F.col("group_rate"))


def stratified_sample_exact(df: DataFrame, strata_col: str, n: int,
                            id_col: str = "doc_id") -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum: rank rows inside each
    stratum by md5(id) and keep the first n. The hash order is a uniform
    random permutation fixed by content, so this is a reproducible
    reservoir sample with one shuffle (the window partition) — the
    standard 'n docs per language/source' curation step.

    Adds a `sample_rank` column (1-based rank within the stratum).
    """
    w = Window.partitionBy(strata_col).orderBy(_hash_key(F.col(id_col)),
                                               F.col(id_col))
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .where(F.col("sample_rank") <= n))


def weighted_sample_topn(df: DataFrame, weight_col: str, n: int,
                         id_col: str = "doc_id",
                         seed: str = "w") -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES, IPL 2006): each row draws u = md5-uniform in (0, 1] and gets
    the exponential sort key -ln(u) / weight; the n smallest keys are a
    weighted sample without replacement. The standard quality-weighted /
    length-weighted corpus subsampling step, with this module's usual
    guarantees: seed-free, engine-portable, reproducible at any scale.

    Rows with weight <= 0 are excluded (they have zero selection
    probability; documented contract). Scale shape: the key is a pure
    projection; top-n is ORDER BY key LIMIT n — a TakeOrdered (per-
    partition heap + driver merge of n*partitions candidates), no global
    sort shuffle. The rank column comes from a window AFTER the limit,
    over n rows only.

    Output: id, weight, es_key, sample_rank (1-based, smallest key
    first).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    hexpfx = F.substring(
        F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 8)
    # u in (0, 1]: (hash_int + 1) / (16^8 + 1) — never 0, so ln is finite.
    u = ((F.conv(hexpfx, 16, 10).cast("bigint") + 1)
         / F.lit(float(16 ** 8 + 1)))
    key = -F.log(u) / F.col(weight_col)
    picked = (df.where(F.col(weight_col) > 0)
              .select(F.col(id_col),
                      F.col(weight_col).alias("weight"),
                      key.alias("es_key"))
              .orderBy(F.col("es_key").asc(), F.col(id_col).asc())
              .limit(int(n)))
    w = Window.orderBy(F.col("es_key").asc(), F.col(id_col).asc())
    return picked.withColumn("sample_rank", F.row_number().over(w))


def cap_per_group(df: DataFrame, group_col: str, n: int,
                  order_col: str | None = None,
                  id_col: str = "doc_id") -> DataFrame:
    """Cap each group's contribution at `n` rows — the domain-cap
    curation step (a crawl corpus where one domain/source contributes
    millions of near-identical pages gets bounded to its best/first n;
    the standard guard against single-source dominance in a training
    mix).

    Selection within a group is deterministic: by `order_col` DESC when
    given (keep the n highest-quality rows), else by the md5 content
    hash (an unbiased stable draw — same discipline as every sampler
    here); id tie-break either way. One shuffle on the group key; the
    per-group sort happens inside the window partition. Under EXTREME
    group skew (one domain = a whole executor's worth of rows) pre-prune
    with salted two-phase capping: cap at n within (group, salt) first,
    then re-cap the <= salts*n survivors — the second pass is tiny.
    This single-window form is the right default below that regime.

    Output: the input columns + group_rank (1..n).
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    order = ([F.col(order_col).desc()] if order_col is not None
             else [_hash_key(F.col(id_col)).asc()])
    w = Window.partitionBy(group_col).orderBy(*order,
                                              F.col(id_col).asc())
    return (df.withColumn("group_rank", F.row_number().over(w))
            .where(F.col("group_rank") <= n))


def shuffle_shards(df: DataFrame, n_shards: int = 8, seed: str = "r4",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic global shuffle + shard assignment — the training-
    export step that turns a curated corpus into N well-mixed output
    shards (the parquet/TFRecord writer layout), seed-free and
    engine-portable like every sampler in this module.

    Each row gets a content-addressed pseudo-random key
    md5(seed || ':' || id); shard = key-integer mod n_shards, position =
    rank of the key within the shard. Because the key is uniform, (a)
    shards are balanced to binomial fluctuation, and (b) the within-shard
    order is a uniform permutation — consecutive rows of any shard are
    draws from the whole corpus, so sources/languages arrive interleaved
    (no same-document or same-source runs), which is exactly the property
    a training dataloader needs from its shards.

    Scale shape: the shard assignment is a pure projection (no shuffle);
    the position rank is one hash shuffle on the shard key + a per-shard
    sort — the same cost as the shard write itself (df.repartition(shard)
    .sortWithinPartitions(key)), which is the intended physical layout at
    100 TB. Changing `seed` reshuffles; changing n_shards only re-buckets.

    Contract: `id_col` values must be unique (the module-wide sampler
    contract) — duplicate ids share a key, making pos_in_shard arbitrary
    among the copies.

    Output: all input columns + shard, pos_in_shard.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    clash = {"skey", "shard", "pos_in_shard"} & set(df.columns)
    if clash:
        raise ValueError(
            f"input already has reserved column(s) {sorted(clash)} — "
            "drop or rename them before re-sharding (withColumn would "
            "silently overwrite a previous assignment)")
    key = F.substring(
        F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 8)
    # conv(hex,16,10) == DuckDB ('0x'||hex)::BIGINT — portable hex->int.
    shard = F.pmod(F.conv(key, 16, 10).cast("bigint"), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy(F.col("skey"), F.col(id_col))
    return (df.withColumn("skey", key)
            .withColumn("shard", shard)
            .withColumn("pos_in_shard", F.row_number().over(w))
            .drop("skey"))


def chunk_documents(docs: DataFrame, chunk_tokens: int = 32,
                    stride: int = 24, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunker — the RAG/embedding-prep step
    (split every document into `chunk_tokens`-token windows advancing by
    `stride`, so consecutive chunks overlap by chunk_tokens - stride).

    Chunk starts are 0, stride, 2*stride, ... while start < n_tokens, so
    every token is covered and the tail chunk may be short. Pure array
    expressions + one posexplode — zero shuffle, the chunk stream feeds
    straight into an embedding/mapInPandas stage.

    Output: id, chunk_idx, chunk_start, chunk_text, n_chunk_tokens.
    """
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(F.lit(0),
                        F.greatest(F.size(words) - 1, F.lit(0)),
                        F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.struct(
            s.alias("start"),
            F.concat_ws(" ", F.slice(words, s + 1, chunk_tokens))
            .alias("txt"),
            F.least(F.size(words) - s, F.lit(chunk_tokens)).alias("n")))
    return (docs.select(F.col(id_col).alias("id"),
                        F.posexplode(chunks).alias("chunk_idx", "c"))
            .select("id", "chunk_idx",
                    F.col("c.start").alias("chunk_start"),
                    F.col("c.txt").alias("chunk_text"),
                    F.col("c.n").alias("n_chunk_tokens")))


def pack_sequences(docs: DataFrame, budget: int, n_buckets: int = 64,
                   id_col: str = "doc_id",
                   text_col: str = "text",
                   tokens_col: str | None = None) -> DataFrame:
    """Concat-and-chunk sequence packing: assign every document a context
    window (pack) of `budget` tokens, the way LLM pre-training shards a
    corpus into fixed-length training sequences.

    Documents are routed to `n_buckets` independent streams (bucket =
    id % n_buckets — portable, no hash function disagreement across
    engines), ordered by id within the bucket, and laid end-to-end; a
    document starts at the running token offset and its pack is
    floor(offset / budget). Documents may straddle a pack boundary —
    exactly the concat-then-chunk semantics of training-data loaders
    (the alternative, first-fit bin packing, is inherently sequential;
    this formulation is ONE window cumulative sum, fully parallel across
    buckets, and each bucket's windows are independent so skew is bounded
    by corpus_size / n_buckets).

    If `tokens_col` is given it is used as the per-doc token count
    (e.g. the n_tokens a curation pass already computed); otherwise the
    count is derived from `text_col`.

    Output: id, bucket, n_tokens, pack_id (bucket-local), offset_in_pack.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    toks = (F.col(tokens_col) if tokens_col
            else token_count(F.col(text_col)))
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .select(F.col(id_col),
                    (F.col(id_col) % n_buckets).alias("bucket"),
                    toks.alias("n_tokens"))
            .withColumn("cum_excl",
                        F.sum("n_tokens").over(w) - F.col("n_tokens"))
            .select(id_col, "bucket", "n_tokens",
                    F.floor(F.col("cum_excl") / budget).alias("pack_id"),
                    (F.col("cum_excl") % budget).alias("offset_in_pack")))
