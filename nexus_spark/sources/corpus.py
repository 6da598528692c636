"""JSONL corpus interchange — the de-facto wire format LLM training
corpora move in (one JSON object per line, gzip-sharded).

The reference's ingest surface is granule/archive-centric
(sources/granule.py, sources/warc.py); this module adds the text-corpus
leg: schema-ENFORCED reads (never schema inference — inference is a
full extra scan of the data, unacceptable at 100 TB and nondeterministic
under dirty rows) and sharded compressed writes.

Scale notes:
- read: one Spark file-source scan; gzip shards are non-splittable, so
  parallelism = shard count — write MANY shards (the writer defaults to
  a shard target, not 1 file). `mode=PERMISSIVE` + `_corrupt` column
  quarantines dirty lines instead of failing the job.
- write: shard count is explicit (repartition by a stable key hash, not
  coalesce — coalesce collapses upstream parallelism into the surviving
  tasks).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The documents-table interchange schema (TESTDATA.md): doc_id, text,
# lang, source, n_chars. Callers with other corpora pass their own.
DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

CORRUPT_COL = "_corrupt_record"


def write_jsonl_shards(df: DataFrame, path: str, n_shards: int = 8,
                       shard_key: str | None = None,
                       compression: str = "gzip") -> None:
    """Write a corpus as n_shards JSONL files (gzip by default).

    Sharding repartitions on a hash of `shard_key` (first column if
    None) so shard sizes stay balanced whatever the upstream
    partitioning was; gzip shards are the unit of read parallelism, so
    n_shards should be >= the reader's target parallelism.
    """
    key = shard_key or df.columns[0]
    (df.repartition(n_shards, F.xxhash64(F.col(key)))
       .write.mode("overwrite").option("compression", compression)
       .json(path))


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType = DOCUMENT_SCHEMA) -> DataFrame:
    """Schema-enforced JSONL read. Dirty lines land in CORRUPT_COL
    (PERMISSIVE mode) with every data column NULL — filter
    `is_corrupt(df)` to quarantine them; clean rows carry NULL there.
    """
    full = T.StructType(list(schema.fields)
                        + [T.StructField(CORRUPT_COL, T.StringType())])
    return (spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path))


def is_corrupt(df: DataFrame):
    """Predicate for quarantined lines. Spark refuses plans over raw
    JSON whose referenced columns are ONLY the corrupt-record column
    (an intentional guard since 2.3) — `df.cache()` first, or keep a
    data column in the projection, when isolating the quarantine set.
    """
    return F.col(CORRUPT_COL).isNotNull()


def clean(df: DataFrame) -> DataFrame:
    """Rows that parsed against the schema, corrupt column dropped."""
    return df.where(~is_corrupt(df)).drop(CORRUPT_COL)
