"""Training-data curation operators: deterministic dataset splitting
and token-budget sequence packing (SURVEY.md §2.C family).

The reference has no notion of dataset curation (its pipeline ends at
``reduce`` output, ``MapReduceFramework.cpp:202-225``); these extend
the LLM-pipeline surface (C-family) with the two bookkeeping steps
every large-scale training corpus needs between "documents" and
"batches": which split does a document belong to, and which packed
context window does it land in.

Scale notes (100 TB):
- ``q_sample_split`` is *map-only*: a content-keyed hash bucket per
  row, zero shuffles, scan throughput. Hash-of-id splitting (rather
  than random() or row position) is what makes splits stable under
  repartitioning, backfills, and re-runs — the split of a document
  never changes when the corpus around it does.
- ``q_pack_sequences`` packs within hash shards, so the cumulative-sum
  window parallelizes across shards (shard count scales with the
  cluster; packing quality is per-shard and unaffected). One shuffle,
  keyed by shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduceapp_spark.operators.text import BPE_TOKEN_RE
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

# Split fractions in bucket points (out of 100): train 80 / val 10 / test 10.
TRAIN_CUT, VAL_CUT = 80, 90


def hash_bucket(key: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic cross-engine bucket in [0, buckets) from a key.

    sha2-256 of the (salted) key string, then the first three hex
    chars combined via their ascii codes. Both halves are chosen for
    bit-identical twins in DuckDB: ``sha2(s, 256) ≡ sha256(s)`` and
    ``ascii ≡ ascii`` (verified in functions/numeric.py's oracle
    conventions); hex-string→int parsing (Spark ``conv``) has no
    DuckDB twin, so the bucket is derived arithmetically from char
    codes instead. 3 hex chars = 4096 equiprobable values — uniform
    to ±2.5% at buckets=100, plenty for split assignment.

    The salt gives independent bucketings (e.g. split assignment vs
    ablation sampling) from the same key.
    """
    h = F.sha2(F.concat(F.lit(salt), key.cast("string")), 256)
    code = (
        F.ascii(F.substring(h, 1, 1)) * 31 + F.ascii(F.substring(h, 2, 1))
    ) * 31 + F.ascii(F.substring(h, 3, 1))
    return code % buckets


def oracle_hash_bucket(key: str, buckets: int = 100, salt: str = "") -> str:
    h = f"sha256(concat('{salt}', CAST({key} AS VARCHAR)))"
    return (
        f"((ascii(({h})[1:1])*31 + ascii(({h})[2:2]))*31 "
        f"+ ascii(({h})[3:3])) % {buckets}"
    )


@register(
    "q_sample_split",
    oracle=f"""
        SELECT doc_id, lang,
               {oracle_hash_bucket('doc_id')} AS bucket,
               CASE WHEN {oracle_hash_bucket('doc_id')} < {TRAIN_CUT} THEN 'train'
                    WHEN {oracle_hash_bucket('doc_id')} < {VAL_CUT} THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN {oracle_hash_bucket('doc_id', 10, 'ablate:')} = 0
                    THEN 1 ELSE 0 END AS in_ablation
        FROM documents
    """,
    doc="Deterministic hash-bucket train/val/test split + 10% ablation flag.",
)
def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-keyed dataset splitting: every document lands in
    train/val/test by a hash of its id (80/10/10), plus an
    independent 10% ablation-sample flag from a salted second hash.

    This is the split discipline large corpora need: assignment is a
    pure function of the document id, so it is identical on every
    executor, every run, and every subset of the data — no
    ``rand()`` (unstable under retries), no row position (unstable
    under repartitioning). Map-only, no shuffle; at 100 TB this runs
    at scan speed and composes under pushdown (filtering one split
    prunes nothing at the scan, but downstream operators see a
    consistent ~80% sample forever).
    """
    t = tables(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"))
    return t.documents.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < TRAIN_CUT, "train")
        .when(b < VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
        F.when(hash_bucket(F.col("doc_id"), 10, "ablate:") == 0, 1)
        .otherwise(0)
        .alias("in_ablation"),
    )


PACK_BUDGET = 1024  # context-window token budget per packed sequence
PACK_SHARDS = 8  # independent packing streams; scale with the cluster


@register(
    "q_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   doc_id % {PACK_SHARDS} AS shard,
                   len(regexp_extract_all(lower(text), '{BPE_TOKEN_RE}')) AS ntok
            FROM documents
        ), placed AS (
            SELECT shard, doc_id, ntok,
                   CAST(floor(
                       (sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) - ntok)
                       / {PACK_BUDGET}) AS BIGINT) AS bin
            FROM toks
        )
        SELECT shard, bin,
               count(*) AS n_docs,
               sum(ntok) AS bin_tokens,
               min(doc_id) AS first_doc,
               max(doc_id) AS last_doc
        FROM placed GROUP BY shard, bin
    """,
    doc="Token-budget sequence packing: concat-and-chunk bin assignment per shard.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: documents are concatenated
    in id order within a shard and chunked every PACK_BUDGET tokens;
    a document's bin is the context window its *starting offset*
    falls in (concat-and-chunk semantics — the standard pretraining
    packing, where a document may straddle a boundary).

    Shape: token counts are a map-only regexp over the scan; the
    running offset is one window sum per shard (ROWS frame, not
    RANGE — stated explicitly on both engines since their defaults
    differ); the bin summary reuses the shard partitioning, so the
    whole thing is a single shuffle keyed by shard. Shards bound the
    sequential dependency: packing is embarrassingly parallel across
    PACK_SHARDS streams, and at 100 TB you raise PACK_SHARDS to the
    write parallelism you want — bins are per-shard, so quality is
    unaffected.
    """
    t = tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.regexp_count(F.lower("text"), F.lit(BPE_TOKEN_RE)).alias("ntok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "bin",
        F.floor((F.sum("ntok").over(w) - F.col("ntok")) / PACK_BUDGET),
    )
    return placed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ntok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
