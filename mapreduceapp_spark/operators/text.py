"""Text-analysis queries over ``documents`` (SURVEY.md §2 B1/B2/B21, C4).

Reference grounding: the reference's one packaged application is a
character-frequency count (``SampleClient.cpp:32-66`` — map emits
(char, count) per string, reduce sums per char). ``q_charcount`` is
that exact query as a 4-line DataFrame plan; the rest of this module
is the same flatMap→group→aggregate shape at word granularity plus
the text-statistics operators the north star adds.

Scale notes (100 TB):
- explode(split(...)) is a generator inside whole-stage codegen; the
  shuffle that follows carries (token, partial-count) after partial
  aggregation (hash-aggregate map-side combine), so shuffle volume
  is O(distinct tokens per partition), not O(total tokens).
- char/token key spaces are small and uniform → no skew handling
  needed; the inverted index shuffles O(postings) which is the
  output size, i.e. irreducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.functions.text import TOKEN_SPLIT_RE, chars, tokens
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables


@register(
    "q_charcount",
    oracle="""
        SELECT c, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, '')) AS c FROM documents)
        WHERE c <> ''
        GROUP BY c
    """,
    doc="Flagship: per-character frequency count (reference SampleClient.cpp:32-66).",
)
def q_charcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(chars("text")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_wordcount",
    oracle=f"""
        SELECT w, count(*) AS cnt
        FROM (
            SELECT unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS w
            FROM documents
        )
        WHERE w <> ''
        GROUP BY w
    """,
    doc="Canonical MapReduce word count at word granularity (B2).",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "q_inverted_index",
    oracle=f"""
        SELECT w, list_sort(list(DISTINCT doc_id)) AS postings
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}')) AS w
            FROM documents
        )
        WHERE w <> ''
        GROUP BY w
    """,
    doc="Inverted index: token -> sorted distinct posting list (B21).",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical MapReduce query #2 (map emits (word, doc_id); reduce
    concatenates). Spark shape: explode + groupBy + collect_set.

    Scale: collect_set keys by token; the posting list for a stopword
    can be huge at 100 TB — a production variant would bucket postings
    (token, bucket) and store segmented lists. Documented tradeoff;
    here tokens are synthetic and bounded.
    """
    t = tables(spark, sf_dir)
    return (
        t.documents.select(
            F.col("doc_id"), F.explode(tokens("text")).alias("w")
        )
        .groupBy("w")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("postings"))
    )


@register(
    "q_text_stats",
    oracle=f"""
        SELECT lang,
               count(*) AS n_docs,
               sum(len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                                   x -> x <> ''))) AS total_tokens,
               round(avg(length(text)), 4) AS avg_chars,
               max(length(text)) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    doc="Text statistics per language: token counts, length stats (C4).",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics — the text-analysis profile a
    training-data pipeline runs first.

    All JVM-side; one shuffle keyed by lang (tiny cardinality), with
    map-side partial aggregation so the shuffle carries one row per
    (partition, lang).
    """
    t = tables(spark, sf_dir)
    return (
        t.documents.select(
            "lang",
            F.size(tokens("text")).alias("ntok"),
            F.length("text").alias("nchar"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("nchar"), 4).alias("avg_chars"),
            F.max("nchar").alias("max_chars"),
        )
    )
