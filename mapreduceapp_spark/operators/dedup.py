"""Deduplication operators over ``documents`` (SURVEY.md §2.C — C1/C2).

The reference's model covers exact dedup directly (K2 = whole row,
reduce emits once — the B4 distinct construction); near-dup detection
is a north-star addition for the LLM-data-pipeline surface.

Four operators, smallest to largest hammer:
- ``q_exact_dedup``     — content-hash groupBy (exact duplicates).
- ``q_ngram_jaccard``   — exact shingle-Jaccard pairs via an
                          inverted-index self-join (no cross join).
- ``q_minhash_neardup`` — MinHash signatures + banded LSH candidate
                          generation, then exact-Jaccard verification.
- ``q_simhash_neardup`` — 64-bit SimHash + pigeonhole band join for
                          hamming-distance ≤ 3 pairs.

Scale posture (100 TB):
- exact dedup shuffles (hash, doc) — one shuffle, key space = distinct
  contents; hash keys are uniform, no skew.
- the inverted-index Jaccard join's enemy is high-document-frequency
  shingles (a stopword shingle pairs everything with everything). The
  LSH and SimHash paths exist precisely because of that: their shuffle
  keys are (band, band-hash) / (band, band-bits) whose fan-out per key
  is bounded by design. A production exact-Jaccard would cap shingle
  document frequency first; at bench scale the corpus is bounded, so
  the exact join is the oracle-checkable ground truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceapp_spark.functions.text import shingles
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

SHINGLE_K = 5
JACCARD_THRESHOLD = 0.8  # the data's pair distribution is bimodal: ≤0.31 / ≥0.93

# MinHash: 64 permutations = 16 bands × 4 rows. For true Jaccard j the
# candidate probability is 1-(1-j^4)^16: ≈1-3e-10 at j=.93 (the data's
# near-dup cluster), ≈14% at j=.31 (top of the background cluster) —
# and false candidates are removed by exact verification, so the final
# output equals the exact-Jaccard result with failure probability
# ~1e-9. That is why this query can carry the same SQL oracle as
# q_ngram_jaccard.
MINHASH_PERMS = 64
LSH_BANDS = 16
LSH_ROWS = MINHASH_PERMS // LSH_BANDS

SIMHASH_BITS = 64
SIMHASH_MAX_HAMMING = 3
SIMHASH_BANDS = SIMHASH_MAX_HAMMING + 1  # pigeonhole: ≥1 band equal


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tables(spark, sf_dir).documents
    return d.select("doc_id", shingles("text", SHINGLE_K).alias("sh"))


@register(
    "q_exact_dedup",
    oracle="""
        SELECT sha256(text) AS content_hash,
               min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY content_hash
    """,
    doc="Exact dedup: sha256 content hash, keep lowest doc_id per group (C1).",
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash.

    This is the B4 distinct construction (K2 = content) with a
    64-hex-char key instead of the full text, so the shuffle carries
    32 bytes + ids per row rather than document bodies — the standard
    100 TB trick. One shuffle, uniform keys, map-side partial agg.
    """
    d = tables(spark, sf_dir).documents
    return (
        d.select(F.sha2(F.col("text").cast("binary"), 256).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


_ORACLE_EXACT_JACCARD = f"""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, greatest(length(lower(text)) - {SHINGLE_K - 1}, 1)),
                       i -> lower(text)[i:i+{SHINGLE_K - 1}])) AS s
            FROM documents
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS inter,
                   len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS uni
            FROM sh a, sh b
            WHERE a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, inter, uni, round(inter::DOUBLE / uni, 4) AS jac
        FROM pairs
        WHERE inter::DOUBLE / uni >= {JACCARD_THRESHOLD}
"""


def _exact_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs via inverted-index self-join.

    Shape: explode distinct shingles → self-join on shingle (equi
    join, shuffle keyed by shingle) → count co-occurrences = |A∩B| →
    join per-doc shingle counts → |A∪B| = |A|+|B|−|A∩B|. All integer
    math; the only double is the final ratio (deterministic: one
    division of exact ints), so the threshold cut is engine-stable.
    """
    sh = _doc_shingles(spark, sf_dir)
    counts = sh.select("doc_id", F.size("sh").alias("n_sh"))
    posting = sh.select("doc_id", F.explode("sh").alias("s"))
    co = (
        posting.alias("a")
        .join(posting.alias("b"), ["s"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    j = (
        co.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .withColumn("jacc", F.col("inter").cast("double") / F.col("uni"))
    )
    return j.filter(F.col("jacc") >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", "inter", "uni", F.round("jacc", 4).alias("jac")
    )


@register(
    "q_ngram_jaccard",
    oracle=_ORACLE_EXACT_JACCARD,
    doc="Exact character-5-gram Jaccard near-dup pairs (C2 ground truth).",
    # bench=False: the exact posting-list self-join is O(sum df(s)^2)
    # — on this corpus's tiny shared vocabulary a stopword-like
    # shingle pairs nearly every doc with every other, which is the
    # textbook blow-up MinHash-LSH exists to avoid. It stays as the
    # sf0.01 correctness ground truth; q_minhash_neardup is the
    # benched, scale-shaped path computing the same answer.
    bench=False,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _exact_jaccard_pairs(spark, sf_dir)


def _minhash_signature_cols(sh_col: Column) -> list[Column]:
    """64 min-hash values of a shingle array.

    Permutation i is simulated by xxhash64(i, shingle); the signature
    element is the min over the doc's shingles — all inside Spark
    higher-order functions (JVM codegen), no Python. The per-doc cost
    is |shingles|·64 hashes; at 100 TB this is the map-side work that
    replaces an O(N²) comparison, which is the whole point of MinHash.
    """
    return [
        F.array_min(
            F.transform(sh_col, lambda s, i=i: F.xxhash64(F.lit(i), s))
        ).alias(f"mh_{i}")
        for i in range(MINHASH_PERMS)
    ]


@register(
    "q_minhash_neardup",
    # LSH misses a true ≥0.8 pair with prob ~1e-9 at this corpus's pair
    # distribution (see MINHASH_PERMS note) and false candidates are
    # exactly verified away, so the output equals the exact-Jaccard
    # query and can share its oracle.
    oracle=_ORACLE_EXACT_JACCARD,
    doc="MinHash + banded LSH candidates, exact-Jaccard verified (C2).",
)
def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash-LSH, the 100 TB-shaped path.

    Stages:
    1. signature: per doc, 64 minhashes (map-only, no shuffle);
    2. banding: 16 bands of 4 rows; band key = xxhash64 of the band's
       rows; explode to (band_id, band_key, doc_id) — shuffle keyed by
       (band_id, band_key), whose groups are tiny by construction;
    3. candidates: same-bucket pairs, distinct;
    4. verification: join candidates back to shingle sets, exact
       Jaccard filter (array_intersect on the two docs only — no
       posting-list join).

    Contrast with q_ngram_jaccard: that shuffles the full posting
    list (O(total shingles) rows, skew-prone); this shuffles one row
    per (doc, band) — 16 rows per doc regardless of document size.
    """
    sh = _doc_shingles(spark, sf_dir)
    sig = sh.select("doc_id", *_minhash_signature_cols(F.col("sh")))
    band_entries = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            *[F.col(f"mh_{b * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                        ).alias("band_key"),
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    cand = (
        band_entries.alias("a")
        .join(band_entries.alias("b"), ["band_id", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "uni", F.size("sh_a") + F.size("sh_b") - F.col("inter")
        )
        .withColumn("jacc", F.col("inter").cast("double") / F.col("uni"))
        .filter(F.col("jacc") >= JACCARD_THRESHOLD)
    )
    return verified.select(
        "doc_a", "doc_b", "inter", "uni", F.round("jacc", 4).alias("jac")
    )


def _simhash(doc_tokens: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from token multiset.

    Classic Charikar scheme: each token votes ±1 on each bit of its
    64-bit hash; the fingerprint's bit b is 1 iff the vote sum is
    positive. Implemented as (doc, bit, vote) rows — the 64× fan-out
    happens on *distinct (doc, token) pairs weighted by count*, stays
    JVM-side, and aggregates with map-side combine; at 100 TB this is
    one wide-but-cheap shuffle keyed by (doc, bit).
    """
    tok_hash = doc_tokens.select(
        "doc_id", F.col("cnt"), F.xxhash64("tok").alias("h")
    )
    votes = tok_hash.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
                lambda b: F.when(
                    F.call_function("shiftright", F.col("h"), b).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    F.col("cnt"),
                ).otherwise(-F.col("cnt")),
            )
        ).alias("bit", "vote"),
    )
    bit_sums = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("v"))
    return bit_sums.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("v") > 0,
                F.call_function("shiftleft", F.lit(1).cast("long"), F.col("bit")),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


@register(
    "q_simhash_neardup",
    oracle=None,  # xxhash64-dependent fingerprints — not SQL-reproducible;
    # correctness pinned by tests/test_dedup.py (dup docs ⇒ hamming 0,
    # banded join ≡ brute-force hamming scan).
    doc="SimHash near-dup pairs (hamming ≤ 3) via pigeonhole band join (C2).",
)
def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with a scale-safe banded join.

    Pigeonhole: if hamming(a,b) ≤ 3, then splitting the 64 bits into
    4 bands of 16 leaves at least one band identical. So candidates =
    pairs agreeing on (band_id, band_bits) — an equi-join — then the
    exact hamming filter. Exactly the brute-force result, never an
    O(N²) comparison. (Tested equivalent to the brute-force scan.)
    """
    from mapreduceapp_spark.functions.text import tokens

    d = tables(spark, sf_dir).documents
    doc_tokens = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fp = _simhash(doc_tokens)
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    bands = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(
                        F.col("simhash"), b * band_bits
                    ).bitwiseAND(F.lit((1 << band_bits) - 1))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_bits"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "band_bits"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )
