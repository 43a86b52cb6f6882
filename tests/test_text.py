"""Text-operator tests: golden reference parity + DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle


def test_charcount_golden(spark, tmp_path):
    """F-CHARCOUNT: the reference sample client's exact inputs
    (/root/reference/SampleClient.cpp:74-76) must produce the
    contract-specified counts a:4 b:3 v:2 d:7 j:6 (FIXTURES.md)."""
    docs = spark.createDataFrame(
        [(1, "aaabbvvab"), (2, "dddjjj"), (3, "jjjdddd")], ["doc_id", "text"]
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")

    from mapreduceapp_spark.plans.registry import get_query

    out = get_query("q_charcount").builder(spark, sf_dir)
    got = {r["c"]: r["cnt"] for r in out.collect()}
    assert got == {"a": 4, "b": 3, "v": 2, "d": 7, "j": 6}


@pytest.mark.parametrize(
    "name",
    [
        "q_charcount", "q_wordcount", "q_inverted_index", "q_text_stats",
        "q_text_normalize", "q_inverted_index_salted",
        "q_inverted_index_segmented",
    ],
)
def test_text_oracle(spark, sf_dir, name):
    assert_matches_oracle(spark, name, sf_dir)


def test_inverted_index_segmented_bounds_hot_token(spark, tmp_path):
    """Planted hot token (VERDICT r7 ask #3): a token in 2,000
    documents must come back as ~df/SEG_TARGET segments, every
    segment within the SEG_BOUND hard cap, and the segments must
    reassemble to exactly the full posting set."""
    from mapreduceapp_spark.operators.text import SEG_BOUND, SEG_TARGET
    from mapreduceapp_spark.plans.registry import get_query

    n_hot = 2000
    rows = [(i, "hot filler%d" % (i % 7)) for i in range(n_hot)]
    rows += [(n_hot + j, "rare%d only" % j) for j in range(5)]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        f"{sf_dir}/documents.parquet"
    )

    out = get_query("q_inverted_index_segmented").builder(spark, sf_dir)
    segs = [r for r in out.collect() if r["w"] == "hot"]
    assert len(segs) == -(-n_hot // SEG_TARGET)  # ceil(df / SEG_TARGET)
    sizes = [len(r["postings"].split(",")) for r in segs]
    assert max(sizes) <= SEG_BOUND, max(sizes)
    reassembled = sorted(
        int(x) for r in segs for x in r["postings"].split(",")
    )
    assert reassembled == list(range(n_hot))
    # single-posting tokens still land in exactly one bucket, bucket 0
    rare = [r for r in out.collect() if r["w"] == "only"]
    assert len(rare) == 1 and rare[0]["bucket"] == 0


def test_inverted_index_segmented_plan_shape(spark, sf_dir):
    """Pin the executed plan the builder was tuned to (round 8): the
    distinct-pair exchange must be REUSED for the df aggregate (one
    pair shuffle feeds both sides of the join), and the vocabulary
    dimension must reach the pair stream as a broadcast join — a
    regression to two scans or a sort-merge join would double the
    shuffle volume at scale."""
    from mapreduceapp_spark.plans.registry import get_query

    df = get_query("q_inverted_index_segmented").builder(spark, sf_dir)
    df.collect()  # AQE finalizes the physical plan at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, "df aggregate re-scans instead of reusing"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_inverted_index_salted_equals_unsalted_and_is_two_phase(spark, sf_dir):
    """The salted build must produce the identical index row-for-row,
    and its physical plan must actually carry the two-phase shape —
    two hash aggregates keyed differently (token+salt, then token) —
    rather than silently collapsing to the plain single-phase plan."""
    from mapreduceapp_spark.plans.registry import get_query

    plain = get_query("q_inverted_index").builder(spark, sf_dir)
    salted = get_query("q_inverted_index_salted").builder(spark, sf_dir)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    phys = salted._jdf.queryExecution().executedPlan().toString()
    assert phys.count("__salt") >= 1, "salt column missing from the plan"


def test_text_normalize_golden(spark, tmp_path):
    """Normalization semantics on a crafted doc: case folding,
    punctuation/symbol runs to one space, collapsed whitespace,
    trimmed ends."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, "  Hello,   WORLD!! x2 --- done.  "), (2, "!!!")],
        "doc_id bigint, text string",
    ).write.parquet(f"{sf_dir}/documents.parquet")

    from mapreduceapp_spark.plans.registry import get_query

    rows = {
        r["doc_id"]: r
        for r in get_query("q_text_normalize").builder(spark, sf_dir).collect()
    }
    import hashlib

    want = "hello world x2 done"
    assert rows[1]["clean_len"] == len(want)
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["norm_md5"] == hashlib.md5(want.encode()).hexdigest()
    assert rows[2]["clean_len"] == 0 and rows[2]["n_tokens"] == 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"c", "cnt"}


def test_vocab_stats_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_vocab_stats", sf_dir)


def test_vocab_stats_invariants(spark, sf_dir):
    """hapax <= vocab <= total_tokens, and ttr is their exact ratio."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_vocab_stats").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hapax <= r.vocab <= r.total_tokens
        assert r.ttr == r.vocab / r.total_tokens


def test_fuzzy_match_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_fuzzy_match", sf_dir)


def test_fuzzy_match_blocking_is_complete(spark, sf_dir):
    """The deletion-neighborhood candidates must contain every true
    pair: compare against brute-force levenshtein over the distinct
    name dictionary."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from mapreduceapp_spark.operators.text import FUZZY_MAX_DIST
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    got = {
        (r.name_a, r.name_b)
        for r in get_query("q_fuzzy_match").builder(spark, sf_dir).collect()
    }
    names = sorted(
        r.p_name
        for r in tables(spark, sf_dir).part.select("p_name").distinct().collect()
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    want = {
        (a, b) for a, b in combinations(names, 2) if lev(a, b) <= FUZZY_MAX_DIST
    }
    assert got == want


def test_winnowing_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_winnowing", sf_dir)


def test_winnowing_contamination_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_winnowing_contamination", sf_dir)


def test_winnowing_contamination_catches_detokenized_leak(spark, tmp_path):
    """The case token n-grams miss: a probe passage leaked into a
    training doc with its whitespace collapsed. Token 8-grams see
    different tokens entirely; a >=23-char shared run of the
    UNCHANGED region must still fingerprint-match."""
    import os

    from mapreduceapp_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        q_winnowing_contamination,
    )

    run = "thequickbrownfoxesjumpoverthesleepydogs"  # 39 > K+W-1 chars
    assert len(run) >= WINNOW_K + WINNOW_W - 1
    probe_doc = f"benchmark question: {run} answer follows here"
    leaked = f"scraped page prefix {run} trailing boilerplate text"
    clean = "0123456789" * 12  # disjoint alphabet: no shared 16-gram
    df = spark.createDataFrame(
        # doc_id % 7 == 0 → probe split
        [(0, probe_doc), (8, leaked), (9, clean)],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r.doc_id: r.n_fp_overlap
           for r in q_winnowing_contamination(spark, sf).collect()}
    assert 8 in got and got[8] >= 1
    assert 9 not in got


def test_winnowing_guarantee_and_selectivity(spark, tmp_path):
    """The published winnowing guarantee, planted: two docs sharing a
    run >= WINNOW_K + WINNOW_W - 1 chars must share a selected
    fingerprint; with >= WINNOW_MIN_SHARED independent shared runs
    the pair surfaces. Unrelated docs (disjoint alphabets => no
    shared 16-gram can exist) never pair."""
    from mapreduceapp_spark.operators.text import (
        WINNOW_K,
        WINNOW_MIN_SHARED,
        WINNOW_W,
        winnow_fingerprint_pairs,
    )

    run_len = WINNOW_K + WINNOW_W - 1
    # four independent shared runs, separated by per-doc filler
    runs = [
        "".join(chr(ord("a") + (i + 7 * r) % 26) for i in range(run_len))
        for r in range(WINNOW_MIN_SHARED)
    ]
    doc1 = "xq".join(runs) + "xqzv" * 20
    doc2 = "mw".join(runs) + "mwkc" * 20
    doc3 = "0189" * 40  # digits only: disjoint from doc1/doc2 grams
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3)], "doc_id long, text string"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    df.write.parquet(os.path.join(sf, "documents.parquet"))
    pairs = {
        (r.doc_a, r.doc_b, r.shared_fps >= WINNOW_MIN_SHARED)
        for r in winnow_fingerprint_pairs(spark, sf).collect()
    }
    assert pairs == {(1, 2, True)}


def test_winnow_fps_gemm_equals_codegen(spark, sf_dir):
    """The WINNOW_GEMM_MIN_DOCS regime gate swaps plans, never
    answers: the batched rolling-hash kernel must emit the identical
    (doc_id, fp) set as the codegen HOF form — over the corpus
    fixture AND an adversarial frame (non-BMP unicode where a utf-16
    decode would diverge on surrogate pairs, empty/short docs, a doc
    exactly at the K+W boundary)."""
    from mapreduceapp_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        _winnow_fps_gemm,
        winnow_fingerprints,
    )
    from mapreduceapp_spark.sources import tables

    docs = tables(spark, sf_dir).documents
    a = sorted(map(tuple, winnow_fingerprints(docs).collect()))
    b = sorted(map(tuple, _winnow_fps_gemm(docs).collect()))
    assert a == b and a

    edge = spark.createDataFrame(
        [
            (1, "aé\U0001F600z" * 10),
            (2, ""),
            (3, "short"),
            (4, "x" * (WINNOW_K + WINNOW_W - 1)),
            (5, "Ünïcødé-" * 8),
            (6, "y" * (WINNOW_K + WINNOW_W - 2)),  # one gram short of a window
        ],
        "doc_id long, text string",
    )
    ea = sorted(map(tuple, winnow_fingerprints(edge).collect()))
    eb = sorted(map(tuple, _winnow_fps_gemm(edge).collect()))
    assert ea == eb and ea
