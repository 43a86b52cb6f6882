"""UDF surface: generic map/reduce harness, pandas UDFs (SURVEY.md §7 P6)."""

from __future__ import annotations

import pandas as pd

from tests.oracle import assert_matches_oracle


def test_mr_charcount_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_mr_charcount", sf_dir)


def test_udf_path_agrees_with_codegen_path(spark, sf_dir):
    """The reference's client API re-expressed as pandas UDFs must
    compute exactly what the built-in DataFrame pipeline computes."""
    from mapreduceapp_spark.plans.registry import get_query

    udf = {tuple(r) for r in get_query("q_mr_charcount").builder(spark, sf_dir).collect()}
    builtin = {
        tuple(r) for r in get_query("q_charcount").builder(spark, sf_dir).collect()
    }
    assert udf == builtin


def test_udf_quality_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_udf_quality", sf_dir)


def test_generic_harness_wordcount(spark):
    """run_mapreduce on ad-hoc data: the emit2/emit3 contract
    (map emits 0..n rows; reduce sees the complete group)."""
    from mapreduceapp_spark.operators.mapreduce import run_mapreduce

    df = spark.createDataFrame(
        [("spark maps",), ("spark reduces",), ("",)], ["line"]
    )

    def map_words(pdf: pd.DataFrame) -> pd.DataFrame:
        words = [w for line in pdf["line"] for w in line.split()]
        return pd.DataFrame({"w": words, "one": [1] * len(words)})

    def reduce_words(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w": [g["w"].iloc[0]], "cnt": [int(g["one"].sum())]})

    out = run_mapreduce(
        df, map_words, "w string, one long", ["w"], reduce_words, "w string, cnt long"
    )
    assert {tuple(r) for r in out.collect()} == {
        ("spark", 2),
        ("maps", 1),
        ("reduces", 1),
    }


def test_mr_charcount_golden(spark, tmp_path):
    """F-CHARCOUNT through the generic UDF harness: the reference
    sample client's exact inputs (/root/reference/SampleClient.cpp:74-76)
    must produce the contract-specified counts a:4 b:3 v:2 d:7 j:6
    (FIXTURES.md) — pinning run_mapreduce the same way the codegen
    path is pinned by tests/test_text.py::test_charcount_golden."""
    docs = spark.createDataFrame(
        [(1, "aaabbvvab"), (2, "dddjjj"), (3, "jjjdddd")], ["doc_id", "text"]
    )
    sf_dir = str(tmp_path)
    docs.write.parquet(f"{sf_dir}/documents.parquet")

    from mapreduceapp_spark.plans.registry import get_query

    out = get_query("q_mr_charcount").builder(spark, sf_dir)
    got = {r["c"]: r["cnt"] for r in out.collect()}
    assert got == {"a": 4, "b": 3, "v": 2, "d": 7, "j": 6}
