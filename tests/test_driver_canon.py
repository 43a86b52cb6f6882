"""Contract test replicating the DRIVER's pandas-based oracle check.

The in-tree replica (tests/oracle.py) compares DuckDB results via
``fetchall()`` — which converts HUGEINT to Python int and lists to
Python lists, masking two whole classes of driver failures observed
in round 1 (CORRECTNESS_r01.json):

1. dtype hash-mismatch: the driver materializes the oracle via
   ``duckdb .df()`` (pandas), where ``sum(BIGINT)`` is HUGEINT →
   float64, while Spark emits int64. Values identical, hash differs.
2. canonicalizer crash: the driver sorts the result frame with
   pandas ``sort_values`` over all columns, which raises
   ``TypeError: unhashable type: 'list'`` for top-level array/map
   columns.

This test runs every SQL-oracle query through the same pandas path:
Spark ``toPandas()`` vs DuckDB ``.df()``, columns sorted by name,
rows sorted via ``sort_values`` (so array columns crash here first),
and cells canonicalized WITHOUT int/float unification and WITHOUT
float rounding — the strictest plausible driver hash. Green here ⇒
the driver's value-hash cannot fail for dtype or schema-shape
reasons.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from mapreduceapp_spark.plans.registry import all_oracles, get_query
from tests.oracle import duck_connection

ORACLE_NAMES = sorted(all_oracles())


def _canon_frame(df: pd.DataFrame, engine: str, name: str) -> list[tuple]:
    """Columns sorted by name, rows sorted by values, cells tagged by
    numeric KIND (int vs float vs other) exactly as a dtype-sensitive
    pandas hash would see them. Raises (like the driver) if pandas
    cannot sort the frame — i.e. on array/map columns."""
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:  # pragma: no cover - failure path
        pytest.fail(
            f"{name}: {engine} result is not driver-sortable "
            f"(top-level array/map column?): {e}"
        )

    out = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(("null",))
            elif isinstance(v, (bool, np.bool_)):
                canon_row.append(("b", bool(v)))
            elif isinstance(v, (int, np.integer)):
                # int32 vs int64 unify (both repr as Python int) but
                # int vs float DOES NOT — that's the r01 failure mode.
                canon_row.append(("i", int(v)))
            elif isinstance(v, (float, np.floating)):
                # full precision, no rounding: the engine's contract
                # is bit-for-bit float equality with the oracle.
                canon_row.append(("f", repr(float(v))))
            elif isinstance(v, (pd.Timestamp, np.datetime64)):
                canon_row.append(("t", str(pd.Timestamp(v))))
            elif isinstance(v, (list, tuple, np.ndarray, dict)):
                pytest.fail(
                    f"{name}: {engine} emits a nested cell {type(v).__name__} "
                    f"— driver canonicalizer would crash"
                )
            else:
                canon_row.append(("s", str(v)))
        out.append(tuple(canon_row))
    out.sort()
    return out


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_driver_canon(spark, sf_dir, name):
    q = get_query(name)
    spark_pd = q.builder(spark, sf_dir).toPandas()

    con = duck_connection(sf_dir)
    try:
        oracle_pd = con.execute(q.oracle).df()
    finally:
        con.close()

    assert sorted(spark_pd.columns) == sorted(oracle_pd.columns), (
        f"{name}: column sets differ spark={sorted(spark_pd.columns)} "
        f"oracle={sorted(oracle_pd.columns)}"
    )
    assert len(spark_pd) == len(oracle_pd), (
        f"{name}: row count spark={len(spark_pd)} oracle={len(oracle_pd)}"
    )

    # dtype-kind compatibility per column: int-vs-float on opposite
    # sides is exactly the HUGEINT→float64 driver failure.
    for col in sorted(spark_pd.columns):
        sk = spark_pd[col].dtype.kind
        ok = oracle_pd[col].dtype.kind
        num = {"i", "u", "f"}
        if sk in num or ok in num:
            sk_f, ok_f = sk == "f", ok == "f"
            assert sk_f == ok_f, (
                f"{name}.{col}: numeric kind mismatch spark={spark_pd[col].dtype} "
                f"oracle={oracle_pd[col].dtype} — driver hash would fail "
                f"(wrap the oracle aggregate in CAST(... AS BIGINT)?)"
            )

    sc = _canon_frame(spark_pd, "spark", name)
    oc = _canon_frame(oracle_pd, "oracle", name)
    if sc != oc:
        diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
        pytest.fail(f"{name}: driver-canon value mismatch, first diffs: {diffs}")
