"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its ANSI-SQL twin over the same
parquet files and asserts row-count / column-name / value equality
(order-insensitive, float-tolerant). Keeping this in-tree means a
failing driver check is reproducible with plain pytest.
"""

from __future__ import annotations

import math
import os

import duckdb

from mapreduceapp_spark.plans.registry import get_query
from mapreduceapp_spark.sources.parquet import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if v is None:
        return ("<null>",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", round(v, 6))
    if isinstance(v, (list, tuple)):
        return ("a",) + tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return ("m",) + tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return (type(v).__name__[:1], str(v))


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark, name: str, sf_dir: str) -> None:
    q = get_query(name)
    assert q.oracle is not None, f"{name} has no oracle (rows-only)"
    sdf = q.builder(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duck_connection(sf_dir)
    try:
        res = con.execute(q.oracle)
        ocols = [d[0] for d in res.description]
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    sc, oc = _canon_rows(scols, srows), _canon_rows(ocols, orows)
    if sc != oc:
        diff = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
