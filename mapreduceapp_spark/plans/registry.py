"""Central query registry — the engine's declared capability surface.

Every operator the engine supports is registered here as a named
query builder plus (where SQL-expressible) an ANSI-SQL oracle twin
that DuckDB can run over the same parquet bytes. This is the
machine-checkable analog of the reference's client contract: the
reference promises "reduce sees a complete key group"
(``MapReduceClient.h:61-64``); we promise "the DataFrame result
hash-matches an independent SQL engine".

Contract rules (enforced by tests/test_registry.py):
- every registered query is callable as ``builder(spark, sf_dir)``
  and returns a DataFrame;
- oracle column names/aliases match the Spark result exactly (the
  driver sorts columns by name before hashing);
- builders never ``collect()`` — results stay distributed.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: QueryBuilder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = True  # include in bench.py headline run


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import. Order follows SURVEY.md §7
# build phases; each module is self-contained.
_QUERY_MODULES = (
    "mapreduceapp_spark.operators.text",
    "mapreduceapp_spark.operators.relational",
    "mapreduceapp_spark.operators.joins",
    "mapreduceapp_spark.operators.windows",
    "mapreduceapp_spark.operators.semistructured",
    "mapreduceapp_spark.operators.temporal",
    "mapreduceapp_spark.operators.analytics",
    "mapreduceapp_spark.operators.curation",
    "mapreduceapp_spark.streaming.windows",
    "mapreduceapp_spark.streaming.latedata",
    "mapreduceapp_spark.streaming.stateful",
    "mapreduceapp_spark.plans.progress",
    "mapreduceapp_spark.operators.dedup",
    "mapreduceapp_spark.operators.similarity",
    "mapreduceapp_spark.operators.multimodal",
    "mapreduceapp_spark.operators.mapreduce",
    "mapreduceapp_spark.operators.llmprep",
    "mapreduceapp_spark.operators.clustering",
)


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = True,
) -> Callable[[QueryBuilder], QueryBuilder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Module not built yet (phased build) — skip, don't break
            # the already-registered surface.
            if e.name and e.name.startswith("mapreduceapp_spark"):
                continue
            raise


def all_queries() -> dict[str, QueryBuilder]:
    _load_all()
    return {name: q.builder for name, q in sorted(_REGISTRY.items())}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: q.oracle for name, q in sorted(_REGISTRY.items()) if q.oracle is not None
    }


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]


def bench_queries() -> dict[str, Query]:
    _load_all()
    return {name: q for name, q in sorted(_REGISTRY.items()) if q.bench}
