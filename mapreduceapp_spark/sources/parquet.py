"""Parquet table loading for the driver's star schema.

Replaces the reference's in-memory ``InputVec`` source
(``MapReduceFramework.h:18-20``, consumed at
``MapReduceFramework.cpp:88-95``) with lazy columnar scans.

Scale notes (100 TB posture):
- ``spark.read.parquet`` is lazy; Catalyst pushes predicates and
  prunes columns into the scan (visible as ``PushedFilters`` /
  ``ReadSchema`` in ``.explain``), so a query touching 2 of 16
  columns reads 2 column chunks, not the table.
- No caching by default: at 100 TB the working set never fits, and
  the parquet scan + pushdown is the cheap path. Callers that reuse
  a small dim table across queries may ``.cache()`` explicitly.
- Partition discovery: a production deployment would point these at
  date-partitioned directories; partition pruning then composes with
  the same code path for free.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# The driver's table set (TESTDATA.md); one parquet file per table.
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table under ``sf_dir``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


@dataclass
class Tables:
    """Lazy namespace of the star-schema tables for one scale factor.

    Each attribute access builds a fresh lazy scan; nothing is read
    until an action runs. Keeps query-builder code close to SQL:
    ``t.lineitem.filter(...)``.
    """

    spark: SparkSession
    sf_dir: str
    _cache: dict = field(default_factory=dict)

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]


def tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)
