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
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as parquet TIMESTAMP(NANOS) in ``path``.

    Spark's parquet reader rejects nanosecond timestamps outright
    (PARQUET_TYPE_ILLEGAL); the escape hatch is the session conf
    ``spark.sql.legacy.parquet.nanosAsLong`` which surfaces them as
    raw int64 nanos. We detect such columns from the file footer
    (one driver-side metadata read, cached) and convert back to
    proper timestamps after the scan.
    """
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    try:
        schema = pq.read_schema(path)
    except Exception:
        return ()
    return tuple(
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table under ``sf_dir``.

    Two timestamp normalizations happen here so every downstream
    operator sees one canonical type (TIMESTAMP, session tz pinned
    UTC at session.py:69):

    - Nanosecond-timestamp columns (historical testdata format) are
      read as int64 nanos and converted to microsecond timestamps
      JVM-side (``timestamp_micros``), floor-dividing like every
      micros-capped consumer does.
    - TIMESTAMP_NTZ columns are cast to TIMESTAMP. The testdata
      stores tz-naive ``timestamp[us]``, which Spark 4.x may infer
      as TIMESTAMP_NTZ depending on session/reader settings we do
      NOT control (the driver hands us its session). NTZ breaks
      ``unix_micros`` and ``withWatermark`` at analysis time; with
      the session tz pinned UTC the cast is value-preserving, so
      normalizing here keeps every consumer agnostic to the
      inference drift. Both repairs stay narrow, codegen'd
      projections on top of the pushdown-capable scan.
    """
    from pyspark.sql.types import TimestampNTZType, TimestampType

    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_ts_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer `div`, not `/`: float division of int64 nanos loses
        # precision above 2^53 and rounds the last microsecond digit
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    ntz_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    if ntz_cols:
        # The naive wall-clocks in the files are UTC instants (the
        # oracle's epoch_us assumes exactly that). A bare NTZ->LTZ
        # cast interprets the wall-clock in the SESSION tz, so it is
        # only value-preserving when that tz is UTC; for any other
        # session tz, rebase the wall-clock first so the resulting
        # instant is still the-naive-time-as-UTC.
        tz = spark.conf.get("spark.sql.session.timeZone", "UTC")
        for c in ntz_cols:
            col = F.col(c)
            if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
                col = F.convert_timezone(F.lit("UTC"), F.lit(tz), col)
            df = df.withColumn(c, col.cast(TimestampType()))
    return df


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
