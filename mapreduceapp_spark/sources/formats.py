"""Multi-format sources and sinks (CSV / JSON-lines / in-memory / parquet).

The reference's one "source" is a client-built in-memory vector
(``MapReduceFramework.h:18-20``, ``SampleClient.cpp:72-79``) and its
one "sink" is a shared output vector (``MapReduceFramework.cpp:66-73``).
A 100 TB engine needs real formats with the right defaults, which is
what this module pins down:

- **parquet** is the primary interchange format (columnar, pushdown,
  page/rowgroup statistics) — everything else is ingress/egress.
- **CSV/JSON** readers take an explicit schema. Schema inference
  reads the data twice and silently guesses types — both are wrong
  at scale, so inference is opt-in, never the default.
- writers expose partitioning knobs (``partitionBy`` for directory
  layout / partition pruning; ``repartition`` for file count) because
  file-size hygiene — not query speed — is what makes a petabyte
  table usable downstream.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    infer: bool = False,
    **options: str,
) -> DataFrame:
    """CSV source with explicit schema (inference is opt-in).

    With a schema the scan is single-pass and malformed rows land in
    Spark's default PERMISSIVE null-handling; with ``infer=True``
    Spark reads the file twice — acceptable for ad-hoc exploration,
    never for a pipeline.
    """
    reader = spark.read.options(header=str(header).lower(), **options)
    if infer:
        return reader.option("inferSchema", "true").csv(path)
    return reader.schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    **options: str,
) -> DataFrame:
    """JSON-lines source with explicit schema (one doc per line).

    Explicit schema means one pass, typed columns, and unknown fields
    dropped instead of exploding the schema — the only sane contract
    for heterogeneous 100 TB JSON.
    """
    return spark.read.options(**options).schema(schema).json(path)


def from_rows(
    spark: SparkSession,
    rows: Iterable[tuple],
    schema: T.StructType | str,
) -> DataFrame:
    """In-memory source — the literal analog of the reference's
    client-built ``InputVec``. Driver-side by definition; used for
    tests and tiny dimension data, never for bulk."""
    return spark.createDataFrame(list(rows), schema)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with layout control.

    ``partition_by`` creates the hive-style directory layout that
    gives every downstream reader partition pruning for free;
    ``num_files`` repartitions first so output files are few and
    large (the small-files problem is the classic data-lake killer:
    at 100 TB, 10k × 10 GB files beat 10M × 10 MB files for every
    consumer, including the namenode).
    """
    if num_files is not None:
        df = df.repartition(num_files, *(partition_by or []))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """CSV egress sink (for downstream tools that require it)."""
    if num_files is not None:
        df = df.repartition(num_files)
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(
    spark: SparkSession,
    path: str,
    **options: str,
) -> DataFrame:
    """ORC source — the other columnar interchange format.

    Self-describing (schema travels with the file) and supports the
    same pushdown/pruning contract as parquet, so no explicit schema
    is demanded here. Included because real lakes are mixed: the
    engine reads whichever columnar format the upstream wrote.
    """
    return spark.read.options(**options).orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with the same layout knobs as :func:`write_parquet`."""
    if num_files is not None:
        df = df.repartition(num_files, *(partition_by or []))
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
