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


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with clustered layout for data skipping.

    Range-partition by ``sort_cols`` then sort within each partition
    before writing, so every output file — and every row group inside
    it — covers a narrow, non-overlapping range of the sort key.
    Parquet stores per-row-group min/max statistics; a reader's
    predicate on the sort key then skips whole row groups/files
    instead of scanning them. At 100 TB this is the difference
    between a point-lookup reading ~one row group and reading the
    table: the same trick as Z-ordering for the single-key case.

    ``repartitionByRange`` samples the key distribution, so files are
    balanced even under skew (a plain hash repartition would destroy
    the clustering this sink exists to create).
    """
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    clustered = df.repartitionByRange(parts, *sort_cols).sortWithinPartitions(
        *sort_cols
    )
    clustered.write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_file_mb: int = 512,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into few, large, optionally
    clustered files; returns the output file count.

    The small-files problem is operational, not theoretical: a
    streaming or per-batch writer leaves thousands of KB-scale files,
    and every later scan pays per-file open/footer/metadata cost
    (plus object-store request charges). Compaction = read → size the
    output file count from the actual input bytes → one shuffle →
    write. With ``sort_cols`` the rewrite also clusters (see
    :func:`write_sorted_parquet`), folding two maintenance passes
    into one.

    The file count is derived from input bytes on the driver via the
    filesystem — no data pass — so compaction cost is exactly one
    read + one shuffle + one write of the table. Remote URIs
    (hdfs://, s3a://, file://) are sized through the Hadoop
    FileSystem API; a plain local walk would silently report 0 bytes
    for them and funnel the whole table through one partition.
    """
    total_bytes, _ = _parquet_tree_stats(spark, in_path)
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(in_path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_files)
    df.write.mode("overwrite").parquet(out_path)
    return _parquet_tree_stats(spark, out_path)[1]


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed-table sink — the co-located
    join layout.

    ``bucketBy(n, key)`` hash-partitions rows into n buckets per
    write task and records the bucketing spec in the catalog. A later
    join or aggregation on the bucket key between tables bucketed the
    SAME way reads bucket i against bucket i directly: the exchange
    that dominates fact⋈fact joins disappears from the plan entirely
    (asserted in tests/test_sources.py::test_bucketed_join_elides_
    shuffle). With ``sort_cols`` each bucket file is also sorted, so
    a sort-merge join skips its sort too — the full co-location
    dividend.

    At 100 TB this is the standing answer to "this join shuffles
    400 TB every night": pay one bucketed write when the table lands,
    then every recurring join on that key is exchange-free. Bucket
    count is a layout decision: it bounds join parallelism, so size
    it to the cluster (e.g. 2-4x total cores), not to the data.

    Bucketing requires the table catalog (``saveAsTable``) — a plain
    ``.parquet(path)`` write cannot carry the bucket spec.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def _parquet_tree_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, file_count) over ``*.parquet`` files under
    ``path``. Schemed URIs go through the Hadoop FileSystem API —
    the same client Spark's scan uses, so hdfs:///s3a:// trees size
    correctly; bare paths use the local filesystem directly."""
    if "://" in path:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        files = fs.listFiles(hpath, True)
        total = count = 0
        while files.hasNext():
            st = files.next()
            if st.getPath().getName().endswith(".parquet"):
                total += st.getLen()
                count += 1
        return total, count
    import os as _os

    total = count = 0
    for root, _dirs, names in _os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                total += _os.path.getsize(_os.path.join(root, f))
                count += 1
    return total, count
