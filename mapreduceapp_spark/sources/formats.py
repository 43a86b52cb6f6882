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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mapreduceapp_spark.plans.hints import broadcast_if_small


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


def zorder_value(df: DataFrame, cols: list[str], bits: int = 6) -> DataFrame:
    """Append ``_z``: the Morton (Z-curve) interleave of the given
    columns' rank-bucket indices.

    Each column is first normalized to a ``2^bits``-bucket rank index
    via its approximate quantiles (one sampling pass per column —
    the same statistics ``repartitionByRange`` gathers; quantile
    normalization, not min/max scaling, so skewed distributions still
    fill all buckets). The bucket index is computed as a BINARY
    SEARCH over the literal cut array — ``bits`` chained
    ``element_at`` comparisons, each a named intermediate column so
    no subexpression duplicates. (The naive 2^bits-term comparison
    sum compiles to >64 KB of Java at bits=8 and kicks the whole
    stage out of codegen; an ``aggregate()`` HOF is CodegenFallback;
    the descent is O(bits) per row AND stays in codegen.) Indices
    are then bit-interleaved with shift/or expressions: bit b of
    column i lands at position ``b*len(cols)+i`` of ``_z``, so a
    prefix of ``_z`` constrains EVERY column at once. bits=6 → 64
    buckets per column, ample for file/row-group-level pruning where
    the file count, not the bucket count, bounds resolution.
    """
    n = len(cols)
    buckets = 1 << bits
    # cut points at the 1/buckets quantile grid; relativeError trades
    # one sampling pass's precision against balance — 1/(4*buckets)
    # keeps buckets within ~25% of even under any distribution.
    # Duplicate cuts (low-cardinality columns) are kept: the descent
    # stays monotone, some buckets are just empty.
    out = df
    idx_cols = []
    for c in cols:
        cuts = df.stat.approxQuantile(
            c, [i / buckets for i in range(1, buckets)], 1 / (4 * buckets)
        )
        arr = F.array(*[F.lit(cut) for cut in cuts])
        ic = f"_zb_{c}"
        out = out.withColumn(ic, F.lit(0).cast("long"))
        for level in range(bits):
            step = 1 << (bits - level - 1)
            # 1-based cut index of this level's pivot in the complete tree
            pivot = (F.col(ic) * 2 + 1) * step
            out = out.withColumn(
                ic,
                F.col(ic) * 2
                + (F.col(c) > F.element_at(arr, pivot.cast("int"))).cast("long"),
            )
        idx_cols.append(ic)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, ic in enumerate(idx_cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(F.col(ic), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return out.withColumn("_z", z).drop(*idx_cols)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    bits: int = 6,
    mode: str = "overwrite",
) -> None:
    """Parquet sink clustered on a Z-curve over SEVERAL columns.

    :func:`write_sorted_parquet` gives perfect skipping on its first
    sort key and none on the others (the second key's min/max spans
    nearly the full domain in every file). Z-ordering interleaves the
    rank bits of each column, so consecutive ``_z`` ranges — hence
    files, hence row groups — are small HYPER-RECTANGLES in the
    column space: a selective predicate on ANY of the columns prunes
    most files via ordinary parquet min/max stats, at the cost of
    each column's skipping being ~sqrt of what a dedicated sort would
    give. This is the standard layout for fact tables probed along
    multiple independent dimensions (time AND user; key AND size) —
    at 100 TB it's a write-once shuffle that every later scan
    amortizes. The curve column is dropped before write; the layout
    IS the index (nothing to maintain, readable by any engine).

    Evidence: tests/test_sources.py measures footer min/max overlap —
    a range predicate on EITHER column touches a minority of
    z-ordered files, vs all files for the single-sort layout's
    second column.
    """
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    zdf = zorder_value(df, cols, bits=bits)
    (
        zdf.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def merge_upsert_parquet(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str,
) -> int:
    """Upsert ``updates`` into a hive-partitioned parquet table,
    rewriting ONLY the partitions the updates touch; returns that
    partition count.

    Semantics: rows whose ``key_cols`` match an update are replaced;
    unmatched update rows are inserted — MERGE WHEN MATCHED UPDATE /
    WHEN NOT MATCHED INSERT, for the plain-parquet lake. At 100 TB
    this is the nightly-ingest primitive: a day's corrections touch a
    handful of date partitions, and the merge cost must scale with
    the TOUCHED partitions' bytes, never the table's.

    Mechanics, in scan order:
    1. the touched partition values are collected (bounded by the
       partition count — the same bounded-driver-list contract as the
       band-index probe's bucket set) and become an IN-list predicate
       that PRUNES the base scan to touched directories;
    2. surviving base rows drop their updated keys via a LEFT ANTI
       join (broadcast when the update batch is small — the common
       shape: base partition >> daily updates);
    3. anti-join survivors ∪ updates are staged (plans/staging.py) —
       the overwrite below destroys the very files the merge reads,
       so the merged rows must be durable BEFORE the write begins
       (Spark offers no atomic read-rewrite of one path);
    4. one write in dynamic partitionOverwriteMode replaces exactly
       the touched directories; untouched partitions' files are never
       opened, moved, or rewritten (asserted byte-for-byte in tests).

    Update batches spanning a partition-key change must carry the NEW
    partition value; the old partition's stale row is only shadowed
    if it too appears in ``updates`` — same contract as Hive/Delta
    dynamic overwrite. Concurrent writers need a table format with a
    transaction log (Delta/Iceberg); this primitive is the
    single-writer core they wrap.
    """
    from mapreduceapp_spark.plans.staging import stage

    # the touched-partition collect doubles as the size gate: the
    # groupBy carries per-partition counts through the same shuffle
    # the plain distinct would run, so the update-batch row count is
    # free at the driver
    per_part = (
        updates.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    touched = [r[0] for r in per_part]
    n_updates = sum(r["n"] for r in per_part)
    base = spark.read.parquet(base_dir).filter(
        F.col(partition_col).isin(touched)
    )
    # daily-update batches broadcast; a bulk backfill exceeds the key
    # budget and falls back to a shuffle anti-join (plans/hints.py)
    survivors = base.join(
        broadcast_if_small(updates.select(*key_cols), n_updates),
        key_cols, "left_anti",
    )
    merged = stage(
        survivors.unionByName(updates.select(*survivors.columns)),
        "merge_upsert",
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(base_dir)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(touched)
