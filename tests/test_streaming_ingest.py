"""Curated streaming ingest (streaming/ingest.py): batch ≡ stream
into the txlog table, exactly-once under foreachBatch replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceapp_spark.sources import load_table
from mapreduceapp_spark.sources.txlog import (
    txlog_committed_batches,
    txlog_create,
    txlog_foreach_batch_append,
    txlog_read,
    txlog_versions,
)
from mapreduceapp_spark.streaming.ingest import (
    curate_documents,
    curated_ingest_stream,
)
from mapreduceapp_spark.streaming.probe import documents_stream


def _setup(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    stream_dir = str(tmp_path / "incoming")
    # two file drops into one source dir (the file source lists
    # top-level part files, not subdirectories)
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(stream_dir)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(
        stream_dir
    )
    root = str(tmp_path / "curated_tx")
    txlog_create(
        spark, root, curate_documents(docs).limit(0), stats_cols=["doc_id"]
    )
    return docs, stream_dir, root


def test_stream_lands_batch_equal_rows(spark, sf_dir, tmp_path):
    docs, stream_dir, root = _setup(spark, sf_dir, tmp_path)
    q = curated_ingest_stream(
        spark,
        documents_stream(spark, sf_dir, stream_dir),
        root,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = txlog_read(spark, root)
    want = curate_documents(docs)
    assert got.count() == want.count()
    # full-row equality via anti-joins both ways (text included — the
    # scrub ran identically on both sides)
    cols = want.columns
    assert got.join(want, cols, "left_anti").count() == 0
    assert want.join(got, cols, "left_anti").count() == 0
    # quality floor actually dropped something
    assert want.count() < docs.count()


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    docs, stream_dir, root = _setup(spark, sf_dir, tmp_path)
    q = curated_ingest_stream(
        spark,
        documents_stream(spark, sf_dir, stream_dir),
        root,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    committed = txlog_committed_batches(root, "curated-ingest")
    assert committed, "stream committed no batches"
    n = txlog_read(spark, root).count()
    v = txlog_versions(root)[-1]
    # foreachBatch's failure contract: the SAME batch_id is re-offered
    # with the same data; the sink must no-op
    sink = txlog_foreach_batch_append(spark, root, "curated-ingest")
    sink(curate_documents(docs), min(committed))
    assert txlog_read(spark, root).count() == n
    assert txlog_versions(root)[-1] == v, "replay created a version"
