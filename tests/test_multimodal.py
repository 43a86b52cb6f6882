"""Multimodal columns (C5): binary payload plumbing + Arrow batches."""

from __future__ import annotations

import pytest

from tests.oracle import assert_matches_oracle


def test_multimodal_cols_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_multimodal_cols", sf_dir)


def test_media_metadata_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_media_metadata", sf_dir)


def test_media_features_plumbing(spark, sf_dir):
    """The mapInPandas pipeline is deterministic, row-preserving and
    schema-stable even though the decoder is a stub."""
    from mapreduceapp_spark.plans.registry import get_query
    from mapreduceapp_spark.sources import tables

    df = get_query("q_media_features").builder(spark, sf_dir)
    assert df.columns == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "mean_byte",
    ]
    rows = sorted(tuple(r) for r in df.collect())
    again = sorted(tuple(r) for r in df.collect())
    assert rows == again
    assert len(rows) == tables(spark, sf_dir).documents.count()
    assert all(r[1] > 0 and r[2] >= 16 and r[4] >= 1 for r in rows)


def test_decode_stub_is_honest():
    from mapreduceapp_spark.operators.multimodal import (
        MediaDecodeUnavailable,
        decode_media,
    )

    with pytest.raises(MediaDecodeUnavailable):
        decode_media(b"\x89PNG", strict=True)
    fake = decode_media(b"\x89PNG")
    assert fake == decode_media(b"\x89PNG")  # deterministic
    assert set(fake) == {"width", "height", "n_frames", "mean_byte"}
