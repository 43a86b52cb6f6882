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


def test_frame_sample_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_frame_sample", sf_dir)


def test_frame_sample_fanout_shape(spark, sf_dir):
    """Every doc emits ceil(n_frames / stride) frames, indices follow
    the stride, and resize preserves aspect (long edge == target)."""
    from mapreduceapp_spark.operators.multimodal import (
        FRAME_STRIDE,
        RESIZE_TARGET,
    )
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_frame_sample").builder(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, frames in by_doc.items():
        n_frames = frames[0]["n_frames"]
        want = list(range(0, n_frames, FRAME_STRIDE))
        assert sorted(f["frame_idx"] for f in frames) == want
        for f in frames:
            assert max(f["out_w"], f["out_h"]) == RESIZE_TARGET
            assert f["out_w"] <= RESIZE_TARGET and f["out_h"] <= RESIZE_TARGET


def test_decode_frames_strict_raises(spark):
    import pytest

    from mapreduceapp_spark.operators.multimodal import (
        MediaDecodeUnavailable,
        decode_frames,
    )

    with pytest.raises(MediaDecodeUnavailable):
        decode_frames(b"xx", strict=True)
