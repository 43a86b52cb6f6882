"""Curation operators: hash splitting + sequence packing
(operators/curation.py)."""

from __future__ import annotations

from tests.oracle import assert_matches_oracle


def test_sample_split_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_sample_split", sf_dir)


def test_sample_split_is_stable_and_sane(spark, sf_dir):
    """Split assignment is a pure function of doc_id (identical across
    runs/partitionings), covers every doc exactly once, and the
    fractions land near 80/10/10."""
    from mapreduceapp_spark.plans.registry import get_query

    q = get_query("q_sample_split").builder
    a = {r["doc_id"]: r["split"] for r in q(spark, sf_dir).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in q(spark, sf_dir).repartition(7).collect()
    }
    assert a == b, "split must be invariant under repartitioning"
    n = len(a)
    train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * n <= train <= 0.9 * n, f"train fraction {train/n:.2f}"
    assert set(a.values()) == {"train", "val", "test"}


def test_sample_split_ablation_independent_of_split(spark, sf_dir):
    """The salted ablation hash must not correlate with the split
    hash: ablation docs appear in every split."""
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_sample_split").builder(spark, sf_dir).collect()
    ablation_splits = {r["split"] for r in rows if r["in_ablation"] == 1}
    assert ablation_splits == {"train", "val", "test"}


def test_pack_sequences_oracle(spark, sf_dir):
    assert_matches_oracle(spark, "q_pack_sequences", sf_dir)


def test_pack_sequences_bins_fill_to_budget(spark, sf_dir):
    """Concat-and-chunk invariant: within a shard, every bin except
    the last starts exactly where the previous ended, so each
    non-final bin's token total is >= the budget minus its last
    (straddling) doc — i.e. bins are actually packed, not sparse."""
    from collections import defaultdict

    from mapreduceapp_spark.operators.curation import PACK_BUDGET
    from mapreduceapp_spark.plans.registry import get_query

    rows = get_query("q_pack_sequences").builder(spark, sf_dir).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r["shard"]].append(r)
    assert by_shard
    for shard, bins in by_shard.items():
        bins.sort(key=lambda r: r["bin"])
        ids = [r["bin"] for r in bins]
        assert ids == list(range(len(ids))), f"shard {shard}: bins not dense"
        # cumulative starting offset of bin i is exactly i*PACK_BUDGET
        # plus however far the straddler ran over — so all docs up to
        # bin i hold at least i*PACK_BUDGET tokens
        cum = 0
        for r in bins[:-1]:
            cum += r["bin_tokens"]
            assert cum >= (r["bin"] + 1) * PACK_BUDGET, (
                f"shard {shard} bin {r['bin']} underfilled: {cum}"
            )
