"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's reduce phase is "all values for one key, together,
once" (``MapReduceClient.h:61-64``) — a *terminal* grouped fold.
A streaming engine needs the incremental version: per-key state that
folds values batch by batch and emits updates. Structured Streaming's
built-ins cover windows/dedup; this module shows the *custom* path —
arbitrary user state with ``applyInPandasWithState`` — on a running
per-user usage accumulator.

Semantics: for each user, state = (n_events, total_value_scaled);
every micro-batch folds its rows into state and emits the updated
row. After the stream drains, the last emitted row per user equals
the batch groupBy — asserted in tests/test_streaming_stateful.py.

Scale posture: state is one tiny fixed-width row per user, stored in
the state store (RocksDB-backed on a real cluster), sharded by the
group key across executors. Value totals accumulate as exact scaled
int64 (the engine's decimal-sum convention, functions/numeric.py),
so stream and batch agree bit-for-bit, which floating accumulation
across nondeterministic batch boundaries would not.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mapreduceapp_spark.functions.numeric import (
    exact_decimal_sum,
    oracle_exact_decimal_sum,
)
from mapreduceapp_spark.plans.registry import register
from mapreduceapp_spark.sources import tables

OUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, scaled bigint"
_SCALE = 100  # value carries 2 decimals (decimal-sum convention)


def scaled_int_sum(values: pd.Series) -> int:
    """Exact scaled-int sum of a 2-decimal measure, mirroring
    :func:`~mapreduceapp_spark.functions.numeric.exact_decimal_sum`
    exactly: scale once, round half-AWAY-FROM-ZERO once (Spark
    F.round semantics). The numpy/pandas default is half-even, which
    diverges from the batch twin at representable half-way points
    (e.g. a 3-decimal 0.125 -> 12 half-even vs 13 half-up), so round
    via floor(x+0.5)/ceil(x-0.5) instead of Series.round."""
    v = values.to_numpy() * _SCALE
    snapped = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    return int(snapped.astype("int64").sum())


def fold_user_state(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's rows for one user into running state and emit
    the updated totals (the incremental ``reduce`` of the reference's
    client contract)."""
    n, scaled = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        # exact int accumulation of a 2-decimal measure — see
        # functions/numeric.py for why this is engine-stable
        scaled += scaled_int_sum(pdf["value"])
    state.update((n, scaled))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [scaled / _SCALE],
        }
    )


def user_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals with custom state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold_user_state,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@register(
    "q_user_totals",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_events,
               {oracle_exact_decimal_sum("value", 2)} AS total_value
        FROM events
        GROUP BY user_id
    """,
    doc="Per-user event totals — batch twin of the custom stateful stream op.",
)
def q_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: one hash-aggregate with map-side partials. The
    streaming form (:func:`user_totals_stream`) computes the same
    totals incrementally per micro-batch; the equivalence test drains
    a file-source stream and compares final state to this result."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_decimal_sum(F.col("value"), 2).alias("total_value"),
    )
