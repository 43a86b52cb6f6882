"""Skew-handling primitives: salted two-phase aggregation & salted joins.

At 100 TB a handful of hot keys (the empty string, the default user,
the stopword) can own >10% of all rows; one reducer then runs for
hours while 999 executors idle. Two standard remedies, provided as
reusable library code (AQE's skew-join handles the *join* case at
runtime; salting is the planful version and the only option for
aggregations whose combine step isn't already partial):

- :func:`salted_agg` — two-phase aggregation: group on
  (key, salt=hash(row)%S) first, then re-aggregate per key. The hot
  key's rows split across S reducers in phase 1; phase 2 touches S
  rows per key. Correct for any *decomposable* aggregate (sum, count,
  min, max — anything with an associative merge).
- :func:`salted_broadcast_left` — explodes the small side S ways so a
  salted big side can equi-join it; used when one side is broadcast-
  sized but the probe side's key histogram is pathological.

Note Spark's built-in hash aggregates already do map-side partial
combine, which handles most skew for simple aggregates; salting
matters for ``collect_list``-like holistic aggregates and for
``groupBy().applyInPandas`` custom reducers where one group =
one Python call.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16
_SALT = "__salt"


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Add a uniform salt column derived from the whole row (cheap,
    deterministic per row content via xxhash64, no RNG state)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(_SALT, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Callable[[], list[Column]],
    merge_aggs: Callable[[], list[Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs()`` builds the phase-1 aggregate columns over
    (keys + salt); ``merge_aggs()`` builds the phase-2 merge over the
    phase-1 results (e.g. phase 1 ``count(*) as c`` → phase 2
    ``sum(c) as c``). Both phases are plain hash aggregates; the
    point is that phase 1's key space is |keys| × n_salts, so no
    single reducer sees a hot key's full row set.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, _SALT).agg(*partial_aggs())
    return phase1.groupBy(*keys).agg(*merge_aggs())


def salted_broadcast_left(
    small: DataFrame, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Explode a broadcast-sized dimension S ways, one copy per salt,
    so it can equi-join a salted fact side on (key, salt)."""
    return small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )


SALT_COL = _SALT
