"""Runtime bloom-filter join pruning — configuring (not re-building)
Catalyst's semi-join reduction.

The 100 TB join problem this addresses: fact ⋈ selectively-filtered
dimension where the dimension is too big to broadcast. The shuffle
then moves EVERY fact row, though only the few that match surviving
dimension keys can contribute. Spark's optimizer already owns the
fix — `InjectRuntimeFilter` builds a bloom filter over the filtered
dimension's join keys (`bloom_filter_agg`) and pushes a
`might_contain` predicate into the fact side BEFORE its shuffle, so
the tail of non-matching fact rows dies at the scan. We deliberately
do NOT hand-roll a bloom filter: the injected one is
whole-stage-codegen'd JVM code, sized from statistics, and reused
across AQE re-plans; a hand-built one would be a slower copy (the
same reasoning as letting AQE own skew splitting — see
functions/skew.py for the case where planful code IS warranted).

What this module contributes is the *regime contract*: injection is
threshold-gated (`creationSideThreshold`, default 10 MB, the filter
build side must be small enough; `applicationSideScanSizeThreshold`,
default 10 GB, the probe side must be big enough to be worth it). On
the local test harness no real table crosses 10 GB, so with stock
settings the rule never fires — exactly as intended at that size —
and at cluster scale it fires on its own. `bloom_prune_conf()`
returns the conf that represents the large-fact regime so tests (and
sf-rehearsals) can pin that the rewrite actually engages on our
declared join shapes, rather than discovering at 100 TB that a plan
property (e.g. an expression in the join key) silently disqualified
them.

Spark refs (public): SPARK-32268 (runtime bloom filter),
`org.apache.spark.sql.catalyst.optimizer.InjectRuntimeFilter`.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

# The large-fact regime, expressed as conf: any probe side qualifies
# (threshold 0) and the build side may be up to 100 MB of filtered
# dimension. autoBroadcastJoinThreshold is NOT touched here — if the
# dim fits broadcast, a broadcast join beats bloom+shuffle and the
# optimizer correctly prefers it; the bloom path is for the middle
# regime (dim too big to broadcast, fact huge).
BLOOM_REGIME_CONF: dict[str, str] = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


def bloom_prune_conf() -> dict[str, str]:
    """Conf dict that makes the runtime-bloom-filter rule treat any
    probe side as scan-heavy (the 100 TB fact regime) — apply on a
    cluster via ``spark-defaults`` or per-session; apply in tests via
    :func:`bloom_regime`."""
    return dict(BLOOM_REGIME_CONF)


@contextmanager
def bloom_regime(spark: SparkSession, disable_broadcast: bool = True):
    """Temporarily hold the session in the large-fact regime.

    ``disable_broadcast`` additionally sets
    ``autoBroadcastJoinThreshold=-1`` to emulate a dimension too big
    to broadcast (at fixture scale every dim broadcasts, which would
    mask the bloom path entirely). Restores every touched conf on
    exit, so surrounding tests see stock behavior.
    """
    touched = dict(BLOOM_REGIME_CONF)
    if disable_broadcast:
        touched["spark.sql.autoBroadcastJoinThreshold"] = "-1"
    saved = {}
    for k, v in touched.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
