"""Numeric expression helpers for cross-engine-deterministic aggregates.

Summing doubles is order-dependent, and decimal rounding of doubles
is *engine*-dependent at half-way points (Spark rounds the shortest
decimal representation via BigDecimal HALF_UP; C-family engines
round the binary value). Both effects break any strict value-hash
comparison between Spark and another engine.

``exact_decimal_sum`` sidesteps both: for a measure known to carry
at most ``digits`` decimal digits (money columns, rates), it scales
each row to an exact int64, sums exactly (order-independent), and
divides back once. The resulting double is bit-identical in every
engine that performs the same plan — no rounding step exists to
disagree on. The SQL twin is ``oracle_exact_decimal_sum``.

This is exact arithmetic, not an approximation: a d-decimal quantity
times 10^d is within 1e-9 of an integer, so the scale-round-cast
recovers the true integer numerator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_decimal_sum(col: Column, digits: int = 2) -> Column:
    """Order-independent exact sum of a ``digits``-decimal double."""
    s = 10**digits
    return F.sum(F.round(col * s).cast("long")) / F.lit(float(s))


def oracle_exact_decimal_sum(expr: str, digits: int = 2) -> str:
    """DuckDB twin of :func:`exact_decimal_sum`."""
    s = 10**digits
    return f"sum(CAST(round(({expr}) * {s}) AS BIGINT)) / {s}.0"
