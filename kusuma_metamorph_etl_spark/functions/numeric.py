"""Numeric helpers (`fn_round` and friends, SURVEY.md §2.8).

``decimal_round`` exists because of a cross-engine pitfall: ``round(double,
2)`` on a value whose *true decimal* form lands exactly on a half-penny
(e.g. ``862.575``) is engine-dependent — Spark converts the binary double to
BigDecimal exactly and rounds HALF_UP, while C-library rounding works on the
binary approximation.  Money math that must be reproducible (and
oracle-checkable) first recovers the true decimal value via a decimal cast
with headroom, then rounds in decimal space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_round(col: Column, scale: int = 2, capture_scale: int = 6) -> Column:
    """Exact-decimal rounding of a double expression.

    ``capture_scale`` must exceed the true decimal scale of the expression
    and the binary error must be < 0.5 ulp at that scale — for products of
    2-decimal prices, integer-ish quantities and 2-decimal rates, 6 is ample.
    Returns double so downstream schemas stay uniform.
    """
    return F.round(col.cast(f"decimal(18,{capture_scale})"), scale).cast("double")
