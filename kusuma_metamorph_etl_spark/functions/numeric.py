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
    return F.round(col.cast(f"decimal(38,{capture_scale})"), scale).cast("double")


def decimal_sum(col: Column, scale: int = 2, capture_scale: int = 6) -> Column:
    """Order-independent money sum: ``round(sum(decimal(term)), scale)``.

    Rounding a *double* sum is not enough — the double sum's last ulp
    depends on partition/combine order (nondeterministic across runs and
    across engines), so a group whose true sum sits on a half-cent boundary
    rounds differently run-to-run (the r1 ``agg_groupby_single`` hash-fail).
    Casting each term to decimal first makes the sum exact decimal
    arithmetic: associative, order-independent, identical in Spark and
    DuckDB.  Oracle mirror::

        CAST(ROUND(SUM(CAST(term AS DECIMAL(38,6))), scale) AS DOUBLE)

    Aggregate helper — use inside ``groupBy().agg(...)``.
    """
    return F.round(F.sum(col.cast(f"decimal(38,{capture_scale})")), scale).cast(
        "double"
    )


def decimal_avg(col: Column, scale: int = 4, capture_scale: int = 6) -> Column:
    """Order-independent rounded average: exact decimal sum, then one
    deterministic double division.  Oracle mirror::

        ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x), scale)

    ``COUNT(col)`` (not ``COUNT(*)``) so null handling matches ``AVG``.
    """
    total = F.sum(col.cast(f"decimal(38,{capture_scale})")).cast("double")
    return F.round(total / F.count(col), scale)
