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


def _exact_sum(col: Column, capture_scale: int) -> Column:
    """Exact, order-independent sum of a fixed-scale value as DECIMAL.

    Each term is split into ``floor(x)`` whole units and a rounded
    sub-unit remainder in ``[0, 10^capture_scale)`` — both integers
    recovered *exactly* from the double (the term's true decimal scale
    must be ≤ ``capture_scale`` and the binary error < 0.5 at that scale,
    same contract as ``decimal_round``).  The two LONG sums run in the
    whole-stage-codegen fast path — measured 3.3× faster at sf0.1 than
    summing ``decimal(38,6)`` terms (0.32s vs 1.05s warm on the TPC-H Q1
    shape; ``decimal(18,6)`` terms measured identical to 38, so width
    alone does not recover the fast path) — and are combined exactly in
    decimal once per group.

    Overflow bounds (per group): |Σ units| < 2^63 ≈ 9.2e18 currency
    units, Σ rem < rows × 10^capture_scale < 2^63 — both hold with wide
    headroom for a 100 TB TPC-H-scale fact table (global revenue sums
    reach ~1e16 units at SF 100k).  NaN and ±Infinity terms are
    normalized to NULL first so they are skipped exactly as Spark's
    non-ANSI double→decimal cast would skip them — without the infinity
    guard, ``floor(double)->long`` maps +inf to Long.MaxValue and the
    units sum silently corrupts instead of loudly skipping the term.
    Non-finite inputs remain OUT OF CONTRACT for oracle comparison: the
    documented DuckDB mirror ``SUM(CAST(term AS DECIMAL(38,6)))`` raises
    a conversion error on inf rather than skipping, so the guard only
    prevents silent Spark-side corruption; money columns feeding an
    oracle-checked query must be finite (they are — every consumer sums
    products of finite prices/rates).
    """
    mult = 10**capture_scale
    d = col.cast("double")
    x = F.when(F.isnan(d) | (F.abs(d) == F.lit(float("inf"))), None).otherwise(d)
    units = F.floor(x)
    rem = F.floor((x - F.floor(x)) * F.lit(float(mult)) + F.lit(0.5))
    dec = f"decimal(38,{capture_scale})"
    return F.sum(units).cast(dec) + F.sum(rem).cast(dec) / F.lit(mult)


def decimal_sum(col: Column, scale: int = 2, capture_scale: int = 6) -> Column:
    """Order-independent money sum, rounded to ``scale``.

    Rounding a *double* sum is not enough — the double sum's last ulp
    depends on partition/combine order (nondeterministic across runs and
    across engines), so a group whose true sum sits on a half-cent boundary
    rounds differently run-to-run (the r1 ``agg_groupby_single`` hash-fail).
    The sum itself is exact integer/decimal arithmetic (see ``_exact_sum``):
    associative, order-independent, identical in Spark and DuckDB.  The
    oracle mirrors the *semantics* (an exact decimal sum), not the
    implementation::

        CAST(ROUND(SUM(CAST(term AS DECIMAL(38,6))), scale) AS DOUBLE)

    Aggregate helper — use inside ``groupBy().agg(...)``.
    """
    return F.round(_exact_sum(col, capture_scale), scale).cast("double")


def decimal_avg(col: Column, scale: int = 4, capture_scale: int = 6) -> Column:
    """Order-independent rounded average: exact sum (see ``_exact_sum``),
    then one deterministic double division.  Oracle mirror::

        ROUND(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(x), scale)

    The denominator counts exactly the terms the numerator sums: NULLs
    are skipped (matching ``AVG``), and non-finite values — which
    ``_exact_sum`` normalizes to NULL so they cannot poison the decimal
    sum — are skipped on BOTH sides (a plain ``COUNT(col)`` counted a
    NaN row the numerator had dropped, silently deflating the average —
    r8 review).
    """
    d = col.cast("double")
    guarded = F.when(
        ~F.isnan(d) & (F.abs(d) != F.lit(float("inf"))), col
    )  # same term filter as _exact_sum (NULL propagates through the cast)
    total = _exact_sum(col, capture_scale).cast("double")
    return F.round(total / F.count(guarded), scale)
