"""Join helpers (SURVEY.md §2.4).

All reference joins are single-key equi-joins with post-join column
disambiguation via parent-DataFrame attribute references
(``/root/reference/ETL-Airflow/dags/tasks/supplier_performance_task.py:
48-81``) — a pattern that breaks on self-joins and column collisions.  The
engine's discipline: alias both sides (``l``/``r``) and select a declared
output projection, so every join has an explicit, collision-free schema
(`join_disambig`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    select: dict[str, str] | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Alias-disciplined equi-join.

    ``select`` maps output-name → qualified source (``"l.COL"``/``"r.COL"``);
    when omitted, Spark's ``on=`` name-merge semantics apply.
    ``broadcast_right=True`` hints the map-side join for dimension tables
    (`join_broadcast`) — suppliers/products/nation/region class dims stay
    far below the broadcast threshold even at 100 TB fact scale.
    """
    right_side = F.broadcast(right) if broadcast_right else right
    keys = [on] if isinstance(on, str) else list(on)
    if select is None:
        return left.join(right_side, on=keys, how=how)
    l, r = left.alias("l"), (F.broadcast(right.alias("r")) if broadcast_right else right.alias("r"))
    condition = None
    for key in keys:
        clause = F.col(f"l.{key}") == F.col(f"r.{key}")
        condition = clause if condition is None else (condition & clause)
    joined = l.join(r, on=condition, how=how)
    projection: list[Column] = [
        F.col(source).alias(output) for output, source in select.items()
    ]
    return joined.select(*projection)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lower_col: str,
    upper_col: str,
    on: list[str] | None = None,
    chunk_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: point ∈ [lower, upper) within ``on``
    keys — the range join Spark's planner turns into a nested-loop unless
    helped.

    ``how`` accepts only inner-style joins: the containment refine runs
    AFTER the join, so an outer join's null-padded rows would fail the
    predicate and drop — silently returning the inner result under an
    outer name (r8 review).  Compose points-with-no-interval as
    ``points.join(range_join(...), on=point_keys, how="left_anti")``.

    Scale shape — chunked equi-join: bucket the time axis into
    ``chunk_seconds`` chunks; each interval explodes to the chunks it
    covers (fan-out = interval length / chunk, bounded for short
    intervals), each point maps to exactly ONE chunk, so the match runs as
    an equi-join on (keys, chunk) and only co-bucketed pairs pay the
    refine predicate.  Because a point lives in a single chunk, no pair
    duplicates — no distinct needed.  Chunk size should be ≥ the typical
    interval length (fan-out ≈ 1-2) and ≤ the key-hour data volume a task
    can refine.
    """
    if how not in ("inner", "cross"):
        raise ValueError(
            f"range_join: how={how!r} unsupported — the post-join refine "
            "filter drops outer-join null rows, silently degrading to "
            "inner; see docstring for the left-anti composition"
        )
    keys = on or []
    if chunk_seconds < 1:
        # fail fast: chunk 0 dies mid-execution with a cryptic ANSI
        # DIVIDE_BY_ZERO and a negative chunk walks a nonsense grid
        # (r17 edge sweep)
        raise ValueError(f"chunk_seconds must be >= 1, got {chunk_seconds}")
    chunk = F.lit(chunk_seconds)
    p = points.withColumn(
        "__chunk", F.floor(F.unix_timestamp(F.col(point_col)) / chunk)
    )
    i = intervals.withColumn(
        "__chunk",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lower_col)) / chunk),
                F.floor(F.unix_timestamp(F.col(upper_col)) / chunk),
            )
        ),
    )
    return (
        p.join(i, on=[*keys, "__chunk"], how=how)
        .filter(
            (F.col(point_col) >= F.col(lower_col))
            & (F.col(point_col) < F.col(upper_col))
        )
        .drop("__chunk")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    on: list[str] | None = None,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Interval-INTERVAL overlap join: pairs whose half-open spans
    intersect (``l.start < r.end AND r.start < l.end``) within ``on``
    keys — sessions × campaigns, downtime × orders, any two span sets.

    Scale shape: BOTH sides explode to the time chunks they cover and the
    match runs as an equi-join on (keys, chunk) with the exact overlap
    predicate as the refine — the same trick as :func:`range_join`, which
    cannot express this (a point lives in one chunk; an interval pair may
    share several).  Pair duplication across shared chunks is eliminated
    WITHOUT a distinct: a pair is kept only in the first chunk both cover
    (``floor(max(starts)/chunk)``), so no wide dedup shuffle exists in
    the plan.  Non-key column names must not collide across sides (select
    /alias before joining).
    """
    keys = on or []
    ll, lu = left_bounds
    rl, ru = right_bounds
    if chunk_seconds < 1:
        # fail fast: chunk 0 dies mid-execution with a cryptic ANSI
        # DIVIDE_BY_ZERO and a negative chunk walks a nonsense grid
        # (r17 edge sweep)
        raise ValueError(f"chunk_seconds must be >= 1, got {chunk_seconds}")
    chunk = F.lit(chunk_seconds)

    def chunked(frame: DataFrame, lo: str, hi: str) -> DataFrame:
        return frame.withColumn(
            "__chunk",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(lo)) / chunk),
                    F.floor(F.unix_timestamp(F.col(hi)) / chunk),
                )
            ),
        )

    first_shared = F.floor(
        F.greatest(
            F.unix_timestamp(F.col(ll)), F.unix_timestamp(F.col(rl))
        )
        / chunk
    )
    return (
        chunked(left, ll, lu)
        .join(chunked(right, rl, ru), on=[*keys, "__chunk"])
        .filter((F.col(ll) < F.col(ru)) & (F.col(rl) < F.col(lu)))
        .filter(F.col("__chunk") == first_shared)
        .drop("__chunk")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (``direction="backward"``, the
    SQL ``ASOF LEFT JOIN`` default), the smallest ``right_ts`` ≥
    ``left_ts`` (``direction="forward"`` — next quote / next maintenance
    window), or whichever of the two is closer in absolute time
    (``direction="nearest"``, exact ties resolved BACKWARD) within the
    same ``on`` keys; the operator Spark's DataFrame API lacks.

    Scale shape — the union-merge pattern, NOT a range join: a range
    condition join explodes to |L|·|R| per key before filtering, while
    this plan is one union, one shuffle on ``on`` keys, one ordered window
    pass (right values carried with ``last(ignorenulls)`` over a running
    frame; forward simply traverses time descending).  Memory is O(1) per
    row — the classic merge-join formulation of as-of.

    Ties are deterministic and inclusive both ways: rights sort before
    lefts at equal timestamps so ``right_ts == left_ts`` matches;
    among equal-timestamp rights, backward keeps the LARGEST value
    struct and forward the SMALLEST (the row "nearest" from each
    traversal direction).

    ``tolerance`` (e.g. ``"1 hour"``): matches farther than that from
    ``left_ts`` (older for backward, later for forward) are nulled,
    bounding staleness/lookahead.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    value_cols = value_cols or [
        c for c in right.columns if c not in (*on, right_ts)
    ]
    collide = sorted(set(value_cols) & set(left.columns))
    if collide:
        # silently emitting two same-named columns poisons the FIRST
        # downstream reference with AMBIGUOUS_REFERENCE (r8 review)
        raise ValueError(
            f"asof_join: right value columns {collide} collide with left "
            "columns — alias one side before joining, or pass value_cols"
        )
    payload = [c for c in left.columns if c not in on]  # left's own columns

    from pyspark.sql.types import MapType

    def _has_map(dt) -> bool:
        if isinstance(dt, MapType):
            return True
        if hasattr(dt, "elementType"):
            return _has_map(dt.elementType)
        if hasattr(dt, "fields"):
            return any(_has_map(f.dataType) for f in dt.fields)
        return False

    # Tie-break among equal-timestamp rights sorts a struct of the value
    # columns — but map types are UNORDERABLE and would fail the whole
    # plan at analysis (r8 review).  The tie-break struct therefore
    # carries only the orderable value columns; map payloads still ride
    # __rv to the output.  (Rights equal on ts AND every orderable value
    # then tie arbitrarily — acceptable: they differ only in map fields.)
    orderable = [c for c in value_cols if not _has_map(right.schema[c].dataType)]
    packed = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in value_cols]
    )
    tiebreak = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in orderable]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        packed.alias("__rv"),
        tiebreak.alias("__rtb"),
    )
    rv_type = r.schema["__rv"].dataType
    rtb_type = r.schema["__rtb"].dataType
    l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(None).cast(rtb_type).alias("__rtb"),
        *payload,
    )
    r_padded = r.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in payload
        ],
    )
    merged = l.unionByName(r_padded)
    order_b = [F.asc("__ts"), F.asc("__side"), F.asc("__rtb")]
    # forward: walk time backwards so "last seen" = next at-or-after
    order_f = [F.desc("__ts"), F.asc("__side"), F.desc("__rtb")]
    if tolerance is not None:
        # fail fast: a negative tolerance silently matches nothing
        # (r17 edge sweep); "0 seconds" stays legal (exact-ts-only).
        # EVALUATE the interval rather than sniffing a leading "-"
        # (r17 ADVICE): compound forms like "0 minutes -5 seconds" are
        # negative without a leading minus.  Sign is probed by adding
        # the interval to a fixed epoch on a 1-row local frame — legal
        # for both day-time and year-month interval types, costs one
        # driver-local job at plan-build time.
        epoch = F.to_timestamp(F.lit("2000-01-01"))
        negative = (
            left.sparkSession.range(1)
            .select((epoch + F.expr(f"INTERVAL {tolerance}") < epoch).alias("n"))
            .head()[0]
        )
        if negative:
            raise ValueError(
                f"asof_join: tolerance must be non-negative, got {tolerance!r}"
            )
    delta = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None

    def _carry(order) -> Column:
        window = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("__rv", ignorenulls=True).over(window)

    def _fresh(match: Column, d: str) -> Column:
        if delta is None:
            return match
        if d == "backward":
            ok = match["__rts"] >= F.col("__ts") - delta
        else:
            ok = match["__rts"] <= F.col("__ts") + delta
        return F.when(ok, match)

    if direction in ("backward", "forward"):
        order = order_b if direction == "backward" else order_f
        carried = merged.withColumn("__match", _carry(order)).filter(
            F.col("__side") == 1
        )
        carried = carried.withColumn(
            "__match", _fresh(F.col("__match"), direction)
        )
    else:  # nearest: both traversals share one shuffle (same partitionBy
        # → Catalyst reuses the Exchange; only the sort runs twice), then
        # pick the closer match per row; exact ties go BACKWARD (the
        # "last known value" reading is the less surprising default).
        carried = (
            merged.withColumn("__mb", _carry(order_b))
            .withColumn("__mf", _carry(order_f))
            .filter(F.col("__side") == 1)
        )
        mb = _fresh(F.col("__mb"), "backward")
        mf = _fresh(F.col("__mf"), "forward")
        ts_us = F.unix_micros(F.col("__ts"))
        b_dist = ts_us - F.unix_micros(mb["__rts"])
        f_dist = F.unix_micros(mf["__rts"]) - ts_us
        carried = carried.withColumn(
            "__match",
            F.when(mb.isNotNull() & (mf.isNull() | (b_dist <= f_dist)), mb)
            .otherwise(mf),
        ).drop("__mb", "__mf")
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(c) for c in value_cols]
    return carried.select(*out_cols)


def deletion_variants(key: Column) -> Column:
    """The key plus every single-character-deletion of it (distinct).

    SymSpell blocking property: two strings are within Levenshtein
    distance 1 iff their deletion neighborhoods intersect (substitution →
    both drop the differing char; insert/delete → the longer side's
    deletion equals the shorter string).  All JVM expressions.
    """
    deletes = F.transform(
        F.sequence(F.lit(0), F.length(key) - 1),
        lambda i: F.concat(
            F.substring(key, F.lit(1), i), F.substring(key, i + 2, F.length(key))
        ),
    )
    return F.array_distinct(F.concat(F.array(key), deletes))


def fuzzy_self_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Pairs (a < b) whose ``key_col`` values are within Levenshtein
    distance 1 — near-duplicate key reconciliation (titles, URLs, names).

    Scale shape: each key explodes to ~len(key) deletion variants (ids
    only — no payload rides the explode), the self-join is an equi-join
    on the variant, candidates dedupe BEFORE the exact `levenshtein`
    verify (same candidates-then-verify discipline as the LSH families;
    blocking is exact for d=1, so recall is 1.0 — asserted in tests).
    All-pairs never happens.
    """
    variants = df.select(
        F.col(id_col),
        F.explode(deletion_variants(F.col(key_col))).alias("__var"),
    )
    cand = (
        variants.toDF("a", "__var")
        .join(variants.toDF("b", "__var"), on="__var")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    ka = df.select(F.col(id_col).alias("a"), F.col(key_col).alias("__ka"))
    kb = df.select(F.col(id_col).alias("b"), F.col(key_col).alias("__kb"))
    return (
        cand.join(ka, on="a")
        .join(kb, on="b")
        .withColumn("distance", F.levenshtein(F.col("__ka"), F.col("__kb")))
        .filter(F.col("distance") <= 1)
        .select("a", "b", "distance")
    )
