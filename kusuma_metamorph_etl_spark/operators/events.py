"""[EXT] Event-sequence analytics over the ``events`` fact.

Funnel analysis: per user, the earliest time each stage is reached at or
after the previous stage's time (the standard ordered-funnel rule).  The
reference has no event-sequence operators; this extends the engine's
sessionization/attribution family (`streaming/windows.py::session_agg`,
`streaming/joins.py::attribution_join`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_stage_names(stages: list[str]) -> None:
    """Stage names come from DATA VALUES (event_type strings), so every
    reference to a stage-derived column must be backtick-quoted — and a
    name containing a backtick cannot itself be quoted portably, so it
    is rejected up front (r8 review + r8 advice: dots parsed as
    nested-field paths through unquoted F.col/select)."""
    for st in stages:
        if "`" in st:
            raise ValueError(f"stage name {st!r} contains a backtick")


def _q(name: str) -> str:
    """Backtick-quote a data-derived column name for F.col/select."""
    return f"`{name}`"


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per user who entered the funnel (reached ``stages[0]``),
    with a ``t_<stage>`` timestamp per stage — null from the first stage
    the user never reached in order.

    Stage k counts when its event time is ``>=`` the user's stage-(k-1)
    time (same-instant events advance the funnel; the rule is declared,
    not inferred).

    Scale shape: k-1 equi-joins on the user key between the per-stage
    event slice (filter pushes to the scan) and the user-grain funnel
    frame — every join co-keyed on ``user_col``, no windows over raw
    events, no per-user collect.  Conversion counts are a trivial
    aggregation of the output.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    _check_stage_names(stages)

    def stage_col(s: str) -> str:
        return f"t_{s}"

    current = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(stage_col(stages[0])))
    )
    prev = stage_col(stages[0])
    for s in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .select(user_col, ts_col)
            .join(current.select(user_col, _q(prev)), on=user_col)
            .filter(F.col(ts_col) >= F.col(_q(prev)))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(stage_col(s)))
        )
        current = current.join(nxt, on=user_col, how="left")
        prev = stage_col(s)
    return current


def funnel_one_scan(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Same ordered-funnel semantics as :func:`funnel`, reading the events
    fact ONCE.

    The k-join :func:`funnel` scans the fact k times (each scan filtered to
    one stage); at 100 TB a k-stage funnel re-reads the fact k times.  Here
    one scan pivots to per-(user, stage) SORTED timestamp arrays — a plain
    ``pivot(min(ts))`` would be wrong, because stage k's time is the
    earliest AT-OR-AFTER stage k-1's, not the global min — then the stage
    chain is pure array expressions (``F.filter`` + ``F.get``) over the
    user-grain frame: one shuffle total, no joins.

    Per-(user, stage) arrays are bounded by a user's per-stage event count
    — far below the fact size, but a pathological single user's array must
    fit in one task (the same bound ``collect_list`` always has).

    A/B at sf0.1 (local[32], two interleaved 3-rep rounds, warm JVM —
    VERDICT r2 #8 carryover, closed r6): one-scan [0.72, 0.39, 0.32] /
    [0.25, 0.30, 0.35]s vs k-join [0.95, 0.80, 0.68] / [0.64, 0.61,
    0.55]s — ~2x faster at 3 stages, and the gap grows with k and with
    fact size (k fact scans + 2(k-1) shuffle stages vs 1 scan + 1
    shuffle), so this is the implementation behind `evt_funnel`; the
    k-join :func:`funnel` stays as the cross-checked twin (results proved
    identical at sf0.01 before timing).
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    _check_stage_names(stages)

    per_stage = (
        events.filter(F.col(type_col).isin(stages))
        .groupBy(user_col)
        .pivot(type_col, stages)
        .agg(F.sort_array(F.collect_list(ts_col)))
    )
    current = per_stage.withColumn(
        f"t_{stages[0]}", F.get(F.col(_q(stages[0])), 0)
    )
    def _at_or_after(arr: Column, prev_t: Column) -> Column:
        return F.filter(arr, lambda x: x >= prev_t)

    prev = f"t_{stages[0]}"
    for s in stages[1:]:
        # Earliest stage-s event at-or-after the previous stage's time;
        # F.get returns NULL (not an ANSI error) when nothing qualifies.
        reached = _at_or_after(F.col(_q(s)), F.col(_q(prev)))
        current = current.withColumn(f"t_{s}", F.get(reached, 0))
        prev = f"t_{s}"
    if within_seconds is not None:
        # Conversion-window rule, anchored at the user's FIRST stage-1
        # event (the declared semantics — NOT "any chain fits some
        # window", which would need a per-chain search): a stage only
        # counts if it lands within `within_seconds` of t_first.  One
        # deadline comparison per stage suffices for the cascade too —
        # the greedy chain guarantees t_s ≥ t_{s-1}, so a stage past the
        # deadline drags every later stage past it as well.
        deadline = F.col(_q(f"t_{stages[0]}")) + F.expr(
            f"INTERVAL {int(within_seconds)} SECONDS"
        )
        for s in stages[1:]:
            current = current.withColumn(
                f"t_{s}",
                F.when(F.col(_q(f"t_{s}")) <= deadline, F.col(_q(f"t_{s}"))),
            )
    return current.filter(F.col(_q(f"t_{stages[0]}")).isNotNull()).select(
        user_col, *[_q(f"t_{s}") for s in stages]
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Label every EVENT with its per-user session index (1-based): a new
    session starts when the gap to the previous event exceeds
    ``gap_seconds`` (strictly greater; the rule is declared).
    ``keep_cols`` carries extra input columns through to the labeled
    output (the default schema stays minimal — and frozen, it is an
    oracle contract).

    The event-grain complement of ``streaming/windows.py::session_agg``
    (which aggregates per session) — downstream features often need the
    session id ON the event rows (sequence models, per-session ordering).

    Plan: lag + running sum over a window PARTITIONED BY user (shuffles
    once on the user key, no global window, no single task).  Gap compare
    runs on integer microseconds (``unix_micros``) so there is no float
    boundary ambiguity; ties order by (ts, event id) for determinism.
    """
    if gap_seconds < 1:
        # fail fast: a zero/negative inactivity gap silently degrades to
        # one session per event (r17 edge sweep)
        raise ValueError(f"sessionize: gap_seconds must be >= 1, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = (
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_seconds * 1_000_000)
    ).cast("int")
    session_idx = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        user_col,
        id_col,
        ts_col,
        session_idx.alias("session_idx"),
        *(keep_cols or []),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted per (cohort_day, day_offset) they return on.

    Plan: one user-grain min-date aggregation, joined back on the user
    key (both sides shuffle on the same key — co-partitioned), then one
    (cohort, offset) aggregation with map-side partial distinct-count.
    """
    return (
        _cohort_frame(events, user_col, ts_col)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct(user_col).alias("n_users"))
    )


def _cohort_frame(
    events: DataFrame, user_col: str, ts_col: str, extra: list[str] | None = None
) -> DataFrame:
    """Shared (user, cohort_day, day, day_offset[, extra...]) frame behind
    :func:`retention_cohorts` and :func:`cohort_revenue` — one user-grain
    min-date agg + one co-keyed join back; both consumers aggregate it
    by (cohort_day, day_offset)."""
    first = events.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("cohort_day")
    )
    return (
        events.select(user_col, F.to_date(ts_col).alias("day"), *(extra or []))
        .join(first, on=user_col)
        .withColumn("day_offset", F.datediff("day", "cohort_day"))
    )


def dedup_within_window(
    events: DataFrame,
    keys: list[str],
    window_seconds: int,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Drop events repeating the same ``keys`` within ``window_seconds``
    of the PREVIOUS occurrence, chained — telemetry/ingest-retry dedup
    (at-least-once producers emit the same logical event seconds apart;
    exact dedup by id misses them because retries mint fresh ids).

    Semantics: per key group, events sort by (ts, id) and link into
    BURSTS — consecutive events whose gap is ≤ ``window_seconds``
    (strictly-greater breaks, same declared boundary as ``sessionize``);
    only the first event of each burst survives.  A retry storm chains
    into one burst and collapses to its first arrival however long it
    runs (the chain rule); this deliberately differs from a
    tumbling-from-last-kept rule, which would re-admit an evenly spaced
    storm every window.  Burst identity IS session identity, so the
    plan is sessionize's: one lag + running-sum window partitioned by
    the keys (single shuffle, no global window), then keep
    ``row_number() == 1`` per (keys, burst).
    """
    if window_seconds < 1:
        # fail fast: a zero/negative window silently dedups nothing
        # (r17 edge sweep)
        raise ValueError(
            f"dedup_within_window: window_seconds must be >= 1, got "
            f"{window_seconds}"
        )
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_burst = (
        prev_us.isNull()
        | ((F.unix_micros(F.col(ts_col)) - prev_us) > window_seconds * 1_000_000)
    ).cast("int")
    burst = F.sum(new_burst).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_burst = Window.partitionBy(*keys, "__burst").orderBy(ts_col, id_col)
    return (
        events.withColumn("__burst", burst)
        .withColumn("__rn", F.row_number().over(w_burst))
        .filter(F.col("__rn") == 1)
        .drop("__burst", "__rn")
    )


def event_paths(
    events: DataFrame,
    depth: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top entry paths: per user, the first ``depth`` event types in time
    order joined with '>' — then path frequencies across users
    (``(path, n_users)``).  The onboarding-funnel exploration view every
    product-analytics stack ships (GA "path exploration" shape).

    Plan: ONE aggregation — per user, ``min(struct(ts, id, type))`` ×
    ``depth`` ranks via sorted ``collect_list`` is avoided; instead the
    first events materialize through a bounded sort_array over the
    per-user collected (ts, id, type) structs, sliced to ``depth``.  The
    collect_list is per-user bounded by the same argument as
    ``funnel_one_scan`` (`events.py:82-84`): user event counts are
    bounded in practice and the slice happens inside the same
    projection.  One shuffle on the user key + one on the path.
    """
    per_user = events.groupBy(user_col).agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
                )
            ),
            1,
            depth,
        ).alias("__first")
    )
    path = F.array_join(
        F.transform(F.col("__first"), lambda s: s[type_col]), ">"
    )
    return (
        per_user.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def ab_lift(
    events: DataFrame,
    variant_col: Column,
    convert_when: Column,
    user_col: str = "user_id",
    variant_a: str = "a",
    variant_b: str = "b",
) -> DataFrame:
    """Two-variant conversion lift with the two-proportion z-statistic —
    the experiment-readout primitive: per variant, exposed users and
    converted users; plus absolute lift and the pooled-variance z score
    of ``variant_b`` over ``variant_a``.

    ``variant_col`` labels each EVENT row with its arm (derive from a
    stable user hash for a real assignment); pass ``variant_a`` /
    ``variant_b`` when the labels aren't the default 'a'/'b' (e.g.
    'control'/'treatment').  A user converts if ANY of their events
    matches ``convert_when``.  ALWAYS emits exactly one row: an arm with
    no exposed users shows ``n=0`` and NULL rates — a visible readout,
    never a silently empty frame a caller could mistake for "no data"
    (the old filter+crossJoin shape produced zero rows on any label
    mismatch).  One user-keyed aggregation + one global rollup; the z
    arithmetic is column math on that 1-row frame.  Rounded to 6 dp on
    the deterministic single expression, so engines agree.
    """
    per_user = events.groupBy(
        F.col(user_col).alias("user"), variant_col.alias("variant")
    ).agg(F.max(convert_when.cast("int")).alias("converted"))
    is_a = F.col("variant") == variant_a
    is_b = F.col("variant") == variant_b
    j = per_user.agg(
        # coalesce: a global agg over ZERO users yields NULL sums — emit
        # honest zeros instead
        F.coalesce(F.sum(is_a.cast("long")), F.lit(0)).alias("na"),
        F.coalesce(
            F.sum(F.when(is_a, F.col("converted")).otherwise(0)), F.lit(0)
        ).alias("ca"),
        F.coalesce(F.sum(is_b.cast("long")), F.lit(0)).alias("nb"),
        F.coalesce(
            F.sum(F.when(is_b, F.col("converted")).otherwise(0)), F.lit(0)
        ).alias("cb"),
    )
    pa = F.when(F.col("na") > 0, F.col("ca") / F.col("na"))
    pb = F.when(F.col("nb") > 0, F.col("cb") / F.col("nb"))
    pooled = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    se = F.sqrt(
        pooled * (1 - pooled) * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return j.select(
        "na",
        "ca",
        "nb",
        "cb",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pb - pa, 6).alias("abs_lift"),
        # degenerate experiments (0% or 100% pooled conversion, or an
        # empty arm) have no sampling variance — z is undefined, NULL.
        # The arm-count guard is the OUTER when so the pooled/se
        # divisions (which ANSI mode faults on /0) are never evaluated
        # for an empty arm — CaseWhen only computes the matched branch.
        F.when(
            (F.col("na") > 0) & (F.col("nb") > 0),
            F.when(se > 0, F.round((pb - pa) / se, 6)),
        ).alias("z"),
    )


def activity_streaks(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks (gaps-and-islands):
    one row per streak with its start day, end day, and length — the
    engagement/retention primitive behind "N-day streak" features.

    Plan: collapse to distinct (user, day) first (the big win — the
    window then runs over at most 1 row per user-day, not per event),
    then the classic island key ``epoch_day − row_number()`` (constant
    within a run of consecutive days) and one (user, island) count.
    Two user-keyed shuffles total, both on day-grain rows.
    """
    day = F.to_date(F.col(ts_col))
    days = events.select(
        F.col(user_col).alias("user"), day.alias("d")
    ).distinct()
    w = Window.partitionBy("user").orderBy("d")
    ed = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    islands = days.withColumn(
        "__island", ed - F.row_number().over(w)
    )
    return (
        islands.groupBy("user", "__island")
        .agg(
            F.min("d").alias("streak_start"),
            F.max("d").alias("streak_end"),
            F.count(F.lit(1)).alias("streak_days"),
        )
        # output keeps the CALLER's user column name (a hardcoded "user"
        # broke joins for any user_col != "user" — r8 review)
        .select(
            F.col("user").alias(user_col),
            "streak_start",
            "streak_end",
            "streak_days",
        )
    )


def funnel_timing(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-time profile per adjacent funnel stage: one long-form
    row per (stage_from, stage_to) with converting-user count and exact
    median / p90 seconds between the stages — the "where does the funnel
    stall" readout on top of :func:`funnel_one_scan`.

    Plan: the one-scan funnel's user-grain frame, then ONE global
    aggregation computing every pair's count and percentiles (3·(k−1)
    aggregates) unpivoted via ``stack`` — no per-pair jobs.  The global
    percentile aggregate runs on the user-grain frame (per-user rows,
    not per-event), with partial aggregation; the huge-cardinality
    escape hatch is the histogram sketch, as everywhere.
    """
    # POSITIONAL aliases + backtick-quoted column refs + escaped string
    # literals: raw stage names spliced into F.expr broke on any
    # non-identifier character (hyphens, quotes, dots) — see
    # :func:`_check_stage_names` (r8 review + r8 advice).
    _check_stage_names(stages)

    def lit_str(v: str) -> str:
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"

    f = funnel_one_scan(events, stages, user_col, ts_col, type_col)
    aggs = []
    for i, (s1, s2) in enumerate(zip(stages, stages[1:])):
        diff = (
            f"(unix_micros(`t_{s2}`) - unix_micros(`t_{s1}`)) / 1e6"
        )
        aggs += [
            # backtick-quote the count ref too: F.col parses dots as
            # nested-field paths, so 'checkout.v2'-style stage names
            # (accepted by funnel_one_scan) failed analysis (r8 advice)
            F.count(F.col(f"`t_{s2}`")).alias(f"__n_{i}"),
            F.round(F.expr(f"percentile({diff}, 0.5)"), 6).alias(f"__med_{i}"),
            F.round(F.expr(f"percentile({diff}, 0.9)"), 6).alias(f"__p90_{i}"),
        ]
    wide = f.agg(*aggs)
    stack_args = ", ".join(
        f"{lit_str(s1)}, {lit_str(s2)}, __n_{i}, __med_{i}, __p90_{i}"
        for i, (s1, s2) in enumerate(zip(stages, stages[1:]))
    )
    return wide.select(
        F.expr(
            f"stack({len(stages) - 1}, {stack_args}) AS "
            "(stage_from, stage_to, n_converted, median_seconds, p90_seconds)"
        )
    )


def cohort_revenue(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cohort LTV triangle: revenue per (first-activity-day cohort,
    day offset) — the money twin of :func:`retention_cohorts`, whose
    cumulative row-sums are the lifetime-value curves.  Same plan shape:
    one user-grain min-date agg, one co-keyed join back, one
    (cohort, offset) aggregation — revenue summed exactly
    (`functions/numeric.py::decimal_sum` semantics)."""
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum

    return (
        _cohort_frame(events, user_col, ts_col, extra=[value_col])
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.count_distinct(user_col).alias("n_users"),
            decimal_sum(F.col(value_col)).alias("revenue"),
        )
    )


def attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Marketing-style touch attribution: for every conversion event, the
    LAST and FIRST preceding non-conversion touch by the same user —
    ``(user, conversion id/ts/value, channel_last, channel_first)``, one
    row per conversion.  Conversions with no preceding touch emit NULL
    channels (callers bucket them as "direct" — declared, not silently
    dropped).

    Plan: one user-keyed shuffle; both channels come from the same
    window pass (``last``/``first`` with ``ignorenulls`` over frames
    ending at 1 PRECEDING — prior conversions are masked to NULL, not
    excluded, so the frame is pure ROWS arithmetic).  Ordering ties
    break on ``id_col`` — deterministic under any partitioning.
    Downstream revenue-per-channel is a plain aggregate over this frame
    (see `evt_attribution`); windows are user-bounded, so no key is
    hotter than its own event count.
    """
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("channel_last", F.last(touch, ignorenulls=True).over(w))
        .withColumn("channel_first", F.first(touch, ignorenulls=True).over(w))
        .filter(F.col(type_col) == conversion_type)
        .select(
            user_col,
            id_col,
            ts_col,
            value_col,
            "channel_last",
            "channel_first",
        )
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over event types:
    ``(prev_type, next_type, n, p)`` with row-normalized probabilities —
    the UX-flow / journey model behind "what do users do after X"
    (`evt_paths` enumerates literal k-prefixes; this is the stationary
    pairwise model over ALL transitions).

    Plan: one user-keyed window (`lag` over (ts, id) — deterministic tie
    order), one (prev, next)-keyed count, then row-normalization against
    the per-prev totals via a window over the TYPE-cardinality count
    frame (bounded by |types|², never by data).  First events per user
    have no predecessor and are excluded — transitions, not starts; the
    start distribution is one `groupBy` away if a caller wants it.
    ``p`` is one deterministic double division rounded to 6 dp.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        df.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_row).cast("double"), 6
        ).alias("p"),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Session-GRAIN rollup over :func:`sessionize` labels:
    ``(user, session_idx, n_events, started_at, duration_us,
    session_value, bounce)`` — the per-session feature frame engagement
    and funnel models consume (the event-grain labels stay available
    from `sessionize` itself).

    ``duration_us`` is the exact integer-µs span (no float boundary);
    ``session_value`` is the exact-decimal sum of ``value_col``;
    ``bounce`` is the single-event-session flag.  Plan: the sessionize
    window then ONE (user, session) aggregation — both shuffle on the
    user key, so AQE coalesces them into one exchange's worth of
    movement per key.
    """
    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum

    labeled = sessionize(
        events, gap_seconds, user_col, ts_col, id_col, keep_cols=[value_col]
    )
    n = F.count(F.lit(1))
    return labeled.groupBy(user_col, "session_idx").agg(
        n.alias("n_events"),
        F.min(ts_col).alias("started_at"),
        (
            F.max(F.unix_micros(F.col(ts_col)))
            - F.min(F.unix_micros(F.col(ts_col)))
        ).alias("duration_us"),
        decimal_sum(F.col(value_col)).alias("session_value"),
        (n == 1).alias("bounce"),
    )


def stickiness(
    df: DataFrame, ts_col: str = "ts", user_col: str = "user_id"
) -> DataFrame:
    """DAU/MAU stickiness per day: ``(day, dau, mau, stickiness)`` with
    ``mau`` the distinct-user count over the WHOLE input frame (callers
    window the input to the month/period of interest — same contract as
    `retention_cohorts` taking a pre-filtered frame).  The canonical
    engagement ratio: what share of the period's actives show up on a
    given day.

    Shape: one per-day distinct aggregation + one global distinct
    scalar broadcast back — the global side is a single row, so the
    join is a broadcast nested loop over day-cardinality rows, never a
    shuffle of the fact."""
    day = F.to_date(F.col(ts_col)).alias("day")
    dau = (
        df.select(day, F.col(user_col))
        .groupBy("day")
        .agg(F.count_distinct(F.col(user_col)).alias("dau"))
    )
    mau = df.agg(F.count_distinct(F.col(user_col)).alias("mau"))
    return dau.crossJoin(F.broadcast(mau)).select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("mau").cast("long").alias("mau"),
        F.round(F.col("dau") * 1.0 / F.col("mau"), 6).alias("stickiness"),
    )
