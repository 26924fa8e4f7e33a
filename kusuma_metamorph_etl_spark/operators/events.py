"""[EXT] Event-sequence analytics over the ``events`` fact.

Funnel analysis: per user, the earliest time each stage is reached at or
after the previous stage's time (the standard ordered-funnel rule).  The
reference has no event-sequence operators; this extends the engine's
sessionization/attribution family (`streaming/windows.py::session_agg`,
`streaming/joins.py::attribution_join`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
            .join(current.select(user_col, prev), on=user_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(stage_col(s)))
        )
        current = current.join(nxt, on=user_col, how="left")
        prev = stage_col(s)
    return current
