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

from pyspark.sql import Column, DataFrame
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
