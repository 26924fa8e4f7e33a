"""Window operators (SURVEY.md §2.6).

``win_rownum_topk`` / ``win_rownum_flag`` are stock ``row_number`` windows.
The interesting one is ``win_percent_rank``: the reference ranks the WHOLE
dataset with an unpartitioned ``Window.orderBy(...)``
(``/root/reference/ETL-Airflow/dags/tasks/customer_sales_report_task.py:
101-106``, anti-pattern A4) — Spark executes that as a single task holding
every row.  :func:`global_percent_rank` computes the *exact* same values
scalably: rank only the distinct values (a frame that is orders of magnitude
smaller), derive each value's ``percent_rank`` from cumulative counts, and
broadcast-join it back.  Ties receive identical percent_rank either way
(SQL ``percent_rank = (rank - 1) / (n - 1)`` with ``rank`` = 1 + count of
rows sorting strictly before).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """`win_rownum_topk`: row_number ≤ k per group, deterministic iff
    ``order_by`` is a total order (pass tiebreak columns!).

    Scale: one hash-shuffle on ``partition_by``; skewed groups are split by
    AQE.  No global sort.
    """
    window = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn(rank_col, F.row_number().over(window)).filter(
        F.col(rank_col) <= k
    )
    return ranked if keep_rank else ranked.drop(rank_col)


def global_percent_rank(
    df: DataFrame,
    value_col: str,
    out_col: str = "percent_rank",
    descending: bool = True,
) -> DataFrame:
    """Exact global ``percent_rank`` without a single-partition window.

    Algorithm (3 narrow steps instead of one all-rows sort into 1 task):
      1. ``groupBy(value)`` → distinct values + multiplicities (shuffle of
         collapsed groups; distinct-value cardinality ≪ row count).
      2. Tiny window over the distinct values → cumulative count of rows
         sorting strictly before each value; ``n`` via a global sum.
      3. Broadcast-join the (value → percent_rank) map back onto ``df``.

    Matches SQL ``PERCENT_RANK() OVER (ORDER BY value [DESC])`` exactly,
    including tie semantics.
    """
    order = F.desc(value_col) if descending else F.asc(value_col)
    counts = df.groupBy(value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    # The distinct-value frame is small; this window is cheap by design.
    tiny_window = (
        Window.orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total_window = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = counts.select(
        value_col,
        F.coalesce(F.sum("__cnt").over(tiny_window), F.lit(0)).alias("__before"),
        F.sum("__cnt").over(total_window).alias("__total"),
    ).select(
        value_col,
        F.when(F.col("__total") > 1, F.col("__before") / (F.col("__total") - 1))
        .otherwise(F.lit(0.0))
        .alias(out_col),
    )
    return df.join(F.broadcast(ranked), on=value_col, how="left")
