"""Hypothesis property tests for the custom algorithms: the union-merge
as-of join against a brute-force Python oracle, and the distributed
global percent_rank against Spark's own single-partition window."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.joins import asof_join
from kusuma_metamorph_etl_spark.operators.windows import global_percent_rank

_spark = None


def _session():
    global _spark
    if _spark is None:
        from kusuma_metamorph_etl_spark.session import get_session

        _spark = get_session()
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _ts(minutes: int) -> dt.datetime:
    return dt.datetime(2024, 6, 1) + dt.timedelta(minutes=minutes)


@settings(max_examples=10, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 50)), min_size=1, max_size=12
    ),
    rights=st.dictionaries(
        st.tuples(st.integers(0, 1), st.integers(0, 50)),
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=0,
        max_size=12,
    ),
)
def test_asof_join_matches_bruteforce(lefts, rights):
    """For every left row: the attached value is the right row with the
    greatest ts ≤ left ts within the key (or null) — checked against a
    direct Python scan over all generated rows."""
    spark = _session()
    left = spark.createDataFrame(
        [(i, k, _ts(m)) for i, (k, m) in enumerate(lefts)],
        "row_id long, k long, ts timestamp",
    )
    right_rows = [(k, _ts(m), v) for (k, m), v in rights.items()]
    right = spark.createDataFrame(
        right_rows or [(None, None, None)],
        "k long, ts timestamp, px double",
    ).filter(F.col("k").isNotNull())

    got = {
        r["row_id"]: r["px"]
        for r in asof_join(left, right, on=["k"], value_cols=["px"]).collect()
    }

    for i, (k, m) in enumerate(lefts):
        candidates = [
            (mm, v) for (kk, mm), v in rights.items() if kk == k and mm <= m
        ]
        expected = max(candidates)[1] if candidates else None
        assert got[i] == expected, (i, k, m, candidates, got[i])


@settings(max_examples=10, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.integers(min_value=-5, max_value=5), st.none()),
        min_size=1,
        max_size=30,
    )
)
def test_global_percent_rank_matches_window(values):
    """Both percent_rank paths (broadcast rank map, range-partitioned
    prefix-sum) equal Spark's own single-partition window, including tie
    semantics."""
    spark = _session()
    df = spark.createDataFrame(
        [(i, None if v is None else float(v)) for i, v in enumerate(values)],
        "i long, v double",
    )
    reference = {
        r["i"]: r["pr"]
        for r in df.withColumn(
            "pr", F.percent_rank().over(Window.orderBy(F.desc("v")))
        ).collect()
    }
    for low_card in (True, False):
        got = {
            r["i"]: r["pr"]
            for r in global_percent_rank(
                df, "v", out_col="pr", descending=True, low_cardinality=low_card
            ).collect()
        }
        assert got == reference, f"low_cardinality={low_card}"


@settings(max_examples=10, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=-10_000_000, max_value=10_000_000),
        min_size=1,
        max_size=200,
    ),
    parts=st.sampled_from([1, 7, 32]),
)
def test_decimal_sum_is_order_independent(cents, parts):
    """decimal_sum equals the exact Python Decimal result bit-for-bit under
    ANY partitioning — the property round(sum(double)) lacks (its last ulp
    depends on partition combine order, the r1 agg_groupby_single fail)."""
    from decimal import ROUND_HALF_UP, Decimal

    from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum

    spark = _session()
    values = [c / 100.0 for c in cents]  # 2-dp money values
    expected = float(
        sum(Decimal(v).quantize(Decimal("0.000001"), ROUND_HALF_UP) for v in values)
        .quantize(Decimal("0.01"), ROUND_HALF_UP)
    )
    df = spark.createDataFrame([(v,) for v in values], "v double").repartition(parts)
    got = df.agg(decimal_sum(F.col("v"), 2).alias("s")).first()["s"]
    assert got == expected


def test_percent_rank_constant_column_falls_back():
    """A constant column yields at most one distinct quantile bound; the
    range path must fall back to the broadcast map instead of running a
    degenerate one-bucket window — asserted on the PLAN (both paths give
    the same values, so a value check alone cannot catch a dead guard)."""
    spark = _session()
    df = spark.createDataFrame([(i, 5.0) for i in range(10)], "i long, v double")
    out = global_percent_rank(
        df, "v", out_col="pr", descending=True, low_cardinality=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" not in plan  # broadcast-map path, not the bucketed one
    rows = out.collect()
    assert all(r["pr"] == 0.0 for r in rows)  # all tied -> rank 1 -> pr 0
