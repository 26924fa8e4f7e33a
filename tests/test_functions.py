"""Function-level tests: cross-engine decimal rounding (property-tested
against Python's Decimal, the same HALF_UP semantics DuckDB applies) and
JDBC reader/writer option assembly (no DB in this environment)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.functions.numeric import decimal_round
from kusuma_metamorph_etl_spark.sources.jdbc import (
    jdbc_reader,
    reader_options,
    writer_options,
)

_spark = None


def _session():
    # hypothesis drives many examples through one cached session; the
    # conftest fixture can't be injected into @given, hence this shim.
    global _spark
    if _spark is None:
        from kusuma_metamorph_etl_spark.session import get_session

        _spark = get_session()
    return _spark


@settings(max_examples=30, deadline=None)
@given(
    qty=st.integers(min_value=1, max_value=1000),
    cents=st.integers(min_value=1, max_value=100_000),  # price in cents
    disc_bp=st.integers(min_value=0, max_value=10_000),  # discount in bp
)
def test_decimal_round_matches_decimal_half_up(qty, cents, disc_bp):
    """SALE_AMOUNT-shaped products round exactly like true-decimal HALF_UP."""
    price = cents / 100.0
    disc = disc_bp / 100.0  # percent with 2 decimals
    expected = float(
        (
            Decimal(qty) * Decimal(cents) / 100 * (1 - Decimal(disc_bp) / 10_000)
        ).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    spark = _session()
    df = spark.createDataFrame(
        [(qty, price, disc)], "qty long, price double, disc double"
    )
    got = df.select(
        decimal_round(F.col("qty") * F.col("price") * (1 - F.col("disc") / 100), 2)
    ).collect()[0][0]
    assert got == expected


def test_jdbc_reader_partitioned_options():
    opts = reader_options(
        url="jdbc:postgresql://db:5432/x",
        table="raw.sales_pre",
        user="u",
        password="p",
        partition_column="sale_id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "sale_id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"
    assert opts["lowerBound"] == "0" and opts["upperBound"] == "1000000"


def test_jdbc_reader_requires_bounds():
    with pytest.raises(ValueError):
        reader_options(
            "jdbc:postgresql://db/x", "t", "u", "p", partition_column="id"
        )


def test_jdbc_reader_builds(spark):
    reader = jdbc_reader(
        spark, url="jdbc:postgresql://db/x", table="t", user="u", password="p"
    )
    assert reader is not None  # option assembly applied without a DB


def test_jdbc_writer_batched():
    opts = writer_options("jdbc:postgresql://db/x", "t", "u", "p")
    assert opts["batchsize"] == "10000"


# ---------------------------------------------------------------- A/B lift

def test_ab_lift_matches_hand_z(spark):
    import math

    from pyspark.sql import functions as F

    from kusuma_metamorph_etl_spark.operators.events import ab_lift

    # 10 users per variant; a converts 2, b converts 6
    rows = []
    for u in range(20):
        variant_even = u % 2 == 0  # evens = 'a'
        converts = (u in (0, 2)) if variant_even else (u in (1, 3, 5, 7, 9, 11))
        rows.append((u, "buy" if converts else "view"))
        rows.append((u, "view"))
    df = spark.createDataFrame(rows, ["user_id", "event_type"])
    out = ab_lift(
        df,
        variant_col=F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"),
        convert_when=F.col("event_type") == "buy",
    ).collect()[0]
    assert (out["na"], out["ca"], out["nb"], out["cb"]) == (10, 2, 10, 6)
    pa, pb, pooled = 0.2, 0.6, 0.4
    se = math.sqrt(pooled * (1 - pooled) * (1 / 10 + 1 / 10))
    assert abs(out["z"] - round((pb - pa) / se, 6)) < 1e-9
    assert out["abs_lift"] == 0.4


def test_ab_lift_degenerate_z_is_null(spark):
    from pyspark.sql import functions as F

    from kusuma_metamorph_etl_spark.operators.events import ab_lift

    df = spark.createDataFrame(
        [(0, "buy"), (1, "buy"), (2, "buy"), (3, "buy")],
        ["user_id", "event_type"],
    )
    out = ab_lift(
        df,
        variant_col=F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"),
        convert_when=F.col("event_type") == "buy",
    ).collect()[0]
    assert out["rate_a"] == out["rate_b"] == 1.0
    assert out["z"] is None  # 100% pooled conversion: no variance, no z
