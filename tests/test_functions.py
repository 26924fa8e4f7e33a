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
