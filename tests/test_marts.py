"""Golden/property tests for the three marts (SURVEY.md §5 strategies
3-4), on controlled in-memory fixtures where the expected output is
hand-checkable, plus structural properties on sf0.001."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.marts import (
    customer_sales_report,
    supplier_performance,
)
from kusuma_metamorph_etl_spark.queries.marts import (
    mart_customer_sales_report,
    mart_supplier_performance,
)

RUN_DATE = "2024-06-01"


@pytest.fixture(scope="module")
def fixture_frames(spark):
    sales = spark.createDataFrame(
        [
            # SALE_ID, PRODUCT_ID, CUSTOMER_ID, QUANTITY, DISCOUNT, SALE_DATE, ORDER_STATUS
            ("s1", 1, 10, 2, 0.0, dt.date(2024, 5, 1), "Delivered"),
            ("s2", 1, 10, 1, 50.0, dt.date(2024, 5, 2), "Shipped"),
            ("s3", 2, 11, 5, 0.0, dt.date(2024, 5, 3), "Delivered"),
            ("s4", 2, 11, 1, 0.0, dt.date(2024, 5, 4), "Cancelled"),
        ],
        "SALE_ID string, PRODUCT_ID long, CUSTOMER_ID long, QUANTITY long,"
        " DISCOUNT double, SALE_DATE date, ORDER_STATUS string",
    )
    products = spark.createDataFrame(
        [
            # PRODUCT_ID, PRODUCT_NAME, CATEGORY, SELLING_PRICE, SUPPLIER_ID
            (1, "Widget", "tools", 10.0, 100),
            (2, "Gadget", "toys", 20.0, 200),
        ],
        "PRODUCT_ID long, PRODUCT_NAME string, CATEGORY string,"
        " SELLING_PRICE double, SUPPLIER_ID long",
    )
    suppliers = spark.createDataFrame(
        [(100, "Acme"), (200, "Globex"), (300, "Idle Corp")],
        "SUPPLIER_ID long, SUPPLIER_NAME string",
    )
    customers = spark.createDataFrame(
        [(10, "Ada", "London"), (11, "Grace", "NYC")],
        "CUSTOMER_ID long, NAME string, CITY string",
    )
    return sales, products, suppliers, customers


def test_supplier_performance_fixture(spark, fixture_frames):
    sales, products, suppliers, _ = fixture_frames
    out = supplier_performance(sales, products, suppliers, run_date=RUN_DATE)
    rows = {r["SUPPLIER_ID"]: r.asDict() for r in out.collect()}

    assert set(rows) == {100, 200, 300}
    # Cancelled s4 excluded: Acme sold 2*10 + 1*10 = 30 over one product.
    assert rows[100]["TOTAL_REVENUE"] == 30.0
    assert rows[100]["TOTAL_PRODUCTS_SOLD"] == 1
    assert rows[100]["TOTAL_STOCK_SOLD"] == 3
    assert rows[100]["TOP_SELLING_PRODUCT"] == "Widget"
    assert rows[200]["TOTAL_REVENUE"] == 100.0  # 5 * 20, s4 cancelled
    # Right join keeps the idle supplier with defaults (reference semantics).
    assert rows[300]["TOTAL_REVENUE"] == 0.0
    assert rows[300]["TOTAL_PRODUCTS_SOLD"] == 0
    assert rows[300]["TOP_SELLING_PRODUCT"] == "No sales"
    # Injected run_date is reproducible (no current_date() flake).
    assert all(r["DAY_DT"] == dt.date(2024, 6, 1) for r in rows.values())


def test_customer_sales_report_fixture(spark, fixture_frames):
    sales, products, _, customers = fixture_frames
    out = customer_sales_report(
        sales,
        products,
        customers,
        run_date=RUN_DATE,
        run_ts=f"{RUN_DATE} 00:00:00",
    )
    rows = {r["SALE_ID"]: r.asDict() for r in out.collect()}

    assert set(rows) == {"s1", "s2", "s3"}  # cancelled s4 dropped
    # SALE_AMOUNT = round(qty * price * (1 - disc/100), 2).
    assert rows["s1"]["SALE_AMOUNT"] == 20.0
    assert rows["s2"]["SALE_AMOUNT"] == 5.0
    assert rows["s3"]["SALE_AMOUNT"] == 100.0
    # Global percent-rank desc over amounts (100, 20, 5) → pr = 0, .5, 1
    # → Gold (s3), Silver (s1), Bronze (s2) at the closed boundaries.
    assert rows["s3"]["LOYALTY_TIER"] == "Gold"
    assert rows["s1"]["LOYALTY_TIER"] == "Silver"
    assert rows["s2"]["LOYALTY_TIER"] == "Bronze"
    # One TOP_PERFORMER per customer — the largest sale.
    assert rows["s1"]["TOP_PERFORMER"] is True
    assert rows["s2"]["TOP_PERFORMER"] is False
    assert rows["s3"]["TOP_PERFORMER"] is True
    assert rows["s1"]["CUSTOMER_NAME"] == "Ada"
    assert rows["s1"]["SALE_MONTH"] == 5 and rows["s1"]["SALE_YEAR"] == 2024


def test_supplier_mart_structural_sf0001(spark, sf_small):
    out = mart_supplier_performance(spark, sf_small).collect()
    assert len(out) == 10  # one row per supplier, right-join preserved
    assert all(r["total_revenue"] >= 0 for r in out)
    assert all(r["top_selling_product"] is not None for r in out)


def test_customer_report_top_performer_unique_sf0001(spark, sf_small):
    out = mart_customer_sales_report(spark, sf_small)
    per_customer = (
        out.groupBy("customer_id")
        .agg(F.sum(F.col("top_performer").cast("int")).alias("n_top"))
        .collect()
    )
    assert per_customer and all(r["n_top"] == 1 for r in per_customer)


def test_customer_report_tier_boundaries_sf0001(spark, sf_small):
    out = mart_customer_sales_report(spark, sf_small)
    # Recompute percent_rank independently and check tier assignment.
    ranked = out.withColumn(
        "pr2", F.percent_rank().over(Window.orderBy(F.desc("sale_amount")))
    )
    bad = ranked.filter(
        (
            (F.col("pr2") <= 0.2) & (F.col("loyalty_tier") != "Gold")
        )
        | ((F.col("pr2") > 0.2) & (F.col("pr2") <= 0.5) & (F.col("loyalty_tier") != "Silver"))
        | ((F.col("pr2") > 0.5) & (F.col("loyalty_tier") != "Bronze"))
    ).count()
    assert bad == 0


def test_paired_curation_kills_every_planted_mismatch(spark, sf_small):
    """mart_paired_curation's agreement gate (r16): every planted
    mismatched pair (doc_id % 5 == 0 carries its neighbor's image
    embedding) must die by MEASURED agreement — random 64-dim cosines
    sit ~4σ below the 0.5 floor — while every surviving matched pair
    reads agreement 1.0 (self-cosine) and respects both quality gates.
    (Boundary, ADVICE r16: a corpus whose max doc_id % 5 == 0 kills
    that one mismatch by the embedding inner join instead — same zero
    survivors, asserted here either way.)"""
    from kusuma_metamorph_etl_spark.queries.ext_marts import (
        mart_paired_curation,
    )

    out = mart_paired_curation(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r["doc_id"] % 5 != 0, f"planted mismatch survived: {r}"
        assert r["agreement"] == 1.0
        assert r["quality_score"] >= 0.05
        assert r["width"] >= 5 and r["height"] >= 5
