"""Mart 1 — supplier performance (the flagship).

Re-expression of ``/root/reference/ETL-Airflow/dags/tasks/
supplier_performance_task.py:14-169``: exclude cancelled sales, join
products then RIGHT-join suppliers (keep suppliers with no sales), derive
``REVENUE``, aggregate per supplier (sum revenue, sum quantity, distinct
product count), pick each supplier's top-selling product by revenue
(tiebreak: product name — ``supplier_performance_task.py:94``), default
"No sales"/zeros for idle suppliers, stamp ``DAY_DT``.

Scale shape: one shuffle for the fact-side aggregation; all dimension joins
(products, suppliers) broadcast.  The top-product window partitions by
supplier AFTER a per-(supplier, product) pre-aggregation, so the window input
is already collapsed — no wide-row window at fact scale.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum
from kusuma_metamorph_etl_spark.sources.sinks import stamp_snapshot

FINAL_COLUMNS = [
    "DAY_DT",
    "SUPPLIER_ID",
    "SUPPLIER_NAME",
    "TOTAL_REVENUE",
    "TOTAL_PRODUCTS_SOLD",
    "TOTAL_STOCK_SOLD",
    "TOP_SELLING_PRODUCT",
]


def supplier_performance(
    sales: DataFrame,
    products: DataFrame,
    suppliers: DataFrame,
    run_date: dt.date | str | None = None,
    supplier_key_from: str = "products",
    broadcast_dims: bool = True,
) -> DataFrame:
    """Build the supplier-performance mart.

    ``supplier_key_from``: ``"products"`` (reference layout — the FK lives
    on the product dim) or ``"sales"`` (TPC-H layout — ``l_suppkey`` on the
    fact row).
    """
    if supplier_key_from not in ("products", "sales"):
        raise ValueError("supplier_key_from must be 'products' or 'sales'")

    maybe_broadcast = F.broadcast if broadcast_dims else (lambda df: df)

    # FIL: drop cancelled sales (predicate reaches the scan via Catalyst).
    fil_sales = sales.filter(F.col("ORDER_STATUS") != "Cancelled")

    # JNR_1: sales ⟕ products — alias-disciplined disambiguation
    # (`join_disambig`); price always comes from the product dim.
    supplier_key = (
        F.col("p.SUPPLIER_ID") if supplier_key_from == "products" else F.col("s.SUPPLIER_ID")
    )
    jnr_products = (
        fil_sales.alias("s")
        .join(
            maybe_broadcast(products.alias("p")),
            on=F.col("s.PRODUCT_ID") == F.col("p.PRODUCT_ID"),
            how="left",
        )
        .select(
            F.col("s.PRODUCT_ID").alias("PRODUCT_ID"),
            F.col("s.QUANTITY").alias("QUANTITY"),
            supplier_key.alias("SUPPLIER_ID"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("p.SELLING_PRICE").alias("SELLING_PRICE"),
        )
    )

    # EXP: REVENUE = QUANTITY * SELLING_PRICE on the fact grain.
    fact = jnr_products.withColumn(
        "REVENUE", F.col("QUANTITY") * F.col("SELLING_PRICE")
    )

    # AGG FIRST, join the supplier dim after: the reference's fact ⟖
    # suppliers right-join runs BEFORE aggregation, which forces a
    # full-fact SortMergeJoin (an outer join cannot broadcast its
    # preserved side).  Aggregating to supplier grain first collapses the
    # fact to dim cardinality, so the outer join below broadcasts.  Rows
    # whose supplier is absent from the dim drop out either way; idle
    # suppliers surface as nulls and take the fillna defaults — identical
    # output, one fewer fact-sized shuffle.
    agg_fact = fact.groupBy("SUPPLIER_ID").agg(
        # exact decimal sum: order-independent across partitions/engines
        decimal_sum(F.col("REVENUE"), 2).alias("TOTAL_REVENUE"),
        F.countDistinct("PRODUCT_ID").alias("TOTAL_PRODUCTS_SOLD"),
        F.sum("QUANTITY").alias("TOTAL_STOCK_SOLD"),
    )

    # JNR_2: suppliers ⟕ per-supplier totals (keeps suppliers w/o sales).
    agg = (
        suppliers.alias("r")
        .join(
            maybe_broadcast(agg_fact.alias("l")),
            on=F.col("r.SUPPLIER_ID") == F.col("l.SUPPLIER_ID"),
            how="left",
        )
        .select(
            F.col("r.SUPPLIER_ID").alias("SUPPLIER_ID"),
            F.col("r.SUPPLIER_NAME").alias("SUPPLIER_NAME"),
            F.col("l.TOTAL_REVENUE").alias("TOTAL_REVENUE"),
            F.col("l.TOTAL_PRODUCTS_SOLD").alias("TOTAL_PRODUCTS_SOLD"),
            F.col("l.TOTAL_STOCK_SOLD").alias("TOTAL_STOCK_SOLD"),
        )
    )

    # WIN: top product per supplier over a per-(supplier, product)
    # pre-aggregation; revenue desc, product name as deterministic tiebreak.
    # Exact decimal revenue here too: PRODUCT_REVENUE only orders the
    # window, but a last-ulp difference between two products' double sums
    # would flip the top-product pick nondeterministically.
    per_product = (
        # PRODUCT_NAME not-null too: a sale whose PRODUCT_ID misses the
        # product dim keeps its revenue but has no name — under nulls-
        # first ASC ordering that group could win the window and surface
        # as "No sales" NEXT TO nonzero TOTAL_REVENUE (r8 review).  Top
        # product means top NAMED product; unmatched-dim revenue still
        # counts in the totals above.
        fact.filter(
            F.col("PRODUCT_ID").isNotNull() & F.col("PRODUCT_NAME").isNotNull()
        )
        .groupBy("SUPPLIER_ID", "PRODUCT_NAME")
        .agg(F.sum(F.col("REVENUE").cast("decimal(38,6)")).alias("PRODUCT_REVENUE"))
    )
    top_window = Window.partitionBy("SUPPLIER_ID").orderBy(
        F.desc("PRODUCT_REVENUE"), F.asc("PRODUCT_NAME")
    )
    top_products = (
        per_product.withColumn("rn", F.row_number().over(top_window))
        .filter(F.col("rn") == 1)
        .select("SUPPLIER_ID", F.col("PRODUCT_NAME").alias("TOP_SELLING_PRODUCT"))
    )

    # JNR_3 + null handling: "No sales" default and zero-filled measures
    # (`cond_null_default`, `null_fillna_map`).
    enriched = (
        agg.join(maybe_broadcast(top_products), on="SUPPLIER_ID", how="left")
        .withColumn(
            "TOP_SELLING_PRODUCT",
            F.coalesce(F.col("TOP_SELLING_PRODUCT").cast("string"), F.lit("No sales")),
        )
        .fillna({"TOTAL_REVENUE": 0.0, "TOTAL_PRODUCTS_SOLD": 0, "TOTAL_STOCK_SOLD": 0})
    )

    return stamp_snapshot(enriched, run_date).select(*FINAL_COLUMNS)
