"""Adapter: driver TPC-H-ish test tables → reference-domain tables.

The reference operates on sales/products/customers/suppliers
(FIXTURES.md §A); the driver test data is TPC-H-ish (FIXTURES.md §B).  This
module maps one onto the other with *deterministic, oracle-reproducible*
expressions so every mart can run (and be hash-checked against DuckDB) on
`/root/testdata`:

* ``lineitem`` → sales: one sale per line item; ``ORDER_STATUS`` derived
  from ``l_returnflag`` ('R' → Cancelled, else Delivered — the
  not-cancelled filter analog); ``DISCOUNT`` rescaled to the reference's
  percent convention (FIXTURES.md: ``1 - DISCOUNT/100``).
* ``part`` → products: ``SELLING_PRICE = p_retailprice``; ``COST_PRICE``/
  ``STOCK_QUANTITY``/``REORDER_LEVEL`` are deterministic derivations (the
  TPC-H schema has no direct analogs).
* ``supplier`` → suppliers, ``customer`` → customers.

TPC-H keeps the supplier key on the line item (``l_suppkey``) while the
reference keeps it on products — the marts accept either
(``supplier_key_from``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.functions.numeric import decimal_round


def sales_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """lineitem → sales (SALE_ID, PRODUCT_ID, SUPPLIER_ID, QUANTITY,
    DISCOUNT, SALE_DATE, ORDER_STATUS...).  No CUSTOMER_ID — the customer
    key lives on orders; use :func:`sales_with_customers` when needed."""
    return lineitem.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("SALE_ID"),
        F.col("l_orderkey").alias("ORDER_ID"),
        F.col("l_partkey").alias("PRODUCT_ID"),
        F.col("l_suppkey").alias("SUPPLIER_ID"),
        F.col("l_quantity").alias("QUANTITY"),
        (F.col("l_discount") * F.lit(100.0)).alias("DISCOUNT"),
        F.col("l_shipdate").cast("date").alias("SALE_DATE"),
        F.when(F.col("l_returnflag") == "R", F.lit("Cancelled"))
        .otherwise(F.lit("Delivered"))
        .alias("ORDER_STATUS"),
    )


def sales_with_customers(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """sales + CUSTOMER_ID via the orders fact (fact-to-fact equi-join on
    the order key — co-partitioned shuffle join, never broadcast: both
    sides scale with the data)."""
    sales = sales_from_lineitem(lineitem)
    keys = orders.select(
        F.col("o_orderkey").alias("ORDER_ID"),
        F.col("o_custkey").alias("CUSTOMER_ID"),
    )
    return sales.join(keys, on="ORDER_ID", how="left")


def products_from_part(part: DataFrame) -> DataFrame:
    """part → products.  COST_PRICE / STOCK_QUANTITY / REORDER_LEVEL are
    deterministic functions of part columns (no TPC-H analog exists)."""
    return part.select(
        F.col("p_partkey").alias("PRODUCT_ID"),
        F.col("p_name").alias("PRODUCT_NAME"),
        F.col("p_type").alias("CATEGORY"),
        F.col("p_retailprice").alias("SELLING_PRICE"),
        # decimal-exact: price*0.7 is a 3-decimal value, so plain
        # round(double, 2) sits on a half-cent boundary for ~10% of parts
        # and Spark/DuckDB double rounding diverge there.
        decimal_round(F.col("p_retailprice") * F.lit(0.7), 2).alias("COST_PRICE"),
        (F.col("p_size") * F.lit(100)).alias("STOCK_QUANTITY"),
        (F.col("p_size") * F.lit(40)).alias("REORDER_LEVEL"),
    )


def suppliers_from_supplier(supplier: DataFrame) -> DataFrame:
    return supplier.select(
        F.col("s_suppkey").alias("SUPPLIER_ID"),
        F.col("s_name").alias("SUPPLIER_NAME"),
    )


def customers_from_customer(customer: DataFrame) -> DataFrame:
    """customer → customers (CITY stood in by the market segment — the
    TPC-H customer has no city column)."""
    return customer.select(
        F.col("c_custkey").alias("CUSTOMER_ID"),
        F.col("c_name").alias("NAME"),
        F.col("c_mktsegment").alias("CITY"),
    )
