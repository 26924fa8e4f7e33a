"""The three reference marts as oracle-checked queries over the TPC-H
adapter (FIXTURES.md §B mapping).  These are the flagship end-to-end
checks: filter → multi-join → agg → window → null-handling in one plan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kusuma_metamorph_etl_spark.marts import (
    customer_sales_report,
    product_performance,
    supplier_performance,
)
from kusuma_metamorph_etl_spark.marts.tpch_adapter import (
    customers_from_customer,
    products_from_part,
    sales_from_lineitem,
    sales_with_customers,
    suppliers_from_supplier,
)
from kusuma_metamorph_etl_spark.registry import RUN_DATE, lowercase, register
from kusuma_metamorph_etl_spark.sources.catalog import load_table

RUN_TS = f"{RUN_DATE} 00:00:00"

# Shared oracle CTEs replicating marts/tpch_adapter.py exactly.
_ADAPTER_SQL = f"""
sales AS (
    SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS sale_id,
           l_orderkey AS order_id,
           l_partkey AS product_id,
           l_suppkey AS supplier_id,
           l_quantity AS quantity,
           l_discount * 100.0 AS discount,
           CAST(l_shipdate AS DATE) AS sale_date,
           CASE WHEN l_returnflag = 'R' THEN 'Cancelled' ELSE 'Delivered' END AS order_status
    FROM lineitem
),
products AS (
    SELECT p_partkey AS product_id,
           p_name AS product_name,
           p_type AS category,
           p_retailprice AS selling_price,
           CAST(ROUND(CAST(p_retailprice * 0.7 AS DECIMAL(38,6)), 2)
                AS DOUBLE) AS cost_price,
           p_size * 100 AS stock_quantity,
           p_size * 40 AS reorder_level
    FROM part
),
suppliers AS (
    SELECT s_suppkey AS supplier_id, s_name AS supplier_name FROM supplier
),
customers AS (
    SELECT c_custkey AS customer_id, c_name AS name, c_mktsegment AS city FROM customer
)
"""


def mart_supplier_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    products = products_from_part(load_table(spark, sf_dir, "part"))
    suppliers = suppliers_from_supplier(load_table(spark, sf_dir, "supplier"))
    return lowercase(
        supplier_performance(
            sales, products, suppliers, run_date=RUN_DATE, supplier_key_from="sales"
        )
    )


register(
    "mart_supplier_performance",
    f"""
WITH {_ADAPTER_SQL},
fil AS (SELECT * FROM sales WHERE order_status <> 'Cancelled'),
joined AS (
    SELECT s.supplier_id, s.product_id, s.quantity,
           p.product_name, s.quantity * p.selling_price AS revenue
    FROM fil s LEFT JOIN products p USING (product_id)
),
agg AS (
    SELECT sup.supplier_id, sup.supplier_name,
           CAST(ROUND(SUM(CAST(j.revenue AS DECIMAL(38,6))), 2) AS DOUBLE)
               AS total_revenue,
           COUNT(DISTINCT j.product_id) AS total_products_sold,
           SUM(j.quantity) AS total_stock_sold
    FROM suppliers sup LEFT JOIN joined j ON j.supplier_id = sup.supplier_id
    GROUP BY 1, 2
),
per_product AS (
    SELECT supplier_id, product_name,
           SUM(CAST(revenue AS DECIMAL(38,6))) AS product_revenue
    FROM joined WHERE product_id IS NOT NULL
    GROUP BY 1, 2
),
top AS (
    SELECT supplier_id, product_name
    FROM (SELECT supplier_id, product_name,
                 ROW_NUMBER() OVER (PARTITION BY supplier_id
                                    ORDER BY product_revenue DESC, product_name) AS rn
          FROM per_product)
    WHERE rn = 1
)
SELECT DATE '{RUN_DATE}' AS day_dt,
       a.supplier_id,
       a.supplier_name,
       COALESCE(a.total_revenue, 0.0) AS total_revenue,
       COALESCE(a.total_products_sold, 0) AS total_products_sold,
       COALESCE(a.total_stock_sold, 0) AS total_stock_sold,
       COALESCE(t.product_name, 'No sales') AS top_selling_product
FROM agg a LEFT JOIN top t USING (supplier_id)
""",
)(mart_supplier_performance)


def mart_product_performance(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_from_lineitem(load_table(spark, sf_dir, "lineitem"))
    products = products_from_part(load_table(spark, sf_dir, "part"))
    return lowercase(product_performance(sales, products, run_date=RUN_DATE))


register(
    "mart_product_performance",
    f"""
WITH {_ADAPTER_SQL},
fil AS (SELECT product_id, quantity FROM sales WHERE order_status <> 'Cancelled'),
jnr AS (
    SELECT s.product_id, s.quantity,
           p.product_name, p.category, p.selling_price, p.cost_price,
           p.stock_quantity, p.reorder_level,
           s.quantity * (p.selling_price - p.cost_price) AS row_profit
    FROM fil s LEFT JOIN products p USING (product_id)
)
SELECT product_id, product_name,
       CAST(ROUND(SUM(CAST(quantity * selling_price AS DECIMAL(38,6))), 2)
            AS DOUBLE) AS total_sales_amount,
       SUM(quantity) AS total_quantity_sold,
       ROUND(CAST(SUM(CAST(selling_price AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(selling_price), 2) AS avg_sale_price,
       stock_quantity, reorder_level,
       CASE WHEN stock_quantity < reorder_level THEN 'Below Reorder Level'
            ELSE 'Sufficient Stock' END AS stock_level_status,
       CAST(ROUND(SUM(CAST(row_profit AS DECIMAL(38,6))), 2) AS DOUBLE)
           AS profit,
       category,
       DATE '{RUN_DATE}' AS day_dt
FROM jnr
GROUP BY product_id, product_name, category, stock_quantity, reorder_level
""",
)(mart_product_performance)


def mart_customer_sales_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    sales = sales_with_customers(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    )
    products = products_from_part(load_table(spark, sf_dir, "part"))
    customers = customers_from_customer(load_table(spark, sf_dir, "customer"))
    return lowercase(
        customer_sales_report(
            sales, products, customers, run_date=RUN_DATE, run_ts=RUN_TS
        )
    )


register(
    "mart_customer_sales_report",
    f"""
WITH {_ADAPTER_SQL},
sales_c AS (
    SELECT s.*, o.o_custkey AS customer_id
    FROM sales s LEFT JOIN orders o ON s.order_id = o.o_orderkey
),
fil AS (SELECT * FROM sales_c WHERE order_status IN ('Delivered', 'Shipped')),
jnr AS (
    SELECT f.sale_id, f.customer_id, f.sale_date, f.quantity, f.discount,
           p.product_name, p.category,
           ROUND(p.selling_price, 2) AS price,
           c.name AS customer_name, c.city
    FROM fil f
    LEFT JOIN products p USING (product_id)
    LEFT JOIN customers c USING (customer_id)
),
exp AS (
    SELECT *,
           MONTH(sale_date) AS sale_month,
           YEAR(sale_date) AS sale_year,
           CAST(ROUND(CAST(quantity * price * (1 - discount / 100) AS DECIMAL(38,6)), 2)
                AS DOUBLE) AS sale_amount
    FROM jnr
),
win AS (
    SELECT *,
           PERCENT_RANK() OVER (ORDER BY sale_amount DESC) AS pr,
           ROW_NUMBER() OVER (PARTITION BY customer_id
                              ORDER BY sale_amount DESC, sale_id) AS rn
    FROM exp
)
SELECT DATE '{RUN_DATE}' AS day_dt,
       customer_id, customer_name, sale_id, city, product_name, category,
       sale_date, sale_month, sale_year, quantity, price, sale_amount,
       rn = 1 AS top_performer,
       CASE WHEN pr <= 0.2 THEN 'Gold'
            WHEN pr > 0.2 AND pr <= 0.5 THEN 'Silver'
            ELSE 'Bronze' END AS loyalty_tier,
       TIMESTAMP '{RUN_TS}' AS load_tstmp
FROM win
""",
)(mart_customer_sales_report)
