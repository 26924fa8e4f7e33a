"""The three derived marts (SURVEY.md §0, §3) plus the TPC-H test-data
adapter that maps the driver's star schema onto the reference domain."""

from kusuma_metamorph_etl_spark.marts.customer_sales_report import customer_sales_report
from kusuma_metamorph_etl_spark.marts.product_performance import product_performance
from kusuma_metamorph_etl_spark.marts.supplier_performance import supplier_performance

__all__ = [
    "customer_sales_report",
    "product_performance",
    "supplier_performance",
]
