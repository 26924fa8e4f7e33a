"""kusuma_metamorph_etl_spark — a PySpark-native analytics/ETL engine.

A clean-room, Spark-first re-expression of the capability surface of the
reference repo ``Metamorph-ETL/Kusuma_metamorph-ETL`` (daily retail-analytics
ETL: ingestion with schema normalization + snapshot stamping, data-quality
gates, and three derived marts), extended with large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing) and Structured Streaming.

Design thesis (see SURVEY.md §7): the reference's real abstraction is a
named-stage mapping pipeline over flat tables with quality gates and daily
snapshot semantics.  This package implements exactly that as a thin, typed
layer over ``pyspark.sql.DataFrame`` — the IR *is* Catalyst's logical plan;
there is no custom IR and no custom Catalyst rule.  Every operator is
declarative DataFrame/SQL so predicate pushdown, column pruning, join
selection, whole-stage codegen and AQE come for free.
"""

from kusuma_metamorph_etl_spark.session import get_session, stop_session
from kusuma_metamorph_etl_spark.sources.catalog import TABLES, load_table, load_tables

__all__ = [
    "get_session",
    "stop_session",
    "TABLES",
    "load_table",
    "load_tables",
]

__version__ = "0.1.0"
