"""Sources & sinks (SURVEY.md §2.1).

The reference's I/O surface is: REST JSON (driver-side) → DataFrame, GCS CSV
with schema inference, JDBC read/write to Postgres, and a dual-write
raw-overwrite + legacy-append pattern.  The engine re-expresses each one
Spark-natively and adds a parquet lakehouse layout as the canonical store
(JDBC stays as an optional sink).
"""

from kusuma_metamorph_etl_spark.sources.catalog import TABLES, load_table, load_tables
from kusuma_metamorph_etl_spark.sources.csv import read_csv
from kusuma_metamorph_etl_spark.sources.jdbc import jdbc_reader, jdbc_writer
from kusuma_metamorph_etl_spark.sources.memory import dataframe_from_records
from kusuma_metamorph_etl_spark.sources.rest import land_json_records, read_landed_json
from kusuma_metamorph_etl_spark.sources.sinks import dual_write, write_parquet_snapshot

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "jdbc_reader",
    "jdbc_writer",
    "dataframe_from_records",
    "land_json_records",
    "read_landed_json",
    "dual_write",
    "write_parquet_snapshot",
]
