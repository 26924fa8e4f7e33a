"""Column-level function library (SURVEY.md §2.2, §2.7, §2.8)."""

from kusuma_metamorph_etl_spark.functions.naming import (
    normalize_column_names,
    normalize_name,
    rename_columns,
)

__all__ = [
    "normalize_column_names",
    "normalize_name",
    "rename_columns",
]
