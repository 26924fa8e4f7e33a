"""Column-name canonicalization (`proj_normalize_names`, `proj_rename`).

The reference's de-facto schema contract is trim + upper-case +
spaces→underscores over every source column, applied both as explicit
``withColumnRenamed`` chains and a generic loop
(``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py:8-12,29-34``).
The engine does it in one ``toDF`` (a single projection node in the plan,
instead of N chained renames — N analyzer passes on a wide table is real
planning overhead at 100+ columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def normalize_name(name: str) -> str:
    """trim → UPPER → spaces/dashes → underscores."""
    return name.strip().upper().replace(" ", "_").replace("-", "_")


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Apply :func:`normalize_name` to every column in one projection."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename selected columns (single projection; order preserved)."""
    return df.toDF(*[mapping.get(c, c) for c in df.columns])
