"""CSV source (`src_csv_infer`, SURVEY.md §2.1).

The reference reads its daily sales feed with
``spark.read.csv(path, header=True, inferSchema=True)``
(``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py:227-232``).
Schema inference costs an extra full pass and drifts across days
(anti-pattern A7), so the engine takes an explicit schema by default and
keeps inference as an opt-in for exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    infer_schema: bool = False,
    **options: str,
) -> DataFrame:
    """Read a CSV file/directory.

    With ``schema`` set (the production path) the read is a single pass and
    types are stable.  ``infer_schema=True`` reproduces the reference
    behavior for parity tests.
    """
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
