"""In-memory rows with explicit schema (`src_inline_schema`, SURVEY.md §2.1).

Reference analog: hand-built rows + ``StructType`` → ``createDataFrame``
(``/root/reference/ETL-Airflow/dags/dag.py:63-82``).  Only for small
driver-side data (API metadata, fixtures) — bulk data goes through the
landing-zone pattern in :mod:`rest`.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def dataframe_from_records(
    spark: SparkSession,
    records: Iterable[Any],
    schema: StructType | str,
) -> DataFrame:
    """``createDataFrame`` with a *required* schema — inference from dicts
    (reference ``ingestion_task.py:26``) is nondeterministic across days."""
    return spark.createDataFrame(list(records), schema=schema)
