"""JDBC source/sink (`src_jdbc`, `snk_jdbc_*`, SURVEY.md §2.1).

The reference reads and writes Postgres through a single JDBC connection —
no ``partitionColumn``/``numPartitions``/``batchsize``
(``/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:95-129``,
anti-pattern A3): at scale that serializes the entire table through one
executor.  The engine builds *partitioned* JDBC reads (N concurrent range
queries) and batched writes.

No database is available in the test environment, so these helpers only
construct the reader/writer; tests cover option assembly, not round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> DataFrameReader:
    """A JDBC reader with partitioned scan options.

    With ``partition_column`` (a numeric/date PK) Spark issues
    ``num_partitions`` concurrent range queries instead of one full-table
    scan; bounds should come from a cheap ``SELECT min(pk), max(pk)``.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    mode: str = "append",
    batchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> DataFrameWriter:
    """A JDBC writer with batched inserts (reference writes row-at-a-time
    defaults; `transform_utils.py:95-107`)."""
    return (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
    )
