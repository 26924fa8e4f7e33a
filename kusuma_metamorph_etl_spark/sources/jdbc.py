"""JDBC source/sink (`src_jdbc`, `snk_jdbc_*`, SURVEY.md §2.1).

The reference reads and writes Postgres through a single JDBC connection —
no ``partitionColumn``/``numPartitions``/``batchsize``
(``/root/reference/ETL-Airflow/dags/tasks/transform_utils.py:95-129``,
anti-pattern A3): at scale that serializes the entire table through one
executor.  The engine builds *partitioned* JDBC reads (N concurrent range
queries) and batched writes.

No Postgres is available in the test environment, but Spark ships the
embedded Derby engine (for the Hive metastore), so real write→read
round-trips — including partitioned range reads and batched writes — are
exercised against ``jdbc:derby:`` (see :func:`embedded_derby_url`,
``tests/test_sinks.py``, and the ``snk_jdbc_roundtrip`` driver query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.readwriter import DataFrameReader, DataFrameWriter

# Ships in Spark's own jars/ (derby + derbytools); autoloads via JDBC SPI.
DERBY_EMBEDDED_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def embedded_derby_url(db_dir: str) -> str:
    """URL for an embedded (in-process, file-backed) Derby database —
    the sandbox stand-in for the reference's Postgres endpoint."""
    return f"jdbc:derby:{db_dir};create=true"


def shutdown_embedded_derby(spark: SparkSession, db_dir: str | None = None) -> None:
    """Cleanly unboot an embedded Derby database (or, with no ``db_dir``,
    the whole in-JVM Derby engine) so its files can be deleted.

    Embedded Derby keeps a database booted in the JVM until an explicit
    ``shutdown=true`` connection; deleting a booted database's files
    leaves a stale registry entry that corrupts the next ``create=true``
    boot of the same path.  Derby signals a *successful* shutdown by
    raising SQLException (08006 / XJ015) — swallowed here along with the
    'not booted' case.
    """
    target = f"jdbc:derby:{db_dir};shutdown=true" if db_dir else "jdbc:derby:;shutdown=true"
    try:
        spark._jvm.java.sql.DriverManager.getConnection(target)
    except Exception:
        pass  # shutdown signals via SQLException; not-booted also lands here


def reader_options(
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
) -> dict[str, str]:
    """Assemble partitioned-scan JDBC options (pure → unit-testable).

    With ``partition_column`` (a numeric/date PK) Spark issues
    ``num_partitions`` concurrent range queries instead of one full-table
    scan; bounds should come from a cheap ``SELECT min(pk), max(pk)``.
    """
    opts = {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": driver,
        "fetchsize": str(fetchsize),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def writer_options(
    url: str,
    table: str,
    user: str,
    password: str,
    batchsize: int = 10_000,
    driver: str = "org.postgresql.Driver",
) -> dict[str, str]:
    """Batched-insert JDBC options (reference writes with row-at-a-time
    defaults; `transform_utils.py:95-107`)."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "driver": driver,
        "batchsize": str(batchsize),
    }


def jdbc_reader(spark: SparkSession, **kwargs) -> DataFrameReader:
    """A JDBC reader with partitioned scan options (see reader_options)."""
    return spark.read.format("jdbc").options(**reader_options(**kwargs))


def jdbc_writer(df: DataFrame, mode: str = "append", **kwargs) -> DataFrameWriter:
    """A JDBC writer with batched inserts (see writer_options)."""
    return df.write.format("jdbc").mode(mode).options(**writer_options(**kwargs))
