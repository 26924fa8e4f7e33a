"""Parquet table catalog over a scale-factor directory.

Test data layout (TESTDATA.md): ``{sf_dir}/{table}.parquet`` for the TPC-H-ish
star schema plus ``events``/``documents``/``embeddings``.  Parquet scans are
the engine's canonical source: columnar, with predicate pushdown and column
pruning handled by Catalyst (`src_parquet_scan` in SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table.  Lazy — no job runs until an action.

    ``events.ts`` is TIMESTAMP(NANOS) parquet, which Spark reads as raw
    int64 nanos (``nanosAsLong``); the catalog converts it to a proper µs
    TimestampType by floor-division — the same ns→µs truncation DuckDB
    applies when casting TIMESTAMP_NS.

    The nanosAsLong conf is set HERE, at runtime, not only in session.py's
    builder conf: callers (e.g. an external harness) may hand us a bare
    SparkSession built without ``_BASE_CONF``, and the conf is
    runtime-settable on this Spark, so the catalog is self-sufficient.
    It is scoped to the ``events`` read (the only nanos table) because it
    is session-wide and sticky: once set, any later TIMESTAMP(NANOS)
    parquet the caller reads comes back as bigint instead of raising
    PARQUET_TYPE_ILLEGAL.  Scoping to this call shrinks the leak to
    sessions that actually read events.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several catalog tables at once."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}
