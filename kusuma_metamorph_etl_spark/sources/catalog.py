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


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table.  Lazy — no job runs until an action.

    ``events.ts`` may ship as TIMESTAMP(NANOS) parquet, which Spark only
    reads as raw int64 nanos (``nanosAsLong``); the catalog converts it to
    a proper µs TimestampType by floor-division — the same ns→µs
    truncation DuckDB applies when casting TIMESTAMP_NS.  Files already
    carrying µs/ms timestamps pass through untouched (the conversion keys
    off the surfaced dtype, not the table name alone).

    The nanosAsLong conf is set HERE, at runtime, not only in session.py's
    builder conf: callers (e.g. an external harness) may hand us a bare
    SparkSession built without ``_BASE_CONF``, and the conf is
    runtime-settable on this Spark, so the catalog is self-sufficient.
    The prior value is snapshotted and restored right after the DataFrame
    is created: schema inference (the only consumer of the conf) runs
    eagerly inside ``spark.read.parquet``, and scan *execution* does not
    re-read it — verified empirically by executing a TIMESTAMP(NANOS)
    scan after unsetting the conf (pinned by
    ``tests/test_bare_session.py::test_nanos_parquet_roundtrip``) — so a
    caller's later TIMESTAMP(NANOS) reads keep their own session's
    behavior (no sticky session-wide leak).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    finally:
        if prior is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prior)
    if dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several catalog tables at once."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}
