"""Parquet table catalog over a scale-factor directory.

Test data layout (TESTDATA.md): ``{sf_dir}/{table}.parquet`` for the TPC-H-ish
star schema plus ``events``/``documents``/``embeddings``.  Parquet scans are
the engine's canonical source: columnar, with predicate pushdown and column
pruning handled by Catalyst (`src_parquet_scan` in SURVEY.md §2.1).
"""

from __future__ import annotations

import threading

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

# Guards the snapshot/set/restore window around nanosAsLong: the conf is
# session-global, so two threads interleaving get/set/unset on one
# SparkSession could restore the wrong prior value or break the other
# thread's schema inference.  Shared with streaming.windows.stream_events
# (the only other writer of this conf).
_NANOS_LOCK = threading.Lock()


def read_parquet_nanos_safe(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` with nanosAsLong=true scoped to the call:
    prior conf value snapshotted, set, and restored under ``_NANOS_LOCK``.

    Restoring immediately after the DataFrame is created is safe because
    schema inference (the conf's only consumer) runs eagerly inside
    ``spark.read.parquet`` and scan *execution* does not re-read it —
    verified empirically by executing a TIMESTAMP(NANOS) scan after
    unsetting the conf (pinned by
    ``tests/test_bare_session.py::test_nanos_parquet_roundtrip``; keep
    that test green across any Spark version bump).
    """
    with _NANOS_LOCK:
        prior = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")
        try:
            return spark.read.parquet(path)
        finally:
            if prior is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prior)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table.  Lazy — no job runs until an action.

    ``events.ts`` may ship as TIMESTAMP(NANOS) parquet, which Spark only
    reads as raw int64 nanos (``nanosAsLong``); the catalog converts it to
    a proper µs TimestampType by floor-division — the same ns→µs
    truncation DuckDB applies when casting TIMESTAMP_NS.  µs-NTZ files
    surface ``ts`` as timestamp_ntz and are cast to TimestampType (the
    session TZ is pinned UTC, so the cast is a wall-clock identity) — the
    SAME normalization ``stream_events`` applies, so batch and stream
    twins of this table carry identical schemas.  Native µs/ms TIMESTAMP
    files pass through untouched (conversion keys off the surfaced dtype,
    not the table name alone).

    The nanosAsLong conf is set at runtime, not only in session.py's
    builder conf: callers (e.g. an external harness) may hand us a bare
    SparkSession built without ``_BASE_CONF``, and the conf is
    runtime-settable on this Spark, so the catalog is self-sufficient.
    Snapshot/set/restore is scoped and thread-guarded in
    :func:`read_parquet_nanos_safe`, so a caller's later TIMESTAMP(NANOS)
    reads keep their own session's behavior (no sticky session-wide leak).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    if name != "events":
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    df = read_parquet_nanos_safe(spark, f"{sf_dir}/{name}.parquet")
    ts_type = dict(df.dtypes).get("ts")
    from pyspark.sql import functions as F

    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Scan several catalog tables at once."""
    return {name: load_table(spark, sf_dir, name) for name in (names or TABLES)}
