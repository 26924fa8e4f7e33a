"""Event-time windowed aggregations, batch/stream polymorphic.

Each transform is a pure DataFrame function usable on either
``spark.read`` or ``spark.readStream`` input — Structured Streaming's
contract is exactly that the same logical plan runs incrementally.  Tests
drive them through a memory-sink streaming query (``availableNow``); the
correctness oracle checks them in batch mode against DuckDB.

Scale notes: event-time windows shuffle on (window, keys); the watermark
bounds state (late data beyond it is dropped), which is what makes the
operator viable on an unbounded 100 TB/day stream.  ``session_window``
state grows with open sessions per key — the gap duration is the lever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.functions.numeric import decimal_sum


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    source_options: dict[str, str] | None = None,
) -> DataFrame:
    """events as an unbounded stream (parquet directory source), ``ts``
    normalized to µs TimestampType whatever physical type the files carry
    — the same adaptive conversion the batch catalog applies.

    ``source_options`` passes FileStreamSource knobs through (e.g.
    ``maxFilesPerTrigger`` to slice an ``availableNow`` replay into a
    controlled number of micro-batches — the scale-probe protocol pins
    batch count with it so per-batch cost is comparable across scales).

    FileStreamSource requires an explicit schema; it comes from a batch
    read of the same path (footer metadata only, no scan), so the stream
    sees exactly what ``load_table`` sees: TIMESTAMP(NANOS) files surface
    ``ts`` as raw int64 under ``nanosAsLong`` (converted here by
    floor-division, DuckDB's ns→µs truncation), native µs/ms timestamp
    files pass through untouched.  A hardcoded LongType schema would read
    a µs file's values as raw longs and mis-scale them 1000× — the
    batch/stream twin tests pin this against the live test data.

    .. warning:: For TIMESTAMP(NANOS) files ONLY, this sets
       ``spark.sql.legacy.parquet.nanosAsLong=true`` SESSION-WIDE for the
       stream's whole lifetime, overriding any prior value: micro-batch
       planning re-reads parquet footers on every trigger, so a scoped
       set/restore would break the running stream.  Consequence: while
       (and after) such a stream runs, the session's other
       TIMESTAMP(NANOS) batch reads surface ``ts`` as bigint instead of
       raising.  Callers needing a pristine session for nanos streams
       should pass ``spark.newSession()`` (its conf is independent).
       µs/ms files — the common case — leave the session untouched.
    """
    path = f"{sf_dir}/events.parquet"
    from kusuma_metamorph_etl_spark.sources.catalog import (
        _NANOS_CONF,
        read_parquet_nanos_safe,
    )

    batch_schema = read_parquet_nanos_safe(spark, path).schema
    if any(f.name == "ts" and f.dataType.typeName() == "long" for f in batch_schema):
        from kusuma_metamorph_etl_spark.sources.catalog import _NANOS_LOCK

        # Session-wide on purpose — see the docstring warning.  Under
        # the shared lock: set WITHOUT it could land inside a concurrent
        # read_parquet_nanos_safe snapshot/restore window, whose finally
        # would then erase this stream's lifetime setting and fail its
        # next micro-batch (r8 review).
        with _NANOS_LOCK:
            spark.conf.set(_NANOS_CONF, "true")
    # FileStreamSource needs a directory or glob (a bare file path fails
    # basePath validation); the glob resolves to the single test file.
    reader = spark.readStream.schema(batch_schema)
    for k, v in (source_options or {}).items():
        reader = reader.option(k, v)
    raw = reader.parquet(f"{sf_dir}/events.parque[t]")
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # µs-no-tz parquet infers TIMESTAMP_NTZ, but watermarks/event-time
        # require TIMESTAMP; the session TZ is pinned UTC (session.py) so
        # this cast is a wall-clock identity, keeping stream == batch.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_agg(
    events: DataFrame, duration: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time windows per event_type: count + sum(value)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal_sum, not round(sum(double)): the double sum's last ulp
            # is partition-order-dependent, so half-cent boundary groups
            # would flip run-to-run and vs the oracle (the documented r1
            # agg_groupby_single hash-fail; r8 review caught the
            # streaming twins reintroducing it)
            decimal_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding windows (each event lands in duration/slide windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", duration, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def session_agg(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based sessionization per user: a session closes after ``gap`` of
    inactivity.  Streaming uses the native ``session_window`` state
    operator; the same call works in batch."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # decimal_sum, not round(sum(double)): the double sum's last ulp
            # is partition-order-dependent, so half-cent boundary groups
            # would flip run-to-run and vs the oracle (the documented r1
            # agg_groupby_single hash-fail; r8 review caught the
            # streaming twins reintroducing it)
            decimal_sum(F.col("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming frame to completion against the bounded test
    source (availableNow) and land results in an in-memory table — the
    smoke path for streaming tests."""
    query = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
