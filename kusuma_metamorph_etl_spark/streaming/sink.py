"""Streaming → lakehouse sinks via ``foreachBatch``.

The reference's dual-write (overwrite ``raw.*_pre`` + append ``legacy.*``,
``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py:63-66``) is a
batch pattern; ``foreachBatch`` is how the same sink semantics attach to a
stream — each micro-batch runs the batch writer, so ``raw`` always holds
the latest micro-batch's state and ``legacy`` accumulates history.  The
checkpoint gives exactly-once *sink batches* (a replayed batch re-runs the
idempotent overwrite / partition append).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame

from kusuma_metamorph_etl_spark.sources.sinks import dual_write


def stream_dual_write(
    stream_df: DataFrame,
    raw_path: str,
    legacy_path: str,
    checkpoint_dir: str,
    run_date: dt.date | str | None = None,
    available_now: bool = True,
):
    """Drive a streaming frame through the batch dual-write per micro-batch.

    With ``available_now`` the query drains the bounded source and stops —
    the test/backfill mode; production drops the trigger for continuous
    micro-batches.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        dual_write(batch_df, raw_path, legacy_path, run_date)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query
