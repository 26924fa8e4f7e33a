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
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators.scd import scd2_init, scd2_merge
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


def stream_scd2_upsert(
    updates_stream: DataFrame,
    dim_path: str,
    checkpoint_dir: str,
    key: list[str],
    attrs: list[str],
    effective_from_col: str,
    available_now: bool = True,
):
    """Maintain an SCD2 dimension from a stream of update records.

    Each micro-batch collapses to one record per key (latest by
    ``effective_from_col``), merges into the parquet-backed dimension via
    :func:`operators.scd.scd2_merge`, and rewrites it.  Each key's
    ``valid_from``/``valid_to`` comes from its OWN record's effective
    date (``effective_col`` merge), so a micro-batch mixing keys with
    different effective dates versions each correctly.  The
    read-merge-rewrite is the no-transactional-format trade-off: atomicity
    comes from the parquet overwrite + checkpoint (a replayed batch
    re-merges idempotently because unchanged attributes are detected).
    At Delta/Iceberg-backed scale the same merge logic drives MERGE INTO.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    def _rm(spark, path: str) -> None:
        # Hadoop FS delete — works for any scheme, not just local paths.
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        jpath.getFileSystem(spark._jsc.hadoopConfiguration()).delete(jpath, True)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            return
        window = Window.partitionBy(*key).orderBy(F.desc(effective_from_col))
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(window))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        upd = latest.select(*key, *attrs, effective_from_col)
        try:
            dim = spark.read.parquet(dim_path)
        except Exception:
            scd2_init(upd, key, effective_col=effective_from_col).write.parquet(
                dim_path
            )
            return
        merged = scd2_merge(
            dim,
            upd,
            key,
            attrs,
            effective_col=effective_from_col,
            # `latest` above already compacted to one row per key — skip
            # the merge's duplicate-key aggregation
            check_unique=False,
        )
        # Rewrite via a staging collect-free cycle: parquet can't overwrite
        # its own input, so land to a sibling, swap, then drop the staging.
        staging = f"{dim_path}__staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(dim_path)
        _rm(spark, staging)

    writer = updates_stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def stream_heavy_hitters(
    stream_df: DataFrame,
    item_col: str,
    k: int,
    summary_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming Misra–Gries heavy-hitter rollup: every micro-batch
    appends its bounded (≤ partitions × k rows) MG partition summaries
    to ``summary_path``; :func:`merged_heavy_hitters` reads the whole
    summary table back as lower-bound counts.

    The batch guarantee COMPOSES across micro-batches by the same
    pigeonhole: if an item's total count exceeds Σ n_b / k, then in at
    least one batch its count exceeds that batch's n_b / k, so it
    survives that batch's summary — the merged candidate set provably
    contains every global heavy hitter, with per-item undercount ≤ Σ
    n_b / k.  State never lives in the stream (no
    `applyInPandasWithState`): the summary TABLE is the state, append-
    only and idempotent per micro-batch via `foreachBatch` — the same
    replay-safe pattern as `stream_dual_write`/`stream_scd2_upsert`.
    """
    from kusuma_metamorph_etl_spark.operators.sketches import (
        _mg_partition_summaries,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = _mg_partition_summaries(batch_df, item_col, k)
        s.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(summary_path)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query


def merged_heavy_hitters(
    spark, summary_path: str, item_col: str
) -> DataFrame:
    """Merge a :func:`stream_heavy_hitters` summary table into
    ``(item_col, n)`` lower-bound counts (telemetry-grade — the
    `heavy_hitters(exact=False)` mode; run the candidate-only exact
    verify over the raw corpus when exact counts are needed)."""
    return (
        spark.read.parquet(summary_path)
        .groupBy("__item")
        .agg(F.sum("mg_count").alias("n"))
        .select(F.col("__item").alias(item_col), "n")
    )


def stream_cdc_apply(
    change_stream: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key: list[str],
    snapshot_schema: str,
    seq_col: str = "seq",
    op_col: str = "op",
    available_now: bool = True,
):
    """Maintain a materialized table from a STREAMING change log: each
    micro-batch runs the batch `operators/scd.py::cdc_apply`
    reconciliation against the current snapshot and atomically republishes
    it (`publish_snapshot`'s manifest-pointer swap — readers never see a
    half-written table, and a replayed micro-batch re-derives the same
    snapshot, so the sink is idempotent under the at-least-once
    `foreachBatch` contract provided each batch's changes carry their
    original ``seq`` values).

    Cross-batch ordering note: WITHIN a micro-batch the max-``seq`` row
    per key wins (cdc_apply's compaction); ACROSS batches later batches
    simply overwrite — correct whenever the log source delivers a key's
    changes in offset order per partition (Kafka's contract).  A
    late-arriving lower-seq change in a later batch would win wrongly;
    sources without per-key ordering need a seq guard column in the
    snapshot, documented out of scope here.
    """
    from kusuma_metamorph_etl_spark.operators.scd import cdc_apply
    from kusuma_metamorph_etl_spark.sources.sinks import (
        publish_snapshot,
        read_published,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            snapshot = read_published(spark, table_path)
        except Exception:
            snapshot = spark.createDataFrame([], schema=snapshot_schema)
        updated = cdc_apply(snapshot, batch_df, key, seq_col, op_col)
        # version per micro-batch: replaying batch N republishes the
        # same version name with the same derived content — idempotent.
        publish_snapshot(spark, updated, table_path, f"b{batch_id:06d}")

    writer = change_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if available_now:
        query.awaitTermination()
    return query
