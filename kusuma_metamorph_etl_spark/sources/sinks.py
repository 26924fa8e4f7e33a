"""Sinks: parquet lakehouse snapshots + the dual-write pattern
(`snk_dual_write`, `dq_snapshot_stamp`, SURVEY.md §2.1/§2.9).

The reference's warehouse has three layers — ``raw.*_pre`` (overwrite,
current day), ``legacy.*`` (append-only history stamped with ``DAY_DT``) and
derived marts (``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py:
45-66``).  The engine keeps that layout but:

* parquet partitioned by ``DAY_DT`` replaces JDBC-append as the canonical
  history store — at 100 TB, appends must be partition-pruned file writes,
  not row inserts, and a day's reprocessing is an idempotent partition
  overwrite (``partitionOverwriteMode=dynamic``), not a delete+insert;
* the input is persisted once before the two writes — the reference
  recomputes the full lineage per action (anti-pattern A2);
* ``raw`` never carries ``DAY_DT`` (reference quirk B2 writes the stamped
  frame to ``raw.sales_pre``; the engine normalizes).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAY_DT = "DAY_DT"


def stamp_snapshot(df: DataFrame, run_date: dt.date | str | None = None) -> DataFrame:
    """Add the ``DAY_DT`` snapshot column (`dq_snapshot_stamp`).

    ``run_date`` is injectable — the reference hardcodes ``current_date()``
    (``ingestion_task.py:46``) which makes runs non-reproducible and tests
    flake across midnight (SURVEY.md §7 hard-point a).
    """
    value = F.current_date() if run_date is None else F.lit(str(run_date)).cast("date")
    return df.withColumn(DAY_DT, value)


def write_parquet_snapshot(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: str | None = DAY_DT,
) -> None:
    """Write a (usually DAY_DT-partitioned) parquet table.

    With ``spark.sql.sources.partitionOverwriteMode=dynamic`` and
    ``mode="overwrite"``, only the partitions present in ``df`` are
    replaced — the idempotent re-run story for a daily pipeline.
    """
    writer = df.write.mode(mode)
    if partition_by and partition_by in df.columns:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def dual_write(
    df: DataFrame,
    raw_path: str,
    legacy_path: str,
    run_date: dt.date | str | None = None,
    stamp_raw_quirk: bool = False,
) -> DataFrame:
    """Overwrite the ``raw`` working copy and append the stamped ``legacy``
    snapshot from ONE persisted frame (reference pattern at
    ``ingestion_task.py:63-66`` minus anti-patterns A2/B2).

    ``stamp_raw_quirk=True`` reproduces reference quirk B2 byte-for-byte
    (``ingestion_task.py:283`` writes the *stamped* frame to
    ``raw.sales_pre``, unlike the ``:63`` path) for parity migrations;
    default off — raw is a working copy and should not carry ``DAY_DT``.

    Returns the stamped legacy frame (still persisted) so callers can gate
    or inspect it; caller unpersists.
    """
    df = df.persist()
    try:
        stamped = stamp_snapshot(df, run_date)
        # raw: current-day working copy — no snapshot column unless the
        # B2 parity quirk is requested.
        (stamped if stamp_raw_quirk else df).write.mode("overwrite").parquet(raw_path)
        write_parquet_snapshot(stamped, legacy_path, mode="append")
        return stamped
    finally:
        df.unpersist()


def enable_dynamic_partition_overwrite(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed+sorted catalog table (`CLUSTERED BY` in SQL terms).

    Bucketing pre-shuffles ONCE at write time: two tables bucketed the
    same way join with zero exchanges (SortMergeJoin reads co-located
    buckets directly), and aggregations on the bucket keys skip their
    shuffle.  This is the 100 TB answer for fact ⋈ fact joins repeated
    across many queries — pay the shuffle once, amortize forever.  Bucket
    count should be sized so one bucket ≈ one task's worth of data.
    """
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )
