"""Feed ingestion — the engine's version of the reference's four ingestion
tasks (``/root/reference/ETL-Airflow/dags/tasks/ingestion_task.py``):
extract → normalize column names → select target schema → PK duplicate
gate → dual-write (overwrite ``raw``, append ``DAY_DT``-stamped
``legacy``).

One generic, declarative function replaces four copy-pasted task bodies;
the per-feed differences (source, target columns, primary key) are data.
Differences from the reference, by design:

* ``run_date`` injectable (reference stamps ``current_date()`` —
  non-reproducible, SURVEY.md §7a);
* the gate runs BEFORE any write, so a duplicate feed day leaves both
  sinks untouched (reference gates post-hoc per table);
* ``raw`` never carries ``DAY_DT`` (reference quirk B2);
* the whole thing is one lazy plan until the two write actions inside
  ``dual_write`` (which persists once — reference recomputed lineage per
  action, anti-pattern A2).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame

from kusuma_metamorph_etl_spark.functions.naming import normalize_column_names
from kusuma_metamorph_etl_spark.plans.quality import duplicate_gate
from kusuma_metamorph_etl_spark.sources.sinks import dual_write


@dataclass(frozen=True)
class FeedSpec:
    """Declarative description of one ingestion feed."""

    name: str
    target_columns: list[str]  # post-normalization names, output order
    primary_key: list[str]
    raw_path: str
    legacy_path: str


def ingest_feed(
    source: DataFrame,
    spec: FeedSpec,
    run_date: dt.date | str | None = None,
) -> DataFrame:
    """Run one feed through normalize → project → gate → dual-write.

    Returns the stamped legacy frame (what history now holds for the day).
    """
    normalized = normalize_column_names(source)
    projected = normalized.select(*spec.target_columns)
    gated = duplicate_gate(projected, spec.primary_key)
    return dual_write(gated, spec.raw_path, spec.legacy_path, run_date)
