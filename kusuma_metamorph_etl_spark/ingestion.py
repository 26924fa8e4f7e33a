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
* lazy until the FIRST action, which is the duplicate gate's bounded
  collect — one extra scan of the source before ``dual_write`` persists
  and writes, the declared price of gating BEFORE any sink is touched
  (the reference instead recomputed full lineage per action,
  anti-pattern A2; feeds too large to scan twice gate on the persisted
  frame instead).
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

    @staticmethod
    def dated_source_path(
        base: str, feed: str, run_date: dt.date | str | None = None
    ) -> str:
        """Per-day source path ``{base}/{YYYYMMDD}/{feed}_{YYYYMMDD}.csv``.

        The reference rebuilds this path inline in every ingestion task from
        ``datetime.today()`` (``ingestion_task.py:222-227`` — e.g.
        ``gs://…/{20250824}/sales_20250824.csv``); here the date is
        injectable so a backfill or a reproducible test names an exact day,
        with ``None`` keeping the reference's run-today behavior.
        """
        if run_date is None:
            run_date = dt.date.today()
        elif isinstance(run_date, str):
            run_date = dt.date.fromisoformat(run_date)
        day = run_date.strftime("%Y%m%d")
        return f"{base.rstrip('/')}/{day}/{feed}_{day}.csv"

    def for_run_date(self, base: str, run_date: dt.date | str | None = None) -> str:
        """This feed's dated source path for one run day."""
        return self.dated_source_path(base, self.name, run_date)


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
