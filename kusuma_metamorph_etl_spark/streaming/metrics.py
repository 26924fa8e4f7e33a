"""Streaming observability: per-batch metrics as a QUERYABLE side table
(SURVEY.md §2.10 [EXT] ops surface; r13 VERDICT Next #8).

The stateful twins are correctness-complete (stream==batch equality,
checkpoint restarts, TTL properties) — what a 100 TB operator still
needs is the ops answer to "is tonight's run healthy?": rows in, rows
out, and state-store size PER micro-batch, queryable with the same
DataFrame API as everything else.  Two complementary surfaces:

* :func:`progress_table` — harvest the engine's own
  ``StreamingQueryProgress`` feed (``query.recentProgress``) into a
  DataFrame: input rows per batch, sink output rows, and the
  state-store row counts Spark maintains for every stateful operator
  (``applyInPandasWithState``, streaming dedup/aggregation).  Zero
  instrumentation inside the operators — the engine already counts.
* :func:`record_batch_metrics` — a ``foreachBatch``-side recorder for
  sinks whose interesting counts are SINK-semantic (rows actually
  published after merge/summarize, not what the engine saw at the
  source).  One row per (query_name, batch_id), written as an
  overwritten batch-scoped partition so a replayed batch rewrites its
  own metric row instead of appending a duplicate — the same
  at-least-once idempotence discipline as every sink in
  :mod:`streaming.sink`.

The reference has no streaming surface at all (its ops signal is
Airflow task state, ``/root/reference/ETL-Airflow/dags/etl_dag.py``);
this is the [EXT] re-expression of that signal for streams.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROGRESS_SCHEMA = (
    "query_name string, batch_id long, num_input_rows long, "
    "sink_output_rows long, state_rows_total long, state_rows_updated long, "
    "state_rows_removed long, n_state_operators int"
)

def progress_rows(query: Any, query_name: str | None = None) -> list[dict]:
    """``query.recentProgress`` → one plain dict per micro-batch.

    ``sink_output_rows`` is -1 when the sink does not report
    (``foreachBatch`` sinks report via :func:`record_batch_metrics`
    instead); state columns are 0 for stateless queries.  Progress
    events are the engine's own accounting — ``numRowsTotal`` is the
    state-store size AFTER the batch, the number a capacity dashboard
    watches.
    """
    name = query_name if query_name is not None else (query.name or "")
    rows = []
    for p in query.recentProgress:
        state_ops = p.get("stateOperators") or []
        sink = p.get("sink") or {}
        rows.append(
            {
                "query_name": name,
                "batch_id": int(p["batchId"]),
                "num_input_rows": int(p.get("numInputRows") or 0),
                # -1 = "sink did not report" (some sinks emit JSON null)
                "sink_output_rows": int(
                    sink["numOutputRows"]
                    if sink.get("numOutputRows") is not None
                    else -1
                ),
                "state_rows_total": sum(
                    int(s.get("numRowsTotal") or 0) for s in state_ops
                ),
                "state_rows_updated": sum(
                    int(s.get("numRowsUpdated") or 0) for s in state_ops
                ),
                "state_rows_removed": sum(
                    int(s.get("numRowsRemoved") or 0) for s in state_ops
                ),
                "n_state_operators": len(state_ops),
            }
        )
    return rows


def progress_table(
    spark: SparkSession, *queries: Any, names: list[str] | None = None
) -> DataFrame:
    """The :func:`progress_rows` of one or more (finished or running)
    streaming queries as a DataFrame — joinable against
    :func:`read_batch_metrics` on ``(query_name, batch_id)``."""
    if names is not None and len(names) != len(queries):
        raise ValueError(
            f"names ({len(names)}) must match queries ({len(queries)}) "
            "one-to-one"
        )
    rows: list[dict] = []
    for i, q in enumerate(queries):
        rows.extend(
            progress_rows(q, names[i] if names is not None else None)
        )
    return spark.createDataFrame(rows, schema=PROGRESS_SCHEMA)  # type: ignore[arg-type]


def record_batch_metrics(
    spark: SparkSession,
    metrics_root: str,
    query_name: str,
    batch_id: int,
    rows_in: int,
    rows_out: int,
    state_rows: int | None = None,
) -> None:
    """Publish one metric row for a micro-batch, replay-idempotently.

    Layout is ``{root}/query_name=X/batch_id=N/`` with the batch
    directory OVERWRITTEN — a replayed batch (foreachBatch is
    at-least-once) rewrites its own row; a plain append would
    double-count exactly like the sink-data appends the r8 review
    caught.  The write is one tiny file per batch; at production batch
    cadences compact periodically like any other streaming side table.
    """
    import re

    if not re.fullmatch(r"[A-Za-z0-9_.\-]+", query_name):
        # the name is interpolated into a partition DIRECTORY path —
        # '/', '=', '%' etc. would split into bogus partition levels or
        # URL-decode differently on read, breaking the (query_name,
        # batch_id) join key against progress_table
        raise ValueError(
            f"query_name {query_name!r} must match [A-Za-z0-9_.-]+ "
            "(it becomes a partition directory name)"
        )
    # batch_id lands in the partition path too — coerce like the metric
    # values so a float or numeric string cannot write 'batch_id=5.0'
    # (and a hostile string fails loud in int())
    batch_id = int(batch_id)
    row = [(int(rows_in), int(rows_out),
            None if state_rows is None else int(state_rows))]
    (
        spark.createDataFrame(
            row, schema="rows_in long, rows_out long, state_rows long"
        )
        .write.mode("overwrite")
        .parquet(f"{metrics_root}/query_name={query_name}/batch_id={batch_id}")
    )


def read_batch_metrics(spark: SparkSession, metrics_root: str) -> DataFrame:
    """The :func:`record_batch_metrics` side table, one row per
    (query_name, batch_id) — partition columns read back typed."""
    from pyspark.sql import functions as F

    return (
        spark.read.option("basePath", metrics_root)
        .parquet(metrics_root)
        # partition-column inference may type batch_id as int; cast so
        # the surface matches PROGRESS_SCHEMA's declared long exactly
        .select(
            "query_name",
            F.col("batch_id").cast("long").alias("batch_id"),
            "rows_in",
            "rows_out",
            "state_rows",
        )
    )
