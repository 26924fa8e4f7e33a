"""Streaming ops metrics (`streaming/metrics.py`): per-batch
rows-in/rows-out/state-rows as a queryable side table — the
observability surface a 100 TB stream needs on top of the
correctness-complete stateful twins (r13 VERDICT Next #8)."""

from __future__ import annotations

import pytest

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _two_file_source(spark, tmp_path, rows_per_file=(3, 2)):
    """A bounded file source that yields EXACTLY one micro-batch per
    file (maxFilesPerTrigger=1) — len(rows_per_file) batches total."""
    import datetime

    src = tmp_path / "src"
    src.mkdir()
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    eid = 0
    for i, n in enumerate(rows_per_file):
        rows = []
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, t0 + datetime.timedelta(minutes=eid), eid % 3,
                 f"type_{eid % 2}", float(eid))
            )
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        stage = tmp_path / "stage" / f"b{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
        part.rename(src / f"b{i}.parquet")
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )


def test_dual_write_records_per_batch_metrics(spark, tmp_path):
    """Two micro-batches through the dual-write sink leave two metric
    rows keyed (query_name, batch_id), with rows_in matching the actual
    per-batch input sizes and rows_out == rows_in (dual write republishes
    every row to both sides)."""
    from kusuma_metamorph_etl_spark.streaming.metrics import (
        read_batch_metrics,
    )
    from kusuma_metamorph_etl_spark.streaming.sink import stream_dual_write

    stream = _two_file_source(spark, tmp_path, rows_per_file=(3, 2))
    metrics = str(tmp_path / "metrics")
    stream_dual_write(
        stream,
        raw_path=str(tmp_path / "raw"),
        legacy_path=str(tmp_path / "legacy"),
        checkpoint_dir=str(tmp_path / "cp"),
        run_date="2024-06-01",
        metrics_root=metrics,
    )
    got = {
        (r["query_name"], r["batch_id"]): (r["rows_in"], r["rows_out"])
        for r in read_batch_metrics(spark, metrics).collect()
    }
    assert got == {
        ("dual_write", 0): (3, 3),
        ("dual_write", 1): (2, 2),
    }


def test_record_batch_metrics_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-recording the SAME batch (a
    replay) must overwrite its metric row, not append a duplicate."""
    from kusuma_metamorph_etl_spark.streaming.metrics import (
        read_batch_metrics,
        record_batch_metrics,
    )

    root = str(tmp_path / "m")
    record_batch_metrics(spark, root, "q", 0, rows_in=10, rows_out=7)
    record_batch_metrics(spark, root, "q", 1, rows_in=4, rows_out=4)
    # replay of batch 0 — same counts re-derived, one row must remain
    record_batch_metrics(spark, root, "q", 0, rows_in=10, rows_out=7)
    rows = read_batch_metrics(spark, root).collect()
    assert len(rows) == 2
    by_batch = {r["batch_id"]: r for r in rows}
    assert by_batch[0]["rows_in"] == 10 and by_batch[0]["rows_out"] == 7
    assert by_batch[0]["state_rows"] is None
    assert by_batch[1]["rows_in"] == 4


def test_heavy_hitters_metrics_count_input_and_summary_rows(
    spark, tmp_path
):
    """The MG sink's metric rows derive rows_in from the embedded
    per-partition totals (no second pass over the input) and report the
    summary-table size as the state measure."""
    from kusuma_metamorph_etl_spark.streaming.metrics import (
        read_batch_metrics,
    )
    from kusuma_metamorph_etl_spark.streaming.sink import (
        stream_heavy_hitters,
    )

    stream = _two_file_source(spark, tmp_path, rows_per_file=(4, 3))
    metrics = str(tmp_path / "metrics")
    stream_heavy_hitters(
        stream,
        "event_type",
        k=5,
        summary_path=str(tmp_path / "mg"),
        checkpoint_dir=str(tmp_path / "cp"),
        metrics_root=metrics,
    )
    rows = read_batch_metrics(spark, metrics).collect()
    assert {r["query_name"] for r in rows} == {"heavy_hitters"}
    by_batch = {r["batch_id"]: r for r in rows}
    assert set(by_batch) == {0, 1}
    assert by_batch[0]["rows_in"] == 4
    assert by_batch[1]["rows_in"] == 3
    for r in rows:
        assert 0 < r["rows_out"]
        assert r["state_rows"] == r["rows_out"]


def test_progress_table_surfaces_stateful_batches(spark, tmp_path):
    """`progress_table` over a finished `applyInPandasWithState` twin:
    one row per micro-batch, engine-counted input rows per batch, and a
    non-empty state store reported by the state operator — the
    StreamingQueryProgress shape, queryable."""
    from kusuma_metamorph_etl_spark.streaming.metrics import progress_table
    from kusuma_metamorph_etl_spark.streaming.stateful import (
        first_event_stream,
    )

    stream = _two_file_source(spark, tmp_path, rows_per_file=(3, 2))
    out = first_event_stream(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("t_metrics_stateful")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = progress_table(spark, q, names=["dedup_twin"])
    rows = {r["batch_id"]: r for r in prog.collect()}
    data_batches = [r for r in rows.values() if r["num_input_rows"] > 0]
    assert sorted(r["num_input_rows"] for r in data_batches) == [2, 3]
    assert all(r["query_name"] == "dedup_twin" for r in rows.values())
    assert all(r["n_state_operators"] == 1 for r in rows.values())
    # after the final data batch the state store holds the seen keys
    last = rows[max(b for b, r in rows.items() if r["num_input_rows"] > 0)]
    assert last["state_rows_total"] > 0


def test_progress_table_empty_query_list(spark):
    from kusuma_metamorph_etl_spark.streaming.metrics import progress_table

    assert progress_table(spark).count() == 0


def test_metrics_input_validation(spark, tmp_path):
    """Partition-hostile query names and misaligned name lists fail loud
    instead of writing a misparsed layout / crashing mid-iteration."""
    from kusuma_metamorph_etl_spark.streaming.metrics import (
        progress_table,
        record_batch_metrics,
    )

    for bad in ("raw/legacy", "a=b", "p%20q", ""):
        with pytest.raises(ValueError):
            record_batch_metrics(
                spark, str(tmp_path), bad, 0, rows_in=1, rows_out=1
            )

    class _FakeQuery:
        name = "q"
        recentProgress = []

    with pytest.raises(ValueError):
        progress_table(spark, _FakeQuery(), _FakeQuery(), names=["one"])
