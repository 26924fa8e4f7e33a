"""Streaming tests: the batch/stream-polymorphic window transforms produce
IDENTICAL results when driven through Structured Streaming (availableNow,
memory sink) as in batch — the core Structured Streaming contract."""

from __future__ import annotations

import pytest

from kusuma_metamorph_etl_spark.sources.catalog import load_table
from kusuma_metamorph_etl_spark.streaming.windows import (
    run_to_memory_sink,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    "transform,name",
    [(tumbling_agg, "t_tumble"), (sliding_agg, "t_slide")],
)
def test_stream_matches_batch(spark, sf_small, transform, name):
    batch = transform(load_table(spark, sf_small, "events"))
    stream = transform(stream_events(spark, sf_small))
    assert stream.isStreaming
    run_to_memory_sink(stream, name, output_mode="complete")
    got = _rows(spark.table(name))
    assert got == _rows(batch)


def test_session_stream_matches_batch(spark, sf_small):
    batch = session_agg(load_table(spark, sf_small, "events"), gap="10 minutes")
    stream = session_agg(stream_events(spark, sf_small), gap="10 minutes")
    run_to_memory_sink(stream, "t_session", output_mode="complete")
    assert _rows(spark.table("t_session")) == _rows(batch)


def test_stream_dual_write(spark, sf_small, tmp_path):
    from kusuma_metamorph_etl_spark.streaming.sink import stream_dual_write

    events = stream_events(spark, sf_small)
    stream_dual_write(
        events,
        raw_path=str(tmp_path / "raw"),
        legacy_path=str(tmp_path / "legacy"),
        checkpoint_dir=str(tmp_path / "cp"),
        run_date="2024-06-01",
    )
    n_events = load_table(spark, sf_small, "events").count()
    raw = spark.read.parquet(str(tmp_path / "raw"))
    legacy = spark.read.parquet(str(tmp_path / "legacy"))
    assert "DAY_DT" not in raw.columns
    assert legacy.count() == n_events  # every micro-batch appended
    assert {str(r["DAY_DT"]) for r in legacy.select("DAY_DT").distinct().collect()} == {
        "2024-06-01"
    }


def test_stateful_dedup_stream_matches_batch(spark, sf_small):
    from kusuma_metamorph_etl_spark.streaming.stateful import (
        first_event_batch,
        first_event_stream,
    )

    batch = first_event_batch(load_table(spark, sf_small, "events"))
    stream = first_event_stream(stream_events(spark, sf_small))
    assert stream.isStreaming
    run_to_memory_sink(stream, "t_dedup", output_mode="update")
    got = _rows(spark.table("t_dedup"))
    assert got == _rows(batch)
    # Dedup really deduplicates: one row per key.
    n_keys = (
        load_table(spark, sf_small, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert len(got) == n_keys
