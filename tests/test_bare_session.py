"""Regression: the catalog must read ``events.parquet`` under ANY session.

Round-2 driver failure (CORRECTNESS_r02): the driver harness builds its own
bare SparkSession without the engine's ``_BASE_CONF``, so the
``spark.sql.legacy.parquet.nanosAsLong`` conf was absent and every
events-based query died at the scan with PARQUET_TYPE_ILLEGAL
(TIMESTAMP(NANOS)).  ``load_table`` now sets the conf at runtime; these
tests pin that from both directions.
"""

from __future__ import annotations

import pytest

import subprocess
import sys

from tests.conftest import SF_SMALL

_BARE_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# Deliberately NO engine conf: replicates an external harness's session.
spark = (
    SparkSession.builder.appName("bare-session-regression")
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
from kusuma_metamorph_etl_spark.registry import queries

df = queries()["join_asof"](spark, {sf!r})
n = df.count()
assert n > 0, f"join_asof returned {{n}} rows under a bare session"
print("BARE_SESSION_OK", n)
spark.stop()
"""


@pytest.mark.slow
def test_events_reads_under_bare_session_subprocess():
    """End-to-end: a fresh process, a conf-less session, an events query."""
    script = _BARE_SCRIPT.format(repo="/root/repo", sf=SF_SMALL)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-3000:]}"
    assert "BARE_SESSION_OK" in proc.stdout


def test_load_table_self_sufficient_and_restores_conf(spark, sf_small):
    """In-process check: with the conf unset, load_table still reads events
    (it sets the conf itself for schema inference) AND leaves the session
    conf exactly as it found it — no sticky session-wide leak."""
    from kusuma_metamorph_etl_spark.sources.catalog import _NANOS_CONF, load_table

    spark.conf.unset(_NANOS_CONF)
    try:
        df = load_table(spark, sf_small, "events")
        assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
        assert df.limit(1).count() == 1
        # restored to the pre-call state (unset), not left at "true"
        assert spark.conf.get(_NANOS_CONF, None) is None
    finally:
        spark.conf.set(_NANOS_CONF, "true")


def _write_nanos_events(path: str) -> None:
    """A TIMESTAMP(NANOS) events.parquet — the type the driver testdata
    carried through round 4 (it now ships µs); this fixture keeps the
    nanos branch covered."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(20), pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=7 * i, microseconds=i) for i in range(20)],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([i % 3 for i in range(20)], pa.int64()),
            "event_type": pa.array(["view", "click"] * 10),
            "value": pa.array([float(i) for i in range(20)]),
            "props": pa.array(["{}"] * 20),
        }
    )
    # store_schema=False drops the Arrow schema so Spark sees only the
    # parquet logical type TIMESTAMP(NANOS), as the r1-r4 driver data did.
    pq.write_table(tbl, f"{path}/events.parquet", version="2.6", store_schema=False)


@pytest.mark.slow
def test_nanos_parquet_roundtrip(spark, tmp_path):
    """The nanos branch end-to-end on a real TIMESTAMP(NANOS) file: batch
    load converts to µs by floor-division, scan EXECUTION succeeds after
    the conf is restored (schema inference is its only consumer), and the
    streaming twin sees the identical event times."""
    import datetime as dt

    from kusuma_metamorph_etl_spark.sources.catalog import _NANOS_CONF, load_table
    from kusuma_metamorph_etl_spark.streaming.windows import (
        run_to_memory_sink,
        stream_events,
        tumbling_agg,
    )

    _write_nanos_events(str(tmp_path))
    spark.conf.unset(_NANOS_CONF)
    try:
        batch = load_table(spark, str(tmp_path), "events")
        assert dict(batch.dtypes)["ts"] == "timestamp"
        assert spark.conf.get(_NANOS_CONF, None) is None  # restored before action
        rows = {r["event_id"]: r["ts"] for r in batch.collect()}  # executes post-restore
        assert rows[1] == dt.datetime(2024, 1, 1, 0, 7, 0, 1)

        stream = tumbling_agg(stream_events(spark, str(tmp_path)))
        assert stream.isStreaming
        run_to_memory_sink(stream, "t_nanos", output_mode="complete")
        got = {
            (r["window_start"], r["event_type"], r["n_events"])
            for r in spark.table("t_nanos").collect()
        }
        want = {
            (r["window_start"], r["event_type"], r["n_events"])
            for r in tumbling_agg(batch).collect()
        }
        assert got == want
    finally:
        spark.conf.set(_NANOS_CONF, "true")
