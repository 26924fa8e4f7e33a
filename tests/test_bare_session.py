"""Regression: the catalog must read ``events.parquet`` under ANY session.

Round-2 driver failure (CORRECTNESS_r02): the driver harness builds its own
bare SparkSession without the engine's ``_BASE_CONF``, so the
``spark.sql.legacy.parquet.nanosAsLong`` conf was absent and every
events-based query died at the scan with PARQUET_TYPE_ILLEGAL
(TIMESTAMP(NANOS)).  ``load_table`` now sets the conf at runtime; these
tests pin that from both directions.
"""

from __future__ import annotations

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


def test_load_table_sets_nanos_conf_in_process(spark, sf_small):
    """Cheap in-process check: unset the conf, load_table restores it and
    the events scan succeeds with a proper timestamp column."""
    from kusuma_metamorph_etl_spark.sources.catalog import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_small, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.limit(1).count() == 1
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
