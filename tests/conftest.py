"""Shared fixtures: one session-scoped SparkSession (local[*], AQE on,
UTC) and the sf0.001 testdata directory for fast end-to-end checks."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kusuma_metamorph_etl_spark.session import get_session

    session = get_session()
    session.sparkContext.setLogLevel("ERROR")
    # Test data is tiny (sf0.001/sf0.01): 32 shuffle partitions means 32
    # near-empty tasks per stage across hundreds of test jobs, which is
    # pure scheduler overhead at this scale.  8 keeps multi-partition
    # semantics honest (partition-invariance tests repartition explicitly
    # anyway; AQE re-plans at runtime either way) while cutting suite
    # wall-clock (VERDICT r7 Next #8).  Production default stays 32 in
    # session.py — this is a test-session override only.
    session.conf.set("spark.sql.shuffle.partitions", "8")
    return session


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium() -> str:
    return SF_MEDIUM
