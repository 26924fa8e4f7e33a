"""Adversarial out-of-order coverage for the stateful streaming twins
(VERDICT r9 Next #7 / r10 Next #3).

The module's pinned watermark contract (r8, verified on Spark 4.1) says
``applyInPandasWithState`` never pre-filters late rows: the watermark
drives TTL eviction only.  These properties generate random per-user
event histories, split the (ts, event_id)-ordered arrival sequence into
random micro-batches, and arbitrarily PERMUTE each batch's rows — the
disorder the operators promise to absorb (within a batch the handler's
sort restores order; across batches each key stays in event-time order).
Stream output must equal the batch twin EXACTLY, including when a
watermark is active (large never-firing TTL + varied ``late_tolerance``)
and a permuted row lands far behind the global watermark other keys
raced ahead to.

Streaming queries are slow to spin up, so the whole module is
slow-marked; run with ``SPARK_GRAFT_FULL_TESTS=1`` for full example
budgets.
"""

from __future__ import annotations

import datetime as dt
import itertools
import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kusuma_metamorph_etl_spark.operators.events import (
    dedup_within_window,
    sessionize,
)
from kusuma_metamorph_etl_spark.streaming.stateful import (
    dedup_window_stream,
    sessionize_stream,
)

pytestmark = pytest.mark.slow

_spark = None
_qname = itertools.count()


def _session():
    global _spark
    if _spark is None:
        from kusuma_metamorph_etl_spark.session import get_session

        _spark = get_session()
        _spark.sparkContext.setLogLevel("ERROR")
        _spark.conf.set("spark.sql.shuffle.partitions", "8")
    return _spark


_FULL = os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1"


def _ex(n: int) -> int:
    return n if _FULL else max(3, n // 3)


T0 = dt.datetime(2024, 6, 1, 12, 0, 0)

# Per-user gap lists in minutes; gaps > 30 min break a session under
# gap_seconds=1800 and open a new burst under window_seconds=1800, so
# histories cross both regimes.  2 users interleave so one user's fast
# events race the watermark ahead of the other's stragglers.
_histories = st.lists(
    st.lists(st.integers(1, 50), min_size=2, max_size=6),
    min_size=2,
    max_size=2,
)


@st.composite
def _arrival_plan(draw):
    """(rows, batches): rows per user with globally unique event_ids,
    then the (ts, event_id)-sorted arrival list cut into random
    contiguous micro-batches, each internally permuted."""
    gaps_per_user = draw(_histories)
    rows = []
    eid = 0
    for user, gaps in enumerate(gaps_per_user, start=1):
        minute = 0
        for g in gaps:
            minute += g
            # event_type alternates so dedup keys (user, type) interleave
            etype = "click" if eid % 2 == 0 else "view"
            rows.append(
                (user, etype, eid, T0 + dt.timedelta(minutes=minute), float(eid))
            )
            eid += 1
    ordered = sorted(rows, key=lambda r: (r[3], r[2]))
    batches = []
    i = 0
    while i < len(ordered):
        size = draw(st.integers(1, max(1, len(ordered) - i)))
        chunk = ordered[i : i + size]
        batches.append(draw(st.permutations(chunk)))
        i += size
    wm = draw(
        st.sampled_from(
            [None, ("30 days", "0 seconds"), ("30 days", "10 minutes")]
        )
    )
    return rows, batches, wm


SCHEMA = "user_id long, event_type string, event_id long, ts timestamp, value double"


def _run_stream(transform, batches, output_mode="append"):
    """Write one parquet dir per micro-batch with strictly increasing
    mtimes (FileStreamSource orders by modification time), drive with
    maxFilesPerTrigger=1 + availableNow, collect from a memory sink."""
    spark = _session()
    src = tempfile.mkdtemp(prefix="oo_stream_")
    try:
        base = 1_700_000_000
        for i, batch in enumerate(batches):
            d = os.path.join(src, f"b{i:03d}.parquet")
            spark.createDataFrame(list(batch), SCHEMA).coalesce(1).write.parquet(d)
            for root, _dirs, files in os.walk(d):
                for f in files:
                    os.utime(os.path.join(root, f), (base + i, base + i))
        stream = transform(
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/*")
        )
        name = f"t_oo_{next(_qname)}"
        q = (
            stream.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table(name).collect()
        spark.catalog.dropTempView(name)
        return out
    finally:
        shutil.rmtree(src, ignore_errors=True)


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_arrival_plan())
def test_sessionize_stream_equals_batch_under_batch_local_disorder(plan):
    rows, batches, wm = plan
    spark = _session()
    kwargs = {}
    if wm is not None:
        kwargs = {"state_ttl": wm[0], "late_tolerance": wm[1]}
    got = {
        r["event_id"]: r["session_idx"]
        for r in _run_stream(
            lambda s: sessionize_stream(s, gap_seconds=1800, **kwargs), batches
        )
    }
    expected = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(
            spark.createDataFrame(rows, SCHEMA), gap_seconds=1800
        ).collect()
    }
    assert got == expected


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_arrival_plan())
def test_first_event_stream_equals_batch_under_batch_local_disorder(plan):
    """Completes the adversarial trio (sessionize/dedup_window above):
    first-occurrence dedup must emit exactly the batch twin's
    (ts, event_id)-minimal row per key under random micro-batch splits
    with in-batch permutation.  Across-batch event-time order per key
    (which the generator preserves) makes the streaming result exact;
    the never-firing TTL variants additionally drive the stored-deadline
    bookkeeping added in r11 without evicting."""
    from kusuma_metamorph_etl_spark.streaming.stateful import (
        first_event_batch,
        first_event_stream,
    )

    rows, batches, wm = plan
    spark = _session()
    kwargs = {}
    if wm is not None:
        kwargs = {"state_ttl": wm[0], "late_tolerance": wm[1]}
    got = sorted(
        r["event_id"]
        for r in _run_stream(
            lambda s: first_event_stream(s, **kwargs),
            batches,
            output_mode="update",  # the operator emits in Update mode
        )
    )
    expected = sorted(
        r["event_id"]
        for r in first_event_batch(spark.createDataFrame(rows, SCHEMA)).collect()
    )
    assert got == expected


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_arrival_plan())
def test_dedup_window_stream_equals_batch_under_batch_local_disorder(plan):
    rows, batches, wm = plan
    spark = _session()
    kwargs = {}
    if wm is not None:
        kwargs = {"state_ttl": wm[0], "late_tolerance": wm[1]}
    got = sorted(
        r["event_id"]
        for r in _run_stream(
            lambda s: dedup_window_stream(s, window_seconds=1800, **kwargs),
            batches,
        )
    )
    expected = sorted(
        r["event_id"]
        for r in dedup_within_window(
            spark.createDataFrame(rows, SCHEMA),
            keys=["user_id", "event_type"],
            window_seconds=1800,
        ).collect()
    )
    assert got == expected
