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


# --------------------------------------------------------------------------
# Firing-TTL coverage (VERDICT r11 Next #6): the suite above pins
# stream==batch under never-firing TTLs; this section pins the session-
# SPLIT semantics when the TTL actually fires — including a late
# straggler landing AFTER a TTL-expired gap — against a reference
# simulator derived from the module's documented contract, not its code:
#   * the watermark for micro-batch N is max event time through batch
#     N-1 minus late_tolerance (epoch 0 before any data);
#   * a key with data whose stored deadline the watermark has passed is
#     expired ON ARRIVAL (Spark never fires hasTimedOut for keys with
#     in-batch data) — its session numbering restarts at 1;
#   * re-arming is monotone: deadline = max(stored,
#     max(watermark, batch-max-event-time) + ttl).


def _ns(ts: dt.datetime) -> int:
    return int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000_000)


def _simulate_sessionize_stream(batches, gap_s, ttl_ms, late_tol_ms):
    """Contract-level reference for sessionize_stream under a firing
    TTL: per-batch watermark bookkeeping + arrival-path expiry."""
    gap_ns = gap_s * 1_000_000_000
    wm_ms = 0
    state = {}  # user -> [last_ns, idx, deadline_ms]
    labels = {}
    for batch in batches:
        by_user: dict[int, list] = {}
        for row in batch:
            by_user.setdefault(row[0], []).append(row)
        for user, rows_ in by_user.items():
            rows_ = sorted(rows_, key=lambda r: (r[3], r[2]))
            last_ns, idx, stored = state.get(user, (None, 0, 0))
            if stored > 0 and wm_ms > stored:
                last_ns, idx = None, 0  # expired on arrival: restart
            batch_max = max(_ns(r[3]) for r in rows_)
            deadline = max(stored, max(wm_ms, batch_max // 1_000_000) + ttl_ms)
            for r in rows_:
                t = _ns(r[3])
                if last_ns is None or t - last_ns > gap_ns:
                    idx += 1
                labels[r[2]] = idx
                last_ns = t
            state[user] = (last_ns, idx, deadline)
        batch_max_all = max(_ns(r[3]) for r in batch)
        wm_ms = max(wm_ms, batch_max_all // 1_000_000 - late_tol_ms)
    return labels


@st.composite
def _expiry_plan(draw):
    """Two-user scenario built to make TTL expiry reachable: user 1
    emits a burst, idles, and RETURNS (possibly as a straggler whose
    event time sits behind the watermark); user 2's steady events drag
    the watermark forward through the idle gap.  Batches split at
    hypothesis-chosen points and are internally permuted."""
    burst = draw(st.lists(st.integers(1, 20), min_size=1, max_size=3))
    idle_minutes = draw(st.integers(10, 240))
    comeback_offsets = draw(
        st.lists(st.integers(0, 15), min_size=1, max_size=3)
    )
    pace = draw(st.integers(5, 45))  # user 2's cadence
    rows = []
    eid = 0
    minute = 0
    for g in burst:
        minute += g
        rows.append((1, "click", eid, T0 + dt.timedelta(minutes=minute), 1.0))
        eid += 1
    comeback_start = minute + idle_minutes
    m = comeback_start
    for off in comeback_offsets:
        m += off
        rows.append((1, "click", eid, T0 + dt.timedelta(minutes=m), 1.0))
        eid += 1
    horizon = m + 30
    m2 = 0
    while m2 < horizon:
        m2 += pace
        rows.append((2, "view", eid, T0 + dt.timedelta(minutes=m2), 2.0))
        eid += 1
    ordered = sorted(rows, key=lambda r: (r[3], r[2]))
    batches = []
    i = 0
    while i < len(ordered):
        size = draw(st.integers(1, max(1, len(ordered) - i)))
        chunk = ordered[i : i + size]
        batches.append(draw(st.permutations(chunk)))
        i += size
    ttl = draw(st.sampled_from(["35 minutes", "90 minutes"]))
    late_tol = draw(st.sampled_from(["0 seconds", "10 minutes"]))
    return rows, batches, ttl, late_tol


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_expiry_plan())
def test_sessionize_stream_ttl_expiry_matches_contract(plan):
    """When the watermark passes an idle user's deadline their session
    numbering restarts at 1 on return — and when it does NOT (monotone
    re-arm, straggler within tolerance), numbering continues exactly.
    The expectation comes from the documented contract simulator, so a
    drift in either direction (expiring too early — the r11 ADVICE
    monotonicity bug — or never expiring) fails."""
    from kusuma_metamorph_etl_spark.streaming.stateful import (
        _ttl_millis,
        sessionize_stream,
    )

    rows, batches, ttl, late_tol = plan
    got = {
        r["event_id"]: r["session_idx"]
        for r in _run_stream(
            lambda s: sessionize_stream(
                s, gap_seconds=1800, state_ttl=ttl, late_tolerance=late_tol
            ),
            batches,
        )
    }
    tol_ms = {"0 seconds": 0, "10 minutes": 600_000}[late_tol]
    expected = _simulate_sessionize_stream(
        batches, 1800, _ttl_millis(ttl), tol_ms
    )
    assert got == expected


def _simulate_first_event_stream(batches, ttl_ms, late_tol_ms):
    """Contract-level reference for first_event_stream under a firing
    TTL: a key idle past its deadline is forgotten, so its next event
    EMITS AGAIN (dedup-within-TTL is the documented contract)."""
    wm_ms = 0
    state = {}  # (user, etype) -> deadline_ms
    emitted = []
    for batch in batches:
        by_key: dict[tuple, list] = {}
        for row in batch:
            by_key.setdefault((row[0], row[1]), []).append(row)
        for key, rows_ in by_key.items():
            rows_ = sorted(rows_, key=lambda r: (r[3], r[2]))
            stored = state.get(key, 0)
            already = key in state and not (stored > 0 and wm_ms > stored)
            batch_max = max(_ns(r[3]) for r in rows_)
            deadline = max(stored, max(wm_ms, batch_max // 1_000_000) + ttl_ms)
            if not already:
                emitted.append(rows_[0][2])
            state[key] = deadline
        batch_max_all = max(_ns(r[3]) for r in batch)
        wm_ms = max(wm_ms, batch_max_all // 1_000_000 - late_tol_ms)
    return sorted(emitted)


def _simulate_dedup_window_stream(batches, win_s, ttl_ms, late_tol_ms):
    """Contract-level reference for dedup_window_stream under a firing
    TTL: idle-past-TTL keys forget their last timestamp, so the next
    event reopens a burst (emits) regardless of the chain rule."""
    win_ns = win_s * 1_000_000_000
    wm_ms = 0
    state = {}  # (user, etype) -> (last_ns, deadline_ms)
    kept = []
    for batch in batches:
        by_key: dict[tuple, list] = {}
        for row in batch:
            by_key.setdefault((row[0], row[1]), []).append(row)
        for key, rows_ in by_key.items():
            rows_ = sorted(rows_, key=lambda r: (r[3], r[2]))
            last_ns, stored = state.get(key, (None, 0))
            if stored > 0 and wm_ms > stored:
                last_ns = None  # expired: next event reopens a burst
            batch_max = max(_ns(r[3]) for r in rows_)
            deadline = max(stored, max(wm_ms, batch_max // 1_000_000) + ttl_ms)
            for r in rows_:
                t = _ns(r[3])
                if last_ns is None or t - last_ns > win_ns:
                    kept.append(r[2])
                last_ns = t
            state[key] = (last_ns, deadline)
        batch_max_all = max(_ns(r[3]) for r in batch)
        wm_ms = max(wm_ms, batch_max_all // 1_000_000 - late_tol_ms)
    return sorted(kept)


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_expiry_plan())
def test_first_event_stream_ttl_expiry_matches_contract(plan):
    """Dedup-within-TTL under a FIRING TTL: the comeback event after an
    expired gap must re-emit, and a too-early expiry (the monotonicity
    bug class) or a never-firing one diverges from the simulator."""
    from kusuma_metamorph_etl_spark.streaming.stateful import (
        _ttl_millis,
        first_event_stream,
    )

    rows, batches, ttl, late_tol = plan
    got = sorted(
        r["event_id"]
        for r in _run_stream(
            lambda s: first_event_stream(
                s, state_ttl=ttl, late_tolerance=late_tol
            ),
            batches,
            output_mode="update",
        )
    )
    tol_ms = {"0 seconds": 0, "10 minutes": 600_000}[late_tol]
    expected = _simulate_first_event_stream(batches, _ttl_millis(ttl), tol_ms)
    assert got == expected


@settings(max_examples=_ex(9), deadline=None)
@given(plan=_expiry_plan())
def test_dedup_window_stream_ttl_expiry_matches_contract(plan):
    """Burst dedup under a FIRING TTL: an expired key's comeback reopens
    a burst even when the chain rule would have suppressed it."""
    from kusuma_metamorph_etl_spark.streaming.stateful import _ttl_millis

    rows, batches, ttl, late_tol = plan
    got = sorted(
        r["event_id"]
        for r in _run_stream(
            lambda s: dedup_window_stream(
                s, window_seconds=1800, state_ttl=ttl, late_tolerance=late_tol
            ),
            batches,
        )
    )
    tol_ms = {"0 seconds": 0, "10 minutes": 600_000}[late_tol]
    expected = _simulate_dedup_window_stream(
        batches, 1800, _ttl_millis(ttl), tol_ms
    )
    assert got == expected
