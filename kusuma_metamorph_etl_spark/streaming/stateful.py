"""Custom stateful streaming operator: first-occurrence dedup
(`applyInPandasWithState`) — SURVEY.md §2.10 [EXT].

Streaming dedup is the canonical custom stateful op in a training-data
pipeline: an unbounded event/document feed where only the FIRST occurrence
per key may pass (exactly-once feature extraction, crawl dedup, …).
Spark has ``dropDuplicates`` on streams, but its state never expires and
its within-batch winner is arbitrary; this operator keeps deterministic
first-by-(ts, event_id) semantics and owns its state shape explicitly —
the pattern any bespoke stateful operator follows.

State per key: a single flag (key already emitted).  Arrow moves batches;
state is one tuple — both sides stay O(1) per key.  At 100 TB/day the
state store is RocksDB-backed and keys expire via the watermark-driven
``GroupStateTimeout`` (wired through ``timeout``); the batch twin below is
the oracle-checkable equivalent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = (
    "user_id long, event_type string, event_id long, ts timestamp, value double"
)
STATE_SCHEMA = "emitted long"
KEYS = ("user_id", "event_type")


def first_event_batch(events: DataFrame) -> DataFrame:
    """Batch twin: deterministic first event per (user_id, event_type),
    ordered by (ts, event_id).  This is the semantics the streaming
    operator must reproduce — and the DuckDB-checkable oracle for it."""
    window = Window.partitionBy(*KEYS).orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("__rn", F.row_number().over(window))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


def first_event_stream(events: DataFrame, state_ttl: str | None = None) -> DataFrame:
    """Streaming first-occurrence dedup via ``applyInPandasWithState``.

    Each micro-batch: a key's rows arrive as pandas chunks; the handler
    picks the (ts, event_id)-minimal row, emits it only if the key's state
    says nothing was emitted before, then flips the flag.  Output mode is
    ``update`` (one row per newly-seen key per batch).

    ``state_ttl`` (e.g. ``"1 hour"``) bounds the state store on unbounded
    keyspaces: the input must carry a watermark, the operator runs with
    ``EventTimeTimeout``, and a key idle past the TTL is forgotten — a
    later event for it emits again.  Dedup-within-TTL is the honest
    contract at 100 TB/day; unbounded exact dedup means unbounded state.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = None
    if state_ttl is not None:
        parts = state_ttl.split()
        unit_ms = {
            "second": 1_000, "seconds": 1_000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000,
        }[parts[1]]
        ttl_ms = int(parts[0]) * unit_ms

    def handle(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()  # key forgotten; next event re-emits
            return
        already_emitted = state.exists
        best: pd.DataFrame | None = None
        if not already_emitted:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"]).head(1)
                if best is None:
                    best = pdf
                else:
                    both = pd.concat([best, pdf]).sort_values(["ts", "event_id"])
                    best = both.head(1)
        if ttl_ms is not None:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)
        if best is not None and not already_emitted:
            state.update((1,))
            yield best[["user_id", "event_type", "event_id", "ts", "value"]]

    src = events
    timeout_conf = GroupStateTimeout.NoTimeout
    if state_ttl is not None:
        # EventTimeTimeout requires a watermark; zero delay means the
        # timeout clock is simply the max observed event time.
        src = events.withWatermark("ts", "0 seconds")
        timeout_conf = GroupStateTimeout.EventTimeTimeout

    return src.groupBy(*KEYS).applyInPandasWithState(
        handle,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf,
    )
