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


def first_event_stream(events: DataFrame) -> DataFrame:
    """Streaming first-occurrence dedup via ``applyInPandasWithState``.

    Each micro-batch: a key's rows arrive as pandas chunks; the handler
    picks the (ts, event_id)-minimal row, emits it only if the key's state
    says nothing was emitted before, then flips the flag.  Output mode is
    ``update`` (one row per newly-seen key per batch).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def handle(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            return  # key already emitted its first event
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["ts", "event_id"]).head(1)
            if best is None:
                best = pdf
            else:
                both = pd.concat([best, pdf]).sort_values(["ts", "event_id"])
                best = both.head(1)
        if best is not None:
            state.update((1,))
            yield best[["user_id", "event_type", "event_id", "ts", "value"]]

    return events.groupBy(*KEYS).applyInPandasWithState(
        handle,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
