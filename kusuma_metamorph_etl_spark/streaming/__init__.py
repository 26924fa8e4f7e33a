"""[EXT] Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; the engine maps the ``events`` table onto
``readStream`` with watermarks + tumbling/sliding/session windows.  Window
transforms are written once and applied to BOTH batch and streaming frames
(same Catalyst operators), so the oracle checks batch results while tests
drive the identical query through a real streaming sink.
"""

from kusuma_metamorph_etl_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = ["session_agg", "sliding_agg", "stream_events", "tumbling_agg"]
