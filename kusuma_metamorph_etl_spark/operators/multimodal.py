"""[EXT] Multimodal column plumbing (SURVEY.md §2.10 north-star).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas functions over ``mapInPandas``.  The Spark-side
plumbing — schema contracts, batch iteration, partition sizing — is real
and tested; the actual media decode is STUBBED (the image/audio libraries
are not in this container): ``decode_image`` raises ``NotImplementedError``
unless handed the deterministic fake decoder used by the tests.

Scale notes: binary payloads are heavy — keep them out of shuffles
(derive features, then drop the payload before any wide operation), and
bound ``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits
executor memory.  ``mapInPandas`` streams Arrow record batches, so peak
memory is batch-sized, not partition-sized.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, header_hex string, content_md5 string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text column —
    the test stand-in for an image/audio payload) plus typed metadata."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "payload_kind", F.lit("text/utf-8")
    )


def decode_image(payload: bytes) -> Any:
    """STUB — media decoding needs PIL/ffmpeg, not present in this
    environment.  Production wires a real decoder here; tests inject
    :func:`fake_decode`."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; inject a decoder via extract_binary_features(decoder=...)"
    )


def fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: pretends the first 4 bytes are a header
    and derives 'features' from the raw bytes only."""
    import hashlib

    return {
        "n_bytes": len(payload),
        "header_hex": payload[:4].hex(),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


def extract_binary_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict[str, Any]] = decode_image,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the Python boundary batch-at-a-time: each pandas
    DataFrame holds one Arrow record batch; the payload column is dropped
    from the output so downstream shuffles never carry blobs.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            features = [decoder(p) for p in batch[payload_col]]
            out = pd.DataFrame(features)
            out.insert(0, id_col, batch[id_col].values)
            yield out

    narrow = df.select(id_col, payload_col)
    return narrow.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, payload binary, width int, height int, payload_kind string"
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resizer: truncates/pads bytes to width*height —
    preserves the batch/schema contract a real resampler would use."""
    target = width * height
    return payload[:target].ljust(target, b"\x00")


def resize(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched resize over binary payloads (image stand-in).

    Same ``mapInPandas`` seam as feature extraction; output carries the
    resized payload plus its dimensions as typed metadata.  Without an
    injected ``resizer`` this raises ``NotImplementedError`` — the real
    implementation needs an image library absent from this container.
    """
    if resizer is None:
        raise NotImplementedError(
            "image resize requires an image library not present in this "
            "container; inject one via resize(resizer=...) — tests use "
            "fake_resize"
        )

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = pd.DataFrame(
                {
                    id_col: batch[id_col].values,
                    payload_col: [
                        resizer(p, width, height) for p in batch[payload_col]
                    ],
                }
            )
            out["width"] = width
            out["height"] = height
            out["payload_kind"] = "image/resized"
            yield out

    narrow = df.select(id_col, payload_col)
    return narrow.mapInPandas(do_resize, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """'Frame sampling' over a binary payload — takes a byte-slice every
    ``every_n_bytes`` as the stand-in for video frame extraction.  Pure
    column expressions (substring on binary), one row per sampled frame."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor(F.length(F.col(payload_col)) / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.substring(F.col(payload_col), i * every_n_bytes + 1, 8).alias(
                "frame_bytes"
            ),
        ),
    )
    return df.select(F.col(id_col), F.explode(frames).alias("f")).select(
        id_col, "f.frame_idx", "f.frame_bytes"
    )
