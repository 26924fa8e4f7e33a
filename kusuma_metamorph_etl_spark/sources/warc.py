"""[EXT] WARC (Web ARChive, ISO 28500) source — the container format
web-crawl corpora ship in (Common Crawl's WARC/WET files are the
canonical LLM pretraining input).  A real record-grain parser over the
plain-text container framing: version line, CRLF header block,
``Content-Length``-delimited payload, double-CRLF record separator.

Scale shape: WARC files are independently-parseable units (crawls ship
thousands of ~1 GB files), so the natural parallelism is per-FILE —
``binaryFile`` rows stream through ``mapInPandas`` and each task parses
its files sequentially in bounded memory.  Per-file sizes must fit a
task (they do by the format's own conventions; a pathological multi-GB
file needs splitting upstream).  Records never re-serialize through
Python row objects — Arrow batches in, Arrow batches out.

Parsing is strict where it must be (Content-Length framing — the ONLY
sound way to delimit binary payloads) and tolerant where crawls are
messy (unknown headers pass through ignored; a malformed record raises
with the file path and byte offset, naming the corruption rather than
silently resyncing).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_length long, "
    "payload binary"
)

_CRLF = b"\r\n"


def write_warc(records: list[dict], path: str) -> None:
    """Serialize records (dicts with ``record_id``/``warc_type``/
    ``target_uri``/``warc_date``/``payload``) into one WARC file —
    driver-side test/fixture writer (production corpora arrive already
    WARC-framed; the engine's job is reading them)."""
    out = bytearray()
    for r in records:
        payload: bytes = r["payload"]
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r["warc_type"].encode(),
            b"WARC-Record-ID: " + r["record_id"].encode(),
            b"WARC-Date: " + r["warc_date"].encode(),
            b"WARC-Target-URI: " + r["target_uri"].encode(),
            b"Content-Length: " + str(len(payload)).encode(),
        ]
        out += _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def parse_warc_bytes(name: str, blob: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record in ``blob`` (strict
    Content-Length framing; raises on malformed records with file+offset
    context)."""
    pos, n = 0, len(blob)
    while pos < n:
        # skip inter-record padding
        while blob.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = blob.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError(f"{name}: unterminated WARC header at byte {pos}")
        head = blob[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"{name}: expected WARC version line at byte {pos}, "
                f"got {lines[0][:40]!r}"
            )
        fields: dict[str, str] = {}
        for line in lines[1:]:
            key, _, value = line.partition(":")
            fields[key.strip().lower()] = value.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"{name}: missing/invalid Content-Length at byte {pos}"
            ) from None
        if length < 0:
            # int() happily parses "-33"; a negative length would move
            # `pos` BACKWARDS and loop forever over the same header
            raise ValueError(
                f"{name}: negative Content-Length {length} at byte {pos}"
            )
        body_start = head_end + 4
        if body_start + length > n:
            raise ValueError(
                f"{name}: truncated payload at byte {body_start} "
                f"(need {length} bytes)"
            )
        yield {
            "warc_file": name,
            "record_id": fields.get("warc-record-id", ""),
            "warc_type": fields.get("warc-type", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_length": length,
            "payload": blob[body_start : body_start + length],
        }
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Record-grain frame over a directory/glob of WARC files: one row
    per record, columns per ``WARC_SCHEMA``."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for name, blob in zip(batch["path"], batch["content"]):
                rows.extend(parse_warc_bytes(name, bytes(blob)))
            if rows:
                yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        parse, schema=WARC_SCHEMA
    )
