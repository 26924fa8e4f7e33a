"""WARC container parsing: round-trips, multi-record framing, binary
payload safety, and strict malformed-record errors."""

from __future__ import annotations

import pytest

from kusuma_metamorph_etl_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _records():
    return [
        {
            "record_id": "urn:a",
            "warc_type": "response",
            "target_uri": "http://x/1",
            "warc_date": "2025-01-01T00:00:00Z",
            "payload": b"hello world",
        },
        {
            "record_id": "urn:b",
            "warc_type": "conversion",
            "target_uri": "http://x/2",
            "warc_date": "2025-01-02T00:00:00Z",
            # binary payload containing CRLFs and header-lookalikes:
            # Content-Length framing must not resync on them
            "payload": b"\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\x00\xff",
        },
    ]


def test_round_trip_preserves_records_and_binary_payloads(tmp_path):
    path = str(tmp_path / "t.warc")
    write_warc(_records(), path)
    got = list(parse_warc_bytes("t.warc", open(path, "rb").read()))
    assert [r["record_id"] for r in got] == ["urn:a", "urn:b"]
    assert got[1]["payload"] == _records()[1]["payload"]
    assert got[0]["warc_type"] == "response"
    assert got[1]["content_length"] == len(_records()[1]["payload"])


def test_distributed_read_over_multiple_files(spark, tmp_path):
    for i in range(3):
        write_warc(_records(), str(tmp_path / f"p{i}.warc"))
    df = read_warc(spark, str(tmp_path))
    assert df.count() == 6
    uris = {r["target_uri"] for r in df.collect()}
    assert uris == {"http://x/1", "http://x/2"}


def test_malformed_records_raise_with_context(tmp_path):
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_bytes("f", b"NOT-WARC\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_bytes("f", b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    good = b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes("f", good))


def test_negative_content_length_raises_not_loops(tmp_path):
    """Regression (r8 review): int() parses "-33" happily; a negative
    length moved `pos` backwards and the generator re-parsed the same
    header forever, yielding records until OOM.  Must raise instead."""
    bad = b"WARC/1.0\r\nContent-Length: -33\r\n\r\n"
    with pytest.raises(ValueError, match="negative Content-Length"):
        list(parse_warc_bytes("f", bad))
