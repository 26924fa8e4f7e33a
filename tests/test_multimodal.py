"""Multimodal plumbing tests: the decode/resize stubs are gated with
NotImplementedError (no media libs in this container), the injected fakes
keep the Arrow batch/schema contract, and payloads never survive into
downstream outputs wider than they must."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators import multimodal


@pytest.fixture(scope="module")
def payloads(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    return multimodal.attach_binary_payload(docs)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_resize_requires_injected_resizer(payloads):
    with pytest.raises(NotImplementedError):
        multimodal.resize(payloads, 8, 8)


def test_resize_contract(payloads):
    out = multimodal.resize(payloads, 8, 8, resizer=multimodal.fake_resize)
    rows = out.collect()
    assert all(len(r["payload"]) == 64 for r in rows)
    assert all((r["width"], r["height"]) == (8, 8) for r in rows)
    assert all(r["payload_kind"] == "image/resized" for r in rows)


def test_features_drop_payload(payloads):
    out = multimodal.extract_binary_features(
        payloads, decoder=multimodal.fake_decode
    )
    assert "payload" not in out.columns  # blobs never reach a shuffle
    row = out.limit(1).collect()[0]
    assert row["n_bytes"] > 0 and len(row["content_md5"]) == 32


def test_frame_sample_counts(payloads):
    frames = multimodal.sample_frames(payloads, every_n_bytes=64, max_frames=8)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in counts)
    assert frames.filter(F.octet_length("frame_bytes") > 8).count() == 0
