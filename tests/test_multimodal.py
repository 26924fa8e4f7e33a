"""Multimodal tests: REAL pure-numpy image codecs (PPM/PGM/BMP round-trips,
nearest-neighbor resize pixel placement), NotImplementedError gating for
compressed formats, the Arrow batch/schema contract over mapInPandas, and
payloads never surviving into downstream outputs wider than they must."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kusuma_metamorph_etl_spark.operators import multimodal


@pytest.fixture(scope="module")
def payloads(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    return multimodal.attach_binary_payload(docs)


@pytest.fixture(scope="module")
def image_payloads(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
    return multimodal.attach_image_payload(docs)


def _gradient(h, w):
    return (
        (np.arange(h * w * 3, dtype=np.int64) * 7 % 256)
        .astype(np.uint8)
        .reshape(h, w, 3)
    )


class TestCodecs:
    def test_ppm_roundtrip(self):
        arr = _gradient(5, 9)
        img = multimodal.decode_image(multimodal.encode_ppm(arr))
        assert (img["format"], img["width"], img["height"], img["channels"]) == (
            "ppm", 9, 5, 3,
        )
        assert np.array_equal(img["pixels"], arr)

    def test_pgm_roundtrip(self):
        arr = _gradient(4, 6)[:, :, 0]
        img = multimodal.decode_image(multimodal.encode_ppm(arr))
        assert (img["format"], img["channels"]) == ("pgm", 1)
        assert np.array_equal(img["pixels"], arr)

    def test_bmp_roundtrip(self):
        # Width 5: the 15-byte rows force BMP's 4-byte row padding path.
        arr = _gradient(3, 5)
        img = multimodal.decode_image(multimodal.encode_bmp(arr))
        assert (img["format"], img["width"], img["height"]) == ("bmp", 5, 3)
        assert np.array_equal(img["pixels"], arr)

    def test_ppm_comment_header(self):
        arr = _gradient(2, 2)
        payload = b"P6\n# a comment\n2 2\n255\n" + arr.tobytes()
        assert np.array_equal(multimodal.decode_image(payload)["pixels"], arr)

    def test_compressed_formats_gated(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG\r\n\x1a\n")
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\xff\xd8\xff\xe0rest")

    def test_unknown_payload_rejected(self):
        with pytest.raises(ValueError):
            multimodal.decode_image(b"not an image")

    def test_resize_pixel_placement(self):
        # 2x2 checkerboard -> 4x4: each source pixel becomes a 2x2 block.
        arr = np.zeros((2, 2, 3), dtype=np.uint8)
        arr[0, 1] = arr[1, 0] = 255
        out = multimodal.decode_image(
            multimodal.resize_image(multimodal.encode_ppm(arr), 4, 4)
        )["pixels"]
        expect = arr.repeat(2, axis=0).repeat(2, axis=1)
        assert np.array_equal(out, expect)

    def test_resize_identity(self):
        arr = _gradient(6, 7)
        payload = multimodal.encode_ppm(arr)
        assert multimodal.resize_image(payload, 7, 6) == payload

    def test_resize_preserves_bmp_format(self):
        arr = _gradient(4, 4)
        out = multimodal.resize_image(multimodal.encode_bmp(arr), 2, 2)
        assert out[:2] == b"BM"

    def test_synthesize_matches_oracle_contract(self):
        text = "hello multimodal"
        raw = text.encode()
        img = multimodal.decode_image(multimodal.synthesize_ppm(text))
        assert img["width"] == 4 + len(raw) % 5
        assert img["height"] == 4 + (7 * len(raw)) % 5


def test_real_decode_features(image_payloads):
    out = multimodal.extract_binary_features(image_payloads)
    assert "payload" not in out.columns  # blobs never reach a shuffle
    rows = out.collect()
    assert all(r["format"] == "ppm" for r in rows)
    assert all(4 <= r["width"] <= 8 and 4 <= r["height"] <= 8 for r in rows)
    assert all(0.0 <= r["mean_value"] <= 255.0 for r in rows)
    assert all(len(r["content_md5"]) == 32 for r in rows)


def test_features_md5_matches_payload(image_payloads):
    got = {
        r["doc_id"]: r["content_md5"]
        for r in multimodal.extract_binary_features(image_payloads).collect()
    }
    for r in image_payloads.select("doc_id", "payload").collect():
        assert got[r["doc_id"]] == hashlib.md5(bytes(r["payload"])).hexdigest()


def test_fake_decoder_contract(payloads):
    # Arbitrary (non-image) payloads still flow through the same seam with
    # an injected decoder + schema.
    out = multimodal.extract_binary_features(
        payloads,
        decoder=multimodal.fake_decode,
        schema=multimodal.FAKE_FEATURE_SCHEMA,
    )
    row = out.limit(1).collect()[0]
    assert row["n_bytes"] > 0 and len(row["content_md5"]) == 32


def test_resize_contract(image_payloads):
    out = multimodal.resize(image_payloads, 8, 8)
    rows = out.collect()
    assert all(len(r["payload"]) == 11 + 192 for r in rows)  # header + 8*8*3
    assert all((r["width"], r["height"]) == (8, 8) for r in rows)
    assert all(r["payload_kind"] == "image/resized" for r in rows)


def test_frame_sample_counts(payloads):
    frames = multimodal.sample_frames(payloads, every_n_bytes=64, max_frames=8)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in counts)
    assert frames.filter(F.octet_length("frame_bytes") > 8).count() == 0


class TestAudioCodec:
    def test_wav_roundtrip_mono(self):
        pcm = (np.arange(300, dtype=np.int64) * 211 % 65536 - 32768).astype(np.int16)
        audio = multimodal.decode_audio(multimodal.encode_wav(pcm, 8000))
        assert (audio["format"], audio["sample_rate"], audio["channels"]) == (
            "wav", 8000, 1,
        )
        assert audio["n_samples"] == 300
        assert np.array_equal(audio["samples"][:, 0], pcm)

    def test_wav_roundtrip_stereo(self):
        pcm = np.stack(
            [np.arange(100, dtype=np.int16), np.arange(100, dtype=np.int16) * -1],
            axis=1,
        )
        audio = multimodal.decode_audio(multimodal.encode_wav(pcm, 44100))
        assert audio["channels"] == 2 and audio["n_samples"] == 100
        assert np.array_equal(audio["samples"], pcm)

    def test_extra_riff_chunks_skipped(self):
        payload = multimodal.encode_wav(np.ones(10, dtype=np.int16), 16000)
        # Splice a LIST chunk between 'WAVE' and 'fmt ' — parsers must walk.
        extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
        spliced = payload[:12] + extra + payload[12:]
        assert multimodal.decode_audio(spliced)["n_samples"] == 10

    def test_non_pcm_gated_and_unknown_rejected(self):
        import struct as st

        payload = bytearray(multimodal.encode_wav(np.ones(4, dtype=np.int16)))
        st.pack_into("<H", payload, 20, 3)  # audio_format=3 (IEEE float)
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio(bytes(payload))
        with pytest.raises(ValueError):
            multimodal.decode_audio(b"not audio at all")

    def test_synthesized_features(self, spark, sf_small):
        docs = spark.read.parquet(f"{sf_small}/documents.parquet").limit(20)
        payloads = multimodal.attach_audio_payload(docs)
        rows = multimodal.extract_binary_features(
            payloads,
            decoder=multimodal.audio_features,
            schema=multimodal.AUDIO_FEATURE_SCHEMA,
        ).collect()
        assert all(r["format"] == "wav" for r in rows)
        assert all(64 <= r["n_samples"] < 192 for r in rows)
        assert all(r["n_bytes"] == 44 + r["n_samples"] * 2 for r in rows)
        assert all(0.0 < r["rms"] < 32768.0 for r in rows)
