"""Multimodal tests: binary column layout, the REAL stdlib WAV/PPM codecs
(cross-validated against the stdlib ``wave`` module), decode batch shapes,
and the NotImplementedError gate for formats that need external libraries."""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
import pytest

from allora_indexer_spark.operators import multimodal
from allora_indexer_spark.registry import all_queries


def test_binary_layout(spark, sf_dir):
    b = multimodal.binary_documents(spark, sf_dir)
    row = b.orderBy("doc_id").first()
    assert isinstance(row["payload"], bytearray | bytes)
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["payload"])


# ---------------------------------------------------------------------------
# WAV codec
# ---------------------------------------------------------------------------


def test_wav_synth_readable_by_stdlib_wave():
    """Our writer's output must be a legal WAV per the stdlib reader."""
    payload = bytes(range(256))
    with wave.open(io.BytesIO(multimodal.synth_wav_pcm16(payload))) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == multimodal.WAV_RATE
        assert w.getnframes() == 256
        frames = np.frombuffer(w.readframes(256), dtype="<i2")
    expected = (np.arange(256, dtype=np.int16) - 128) * 256
    assert np.array_equal(frames, expected)


def test_wav_decode_matches_stdlib_on_foreign_file():
    """Our decoder must agree with the stdlib on a WAV it did not write."""
    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    dec = multimodal.decode_wav(buf.getvalue())
    assert dec is not None
    assert dec["rate"] == 44100
    assert dec["channels"] == 1 and dec["bits"] == 16
    assert np.array_equal(dec["samples"], samples)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"notawav",
        b"RIFF\x00\x00\x00\x00WAVE",  # no chunks at all
        b"RIFF\x24\x00\x00\x00WAVEfmt \xff\xff\xff\xff",  # truncated chunk
        multimodal.synth_wav_pcm16(b"ok")[:20],  # cut mid-header
    ],
)
def test_wav_decode_rejects_malformed(bad):
    assert multimodal.decode_wav(bad) is None


def test_wav_roundtrip_stats_match_direct_computation():
    payload = b"hello waveform"
    dec = multimodal.decode_wav(multimodal.synth_wav_pcm16(payload))
    expected = (np.frombuffer(payload, np.uint8).astype(np.int64) - 128) * 256
    assert np.array_equal(dec["samples"], expected)


# ---------------------------------------------------------------------------
# PPM codec
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_and_comment_header():
    pixels = bytes(range(2 * 3 * 3)) * 1  # 2x3 RGB
    buf = multimodal.synth_ppm(2, 3, pixels)
    dec = multimodal.decode_ppm(buf)
    assert (dec["width"], dec["height"], dec["maxval"]) == (2, 3, 255)
    assert dec["pixels"] == pixels
    # header comments are part of the P6 grammar
    commented = b"P6\n# made by a test\n2 3\n255\n" + pixels
    dec2 = multimodal.decode_ppm(commented)
    assert (dec2["width"], dec2["height"]) == (2, 3) and dec2["pixels"] == pixels


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"P5\n1 1\n255\n\x00",  # wrong magic (P5 is PGM)
        b"P6\n2 3\n255\n\x00\x01",  # truncated pixel data
        b"P6\n2 3\n65535\n" + b"\x00" * 18,  # 16-bit maxval unsupported
        b"P6\n-1 3\n255\n",  # negative width is a grammar error
    ],
)
def test_ppm_decode_rejects_malformed(bad):
    assert multimodal.decode_ppm(bad) is None


def test_decode_image_batch_real_ppm_path():
    good = multimodal.synth_ppm(4, 2, bytes(24))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [good, b"garbage"]})
    (out,) = list(multimodal.decode_image_batch(iter([pdf]), decoder="ppm"))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (4, 2, "rgb")
    assert rows[1].decode_ok and not rows[2].decode_ok


# ---------------------------------------------------------------------------
# Batch plumbing
# ---------------------------------------------------------------------------


def test_q61_decode_stats_deterministic(spark, sf_dir):
    q = all_queries()["q61_multimodal_decode"]
    a = q.fn(spark, sf_dir).orderBy("doc_id").toPandas()
    b = q.fn(spark, sf_dir).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert a["decode_ok"].all()
    assert (a["sample_rate"] == multimodal.WAV_RATE).all()
    assert (a["bits"] == 16).all()
    # one output row per non-empty document
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("length(text) > 0")
        .count()
    )
    assert len(a) == docs


def test_fake_decoder_still_deterministic():
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abc", b"xyz"]})
    (a,) = list(multimodal.decode_image_batch(iter([pdf])))
    (b,) = list(multimodal.decode_image_batch(iter([pdf])))
    pd.testing.assert_frame_equal(a, b)
    assert a["width"].between(16, 255).all()


def test_unavailable_decoder_is_gated():
    pdf = pd.DataFrame({"doc_id": [1], "payload": [b"xyz"]})
    with pytest.raises(NotImplementedError):
        list(multimodal.decode_image_batch(iter([pdf]), decoder="pillow"))
