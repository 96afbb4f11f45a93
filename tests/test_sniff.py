"""Magic-byte format detection (operators/sniff.py) invariants beyond
the q99zzt oracle gate (which runs in test_queries_vs_duckdb):

- each real codec's output is detected as its own format;
- detection is bytes-only: unrecognized or truncated payloads return
  None (quarantine), and a payload that matches a magic but fails to
  parse is quarantined by the DECODER, never misreported;
- the synthesized mixed corpus covers all five formats.
"""

from __future__ import annotations

import pytest

from allora_indexer_spark.operators.multimodal import (
    decode_ppm,
    synth_png,
    synth_ppm,
    synth_wav_pcm16,
)
from allora_indexer_spark.operators.sniff import _synth_for, sniff_payload
from allora_indexer_spark.operators.video import synth_y4m_mono


def test_sniff_detects_each_real_codec_output():
    payload = (b"a deterministic payload, sixty-plus bytes, for all codecs" * 2)[:72]
    assert sniff_payload(synth_ppm(4, 4, payload[:48])) == "ppm"
    assert sniff_payload(synth_wav_pcm16(payload)) == "wav"
    assert sniff_payload(synth_png(4, 5, payload[:60], channels=3)) == "png"
    assert sniff_payload(synth_y4m_mono(payload, 3)) == "y4m"
    from allora_indexer_spark.operators.jpegcodec import synth_jpeg_baseline

    raster = bytes(range(64)) * 72  # 72x64 gray
    assert sniff_payload(synth_jpeg_baseline(72, 64, raster[:4608], 1)) == "jpeg"


@pytest.mark.parametrize(
    "buf",
    [
        b"",
        b"plain text document",
        b"RIFFxxxxAVI ",  # RIFF but not WAVE
        b"P5\n4 4\n255\n" + bytes(16),  # PGM, not P6
        b"P6x",  # P6 without whitespace separator
        b"\x89PNx",  # truncated PNG signature
        b"YUV4MPEG",  # truncated Y4M magic
    ],
)
def test_sniff_unrecognized_returns_none(buf):
    assert sniff_payload(buf) is None


def test_magic_match_with_bad_body_is_quarantined_by_decoder():
    """Content sniffing can only see magics: a payload that LOOKS like
    PPM but fails the header grammar must come back None from the
    decoder (the quarantine seam), not crash or misreport."""
    buf = b"P6 garbage that is not a header"
    assert sniff_payload(buf) == "ppm"
    assert decode_ppm(buf) is None


def test_synth_selector_covers_all_formats():
    payload = b"x" * 61
    got = {sniff_payload(_synth_for(i, payload)) for i in range(10)}
    assert got == {"ppm", "wav", "png", "jpeg", "y4m"}
