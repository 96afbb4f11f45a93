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
        # NO whitespace after maxval: pre-fix the decoder consumed 'A' as
        # the separator and returned a one-byte-shifted raster with
        # decode_ok=True — wrong data instead of quarantine
        b"P6\n2 1\n255" + b"ABCDEFG",
    ],
)
def test_ppm_decode_rejects_malformed(bad):
    assert multimodal.decode_ppm(bad) is None


def test_codec_oracles_ascii_assumption(sf_dir):
    """The q61/q90/q94/q99q/q99zl oracles use CHARACTER semantics (ord,
    length, string_split) while the Spark side synthesizes from utf-8
    BYTES; they agree exactly iff the corpus is pure ASCII. Pin that
    loudly: if the driver's documents fixture ever grows a non-ASCII
    character, this fails with a named reason instead of the oracle
    comparisons failing with opaque value-hash mismatches."""
    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' "
        "WHERE octet_length(encode(text)) <> length(text)"
    ).fetchone()[0]
    assert n == 0, (
        f"{n} non-ASCII documents: the char-semantics codec oracles "
        "(q61/q90/q94/q99q/q99zl) no longer match the byte-based Spark "
        "side — move those oracles to octet semantics (see q60)"
    )


def test_decode_image_batch_real_ppm_path():
    good = multimodal.synth_ppm(4, 2, bytes(24))
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [good, b"garbage"]})
    (out,) = list(multimodal.decode_image_batch(iter([pdf]), decoder="ppm"))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (4, 2, "rgb")
    assert rows[1].decode_ok and not rows[2].decode_ok


# ---------------------------------------------------------------------------
# PNG codec (golden per-spec images + round trips + quarantine)
# ---------------------------------------------------------------------------

import struct
import zlib


def _png_raw(ihdr_body: bytes, raw_scanlines: bytes) -> bytes:
    """Assemble a PNG from an explicit IHDR body and raw (pre-compression)
    scanline bytes — lets tests hand-build per-spec filtered data."""
    return (
        multimodal._PNG_SIG
        + multimodal._png_chunk(b"IHDR", ihdr_body)
        + multimodal._png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + multimodal._png_chunk(b"IEND", b"")
    )


def test_png_golden_hand_built_all_five_filters():
    """Hand-built 4x5 grayscale image, one scanline per spec filter type,
    with the reconstruction worked out by hand from the PNG spec (§9):
      y0 None    filt [10,20,30,40] -> [10,20,30,40]
      y1 Sub     filt [ 5, 5, 5, 5] -> [ 5,10,15,20]   (left cumsum)
      y2 Up      filt [ 1, 1, 1, 1] -> [ 6,11,16,21]   (prior + 1)
      y3 Average filt [ 4, 4, 4, 4] -> [ 7,13,18,23]   ((left+up)//2 + 4)
      y4 Paeth   filt [ 2, 2, 2, 2] -> [ 9,15,20,25]   (predictor + 2)
    A decoder that fumbles ANY filter, the recurrence order, or the
    floor-division in Average cannot reproduce these bytes."""
    rows = [
        (0, [10, 20, 30, 40]),
        (1, [5, 5, 5, 5]),
        (2, [1, 1, 1, 1]),
        (3, [4, 4, 4, 4]),
        (4, [2, 2, 2, 2]),
    ]
    raw = b"".join(bytes([f] + data) for f, data in rows)
    ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 0, 0, 0, 0)  # 8-bit gray
    dec = multimodal.decode_png(_png_raw(ihdr, raw))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (4, 5, 1)
    expected = bytes(
        [10, 20, 30, 40, 5, 10, 15, 20, 6, 11, 16, 21, 7, 13, 18, 23, 9, 15, 20, 25]
    )
    assert dec["pixels"] == expected


def test_png_golden_hand_built_truecolor_sub_paeth():
    """Hand-built 2x2 truecolor image: Sub row then Paeth row, worked out
    by hand with bpp=3 (the per-PIXEL, not per-byte, left/upper-left
    offsets that byte-oriented decoders get wrong)."""
    # y0 Sub: filt [1,2,3, 4,5,6] -> px0 [1,2,3], px1 [1+4,2+5,3+6]=[5,7,9]
    # y1 Paeth: filt [5,5,5, 5,5,5]
    #   x0: a=0  b=[1,2,3] c=0      -> pred=b  -> [6,7,8]
    #   x1: a=[6,7,8] b=[5,7,9] c=[1,2,3]; p=a+b-c=[10,12,14];
    #       pa=|p-a|=[4,5,6] pb=|p-b|=[5,5,5] pc=|p-c|=[9,10,11]
    #       ch0: pa=4<=pb=5 -> a=6; ch1: pa=5<=pb=5 -> a=7 (tie->a);
    #       ch2: pa=6>pb=5 -> b=9          -> pred=[6,7,9] -> [11,12,14]
    raw = bytes([1, 1, 2, 3, 4, 5, 6]) + bytes([4, 5, 5, 5, 5, 5, 5])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 8-bit truecolor
    dec = multimodal.decode_png(_png_raw(ihdr, raw))
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (2, 2, 3)
    assert dec["pixels"] == bytes([1, 2, 3, 5, 7, 9, 6, 7, 8, 11, 12, 14])


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize(
    "width,height",
    [(1, 1), (1, 7), (4, 1), (3, 5), (4, 8), (7, 6)],
)
def test_png_roundtrip_geometries(channels, width, height):
    """synth (one filter per y%5 scanline) -> decode must reproduce the
    source bytes for edge geometries incl. 1x1 and single-column, both
    gray and truecolor; >=5-row cases exercise all five filters."""
    n = width * height * channels
    pixels = bytes((i * 37 + 11) % 256 for i in range(n))
    dec = multimodal.decode_png(
        multimodal.synth_png(width, height, pixels, channels=channels)
    )
    assert dec is not None
    assert (dec["width"], dec["height"], dec["channels"]) == (
        width,
        height,
        channels,
    )
    assert dec["pixels"] == pixels


def test_png_truncation_and_crc_quarantine():
    good = multimodal.synth_png(4, 5, bytes(range(60)), channels=3)
    dec = multimodal.decode_png(good)
    assert dec is not None and dec["pixels"] == bytes(range(60))
    # truncated anywhere inside the chunk stream -> None, never an exception
    for cut in (7, 8, 20, len(good) // 2, len(good) - 1):
        assert multimodal.decode_png(good[:cut]) is None
    # flip one byte inside the IDAT body without fixing its CRC
    idat_at = good.index(b"IDAT") + 4 + 2
    corrupt = good[:idat_at] + bytes([good[idat_at] ^ 0xFF]) + good[idat_at + 1 :]
    assert multimodal.decode_png(corrupt) is None
    assert multimodal.decode_png(b"not a png at all") is None


@pytest.mark.parametrize(
    "ihdr",
    [
        struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0),  # palette
        struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0),  # RGBA
        struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0),  # 16-bit
        struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1),  # interlaced
        struct.pack(">IIBBBBB", 0, 2, 8, 2, 0, 0, 0),  # zero width
    ],
)
def test_png_unsupported_variants_quarantine(ihdr):
    raw = bytes([0, 0, 0, 0, 0, 0, 0])
    assert multimodal.decode_png(_png_raw(ihdr, raw)) is None


def test_png_undefined_filter_type_quarantine():
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    assert multimodal.decode_png(_png_raw(ihdr, bytes([5, 1, 2, 3]))) is None


def test_png_decompression_bomb_bounded():
    """A crafted PNG must not inflate unboundedly (ADVICE r9): oversized
    IHDR geometry is rejected before inflate, and an IDAT that inflates
    past the IHDR-implied size is rejected by the bounded decompress."""
    # 1 GB-pixel geometry: rejected by the pixel cap, no inflate attempted
    bomb_ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 2, 0, 0, 0)
    assert multimodal.decode_png(_png_raw(bomb_ihdr, b"\x00")) is None
    # tiny declared geometry, IDAT inflating to 1 MB of zeros
    tiny_ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    assert multimodal.decode_png(_png_raw(tiny_ihdr, bytes(1 << 20))) is None
    # undersized IDAT (fewer raw bytes than the geometry needs) also rejects
    assert multimodal.decode_png(_png_raw(tiny_ihdr, b"\x00")) is None


def test_decode_image_batch_real_png_path():
    good_rgb = multimodal.synth_png(4, 2, bytes(24), channels=3)
    good_gray = multimodal.synth_png(2, 3, bytes(6), channels=1)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [good_rgb, good_gray, b"garbage"]}
    )
    (out,) = list(multimodal.decode_image_batch(iter([pdf]), decoder="png"))
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (4, 2, "rgb")
    assert (rows[2].width, rows[2].height, rows[2].channels) == (2, 3, "gray")
    assert rows[1].decode_ok and rows[2].decode_ok and not rows[3].decode_ok


def test_q99zl_png_raster_stats(spark, sf_dir):
    q = all_queries()["q99zl_png_raster_stats"]
    a = q.fn(spark, sf_dir).orderBy("doc_id").toPandas()
    assert a["decode_ok"].all()
    assert (a["width"] == multimodal.PPM_WIDTH).all()
    assert (a["channels"] == 3).all()
    assert (a["height"] >= 5).all()  # every image exercised all 5 filters
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(f"length(text) >= {multimodal._PNG_MIN_BYTES}")
        .count()
    )
    assert len(a) == docs


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
