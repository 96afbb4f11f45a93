"""Sequential + progressive JPEG codec (jpegcodec.py) — the multimodal
decode gate's real parser (baseline landed round 14, progressive round
15). Four layers of evidence:

1. HANDCRAFTED bitstreams with expected pixels computed from the spec math
   INDEPENDENTLY in this file (no shared helper with the codec): a DC-only
   block, a single-AC-coefficient block, a three-scan progressive stream
   (DC first at Al=1 + DC refinement + AC scan), and a two-block EOB-run
   stream. These catch compensating encoder/decoder bug pairs (shared
   wrong zigzag, wrong IDCT scale, wrong successive-approximation shift)
   that roundtrip tests cannot see.
2. Roundtrip fidelity bounds: uniform images reconstruct within ±2
   (DC-only quantization error <= Q[0]/2 spread over 64 pixels), smooth
   gradients within a small MAE at Annex K.1 quality, 4:2:0 within a
   looser bound per subsampling step 4:4:4 → 4:2:2 → 4:2:0 (chroma
   subsampling is lossy by design); restart-interval
   streams decode BIT-IDENTICALLY to their no-restart twins.
3. Transmission-order invariance: progressive and non-interleaved
   multi-scan encodings of the same pixels decode BIT-IDENTICALLY to
   their baseline twin — successive approximation and scan splitting
   reorder the same quantized coefficients, so any pixel difference is
   a decoder bug by construction.
4. Contract edges: malformed → None (quarantine, including spec-invalid
   progressive scan headers), arithmetic/lossless/12-bit →
   NotImplementedError (loud), encoder input validation → ValueError,
   and the mapInPandas stage wiring (decode_image_batch decoder='jpeg').
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pytest

from allora_indexer_spark.operators.jpegcodec import (
    decode_jpeg,
    synth_jpeg_baseline,
    synth_jpeg_progressive,
)
from allora_indexer_spark.operators.multimodal import decode_image_batch


def _gradient_rgb(w: int, h: int) -> np.ndarray:
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [(xx * 255 // w), (yy * 255 // h), ((xx + yy) * 255 // (w + h))],
        axis=-1,
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# handcrafted bitstreams vs independent spec math
# ---------------------------------------------------------------------------


def _minimal_gray_jpeg(scan_bits: str, qdc: int = 16, qall: int = 1) -> bytes:
    """One 8x8 grayscale block, quant table = [qdc, qall, qall, ...] in
    zigzag order, and trivially small Huffman tables:
      DC table: symbol 6 -> code '0' (1 bit)
      AC table: symbol 0x00 (EOB) -> '0', symbol 0x01 -> '10' (2 bits)
    The caller supplies the entropy bits; they are padded with 1s."""
    out = bytearray(b"\xff\xd8")
    qt = bytes([0]) + bytes([qdc] + [qall] * 63)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC DHT: one 1-bit code for symbol 6
    bits = [0] * 16
    bits[0] = 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 1) + bytes([0x00] + bits + [6])
    # AC DHT: '0' -> EOB, '10' -> 0x01 (run 0, size 1)
    bits = [0] * 16
    bits[0] = 1
    bits[1] = 1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + 2) + bytes([0x10] + bits + [0x00, 0x01])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) + b"\x00\x3f\x00"
    pad = (-len(scan_bits)) % 8
    data = int(scan_bits + "1" * pad, 2).to_bytes((len(scan_bits) + pad) // 8, "big")
    # byte-stuff any 0xFF the handcrafted bits might produce
    out += data.replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_dc_only_block_matches_spec_math():
    # DC diff = 40 (category 6, extra bits '101000'), then EOB.
    # Spec math, computed here from first principles: reconstructed
    # coefficient = 40 * Q[0] = 640; orthonormal IDCT of a DC-only block
    # is uniform DC / 8 = 80; + 128 level shift = 208 everywhere.
    d = decode_jpeg(_minimal_gray_jpeg("0" + "101000" + "0"))
    assert d is not None
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    px = np.frombuffer(d["pixels"], np.uint8)
    assert (px == 208).all()


def test_handcrafted_negative_dc_extend():
    # DC diff = -40: category 6, extra bits = (-40 + 63) = 23 = '010111'
    # (the EXTEND complement encoding). Pixels = -40*16/8 + 128 = 48.
    d = decode_jpeg(_minimal_gray_jpeg("0" + "010111" + "0"))
    px = np.frombuffer(d["pixels"], np.uint8)
    assert (px == 48).all()


def test_handcrafted_single_ac_coefficient_position_and_basis():
    # DC diff 0 is NOT representable with the 1-symbol DC table above
    # (symbol 6 only), so send DC diff 40 plus ONE AC coefficient:
    # AC symbol 0x01 ('10') = run 0, size 1, extra bit '1' -> +1 at
    # zigzag index 1 = natural position (row 0, col 1), then EOB.
    # Spec math: pixel(y,x) = 208 + 1*Q_zz1 * C1(x) where Q_zz1 = 1 and
    # C1(x) = 0.5*cos((2x+1)*pi/16) * sqrt(1/8)*... — for the orthonormal
    # 2-D basis, coefficient (0,1) contributes
    # a(0)*a(1)*cos((2x+1)*1*pi/16) with a(0)=sqrt(1/8), a(1)=1/2.
    d = decode_jpeg(_minimal_gray_jpeg("0" + "101000" + "10" + "1" + "0"))
    px = np.frombuffer(d["pixels"], np.uint8).reshape(8, 8).astype(float)
    base = 640.0 / 8.0 + 128.0
    expect = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            contrib = (
                np.sqrt(1 / 8) * 0.5 * np.cos((2 * x + 1) * np.pi / 16)
            )
            expect[y, x] = np.clip(round(base + contrib), 0, 255)
    # the AC contribution is < 1 in magnitude (Q=1), so allow the
    # rounding boundary but require the PATTERN: columns 0-3 >= base
    # rounded, columns 4-7 <= it, constant down each column
    assert np.abs(px - expect).max() <= 1
    assert (px == px[0, :]).all(), "AC (0,1) basis varies only along x"
    assert px[0, 0] >= px[0, 7]


# ---------------------------------------------------------------------------
# roundtrip fidelity
# ---------------------------------------------------------------------------


def test_uniform_images_roundtrip_within_dc_quantum():
    for val in (0, 17, 137, 255):
        for ch, sub in ((1, "444"), (3, "444"), (3, "422"), (3, "420")):
            img = np.full((16, 24, ch), val, np.uint8)
            buf = synth_jpeg_baseline(24, 16, img.tobytes(), ch, sub)
            d = decode_jpeg(buf)
            assert d is not None and d["channels"] == ch
            px = np.frombuffer(d["pixels"], np.uint8)
            assert np.abs(px.astype(int) - val).max() <= 2, (val, ch, sub)


def test_gradient_roundtrip_bounded_error():
    img = _gradient_rgb(24, 17)  # non-multiple-of-8 dims on purpose
    for sub, mae_bound, max_bound in (
        ("444", 4.0, 16), ("422", 5.5, 24), ("420", 7.0, 32)
    ):
        buf = synth_jpeg_baseline(24, 17, img.tobytes(), 3, sub)
        d = decode_jpeg(buf)
        assert (d["width"], d["height"]) == (24, 17)
        got = np.frombuffer(d["pixels"], np.uint8).reshape(17, 24, 3)
        err = np.abs(got.astype(float) - img.astype(float))
        assert err.mean() < mae_bound, (sub, err.mean())
        assert err.max() <= max_bound, (sub, err.max())


def test_restart_interval_stream_decodes_identically():
    img = _gradient_rgb(24, 17)
    plain = decode_jpeg(synth_jpeg_baseline(24, 17, img.tobytes(), 3, "444"))
    for ri in (1, 2, 5):
        buf = synth_jpeg_baseline(
            24, 17, img.tobytes(), 3, "444", restart_interval=ri
        )
        assert b"\xff\xdd" in buf and b"\xff\xd0" in buf
        d = decode_jpeg(buf)
        assert d["pixels"] == plain["pixels"], f"restart_interval={ri}"


def test_grayscale_and_subsampled_dims_exact():
    for w, h in ((8, 8), (9, 9), (16, 15), (31, 2)):
        g = (np.arange(w * h) % 251).astype(np.uint8).tobytes()
        d = decode_jpeg(synth_jpeg_baseline(w, h, g, 1))
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
        rgb = _gradient_rgb(w, h)
        for sub in ("422", "420"):
            d = decode_jpeg(synth_jpeg_baseline(w, h, rgb.tobytes(), 3, sub))
            assert (d["width"], d["height"], d["channels"]) == (w, h, 3), sub


# ---------------------------------------------------------------------------
# contract edges: quarantine vs loud gate
# ---------------------------------------------------------------------------


def _valid_buf() -> bytes:
    return synth_jpeg_baseline(16, 8, _gradient_rgb(16, 8).tobytes(), 3)


def test_malformed_payloads_quarantine_to_none():
    buf = _valid_buf()
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(buf[:2]) is None  # SOI only
    assert decode_jpeg(buf[:40]) is None  # truncated mid-segment
    assert decode_jpeg(buf[:-20]) is None  # entropy stream cut mid-MCU
    # scan referencing an undefined quant table
    broken = bytearray(buf)
    i = broken.find(b"\xff\xdb")
    broken[i + 4] = 7  # table id 7, never referenced by SOF's Tq=0
    assert decode_jpeg(bytes(broken)) is None


@pytest.mark.parametrize(
    "sof,name",
    [(0xC3, "lossless"), (0xC9, "arithmetic"), (0xCA, "arithmetic progressive")],
)
def test_unsupported_modes_raise_loudly(sof, name):
    buf = bytearray(_valid_buf())
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = sof
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


def test_baseline_relabelled_sof2_quarantines_as_malformed():
    """SOF2 is DECODED since round 15 — but a baseline file whose SOF
    marker is flipped to SOF2 carries a baseline scan header
    (Ss=0, Se=63), which G.1.1.1.1 forbids for progressive (a DC scan
    must cover exactly coefficient 0). That's malformed data → None,
    not a raise and not a silent wrong image."""
    buf = bytearray(_valid_buf())
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2
    assert decode_jpeg(bytes(buf)) is None


def test_twelve_bit_precision_raises_loudly():
    buf = bytearray(_valid_buf())
    i = buf.find(b"\xff\xc0")
    buf[i + 4] = 12  # precision byte inside SOF0
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(buf))


# ---------------------------------------------------------------------------
# mapInPandas stage wiring
# ---------------------------------------------------------------------------


def test_decode_image_batch_jpeg_decoder():
    good = _valid_buf()
    gray = synth_jpeg_baseline(8, 8, bytes(range(64)), 1)
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "payload": [good, gray, b"junk"]}
    )
    (out,) = list(decode_image_batch(iter([pdf]), decoder="jpeg"))
    assert list(out["decode_ok"]) == [True, True, False]
    assert list(out["channels"]) == ["rgb", "gray", ""]
    assert list(out["width"]) == [16, 8, 0]


def test_decode_image_batch_progressive_decodes():
    """Progressive JPEGs — the dominant web-crawl format — decode
    through the mapInPandas stage since round 15 (they used to be a
    loud NotImplementedError gate)."""
    prog = synth_jpeg_progressive(16, 8, _gradient_rgb(16, 8).tobytes(), 3)
    gray = synth_jpeg_progressive(8, 8, bytes(range(64)), 1)
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [prog, gray]})
    (out,) = list(decode_image_batch(iter([pdf]), decoder="jpeg"))
    assert list(out["decode_ok"]) == [True, True]
    assert list(out["channels"]) == ["rgb", "gray"]
    assert list(out["width"]) == [16, 8]


def test_decode_image_batch_lossless_fails_loudly_not_silently():
    buf = bytearray(_valid_buf())
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC3  # lossless: still a loud gate
    pdf = pd.DataFrame({"doc_id": [1], "payload": [bytes(buf)]})
    with pytest.raises(NotImplementedError):
        list(decode_image_batch(iter([pdf]), decoder="jpeg"))


def test_fill_bytes_before_markers_are_skipped():
    # B.1.1.2: any marker may be preceded by 0xFF fill bytes
    buf = _valid_buf()
    i = buf.find(b"\xff\xc0")
    filled = buf[:i] + b"\xff\xff\xff" + buf[i:]
    d0, d1 = decode_jpeg(buf), decode_jpeg(filled)
    assert d1 is not None and d0["pixels"] == d1["pixels"]


def test_decoder_fuzz_never_raises_unexpected():
    """Quarantine contract under mutation: random single/multi-byte
    corruptions of valid files (and pure garbage) must yield a dict or
    None — or NotImplementedError when the mutation lands on a mode
    byte — never any other exception and never a hang. Deterministic
    seed; 300 mutations across three base files keeps this < 2s."""
    rng = np.random.RandomState(42)
    bases = [
        _valid_buf(),
        synth_jpeg_baseline(8, 8, bytes(range(64)), 1),
        synth_jpeg_baseline(
            24, 17, _gradient_rgb(24, 17).tobytes(), 3, "420",
            restart_interval=2,
        ),
        synth_jpeg_progressive(24, 17, _gradient_rgb(24, 17).tobytes(), 3, "420"),
        synth_jpeg_baseline(
            16, 9, _gradient_rgb(16, 9).tobytes(), 3, interleaved=False
        ),
    ]
    for base in bases:
        for _ in range(100):
            buf = bytearray(base)
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
            try:
                d = decode_jpeg(bytes(buf))
                assert d is None or isinstance(d, dict)
            except NotImplementedError:
                pass  # mutation hit a SOF/precision byte: loud by contract
    # pure garbage of assorted sizes
    for n in (0, 1, 2, 3, 10, 100, 1000):
        blob = bytes(rng.randint(0, 256, n, dtype=np.uint8).tolist())
        assert decode_jpeg(blob) is None or isinstance(
            decode_jpeg(b"\xff\xd8" + blob), (dict, type(None))
        )


def test_desynced_marker_walk_quarantines_not_raises():
    """A corrupted segment length that lands the marker walk on bytes
    that LOOK like an unsupported SOF (0xFF 0xC3) is malformed data owed
    the quarantine None — the loud gate fires only after the segment
    structure validates (found by review in round 14: the gate used to
    fire before the length check, so one corrupt EXIF-ish payload could
    abort a whole decode job as 'lossless')."""
    # SOI + APP0(len=4, 2 body bytes) + fake SOF3 with an INVALID length
    buf = (
        b"\xff\xd8"
        + b"\xff\xe0\x00\x04ab"
        + b"\xff\xc3\x00\x01"  # seg_len=1 < 2: structurally malformed
        + b"\xff\xd9"
    )
    assert decode_jpeg(buf) is None
    # a structurally VALID lossless SOF still raises loudly
    good = bytearray(_valid_buf())
    i = good.find(b"\xff\xc0")
    good[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))


# ---------------------------------------------------------------------------
# progressive (SOF2) + non-interleaved: transmission-order invariance
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,ch,sub",
    [
        (24, 17, 3, "444"), (24, 17, 3, "422"), (24, 17, 3, "420"),
        (16, 16, 3, "444"), (8, 8, 1, "444"), (31, 2, 1, "444"),
        (33, 9, 3, "420"),
    ],
)
def test_progressive_decodes_bit_identical_to_baseline(w, h, ch, sub):
    """Successive approximation + spectral selection reorder the SAME
    quantized coefficients, so a progressive encoding must decode to the
    EXACT raster its baseline twin decodes to — any difference is a
    decoder bug by construction (no fidelity tolerance needed)."""
    if ch == 1:
        px = (np.arange(w * h) % 251).astype(np.uint8).tobytes()
    else:
        px = _gradient_rgb(w, h).tobytes()
    base = decode_jpeg(synth_jpeg_baseline(w, h, px, ch, sub))
    prog = decode_jpeg(synth_jpeg_progressive(w, h, px, ch, sub))
    assert prog is not None
    assert (prog["width"], prog["height"], prog["channels"]) == (
        base["width"], base["height"], base["channels"]
    )
    assert prog["pixels"] == base["pixels"]


def test_progressive_restart_interval_decodes_identically():
    """RSTn markers inside progressive scans reset the DC predictors AND
    the EOB run (G.1.2) — restart streams must be bit-identical to their
    no-restart twins."""
    px = _gradient_rgb(24, 17).tobytes()
    plain = decode_jpeg(synth_jpeg_progressive(24, 17, px, 3, "444"))
    for ri in (1, 2, 5):
        buf = synth_jpeg_progressive(24, 17, px, 3, "444", restart_interval=ri)
        assert b"\xff\xdd" in buf and b"\xff\xd0" in buf
        d = decode_jpeg(buf)
        assert d is not None and d["pixels"] == plain["pixels"], ri


def test_noninterleaved_baseline_decodes_bit_identical():
    """A non-interleaved multi-scan BASELINE file (one single-component
    scan per channel, T.81 A.2.2 — flagged by round-14 review as a
    quarantined-but-legal mode) carries the same coefficients as the
    interleaved form and must decode bit-identically."""
    px = _gradient_rgb(24, 17).tobytes()
    for sub in ("444", "420"):
        inter = synth_jpeg_baseline(24, 17, px, 3, sub)
        multi = synth_jpeg_baseline(24, 17, px, 3, sub, interleaved=False)
        assert multi.count(b"\xff\xda") == 3  # three SOS segments
        di, dm = decode_jpeg(inter), decode_jpeg(multi)
        assert dm is not None and dm["pixels"] == di["pixels"], sub


# ---------------------------------------------------------------------------
# handcrafted progressive bitstreams vs independent spec math
# ---------------------------------------------------------------------------


def _pad_bits(scan_bits: str) -> bytes:
    pad = (-len(scan_bits)) % 8
    data = int(scan_bits + "1" * pad, 2).to_bytes(
        (len(scan_bits) + pad) // 8, "big"
    )
    return data.replace(b"\xff", b"\xff\x00")


def _prog_gray_header(width: int = 8, height: int = 8) -> bytes:
    """SOI + DQT (Q[0]=16, rest 1) + SOF2 for a 1-component image."""
    out = bytearray(b"\xff\xd8")
    qt = bytes([0]) + bytes([16] + [1] * 63)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    return bytes(out)


def _dht(tc: int, lengths: list[int], vals: list[int]) -> bytes:
    bits = [0] * 16
    for ln in lengths:
        bits[ln - 1] += 1
    body = bytes([tc << 4]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _sos1(ss: int, se: int, ah: int, al: int) -> bytes:
    return (
        b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
        + bytes([ss, se, (ah << 4) | al])
    )


def test_handcrafted_progressive_three_scan_stream():
    """DC-first at Al=1, DC refinement to Al=0, then one AC scan — all
    expected pixels computed here from first principles.

    Scan 1 codes DC>>1 = 20 (category 5 under a 1-bit Huffman code
    '0', extra bits '10100'), so after scan 1 the coefficient is
    20<<1 = 40. Scan 2's single raw bit (1) refines it to 41. Scan 3
    puts +1 at zigzag 1 (symbol 0x01 = '10', sign/extra bit '1', then
    EOB '0'). Reconstruction: DC 41 * Q[0]=16 -> 656, orthonormal IDCT
    of a DC-only block is uniform 656/8 = 82, +128 level shift = 210;
    the AC coefficient adds a(0)*a(1)*cos((2x+1)*pi/16) per column."""
    buf = bytearray(_prog_gray_header())
    # scan 1: DC first (Al=1); DC table: category 5 -> '0'
    buf += _dht(0, [1], [5])
    buf += _sos1(0, 0, 0, 1)
    buf += _pad_bits("0" + "10100")
    # scan 2: DC refine (Ah=1, Al=0): one raw bit, no Huffman table
    buf += _sos1(0, 0, 1, 0)
    buf += _pad_bits("1")
    # scan 3: AC first (Ss=1..63): table EOB->'0', 0x01->'10'
    buf += _dht(1, [1, 2], [0x00, 0x01])
    buf += _sos1(1, 63, 0, 0)
    buf += _pad_bits("10" + "1" + "0")
    buf += b"\xff\xd9"
    d = decode_jpeg(bytes(buf))
    assert d is not None
    assert (d["width"], d["height"], d["channels"]) == (8, 8, 1)
    px = np.frombuffer(d["pixels"], np.uint8).reshape(8, 8).astype(float)
    base = 656.0 / 8.0 + 128.0
    expect = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            contrib = np.sqrt(1 / 8) * 0.5 * np.cos((2 * x + 1) * np.pi / 16)
            expect[y, x] = np.clip(round(base + contrib), 0, 255)
    assert np.abs(px - expect).max() <= 1
    assert (px == px[0, :]).all()
    assert px[0, 0] >= px[0, 7]


def test_handcrafted_progressive_dc_only_stream_is_displayable():
    """A progressive file whose script stops after the DC scans is legal
    and displayable (that's the format's whole point). DC-first 20 at
    Al=1 then refinement bit 0 -> DC stays 40: uniform 40*16/8+128 = 208."""
    buf = bytearray(_prog_gray_header())
    buf += _dht(0, [1], [5])
    buf += _sos1(0, 0, 0, 1)
    buf += _pad_bits("0" + "10100")
    buf += _sos1(0, 0, 1, 0)
    buf += _pad_bits("0")
    buf += b"\xff\xd9"
    d = decode_jpeg(bytes(buf))
    assert d is not None
    assert (np.frombuffer(d["pixels"], np.uint8) == 208).all()


def test_handcrafted_eob_run_spans_blocks():
    """EOBn semantics (G.2.1): symbol 0x10 + 1 extra bit 0 means an EOB
    run of 2 — the current block's band ends AND the next block's whole
    band is zero. Two 8x8 blocks (16x8 image), DC 40 then 24 via diffs
    under a 2-symbol DC table; expected pixels are uniform per block:
    40*16/8+128 = 208 and 24*16/8+128 = 176."""
    buf = bytearray(_prog_gray_header(width=16, height=8))
    # DC table: canonical 2-bit codes: cat5 -> '00', cat6 -> '01'
    buf += _dht(0, [2, 2], [5, 6])
    buf += _sos1(0, 0, 0, 0)
    # block 1: cat6 '01' + 40='101000'; block 2: diff -16 cat5 '00'+'01111'
    buf += _pad_bits("01" + "101000" + "00" + "01111")
    # AC scan: EOB1 table: 0x10 -> '0'; bits: '0' + receive(1)='0' -> run 2
    buf += _dht(1, [1], [0x10])
    buf += _sos1(1, 63, 0, 0)
    buf += _pad_bits("0" + "0")
    buf += b"\xff\xd9"
    d = decode_jpeg(bytes(buf))
    assert d is not None and (d["width"], d["height"]) == (16, 8)
    px = np.frombuffer(d["pixels"], np.uint8).reshape(8, 16)
    assert (px[:, :8] == 208).all()
    assert (px[:, 8:] == 176).all()


def test_progressive_invalid_scan_headers_quarantine():
    """Spec-invalid progressive scan headers are malformed data -> None:
    a DC scan with Se != 0, an interleaved AC scan (via a 3-component
    fixture), and Ah != Al+1 successive approximation."""
    # DC scan with Se=5 on the 1-component fixture
    buf = bytearray(_prog_gray_header())
    buf += _dht(0, [1], [5])
    buf += _sos1(0, 5, 0, 1)
    buf += _pad_bits("0" + "10100")
    buf += b"\xff\xd9"
    assert decode_jpeg(bytes(buf)) is None
    # Ah != Al+1
    buf = bytearray(_prog_gray_header())
    buf += _dht(0, [1], [5])
    buf += _sos1(0, 0, 0, 1)
    buf += _pad_bits("0" + "10100")
    buf += _sos1(0, 0, 3, 0)  # Ah=3 refining to Al=0: invalid
    buf += _pad_bits("1")
    buf += b"\xff\xd9"
    assert decode_jpeg(bytes(buf)) is None
    # interleaved AC scan: take a valid progressive RGB file and rewrite
    # its first single-component AC SOS into a 3-component one
    good = synth_jpeg_progressive(16, 8, _gradient_rgb(16, 8).tobytes(), 3)
    i = good.find(b"\xff\xda")  # first SOS = interleaved DC scan: skip it
    i = good.find(b"\xff\xda", i + 2)  # second SOS = AC scan (ns=1)
    ns3 = (
        b"\xff\xda" + struct.pack(">HB", 12, 3)
        + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + good[i + 7 : i + 10]
    )
    assert decode_jpeg(good[:i] + ns3 + good[i + 10 :]) is None


def test_progressive_missing_dc_scan_quarantines():
    """A progressive stream whose only scan is an AC band leaves the
    component without DC data — malformed by the decoder's completeness
    contract (None, not a garbage raster)."""
    buf = bytearray(_prog_gray_header())
    buf += _dht(1, [1, 2], [0x00, 0x01])
    buf += _sos1(1, 63, 0, 0)
    buf += _pad_bits("10" + "1" + "0")
    buf += b"\xff\xd9"
    assert decode_jpeg(bytes(buf)) is None


def test_progressive_truncated_mid_scan_quarantines():
    prog = synth_jpeg_progressive(24, 17, _gradient_rgb(24, 17).tobytes(), 3)
    assert decode_jpeg(prog[: len(prog) // 2]) is None


# ---------------------------------------------------------------------------
# encoder input validation (ValueError, not assert — survives python -O)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("synth", [synth_jpeg_baseline, synth_jpeg_progressive])
def test_encoder_rejects_malformed_inputs_with_valueerror(synth):
    with pytest.raises(ValueError):
        synth(8, 8, bytes(64), channels=2)
    with pytest.raises(ValueError):
        synth(8, 8, bytes(64 * 3), 3, subsampling="411")
    with pytest.raises(ValueError):
        synth(8, 8, bytes(63), 1)  # short pixel buffer


def test_partially_interleaved_scans_decode_bit_identical():
    """T.81 allows a scan to interleave any SUBSET of the frame's
    components (1 < Ns < Nf): encode Y+Cb interleaved in one scan and Cr
    alone in a second (and the reverse split), decode bit-identically to
    the fully-interleaved file. Progressive DC scans over a subset take
    the same walker."""
    from allora_indexer_spark.operators.jpegcodec import _synth_scripted

    px = _gradient_rgb(24, 17).tobytes()
    base = decode_jpeg(synth_jpeg_baseline(24, 17, px, 3, "444"))
    for script in (
        [([0, 1], 0, 63, 0, 0), ([2], 0, 63, 0, 0)],
        [([0], 0, 63, 0, 0), ([1, 2], 0, 63, 0, 0)],
    ):
        buf = _synth_scripted(24, 17, px, 3, "444", 0, 0xC0, script)
        d = decode_jpeg(buf)
        assert d is not None and d["pixels"] == base["pixels"], script
    # progressive with a SUBSET DC scan: Y+Cb DC together, Cr DC alone,
    # then the usual per-component AC script
    script = [
        ([0, 1], 0, 0, 0, 1),
        ([2], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
        ([0, 1], 0, 0, 1, 0),
        ([2], 0, 0, 1, 0),
    ]
    buf = _synth_scripted(24, 17, px, 3, "444", 0, 0xC2, script)
    d = decode_jpeg(buf)
    assert d is not None and d["pixels"] == base["pixels"]


def test_dc_predictor_overflow_stays_in_quarantine_contract():
    """The DC predictor is an unbounded running sum (category 15 =
    +/-32767 per block; progressive DC-first left-shifts by Al <= 13),
    so a malformed stream can push a coefficient past 2^31. The int64
    accumulators must absorb that into the normal clip path — a dict or
    None, NEVER an arithmetic exception out of decode_jpeg (round-15
    review: the accumulators were briefly int32, which overflows here)."""
    # 128x8 gray = 16 blocks; DC-first at Al=13, every block diff +32767
    # (DC table: category 15 -> '0'; extra bits = 15 ones). After 16
    # blocks preds = 524272, << 13 = 4.29e9 > 2^31.
    buf = bytearray(_prog_gray_header(width=128, height=8))
    buf += _dht(0, [1], [15])
    buf += _sos1(0, 0, 0, 13)
    buf += _pad_bits(("0" + "1" * 15) * 16)
    buf += b"\xff\xd9"
    d = decode_jpeg(bytes(buf))
    assert d is None or isinstance(d, dict)
    if d is not None:  # huge positive DC -> clipped white, by design
        px = np.frombuffer(d["pixels"], np.uint8)
        assert (px == 255).all()


def test_ac_refine_run_overrunning_band_quarantines():
    """G.2.2 contract edge (round-15 reviewer advice): a refinement
    token (run, 1) promising a newly-significant coefficient whose run
    walks PAST Se is malformed — libjpeg silently drops the pending
    coefficient, but the module contract is quarantine (None), never a
    slightly wrong image. Band Ss=1..Se=5 holds 5 zero-history slots;
    symbol 0xF1 asks to skip 16 before placing the new coefficient."""
    buf = bytearray(_prog_gray_header())
    buf += _dht(0, [1], [5])
    buf += _sos1(0, 0, 0, 1)
    buf += _pad_bits("0" + "10100")       # DC-first: 20 << 1
    buf += _dht(1, [1], [0x00])
    buf += _sos1(1, 5, 0, 1)
    buf += _pad_bits("0")                  # AC-first at Al=1: all-zero EOB
    buf += _dht(1, [1], [0xF1])
    buf += _sos1(1, 5, 1, 0)
    buf += _pad_bits("0" + "1")            # (15,1)+sign: run overruns Se=5
    buf += b"\xff\xd9"
    assert decode_jpeg(bytes(buf)) is None
    # control: the SAME scan structure with a fitting run (symbol 0x01,
    # new coefficient lands at k=1) decodes fine — the quarantine is
    # specific to the overrun, not to refinement scans generally
    ok = bytearray(_prog_gray_header())
    ok += _dht(0, [1], [5])
    ok += _sos1(0, 0, 0, 1)
    ok += _pad_bits("0" + "10100")
    ok += _dht(1, [1], [0x00])
    ok += _sos1(1, 5, 0, 1)
    ok += _pad_bits("0")
    ok += _dht(1, [1, 2], [0x01, 0x00])    # (0,1) -> '0', EOB -> '10'
    ok += _sos1(1, 5, 1, 0)
    ok += _pad_bits("0" + "1" + "10")      # place +1 at k=1, then EOB
    ok += b"\xff\xd9"
    assert decode_jpeg(bytes(ok)) is not None


def test_quality_knob_scales_tables_and_keeps_default_identity():
    """The IJG quality scaling (jcparam.c recipe, public): quality=50 is
    the identity on the Annex K tables — byte-identical encoder output —
    while other qualities produce REAL re-encodes: different DQT bytes,
    bounded reconstruction drift (better at 90, worse at 25). This is
    the knob the image-dedup planted fixtures use for 'same image,
    different encode' near-duplicates."""
    from allora_indexer_spark.operators.jpegcodec import _scale_quant, QUANT_LUMA

    assert (_scale_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()
    assert (_scale_quant(QUANT_LUMA, 90) <= QUANT_LUMA).all()
    assert (_scale_quant(QUANT_LUMA, 10) >= QUANT_LUMA).all()
    assert _scale_quant(QUANT_LUMA, 100).min() == 1
    with pytest.raises(ValueError):
        _scale_quant(QUANT_LUMA, 0)

    rgb = _gradient_rgb(24, 16).tobytes()
    assert synth_jpeg_baseline(24, 16, rgb, 3) == synth_jpeg_baseline(
        24, 16, rgb, 3, quality=50
    )
    base = np.frombuffer(
        decode_jpeg(synth_jpeg_baseline(24, 16, rgb, 3))["pixels"], np.uint8
    ).astype(int)
    src = np.frombuffer(rgb, np.uint8).astype(int)
    for q, better in ((90, True), (25, False)):
        buf = synth_jpeg_baseline(24, 16, rgb, 3, quality=q)
        assert buf != synth_jpeg_baseline(24, 16, rgb, 3)
        d = decode_jpeg(buf)
        assert d is not None and len(d["pixels"]) == len(rgb)
        mae = np.abs(
            np.frombuffer(d["pixels"], np.uint8).astype(int) - src
        ).mean()
        mae_base = np.abs(base - src).mean()
        assert (mae <= mae_base) == better, (q, mae, mae_base)
    # progressive twin: bit-identical pixels to baseline at ANY quality
    # (successive approximation reorders the same quantized coefficients)
    for q in (90, 25):
        db = decode_jpeg(synth_jpeg_baseline(24, 16, rgb, 3, quality=q))
        dp = decode_jpeg(synth_jpeg_progressive(24, 16, rgb, 3, quality=q))
        assert dp["pixels"] == db["pixels"], q
