"""Video (YUV4MPEG2) operators: the VIDEO member of the opaque-binary
modality family (multimodal.py's image/audio codecs are the siblings).

A REAL from-scratch Y4M container codec — the uncompressed planar-YUV
interchange format published with mjpegtools and consumed by FFmpeg/x264
(`YUV4MPEG2 W.. H.. F..:.. [Ip|t|b] [A..:..] [C..]\\n` stream header,
then one `FRAME[ params]\\n` marker per frame followed by raw planes) —
plus the four video stages a training-data pipeline needs on top of it:

- q99zzp: container decode → per-video stats (header grammar, frame
  marker walk, plane math — every value replayed by the DuckDB oracle);
- q99zzq: temporal keyframe sampling (every 2nd frame) → per-frame
  perceptual dHash over the decoded luma plane;
- q99zzr: video near-duplicate pairs — temporally-aligned frame hashes
  through the SAME 4x16-bit multi-index-hashing banded join as the
  image/audio families, aggregated to (video_a, video_b) with a
  matched-keyframe floor; planted one-cell-perturbed twin videos make
  the positive branch oracle-verified at every SF;
- q99zzu: shot-boundary detection — consecutive-keyframe hash deltas
  thresholded into cut flags (the scene-segmentation signal adaptive
  frame sampling keys on).

Synthesis rule (what gives the queries exact oracles): each document's
video is ``n_frames`` mono 9x8-luma frames, frame f being the document's
72-byte tiled raster ROTATED by 9*f bytes — a deterministic "scrolling"
clip whose every decoded pixel DuckDB can recompute from the text (the
multimodal.py CONTRACT: character semantics == byte semantics on the
pure-ASCII driver corpus, pinned by test_codec_oracles_ascii_assumption).
Y4M is uncompressed, so unlike the JPEG path there is no quantization
argument needed: decode must return the exact synthesized bytes, and any
header-walk/plane-slicing regression breaks the bit-exact oracle on
every row.

Scale (100 TB): decode+hash is ONE Arrow-batched mapInPandas stage over
the scan (the documented slow path for opaque binary payloads),
repartitioned for codec-bound parallelism; the pair stage is the same
banded equi-join cost model as q99zzd — shuffle on (band, frame_idx)
keys, quadratic only inside a band bucket, never all-pairs.

Reference analog: the opaque-payload decode feeding typed tables,
execute.go:82-109 → db.go inserts; frame sampling is q62's keyframe
access pattern made real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table, pin, pin_lazy
from allora_indexer_spark.operators.multimodal import (
    _DHASH_TAU,
    _dhash_half_sql,
    _hash_band_signature,
    _planted_twin_docs,
    _twin_src_duck,
    pool_dhash_from_gray,
)

# video geometry: mono 9x8 luma frames — the frame IS the published 9x8
# dHash grid (uncompressed, so no pooling stage is needed; the pooling
# realism lives in the JPEG path, q99zzj), rotated 9 bytes per frame
_VID_W = 9
_VID_H = 8
_VID_CELLS = _VID_W * _VID_H  # 72
_VID_STEP = _VID_W  # rotation per frame ("scroll" one row)
_VID_FPS = (25, 1)
_VID_SAMPLE = 2  # keep every 2nd frame (q62's keyframe pattern)
# q99zzr uses a FIXED frame count: the planted twin's doc_id (orig +
# 2^40) would shift a doc_id- or length-derived count, breaking the
# temporal alignment the pair join keys on
_VID_PAIR_FRAMES = 4
_VID_MIN_MATCHED = 2  # both sampled keyframes must match

Y4M_MAGIC = b"YUV4MPEG2"

# chroma-plane subsampling divisors (dx, dy) per colorspace token; the
# three 420 variants differ only in chroma siting, not plane geometry
_CHROMA_DIVS = {
    "mono": None,
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
}


# ---------------------------------------------------------------------------
# The codec
# ---------------------------------------------------------------------------


def synth_y4m(
    width: int,
    height: int,
    frames: list[tuple[bytes, bytes | None, bytes | None]],
    colorspace: str = "mono",
    fps: tuple[int, int] = _VID_FPS,
    interlace: str = "p",
    aspect: tuple[int, int] = (1, 1),
) -> bytes:
    """Y4M container writer: stream header + FRAME-marker-delimited raw
    planes. ``frames`` is a list of (y, u, v) plane byte strings (u/v
    None for mono). Plane sizes are asserted against the colorspace
    geometry so tests cannot silently write a malformed fixture."""
    divs = _CHROMA_DIVS[colorspace]
    out = [
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"I{interlace} A{aspect[0]}:{aspect[1]} C{colorspace}\n".encode()
    ]
    for y, u, v in frames:
        assert len(y) == width * height
        if divs is None:
            assert u is None and v is None
            out.append(b"FRAME\n" + y)
        else:
            dx, dy = divs
            assert u is not None and v is not None
            assert len(u) == (width // dx) * (height // dy) == len(v)
            out.append(b"FRAME\n" + y + u + v)
    return b"".join(out)


def synth_y4m_mono(
    payload: bytes, n_frames: int, width: int = _VID_W, height: int = _VID_H
) -> bytes:
    """Deterministic mono clip from opaque bytes: frame f's luma plane is
    the (width*height)-byte tiled payload rotated by ``width * f`` bytes
    (mod the raster size) — simple enough for DuckDB to recompute every
    pixel from the source text, which is what gives the video queries
    exact oracles (the synth_wav_pcm16 idiom)."""
    n = width * height
    s = (payload * (n // len(payload) + 1))[:n]
    frames = []
    for f in range(n_frames):
        off = (f * width) % n
        frames.append((s[off:] + s[:off], None, None))
    return synth_y4m(width, height, frames, colorspace="mono")


def decode_y4m(buf: bytes) -> dict | None:
    """Real YUV4MPEG2 parser (bytes + numpy only): walks the stream
    header's tagged-parameter grammar (W/H/F required-by-use, I/A/C
    optional, X extensions ignored), then the per-frame FRAME markers
    (frame-level parameters allowed and ignored), slicing Y/U/V planes
    by the colorspace's subsampling geometry. Returns {width, height,
    fps_num, fps_den, interlace, aspect, colorspace, frames:[{y,u,v}]}
    with planes as (rows, cols) uint8 ndarrays, or None for anything
    malformed — decode failures are data, not exceptions (the decode_wav
    quarantine contract). A syntactically VALID colorspace this decoder
    does not implement raises NotImplementedError LOUDLY (the jpegcodec
    rule: a corpus of such files should fail the job, not silently
    quarantine itself)."""
    if not buf.startswith(Y4M_MAGIC):
        return None
    nl = buf.find(b"\n")
    if nl < 0:
        return None
    head = buf[len(Y4M_MAGIC) : nl]
    if head and not head.startswith(b" "):
        return None  # magic must be its own token
    width = height = None
    fps_num, fps_den = 0, 0
    interlace = "?"
    aspect = (0, 0)
    colorspace = "420"  # the spec's default when C is absent
    try:
        for tok in head.split(b" "):
            if not tok:
                continue
            tag, val = tok[:1], tok[1:]
            if tag == b"W":
                width = int(val)
            elif tag == b"H":
                height = int(val)
            elif tag == b"F":
                fn, fd = val.split(b":")
                fps_num, fps_den = int(fn), int(fd)
            elif tag == b"I":
                interlace = val.decode("ascii")
            elif tag == b"A":
                an, ad = val.split(b":")
                aspect = (int(an), int(ad))
            elif tag == b"C":
                colorspace = val.decode("ascii")
            elif tag == b"X":
                pass  # application extension: carried, never load-bearing
            else:
                return None  # unknown parameter tag → malformed
    except (ValueError, UnicodeDecodeError):
        return None
    if width is None or height is None or width <= 0 or height <= 0:
        return None
    if colorspace not in _CHROMA_DIVS:
        raise NotImplementedError(
            f"Y4M colorspace {colorspace!r} not implemented; available: "
            f"{sorted(_CHROMA_DIVS)}"
        )
    divs = _CHROMA_DIVS[colorspace]
    if divs is not None and (width % divs[0] or height % divs[1]):
        return None  # subsampled chroma needs divisible dimensions
    y_size = width * height
    if divs is None:
        c_w = c_h = c_size = 0
    else:
        c_w, c_h = width // divs[0], height // divs[1]
        c_size = c_w * c_h
    frame_size = y_size + 2 * c_size
    frames: list[dict] = []
    pos = nl + 1
    while pos < len(buf):
        if buf[pos : pos + 5] != b"FRAME":
            return None
        fnl = buf.find(b"\n", pos)
        if fnl < 0:
            return None
        params = buf[pos + 5 : fnl]
        if params and not params.startswith(b" "):
            return None  # frame params must be space-separated tokens
        pos = fnl + 1
        if pos + frame_size > len(buf):
            return None  # truncated frame payload
        y = np.frombuffer(buf[pos : pos + y_size], np.uint8).reshape(
            height, width
        )
        if divs is None:
            u = v = None
        else:
            u = np.frombuffer(
                buf[pos + y_size : pos + y_size + c_size], np.uint8
            ).reshape(c_h, c_w)
            v = np.frombuffer(
                buf[pos + y_size + c_size : pos + frame_size], np.uint8
            ).reshape(c_h, c_w)
        frames.append({"y": y, "u": u, "v": v})
        pos += frame_size
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "interlace": interlace,
        "aspect": aspect,
        "colorspace": colorspace,
        "frames": frames,
    }


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------


def _doc_n_frames(payload: bytes) -> int:
    """Data-dependent clip length, 2..6 frames (enough to exercise the
    frame walk without bloating the synthetic payloads)."""
    return 2 + len(payload) % 5


def y4m_decode_stats(
    df_iter: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage for q99zzp: synthesize the document's mono clip,
    decode it with the REAL container parser, and emit per-video stats —
    frame count, parsed header geometry/rate, total luma mass, and the
    md5 of the first and last decoded frames (the frame ORDER witness:
    a frame-walk regression that still slices the right bytes total
    would flip last_frame_md5). Failed decodes are dropped, never
    sentinel rows."""
    for pdf in df_iter:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if not b:
                continue
            d = decode_y4m(synth_y4m_mono(b, _doc_n_frames(b)))
            if d is None or d["colorspace"] != "mono" or not d["frames"]:
                continue
            fr = d["frames"]
            luma = int(sum(int(f["y"].astype(np.int64).sum()) for f in fr))
            rows.append(
                (
                    doc_id,
                    len(fr),
                    d["width"],
                    d["height"],
                    d["fps_num"],
                    d["fps_den"],
                    luma,
                    hashlib.md5(fr[0]["y"].tobytes()).hexdigest(),
                    hashlib.md5(fr[-1]["y"].tobytes()).hexdigest(),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_frames",
                "width",
                "height",
                "fps_num",
                "fps_den",
                "luma_total",
                "frame0_md5",
                "last_frame_md5",
            ],
        )


def _frame_hash_stage(n_frames: int | None):
    """Stage factory: synthesize → decode → keep every ``_VID_SAMPLE``-th
    frame → dHash each decoded luma plane (pool_dhash_from_gray on the
    9x8 frame is the identity pooling: 1x1 blocks). ``n_frames=None``
    derives the clip length from the payload (q99zzq); a fixed count
    keeps planted twins temporally aligned (q99zzr)."""

    def stage(df_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in df_iter:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    continue
                n = _doc_n_frames(b) if n_frames is None else n_frames
                d = decode_y4m(synth_y4m_mono(b, n))
                if d is None:
                    continue
                for idx, f in enumerate(d["frames"]):
                    if idx % _VID_SAMPLE:
                        continue
                    hi, lo = pool_dhash_from_gray(f["y"])
                    rows.append((doc_id, idx, hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "dhash_hi", "dhash_lo"]
            )

    return stage


def _video_frame_hash_frame(
    docs: DataFrame, n_frames: int | None = None
) -> DataFrame:
    """(doc_id, frame_idx, dhash_hi, dhash_lo) through the full synth →
    decode → sample → hash composition, from ANY (doc_id, text) frame.
    Repartitioned to default parallelism first — the codec stage
    dominates row width (the q99zza trade)."""
    b = docs.filter(F.length("text") > 0).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    b = b.repartition(b.sparkSession.sparkContext.defaultParallelism)
    return b.mapInPandas(
        _frame_hash_stage(n_frames),
        schema="doc_id long, frame_idx int, dhash_hi long, dhash_lo long",
    )


# composite store-item encoding for the streaming store: one keyframe =
# one item, id = video_id * 8 + frame_idx (frame counts are <= 6, so 3
# bits suffice and ids never collide)
_VID_ITEM_FRAMES = 8


def video_signature_frame(docs: DataFrame, plan: dict | None = None) -> DataFrame:
    """Keyframe band signatures for the streaming hash store — the VIDEO
    member of the dhash_signature_frame/afp_signature_frame family
    (streaming/stream.py's modality seam). Each sampled keyframe is its
    own store ITEM with the composite id ``video_id * 8 + frame_idx``:
    the store machinery's one-(hi,lo)-per-item invariant is what makes
    every candidate row's popcount deterministic (its dropDuplicates
    keeps an arbitrary matched band row), so multi-frame media must
    enter at frame granularity, not video granularity. Consumers
    recover video ids with ``doc_id DIV 8`` and aggregate frame pairs
    to video pairs (q99zzr's matched-keyframe floor, applied
    downstream). ``plan`` must be None: the MIH wide dial re-hashes the
    64-bit geometry itself and has no video form yet — the caller
    (merge_hash_near_dup_batch) rejects it loudly."""
    if plan is not None:
        raise ValueError("video signatures ship the classic 4x16 geometry")
    h = _video_frame_hash_frame(docs)
    items = h.select(
        (F.col("doc_id") * _VID_ITEM_FRAMES + F.col("frame_idx")).alias(
            "doc_id"
        ),
        "dhash_hi",
        "dhash_lo",
    )
    return _hash_band_signature(items, "dhash_hi", "dhash_lo")


# ---------------------------------------------------------------------------
# DuckDB oracle fragments
# ---------------------------------------------------------------------------


def _vid_src_duck() -> str:
    """src(doc_id, s, n_frames): the tiled 72-byte raster string and the
    data-dependent clip length, replayed from documents.text."""
    n = _VID_CELLS
    return f"""
    src AS (
      SELECT doc_id,
             substr(repeat(text, ({n} // length(text)) + 1), 1, {n}) AS s,
             CAST(2 + length(text) % 5 AS INTEGER) AS n_frames
      FROM documents WHERE length(text) > 0
    )"""


def _rot_sql(off: str) -> str:
    """The rotated frame string: s rotated LEFT by ``off`` bytes."""
    return f"substr(s, ({off}) + 1) || substr(s, 1, ({off}))"


def _vid_frames_duck(n_frames_sql: str) -> str:
    """fr(doc_id, frame_idx, fs): sampled decoded-frame strings — every
    ``_VID_SAMPLE``-th rotation of s (q62's LATERAL range idiom)."""
    return f"""
    fr AS (
      SELECT doc_id, i AS frame_idx,
             {_rot_sql(f"(i * {_VID_STEP}) % {_VID_CELLS}")} AS fs
      FROM src,
           LATERAL (SELECT UNNEST(range(0, {n_frames_sql})) AS i)
      WHERE i % {_VID_SAMPLE} = 0
    )"""


def _vid_cells_duck() -> str:
    cells = ", ".join(
        f"ord(substr(fs, {i + 1}, 1)) AS c{i}" for i in range(_VID_CELLS)
    )
    return f"""
    cells AS (
      SELECT doc_id, frame_idx, {cells} FROM fr
    ), h AS (
      SELECT doc_id, frame_idx,
             {_dhash_half_sql(0)} AS dhash_hi,
             {_dhash_half_sql(1)} AS dhash_lo
      FROM cells
    )"""


# ---------------------------------------------------------------------------
# The queries
# ---------------------------------------------------------------------------

_VID_LUMA_SUM = " + ".join(
    f"ord(substr(s, {i + 1}, 1))" for i in range(_VID_CELLS)
)


@query(
    "q99zzp_y4m_video_decode",
    oracle=f"""
    WITH {_vid_src_duck()}
    SELECT doc_id, n_frames,
           {_VID_W} AS width, {_VID_H} AS height,
           {_VID_FPS[0]} AS fps_num, {_VID_FPS[1]} AS fps_den,
           CAST(n_frames * ({_VID_LUMA_SUM}) AS BIGINT) AS luma_total,
           md5(s) AS frame0_md5,
           md5({_rot_sql(f"((n_frames - 1) * {_VID_STEP}) % {_VID_CELLS}")})
             AS last_frame_md5
    FROM src
    """,
)
def q99zzp_y4m_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video container decode → per-video stats, through the REAL Y4M
    parser (header tagged-parameter grammar, FRAME marker walk, plane
    slicing). The oracle replays every output value from the text via
    the synthesis rule — Y4M is uncompressed, so ANY parser regression
    (marker drift, off-by-one plane slice, frame-order bug) changes
    luma_total or the first/last frame digests on ~every row. Rotation
    makes each frame distinct, so last_frame_md5 only matches if the
    decoder walked the frames in order; width/height/fps are parsed
    back from the header, not assumed.

    Scale (100 TB): one Arrow-batched mapInPandas stage over the scan;
    one output row per document; no shuffle beyond the codec-bound
    repartition."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.filter(F.length("text") > 0).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    b = b.repartition(b.sparkSession.sparkContext.defaultParallelism)
    return b.mapInPandas(
        y4m_decode_stats,
        schema=(
            "doc_id long, n_frames int, width int, height int,"
            " fps_num int, fps_den int, luma_total long,"
            " frame0_md5 string, last_frame_md5 string"
        ),
    )


@query(
    "q99zzq_video_frame_dhash",
    oracle=f"""
    WITH {_vid_src_duck()},
    {_vid_frames_duck("n_frames")},
    {_vid_cells_duck()}
    SELECT doc_id, frame_idx, dhash_hi, dhash_lo FROM h
    """,
)
def q99zzq_video_frame_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe sampling + per-frame perceptual hash — the video twin of
    q99zzj: decode the clip, keep every 2nd frame (q62's keyframe
    access pattern, now over REAL decoded frames), dHash each luma
    plane. One row per (video, sampled frame); the oracle recomputes
    every hash bit from the rotation rule, so the driver gate checks
    the container parse, the temporal sampling AND the hash in one
    bit-exact comparison.

    Scale (100 TB): map-only (one Arrow-batched stage, fan-out bounded
    by the per-video frame count); the hash rows feed any downstream
    MIH join without re-decoding."""
    return _video_frame_hash_frame(load_table(spark, sf_dir, "documents"))


_VID_BANDS_DUCK = """
    bands AS (
      SELECT doc_id, frame_idx, dhash_hi, dhash_lo, b.band_idx,
             CASE b.band_idx
               WHEN 0 THEN (dhash_hi >> 16) WHEN 1 THEN (dhash_hi & 65535)
               WHEN 2 THEN (dhash_lo >> 16) ELSE (dhash_lo & 65535)
             END AS band_val
      FROM h CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band_idx)
    )"""


@query(
    "q99zzr_video_near_dup_pairs",
    oracle=f"""
    WITH {_twin_src_duck(_VID_CELLS)},
    {_vid_frames_duck(str(_VID_PAIR_FRAMES))},
    {_vid_cells_duck()},
    {_VID_BANDS_DUCK},
    p AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.frame_idx,
             CAST(bit_count(xor(a.dhash_hi, b.dhash_hi))
                  + bit_count(xor(a.dhash_lo, b.dhash_lo)) AS INTEGER)
               AS hamming
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
            + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= {_DHASH_TAU}
    )
    SELECT doc_a, doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_matched_frames,
           CAST(SUM(hamming) AS BIGINT) AS total_hamming
    FROM p GROUP BY doc_a, doc_b
    HAVING COUNT(*) >= {_VID_MIN_MATCHED}
    """,
)
def q99zzr_video_near_dup_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Video near-duplicate pairs with oracle-verified POSITIVE output
    at every SF: per-frame dHashes through the real codec, paired by
    the SAME 4x16-bit multi-index-hashing banded join as the image/
    audio families — with frame_idx in the join key (temporal
    alignment: a re-encoded copy matches frame-for-frame) — then
    aggregated to video level with a matched-keyframe floor (both
    sampled keyframes must pair at hamming <= tau). Input is documents
    plus one planted twin per doc_id % 7 == 0 document (one byte of
    the 72-byte tiled raster perturbed — every rotation contains that
    byte exactly once, so EACH frame differs in exactly one cell,
    flipping at most 2 comparison bits: hamming <= 2 <= tau, and the
    twin provably pairs on both keyframes). Fixed 4-frame clips keep
    the twins temporally aligned (a data-dependent count would shift
    with the twin's offset doc_id).

    Scale (100 TB): hash stage map-only and localCheckpoint-pinned so
    the self-join decodes each video ONCE; candidates from an equi-join
    on (band_idx, band_val, frame_idx) — the banded-join cost model
    with temporal alignment sharpening the buckets; exact popcount
    verify; per-pair aggregation is O(matched frames)."""
    both = _planted_twin_docs(
        load_table(spark, sf_dir, "documents"), _VID_CELLS
    )
    h = _video_frame_hash_frame(both, _VID_PAIR_FRAMES).transform(pin_lazy)
    bands = h.select(
        "doc_id",
        "frame_idx",
        F.col("dhash_hi").alias("h_hi"),
        F.col("dhash_lo").alias("h_lo"),
        F.posexplode(
            F.array(
                F.expr("shiftright(dhash_hi, 16)"),
                F.expr("dhash_hi & 65535"),
                F.expr("shiftright(dhash_lo, 16)"),
                F.expr("dhash_lo & 65535"),
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_hi").alias("hi_a"),
        F.col("h_lo").alias("lo_a"),
        "frame_idx",
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_hi").alias("hi_b"),
        F.col("h_lo").alias("lo_b"),
        "frame_idx",
        "band_idx",
        "band_val",
    )
    hamming = F.expr(
        "bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"
    ).cast("int")
    pairs = (
        a.join(b, ["band_idx", "band_val", "frame_idx"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= _DHASH_TAU)
        .select("doc_a", "doc_b", "frame_idx", "hamming")
        .distinct()
    )
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("n_matched_frames"),
            F.sum("hamming").cast("bigint").alias("total_hamming"),
        )
        .filter(F.col("n_matched_frames") >= _VID_MIN_MATCHED)
    )


# ---------------------------------------------------------------------------
# q99zzu: shot-boundary (scene-cut) detection over the keyframe hashes
# ---------------------------------------------------------------------------

# consecutive-keyframe hamming at/above this is reported as a cut.
# Production shot detectors threshold a frame-difference metric the same
# way; the perceptual-hash delta is the cheap shuffle-free proxy that
# rides hashes the dedup path already computes. 17 > the q99zzd near-dup
# tau by a wide margin: a "cut" must be far outside near-duplicate range.
_CUT_TAU = 17


@query(
    "q99zzu_video_scene_cuts",
    oracle=f"""
    WITH {_vid_src_duck()},
    {_vid_frames_duck("n_frames")},
    {_vid_cells_duck()},
    lagd AS (
      SELECT doc_id, frame_idx, dhash_hi, dhash_lo,
             LAG(dhash_hi) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS p_hi,
             LAG(dhash_lo) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS p_lo
      FROM h
    )
    SELECT doc_id, frame_idx,
           CAST(bit_count(xor(dhash_hi, p_hi))
                + bit_count(xor(dhash_lo, p_lo)) AS INTEGER) AS hamming_prev,
           (bit_count(xor(dhash_hi, p_hi))
            + bit_count(xor(dhash_lo, p_lo)) >= {_CUT_TAU}) AS is_cut
    FROM lagd WHERE p_hi IS NOT NULL
    """,
)
def q99zzu_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection — the temporal-STRUCTURE consumer of the
    q99zzq keyframe hashes (the dedup path consumes them spatially):
    each sampled keyframe's perceptual-hash distance to the PREVIOUS
    sampled keyframe of the same video, thresholded into cut flags.
    This is the scene-segmentation signal a frame-sampling curation
    pipeline keys on (sample densely around cuts, sparsely inside
    static shots); the hash-delta proxy costs nothing beyond hashes the
    near-dup path already computes. Single-keyframe clips emit no rows
    in both engines. The oracle replays every hash bit from the
    rotation synthesis and the same LAG/threshold arithmetic.

    Scale (100 TB): the hash stage is map-only (q99zzq); the lag is ONE
    window shuffle partitioned by video id with a per-video frame count
    bounded by the clip length — no corpus-scale sort, no self-join."""
    h = _video_frame_hash_frame(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    s = h.select(
        "doc_id",
        "frame_idx",
        "dhash_hi",
        "dhash_lo",
        F.lag("dhash_hi").over(w).alias("p_hi"),
        F.lag("dhash_lo").over(w).alias("p_lo"),
    )
    delta = F.expr(
        "bit_count(dhash_hi ^ p_hi) + bit_count(dhash_lo ^ p_lo)"
    ).cast("int")
    return s.filter(F.col("p_hi").isNotNull()).select(
        "doc_id",
        "frame_idx",
        delta.alias("hamming_prev"),
        (delta >= _CUT_TAU).alias("is_cut"),
    )


def video_pairs_rollup(pairs: DataFrame, min_matched: int = _VID_MIN_MATCHED) -> DataFrame:
    """Aggregate the streaming store's keyframe-level pair rows
    (composite ids from :func:`video_signature_frame`) to video-level
    near-dup pairs — the downstream half of the streaming video
    pipeline, mirroring q99zzr's matched-keyframe floor: decode
    ``video = item DIV 8``, drop within-video frame matches (a static
    scene pairing with itself is temporal structure, not a duplicate),
    count matched keyframes per (video_a, video_b) and keep pairs at or
    above the floor. Runs on the pairs store's (doc_a, doc_b, hamming)
    schema; one video-key shuffle over the already-verified pair set
    (O(pairs), never corpus-sized)."""
    v = pairs.select(
        (F.col("doc_a") / _VID_ITEM_FRAMES).cast("long").alias("video_a"),
        (F.col("doc_b") / _VID_ITEM_FRAMES).cast("long").alias("video_b"),
        "hamming",
    ).filter(F.col("video_a") != F.col("video_b"))
    return (
        v.groupBy("video_a", "video_b")
        .agg(
            F.count("*").alias("n_matched_frames"),
            F.min("hamming").alias("min_hamming"),
        )
        .filter(F.col("n_matched_frames") >= min_matched)
    )
