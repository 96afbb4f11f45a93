"""Content-based format detection (magic-byte sniffing) over a MIXED
opaque-binary corpus — the dispatch stage of a production multimodal
lake, where payload formats cannot be trusted to match any declared
extension/mime and must be detected from the bytes (the `file(1)` /
libmagic access pattern).

``sniff_payload`` recognizes the five container formats this engine
implements real codecs for — PPM (P6), RIFF/WAV, PNG, JPEG (SOI
marker), YUV4MPEG2 — by their published signatures, and
q99zzt_multimodal_sniff_decode drives the full dispatch: each document
is synthesized into one of the five formats (selector: doc_id % 5),
the stage detects the format FROM THE BYTES ALONE and routes to the
matching real decoder, and the unified per-row stats are recomputed by
the DuckDB oracle from the per-format synthesis rules. A sniffing bug
(wrong magic, over-eager match order) misroutes a payload, whose
decode then fails or yields different stats — caught as a row-count or
value mismatch; the doc_id-selector never reaches the detection path.

Scale (100 TB): one Arrow-batched mapInPandas stage over the scan —
exactly the q61/q94/q99zl/q99zza/q99zzp shape, but with all five
codecs live behind a per-row dispatch; output one row per document, no
shuffle beyond the codec-bound repartition.

Reference analog: the opaque-payload decode feeding typed tables,
execute.go:82-109 → db.go inserts (the reference trusts one payload
schema; a lake cannot).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from allora_indexer_spark.operators.multimodal import (
    _RASTER_CELLS,
    _RASTER_H,
    _RASTER_W,
    PPM_WIDTH,
    _PPM_ROW,
    _PNG_MIN_BYTES,
    decode_ppm,
    decode_png,
    decode_wav,
    synth_png,
    synth_ppm,
    synth_wav_pcm16,
)
from allora_indexer_spark.operators.video import (
    Y4M_MAGIC,
    decode_y4m,
    synth_y4m_mono,
)
from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_payload(buf: bytes) -> str | None:
    """Detect the container format from published magic bytes alone:
    PNG 8-byte signature (RFC 2083 §12.11), RIFF/WAVE fourCCs, JPEG SOI
    marker 0xFFD8, PPM 'P6' + whitespace, YUV4MPEG2 stream magic.
    Returns the format token or None for unrecognized bytes (quarantine
    data, not an exception — the decode_wav contract)."""
    if buf.startswith(_PNG_SIG):
        return "png"
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:2] == b"\xff\xd8":
        return "jpeg"
    if buf[:2] == b"P6" and (len(buf) > 2 and buf[2:3] in b" \t\n\r"):
        return "ppm"
    if buf.startswith(Y4M_MAGIC):
        return "y4m"
    return None


def _synth_for(doc_id: int, payload: bytes) -> bytes:
    """The per-document synthesis: selector doc_id % 5 picks the format,
    each branch reusing the EXACT rule of its format's own oracle query
    (q94 ppm, q61 wav, q99zl png, q99zzj jpeg uniform blocks, q99zzp
    y4m) so the unified oracle can replay every decoded value."""
    from allora_indexer_spark.operators.jpegcodec import (
        synth_jpeg_baseline,
        synth_jpeg_progressive,
    )

    fsel = doc_id % 5
    if fsel == 0:
        h = len(payload) // _PPM_ROW
        return synth_ppm(PPM_WIDTH, h, payload[: h * _PPM_ROW])
    if fsel == 1:
        return synth_wav_pcm16(payload)
    if fsel == 2:
        h = len(payload) // _PPM_ROW
        return synth_png(PPM_WIDTH, h, payload[: h * _PPM_ROW], channels=3)
    if fsel == 3:
        t = (payload * (_RASTER_CELLS // len(payload) + 1))[:_RASTER_CELLS]
        v = 2 * (np.frombuffer(t, np.uint8).astype(np.int64) % 128)
        raster = np.repeat(
            np.repeat(v.reshape(8, 9), 8, axis=0), 8, axis=1
        ).astype(np.uint8)
        synth = synth_jpeg_progressive if doc_id % 2 else synth_jpeg_baseline
        return synth(_RASTER_W, _RASTER_H, raster.tobytes(), 1)
    return synth_y4m_mono(payload, 2 + len(payload) % 5)


def sniff_decode_stats(
    df_iter: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: synthesize the mixed corpus, then — looking
    ONLY at the bytes — sniff each payload's format and route it to the
    matching real decoder; emit unified stats (dimensions, decoded
    value count, decoded value sum) from the DECODED output. Failed
    sniffs or decodes are dropped, never sentinel rows."""
    from allora_indexer_spark.operators.jpegcodec import decode_jpeg

    for pdf in df_iter:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            if not b:
                continue
            buf = _synth_for(doc_id, b)
            fmt = sniff_payload(buf)
            if fmt is None:
                continue
            if fmt == "ppm":
                d = decode_ppm(buf)
                if d is None:
                    continue
                px = np.frombuffer(d["pixels"], np.uint8).astype(np.int64)
                row = (d["width"], d["height"], len(px), int(px.sum()))
            elif fmt == "wav":
                d = decode_wav(buf)
                if d is None:
                    continue
                s = d["samples"].astype(np.int64)
                row = (0, 0, len(s), int(s.sum()))
            elif fmt == "png":
                d = decode_png(buf)
                if d is None:
                    continue
                px = np.frombuffer(d["pixels"], np.uint8).astype(np.int64)
                row = (d["width"], d["height"], len(px), int(px.sum()))
            elif fmt == "jpeg":
                d = decode_jpeg(buf)
                if d is None:
                    continue
                px = np.frombuffer(d["pixels"], np.uint8).astype(np.int64)
                row = (d["width"], d["height"], len(px), int(px.sum()))
            else:  # y4m
                d = decode_y4m(buf)
                if d is None:
                    continue
                n_vals = sum(f["y"].size for f in d["frames"])
                total = int(
                    sum(int(f["y"].astype(np.int64).sum()) for f in d["frames"])
                )
                row = (d["width"], d["height"], n_vals, total)
            rows.append((doc_id, fmt, *row))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "fmt",
                "width",
                "height",
                "n_values",
                "value_sum",
            ],
        )


_ORD_SUM = "list_sum(list_transform(string_split({s}, ''), c -> ord(c)))"


@query(
    "q99zzt_multimodal_sniff_decode",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n,
             CAST(doc_id % 5 AS INTEGER) AS fsel,
             CAST(length(text) // {_PPM_ROW} AS INTEGER) AS h,
             substr(repeat(text, ({_RASTER_CELLS} // length(text)) + 1),
                    1, {_RASTER_CELLS}) AS s72
      FROM documents WHERE length(text) >= {_PNG_MIN_BYTES}
    )
    SELECT doc_id,
      CASE fsel WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav' WHEN 2 THEN 'png'
                WHEN 3 THEN 'jpeg' ELSE 'y4m' END AS fmt,
      CAST(CASE fsel WHEN 0 THEN {PPM_WIDTH} WHEN 1 THEN 0
                     WHEN 2 THEN {PPM_WIDTH} WHEN 3 THEN {_RASTER_W}
                     ELSE 9 END AS INTEGER) AS width,
      CAST(CASE fsel WHEN 0 THEN h WHEN 1 THEN 0 WHEN 2 THEN h
                     WHEN 3 THEN {_RASTER_H} ELSE 8 END AS INTEGER) AS height,
      CAST(CASE fsel WHEN 0 THEN h * {_PPM_ROW} WHEN 1 THEN n
                     WHEN 2 THEN h * {_PPM_ROW}
                     WHEN 3 THEN {_RASTER_W * _RASTER_H}
                     ELSE (2 + n % 5) * {_RASTER_CELLS} END AS INTEGER)
        AS n_values,
      CAST(CASE fsel
        WHEN 0 THEN {_ORD_SUM.format(s=f"substr(text, 1, h * {_PPM_ROW})")}
        WHEN 1 THEN list_sum(list_transform(string_split(text, ''),
                                            c -> (ord(c) - 128) * 256))
        WHEN 2 THEN {_ORD_SUM.format(s=f"substr(text, 1, h * {_PPM_ROW})")}
        WHEN 3 THEN 64 * list_sum(list_transform(string_split(s72, ''),
                                                 c -> 2 * (ord(c) % 128)))
        ELSE (2 + n % 5) * {_ORD_SUM.format(s="s72")}
      END AS BIGINT) AS value_sum
    FROM d
    """,
)
def q99zzt_multimodal_sniff_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mixed-corpus decode with content-based dispatch: one fifth of the
    documents each materialize as PPM, WAV, PNG, JPEG and Y4M payloads;
    the stage detects each format from its MAGIC BYTES alone (the
    selector never reaches the detection path) and routes to the
    matching real codec; the unified stats come from the DECODED
    values, so this one gate exercises the sniffing order, all five
    container parsers, and their value chains (PNG's inflate+unfilter,
    JPEG's DCT chain via the tie-free uniform-block argument, Y4M's
    frame walk) against a single DuckDB replay of the five synthesis
    rules. A misrouted or misparsed payload drops or mismatches its
    row. The uniform length >= {_PNG_MIN_BYTES} gate keeps every branch
    well-formed (PNG needs 5 scanlines for its all-five-filters
    schedule).

    Scale (100 TB): one Arrow-batched mapInPandas stage, map-only;
    detection is O(16 bytes) per row; output docs-sized."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.filter(F.length("text") >= _PNG_MIN_BYTES).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    b = b.repartition(b.sparkSession.sparkContext.defaultParallelism)
    return b.mapInPandas(
        sniff_decode_stats,
        schema=(
            "doc_id long, fmt string, width int, height int,"
            " n_values int, value_sum long"
        ),
    )
