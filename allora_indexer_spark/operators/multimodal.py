"""Multimodal (opaque-binary) column operators.

Pattern for image/audio/video at 100 TB: store the payload as an opaque
``binary`` column with typed metadata beside it; run decode / feature
extraction / frame sampling as Arrow-batched ``mapInPandas`` stages so the
bytes never round-trip through Python row-at-a-time.

This container has no image/audio libraries, so the actual codec call is
STUBBED: ``decode_image_batch`` raises NotImplementedError unless the
deterministic fake decoder is selected. Everything around the stub — the
binary column plumbing, metadata struct, batch shapes, partitioning, the
UDF signature — is real and tested (tests/test_multimodal.py).

The binary payloads here are derived from ``documents.text`` (utf-8 bytes),
which lets q60's byte-level statistics have an exact DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table

CHUNK_BYTES = 64  # "frame" size for the chunked-processing operator


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct) — the canonical
    multimodal layout: opaque bytes + typed metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


@query(
    "q60_binary_metadata_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           MAX(octet_length(encode(text))) AS max_bytes,
           md5(string_agg(md5(text), '' ORDER BY doc_id)) AS corpus_digest
    FROM documents
    GROUP BY lang
    """,
)
def q60_binary_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level statistics over the binary payload column + an
    order-stable corpus digest (md5 of per-doc md5s concatenated in doc_id
    order via sort_array of (doc_id, md5) structs)."""
    b = binary_documents(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("doc_md5"), "lang"
    )
    per_lang = docs.groupBy("lang").agg(
        F.md5(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "doc_md5"))
                    ),
                    lambda s: s.getField("doc_md5"),
                ),
            )
        ).alias("corpus_digest")
    )
    stats = b.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("meta.n_bytes")).cast("bigint").alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )
    return stats.join(per_lang, "lang").select(
        "lang", "n_docs", "total_bytes", "max_bytes", "corpus_digest"
    )


@query(
    "q62_frame_sampling",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             i AS frame_idx,
             substr(text, 1 + (i * {CHUNK_BYTES}), {CHUNK_BYTES}) AS frame
      FROM documents,
           LATERAL (SELECT UNNEST(range(0,
             CAST(ceil(length(text) / {CHUNK_BYTES}.0) AS INTEGER))) AS i)
    )
    SELECT doc_id, frame_idx, md5(frame) AS frame_digest, length(frame) AS frame_len
    FROM frames
    WHERE frame_idx % 4 = 0
    """,
)
def q62_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque payload stream: chunk into fixed-size
    frames, keep every 4th, digest each — the video-keyframe access pattern
    (sequence + substring explode keeps it JVM-side; the decode of each
    sampled frame is where the q61 mapInPandas stage plugs in)."""
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.ceil(F.length("text") / F.lit(float(CHUNK_BYTES))).cast("int")
    # the length guard matters: Spark's sequence(0, -1) DESCENDS ([0, -1]),
    # so an empty payload would emit bogus frames where DuckDB's range(0, 0)
    # emits none (same hazard family as the shingle guards in dedup.py)
    frames = docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.col("text"),
    ).filter(F.col("frame_idx") % 4 == 0)
    frame = F.substring(
        F.col("text"), F.lit(1) + F.col("frame_idx") * CHUNK_BYTES, CHUNK_BYTES
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(frame).alias("frame_digest"),
        F.length(frame).alias("frame_len"),
    )


# ---------------------------------------------------------------------------
# The stubbed decode stage (mapInPandas)
# ---------------------------------------------------------------------------


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a real image decode: pseudo width/height
    from the payload digest. Replaced by e.g. PIL.Image.open in production."""
    d = hashlib.md5(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, "fake-rgb"


def decode_image_batch(
    df_iter: Iterator[pd.DataFrame], decoder: str = "fake"
) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload) → (doc_id, width, height,
    channels, decode_ok). Arrow-batched; one output row per input row."""
    for pdf in df_iter:
        if decoder != "fake":
            raise NotImplementedError(
                "real image decoding requires an image library not present "
                "in this environment; only the deterministic 'fake' decoder "
                "is available"
            )
        rows = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            rows, columns=["width", "height", "channels"]
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out["decode_ok"] = True
        yield out


@query("q61_multimodal_decode")  # no oracle: the decode stage is Python-side
def q61_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over the binary column via mapInPandas (the
    stubbed codec). Determinism is pinned by tests/test_multimodal.py; the
    driver records a rows-only check."""
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    return b.mapInPandas(
        decode_image_batch,
        schema="doc_id long, width int, height int, channels string, decode_ok boolean",
    ).orderBy("doc_id")


@query(
    "q90_waveform_window_stats",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id,
             i AS window_idx,
             substr(text, 1 + (i * {CHUNK_BYTES}), {CHUNK_BYTES}) AS frame
      FROM documents,
           LATERAL (SELECT UNNEST(range(0,
             CAST(ceil(length(text) / {CHUNK_BYTES}.0) AS INTEGER))) AS i)
    ), amps AS (
      SELECT doc_id, window_idx,
             list_transform(string_split(frame, ''), c -> ord(c)) AS amp
      FROM frames
    )
    SELECT doc_id, window_idx,
           len(amp) AS n_samples,
           CAST(list_sum(amp) AS BIGINT) AS sum_amp,
           CAST(list_max(amp) AS INTEGER) AS peak_amp,
           CAST(list_sum(amp) AS DOUBLE) / len(amp) AS mean_amp
    FROM amps
    """,
)
def q90_waveform_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed waveform statistics over an opaque payload stream — the
    audio-DSP access pattern (per-window mean amplitude and peak for VAD /
    silence trimming), run here on the text-derived byte proxy so the
    result has an exact integer oracle. The per-sample loop is a
    higher-order transform + aggregate INSIDE the array column: samples
    never become rows, so the shuffle-free plan moves one row per window,
    not one per sample. A real PCM decode slots in as a mapInPandas stage
    (q61's shape) upstream of the same windowed aggregate.

    Scale: window explode is map-side Generate; all math is JVM codegen;
    output is windows-sized. At 100 TB the sample math rides the scan."""
    docs = load_table(spark, sf_dir, "documents")
    n_windows = F.ceil(F.length("text") / F.lit(float(CHUNK_BYTES))).cast("int")
    # empty-payload guard: Spark's sequence(0, -1) descends; see q62
    frames = docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_windows - 1)).alias("window_idx"),
        F.substring(
            F.col("text"), F.lit(1) + F.col("window_idx") * CHUNK_BYTES, CHUNK_BYTES
        ).alias("frame"),
    )
    amp = F.transform(F.split("frame", ""), lambda c: F.ascii(c))
    amps = frames.select("doc_id", "window_idx", amp.alias("amp"))
    sum_amp = F.aggregate(
        "amp", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return amps.select(
        "doc_id",
        "window_idx",
        F.size("amp").alias("n_samples"),
        sum_amp.alias("sum_amp"),
        F.array_max("amp").alias("peak_amp"),
        (sum_amp.cast("double") / F.size("amp")).alias("mean_amp"),
    )
