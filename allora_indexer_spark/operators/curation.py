"""Corpus-curation extras: exact substring-span dedup, gap sessionization,
PII masking, and signed-random-projection embedding sketches.

These extend the dedup/quality family (operators/dedup.py, textstats.py)
with four operators a production training-data pipeline runs between raw
crawl and tokenizer:

- q97: duplicated n-gram *span* statistics — the SQL-expressible core of
  exact substring deduplication (Lee et al., "Deduplicating Training Data
  Makes Language Models Better", ACL 2022). Their suffix-array pass finds
  every repeated span >= 50 tokens; the distributed approximation is a
  fixed-width (8-token) gram inventory: a gram occurring more than once in
  the corpus marks a duplicated span, and the per-document duplicated-gram
  fraction is the signal used to drop or trim documents.
- q98: gap-based sessionization over the event stream (30-minute idle
  gap), the standard behavioral-analytics operator (reference analog: the
  height-windowed activity queries over inference events,
  /root/reference/process_block.go:1-60 feed the same shaped table).
- q99: PII masking — sequential regex scrubs (email first, then digit
  runs) with a masked-token count, the redaction pass every compliance
  pipeline runs before training.
- q99b: signed-random-projection (SRP) LSH signatures over the embedding
  column (Charikar, STOC 2002, applied to dense vectors): 16 deterministic
  hyperplanes -> 16-bit signature -> bucket sizes. The embedding-space twin
  of the text SimHash in dedup.py (q42/q43).

Everything is built-in Spark SQL; no Python in the hot path. Hashes are
md5-derived so Spark and DuckDB agree bit-for-bit; the SRP hyperplane signs
are deterministic md5-of-(plane,dim) constants folded into the plan as
literals, so both engines evaluate the identical unrolled expression.

Scale design (100 TB story):
- q97 shuffles 32-byte gram hashes, never raw text: cost ~ corpus tokens x
  32 B through two hash shuffles (global gram count, then per-doc roll-up).
  This is the canonical distributed form — true suffix arrays do not
  distribute, gram inventories do.
- q98 is one shuffle on user_id; the session assignment is a single window
  pass and the roll-up reuses the same partitioning (no second exchange).
- q99 is map-only (zero shuffle).
- q99b is map-side signature computation (unrolled JVM arithmetic over the
  vector, no UDF) plus one window count over the 16-bit signature space —
  bounded at 65,536 distinct keys regardless of corpus size.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table

# ---------------------------------------------------------------------------
# q97: duplicated-span (8-gram) statistics per document
# ---------------------------------------------------------------------------

GRAM = 8  # span width in tokens; Lee et al. use 50 on real corpora

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min idle gap, in microseconds


@query(
    "q97_duplicated_span_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), g AS (
      SELECT doc_id, md5(array_to_string(w[i:i+{GRAM - 1}], ' ')) AS gh
      FROM t, UNNEST(range(1, len(w) - {GRAM - 2})) AS u(i)
      WHERE len(w) >= {GRAM}
    ), c AS (
      SELECT gh, COUNT(*) AS cnt FROM g GROUP BY gh
    ), p AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             CAST(SUM(CASE WHEN c.cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_grams
      FROM g JOIN c USING (gh) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_dup_grams, 0) AS n_dup_grams,
           CASE WHEN COALESCE(p.n_grams, 0) > 0
                THEN CAST(p.n_dup_grams AS DOUBLE) / p.n_grams
                ELSE 0.0 END AS dup_gram_frac
    FROM documents d LEFT JOIN p USING (doc_id)
    """,
)
def q97_duplicated_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated 8-gram-span fraction — the distributed core
    of exact substring dedup (Lee et al., ACL 2022). A gram whose corpus
    occurrence count is >= 2 (across documents OR repeated within one)
    marks a duplicated span; documents with high ``dup_gram_frac`` are the
    drop/trim candidates.

    Scale: the explode emits one 32-byte md5 per token position (never the
    raw text); the global occurrence count is a window count over the gram
    hash — one pass over the gram stream, where the equivalent
    groupBy+self-join would re-evaluate the explode+md5 subtree on both
    sides — then the per-doc roll-up re-keys on doc_id (two exchanges
    total). Short docs (< 8 tokens) surface with zero grams via the left
    join rather than vanishing (the short-doc rule,
    tests/test_short_docs.py)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", " ").alias("w"))
    g = (
        t.filter(F.size("w") >= GRAM)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w") - (GRAM - 1))
            ).alias("i"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), GRAM))
            ).alias("gh"),
        )
    )
    # window count instead of a groupBy+self-join: ONE pass over the gram
    # stream (the join formulation re-evaluates the explode+md5 subtree on
    # both sides), same two exchanges (gh, then doc_id)
    cnt = F.count("*").over(Window.partitionBy("gh"))
    per_doc = (
        g.withColumn("cnt", cnt)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("cnt") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_grams"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0).cast("long")).alias("n_dup_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.col("n_dup_grams").cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_gram_frac"),
    )


# ---------------------------------------------------------------------------
# q98: gap-based sessionization
# ---------------------------------------------------------------------------


@query(
    "q98_sessionization",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts, value,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts, value,
             SUM(CASE WHEN gap_us IS NULL OR gap_us > {_SESSION_GAP_US}
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_idx
      FROM e
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE)
             AS session_value
    FROM s GROUP BY user_id, session_idx
    """,
)
def q98_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts at the first event of
    a user and whenever the idle gap exceeds 30 minutes; sessions roll up
    to (start, end, n_events, value sum). Gap math is integer microseconds
    (``unix_micros`` / ``epoch_us``) so both engines agree exactly on
    sub-second timestamps.

    Scale: ONE exchange on user_id serves both the window pass (lag +
    running sum) and the groupBy — Catalyst reuses the child partitioning
    because (user_id, session_idx) is a superset of the window partition
    key, so the session roll-up is shuffle-free. The streaming twin is
    ``F.session_window`` (see tests/test_streaming.py)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet reads ts as TIMESTAMP_NTZ; the session tz is pinned UTC
    # (session.py:40) so the cast is a pure reinterpretation, and the
    # micros difference is exact integer math in both engines
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = ts_us - F.lag(ts_us).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > _SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    s = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_idx"),
    )
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("session_value"),
    )


# ---------------------------------------------------------------------------
# q99: PII masking (sequential regex scrubs, map-only)
# ---------------------------------------------------------------------------

# Sequential single-pattern passes, NOT one alternation: leftmost-first vs
# leftmost-longest alternation semantics differ between regex engines
# (Java util.regex in Spark, RE2 in DuckDB); running the patterns one at a
# time makes the result engine-independent.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
_NUM_RE = "[0-9]+"


@query(
    "q99_pii_mask",
    oracle=f"""
    SELECT event_id, event_type,
           regexp_replace(
             regexp_replace(props, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_NUM_RE}', '<NUM>', 'g') AS masked_props,
           CAST(len(regexp_extract_all(props, '{_EMAIL_RE}')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(props, '{_NUM_RE}')) AS INT)
             AS n_numbers
    FROM events
    """,
)
def q99_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the event payload: scrub email addresses, then
    digit runs, and count what was masked (audit trail). Two sequential
    single-pattern passes keep Java-regex and RE2 semantics identical (an
    alternation would not — see the module constant note).

    Scale: map-only (zero shuffle); regexp_replace / regexp_extract_all are
    JVM codegen'd expressions, so the scrub rides the scan."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.regexp_replace(
            F.regexp_replace("props", _EMAIL_RE, "<EMAIL>"),
            _NUM_RE,
            "<NUM>",
        ).alias("masked_props"),
        F.size(F.regexp_extract_all("props", F.lit(_EMAIL_RE), 0))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("props", F.lit(_NUM_RE), 0))
        .cast("int")
        .alias("n_numbers"),
    )


# ---------------------------------------------------------------------------
# q99b: signed-random-projection LSH signature over embeddings
# ---------------------------------------------------------------------------

SRP_PLANES = 16
SRP_DIM = 64  # embeddings table vector width (TESTDATA.md)


def _srp_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 hyperplane component: parity of the first md5 hex
    digit of "srp:<plane>:<dim>". Pure function of constants — evaluated at
    plan-build time and folded into the expression as literals, so Spark
    and DuckDB run the identical arithmetic."""
    h = hashlib.md5(f"srp:{plane}:{dim}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


_SRP_SIGNS = [
    [_srp_sign(p, d) for d in range(SRP_DIM)] for p in range(SRP_PLANES)
]


def _srp_dot(plane: int, col: str, one_based: bool) -> str:
    """Unrolled signed dot product for one hyperplane; identical op order
    in both engines (the same determinism idiom as similarity._dot)."""
    off = 1 if one_based else 0
    return " + ".join(
        f"CAST({col}[{d + off}] AS DOUBLE) * {_SRP_SIGNS[plane][d]}.0"
        for d in range(SRP_DIM)
    )


def _srp_sig(col: str, one_based: bool) -> str:
    """16-bit signature: bit p set iff dot(embedding, plane_p) >= 0."""
    return " + ".join(
        f"(CASE WHEN ({_srp_dot(p, col, one_based)}) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(SRP_PLANES)
    )


@query(
    "q99b_srp_signature",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, label,
             CAST({_srp_sig("embedding", True)} AS INT) AS srp_sig
      FROM embeddings
    )
    SELECT vec_id, label, srp_sig,
           COUNT(*) OVER (PARTITION BY srp_sig) AS bucket_size
    FROM s
    """,
)
def q99b_srp_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed-random-projection LSH signature (Charikar, STOC 2002) over
    the embedding column: 16 deterministic md5-derived hyperplanes give a
    16-bit signature whose Hamming distance estimates angular distance —
    the embedding-space twin of the text SimHash (dedup.py q42). The
    bucket size is the candidate-set cost a signature-equality join would
    pay, i.e. the knob that makes embedding near-dup all-pairs-free.

    Scale: signature computation is map-side unrolled JVM arithmetic (no
    UDF, no shuffle); the bucket count shuffles on a key space bounded at
    2^16 regardless of corpus size — and in a real pipeline the signature
    column is written once at ingest and every downstream near-dup join
    reuses it."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        "vec_id",
        "label",
        F.expr(_srp_sig("embedding", False)).cast("int").alias("srp_sig"),
    )
    return s.withColumn(
        "bucket_size", F.count("*").over(Window.partitionBy("srp_sig"))
    )
