"""Mergeable-summary (sketch) operators.

Operators whose 100 TB shape is "bounded partial summary per partition →
tiny merge", the family Postgres-era pipelines approximate with sampling
and the reference sidesteps by being single-node (its whole-table scans in
/root/reference/db.go are the degenerate one-partition case).

q99l: provably-exact corpus heavy hitters (frequent tokens) via a
Misra-Gries-style candidate prune + exact recount — the two-pass idiom
every at-scale top-k/frequent-items job uses (Misra & Gries 1982;
"space-saving" in Metwally et al. 2005). Unlike approx sketches the final
answer here is EXACT, so the DuckDB oracle applies in full.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from allora_indexer_spark.registry import query
from allora_indexer_spark.tables import load_table

# A token is "frequent" iff its corpus count >= ceil(SUPPORT * N_tokens).
_HH_SUPPORT = 0.005
# Per-batch candidate retention bound: keep tokens with batch count
# >= _HH_PRUNE * batch_tokens. Soundness: a token pruned in EVERY batch
# has global count < sum_b(_HH_PRUNE * N_b) = (SUPPORT/2) * N, strictly
# below the ceil(SUPPORT * N) gate, so no frequent token can be lost —
# regardless of how rows are batched or partitioned. (This is the
# Misra-Gries undercount argument with the counter budget expressed as a
# frequency fraction instead of a slot count.)
_HH_PRUNE = _HH_SUPPORT / 2


def _candidate_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-Arrow-batch candidate pass: exact value_counts (vectorized),
    keep tokens above the batch-local prune bound. Emits a bounded set
    (<= 1/_HH_PRUNE tokens per batch) so the map output is tiny no matter
    how large the batch's text is."""
    for pdf in batches:
        toks = pdf["text"].str.split(" ").explode()
        # dropna BEFORE counting: a null text explodes to NaN, which
        # passes the != "" mask and inflates the prune DENOMINATOR while
        # value_counts drops it from the numerator — the threshold then
        # exceeds the documented _HH_PRUNE·N bound and a boundary-count
        # token could be pruned in every batch (soundness break)
        toks = toks.dropna()
        toks = toks[toks != ""]
        if len(toks) == 0:
            continue
        vc = toks.value_counts()
        keep = vc[vc >= _HH_PRUNE * len(toks)]
        yield pd.DataFrame({"token": keep.index})


@query(
    "q99l_frequent_tokens",
    oracle=f"""
    WITH t AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), tok AS (
      SELECT token FROM t WHERE token <> ''
    ), tot AS (
      SELECT COUNT(*) AS total FROM tok
    ), c AS (
      SELECT token, COUNT(*) AS n_occurrences FROM tok GROUP BY token
    )
    SELECT c.token, c.n_occurrences,
           CAST(c.n_occurrences AS DOUBLE) / tot.total AS share
    FROM c, tot
    WHERE c.n_occurrences >=
          GREATEST(1, CAST(CEIL({_HH_SUPPORT} * tot.total) AS BIGINT))
    """,
)
def q99l_frequent_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: every token whose count is >= 0.5% of
    all tokens, with its exact count and share. Two passes:

    1. candidate pass — ``mapInPandas`` over the raw documents runs a
       vectorized per-batch count and keeps only tokens above half the
       support bound. Soundness per the Misra-Gries argument (module
       docstring): the candidate set provably contains every frequent
       token, and its size is bounded by 2/support per batch — nothing
       here shuffles the full token stream;
    2. recount pass — explode tokens JVM-side, semi-join against the
       distinct candidate set, exact hash aggregate, gate on the exact
       global threshold.

    Scale: the naive one-pass plan shuffles one row per DISTINCT token
    (fine) but its map-side combine still materializes the full vocab
    hash table per task; the candidate prune bounds each BATCH's
    emission to <= 2/support (~400) tokens while keeping the answer
    exact — the standard shape for "frequent items over 100 TB of
    text". The distinct UNION across batches is workload-dependent
    (recurring-above-threshold-per-batch tokens accumulate), so the
    semi-join is left to AQE rather than force-broadcast: it measures
    the candidate set at runtime and broadcasts only when it actually
    is small — a forced broadcast of an adversarially large union would
    OOM executors. The corpus total is a one-row count(*) aggregate
    (map-side, no shuffle) cross-joined as a broadcast literal."""
    docs = load_table(spark, sf_dir, "documents")
    cand = (
        docs.select("text")
        .mapInPandas(_candidate_tokens, "token string")
        .distinct()
    )
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    total = toks.agg(F.count("*").alias("total"))
    counts = (
        toks.join(cand, "token", "semi")
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    gate = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil(F.lit(_HH_SUPPORT) * F.col("total")),
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") >= gate)
        .select(
            "token",
            "n_occurrences",
            (F.col("n_occurrences").cast("double") / F.col("total")).alias(
                "share"
            ),
        )
    )
