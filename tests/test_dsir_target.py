"""DSIR with a caller-supplied target sample (dsir_weights/dsir_select):

- EQUIVALENCE: with target = the same corpus filtered to the registered
  source family, the generic path reproduces q99zz's oracle-pinned rows
  exactly (same exact-decimal weights, same Gumbel ranks) — the
  registered instance anchors the generic one;
- TARGET FREEDOM: an arbitrary out-of-corpus target sample steers the
  selection — documents sharing the target's vocabulary out-rank
  documents that don't, and swapping the target swaps the ranking;
- determinism: weights are exact decimals, so two runs are bit-equal.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from allora_indexer_spark.operators.curation import (
    DSIR_TARGET_SOURCES,
    dsir_select,
    dsir_weights,
)
from allora_indexer_spark.registry import all_queries
from allora_indexer_spark.tables import load_table


def test_generic_path_reproduces_registered_q99zz(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
    generic = (
        dsir_select(docs, target)
        .toPandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    registered = (
        all_queries()["q99zz_dsir_importance_sampling"]
        .fn(spark, sf_dir)
        .toPandas()
        .sort_values("rk")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(generic, registered)


@pytest.fixture()
def vocab_corpus(spark):
    """A corpus of two vocabulary families and a target sample written in
    only one of them; the target sample is NOT part of the corpus."""
    alpha = " ".join(["alpha beta gamma delta epsilon"] * 40)
    omega = " ".join(["omega sigma tau upsilon phi"] * 40)
    # 200 tokens per doc: the per-token target/raw log-ratio gap is
    # ~ln 2, so the per-DOC weight gap (~140 nats) dwarfs the Gumbel
    # noise spread (|g| <= ~23 at 2^-32 tail quantiles) — selection is
    # then decided by the weights, which is what this test asserts;
    # with short docs the noise legitimately flips borderline ranks
    # (importance RESAMPLING, not hard ranking — observed before this
    # fixture was lengthened)
    rows = []
    for i in range(40):
        rows.append((i, alpha if i < 20 else omega))
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )
    target_alpha = spark.createDataFrame(
        pd.DataFrame(
            [(1000, alpha + " " + alpha), (1001, alpha)],
            columns=["doc_id", "text"],
        ),
        schema="doc_id long, text string",
    )
    target_omega = spark.createDataFrame(
        pd.DataFrame([(2000, omega)], columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )
    return docs, target_alpha, target_omega


def test_arbitrary_target_steers_selection(spark, vocab_corpus):
    docs, target_alpha, target_omega = vocab_corpus
    # non-default bucket count doubles as the knob's own test
    top_a = dsir_select(docs, target_alpha, top_k=20,
                        buckets=4096).toPandas()
    top_o = dsir_select(docs, target_omega, top_k=20,
                        buckets=4096).toPandas()
    # alpha-target selects exactly the alpha-vocabulary half, and
    # omega-target the omega half
    assert set(top_a["doc_id"]) == set(range(20))
    assert set(top_o["doc_id"]) == set(range(20, 40))
    # weights separate strictly, not just the top-k cut
    w = dsir_weights(docs, target_alpha, buckets=4096).toPandas()
    w["s"] = w["s9"].astype(float)
    assert w[w.doc_id < 20]["s"].min() > w[w.doc_id >= 20]["s"].max()


def test_weights_deterministic_across_runs(spark, vocab_corpus):
    docs, target_alpha, _ = vocab_corpus
    a = (
        dsir_weights(docs, target_alpha)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_weights(docs.repartition(7), target_alpha)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
