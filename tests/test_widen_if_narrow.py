"""Pins for tables.widen_if_narrow (round 16) — the data-derived
narrow-scan widen applied at CPU-dense batch roots.

The contract under test: a frame with FEWER partitions than the session
default parallelism is repartitioned up to exactly that parallelism
(hash on the given key, round-robin keyless); a frame that already has
at least that many partitions is returned UNTOUCHED (the same object,
so no production multi-split scan ever pays an exchange); and the
widen never changes row content.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from allora_indexer_spark.tables import load_table, widen_if_narrow


def test_narrow_frame_is_widened_to_default_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = spark.sparkContext.defaultParallelism
    assert docs.rdd.getNumPartitions() < target, (
        "fixture precondition: the test corpus must arrive narrow"
    )
    wide = widen_if_narrow(docs, "doc_id")
    assert wide.rdd.getNumPartitions() == target


def test_already_wide_frame_is_returned_unchanged(spark, sf_dir):
    target = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").repartition(target + 3)
    out = widen_if_narrow(docs, "doc_id")
    # identity, not just equal partitioning: the production no-op path
    # must add NOTHING to the plan
    assert out is docs


def test_widen_preserves_rows_keyed_and_keyless(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expect = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    for key in ("doc_id", None):
        wide = widen_if_narrow(docs, key) if key else widen_if_narrow(docs)
        got = sorted(r["doc_id"] for r in wide.select("doc_id").collect())
        assert got == expect


def test_keyed_widen_is_hash_partitioning_on_key(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wide = widen_if_narrow(docs, "doc_id")
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(doc_id" in plan
    # the widen must not silently drop or rename columns
    assert wide.columns == docs.columns


def test_widen_is_stable_under_repeated_application(spark, sf_dir):
    # widen(widen(df)) == widen(df): the second call sees a frame at
    # target parallelism and must be the identity
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    once = widen_if_narrow(docs, "doc_id")
    twice = widen_if_narrow(once, "doc_id")
    assert twice is once


def test_streaming_shared_helpers_do_not_widen(spark, sf_dir):
    # the widen lives in BATCH wrappers only: the helpers the streaming
    # stores ride (banded_signatures via _shingle_frame, _dhash_cols)
    # must not add a repartition to per-trigger micro-batches
    from allora_indexer_spark.operators.dedup import banded_signatures
    from allora_indexer_spark.operators.multimodal import _dhash_cols

    docs = load_table(spark, sf_dir, "documents")
    for frame in (banded_signatures(docs), _dhash_cols(docs)):
        plan = frame._jdf.queryExecution().optimizedPlan().toString()
        assert "Repartition" not in plan, (
            "streaming-shared helper gained a widen exchange"
        )


def test_widen_noop_when_parallelism_low(spark, sf_dir):
    # simulate a "production-like" regime where the scan's split count
    # already covers the parallelism: a coalesce(1)'d 1-partition frame
    # against defaultParallelism==local[4]'s 4 still widens, but a
    # 4-partition frame does not — the condition is >=, not >
    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    exact = docs.repartition(target)
    assert widen_if_narrow(exact, "doc_id") is exact
