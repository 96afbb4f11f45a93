"""Topic-id continuity across micro-batches (streaming S6 numbering).

topics() assigns creation-order ids; the streaming path processes the
block feed in micro-batches, so without an offset every batch restarts
at id 1 — and because the warehouse keys topics on ``id``, a later
batch's create COLLIDES with an already-written id and is silently
dropped by the idempotent anti-join (permanent data loss). These tests
pin the fix: passing ``existing_topics`` continues the numbering, and a
REPLAYED batch recomputes the identical ids (earlier-height offset rule)
so the writer dedups it exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from allora_indexer_spark.plans import ingest, warehouse
from allora_indexer_spark.sources.fixtures import write_fixtures


@pytest.fixture(scope="module")
def split_blocks(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("topic_id_fixtures")
    blocks_dir, _ = write_fixtures(str(d))
    blocks = ingest.read_blocks(spark, blocks_dir)
    early = blocks.filter(F.col("height") <= 102)
    late = blocks.filter(F.col("height") > 102)
    return early, late


def _write_topics(spark, blocks, root, existing):
    t = ingest.topics(ingest.messages(blocks), existing_topics=existing)
    warehouse.write_insert_if_absent(spark, t, root, "topics")


def test_topic_ids_continue_across_micro_batches(
    spark, split_blocks, tmp_path
):
    early, late = split_blocks
    root = str(tmp_path)
    _write_topics(spark, early, root, existing=None)
    first = {
        r["id"]: r["creator"]
        for r in warehouse.read_table(spark, root, "topics").collect()
    }
    assert first == {1: "alice"}
    existing = warehouse.read_table(spark, root, "topics")
    _write_topics(spark, late, root, existing=existing)
    both = {
        r["id"]: r["creator"]
        for r in warehouse.read_table(spark, root, "topics").collect()
    }
    assert both == {1: "alice", 2: "gail"}  # continued, not restarted


def test_topic_ids_without_offset_would_collide(spark, split_blocks):
    # documents the failure mode the fix exists for: batch-local
    # numbering restarts at 1 for the later batch
    _, late = split_blocks
    ids = [
        r["id"]
        for r in ingest.topics(ingest.messages(late)).collect()
    ]
    assert ids == [1]


def test_table_exists_distinguishes_absent_from_read_failure(
    spark, split_blocks, tmp_path
):
    """The streaming batch probes table EXISTENCE explicitly before
    reading the topics table (streaming/stream.py). The old
    ``except Exception: existing = None`` conflated "not created yet"
    with "read FAILED" — a transient manifest error silently fell back
    to batch-local numbering whose colliding ids the idempotent
    anti-join then dropped (data loss). Pin the distinction: absent is
    a clean False; a corrupt manifest raises, so the batch fails and
    the checkpoint retries it instead of mis-numbering."""
    early, _ = split_blocks
    root = str(tmp_path)
    assert warehouse.table_exists(root, "topics") is False  # absent
    _write_topics(spark, early, root, existing=None)
    assert warehouse.table_exists(root, "topics") is True
    cur = os.path.join(root, "topics", "_CURRENT")
    with open(cur, "w") as fh:
        fh.write("{corrupt, not json")
    with pytest.raises(Exception):
        # the probe itself (or the read behind it) must be LOUD here
        if warehouse.table_exists(root, "topics"):
            warehouse.read_table(spark, root, "topics")


def test_topic_id_replay_is_idempotent(spark, split_blocks, tmp_path):
    early, late = split_blocks
    root = str(tmp_path)
    _write_topics(spark, early, root, existing=None)
    for _ in range(2):  # deliver + redeliver the same later batch
        existing = warehouse.read_table(spark, root, "topics")
        _write_topics(spark, late, root, existing=existing)
    rows = warehouse.read_table(spark, root, "topics").collect()
    assert sorted(r["id"] for r in rows) == [1, 2]
    # the replay recomputed id 2 for gail (its own height span excluded
    # from the offset), so the anti-join dropped it as a duplicate
    assert {r["id"]: r["creator"] for r in rows}[2] == "gail"
