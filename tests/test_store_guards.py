"""Durability guards on the streaming stores (round-12 advisor findings):

1. The rollup ledger carries an on-disk content_key encoding version —
   a store written under a different (or unknown) encoding fails loudly
   instead of silently double-counting replayed partials.
2. compact() carries app-level manifest keys (n_total/last_batch/
   content_key_encoding) forward — an out-of-band compact must not reset
   a store's state plane.
3. The heavy-hitter reset guard records EMPTY in-window batches too, and
   treats a replayed batch 0 with no recorded fingerprint on a non-empty
   store as a suspected checkpoint reset.
4. Read-side natural-key migration: a pre-upgrade `addresses` table
   without `addr_key` still dedups idempotently via the derived key
   (schemas.KEY_DERIVATIONS), instead of AnalysisException or NULL-key
   re-admission.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from allora_indexer_spark.plans import warehouse
from allora_indexer_spark.plans.warehouse import _manifest_read
from allora_indexer_spark.streaming import stream

FEED_SCHEMA = "event_id LONG, ts TIMESTAMP, value DOUBLE"


def _mk_feed(spark, lo, hi):
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    return spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=i), float(i) / 4) for i in range(lo, hi)],
        FEED_SCHEMA,
    )


def _run_rollup(spark, feed, rollup, ckpt):
    q = stream.start_continuous_rollup(spark, feed, FEED_SCHEMA, rollup, ckpt)
    q.awaitTermination(120)


def test_rollup_ledger_stamped_with_encoding_version(spark, tmp_path):
    """A freshly-seeded ledger manifest carries the current encoding
    marker, and it survives appends (later batches) and a full compact."""
    feed = str(tmp_path / "feed")
    rollup = str(tmp_path / "rollup")
    ledger = rollup + "_keys"
    _mk_feed(spark, 0, 20).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))
    m = _manifest_read(ledger)
    assert m is not None
    assert m["content_key_encoding"] == stream.CONTENT_KEY_ENCODING

    # marker survives subsequent batches (manifest appends)...
    _mk_feed(spark, 20, 45).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))
    m2 = _manifest_read(ledger)
    assert m2["content_key_encoding"] == stream.CONTENT_KEY_ENCODING
    # ...and a full out-of-band compact (carry-forward in _compact_locked)
    warehouse.compact(spark, ledger, target_partitions=1)
    m3 = _manifest_read(ledger)
    assert m3["content_key_encoding"] == stream.CONTENT_KEY_ENCODING
    # and the rollup still works after all of that
    _mk_feed(spark, 45, 60).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))
    total = (
        stream.read_rollup(spark, rollup)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == 60


def test_rollup_rejects_mismatched_or_missing_encoding(spark, tmp_path):
    """A ledger stamped with a DIFFERENT encoding version (or none — a
    pre-marker store) must fail the batch loudly: replays against its
    rollup's partials would never match and double-count."""
    from allora_indexer_spark.plans.warehouse import (
        _new_version_id,
        _publish_manifest,
    )

    feed = str(tmp_path / "feed")
    rollup = str(tmp_path / "rollup")
    ledger = rollup + "_keys"
    _mk_feed(spark, 0, 10).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))

    # forge an OLD-encoding stamp into the ledger manifest
    m = _manifest_read(ledger)
    forged = dict(m)
    forged["version"] = _new_version_id()
    forged["content_key_encoding"] = 1
    _publish_manifest(ledger, forged, expect=m["version"])

    _mk_feed(spark, 10, 20).write.mode("append").parquet(feed)
    q = stream.start_continuous_rollup(
        spark, feed, FEED_SCHEMA, rollup, str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="content_key encoding"):
        q.awaitTermination(120)
        q.stop()
        raise RuntimeError(q.exception() or "stream succeeded unexpectedly")

    # the operator escape hatch re-adopts a store KNOWN to be current
    stream.stamp_ledger_encoding(ledger)
    assert (
        _manifest_read(ledger)["content_key_encoding"]
        == stream.CONTENT_KEY_ENCODING
    )
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt2"))
    total = (
        stream.read_rollup(spark, rollup)
        .agg(F.sum("n_events"))
        .collect()[0][0]
    )
    assert total == 20  # replay after re-stamp did not double-count


def test_rollup_rejects_pre_manifest_plain_ledger(spark, tmp_path):
    """A plain-dir ledger (pre-manifest upgrade) is unknowable — refuse."""
    feed = str(tmp_path / "feed")
    rollup = str(tmp_path / "rollup")
    ledger = rollup + "_keys"
    _mk_feed(spark, 0, 5).select("event_id").write.parquet(ledger)
    _mk_feed(spark, 0, 10).write.mode("append").parquet(feed)
    q = stream.start_continuous_rollup(
        spark, feed, FEED_SCHEMA, rollup, str(tmp_path / "ckpt")
    )
    with pytest.raises(Exception, match="pre-manifest plain ledger"):
        q.awaitTermination(120)
        raise RuntimeError(q.exception() or "stream succeeded unexpectedly")


def test_compact_carries_app_manifest_keys(spark, tmp_path):
    """An out-of-band compact() on the heavy-hitter store must not drop
    n_total/last_batch/batch_fps — losing them resets the count plane and
    replayed batches double-count."""
    store = str(tmp_path / "hh")
    support = 0.2
    b0 = spark.createDataFrame(
        [(1, "the the the cat")], "doc_id long, text string"
    )
    stream._merge_heavy_hitter_batch(spark, b0, 0, store, support)
    before = _manifest_read(store)
    assert before["n_total"] == 4 and before["last_batch"] == 0

    warehouse.compact(spark, store, target_partitions=1)
    after = _manifest_read(store)
    assert after["n_total"] == 4
    assert after["last_batch"] == 0
    assert after["batch_fps"] == before["batch_fps"]

    # replay of batch 0 after the compact is still a no-op
    stream._merge_heavy_hitter_batch(spark, b0, 0, store, support)
    assert _manifest_read(store)["n_total"] == 4


def test_heavy_hitter_records_empty_batches(spark, tmp_path):
    """An EMPTY in-window batch advances last_batch and records its
    fingerprint — a reset checkpoint replaying a NON-empty batch 0 over
    it must mismatch loudly instead of being silently skipped."""
    store = str(tmp_path / "hh")
    support = 0.2
    empty = spark.createDataFrame([], "doc_id long, text string")
    # original batch 0 is empty AND the store does not exist yet: the
    # store's first (empty) version is published with the fp recorded
    stream._merge_heavy_hitter_batch(spark, empty, 0, store, support)
    m = _manifest_read(store)
    assert m is not None and m["last_batch"] == 0 and m["n_total"] == 0
    assert m["batch_fps"]["0"] == 0

    data = spark.createDataFrame(
        [(1, "the the the cat")], "doc_id long, text string"
    )
    stream._merge_heavy_hitter_batch(spark, data, 1, store, support)
    m2 = _manifest_read(store)
    assert m2["n_total"] == 4 and m2["last_batch"] == 1

    # an empty batch on an EXISTING store also advances the watermark
    stream._merge_heavy_hitter_batch(spark, empty, 2, store, support)
    m3 = _manifest_read(store)
    assert m3["last_batch"] == 2 and m3["n_total"] == 4
    assert m3["batch_fps"]["2"] == 0

    # replay of the empty batch is a no-op (fp 0 == recorded 0)
    stream._merge_heavy_hitter_batch(spark, empty, 2, store, support)
    assert _manifest_read(store)["last_batch"] == 2

    # reset checkpoint: non-empty batch 0 over the recorded empty fp
    with pytest.raises(RuntimeError, match="DIFFERENT content"):
        stream._merge_heavy_hitter_batch(spark, data, 0, store, support)


def test_heavy_hitter_batch0_without_fp_is_suspect(spark, tmp_path):
    """A replayed batch 0 against a non-empty store with NO recorded
    fingerprint (pre-guard store, or lost record) fails suspect — it is
    indistinguishable from a checkpoint reset."""
    from allora_indexer_spark.plans.warehouse import (
        _new_version_id,
        _publish_manifest,
    )

    store = str(tmp_path / "hh")
    support = 0.2
    data = spark.createDataFrame(
        [(1, "the the the cat")], "doc_id long, text string"
    )
    stream._merge_heavy_hitter_batch(spark, data, 0, store, support)
    stream._merge_heavy_hitter_batch(spark, data, 1, store, support)
    # simulate a pre-guard store: strip the fingerprint records
    m = _manifest_read(store)
    stripped = dict(m)
    stripped["version"] = _new_version_id()
    stripped["batch_fps"] = {}
    _publish_manifest(store, stripped, expect=m["version"])

    with pytest.raises(RuntimeError, match="no recorded fingerprint"):
        stream._merge_heavy_hitter_batch(spark, data, 0, store, support)

    # a replayed LATER batch without an fp stays a silent no-op (only
    # batch 0 is the reset signature; ids 1..7 may simply predate fps)
    before = _manifest_read(store)["n_total"]
    stream._merge_heavy_hitter_batch(spark, data, 1, store, support)
    assert _manifest_read(store)["n_total"] == before


def test_legacy_addresses_without_addr_key_dedups_via_derivation(
    spark, tmp_path
):
    """Pre-upgrade addresses table (natural key was ['address'], no
    addr_key column): the idempotent writer must derive addr_key =
    coalesce(address, pub_key) on the probe side and anti-join correctly,
    not raise AnalysisException or re-admit every row."""
    root = str(tmp_path / "wh")
    legacy = spark.createDataFrame(
        [
            ("allo1aaa", None, 5),
            (None, "pubkey-b", 6),
        ],
        "address string, pub_key string, height long",
    )
    # legacy layout: plain parquet dir WITHOUT addr_key
    legacy.write.parquet(f"{root}/addresses")

    batch = spark.createDataFrame(
        [
            ("allo1aaa", None, 7),   # duplicate of legacy row 1
            (None, "pubkey-b", 8),   # duplicate of legacy row 2
            ("allo1ccc", None, 9),   # genuinely new
        ],
        "address string, pub_key string, height long",
    ).withColumn("addr_key", F.coalesce("address", "pub_key"))

    warehouse.write_insert_if_absent(spark, batch, root, "addresses")
    # mergeSchema: the mixed old/new plain dir would otherwise sample ONE
    # footer's schema nondeterministically — this read is test plumbing,
    # the probe path under test derives the key itself
    got = spark.read.option("mergeSchema", "true").parquet(
        f"{root}/addresses"
    )
    # the two legacy-duplicate rows were anti-joined away
    keys = sorted(
        r[0]
        for r in got.select(
            F.coalesce("addr_key", "address", "pub_key")
        ).collect()
    )
    assert keys == ["allo1aaa", "allo1ccc", "pubkey-b"]

    # replay of the same batch is still a no-op (post-migration mixed
    # old/new file set: old files read addr_key as NULL under the merged
    # schema — the coalesce-over-derivation heals that too)
    warehouse.write_insert_if_absent(spark, batch, root, "addresses")
    assert got.count() == 3


def test_fk_levels_empty_and_seed_is_atomic(spark, tmp_path):
    """Review fixes: an empty tables dict is a no-op (not max()-on-empty);
    the ledger seed is ONE atomic publish already carrying the encoding
    marker — no crash window between seed and stamp."""
    assert warehouse._fk_levels([]) == []
    warehouse.write_tables(spark, {}, str(tmp_path / "wh"))  # no-op

    feed = str(tmp_path / "feed")
    rollup = str(tmp_path / "rollup")
    _mk_feed(spark, 0, 5).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))
    m = _manifest_read(rollup + "_keys")
    # the FIRST manifest version in history already has the marker (the
    # three-step seed left version 1 marker-less)
    from allora_indexer_spark.plans.warehouse import list_versions, STORAGE

    versions = list_versions(rollup + "_keys")
    first = STORAGE.read_history(versions[-1][0])
    assert first["content_key_encoding"] == stream.CONTENT_KEY_ENCODING
    assert m["content_key_encoding"] == stream.CONTENT_KEY_ENCODING


def test_empty_markerless_ledger_is_auto_stamped(spark, tmp_path):
    """A marker-less manifest ledger with ZERO rows (a pre-marker seed or
    its crash remnant) never recorded a key under any encoding — the next
    batch adopts it by stamping instead of hard-failing."""
    from allora_indexer_spark.plans.warehouse import (
        _new_version_id,
        _publish_manifest,
    )

    feed = str(tmp_path / "feed")
    rollup = str(tmp_path / "rollup")
    ledger = rollup + "_keys"
    # simulate the r11 crash remnant: seed, then strip the marker
    stream._seed_ledger(
        spark.createDataFrame([], "event_id LONG"), ledger
    )
    m = _manifest_read(ledger)
    stripped = {k: v for k, v in m.items() if k != "content_key_encoding"}
    stripped["version"] = _new_version_id()
    _publish_manifest(ledger, stripped, expect=m["version"])
    assert _manifest_read(ledger).get("content_key_encoding") is None

    _mk_feed(spark, 0, 10).write.mode("append").parquet(feed)
    _run_rollup(spark, feed, rollup, str(tmp_path / "ckpt"))
    assert (
        _manifest_read(ledger)["content_key_encoding"]
        == stream.CONTENT_KEY_ENCODING
    )
    total = (
        stream.read_rollup(spark, rollup).agg(F.sum("n_events")).collect()[0][0]
    )
    assert total == 10


def test_heavy_hitter_one_batch_store_retry_is_benign(spark, tmp_path):
    """A pre-guard store whose ONLY batch is id 0 (last_batch == 0, no
    recorded fp): a same-checkpoint crash retry of batch 0 must stay the
    silent no-op it was — only multi-batch stores treat a fp-less batch-0
    replay as a reset (a retry only ever replays the LAST batch)."""
    from allora_indexer_spark.plans.warehouse import (
        _new_version_id,
        _publish_manifest,
    )

    store = str(tmp_path / "hh")
    data = spark.createDataFrame(
        [(1, "the the the cat")], "doc_id long, text string"
    )
    stream._merge_heavy_hitter_batch(spark, data, 0, store, 0.2)
    m = _manifest_read(store)
    stripped = dict(m)
    stripped["version"] = _new_version_id()
    stripped["batch_fps"] = {}
    _publish_manifest(store, stripped, expect=m["version"])

    stream._merge_heavy_hitter_batch(spark, data, 0, store, 0.2)  # no raise
    assert _manifest_read(store)["n_total"] == 4


def test_load_table_reads_manifest_layout_sources(spark, tmp_path):
    """tables.load_table must see a source that was adopted into the
    manifest layout (plain reads see only underscore entries) — the whole
    registry, not just the index builder, stays manifest-aware."""
    import shutil

    from allora_indexer_spark.tables import load_table

    sfd = str(tmp_path / "sf")
    import os

    os.makedirs(sfd)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    dst = f"{sfd}/embeddings.parquet"
    spark.read.parquet(src).write.parquet(dst)
    n_plain = load_table(spark, sfd, "embeddings").count()
    warehouse.compact(spark, dst, target_partitions=1)
    assert _manifest_read(dst) is not None
    assert load_table(spark, sfd, "embeddings").count() == n_plain
    more = spark.read.parquet(src).withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )
    warehouse.append_dir(more, dst)
    assert load_table(spark, sfd, "embeddings").count() == 2 * n_plain
    shutil.rmtree(sfd, ignore_errors=True)
