"""Structured Streaming wrapper of the batch ingest plan (SURVEY.md §2.6).

The reference's main loop (generateBlocksLoop, /root/reference/main.go:221-253)
polls the chain head every 5 s, feeds heights to workers, and resumes from
``SELECT MAX(height)``. The Spark twin:

- source: file stream over the block / block_results feed directories
  (a real deployment swaps in a Kafka/rate source — same plan);
- trigger: ``processingTime='5 seconds'`` live (T1) or ``availableNow`` for
  run-to-caught-up backfill (T6, the EXIT_APP mode);
- checkpointLocation replaces the MAX(height) probe (T2) — offsets survive
  restarts;
- sink: foreachBatch → the same build_tables() + idempotent writers as
  batch, so at-least-once delivery composes with keyed dedup into
  effectively-once (T3), and parents are written before children inside each
  micro-batch, removing the reference's waitCreation retry loop (T4/A4);
- keep-latest state (last_commit_values, K5/T5) is maintained by the
  writers' keyed upsert at every batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from allora_indexer_spark import schemas
from allora_indexer_spark.plans import ingest, warehouse


def read_block_stream(
    spark: SparkSession, blocks_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``max_files_per_trigger`` is the ingest rate-limit knob — the
    declarative analog of the reference's WORKERS_NUM/semaphore throttles
    (T7, main.go:174-182): it bounds work-per-micro-batch so catch-up
    backfills cannot overwhelm downstream sinks."""
    reader = spark.readStream.schema(schemas.RAW_BLOCK_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return ingest.with_block_height(reader.json(blocks_dir))


def read_block_results_stream(
    spark: SparkSession,
    results_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schemas.RAW_BLOCK_RESULTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return ingest.with_result_height(reader.json(results_dir))


# the two sinks' table fan-outs, module-level so schema precreation and
# the per-batch processors can never disagree about the set
BLOCK_SINK_TABLES = [
    "block_info", "messages", "topics", "addresses",
    "worker_registrations", "transfers", "inferences", "forecasts",
    "forecast_values", "reputer_payload", "reputer_bundles",
    "bundle_values",
]
EVENT_SINK_TABLES = [
    "events", "scores", "rewards", "networklosses",
    "networkloss_bundle_values", "ema_scores", "last_commit_values",
    "topic_rewards", "topic_forecasting_scores", "tokenomics",
    "ecosystem_token_mint", "reward_current_block_emission",
]


def _precreate_tables(
    spark: SparkSession,
    warehouse_root: str,
    names: list[str],
    build_empty,
) -> None:
    """Create every MISSING sink table's empty schema (data dir +
    manifest) before the stream starts — the analog of the reference
    running its DDL migrations at process startup (db.go), never inside
    the poll loop. Without this, micro-batch 1 pays the full 12-table
    plan-construction + write fan-out (the one >5 s outlier by
    construction in every prior round's BENCH); with it, batch 1 is an
    ordinary presence-pruned batch. Runs through the same idempotent
    writer path as the stream (empty frame, same schemas/manifests), so
    a crash between precreation and the first commit changes nothing:
    replays see the tables existing, exactly as they would mid-stream."""
    missing = [
        n for n in names if not warehouse.table_exists(warehouse_root, n)
    ]
    if not missing:
        return
    built = build_empty(set(missing))
    warehouse.write_tables(
        spark,
        {k: built[k] for k in missing if k in built},
        warehouse_root,
    )


def precreate_block_tables(spark: SparkSession, warehouse_root: str) -> None:
    def build_empty(only: set[str]) -> dict[str, DataFrame]:
        empty = ingest.with_block_height(
            spark.createDataFrame([], schema=schemas.RAW_BLOCK_SCHEMA)
        )
        return ingest.build_tables_for_blocks(empty, only=only)

    _precreate_tables(spark, warehouse_root, BLOCK_SINK_TABLES, build_empty)


def precreate_event_tables(spark: SparkSession, warehouse_root: str) -> None:
    def build_empty(only: set[str]) -> dict[str, DataFrame]:
        empty = ingest.with_result_height(
            spark.createDataFrame(
                [], schema=schemas.RAW_BLOCK_RESULTS_SCHEMA
            )
        )
        return ingest.build_tables_for_events(empty, only=only)

    _precreate_tables(spark, warehouse_root, EVENT_SINK_TABLES, build_empty)


def start_block_ingest(
    spark: SparkSession,
    blocks_dir: str,
    warehouse_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    poll_interval: str = "5 seconds",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream the block feed into the tx-derived tables. Missing sink
    schemas are created BEFORE the stream starts (see
    :func:`_precreate_tables`), so no micro-batch ever pays the
    all-schema creation fan-out inside its timed trigger."""
    precreate_block_tables(spark, warehouse_root)
    stream = read_block_stream(spark, blocks_dir, max_files_per_trigger)

    block_tables = BLOCK_SINK_TABLES

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # one decode per micro-batch: the exploded-message root feeds 12
        # tables, so pin it instead of re-parsing the batch per table
        msgs = ingest.messages(batch_df).persist()
        try:
            # topic ids must CONTINUE across micro-batches (they key the
            # idempotent writer): pass the current topics table so
            # numbering offsets past earlier-height creates — without
            # this every batch restarts at id 1 and later creates are
            # silently dropped by the anti-join. Replays recompute
            # identical ids (see ingest.topics).
            # Probe existence EXPLICITLY instead of catching Exception
            # around the read: a bare except here also swallowed
            # transient read failures (manifest I/O hiccup, corrupt
            # JSON), silently falling back to batch-local numbering
            # whose ids collide with written rows — the anti-join then
            # drops the new creates (data loss). With the probe, a real
            # read failure fails the batch (INSIDE this try, so the
            # persisted msgs cache entry is released) and the checkpoint
            # retries it.
            # presence pruning: ONE bounded probe on the persisted msgs
            # root (distinct @type vocabulary) says which tables this
            # batch can touch — a caught-up 1-block batch then BUILDS
            # and writes 3-5 tables instead of 12. Both halves matter
            # for the 5 s cadence: the skipped write jobs (~0.3 s fixed
            # local floor each) AND the skipped plan construction
            # (~2-3 s of py4j work for the full fan-out). A table is
            # still built+written while it does not exist yet, so the
            # first batch creates every schema exactly as before.
            present = ingest.present_block_tables(msgs)
            wanted = {
                k
                for k in block_tables
                if k in present
                or not warehouse.table_exists(warehouse_root, k)
            }
            existing = None
            if "topics" in wanted and warehouse.table_exists(
                warehouse_root, "topics"
            ):
                existing = warehouse.read_table(
                    spark, warehouse_root, "topics"
                )
            tables = ingest.build_tables_for_blocks(
                batch_df, msgs=msgs, existing_topics=existing, only=wanted
            )
            # one block-height span job stands in for every height-
            # derived table's probe aggregation (~3 jobs each); skipped
            # entirely when no span-covered table is being written
            spanned = wanted & ingest.BLOCK_HEIGHT_SPAN_TABLES
            span = (
                ingest.batch_height_span(batch_df) if spanned else None
            )
            warehouse.write_tables(
                spark,
                {k: tables[k] for k in block_tables if k in tables},
                warehouse_root,
                key_spans=(
                    {k: span for k in spanned} if span is not None else None
                ),
            )
        finally:
            msgs.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=poll_interval)
    return writer.start()


def start_event_ingest(
    spark: SparkSession,
    results_dir: str,
    warehouse_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    poll_interval: str = "5 seconds",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream the block_results feed into the event-derived tables.
    Missing sink schemas are created BEFORE the stream starts (see
    :func:`_precreate_tables`)."""
    precreate_event_tables(spark, warehouse_root)
    stream = read_block_results_stream(
        spark, results_dir, max_files_per_trigger
    )

    event_tables = EVENT_SINK_TABLES

    def process(batch_df: DataFrame, batch_id: int) -> None:
        fev = ingest.flat_events(batch_df).persist()
        try:
            # same presence pruning as the block sink: one bounded
            # distinct-family probe on the persisted fev root replaces
            # 12 mostly-empty plan constructions + write jobs per batch
            present = ingest.present_event_tables(fev)
            wanted = {
                k
                for k in event_tables
                if k in present
                or not warehouse.table_exists(warehouse_root, k)
            }
            tables = ingest.build_tables_for_events(
                batch_df, fev=fev, only=wanted
            )
            spanned = wanted & ingest.BLOCK_HEIGHT_SPAN_TABLES
            span = (
                ingest.batch_height_span(batch_df) if spanned else None
            )
            warehouse.write_tables(
                spark,
                {k: tables[k] for k in event_tables if k in tables},
                warehouse_root,
                key_spans=(
                    {k: span for k in spanned} if span is not None else None
                ),
            )
        finally:
            fev.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=poll_interval)
    return writer.start()


def start_block_window_stats(
    spark: SparkSession,
    blocks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "2 minutes",
    watermark: str = "1 minute",
) -> StreamingQuery:
    """Watermarked tumbling-window aggregation over block event time (T4:
    bounded out-of-orderness — the declarative replacement for the
    reference's waitCreation retry window). Append mode emits a window only
    once the watermark passes its end, so late blocks within the bound are
    incorporated and blocks later than the bound are dropped; the checkpoint
    carries the watermark across restarts."""
    stream = read_block_stream(spark, blocks_dir)
    agg = (
        stream.withWatermark("block_time", watermark)
        .groupBy(F.window("block_time", window).alias("w"))
        .agg(
            F.count("*").alias("n_blocks"),
            F.min("height").alias("min_height"),
            F.max("height").alias("max_height"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_blocks",
            "min_height",
            "max_height",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


LAST_COMMIT_STATE_OUTPUT = (
    "topic_id INT, is_worker BOOLEAN, height_tx INT, height INT"
)
_LAST_COMMIT_STATE = "height_tx INT, height INT"


def start_last_commit_state_stream(
    spark: SparkSession,
    results_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Keep-latest actor commit per (topic_id, is_worker) as a genuinely
    stateful streaming operator (T5) — the streaming-native form of the
    reference's ON CONFLICT DO UPDATE latest-state table
    (insertActorLastCommit, /root/reference/db.go:1118-1185).

    applyInPandasWithState holds one tiny (height_tx, height) record per
    key in the state store; each micro-batch folds its arrivals into the
    state with max-by-(height_tx, height) and emits the key's current
    latest. Out-of-order replays (an older commit arriving after a newer
    one) are absorbed by the state compare — exactly what ON CONFLICT ... DO
    UPDATE WHERE excluded.height > t.height does row-by-row in Postgres,
    but with O(#keys) state instead of a table round-trip per event. State
    is keyed by (topic, role) so it stays bounded by the topic count, not
    the event count — safe at any scale."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = read_block_results_stream(spark, results_dir)
    fev = ingest.flat_events(stream)
    commits = fev.filter(F.col("family") == "actor_last_commit").select(
        ingest._attr_int("topic_id").alias("topic_id"),
        (~ingest.is_reputer_last_commit(F.col("type"))).alias("is_worker"),
        ingest._attr_int("block_height").alias("height_tx"),
        F.from_json(F.col("attr.nonce"), "STRUCT<block_height: STRING>")
        .getField("block_height").cast("int").alias("height"),
    ).filter(
        # malformed commits (unparseable nonce/heights) are quarantined
        # here like every other corrupt-feed row — a null reaching the
        # fold below would crash the batch and wedge the stream on replay
        F.col("topic_id").isNotNull()
        & F.col("height_tx").isNotNull()
        & F.col("height").isNotNull()
    )

    def keep_latest(key, pdf_iter, state: GroupState):
        best = state.get if state.exists else None  # (height_tx, height)
        for pdf in pdf_iter:
            for ht, h in zip(pdf["height_tx"], pdf["height"]):
                if pd.isna(ht) or pd.isna(h):
                    continue  # defense in depth behind the filter above
                cand = (int(ht), int(h))
                if best is None or cand > best:
                    best = cand
        if best is None:
            return
        state.update(best)
        yield pd.DataFrame(
            {
                "topic_id": [key[0]],
                "is_worker": [key[1]],
                "height_tx": [best[0]],
                "height": [best[1]],
            }
        )

    latest = commits.groupBy("topic_id", "is_worker").applyInPandasWithState(
        keep_latest,
        outputStructType=LAST_COMMIT_STATE_OUTPUT,
        stateStructType=_LAST_COMMIT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        latest.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_dedup_block_stream(
    spark: SparkSession,
    blocks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Streaming-native K1: per-height block dedup with
    dropDuplicatesWithinWatermark instead of a sink-side anti-join. The
    state store keeps one entry per height seen within the watermark
    horizon, so replays of recent blocks (the at-least-once case the
    reference absorbs via unique-violation 23505, db.go:620-628) are
    dropped in-flight, and state is evicted once the watermark passes —
    bounded memory under unbounded input, which a plain dropDuplicates
    stream cannot guarantee."""
    stream = read_block_stream(spark, blocks_dir)
    deduped = (
        stream.withWatermark("block_time", watermark)
        .dropDuplicatesWithinWatermark(["height"])
        .select(
            "height",
            "block_time",
            F.col("header.chain_id").alias("chain_id"),
            F.col("header.proposer_address").alias("proposer_address"),
        )
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_enriched_event_stream(
    spark: SparkSession,
    blocks_dir: str,
    results_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """Stream-stream inner join: the block-results event feed enriched with
    the block header's event time. The reference consumes its two sources
    (S2 block fetch, S4 block_results fetch) in one worker loop and relies
    on Postgres FKs to correlate them later; in Spark the correlation is a
    first-class watermarked stream-stream join on height — each side
    buffers at most the watermark horizon of state, and a result row is
    emitted as soon as both sides of a height have arrived.

    The joined rows carry (height, block_time, n_finalize_events) — the
    per-height event-count enrichment a monitoring pipeline tails.

    State eviction: block_results has no native event time, so BOTH sides
    derive a synthetic one from the height itself (heights are strictly
    monotone with chain time), watermark it, and include it in the join as
    an equality on the watermarked column. That gives Spark the state-
    cleanup bound it needs for a stream-stream inner join — each side
    buffers only heights within the watermark horizon; without a
    watermark + event-time constraint on both inputs the join state would
    grow forever."""
    h_ts = F.timestamp_seconds(F.col("height"))
    blocks = (
        read_block_stream(spark, blocks_dir)
        .select(
            "height",
            "block_time",
            F.col("header.chain_id").alias("chain_id"),
            h_ts.alias("b_hts"),
        )
        .withWatermark("b_hts", watermark)
    )
    results = (
        read_block_results_stream(spark, results_dir)
        .select(
            F.col("height").alias("r_height"),
            F.size(F.col("result.finalize_block_events")).alias(
                "n_finalize_events"
            ),
            F.size(F.col("result.txs_results")).alias("n_txs"),
            F.timestamp_seconds(F.col("height")).alias("r_hts"),
        )
        .withWatermark("r_hts", watermark)
    )

    joined = blocks.join(
        results,
        (blocks.height == results.r_height) & (blocks.b_hts == results.r_hts),
        "inner",
    ).select("height", "block_time", "chain_id", "n_finalize_events", "n_txs")

    return (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_session_window_stream(
    spark: SparkSession,
    blocks_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "90 seconds",
    watermark: str = "1 minute",
) -> StreamingQuery:
    """Session windows over block arrivals: consecutive blocks closer than
    ``gap`` merge into one session row (burst detection — the chain's
    block cadence is steady, so a session break marks an outage/halt).
    No reference analog; session semantics come free from Spark
    (SURVEY.md §2.7). Sessions finalize when the watermark passes the
    session end + gap; merging across micro-batches is handled by the
    session-window state store."""
    stream = read_block_stream(spark, blocks_dir)
    agg = (
        stream.withWatermark("block_time", watermark)
        # streaming session windows must be keyed (global session agg is
        # unsupported) — the chain id is the natural partition key and
        # spreads state across one entry per (chain, open session)
        .groupBy(
            F.col("header.chain_id").alias("chain_id"),
            F.session_window("block_time", gap).alias("s"),
        )
        .agg(
            F.count("*").alias("n_blocks"),
            F.min("height").alias("first_height"),
            F.max("height").alias("last_height"),
        )
        .select(
            "chain_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_blocks",
            "first_height",
            "last_height",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _content_key_agg(key_col: str):
    """Order-independent 64-bit fingerprint of a group's exact key SET —
    the aggregate behind the rollup's (window, content) replay dedup.
    Keys are hashed ELEMENT-WISE before joining (sorted array of per-key
    xxhash64 longs, then one hash): joining raw string keys with a
    delimiter made DISTINCT sets collide when a key contained the
    delimiter ({'a,b'} vs {'a','b'}), silently dropping a genuinely-new
    partial as 'already applied' (pinned in tests/test_streaming.py)."""
    return F.xxhash64(
        F.concat_ws(",", F.sort_array(F.collect_list(F.xxhash64(key_col))))
    )


# On-disk format version of the rollup's content_key column. v1 was the
# delimiter-joined raw-key encoding; v2 is the element-wise xxhash64 above.
# The marker rides in the LEDGER's manifest (the pair's durable anchor —
# the ledger is a manifest table from its first row) and flips atomically
# with it; every micro-batch checks it BEFORE touching the rollup, because
# a replay that recomputes content keys under a different encoding than
# the persisted partials were written with never matches them and silently
# re-appends already-applied partials (double counting). Mirrors the
# heavy-hitter store's fingerprint RuntimeError: unmergeable-state
# mismatches fail loudly with the recovery path spelled out.
CONTENT_KEY_ENCODING = 2


def _check_ledger_encoding(ledger_manifest: dict, ledger_dir: str) -> None:
    enc = ledger_manifest.get("content_key_encoding")
    if enc != CONTENT_KEY_ENCODING:
        raise RuntimeError(
            f"{ledger_dir}: rollup ledger carries content_key encoding "
            f"{enc!r}, engine expects {CONTENT_KEY_ENCODING}. The rollup's "
            "persisted partials were fingerprinted under a different "
            "content_key encoding — replayed batches would never match "
            "them and re-append already-applied partials (silent double "
            "counting). Rebuild the rollup + ledger + checkpoint together "
            "from the feed, or, if this store is KNOWN to be written by "
            "the current encoding (it merely predates the marker), stamp "
            "it with stamp_ledger_encoding()."
        )


def _seed_ledger(empty_df: DataFrame, ledger_dir: str) -> None:
    """Create a brand-new ledger as ONE atomic manifest publish that
    already carries the encoding marker — seed data, pinned schema, and
    CONTENT_KEY_ENCODING flip together. (The first cut seeded in three
    steps — empty write, compact, stamp — and a crash between the last
    two left a marker-less manifest that hard-failed every retry; the
    shared warehouse.seed_manifest_store is that lesson made mechanism,
    and the near-dup sig/pairs stores seed through the same one.)"""
    from allora_indexer_spark.plans.warehouse import seed_manifest_store

    seed_manifest_store(
        empty_df,
        ledger_dir,
        extra={"content_key_encoding": CONTENT_KEY_ENCODING},
    )


def stamp_ledger_encoding(ledger_dir: str) -> None:
    """Operator escape hatch: stamp the CURRENT content_key encoding into
    an existing ledger manifest (a store that predates the marker but is
    known to be written by the current encoding). New ledgers are stamped
    atomically at seed time; this is only for adopting pre-marker stores."""
    from allora_indexer_spark.plans.warehouse import (
        _manifest_read,
        _new_version_id,
        _publish_manifest,
        _retry_cas,
        _table_lock,
    )

    def once() -> None:
        m = _manifest_read(ledger_dir)
        if m is None:
            raise FileNotFoundError(
                f"{ledger_dir}: not a manifest table — pre-manifest plain "
                "ledgers cannot be adopted (their rollup's encoding is "
                "unknowable); rebuild rollup + ledger + checkpoint"
            )
        mm = dict(m)
        mm["version"] = _new_version_id()
        mm["content_key_encoding"] = CONTENT_KEY_ENCODING
        _publish_manifest(ledger_dir, mm, expect=m["version"])

    with _table_lock(ledger_dir):
        _retry_cas(once)


def start_continuous_rollup(
    spark: SparkSession,
    feed_dir: str,
    feed_schema: str,
    rollup_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "event_id",
    window: str = "10 minutes",
) -> StreamingQuery:
    """Continuously-maintained time-bucket rollup — the hypertable
    continuous-aggregate analog, built from parts the engine already has.

    Design: each micro-batch first reduces to NOVEL rows (anti-join on the
    natural key against a key ledger — in the full pipeline the events
    fact table plays this role, so the ledger costs nothing extra), then
    appends the novel rows' per-window PARTIAL aggregates (count + decimal
    sum, both re-aggregable). Because only never-seen keys reach the
    rollup, at-least-once redelivery composes to effectively-once (T3)
    without ever rewriting rollup history: a same-checkpoint retry of any
    batch is absorbed (identical novel set → identical content key →
    anti-joined away — the ledger is manifest-seeded so its append is an
    atomic version flip and the retry's novel set cannot shift under a
    partial write), and a fresh-checkpoint full replay is absorbed via
    the ledger. The one unguaranteed corner: crash between the two
    appends below AND abandoning the checkpoint — a fresh checkpoint may
    re-batch the feed differently, producing a different novel set whose
    content key no longer matches the orphaned partial; resume the SAME
    checkpoint after a crash (which Spark does by default) and the retry
    converges. ``read_rollup`` merges partials at read time; ``compact``
    (warehouse.py) folds old partials into one row per window out-of-band.

    Scale: the ledger anti-join is a shuffle join pruned to the batch's
    key range (with the ledger written by ``write_range_sorted``, that
    range filter becomes file-level skipping), and the duplicate-partial
    probe reads only this batch's windows — per-batch cost tracks batch
    size, not total history. In the full pipeline the events fact table
    plays the ledger's role, so the extra storage is only the standalone
    form's."""

    from allora_indexer_spark.plans import warehouse as wh

    source = spark.readStream.schema(feed_schema).parquet(feed_dir)
    ledger_dir = rollup_dir + "_keys"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # the LEDGER must be a manifest table from its first row: a plain
        # parquet append can crash with a SUBSET of the batch's keys
        # visible, and a partially-visible ledger changes the retry's
        # novel set — its content_key then differs and the remainder
        # double-counts into the rollup. A manifest append is an atomic
        # version flip (all keys or none), which closes that window; a
        # pre-existing PLAIN ledger fails loudly below (its rollup's
        # content_key encoding is unknowable — see CONTENT_KEY_ENCODING).
        # (The rollup dir needs no such guard: its rows are
        # per-window and the (window_start, content_key) anti-join
        # already absorbs a partially-visible partial append.)
        ledger_manifest = wh._manifest_read(ledger_dir)
        if ledger_manifest is None:
            if os.path.isdir(ledger_dir):
                # a PLAIN-dir ledger predates both the manifest seeding
                # (commit "streaming-store atomicity") and the encoding
                # marker — whether its rollup's content keys match the
                # current encoding is unknowable, and guessing wrong
                # double-counts. Same loud contract as the legacy
                # heavy-hitter store with no meta file.
                raise RuntimeError(
                    f"{ledger_dir}: pre-manifest plain ledger — its "
                    "rollup's content_key encoding is unknowable (see "
                    "CONTENT_KEY_ENCODING). Rebuild rollup + ledger + "
                    "checkpoint together from the feed."
                )
            # one atomic publish: seed data + schema + encoding marker
            _seed_ledger(batch_df.select(key_col).limit(0), ledger_dir)
        elif (
            ledger_manifest.get("content_key_encoding") is None
            and wh.read_dir(spark, ledger_dir).isEmpty()
        ):
            # marker-less but EMPTY manifest ledger: a pre-marker seed
            # (or its crash remnant) that never recorded a key under ANY
            # encoding — stamping is provably safe, and the atomic seed
            # above means no new ones can arise. NON-empty marker-less
            # ledgers still fail below, and genuinely cannot be
            # auto-adopted: manifest seeding predates the v2 encoding by
            # several commits (seeding landed with the v1 delimiter-
            # joined content_key; element-wise v2 and the marker each
            # shipped later), so a marker-less store's rollup may be
            # fingerprinted under EITHER encoding and the values are
            # indistinguishable (both are xxhash64 longs). Guessing
            # wrong silently double-counts; the error names the operator
            # decision: stamp_ledger_encoding() for stores known to be
            # written by v2-era code, rebuild for v1-era or unknown ones
            # (see README "Upgrading a continuous rollup").
            stamp_ledger_encoding(ledger_dir)
        else:
            _check_ledger_encoding(ledger_manifest, ledger_dir)
        # null-key rows are quarantined unconditionally (they could not be
        # deduplicated by the ledger and would be counted or dropped
        # depending on batch composition otherwise). Persist BEFORE the
        # min/max agg: without the cache the batch scan + dropDuplicates
        # shuffle would run once for the agg and again when the post-join
        # plan materializes — one redundant shuffle per 5 s batch.
        base = (
            batch_df.filter(F.col(key_col).isNotNull())
            .dropDuplicates([key_col])
            .persist()
        )
        novel = base
        part_cached = None
        try:
            if os.path.isdir(ledger_dir):
                lo, hi = base.agg(
                    F.min(key_col), F.max(key_col)
                ).collect()[0]
                if lo is None:
                    return  # batch had no keyed rows at all
                seen = wh.read_dir(spark, ledger_dir).filter(
                    F.col(key_col).between(lo, hi)
                )
                novel = base.join(seen, [key_col], "left_anti").persist()
            # each partial carries a content hash of the exact key set it
            # aggregates; appending is anti-joined on (window, content
            # hash), so a retried batch (crash between the two writes
            # below, at any point) re-derives byte-identical partials and
            # appends nothing — the rollup+ledger pair is idempotent
            # without a transaction. The set is hashed ELEMENT-WISE first
            # (sorted array of per-key xxhash64 longs, then one hash):
            # joining raw string keys with a delimiter made distinct sets
            # collide when a key contained the delimiter ({'a,b'} vs
            # {'a','b'}), silently dropping a genuinely-new partial.
            # (The encoding is versioned on disk: the ledger manifest's
            # content_key_encoding marker, checked above before any
            # write — a store written under another encoding fails
            # loudly instead of double-counting on replay.)
            part = (
                novel.groupBy(F.window(ts_col, window).alias("w"))
                .agg(
                    F.count("*").alias("n_events"),
                    F.sum(
                        F.col(value_col).cast("decimal(18,4)")
                    ).alias("sum_value"),
                    _content_key_agg(key_col).alias("content_key"),
                )
                .select(
                    F.col("w.start").alias("window_start"),
                    "content_key",
                    "n_events",
                    "sum_value",
                )
            )
            if os.path.isdir(rollup_dir):
                part_cached = part.persist()
                wlo, whi = part_cached.agg(
                    F.min("window_start"), F.max("window_start")
                ).collect()[0]
                part = part_cached
                if wlo is not None:
                    # probe only this batch's window span — bounded by
                    # batch size, not rollup history (file-skipped when
                    # compacted into a range-sorted layout)
                    done = (
                        wh.read_dir(spark, rollup_dir)
                        .filter(F.col("window_start").between(wlo, whi))
                        .select("window_start", "content_key")
                        .distinct()
                    )
                    part = part_cached.join(
                        done, ["window_start", "content_key"], "left_anti"
                    )
            # manifest-aware: the docstring's out-of-band compact()
            # converts these dirs to the manifest layout, after which a
            # root append would be invisible to the reads above
            wh.append_dir(part, rollup_dir)
            wh.append_dir(novel.select(key_col), ledger_dir)
        finally:
            base.unpersist()
            if novel is not base:
                novel.unpersist()
            if part_cached is not None:
                part_cached.unpersist()

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Merge-on-read over the partial rollup: one row per window.
    Manifest-aware, so it keeps reading across out-of-band compactions."""
    from allora_indexer_spark.plans import warehouse as wh

    return (
        wh.read_dir(spark, rollup_dir)
        .groupBy("window_start")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


EMA_ALPHA = 0.25
EMA_OUTPUT = "topic_id INT, address STRING, ema DOUBLE, n_scores INT"


def start_streaming_ema(
    spark: SparkSession,
    results_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    alpha: float = EMA_ALPHA,
) -> StreamingQuery:
    """Per-(topic, address) exponential moving average of scores as an
    arbitrary-state streaming operator on the transformWithStateInPandas
    API (Spark 4) — the streaming twin of the ema_scores table the
    reference maintains by upsert (insertEMAScore,
    /root/reference/db.go:1246-1350) and of batch q12.

    A ValueState cell holds the running EMA per key in the RocksDB state
    store; each micro-batch folds its score arrivals (ordered by
    height_tx) into the cell and emits the key's updated EMA. State is
    O(#actors), the recurrence itself never reprocesses history — exactly
    how a scoring pipeline keeps model-quality EMAs live over an unbounded
    event stream.

    Environment note: this API needs the protobuf Python package at
    runtime (Spark's TWS driver worker speaks protobuf to the JVM); where
    it is absent, ``start_last_commit_state_stream``'s
    applyInPandasWithState is the equivalent tested path."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    stream = read_block_results_stream(spark, results_dir)
    # _zip_addresses_values, not scores(): the batch dedup's row_number
    # window cannot run on a streaming DF — replay absorption is the state
    # cell's job here anyway
    scores = ingest._zip_addresses_values(
        ingest.flat_events(stream).filter(F.col("family") == "score"),
        "scores",
        "value",
    ).select(
        "topic_id",
        "address",
        "height_tx",
        F.col("value").cast("double").alias("value"),
    ).filter(
        # decimal-overflow quarantine nulls `value` but keeps the row
        # (raw string preserved); folding a null here would store NaN in
        # the state cell and poison the key's EMA forever
        F.col("value").isNotNull()
        & F.col("topic_id").isNotNull()
        & F.col("address").isNotNull()
    )

    class EMAProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ema = handle.getValueState("ema", "ema DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._ema.get()
            ema = prev[0] if prev is not None else None
            n = 0
            # concatenate ALL Arrow chunks before the one sort: a key's
            # batch rows can span chunks in arbitrary shuffle order, and
            # sorting each chunk independently would fold newer heights
            # before older ones — a silently wrong EMA persisted in the
            # state cell (the order bug only a multi-chunk batch hits)
            chunks = [pdf for pdf in rows]
            batch = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else (chunks[0] if chunks else None)
            )
            if batch is not None:
                for v in batch.sort_values("height_tx")["value"]:
                    ema = (
                        float(v)
                        if ema is None
                        else alpha * float(v) + (1.0 - alpha) * ema
                    )
                    n += 1
            self._ema.update((ema,))
            yield pd.DataFrame(
                {
                    "topic_id": [key[0]],
                    "address": [key[1]],
                    "ema": [ema],
                    "n_scores": [n],
                }
            )

        def close(self) -> None:
            pass

    updated = scores.groupBy("topic_id", "address").transformWithStateInPandas(
        EMAProcessor(),
        outputStructType=EMA_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    return (
        updated.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_incremental_near_dup(
    spark: SparkSession,
    docs_dir: str,
    pairs_dir: str,
    sig_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    compact_every: int | None = 32,
) -> StreamingQuery:
    """Incremental near-duplicate detection: each micro-batch of NEW
    documents is LSH-banded, probed against the persisted signature store
    of every document seen so far, exact-Jaccard-verified, and then added
    to the store — the production form of q41, where dedup runs as data
    arrives instead of re-scanning the corpus.

    Scale design (the part that matters at 100 TB of history):
    - every signature carries a 2-hex-char band-hash ``bucket`` as a
      TYPED DATA column (never a hive partition dir — partition-value
      inference would retype an all-digit root, '04' -> int 4, and break
      the probe filter); the cadenced fold/compact clusters and sorts the
      store by it, so the probe's ``bucket.isin([...])`` prunes at the
      parquet row-group level — probe cost tracks the batch's collision
      neighborhood, never store size (the streaming twin of the K1
      range-pruned ledger probe). Un-folded per-batch deltas are small
      and scanned whole until the next fold;
    - pairs are (least, greatest)-normalized and anti-joined against the
      already-emitted pair set pruned to the batch's doc span, so a
      crash-retry between the two appends below converges instead of
      double-emitting (same recovery contract as start_continuous_rollup);
    - re-delivered documents (at-least-once sources) are dropped by a
      doc_id anti-join against the store before they can pair with
      themselves or re-append signatures;
    - the store grows one file set per batch; every ``compact_every``-th
      batch the deltas are FOLDED (``warehouse.fold_appends`` — prior
      folds and the compacted base carried by reference, O(deltas) per
      fold), and when the accumulated fold tiers exceed the manifest
      bound a full bucket-clustered ``compact()`` resets them — the LSM
      minor/major split, so per-batch overhead stays flat over an
      unbounded run. Reads and appends are manifest-aware, so the stream
      keeps working across compactions; a pre-manifest hive-partitioned
      store (the layout an earlier revision wrote) is converted on the
      first batch, re-padding bucket values that hive partition-value
      inference mistyped.
    """

    from allora_indexer_spark.plans import warehouse as wh

    def _convert_legacy_hive_store() -> None:
        """One-time repair+conversion of a pre-manifest sig store laid
        out as bucket=XX hive dirs: flat manifest appends beside hive
        dirs would make the root unreadable (conflicting directory
        structures), so convert BEFORE the first append. The transform
        re-pads the bucket column: hive inference types an all-digit
        root as int ('04' -> 4), and the 2-hex-char format makes the
        zero-padded string the exact inverse. The select list is built
        from the STORE's own columns (df.columns inside the transform),
        never the current batch's — projecting to batch columns would
        silently drop any column a past pipeline revision persisted and
        raise on one the store predates."""
        if wh._manifest_read(sig_dir) is not None:
            return
        if not os.path.isdir(sig_dir) or not any(
            e.startswith("bucket=") for e in os.listdir(sig_dir)
        ):
            return
        wh.compact(
            spark,
            sig_dir,
            target_partitions=1,
            cluster_by=["bucket"],
            transform=lambda df: df.select(
                *[c for c in df.columns if c != "bucket"],
                F.lpad(F.col("bucket").cast("string"), 2, "0").alias(
                    "bucket"
                ),
            ),
        )

    source = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")  # feeds often land as
        .parquet(docs_dir)  # per-batch subdirectories
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_near_dup_batch(
            spark,
            batch_df,
            batch_id,
            pairs_dir,
            sig_dir,
            threshold,
            compact_every,
            convert_legacy=_convert_legacy_hive_store,
        )

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _merge_near_dup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    pairs_dir: str,
    sig_dir: str,
    threshold: float,
    compact_every: int | None,
    convert_legacy=None,
    signature_fn=None,
    verify_fn=None,
    carry_cols: tuple[str, ...] = ("s",),
    seed_extra: dict | None = None,
) -> None:
    """One micro-batch of the incremental near-dup pipeline (see
    :func:`start_incremental_near_dup` for the scale design). Exposed
    module-level — like :func:`_merge_heavy_hitter_batch` — so replay
    idempotence and LONG maintenance soaks (tools/soak.py drives ~10^3
    batches through the fold/compact cadence) are directly testable
    without per-batch streaming-trigger overhead.

    The store/probe/fold machinery is MODALITY-GENERIC (round 15):
    ``signature_fn`` maps a (doc_id, text) batch to band rows
    (doc_id, band_id, bh, *carry_cols) and ``verify_fn`` maps the
    banded candidates (doc_a, doc_b, <carry>_a, <carry>_b) to verified
    pairs; the defaults are the text MinHash+Jaccard pipeline, and
    :func:`merge_hash_near_dup_batch` plugs in the image-dHash / audio-
    fingerprint family (popcount verify) — same bucket clustering, same
    crash-retry convergence, same LSM fold cadence."""

    from allora_indexer_spark.operators.dedup import (
        banded_signatures,
        exact_jaccard,
    )
    from allora_indexer_spark.plans import warehouse as wh

    if signature_fn is None:
        def signature_fn(b: DataFrame) -> DataFrame:
            # sub-2-token docs have an empty shingle set -> null band
            # hash: a null bh can never LSH-match anything (null never
            # equals), and a null bucket evades the redelivered-doc
            # probe's isin, so storing such rows would re-append them on
            # EVERY redelivery — unbounded store growth for zero
            # matching power. Drop them.
            return banded_signatures(b).filter(F.col("bh").isNotNull())

    if verify_fn is None:
        def verify_fn(cand: DataFrame) -> DataFrame:
            return cand.select(
                "doc_a",
                "doc_b",
                exact_jaccard("s_a", "s_b").alias("jaccard"),
            ).filter(F.col("jaccard") >= threshold)

    batch = batch_df.filter(F.col("doc_id").isNotNull()).dropDuplicates(
        ["doc_id"]
    )
    cached = (
        signature_fn(batch)
        .withColumn("bucket", F.substring("bh", 1, 2))
        .persist()
    )
    bands = cached
    pairs_cached = None
    try:
        if convert_legacy is not None:
            convert_legacy()
        # the signature store must be a manifest table from its first
        # row (same rule as the rollup ledger): a plain parquet append
        # can crash with a SUBSET of a doc's band rows visible, and the
        # retry's doc_id anti-join then drops the WHOLE doc — its
        # missing bands are never written, and every future near-dup
        # colliding only on those bands is silently never emitted. A
        # manifest append is an atomic version flip (all bands or none).
        if wh._manifest_read(sig_dir) is None:
            # one atomic publish (schema + recorded layout together) —
            # the exact mechanism the rollup ledger seeds through; the
            # old two-step (plain empty append, then compact) left a
            # crash window where a lock-free rival raced a plain dir
            wh.seed_manifest_store(
                cached.limit(0),
                sig_dir,
                layout={
                    "cluster_by": ["bucket"],
                    "target_partitions": 1,
                    "by": "compact",
                },
                extra=seed_extra,
            )
        store = None
        if os.path.isdir(sig_dir):
            buckets = [
                r[0]
                for r in bands.select("bucket").distinct().collect()
            ]  # bounded: <= 256 two-hex-char values
            if buckets:
                store = wh.read_dir(spark, sig_dir).filter(
                    F.col("bucket").isin(buckets)
                )
                # drop re-delivered docs entirely (they are not new)
                known = store.select("doc_id").distinct()
                bands = bands.join(known, ["doc_id"], "left_anti")
        # allowMissingColumns both ways: a converted legacy store may
        # carry columns a past pipeline revision persisted (the
        # lossless conversion keeps them), and the batch may carry
        # columns the store predates — either side pads with nulls;
        # the candidate join only touches (band_id, bh, doc_id, s)
        other = (
            bands.unionByName(store, allowMissingColumns=True)
            if store is not None
            else bands
        )
        cand = (
            bands.alias("a")
            .join(
                other.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") != F.col("b.doc_id")),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
                *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry_cols],
                *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry_cols],
            )
            .dropDuplicates(["doc_a", "doc_b"])
        )
        pairs = verify_fn(cand)
        # manifest-seed the pairs store too: pairs appends are per-pair
        # idempotent (the (doc_a, doc_b) anti-join), so partial
        # visibility self-heals — but a PLAIN pairs dir accumulates one
        # file set per batch forever with no maintenance at all (the
        # per-batch 'done' probe then lists an O(#batches) file set).
        # With a manifest + recorded range_by layout, _append_data's
        # auto-fold/escalation keep it bounded and the doc_a range probe
        # file-prunes.
        if wh._manifest_read(pairs_dir) is None:
            wh.seed_manifest_store(
                pairs.limit(0),
                pairs_dir,
                layout={
                    "range_by": ["doc_a"],
                    "target_partitions": 1,
                    "by": "compact",
                },
            )
        if os.path.isdir(pairs_dir):
            pairs = pairs_cached = pairs.persist()
            lo, hi = pairs.agg(
                F.min("doc_a"), F.max("doc_a")
            ).collect()[0]
            if lo is not None:
                done = (
                    wh.read_dir(spark, pairs_dir)
                    .filter(F.col("doc_a").between(lo, hi))
                    .select("doc_a", "doc_b")
                )
                pairs = pairs.join(done, ["doc_a", "doc_b"], "left_anti")
        # manifest-aware: after a compaction the live file set is
        # manifest-listed, and a root append would be invisible to
        # the manifest reads above. The store keeps `bucket` as a
        # DATA column (cluster_by, never hive partition_by): hive
        # partition-value inference would silently retype an
        # all-digit hex root ('04' -> int 4), breaking the probe's
        # string bucket filter; row-group min/max stats on the
        # clustered column give the pruning instead.
        wh.append_dir(pairs, pairs_dir)
        wh.append_dir(bands, sig_dir)
        if (
            compact_every
            and batch_id > 0
            and batch_id % compact_every == 0
        ):
            # fold the per-batch file sets back down — incremental
            # (O(deltas since last fold), the base signature set is
            # carried by reference, which matters when the store
            # holds a corpus-sized signature history); the first
            # cadence hit converts the plain dir with one full
            # compact. Same atomic-flip machinery as the warehouse
            # tables, so a crash mid-fold leaves the previous store
            # intact.
            if not wh.fold_appends(
                spark, sig_dir, cluster_by=["bucket"]
            ):
                wh.compact(
                    spark,
                    sig_dir,
                    target_partitions=1,
                    cluster_by=["bucket"],
                )
            else:
                m = wh._manifest_read(sig_dir)
                if (
                    m is not None
                    and len(m["data"]) > wh.APPEND_MANIFEST_WARN
                ):
                    # fold tiers accumulated past the manifest bound:
                    # run the occasional FULL compact that resets
                    # them (the LSM major compaction — acting on the
                    # same signal table_health reports)
                    wh.compact(
                        spark,
                        sig_dir,
                        target_partitions=max(1, len(m["data"]) // 8),
                        cluster_by=["bucket"],
                    )
    finally:
        cached.unpersist()
        if pairs_cached is not None:
            # without this every micro-batch leaks one CacheManager
            # entry (the soak drives ~10^3 batches through here)
            pairs_cached.unpersist()


def merge_hash_near_dup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    pairs_dir: str,
    sig_dir: str,
    modality: str = "image",
    tau: int = 3,
    compact_every: int | None = 32,
    plan: dict | None = None,
) -> None:
    """One micro-batch of the per-modality HASH near-dup pipeline
    (round-14 verdict item 3: the q99zzc/q99zzd/q99zze family was
    batch-only): image dHash, audio energy-contour fingerprints, or
    video keyframe dHashes (per-keyframe composite items — the q99zzr
    family's hash stage, video pairs aggregated downstream),
    banded 4x16-bit, probed against the persisted signature store,
    exact-popcount-verified at hamming <= tau, then appended. Rides
    :func:`_merge_near_dup_batch`'s store machinery verbatim — bucket
    clustering (first 2 hex chars of the band value), redelivery
    anti-join, crash-retry pair convergence, LSM fold/compact cadence —
    so every T3 (effectively-once) and flatness property the text store
    soaks already pin applies to this family by construction, plus the
    direct tests in tests/test_streaming.py.

    ``plan`` (an ``mih_band_plan`` dict) selects the band geometry — the
    streaming twin of q99zzd/q99zze's automatic wide routing. It is a
    STORE-LIFETIME choice: the persisted signatures carry the chosen
    geometry's columns, so re-dialing an existing store means re-hashing
    history into a fresh store (the same rule any LSH signature store
    has); None keeps the classic 64-bit / 4x16 split. Since round 16
    the choice is ENFORCED, not just documented: the geometry is
    written into the signature store's manifest at creation, and
    reopening with a different plan — or the other modality — raises
    ValueError naming both geometries (round-15 verdict item 3 /
    reviewer advice: the old behavior was a silent false-negative
    regime — allowMissingColumns padded the other geometry's carry
    columns to null, hamming evaluated null, and every old-vs-new
    candidate quietly dropped). Combination-key plans (match_bands >
    1, the past-cap batch dial) are rejected up front: the store's
    band/bucket layout is single-band."""
    from allora_indexer_spark.operators.multimodal import (
        afp_signature_frame,
        dhash_signature_frame,
    )
    from allora_indexer_spark.operators.video import video_signature_frame
    from allora_indexer_spark.plans import warehouse as wh

    if modality not in ("image", "audio", "video"):
        raise ValueError(
            f"modality must be 'image', 'audio' or 'video', got {modality!r}"
        )
    if plan is not None and plan.get("match_bands", 1) > 1:
        raise ValueError(
            "combination-key plans (match_bands "
            f"{plan['match_bands']}) are a batch-join dial; the "
            "incremental signature store probes single bands — use a "
            "single-band plan (band_bits <= 32, match_bands 1)"
        )
    if modality == "video":
        # video items are per-KEYFRAME (composite id video*8+frame_idx,
        # see video_signature_frame) and ship the classic 4x16 geometry
        # only — the wide dial's re-hash has no video form yet
        if plan is not None:
            raise ValueError(
                "modality 'video' supports only the classic 4x16 "
                "geometry (plan=None); the MIH wide dial has no video "
                "hash form"
            )
        base_fn = video_signature_frame
    else:
        base_fn = (
            dhash_signature_frame if modality == "image" else afp_signature_frame
        )

    def sig_fn(b: DataFrame) -> DataFrame:
        return base_fn(b, plan)

    if plan is not None and plan["band_bits"] > 16:
        carry = tuple(f"band{i}" for i in range(plan["bands"]))
        ham_sql = " + ".join(
            f"bit_count(band{i}_a ^ band{i}_b)" for i in range(plan["bands"])
        )
    else:
        carry = ("hi", "lo")
        ham_sql = "bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"

    geometry = {
        "modality": modality,
        "bands": 4 if plan is None else plan["bands"],
        "band_bits": 16 if plan is None else plan["band_bits"],
        "carry": list(carry),
    }
    m = wh._manifest_read(sig_dir)
    if m is not None:
        rec = m.get("hash_geometry")
        if rec is not None:
            if (
                rec.get("modality"),
                rec.get("bands"),
                rec.get("band_bits"),
            ) != (modality, geometry["bands"], geometry["band_bits"]):
                raise ValueError(
                    f"hash signature store {sig_dir} was created with "
                    f"geometry {rec}; reopening it with {geometry} "
                    "would silently drop every old-vs-new candidate "
                    "(null-padded carry columns) — re-dialing requires "
                    "re-hashing history into a FRESH store"
                )
        else:
            # pre-round-16 store with no recorded geometry: fall back
            # to the schema — the carry columns it persisted must cover
            # the requested plan's (modality is unrecoverable here, so
            # only the column shape is checkable)
            import json as _json

            schema = m.get("schema")
            if schema is not None:
                cols = {
                    f["name"] for f in _json.loads(schema)["fields"]
                }
                if not set(carry) <= cols:
                    raise ValueError(
                        f"hash signature store {sig_dir} persists "
                        f"columns {sorted(cols)}, which lack the "
                        f"requested geometry's carry columns "
                        f"{sorted(carry)} — re-dialing requires a "
                        "FRESH store"
                    )

    def verify(cand: DataFrame) -> DataFrame:
        return (
            cand.withColumn("hamming", F.expr(ham_sql).cast("int"))
            .filter(F.col("hamming") <= tau)
            .select("doc_a", "doc_b", "hamming")
        )

    _merge_near_dup_batch(
        spark,
        batch_df,
        batch_id,
        pairs_dir,
        sig_dir,
        0.0,  # threshold unused: verify() owns the hamming gate
        compact_every,
        signature_fn=sig_fn,
        verify_fn=verify,
        carry_cols=carry,
        seed_extra={"hash_geometry": geometry},
    )


def start_incremental_hash_near_dup(
    spark: SparkSession,
    docs_dir: str,
    pairs_dir: str,
    sig_dir: str,
    checkpoint_dir: str,
    modality: str = "image",
    tau: int = 3,
    compact_every: int | None = 32,
    plan: dict | None = None,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Incremental per-modality hash dedup: the streaming form of
    q99zzd (image) / q99zze (audio), exactly as
    :func:`start_incremental_near_dup` is the streaming form of q41 —
    each micro-batch of NEW documents is fingerprinted ONCE (the audio
    path runs the real WAV codec inside the batch's Arrow stage; history
    is never re-decoded), banded against the persisted signature store,
    popcount-verified, and appended. Checkpoint + the store's
    atomic-manifest appends give the T3 effectively-once contract:
    kill/replay converges to the same pair set with no duplicates.

    ``trigger`` passes through to ``writeStream.trigger`` — the default
    ``{"availableNow": True}`` drains the backlog and stops (backfill /
    test form); ``{"processingTime": "5 seconds"}`` is the LIVE form
    that keeps polling the directory like the reference's height loop
    (main.go:251), pinned by the live-trigger test in
    tests/test_streaming.py."""
    source = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merge_hash_near_dup_batch(
            spark, batch_df, batch_id, pairs_dir, sig_dir,
            modality, tau, compact_every, plan=plan,
        )

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (the q99l sketch as a continuously-maintained store)
# ---------------------------------------------------------------------------


def _migrate_legacy_hh_store(spark: SparkSession, store_dir: str) -> None:
    """One-time migration of a pre-manifest heavy-hitter store (symlink-flip
    layout: the store path is a symlink to a version dir holding the
    (token, cnt) parquet plus ``_hh_meta.json`` with n_total/last_batch)
    onto the manifest layout. Without this, the first post-upgrade
    micro-batch would read no manifest, reset n_total/last_batch to
    defaults, and merge without the accumulated counts — silently
    breaking both the no-false-negative superset guarantee and replay
    idempotence (batch ids below the lost high-water mark would re-merge
    and double-count). Delegates to the warehouse's shared staged
    migration, parameterized on the store's meta file, so counts and the
    batch watermark ride into the manifest in the same crash-safe swap; a
    legacy store MISSING its meta file raises instead of resetting."""

    from allora_indexer_spark.plans.warehouse import _migrate_symlink_table

    if os.path.islink(store_dir) and os.path.exists(store_dir):
        meta = os.path.join(os.path.realpath(store_dir), "_hh_meta.json")
        if not os.path.isfile(meta):
            raise RuntimeError(
                f"{store_dir}: legacy heavy-hitter store has no "
                "_hh_meta.json — refusing to merge (counts and the "
                "batch_id high-water mark would silently reset)"
            )
    _migrate_symlink_table(
        spark,
        store_dir,
        meta_file="_hh_meta.json",
        meta_keys=("n_total", "last_batch"),
    )


def _merge_heavy_hitter_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    support: float,
) -> None:
    """Merge one micro-batch of documents into the persisted heavy-hitter
    store. Exposed module-level (foreachBatch delegates here) so replay
    idempotence is directly testable.

    Store contract: a manifest-layout table (the same atomic `_CURRENT`
    flip machinery as the warehouse upsert tables — object-store-portable,
    see plans/warehouse.py's layout note) holding (token, cnt) parquet;
    the running token total and the last applied batch_id ride INSIDE the
    manifest, so counts and high-water mark flip in the same atomic
    publish. ``cnt`` is a LOWER bound on the token's true corpus count
    with undercount <= (support/2)·N_total — per micro-batch, tokens below
    (support/2)·batch_tokens are pruned before merging (the same
    Misra-Gries bound q99l uses per Arrow batch, applied per trigger), so
    any token whose true count reaches ceil(support·N) is guaranteed
    present with cnt >= (support/2)·N. At-least-once replays are absorbed
    by the batch_id high-water mark: re-applying an already-merged batch
    is a no-op, so counts never double. A RESET checkpoint (fresh batch
    numbering over regrouped files) is detected via a bounded
    content-fingerprint window (batch ids < 8 — every reset re-delivers
    id 0) and fails LOUDLY: counts are not mergeable exactly under
    renumbered batches, and silently skipping them would drop new data
    from n_total (the old behavior)."""

    from allora_indexer_spark.plans.warehouse import (
        _VERSIONS_DIR,
        _gc_after_publish,
        _manifest_read,
        _new_version_id,
        _publish_manifest,
        _read_manifest_data,
        _retry_cas,
        _table_lock,
    )

    # one tokenize pass per trigger: counts is the only aggregate built
    # from the raw batch; batch_n derives from it (summing the counts)
    # instead of a second count() job re-reading and re-exploding the
    # batch's files
    toks = batch_df.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt")).persist()
    try:
        # one agg pass yields the token total AND an order-independent
        # content fingerprint (sum of bounded per-row hashes — pmod keeps
        # every addend < 2^31, so the sum cannot overflow a long at any
        # realistic vocabulary size, ANSI or not)
        batch_n, batch_fp = counts.agg(
            F.sum("cnt"),
            F.sum(F.pmod(F.xxhash64("token", "cnt"), F.lit(2147483647))),
        ).collect()[0]
        batch_n = batch_n or 0
        batch_fp = int(batch_fp or 0)
        # Empty batches are NOT early-returned: they flow through
        # merge_once so last_batch advances and (ids < 8) their
        # fingerprint (0) is recorded. Skipping them left a hole the
        # reset guard exists to close — if the ORIGINAL batch 0 was
        # empty, a reset checkpoint replaying a non-empty batch 0 found
        # no recorded fp and was silently skipped (data loss). An empty
        # batch with no store yet publishes the store's first (empty)
        # version, so even that corner records its fingerprint; an empty
        # REPLAY still no-ops (fp 0 == recorded 0).

        # writer lock spans read-manifest → merge → publish, same
        # contract as the warehouse writers; under LOCK_MODE="none" the
        # lock is a no-op and the CAS guard below (expect=prev version,
        # conflict → re-read + re-merge) closes the lost-update window —
        # an unconditional flip would clobber a concurrent merger's
        # counts wholesale
        def merge_once() -> None:
            prev = _manifest_read(store_dir)
            n_total = prev.get("n_total", 0) if prev else 0
            last_batch = prev.get("last_batch", -1) if prev else -1
            fps = dict(prev.get("batch_fps") or {}) if prev else {}
            if batch_id <= last_batch:
                # Replayed batch: already merged — SKIP, keeping counts
                # exact. But a fresh/reset CHECKPOINT also restarts batch
                # ids at 0 with a DIFFERENT file grouping: silently
                # skipping those would drop genuinely-new data from the
                # count (and re-merging would double-count the old) —
                # neither is recoverable from a counting store, so a
                # content-fingerprint mismatch fails LOUDLY instead.
                # Resets always restart at id 0, so the bounded
                # fingerprint window (ids < 8 + the high-water batch)
                # catches them on the first trigger.
                recorded = fps.get(str(batch_id))
                if recorded is not None and recorded != batch_fp:
                    raise RuntimeError(
                        f"{store_dir}: batch {batch_id} replayed with "
                        f"DIFFERENT content (fingerprint {batch_fp} != "
                        f"recorded {recorded}) — the streaming checkpoint "
                        "was reset against a live store. Counts cannot be "
                        "merged exactly under renumbered batches: restore "
                        "the original checkpoint, or rebuild the store "
                        "from cold storage."
                    )
                if (
                    recorded is None
                    and batch_id == 0
                    and n_total > 0
                    and last_batch > 0
                ):
                    # batch 0 is every reset's signature, and a store
                    # with content but NO recorded fp for it predates the
                    # fingerprint guard (or lost the record) — whether
                    # this replay is benign is undecidable, and silently
                    # skipping it is exactly the data-loss mode the guard
                    # exists to catch. Fail suspect, not silent.
                    # last_batch > 0 bounds the false positives: a
                    # same-checkpoint crash retry only ever replays the
                    # LAST batch, so on a multi-batch store a batch-0
                    # replay is necessarily a reset; on a one-batch
                    # pre-guard store (last_batch == 0) the retry is the
                    # benign common case and keeps the old skip.
                    raise RuntimeError(
                        f"{store_dir}: batch 0 replayed against a "
                        "non-empty store with no recorded fingerprint — "
                        "either the checkpoint was reset (replaying "
                        "renumbered batches would double-count or drop "
                        "data) or the store predates the reset guard. "
                        "Restore the original checkpoint, or rebuild the "
                        "store from cold storage."
                    )
                return
            # fingerprint window: ids < 8 only — bounded manifest
            # metadata, and sufficient because every checkpoint reset
            # re-delivers batch 0 first
            if batch_id < 8:
                fps[str(batch_id)] = batch_fp
            pruned = counts.filter(
                F.col("cnt") >= F.lit(support / 2.0) * F.lit(batch_n)
            )
            if prev is not None and pruned.limit(1).count() == 0:
                # no candidate cleared the batch bound: the store CONTENT
                # is unchanged, so publish a manifest that carries the
                # previous data entry BY REFERENCE — n_total/last_batch
                # advance with zero Spark jobs and zero file churn
                # (pre-fix: a full store read + rewrite per such batch)
                _publish_manifest(
                    store_dir,
                    {
                        "version": _new_version_id(),
                        "data": dict(prev["data"]),
                        "n_total": n_total + batch_n,
                        "last_batch": batch_id,
                        "batch_fps": fps,
                    },
                    expect=prev["version"],
                )
                _gc_after_publish(store_dir, keep=set())
                return
            merged = pruned
            if prev is not None:
                merged = (
                    _read_manifest_data(spark, store_dir, prev)
                    .unionByName(pruned)
                    .groupBy("token")
                    .agg(F.sum("cnt").alias("cnt"))
                )
            ver = _new_version_id()
            verdir = os.path.join(store_dir, _VERSIONS_DIR, ver)
            merged.coalesce(1).write.mode("overwrite").parquet(verdir)
            _publish_manifest(
                store_dir,
                {
                    "version": ver,
                    "data": {"all": os.path.join(_VERSIONS_DIR, ver)},
                    "n_total": n_total + batch_n,
                    "last_batch": batch_id,
                    "batch_fps": fps,
                },
                expect=prev["version"] if prev is not None else None,
            )
            _gc_after_publish(store_dir, keep={verdir})

        with _table_lock(store_dir):
            _migrate_legacy_hh_store(spark, store_dir)
            _retry_cas(merge_once)
    finally:
        counts.unpersist()


def start_streaming_heavy_hitters(
    spark: SparkSession,
    docs_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    support: float = 0.005,
) -> StreamingQuery:
    """Continuously-maintained corpus heavy hitters: each micro-batch of
    documents updates a persisted (token, count-lower-bound) store whose
    guarantees match q99l's batch operator — every token with true count
    >= ceil(support·N) is present, with bounded undercount. The streaming
    form never re-scans history: per trigger it counts ONE batch, prunes
    to the batch's candidate bound, and merges into the store.

    Scale: the merge unions the store (bounded by the accumulated
    candidate set, <= 2/support per batch and heavily repeating in
    practice) with <= 2/support pruned batch rows — state is sketch-sized,
    never vocabulary-sized, which is the point of streaming heavy hitters
    (readers wanting exact counts re-count the reported tokens with one
    q99l-style recount pass over cold storage)."""
    source = (
        spark.readStream.schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")
        .parquet(docs_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _merge_heavy_hitter_batch(
            spark, batch_df, batch_id, store_dir, support
        )

    return (
        source.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_frequent_tokens(
    spark: SparkSession, store_dir: str, support: float = 0.005
) -> DataFrame:
    """Report the heavy-hitter store: tokens whose count LOWER bound
    clears (support/2)·N_total — a guaranteed SUPERSET of the true
    frequent set (no false negatives; a false positive's true count still
    exceeds (support/2)·N). Columns: token, cnt_lb, n_total."""
    from allora_indexer_spark.plans.warehouse import (
        _manifest_read,
        _read_manifest_data,
        _table_lock,
    )


    if os.path.islink(store_dir) or not os.path.exists(store_dir):
        # Legacy symlink store, or a migration that crashed mid-swap
        # (path absent, complete staging beside it): the one-time
        # migration/resume MUTATES the store — take the writer lock so it
        # cannot interleave with a concurrent merge's own (locked)
        # migration. A store that simply never existed no-ops here and
        # falls through to the FileNotFoundError below. The steady-state
        # read path never locks.
        with _table_lock(store_dir):
            _migrate_legacy_hh_store(spark, store_dir)
    manifest = _manifest_read(store_dir)
    if manifest is None:
        raise FileNotFoundError(store_dir)
    n_total = manifest["n_total"]
    return (
        _read_manifest_data(spark, store_dir, manifest)
        .filter(F.col("cnt") >= F.lit(support / 2.0) * F.lit(n_total))
        .select(
            "token",
            F.col("cnt").alias("cnt_lb"),
            F.lit(n_total).alias("n_total"),
        )
    )
