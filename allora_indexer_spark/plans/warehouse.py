"""Idempotent table writers — the sink side (SURVEY.md §2.2 K1-K8).

The reference guarantees effectively-once delivery with unique constraints +
ON CONFLICT on Postgres (T3). On a Spark warehouse the same contract is:

- K1/K4 (insert-if-absent): anti-join the incoming batch against existing
  keys, append only the novel rows;
- K5/K6 (upsert / keep-latest): union existing + incoming, keep one row per
  key by the ordering column, rewrite.

Backing store here is parquet directories (one per table) because this
container has no Delta; on Delta/Iceberg both writers become a single
``MERGE INTO`` on ``TABLE_KEYS[name]`` and the swap dance disappears. The
writer API is the seam where that substitution happens.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.schemas import ENUM_DOMAINS, TABLE_KEYS


def _table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    return spark.read.parquet(_table_path(root, name))


# Preferred range-pruning column per key set: the ingest-monotone one.
# Batches arrive as contiguous height spans, so min/max-pruning the
# existing-table scan on this column bounds the anti-join probe by BATCH
# size, not table size (parquet row-group min/max stats skip the rest).
_PRUNE_PREFERENCE = ("height", "height_tx", "message_height", "block_height", "id")


def _prune_col(keys: list[str]) -> str:
    for c in _PRUNE_PREFERENCE:
        if c in keys:
            return c
    return keys[0]


def existing_keys_in_range(
    spark: SparkSession, df: DataFrame, root: str, name: str
) -> DataFrame:
    """The bounded dedup probe for :func:`write_insert_if_absent`: existing
    natural keys restricted to the incoming batch's span on the table's
    monotone key column. Natural keys are non-null by construction
    (schemas.TABLE_KEYS), so the between() filter never drops a live key."""
    keys = TABLE_KEYS[name]
    pc = _prune_col(keys)
    lo, hi = df.agg(F.min(pc), F.max(pc)).collect()[0]
    probe = read_table(spark, root, name)
    if lo is not None:
        probe = probe.filter(F.col(pc).between(F.lit(lo), F.lit(hi)))
    return probe.select(*keys).distinct()


def write_insert_if_absent(
    spark: SparkSession, df: DataFrame, root: str, name: str
) -> None:
    """K1/K4: append rows whose natural key is not present yet (the
    ON CONFLICT DO NOTHING analog). In-batch duplicates are collapsed first.

    The existing-side probe is range-pruned to the batch's key span (same
    ledger idiom as streaming/stream.py's continuous rollup), so per-append
    cost tracks batch size even against a years-deep table — an unpruned
    probe (worse, a broadcast of it) would grow without bound with table
    size. Join strategy is left to AQE: the pruned probe is usually small
    enough that AQE picks a broadcast on its own, with a safe fallback when
    it is not."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    batch = df.dropDuplicates(keys).persist()
    try:
        out = batch
        if _exists(path):
            probe = existing_keys_in_range(spark, batch, root, name)
            out = batch.join(probe, keys, "left_anti")
        out.write.mode("append").parquet(path)
    finally:
        batch.unpersist()


def enum_violations(df: DataFrame, name: str) -> DataFrame:
    """Rows violating the table's CHECK-style enum domains
    (schemas.ENUM_DOMAINS — the Postgres ENUM analog, db.go:340-350,
    442-452). NULL passes (a constraint on values, not presence)."""
    domains = ENUM_DOMAINS.get(name, {})
    cond = F.lit(False)
    for col, allowed in domains.items():
        cond = cond | (F.col(col).isNotNull() & ~F.col(col).isin(allowed))
    return df.filter(cond)


def read_table_checked(
    spark: SparkSession, root: str, name: str
) -> tuple[DataFrame, DataFrame]:
    """Read-back with enum validation: returns (valid, violations) — the
    isin expectation the reference gets for free from Postgres ENUM types.
    Violators are quarantined like the numeric guard's rows (F7), not
    errored, so a foreign tag cannot stall the pipeline."""
    df = read_table(spark, root, name)
    bad = enum_violations(df, name)
    domains = ENUM_DOMAINS.get(name, {})
    good = df
    for col, allowed in domains.items():
        good = good.filter(F.col(col).isNull() | F.col(col).isin(allowed))
    return good, bad


def write_keep_one(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    name: str,
    order: list[Column],
) -> None:
    """K5/K6: upsert — merge incoming with existing, keep the first row per
    natural key under ``order`` (e.g. desc(height_tx) = keep latest).
    Parquet requires a rewrite: write to a fresh directory, then swap —
    on Delta this is MERGE WHEN MATCHED UPDATE."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    if _exists(path):
        merged = read_table(spark, root, name).unionByName(df)
    else:
        merged = df
    w = Window.partitionBy(*keys).orderBy(*order)
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    tmp = path + "." + uuid.uuid4().hex[:8]
    result.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


# Ordering for the upsert tables: which row wins on key collision.
# (column, descending) specs — materialized lazily, a SparkSession may not
# exist at import time.
UPSERT_ORDER: dict[str, list[tuple[str, bool]]] = {
    "last_commit_values": [("height_tx", True), ("height", True)],
    "ema_scores": [("height_tx", True)],
    "scores": [("height_tx", True)],
    "rewards": [("height_tx", True)],
}


def _order_cols(spec: list[tuple[str, bool]]) -> list[Column]:
    return [F.desc(c) if d else F.asc(c) for c, d in spec]


def write_tables(
    spark: SparkSession, tables: dict[str, DataFrame], root: str
) -> None:
    """Write a full build_tables() result idempotently. Parents before
    children by construction (dict order), which eliminates the reference's
    waitCreation FK retry loop (A4/T4)."""
    os.makedirs(root, exist_ok=True)
    for name, df in tables.items():
        if name in UPSERT_ORDER:
            write_keep_one(spark, df, root, name, _order_cols(UPSERT_ORDER[name]))
        else:
            write_insert_if_absent(spark, df, root, name)


def bootstrap_from_snapshot(
    spark: SparkSession, snapshot_root: str, warehouse_root: str
) -> list[str]:
    """S8 snapshot restore: seed an empty warehouse from a parquet snapshot
    before streaming starts (the reference's restoreBackupFromS3 +
    pg_restore, /root/reference/process_s3.go:30-149 — parallel parquet read
    replaces pg_restore -j). Existing tables are left untouched so a restart
    after a partial bootstrap is safe."""
    os.makedirs(warehouse_root, exist_ok=True)
    restored = []
    for name in sorted(os.listdir(snapshot_root)):
        src = os.path.join(snapshot_root, name)
        if not os.path.isdir(src):
            continue
        dst = _table_path(warehouse_root, name)
        if _exists(dst):
            continue
        spark.read.parquet(src).write.mode("overwrite").parquet(dst)
        restored.append(name)
    return restored


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout writer — the Spark analog of the
    reference's topic_id secondary indexes (sql-migrations/v0.5.1/
    202409242000*.sql:7-43): at 100 TB a filter on the partition column
    prunes whole directories before any I/O happens, which is what an
    index buys Postgres. Use for the per-topic fact tables (scores,
    rewards, inferences) where topic_id is the dominant predicate."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Small-file compaction: streaming ingest appends a few rows per
    micro-batch, and a year of 5-second batches is millions of tiny files —
    the classic small-file problem that destroys scan throughput (every
    file is a task + an open/close). Rewrite the table at a target
    partition count (repartition by the layout key when given, so files
    align with partition pruning). Run out-of-band, like VACUUM/OPTIMIZE."""
    df = spark.read.parquet(path)
    if partition_cols:
        out = df.repartition(target_partitions, *partition_cols)
    else:
        out = df.repartition(target_partitions)
    tmp = f"{path}__compacting_{uuid.uuid4().hex[:8]}"
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed table layout for co-located joins: rows are hash-bucketed
    on ``bucket_cols`` at WRITE time, so any join or aggregation keyed on
    those columns reads matching buckets side-by-side with NO Exchange —
    the shuffle that dominates a 100 TB fact-fact join is paid once at
    ingest and amortized over every subsequent query. Both sides must use
    the same bucket count; ``sort_cols`` additionally pre-sorts inside each
    bucket file so a sort-merge join skips its Sort. Bucketing requires the
    metastore (saveAsTable), unlike the path-based writers above — at
    deployment this is the analog of the reference relying on Postgres
    btree indexes for its hot joins (sql-migrations/v0.5.1/
    202409242000*.sql), except the layout also removes the network cost."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_range_sorted(
    df: DataFrame,
    path: str,
    order_col: str,
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, sorted time-series layout: rows are range-split
    on ``order_col`` (each output file owns a disjoint interval) and sorted
    inside each file, so parquet min/max page stats make a time-range
    predicate skip every non-overlapping file/row-group — the layout a
    hypertable keeps per chunk. Combine with ``compact`` for maintenance;
    use for block_info/events where height/time predicates dominate."""
    (
        df.repartitionByRange(num_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .parquet(path)
    )


def evolve_append(
    spark: SparkSession, df: DataFrame, root: str, name: str
) -> None:
    """K8 schema evolution (isColumnExist/addColumn, /root/reference/
    db.go:1688-1708) the lake-table way: an append whose batch carries NEW
    columns widens the table — existing files simply lack the column and
    read back as nulls under mergeSchema; a batch MISSING known columns is
    padded with typed nulls so files stay union-compatible. No ALTER, no
    rewrite, no downtime; on Delta this is mergeSchema=true on write."""
    path = _table_path(root, name)
    if _exists(path):
        current = read_table_evolved(spark, root, name).schema
        for field in current.fields:
            if field.name not in df.columns:
                df = df.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
    df.write.mode("append").parquet(path)


def read_table_evolved(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a table whose files may predate newer columns (mergeSchema)."""
    return spark.read.option("mergeSchema", "true").parquet(
        _table_path(root, name)
    )


def table_ddl(
    name: str,
    schema,
    location: str | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """Render CREATE TABLE DDL for a table of this engine's 23-table model
    (K8: the declarative twin of the reference's compiled-in DDL strings,
    /root/reference/db.go:178-525). Schemas are derived from the ingest
    builders' outputs, so this is an EXPORT of the single source of truth,
    not a second copy; unique constraints do not exist in Spark DDL — they
    live in TABLE_KEYS and are enforced by the idempotent writers."""
    # simpleString() is emitted as-is: uppercasing it would mangle field
    # names inside struct/map types; names are backquoted so reserved
    # words and exotic identifiers survive
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    ddl = f"CREATE TABLE {name} ({cols}) USING PARQUET"
    if partition_by:
        ddl += f" PARTITIONED BY ({', '.join(partition_by)})"
    if location:
        ddl += f" LOCATION '{location}'"
    return ddl
