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

import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.schemas import ENUM_DOMAINS, TABLE_KEYS

# --- key-bucketed, versioned upsert layout -------------------------------
#
# Upsert tables (K5/K6) are hive-partitioned on an internal column `_kb` =
# pmod(xxhash64(natural key), UPSERT_BUCKETS): every row of a key lives in
# exactly one bucket directory, so an upsert batch only has to merge-rewrite
# the buckets its keys hash into — O(batch), not O(table history), the
# parquet twin of the reference's per-row ON CONFLICT upsert
# (/root/reference/db.go:1118-1185, 1246-1350). The table path itself is a
# SYMLINK to a hidden version directory (`.{name}__v{uuid}`); a write
# assembles the next version (rewritten buckets as fresh files, untouched
# buckets as HARDLINKS of the previous version's files — no data copied)
# and retargets the symlink with one atomic rename, so concurrent readers
# see either the old or the new table, never a partial one. Replaced
# versions are garbage-collected after a grace period (hardlink refcounts
# make deletion safe for files shared with live versions). On Delta/Iceberg
# the whole section collapses into MERGE INTO + snapshot manifests; this is
# that contract on plain parquet.

UPSERT_BUCKETS = 32  # default; fixed per table at creation (stored in meta)
# Per-table overrides for deployment sizing: pick ~(table size / healthy
# rewrite quantum). At 100 TB the large event tables (scores/rewards) want
# thousands of buckets so one batch rewrites megabytes, not gigabytes; the
# two-row last_commit_values wants few. The count is read back from the
# table's meta on every subsequent write, so resizing is an offline
# rewrite (compact into a new table), never a silent mismatch.
UPSERT_BUCKET_COUNTS: dict[str, int] = {
    "last_commit_values": 4,
}
_BUCKET_COL = "_kb"
_META_FILE = "_upsert_meta.json"  # '_'-prefixed: invisible to Spark listing
_GC_GRACE_SEC = 60.0


def _table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _exists(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path):
        if entry.endswith(".parquet"):
            return True
        sub = os.path.join(path, entry)
        if (
            entry.startswith(_BUCKET_COL + "=")
            and os.path.isdir(sub)
            and any(f.endswith(".parquet") for f in os.listdir(sub))
        ):
            return True
    return False


def _bucket_expr(keys: list[str], num_buckets: int) -> Column:
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)
    ).cast("int")


def _new_version_path(path: str) -> str:
    parent, name = os.path.split(os.path.normpath(path))
    return os.path.join(parent, f".{name}__v{uuid.uuid4().hex[:12]}")


def _version_paths(path: str) -> list[str]:
    parent, name = os.path.split(os.path.normpath(path))
    prefix = f".{name}__v"
    if not os.path.isdir(parent):
        return []
    return [
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(prefix)
    ]


def _current_target(path: str) -> str | None:
    if os.path.islink(path):
        return os.path.join(
            os.path.dirname(os.path.normpath(path)), os.readlink(path)
        )
    return None


def _flip_symlink(path: str, target: str) -> str | None:
    """Atomically retarget ``path`` (a symlink) at ``target``: build the new
    link under a temp name, then one rename — readers resolving ``path``
    see the old or the new version in full, never a mix. If ``path`` is
    still a legacy plain directory it is renamed aside first (rename cannot
    replace a non-empty dir); that one-time migration window is the only
    non-atomic moment in the table's life. Returns the renamed-aside path
    (freshly touched — rename preserves the OLD mtime, which would let the
    grace-period GC reap it from under an in-flight reader) so callers can
    keep it alive like any previous version."""
    tmp = path + ".__ln_" + uuid.uuid4().hex[:8]
    os.symlink(os.path.basename(target), tmp)
    aside = None
    if os.path.isdir(path) and not os.path.islink(path):
        aside = _new_version_path(path)
        os.rename(path, aside)
        os.utime(aside)
    os.replace(tmp, path)
    return aside


# How many of the newest version dirs survive GC beyond the writer's own
# keep-set. 2 = current + previous (the minimum the atomic-flip contract
# needs). Raise it to keep a time-travel horizon: every retained version
# is a full consistent table snapshot readable via read_table_version /
# diffable via diff_table_versions — hardlinked untouched buckets mean N
# retained versions cost far less than N copies.
UPSERT_RETAIN_VERSIONS = 2


def _gc_versions(path: str, keep: set[str], retain: int | None = None) -> None:
    """Delete replaced version dirs not in ``keep``, but only once they are
    older than a grace period — an in-flight reader that resolved the
    symlink just before a flip keeps a consistent file set until it is
    implausibly old. The ``retain`` newest versions (default
    UPSERT_RETAIN_VERSIONS) additionally survive as the time-travel
    horizon. Hardlinked files shared with live versions survive deletion
    by refcount."""
    if retain is None:
        retain = UPSERT_RETAIN_VERSIONS
    now = time.time()
    keep_real = {os.path.realpath(p) for p in keep}
    newest_first = [v for v, _ in list_versions(path)]
    for v in newest_first[retain:]:
        if os.path.realpath(v) in keep_real:
            continue
        try:
            if now - os.path.getmtime(v) < _GC_GRACE_SEC:
                continue
        except OSError:
            continue
        shutil.rmtree(v, ignore_errors=True)


def list_versions(path: str) -> list[tuple[str, float]]:
    """All snapshot versions of an upsert table, newest first, as
    (version_dir, mtime) — the table's time-travel catalog. Index 0 is
    (modulo an in-flight flip) the version the symlink targets."""
    out = []
    for v in _version_paths(path):
        try:
            out.append((v, os.path.getmtime(v)))
        except OSError:
            continue  # GC'd between listing and stat
    out.sort(key=lambda t: (-t[1], t[0]))
    return out


def _hardlink_dir(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        s = os.path.join(src, f)
        if os.path.isfile(s):
            os.link(s, os.path.join(dst, f))


def _write_meta(version_dir: str, num_buckets: int, keys: list[str]) -> None:
    with open(os.path.join(version_dir, _META_FILE), "w") as fh:
        json.dump({"buckets": num_buckets, "keys": keys}, fh)


def _read_meta(path: str) -> dict:
    target = _current_target(path) or path
    meta = os.path.join(target, _META_FILE)
    if os.path.isfile(meta):
        with open(meta) as fh:
            return json.load(fh)
    return {}


def _resolve(path: str) -> str:
    """Pin a read to the CURRENT version: resolving the symlink before
    planning means the query's file listing references the version
    directory itself, which the grace-period GC keeps alive — a flip
    mid-query cannot yank files out from under running tasks. Reading
    through the un-resolved symlink would re-resolve per file open."""
    return os.path.realpath(path) if os.path.islink(path) else path


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    # `_kb` is the internal bucket-partition column of the upsert layout —
    # never part of a table's logical schema (drop is a no-op elsewhere)
    return spark.read.parquet(_resolve(_table_path(root, name))).drop(
        _BUCKET_COL
    )


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


def _keep_first(merged: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_keep_one(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    name: str,
    order: list[Column],
    num_buckets: int | None = None,
) -> None:
    """K5/K6: upsert — merge incoming with existing, keep the first row per
    natural key under ``order`` (e.g. desc(height_tx) = keep latest).

    Cost is O(batch): only the key-hash buckets the batch touches are read
    (hive partition pruning on ``_kb``) and rewritten; every other bucket
    is carried into the next table version as hardlinks. The version flip
    is one atomic symlink rename (see the layout note at the top of this
    module). A legacy un-bucketed table is converted in one full rewrite on
    its first upsert, then stays incremental. On Delta this whole function
    is MERGE WHEN MATCHED UPDATE."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    exists = _exists(path)
    versioned = exists and os.path.islink(path)
    if num_buckets is None:
        num_buckets = UPSERT_BUCKET_COUNTS.get(name, UPSERT_BUCKETS)
    if versioned:
        num_buckets = _read_meta(path).get("buckets", num_buckets)
    batch = df.drop(_BUCKET_COL).withColumn(
        _BUCKET_COL, _bucket_expr(keys, num_buckets)
    )
    newver = _new_version_path(path)
    prev = _current_target(path)

    if not versioned:
        # fresh table, or one-time migration of a legacy plain directory
        merged = batch
        if exists:
            merged = (
                read_table(spark, root, name)
                .withColumn(_BUCKET_COL, _bucket_expr(keys, num_buckets))
                .unionByName(batch)
            )
        result = _keep_first(merged, keys, order)
        result.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(newver)
        _write_meta(newver, num_buckets, keys)
        aside = _flip_symlink(path, newver)  # renames a legacy dir aside
        keep = {newver} | ({aside} if aside else set())
        _gc_versions(path, keep=keep)
        return

    affected = sorted(
        r[0] for r in batch.select(_BUCKET_COL).distinct().collect()
    )
    if not affected:  # empty batch
        return
    # partition pruning: only the affected bucket directories are scanned;
    # read the pinned version dir, not the flippable symlink
    existing = spark.read.parquet(prev).filter(
        F.col(_BUCKET_COL).isin(affected)
    )
    result = _keep_first(existing.unionByName(batch), keys, order)
    stage = newver + ".__stage"
    result.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(stage)
    os.makedirs(newver)
    affected_dirs = {f"{_BUCKET_COL}={b}" for b in affected}
    for d in os.listdir(prev):  # untouched buckets ride along as hardlinks
        if d.startswith(_BUCKET_COL + "=") and d not in affected_dirs:
            _hardlink_dir(os.path.join(prev, d), os.path.join(newver, d))
    for d in os.listdir(stage):  # rewritten buckets move in
        if d.startswith(_BUCKET_COL + "="):
            os.rename(os.path.join(stage, d), os.path.join(newver, d))
    shutil.rmtree(stage)
    _write_meta(newver, num_buckets, keys)
    _flip_symlink(path, newver)
    _gc_versions(path, keep={newver, prev} if prev else {newver})


def read_table_version(
    spark: SparkSession, root: str, name: str, version: str | int
) -> DataFrame:
    """Time-travel read: a PAST snapshot of an upsert table. ``version``
    is a dir path from :func:`list_versions` or an index into that list
    (0 = newest). Every version dir is a complete consistent table (the
    flip is whole-version atomic), so this is a plain parquet read — the
    lake-table ``VERSION AS OF`` without a transaction log, bounded by
    UPSERT_RETAIN_VERSIONS. Raises IndexError/FileNotFoundError for a
    version the GC already reclaimed."""
    path = _table_path(root, name)
    if isinstance(version, int):
        version = list_versions(path)[version][0]
    if not os.path.isdir(version):
        raise FileNotFoundError(version)
    return spark.read.parquet(version).drop(_BUCKET_COL)


def diff_table_versions(
    spark: SparkSession,
    root: str,
    name: str,
    old: str | int,
    new: str | int = 0,
) -> DataFrame:
    """Change-data audit between two snapshots of an upsert table: one row
    per natural key whose state differs, tagged ``change_type`` in
    ('added', 'removed', 'changed'). The CDC readout the reference would
    get from a Postgres logical-replication slot — here it is derived,
    not logged: a full-outer join of the two snapshots on TABLE_KEYS
    comparing an md5 over the canonicalized non-key columns.

    Scale: both sides carry only (keys, 32-byte state hash) into the
    join — never full rows — and the join keys are the table's natural
    keys, so AQE can split any skew; unchanged keys (the overwhelming
    majority between adjacent micro-batch versions) drop out with a
    filter before anything is returned. Diffing adjacent versions could
    additionally prune to the buckets whose files differ (hardlinked
    untouched buckets are bit-identical by construction); kept
    whole-table here for version pairs arbitrarily far apart."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    versions = list_versions(path)
    if isinstance(old, int):
        old = versions[old][0]
    if isinstance(new, int):
        new = versions[new][0]
    o = spark.read.parquet(old).drop(_BUCKET_COL)
    n = spark.read.parquet(new).drop(_BUCKET_COL)
    val_cols = sorted(c for c in n.columns if c not in keys)

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        state = F.md5(
            F.to_json(F.struct(*[F.col(c) for c in val_cols]))
        )
        return df.select(*keys, state.alias(alias))

    j = hashed(o, "_h_old").join(hashed(n, "_h_new"), keys, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


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
        if name.startswith("."):  # hidden upsert version dirs / temp links
            continue
        src = os.path.join(snapshot_root, name)
        if not os.path.isdir(src):
            continue
        dst = _table_path(warehouse_root, name)
        if _exists(dst):
            continue
        df = spark.read.parquet(src)
        if _BUCKET_COL in df.columns:
            # snapshot of an upsert table: restore its bucketed versioned
            # layout so the first post-restore upsert stays O(batch)
            meta = _read_meta(src)
            newver = _new_version_path(dst)
            df.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(newver)
            _write_meta(
                newver,
                meta.get("buckets", UPSERT_BUCKETS),
                meta.get("keys", TABLE_KEYS.get(name, [])),
            )
            _flip_symlink(dst, newver)
        else:
            df.write.mode("overwrite").parquet(dst)
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
    df = spark.read.parquet(_resolve(path))
    # an upsert table compacts WITHIN its bucket layout (and carries its
    # meta forward) so partition pruning keeps working afterwards
    meta = _read_meta(path)
    if partition_cols is None and _BUCKET_COL in df.columns:
        partition_cols = [_BUCKET_COL]
    if partition_cols:
        out = df.repartition(target_partitions, *partition_cols)
    else:
        out = df.repartition(target_partitions)
    newver = _new_version_path(path)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(newver)
    if meta:
        _write_meta(newver, meta["buckets"], meta["keys"])
    prev = _current_target(path)
    aside = _flip_symlink(path, newver)
    keep = {newver} | ({prev} if prev else set()) | ({aside} if aside else set())
    _gc_versions(path, keep=keep)


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
        _resolve(_table_path(root, name))
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


def integrity_report(
    spark: SparkSession, root: str, tables: list[str] | None = None
) -> DataFrame:
    """Constraint audit over a warehouse: one row per (table, check) with
    its violation count — the after-the-fact twin of the Postgres
    constraints the reference's DDL declares (unique keys db.go:1654-1686,
    the commented-out FOREIGN KEYs db.go:359-389, ENUM domains
    db.go:340-350). Checks:

    - ``key_unique``     duplicate natural keys (TABLE_KEYS)
    - ``key_nulls``      rows with a NULL natural-key column
    - ``enum_domain``    values outside ENUM_DOMAINS
    - ``fk_orphans:<p>`` child keys with no parent row (TABLE_FKS);
                         NULL child keys are exempt, SQL-style

    Fully lazy: every check is a 1-row aggregate (uniqueness via one
    hash aggregate on the key, orphans via a left-anti join the optimizer
    is free to broadcast) unioned into a single DataFrame — collecting it
    runs all checks; at 100 TB each is a well-shaped distributed job, and
    a scheduled run of this IS the lake-warehouse answer to `ALTER TABLE
    .. ADD CONSTRAINT`. A healthy warehouse reports all zeros."""
    from allora_indexer_spark.schemas import TABLE_FKS

    present = {
        t
        for t in (tables if tables is not None else TABLE_KEYS)
        if _exists(_table_path(root, t))
    }
    checks: list[DataFrame] = []

    def add(table: str, check: str, cnt_df: DataFrame) -> None:
        checks.append(
            cnt_df.select(
                F.lit(table).alias("table"),
                F.lit(check).alias("check"),
                F.col("violations").cast("long").alias("violations"),
            )
        )

    for t in sorted(present):
        df = read_table(spark, root, t)
        keys = TABLE_KEYS[t]
        # Null-safe duplicate count: groupBy treats NULL as a regular group
        # value, so rows with NULL keys are counted as duplicates only when
        # they actually repeat.  (count_distinct drops any tuple containing
        # a NULL, which would misreport every NULL-key row as a duplicate
        # and conflate this check with key_nulls below.)
        add(
            t,
            "key_unique",
            df.groupBy(*[F.col(k) for k in keys])
            .agg(F.count("*").alias("cnt"))
            .agg(
                F.coalesce(
                    F.sum(F.col("cnt") - F.lit(1)), F.lit(0)
                ).alias("violations")
            ),
        )
        null_key = None
        for k in keys:
            c = F.col(k).isNull()
            null_key = c if null_key is None else (null_key | c)
        add(
            t,
            "key_nulls",
            df.agg(
                F.sum(F.when(null_key, 1).otherwise(0)).alias("violations")
            ),
        )
        if t in ENUM_DOMAINS:
            add(
                t,
                "enum_domain",
                enum_violations(df, t).agg(
                    F.count("*").alias("violations")
                ),
            )
        for child_cols, parent, parent_cols in TABLE_FKS.get(t, []):
            if parent not in present:
                continue
            child = df
            for c in child_cols:
                child = child.filter(F.col(c).isNotNull())
            pdf = read_table(spark, root, parent).select(
                *[
                    F.col(pc).alias(cc)
                    for cc, pc in zip(child_cols, parent_cols)
                ]
            ).distinct()
            orphans = child.join(pdf, child_cols, "left_anti")
            add(
                t,
                f"fk_orphans:{parent}",
                orphans.agg(F.count("*").alias("violations")),
            )

    if not checks:
        return spark.createDataFrame(
            [], "table string, check string, violations long"
        )
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def schema_diff(
    spark: SparkSession, root: str, name: str, batch: DataFrame
) -> dict[str, list[str]]:
    """Schema-drift preflight for K8 evolution: what would change if
    ``batch`` were appended to table ``name``? Returns {'added': [...],
    'missing': [...], 'retyped': ['col: old -> new', ...]} against the
    table's current (merged) schema. ``evolve_append`` applies additions
    and pads misses silently by design; this is the observability hook a
    pipeline calls first when drift should page a human instead — the
    lake twin of the reference's isColumnExist probe
    (/root/reference/db.go:1688-1708) surfaced as a report instead of an
    auto-ALTER."""
    path = _table_path(root, name)
    if not _exists(path):
        return {"added": sorted(batch.columns), "missing": [], "retyped": []}
    current = {
        f.name: f.dataType for f in read_table_evolved(spark, root, name).schema.fields
        if f.name != _BUCKET_COL
    }
    incoming = {f.name: f.dataType for f in batch.schema.fields}
    return {
        "added": sorted(set(incoming) - set(current)),
        "missing": sorted(set(current) - set(incoming)),
        "retyped": sorted(
            f"{c}: {current[c].simpleString()} -> {incoming[c].simpleString()}"
            for c in set(current) & set(incoming)
            if current[c] != incoming[c]
        ),
    }


def table_health(root: str) -> list[dict]:
    """File-layout health report per table: file count, total bytes, mean
    file size, and retained version count — the numbers that decide when
    to run ``compact`` (streaming ingest's many tiny appends are the
    classic small-file problem; a mean file size far below the HDFS/S3
    sweet spot means scans are paying per-file open cost). Pure local
    metadata walk — no Spark job, safe to run from a cron."""
    out = []
    if not os.path.isdir(root):
        return out
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if name.startswith(".") or not (
            os.path.isdir(path) or os.path.islink(path)
        ):
            continue
        target = _resolve(path)
        n_files, n_bytes = 0, 0
        for dirpath, _, files in os.walk(target):
            for f in files:
                if f.endswith(".parquet"):
                    n_files += 1
                    try:
                        n_bytes += os.path.getsize(os.path.join(dirpath, f))
                    except OSError:
                        pass
        if n_files == 0:
            continue
        out.append(
            {
                "table": name,
                "n_files": n_files,
                "total_bytes": n_bytes,
                "mean_file_bytes": n_bytes // n_files,
                "n_versions": len(_version_paths(path)),
            }
        )
    return out
