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

import contextlib
import json
import os
import random
import shutil
import time
import uuid
import warnings

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from allora_indexer_spark.plans.storage import (  # noqa: F401 — re-exports
    _ANY,
    _CAS_LOCK_FILE,
    _CURRENT_FILE,
    _MANIFESTS_DIR,
    ManifestConflictError,
    PosixManifestStorage,
    _atomic_write_json,
    _cas_section,
)
from allora_indexer_spark.schemas import (
    ENUM_DOMAINS,
    KEY_DERIVATIONS,
    TABLE_KEYS,
)

# The storage-backend seam (plans/storage.py): every `_CURRENT` read and
# every publish/flip goes through this object. Default is the POSIX
# backend; an object-store deployment swaps in an adapter with
# conditional-PUT semantics (InMemoryManifestStorage is the tested
# template) without touching any writer above the seam.
STORAGE = PosixManifestStorage()

# --- key-bucketed, versioned upsert layout (manifest flip) ----------------
#
# Upsert tables (K5/K6) are hive-partitioned on an internal column `_kb` =
# pmod(xxhash64(natural key), UPSERT_BUCKETS): every row of a key lives in
# exactly one bucket directory, so an upsert batch only has to merge-rewrite
# the buckets its keys hash into — O(batch), not O(table history), the
# parquet twin of the reference's per-row ON CONFLICT upsert
# (/root/reference/db.go:1118-1185, 1246-1350). Which files constitute the
# CURRENT table is decided by a MANIFEST: the table directory holds
#
#   _CURRENT                    the live manifest (one atomic file replace)
#   _manifests/v<hex>.json      manifest history = the time-travel catalog
#   _versions/v<hex>/_kb=N/…    data files written BY that version
#
# A write lands only the rewritten buckets as new files under its own
# version directory; every untouched bucket is CARRIED by reference — the
# new manifest simply keeps pointing at the older version's bucket path.
# Publishing is one single-file replace of `_CURRENT`, so concurrent
# readers see either the old or the new manifest in full, never a mix, and
# no data is ever copied, linked, or moved for a carry. Everything is
# plain files + one atomic single-object write — the layout works the same
# on POSIX and on object stores (S3-style single-PUT atomicity), unlike
# the symlink+hardlink flip it replaces (reference semantic parity: the
# store-agnostic ON CONFLICT upsert, /root/reference/db.go:1118-1185).
# WRITERS additionally serialize per table through `_table_lock` (reads
# never lock) — see the lock note below.
# Underscore-prefixed names are invisible to Spark's file listing, so a
# stray direct read of the table path sees no half-state. Replaced
# versions are garbage-collected per-bucket-directory after a grace period
# once no retained manifest references them. On Delta/Iceberg the whole
# section collapses into MERGE INTO + snapshot manifests; this is that
# contract on plain parquet.

UPSERT_BUCKETS = 32  # default; fixed per table at creation (stored in meta)
# Per-table overrides for deployment sizing: pick ~(table size / healthy
# rewrite quantum). At 100 TB the large event tables (scores/rewards) want
# thousands of buckets so one batch rewrites megabytes, not gigabytes; the
# two-row last_commit_values wants few. The count is read back from the
# table's manifest on every subsequent write, so resizing is an offline
# rewrite (compact into a new table), never a silent mismatch.
UPSERT_BUCKET_COUNTS: dict[str, int] = {
    "last_commit_values": 4,
}
_BUCKET_COL = "_kb"
_VERSIONS_DIR = "_versions"
_GC_GRACE_SEC = 60.0
# Compaction-cadence contract for manifest-layout APPEND tables: each
# non-empty micro-batch adds one manifest data entry; past this bound the
# writer warns (and table_health flags needs_compaction) until compact()
# folds the versions back to O(1) entries.
APPEND_MANIFEST_WARN = 64
# Lock-free (LOCK_MODE="none") growth envelope: with piggybacked GC
# skipped, `_manifests/` history files and `_versions/` dirs grow one per
# publish until vacuum() runs. Past this bound table_health raises its
# `needs_vacuum` flag. Sizing: under flock-mode piggybacked GC the soak
# plateaus around retention + (grace window x publish rate) ≈ 150 files
# at WARN=8; lock-free should vacuum well before ~2x that envelope.
HISTORY_VACUUM_WARN = 256

# Monotone manifest timestamp: os.replace + a strictly increasing counter
# keep (created, version) a total order even when two writes land within
# one clock tick.
_write_seq = 0

# Writer serialization. READS never lock (they pin a manifest and go), but
# two concurrent WRITERS would race the read-manifest → merge → publish
# window: the second `_CURRENT` flip wins wholesale and silently drops the
# first writer's bucket pointers. The reference gets this serialization for
# free from Postgres row locks (db.go's ON CONFLICT upserts run inside
# transactions); here every public writer takes a per-table mutex for the
# duration of its read-merge-publish cycle. Locally that is kernel
# flock(2) on a permanent lock file — held only by a live process, so a
# crashed holder's lock releases instantly and no staleness heuristic or
# reclaim exists at all; on an object store (no flock) the same contract
# is the CAS publish below: the writer records the manifest version its
# merge was based on and `_publish_manifest` refuses the flip if
# `_CURRENT` moved (conditional-PUT / ETag semantics), with the public
# writers retrying the whole read-merge-publish cycle on conflict.
_LOCK_FILE = ".__lock"
# How long a writer waits for the lock before erroring loudly. Generous
# on purpose: with flock (below) a lock is held ONLY by a live process —
# a crashed holder's lock releases instantly — so a long wait means a
# real writer is really working (e.g. a large compact), and waiting is
# the correct behavior. Per-call override: the ``lock_timeout`` parameter
# on compact/fold_appends/vacuum (a maintenance job that would rather
# fail fast than queue behind a multi-hour compact passes a short one).
_LOCK_TIMEOUT_SEC = 3600.0

# Writer-exclusion mode. "flock" (default) serializes writers per table
# through kernel flock(2) — the fast path: a merge never has to be
# redone. "none" disables the mutex entirely and relies on the CAS
# publish (ManifestConflictError + writer retry) for correctness — the
# mode an object-store deployment runs in, where flock does not exist
# and `_publish_manifest`'s conditional flip becomes a conditional PUT
# (If-Match on `_CURRENT`'s ETag). Correctness contract in "none" mode:
# lost updates on MANIFEST-layout tables are prevented by the version
# check; the one-time legacy migrations (plain dir / symlink layout →
# manifest) are NOT concurrency-safe without the mutex and should be
# run once under "flock" (or single-writer) before going lock-free;
# and writers SKIP their piggybacked GC (see _gc_after_publish) — space
# reclamation is vacuum()-only, run quiesced or with `grace` sized
# above the longest in-flight write.
LOCK_MODE = "flock"


@contextlib.contextmanager
def _table_lock(path: str, timeout: float | None = None):
    # The lock lives BESIDE the table (`<path>.__lock` in the parent), so
    # acquiring it never has to create or touch the table dir itself —
    # which may legitimately be a symlink (legacy layout), dangling
    # (crashed migration), or not exist yet (first write).
    #
    # Mutual exclusion is kernel flock(2) on the lock file, NOT the
    # file's existence: the kernel releases the lock the instant the
    # holding process dies, so there is no staleness heuristic, no
    # reclaim race, and no release race — the file itself is a permanent
    # harmless marker that is never deleted (deleting it would reopen an
    # unlink/reopen race between waiters). On an object store, where no
    # flock exists, the same seam becomes a conditional PUT / ETag check
    # on `_CURRENT` (optimistic concurrency) instead of a mutex.
    if LOCK_MODE == "none":
        # lock-free mode: correctness comes from the CAS publish alone
        yield
        return
    import fcntl

    if timeout is None:
        timeout = _LOCK_TIMEOUT_SEC
    parent = os.path.dirname(os.path.normpath(path)) or "."
    os.makedirs(parent, exist_ok=True)
    lock = os.path.normpath(path) + _LOCK_FILE
    fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    deadline = time.time() + timeout
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"{lock}: writer lock held past "
                        f"{timeout:.0f}s — another writer is "
                        "genuinely stuck (a crashed holder would have "
                        "released automatically)"
                    )
                time.sleep(0.05)
        yield
    finally:
        try:
            fcntl.flock(fd, fcntl.LOCK_UN)
        except OSError:
            pass
        os.close(fd)


def _table_path(root: str, name: str) -> str:
    return os.path.join(root, name)


def _manifest_read(path: str) -> dict | None:
    """The live manifest of a manifest-layout table, or None for a plain
    parquet directory / missing table. Delegates to the STORAGE seam."""
    return STORAGE.read_current(path)


def _new_version_id() -> str:
    return "v" + uuid.uuid4().hex[:12]


def _data_dirs(path: str, manifest: dict) -> list[str]:
    """Absolute data directories of a manifest, in stable label order."""
    return [
        os.path.join(path, rel)
        for _, rel in sorted(manifest["data"].items())
    ]


# How many times a public writer redoes its read-merge-publish cycle on
# conflict before giving up loudly. Conflicts are impossible under
# LOCK_MODE="flock" and rare under "none" (two writers racing the same
# table), so a small bound suffices.
_CAS_RETRIES = 8


def _publish_manifest(path: str, manifest: dict, expect=_ANY) -> None:
    """Write the manifest into history, then flip `_CURRENT` atomically.

    ``expect`` is the CAS guard: the version id of the manifest the
    writer's merge was based on (None = "there was no manifest"). When
    given, the flip happens only if `_CURRENT` still names that version;
    otherwise ManifestConflictError — the writer's merge is stale and
    blindly flipping would drop the other writer's pointers wholesale
    (the lost-update window the flock mutex closes on one host, closed
    here for hosts that share only the storage).

    EVERY flip — including the unconditional ``expect=_ANY`` form — runs
    inside `_cas_section`, so all `_CURRENT` writes serialize through one
    seam: an unconditional publish racing a conditional one cannot slip
    its flip between the CAS reader's check and the CAS writer's write
    (which would let the conditional flip silently overwrite it).

    Each published manifest records ``parent``: the version `_CURRENT`
    named at flip time. The parent chain IS the table's linearization
    (each link was verified — or observed — inside the critical
    section), which `list_versions` walks to order history even when
    wall clocks and per-process seq counters are incomparable across
    writer processes.

    The check-observe-stamp-flip itself lives behind the STORAGE seam
    (plans/storage.py) — POSIX by default, conditional-PUT on an object
    store; this wrapper only adds the per-process created/seq stamps."""
    global _write_seq
    _write_seq += 1
    manifest = dict(manifest)
    manifest["created"] = time.time()
    manifest["seq"] = _write_seq
    STORAGE.publish(path, manifest, expect)


def _retry_cas(fn):
    """Run a writer's read-merge-publish cycle, redoing it (against the
    freshly-flipped manifest) when another writer's publish wins the CAS.
    The backoff is jittered: two symmetric lock-free writers with equal
    cycle times would otherwise collide in lockstep across every attempt
    and fail spuriously."""
    for attempt in range(_CAS_RETRIES):
        try:
            return fn()
        except ManifestConflictError:
            if attempt == _CAS_RETRIES - 1:
                raise
            time.sleep(0.02 * (attempt + 1) * random.uniform(0.5, 1.5))


def _footer_row_count(d: str) -> int:
    """Total row count of the parquet files under ``d`` from their footers
    alone — a driver-local pyarrow metadata read (no Spark job). Bounded:
    called on a single just-written version dir (a handful of part files).
    On an object store this is the same handful of ranged footer GETs."""
    import pyarrow.parquet as pq

    total = 0
    for dirpath, _, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(dirpath, f)
                ).metadata.num_rows
    return total


def _plain_parquet_count(path: str) -> int:
    """Parquet-file count of a plain (pre-manifest) table dir, hive
    subdirs included — the PLAIN_CONVERT_FILES trigger probe. Bounded:
    only ever called while the dir is below ~the threshold (conversion
    fires the moment it crosses), so the walk touches O(threshold)
    entries."""
    n = 0
    for dirpath, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        n += sum(f.endswith(".parquet") for f in files)
    return n


def _exists(path: str) -> bool:
    if _manifest_read(path) is not None:
        return True
    if os.path.islink(path):
        return True  # legacy symlink-flip layout (pre-manifest revision)
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path):
        # plain parquet dir, an unlinked legacy bucket layout, or any
        # hive-partitioned plain dir (`topic_id=N/`, `cell=3/`, ... —
        # write_partitioned's recommended per-key layout): a root whose
        # only data lives under partition subdirs MUST still count as
        # existing, else write_insert_if_absent skips its probe and
        # every at-least-once replay re-admits already-written keys
        if entry.endswith(".parquet") or "=" in entry:
            return True
    return False


def _staging_dirs(path: str) -> list[str]:
    """Leftover migration staging dirs (`.{name}__mstage_*`) beside a
    table path, newest-mtime first."""
    parent, name = os.path.split(os.path.normpath(path))
    prefix = f".{name}__mstage_"
    if not os.path.isdir(parent):
        return []
    out = [
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(prefix)
    ]

    def mtime(d: str) -> float:
        # a rival process sweeping the same stale staging can delete it
        # between listdir and stat (LOCK_MODE="none" has no exclusion);
        # a vanished dir sorts oldest and is skipped by the caller
        try:
            return os.path.getmtime(d)
        except OSError:
            return 0.0

    out.sort(key=lambda d: -mtime(d))
    return out


def _move_aside_plain_entries(path: str) -> str:
    """One-time plain-dir → manifest conversion helper: move EVERY
    pre-manifest entry of the table root — parquet files, `_SUCCESS`,
    checksum droppings, AND hive partition subdirectories (`bucket=XX/`,
    `topic_id=N/` — a plain table is not guaranteed flat) — into a
    grace-retained ``_versions/legacy_*`` dir. Moving only root-level
    parquet would leave partition dirs orphaned at the root forever: never
    GC'd (the GC walks only `_versions/`), doubling storage, and visible
    to stray direct root reads as a stale snapshot. Internal manifest
    entries stay put."""
    keep = {_VERSIONS_DIR, _MANIFESTS_DIR, _CURRENT_FILE}
    aside = os.path.join(path, _VERSIONS_DIR, "legacy_" + uuid.uuid4().hex[:8])
    os.makedirs(aside, exist_ok=True)
    for f in list(os.listdir(path)):
        if f in keep:
            continue
        os.rename(os.path.join(path, f), os.path.join(aside, f))
    _touch_tree_top(aside)
    return aside


def _sweep_legacy_leftovers(path: str) -> None:
    """Repair a plain-dir conversion that crashed between the manifest
    flip and the move-aside: leftover plain root entries (parquet files /
    hive dirs that predate the manifest) are invisible to manifest
    readers but live outside the GC walk — sweep them into a
    grace-retained legacy dir. No-op when the root is clean. Called by
    every converter (_compact_locked, _write_keep_one_locked) so
    whichever writer touches the table next heals it."""
    if not os.path.isdir(path):
        return
    leftovers = [
        f
        for f in os.listdir(path)
        if f not in (_VERSIONS_DIR, _MANIFESTS_DIR, _CURRENT_FILE)
        and (f.endswith(".parquet") or "=" in f)
    ]
    if leftovers:
        _move_aside_plain_entries(path)


def _touch_tree_top(d: str) -> None:
    """Restart the GC grace clock on a renamed-in dir AND its immediate
    children: os.rename preserves the children's old mtimes, and
    _gc_versions ages entries INSIDE version dirs, so touching only the
    dir would leave its contents immediately reap-eligible."""
    os.utime(d)
    for entry in os.listdir(d):
        try:
            os.utime(os.path.join(d, entry))
        except OSError:
            pass


def _migrate_symlink_table(
    spark: SparkSession,
    path: str,
    meta_file: str = "_upsert_meta.json",
    meta_keys: tuple[str, ...] = ("buckets", "keys"),
) -> None:
    """One-time in-place conversion of a legacy symlink-flip table (the
    layout a previous revision of this module wrote: the table path is a
    symlink to a sibling ``.{name}__v<hex>`` version dir holding
    ``_kb=N`` hive dirs plus a meta json) into the manifest layout.
    Without this, ``_exists`` would miss the table and the first
    post-upgrade upsert would publish a manifest containing only its own
    batch — silently dropping every pre-upgrade row. Parameterized on the
    meta filename/keys so non-warehouse stores on the same layout (the
    streaming heavy-hitter store's ``_hh_meta.json`` with
    n_total/last_batch) migrate through the same code path.

    Crash safety: the COMPLETE new table (data version, `_manifests/`,
    `_CURRENT`) is staged in a sibling ``.{name}__mstage_*`` dir before
    anything is moved; the legacy version dirs (symlink target FIRST, so
    any interruption past the first move leaves the symlink dangling —
    an unambiguous migration-in-progress marker) are renamed into the
    staging's ``_versions/legacy_*``, then the symlink is removed and the
    staging renamed into place. Every crash point is recoverable: a
    dangling symlink or missing path beside a staged `_CURRENT` resumes
    the swap; a crash before any move leaves the legacy table fully
    intact (the orphan staging, which holds only redundant copies, is
    discarded on the next attempt). At no point can a writer observe a
    half-table: until the final rename the path is either the legacy
    symlink or absent-with-complete-staging, both recognized here before
    any writer consults ``_exists``."""
    staged = [
        s
        for s in _staging_dirs(path)
        if os.path.isfile(os.path.join(s, _CURRENT_FILE))
    ]
    dangling = os.path.islink(path) and not os.path.exists(path)
    if staged and (dangling or not os.path.lexists(path)):
        # resume a crashed swap: the newest fully-staged layout wins
        if os.path.lexists(path):
            os.remove(path)
        os.rename(staged[0], path)
        for s in _staging_dirs(path):
            shutil.rmtree(s, ignore_errors=True)
        # sweep legacy version dirs the crashed attempt had not yet moved
        # — otherwise they sit beside the table forever (the GC walks
        # only _versions/, and the table is no longer a symlink so no
        # later migration ever looks at them again)
        parent, name = os.path.split(os.path.normpath(path))
        for d in os.listdir(parent):
            if d.startswith(f".{name}__v"):
                aside = os.path.join(
                    path, _VERSIONS_DIR, "legacy_" + uuid.uuid4().hex[:8]
                )
                os.rename(os.path.join(parent, d), aside)
                _touch_tree_top(aside)
        _touch_tree_top(os.path.join(path, _VERSIONS_DIR))
        return
    if not os.path.islink(path):
        # migration already completed (or never needed): sweep any
        # staging dirs a finished/abandoned attempt left beside the
        # table — left in place, a stale COMPLETE staging would be
        # resurrected as the live table by the resume branch above if
        # the table dir were ever removed externally
        if os.path.exists(path):
            for s in _staging_dirs(path):
                shutil.rmtree(s, ignore_errors=True)
        return
    # discard stagings of attempts that crashed before moving anything —
    # the symlink target is intact, so they hold only redundant copies
    for s in _staging_dirs(path):
        shutil.rmtree(s, ignore_errors=True)
    target = os.path.realpath(path)
    meta: dict = {}
    mf = os.path.join(target, meta_file)
    if os.path.isfile(mf):
        with open(mf) as fh:
            meta = json.load(fh)
    df = spark.read.parquet(path)  # hive-infers _kb from the version dir
    bucketed = _BUCKET_COL in df.columns
    parent, name = os.path.split(os.path.normpath(path))
    staging = os.path.join(
        parent, f".{name}__mstage_" + uuid.uuid4().hex[:8]
    )
    ver = _new_version_id()
    verdir = os.path.join(staging, _VERSIONS_DIR, ver)
    writer = df.write.mode("overwrite")
    if bucketed:
        writer = writer.partitionBy(_BUCKET_COL)
    writer.parquet(verdir)  # eager: legacy files fully read before any move
    if bucketed:
        data = {
            d.split("=", 1)[1]: os.path.join(_VERSIONS_DIR, ver, d)
            for d in os.listdir(verdir)
            if d.startswith(_BUCKET_COL + "=")
        }
    else:
        data = {"all": os.path.join(_VERSIONS_DIR, ver)}
    manifest: dict = {"version": ver, "data": data}
    if bucketed:
        manifest["schema"] = _schema_json(df)
    for k in meta_keys:
        if k in meta:
            manifest[k] = meta[k]
    _publish_manifest(staging, manifest)  # staging is now a complete table
    prefix = f".{name}__v"
    # realpath-normalized: a symlinked parent component (/tmp on some
    # systems) would otherwise list the target under a second spelling
    # and the duplicate rename would raise mid-swap
    siblings = {
        os.path.realpath(os.path.join(parent, d))
        for d in os.listdir(parent)
        if d.startswith(prefix)
    }
    siblings.add(target)  # target may live outside the naming scheme
    # symlink target first: once it moves, the dangling link marks the
    # migration in progress and the recovery branch above can finish it
    for s in sorted(siblings, key=lambda s: s != target):
        aside = os.path.join(
            staging, _VERSIONS_DIR, "legacy_" + uuid.uuid4().hex[:8]
        )
        os.rename(s, aside)
        _touch_tree_top(aside)  # rename keeps OLD mtimes; restart grace clock
    os.remove(path)
    os.rename(staging, path)
    _gc_versions(path, keep={os.path.join(path, _VERSIONS_DIR, ver)})


def _schema_json(df: DataFrame) -> str:
    """The logical table schema a manifest pins (minus the internal `_kb`
    partition column, which data files never contain)."""
    from pyspark.sql.types import StructType

    return StructType(
        [f for f in df.schema.fields if f.name != _BUCKET_COL]
    ).json()


def _merged_schema_json(old_json: str | None, df: DataFrame) -> str:
    """Widen a manifest's pinned schema with any NEW columns ``df``
    carries (existing columns keep their recorded order and type — a
    batch is never allowed to silently narrow or retype the table)."""
    from pyspark.sql.types import StructType

    new_fields = [f for f in df.schema.fields if f.name != _BUCKET_COL]
    if not old_json:
        return StructType(new_fields).json()
    old = StructType.fromJson(json.loads(old_json))
    names = {f.name for f in old.fields}
    return StructType(
        list(old.fields) + [f for f in new_fields if f.name not in names]
    ).json()


def _bucket_expr(keys: list[str], num_buckets: int) -> Column:
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)
    ).cast("int")


# How many of the newest manifests survive GC beyond the writer's own
# keep-set. 2 = current + previous (the minimum the atomic-flip contract
# needs). Raise it to keep a time-travel horizon: every retained manifest
# is a full consistent table snapshot readable via read_table_version /
# diffable via diff_table_versions — carried-by-reference buckets mean N
# retained versions cost far less than N copies.
UPSERT_RETAIN_VERSIONS = 2


def list_versions(path: str) -> list[tuple[str, float]]:
    """All snapshot versions of a manifest table, newest first, as
    (manifest_file, created) — the table's time-travel catalog. Index 0
    is (modulo an in-flight flip) the manifest `_CURRENT` mirrors.

    Ordering is the PARENT CHAIN walked back from `_CURRENT` — the actual
    publish linearization recorded inside `_cas_section` — not wall-clock:
    two processes publishing within one clock tick have identical
    ``created`` and incomparable per-process ``seq``, so a timestamp sort
    could disagree with the CAS order (and with it GC retention and
    time-travel index 0). Manifests off the chain (pre-parent files, or
    orphans whose successor was GC'd) fall back to (created, seq),
    appended after the chain.

    ``mf`` in the returned tuples is the storage backend's opaque
    history entry id (POSIX: the manifest file's path) — valid input
    for :func:`read_table_version` and the storage history APIs."""
    # Read `_CURRENT` BEFORE listing history (ADVICE r9): the publish
    # persists the history entry before flipping `_CURRENT` inside the
    # CAS section, so a version observed here is guaranteed present in
    # the LATER listing. The reverse order would let a flip land between
    # the listing and this read, drop the live version from by_ver, and
    # silently collapse the whole chain walk to the timestamp fallback.
    cur = _manifest_read(path)
    by_ver: dict[str, tuple[str, float, int, str | None]] = {}
    for eid, m in STORAGE.list_history(path):
        by_ver[m.get("version", eid)] = (
            eid,
            float(m.get("created", 0.0)),
            m.get("seq", 0),
            m.get("parent"),
        )
    chain: list[str] = []
    v = cur.get("version") if cur is not None else None
    seen: set[str] = set()
    while v is not None and v in by_ver and v not in seen:
        seen.add(v)
        chain.append(v)
        v = by_ver[v][3]
    rest = sorted(
        (ver for ver in by_ver if ver not in seen),
        key=lambda ver: (-by_ver[ver][1], -by_ver[ver][2], by_ver[ver][0]),
    )
    return [(by_ver[v][0], by_ver[v][1]) for v in chain + rest]


def _load_manifest_file(mf: str) -> dict:
    """Load a history manifest by its opaque entry id (from
    :func:`list_versions`), via the storage seam."""
    return STORAGE.read_history(mf)


def _version_paths(path: str) -> list[str]:
    """All data version dirs of a manifest table (referenced or not)."""
    vdir = os.path.join(path, _VERSIONS_DIR)
    if not os.path.isdir(vdir):
        return []
    return [os.path.join(vdir, d) for d in os.listdir(vdir)]


def _gc_after_publish(path: str, keep: set[str]) -> None:
    """The GC writers piggyback on their publish. SKIPPED entirely under
    LOCK_MODE="none": piggybacked GC would run with no writer exclusion,
    and a rival writer's in-flight version whose files landed more than
    the grace period before its publish (big version, slow driver-side
    planning) could be reclaimed out from under it. Lock-free deployments
    reclaim space out-of-band with :func:`vacuum` instead — quiesced, or
    with ``grace`` sized above the longest in-flight write."""
    if LOCK_MODE == "none":
        return
    _gc_versions(path, keep=keep)


def _gc_versions(
    path: str,
    keep: set[str] | None = None,
    retain: int | None = None,
    grace: float | None = None,
) -> None:
    """Reclaim data directories no retained manifest references, but only
    once they are older than a grace period — an in-flight reader that
    loaded `_CURRENT` just before a flip keeps a consistent file set until
    it is implausibly old. The ``retain`` newest manifests (default
    UPSERT_RETAIN_VERSIONS) survive as the time-travel horizon; ``keep``
    pins additional data dirs (by path) or manifest files regardless of
    age. ``grace`` overrides _GC_GRACE_SEC (a lock-free vacuum sizes it
    above the longest in-flight write). Deletion granularity is the
    bucket directory: a version dir whose buckets are all still carried
    by live manifests keeps them and loses only the superseded ones."""
    if retain is None:
        retain = UPSERT_RETAIN_VERSIONS
    if grace is None:
        grace = _GC_GRACE_SEC
    keep = {os.path.realpath(p) for p in (keep or set())}
    now = time.time()
    manifests = list_versions(path)
    retained: list[dict] = []
    for idx, (mf, _) in enumerate(manifests):
        if idx < retain or os.path.realpath(mf) in keep:
            try:
                retained.append(_load_manifest_file(mf))
            except (OSError, ValueError, KeyError):
                # KeyError: the seam's read_history on an entry a rival
                # vacuum deleted between list and read (the memory/
                # object-store backend's listed-then-gone race) — same
                # skip semantics as a POSIX unlink race
                continue
    referenced = {
        os.path.realpath(os.path.join(path, rel))
        for m in retained
        for rel in m.get("data", {}).values()
    }
    # prune unreferenced, aged-out data dirs (per bucket directory). A
    # manifest may reference a whole VERSION dir (compact()'s {"all": ...}
    # layout) or individual bucket dirs inside one; an entry is live when
    # it IS a referenced path, lies INSIDE one (descendant of a whole-dir
    # reference), or CONTAINS one (ancestor of a referenced bucket dir).
    protected = referenced | keep

    def _live(rp: str) -> bool:
        return any(
            rp == k
            or rp.startswith(k + os.sep)
            or k.startswith(rp + os.sep)
            for k in protected
        )

    for vdir in _version_paths(path):
        if not os.path.isdir(vdir):
            continue
        if os.path.realpath(vdir) in protected:
            continue  # whole version dir referenced: nothing inside may go
        try:
            # the version dir's own mtime, captured BEFORE any deletion
            # below bumps it, joins the grace check: os.rename preserves
            # children's old mtimes, so a freshly moved-aside legacy dir
            # must shield its stale-mtime contents through the window
            vdir_mtime = os.path.getmtime(vdir)
        except OSError:
            continue
        for d in os.listdir(vdir):
            sub = os.path.join(vdir, d)
            rp = os.path.realpath(sub)
            if _live(rp):
                continue
            try:
                age_ref = max(os.path.getmtime(sub), vdir_mtime)
                if now - age_ref < grace:
                    continue
            except OSError:
                continue
            # version dirs of non-partitioned writes hold plain files
            # (_SUCCESS, part-*.parquet): rmtree no-ops on those, so
            # branch — otherwise superseded versions never empty out
            if os.path.isdir(sub):
                shutil.rmtree(sub, ignore_errors=True)
            else:
                try:
                    os.remove(sub)
                except OSError:
                    pass
        try:
            if not os.listdir(vdir):
                os.rmdir(vdir)
        except OSError:
            pass
    # prune manifest history beyond the retained horizon (entry ids are
    # backend-opaque; age/delete go through the storage seam)
    for mf, _ in manifests[retain:]:
        if os.path.realpath(mf) in keep:
            continue
        try:
            if now - STORAGE.history_age_ref(mf) < grace:
                continue
            STORAGE.delete_history(mf)
        except (OSError, KeyError):
            continue


def _read_meta(path: str) -> dict:
    """Bucket meta of an upsert table: {'buckets': N, 'keys': [...]} —
    sourced from the live manifest."""
    m = _manifest_read(path)
    if not m:
        return {}
    return {k: m[k] for k in ("buckets", "keys") if k in m}


def _read_manifest_data(
    spark: SparkSession, path: str, manifest: dict
) -> DataFrame:
    """Read the rows a manifest references. The `_kb` hive column is not
    inferred (each bucket dir is its own read root), which is exactly what
    the logical schema wants; writers that need `_kb` recompute it from
    the manifest's keys — bit-identical by construction.

    Bucketed (upsert) manifests carry the table's logical schema, written
    at publish time: pinning it here (a) skips footer sampling at plan
    time — one less listing+read round-trip per query against a
    many-versioned table — and (b) makes schema evolution safe under
    plain ``read_table``: buckets carried by reference from an older,
    narrower version read back with typed nulls for the newer columns
    instead of silently steering inference to whichever file was sampled
    first."""
    dirs = _data_dirs(path, manifest)
    sj = manifest.get("schema")
    schema = None
    if sj:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(sj))
    if len(dirs) > 1 and any(_has_hive_entries(d) for d in dirs):
        # a single multi-root read refuses mixed / multiple partitioned
        # roots even under an explicit schema — union per dir, pinning
        # the schema per root when recorded (which also pins hive
        # partition-value TYPES: '04' stays the string '04', never the
        # int 4 value inference would guess from an all-digit root)
        return _union_dirs(spark, dirs, schema=schema)
    if schema is not None:
        return spark.read.schema(schema).parquet(*dirs)
    return spark.read.parquet(*dirs)


def _has_hive_entries(d: str) -> bool:
    try:
        return any("=" in e for e in os.listdir(d))
    except OSError:
        return False


def _union_dirs(
    spark: SparkSession,
    dirs: list[str],
    merge_schema: bool = False,
    schema=None,
) -> DataFrame:
    """Per-dir read + unionByName for manifests whose data dirs a single
    multi-root read refuses: hive-partitioned version dirs (compact()
    with partition_cols) mixed with plain append dirs, or several
    partitioned roots outright. ``schema`` (the manifest's pinned logical
    schema) is applied per root, which also pins hive partition-value
    types against per-root inference. Bounded: append manifests hold at
    most ~APPEND_MANIFEST_WARN dirs between compactions, and AQE
    coalesces the per-dir scans."""

    def reader():
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        elif merge_schema:
            r = r.option("mergeSchema", "true")
        return r

    out = reader().parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(
            reader().parquet(d), allowMissingColumns=True
        )
    return out


def read_dir(spark: SparkSession, path: str) -> DataFrame:
    """Manifest-aware read of a standalone table DIRECTORY (streaming
    stores — rollups, ledgers, pair sets — that live outside a warehouse
    root): the manifest's file set when the dir has been compacted, a
    plain parquet read otherwise. Every reader of a dir that is also fed
    by :func:`_append_data` must come through here — a root read of a
    manifest dir sees nothing (underscore entries are invisible to
    Spark's listing)."""
    m = _manifest_read(path)
    if m is not None:
        return _read_manifest_data(spark, path, m)
    return spark.read.parquet(path)


def append_dir(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """Manifest-aware append to a standalone table directory — the public
    face of :func:`_append_data` for streaming stores, keeping append
    semantics correct across ``compact()`` runs."""
    with _table_lock(path):
        _append_data(df, path, partition_by)


def table_exists(root: str, name: str) -> bool:
    """Whether the table has any readable layout (manifest, legacy
    symlink, or plain parquet dir). The existence probe callers need to
    distinguish "table not created yet" from "read FAILED" — wrapping
    :func:`read_table` in a bare ``except Exception`` conflates the two,
    and a transient manifest/FS error then silently masquerades as an
    empty table (the streaming topic-id continuity bug class: batch-local
    ids restart at 1 and the idempotent anti-join drops the new rows)."""
    return _exists(_table_path(root, name))


def read_table(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a table, pinning manifest tables to the CURRENT version: the
    manifest is loaded once here, so the query's file listing references
    the version data dirs directly — a flip mid-query cannot yank files
    out from under running tasks (grace-period GC keeps them alive)."""
    path = _table_path(root, name)
    m = _manifest_read(path)
    if m is not None:
        return _read_manifest_data(spark, path, m).drop(_BUCKET_COL)
    return spark.read.parquet(path).drop(_BUCKET_COL)


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


def _keyed_default_range_by(path: str, columns) -> list[str] | None:
    """The probe-preserving layout default, single-sourced for compact
    AND fold: a KEYED append table with no chosen layout range-clusters
    on its monotone probe column — guarded on the column actually being
    present (a legacy dump or a transform() repair may lack it; the old
    flat rewrite must keep working there, not crash mid-conversion)."""
    name = os.path.basename(path.rstrip("/"))
    if name in TABLE_KEYS:
        pc = _prune_col(TABLE_KEYS[name])
        if pc in columns:
            return [pc]
    return None


def existing_keys_in_range(
    spark: SparkSession, df: DataFrame, root: str, name: str,
    span: tuple | None = None,
) -> DataFrame:
    """The bounded dedup probe for :func:`write_insert_if_absent`: existing
    natural keys restricted to the incoming batch's span on the table's
    monotone key column. Natural keys are non-null by construction
    (schemas.TABLE_KEYS), so the between() filter never drops a live key.

    ``span`` short-circuits the (lo, hi) aggregation when the caller
    already knows a bound that COVERS the batch's prune-column values —
    the streaming sinks pass the micro-batch's block-height span once for
    every height-derived table, saving ~3 local jobs per table per
    trigger. Over-covering is safe (the probe merely reads more);
    under-covering would silently re-admit keys, which is why callers may
    only pass spans for tables in ingest.BLOCK_HEIGHT_SPAN_TABLES (prune
    column provably equal to the feed's block height —
    tests/test_ingest.py pins the covering invariant)."""
    keys = TABLE_KEYS[name]
    pc = _prune_col(keys)
    lo, hi = span if span is not None else df.agg(F.min(pc), F.max(pc)).collect()[0]
    probe = read_table(spark, root, name)
    # read-side key migration (schemas.KEY_DERIVATIONS): a warehouse
    # written before a key column existed lacks it (AnalysisException on
    # the select below), and a mixed old/new plain dir can sample the new
    # schema and surface the old files' key as NULL — NULL keys vacate
    # the anti-join and replays re-admit rows. Derive absent keys, and
    # coalesce-present ones over the derivation so both shapes heal.
    for col, expr in KEY_DERIVATIONS.get(name, {}).items():
        if col not in probe.columns:
            probe = probe.withColumn(col, F.expr(expr))
        else:
            probe = probe.withColumn(
                col, F.coalesce(F.col(col), F.expr(expr))
            )
    if lo is not None:
        probe = probe.filter(F.col(pc).between(F.lit(lo), F.lit(hi)))
    return probe.select(*keys).distinct()


# Auto-maintenance: when an append pushes the manifest past
# APPEND_MANIFEST_WARN entries, the SAME locked write runs an
# incremental fold_appends (bounded: O(deltas since the last fold)) so
# batch tables cannot silently degrade when no out-of-band scheduler is
# running — the autovacuum analog, mirroring the streaming stores'
# self-fold cadence. The fold honors the table's recorded ``layout``
# (see compact/fold_appends), so a bucket-clustered store stays
# clustered. Set False to restore flag-and-warn-only behavior (an
# operator-scheduled maintenance window).
AUTO_FOLD_ON_APPEND = True

# Writer-side escalation for OPERATOR-LESS long runs: the bounded fold
# collapses raw deltas but accumulates one fold tier per cadence, so an
# unattended week-long backfill (nobody reading warnings, nobody running
# compact()) still degrades — measured in the 1,000-batch soak's
# kill-phase resume, where 200 operator-less batches piled up ~99
# manifest entries. Past AUTO_COMPACT_FACTOR x APPEND_MANIFEST_WARN live
# entries the append escalates its fold to an INLINE major compact (the
# autovacuum-without-a-DBA property: maintenance must not depend on an
# operator reading warnings). The major is O(table) but amortized: tiers
# reach the bound once per ~FACTOR x WARN^2 appends, and the rewrite
# applies the recorded layout — sizing included — or the keyed range_by
# default, so probe pruning comes back clustered. Set to 0/None to
# restore fold+warn-only behavior (an operator-scheduled major window).
AUTO_COMPACT_FACTOR = 4

# The same autovacuum property for tables that were NEVER compacted: all
# of the maintenance above keys off the manifest, and a plain parquet
# dir only becomes a manifest table through its first compact() — so a
# from-birth streaming table with no operator accumulates small files
# forever with NO maintenance at all. Once a KEYED table's plain dir
# exceeds this many parquet files, the append converts it inline (one
# compact — O(table), but the table is at most this many small files
# young, and it happens once per table lifetime). Scoped to
# schemas.TABLE_KEYS tables: standalone operator stores (ANN corpus,
# streaming ledgers) choose their own layouts and cadences, and a bare
# conversion would flatten e.g. a cell-partitioned corpus. 0/None
# disables.
PLAIN_CONVERT_FILES = 64


def _append_data(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    expect=_ANY,
) -> None:
    """Append rows to a table, manifest-aware. A plain parquet directory
    gets a plain ``mode("append")``; a table that has been converted to
    the manifest layout (``compact()`` does that to streaming-append
    tables) instead publishes the appended rows AS A NEW VERSION — the new
    files land under ``_versions/<ver>/`` and the next manifest carries
    every previous data dir by reference plus the new one. Appending at
    the table root of a manifest table would make the rows permanently
    invisible (``read_table`` reads only the manifest's dirs) — the silent
    data-loss bug this helper exists to prevent. Empty batches publish
    nothing (streaming replays are the common case).

    CAS: the version dir is written ONCE; a publish that loses the race
    (LOCK_MODE="none") only re-reads the manifest and re-points — pure
    appends commute, so no data is rewritten on retry. Callers whose
    SEMANTICS depend on the manifest state they probed (the anti-join in
    write_insert_if_absent) pass ``expect=`` the version id their probe
    was based on (None = "table had no manifest"); the publish is then a
    single attempt whose ManifestConflictError propagates, and the
    caller redoes the probe — appending under a fresh manifest here
    would silently re-admit keys the winner just landed. Plain (non-
    manifest) directories have no CAS at all: lock-free idempotent
    writers must convert to the manifest layout (one compact()) first."""
    m = _manifest_read(path)
    if m is None:
        if expect not in (_ANY, None):
            raise ManifestConflictError(
                f"{path}: manifest {expect!r} disappeared under a writer"
            )
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        if (
            AUTO_FOLD_ON_APPEND
            and PLAIN_CONVERT_FILES
            and os.path.basename(path.rstrip("/")) in TABLE_KEYS
            and _plain_parquet_count(path) > PLAIN_CONVERT_FILES
        ):
            # one-time inline conversion to the manifest layout (see
            # PLAIN_CONVERT_FILES): applies the keyed range_by default,
            # so the table emerges clustered AND under auto-maintenance
            _retry_cas(lambda: _compact_locked(df.sparkSession, path))
        return
    ver = _new_version_id()
    verdir = os.path.join(path, _VERSIONS_DIR, ver)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(verdir)
    if _footer_row_count(verdir) == 0:
        # fully-deduped replay (streaming's common case): no version
        # churn. Emptiness is decided AFTER the one write job from the
        # landed files' parquet footers — a driver-local metadata read —
        # instead of a df.isEmpty() pre-probe, which would execute the
        # batch's whole plan (anti-join shuffles run to completion even
        # under limit 1) a second time on every 5 s micro-batch. "All
        # keys already present" cannot be invalidated by a concurrent
        # publish (rows are only ever added), so no CAS check is needed.
        shutil.rmtree(verdir, ignore_errors=True)
        return

    def publish() -> int:
        cur = _manifest_read(path)
        if cur is None:  # manifest tables never revert to plain dirs
            raise ManifestConflictError(f"{path}: manifest disappeared")
        data = dict(cur["data"])  # every prior dir carried by reference
        data[ver] = os.path.join(_VERSIONS_DIR, ver)
        manifest = dict(cur)
        manifest.update(
            {
                "version": ver,
                "data": data,
                # pin (and widen) the logical schema: reads then never
                # depend on footer sampling order or hive partition-value
                # inference
                "schema": _merged_schema_json(cur.get("schema"), df),
            }
        )
        _publish_manifest(
            path,
            manifest,
            expect=cur["version"] if expect is _ANY else expect,
        )
        return len(data)

    n_entries = _retry_cas(publish) if expect is _ANY else publish()
    _gc_after_publish(path, keep={verdir})
    if n_entries > APPEND_MANIFEST_WARN:
        # every append on a compacted table adds one data-map entry, one
        # version dir, and one manifest-history file; left unchecked the
        # manifest itself becomes the small-file problem (O(appends) live
        # entries, O(appends^2) cumulative history bytes, and a GC walk
        # over every version dir per write). The incremental fold resets
        # the delta entries in O(deltas); with auto-maintenance off, the
        # warning is the loud signal that a compaction cadence was
        # forgotten (table_health flags the same bound).
        if AUTO_FOLD_ON_APPEND:
            m2 = _manifest_read(path)
            lay = (m2.get("layout") or {}) if m2 is not None else {}
            # None args resolve from the recorded layout inside the fold;
            # only a layout-less table falls back to the append's own
            # partitioning
            pb = None if lay else partition_by
            # record_layout=False: the append's own partition_by is a
            # per-fold SHAPING hint here, not an operator layout choice —
            # without the flag, automatic maintenance would CREATE a
            # durable {'by': 'fold'} record the operator never chose,
            # permanently pre-empting the probe-preserving range_by
            # default on keyed tables (probe_pruning stuck at
            # 'tiers_only' until a manual compact)
            _retry_cas(
                lambda: _fold_appends_locked(
                    df.sparkSession,
                    path,
                    partition_by=pb,
                    record_layout=False,
                )
            )
            m3 = _manifest_read(path)
            n_entries = len(m3["data"]) if m3 is not None else 0
            if (
                AUTO_COMPACT_FACTOR
                and n_entries > AUTO_COMPACT_FACTOR * APPEND_MANIFEST_WARN
            ):
                # the fold tiers themselves saturated the escalation
                # bound: run the major inline (see AUTO_COMPACT_FACTOR).
                # Argument-less => recorded layout (columns AND sizing)
                # or the keyed range_by default, so the rewrite restores
                # clustered probe pruning rather than flattening it. A
                # layout-record-less HIVE store (record_layout=False
                # means auto-folds never created one) must keep its
                # partition shape through the major too — a bare rewrite
                # would flatten e.g. a cell-partitioned ANN corpus and
                # silently kill its partition pruning — so the append's
                # own partition_by rides along; being a base rewrite, it
                # is honestly recorded with by="compact".
                _retry_cas(
                    lambda: _compact_locked(
                        df.sparkSession, path, partition_cols=pb
                    )
                )
                m4 = _manifest_read(path)
                n_entries = len(m4["data"]) if m4 is not None else 0
        if n_entries > APPEND_MANIFEST_WARN:
            # either auto-maintenance is off, or the fold tiers
            # themselves saturated the bound (one tier accumulates per
            # auto-fold, ~WARN appends each) — the bounded-work fold
            # cannot reduce further and the occasional O(table) major
            # compact is due. That is an operator/scheduler decision
            # (it would stall a 5 s micro-batch cadence), so the hook
            # escalates loudly instead of silently degrading — with the
            # exact call to run.
            warnings.warn(
                f"{path}: manifest carries {n_entries} data dirs "
                f"(> {APPEND_MANIFEST_WARN}); run compact(spark, "
                f"{path!r}, target_partitions=...) — per-append "
                "overhead grows with every version until then",
                RuntimeWarning,
                stacklevel=2,
            )


# Footer-stat high-watermark probe (round 17): per-file max of a table's
# prune column, read from parquet footers driver-side and cached on the
# file's (path, size, mtime) identity — a file is read at most once per
# process. Lets write_insert_if_absent PROVE "no existing row can share a
# key with this batch" (max existing prune value < batch span lo) and
# skip the anti-join probe entirely — the caught-up streaming case, where
# every batch's heights are strictly new. None = file has rows but no
# usable stats (no proof; caller falls back to the join).
_FOOTER_MAX_CACHE: dict = {}

# Footer-walk bound: past this many live files the proof is skipped and
# the pruned anti-join runs as before (maintenance folds keep streaming
# tables far below this; a years-deep unmaintained table must not turn
# the driver into a footer crawler).
_FOOTER_PROBE_MAX_FILES = 512

_NO_PROOF = object()


def _table_data_files(path: str) -> list | None:
    """Live .parquet files of the table at ``path`` (manifest data dirs
    when a manifest exists, else the plain dir) — None when unreadable."""
    m = _manifest_read(path)
    roots = (
        [os.path.join(path, d) for d in m["data"].values()]
        if m is not None
        else [path]
    )
    out = []
    try:
        for r in roots:
            if os.path.isfile(r):
                out.append(r)
                continue
            for dirpath, dirs, files in os.walk(r):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                out.extend(
                    os.path.join(dirpath, f)
                    for f in files
                    if f.endswith(".parquet")
                )
    except OSError:
        return None
    return out


def _prune_max_from_footers(path: str, pc: str):
    """Max value of ``pc`` across the table's live files, from footer
    stats alone. Returns _NO_PROOF when stats are unusable (missing
    column/statistics, too many files, unreadable), None when the table
    provably has no rows."""
    import pyarrow.parquet as pq

    files = _table_data_files(path)
    if files is None or len(files) > _FOOTER_PROBE_MAX_FILES:
        return _NO_PROOF
    best = None
    for f in files:
        try:
            st = os.stat(f)
        except OSError:
            return _NO_PROOF
        key = (f, st.st_size, st.st_mtime_ns)
        if key in _FOOTER_MAX_CACHE:
            v = _FOOTER_MAX_CACHE[key]
        else:
            v = None
            try:
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.schema.column(i).name: i
                    for i in range(md.num_columns)
                }
                if pc not in idx:
                    v = _NO_PROOF
                else:
                    for rg in range(md.num_row_groups):
                        g = md.row_group(rg)
                        if g.num_rows == 0:
                            continue
                        s = g.column(idx[pc]).statistics
                        if s is None or not s.has_min_max:
                            v = _NO_PROOF
                            break
                        v = s.max if v is None else max(v, s.max)
            except Exception:
                v = _NO_PROOF
            _FOOTER_MAX_CACHE[key] = v
        if v is _NO_PROOF:
            return _NO_PROOF
        if v is not None:
            best = v if best is None else max(best, v)
    return best


def write_insert_if_absent(
    spark: SparkSession, df: DataFrame, root: str, name: str,
    key_span: tuple | None = None,
) -> None:
    """K1/K4: append rows whose natural key is not present yet (the
    ON CONFLICT DO NOTHING analog). In-batch duplicates are collapsed first.

    The existing-side probe is range-pruned to the batch's key span (same
    ledger idiom as streaming/stream.py's continuous rollup), so per-append
    cost tracks batch size even against a years-deep table — an unpruned
    probe (worse, a broadcast of it) would grow without bound with table
    size. Join strategy is left to AQE: the pruned probe is usually small
    enough that AQE picks a broadcast on its own, with a safe fallback when
    it is not. Appends are manifest-aware (:func:`_append_data`), so the
    writer keeps its idempotence contract across ``compact()`` runs."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    batch = df.dropDuplicates(keys).persist()
    try:
        # lock spans probe + append: a concurrent writer landing the same
        # keys between the two would defeat the idempotence contract.
        # Under LOCK_MODE="none" the same contract comes from the CAS:
        # the basis version is captured BEFORE the probe and the publish
        # is conditional on it, so a concurrent writer landing rows
        # between probe and publish raises here and the whole
        # probe+append redoes against the winner's manifest — the
        # anti-join always ran against (a superset of) the state it
        # published over, which is what keeps keys exactly-once.
        def cycle() -> None:
            basis = _manifest_read(path)
            basis_ver = basis["version"] if basis is not None else None
            out = batch
            if _exists(path) and not _span_proves_absent(key_span):
                probe = existing_keys_in_range(
                    spark, batch, root, name, span=key_span
                )
                # the equi-join reorders output columns KEYS-FIRST; select
                # the batch's order back so every appended file carries
                # the same column order as the table-creating write — a
                # mixed-order plain dir makes the read's column order
                # depend on which footer gets listed first (values are
                # name-resolved and were always correct; the order was
                # nondeterministic)
                out = batch.join(probe, keys, "left_anti").select(
                    batch.columns
                )
            _append_data(out, path, expect=basis_ver)

        def _span_proves_absent(span: tuple | None) -> bool:
            # Footer high-watermark proof (see _prune_max_from_footers):
            # the caller's span covers every batch row's prune value
            # (BLOCK_HEIGHT_SPAN_TABLES covering invariant, pinned by
            # tests/test_ingest.py), the prune column is part of the
            # natural key, and every existing row's prune value is
            # PROVABLY below span lo — so no existing row can equal any
            # batch row's key and the anti-join is an identity. Runs
            # under the same table lock / CAS cycle as the probe it
            # replaces, against the exact current file set.
            if span is None or span[0] is None:
                return False
            mx = _prune_max_from_footers(path, _prune_col(keys))
            if mx is _NO_PROOF:
                return False
            return mx is None or mx < span[0]

        with _table_lock(path):
            _retry_cas(cycle)
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
    (the merge scan lists exactly those buckets' directories out of the
    manifest) and rewritten; every other bucket is carried into the next
    table version BY REFERENCE — the new manifest keeps pointing at the
    older version's bucket path, no copy, link, or move. Publishing is one
    atomic single-file replace of `_CURRENT` (see the layout note at the
    top of this module) — portable to object stores, unlike the
    symlink+hardlink flip it replaces. A legacy un-bucketed table is
    converted in one full rewrite on its first upsert, then stays
    incremental. On Delta this whole function is MERGE WHEN MATCHED
    UPDATE."""
    with _table_lock(_table_path(root, name)):
        # under LOCK_MODE="none" a lost CAS race redoes the whole merge
        # against the winner's manifest (optimistic concurrency)
        _retry_cas(
            lambda: _write_keep_one_locked(
                spark, df, root, name, order, num_buckets
            )
        )


def _write_keep_one_locked(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    name: str,
    order: list[Column],
    num_buckets: int | None = None,
) -> None:
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    _migrate_symlink_table(spark, path)  # no-op unless pre-manifest layout
    manifest = _manifest_read(path)
    if manifest is not None:
        # heal a conversion that crashed after its flip (see the
        # post-publish move-aside below / _compact_locked's twin)
        _sweep_legacy_leftovers(path)
    exists = manifest is not None or _exists(path)
    if num_buckets is None:
        num_buckets = UPSERT_BUCKET_COUNTS.get(name, UPSERT_BUCKETS)
    if manifest is not None:
        num_buckets = manifest.get("buckets", num_buckets)
    batch = df.drop(_BUCKET_COL).withColumn(
        _BUCKET_COL, _bucket_expr(keys, num_buckets)
    )
    ver = _new_version_id()
    verdir = os.path.join(path, _VERSIONS_DIR, ver)

    # Incremental upserts need a manifest whose data map is keyed by
    # bucket id; anything else (a plain dir, or the {"all": ...} / mixed
    # manifests compact()/appends publish on non-upsert tables) takes the
    # one-time full-rewrite migration below and stays incremental after.
    bucketed_manifest = (
        manifest is not None
        and "buckets" in manifest
        and all(k.isdigit() for k in manifest["data"])
    )

    if not bucketed_manifest:
        # fresh table, or one-time migration of a legacy plain directory /
        # non-bucketed manifest into the bucketed layout
        merged = batch
        aside = None
        if manifest is not None:
            merged = (
                _read_manifest_data(spark, path, manifest)
                .drop(_BUCKET_COL)
                .withColumn(_BUCKET_COL, _bucket_expr(keys, num_buckets))
                .unionByName(batch)
            )
        elif exists:
            merged = (
                spark.read.parquet(path)
                .drop(_BUCKET_COL)
                .withColumn(_BUCKET_COL, _bucket_expr(keys, num_buckets))
                .unionByName(batch)
            )
        result = _keep_first(merged, keys, order)
        result.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(
            verdir
        )
        data = {
            d.split("=", 1)[1]: os.path.join(_VERSIONS_DIR, ver, d)
            for d in os.listdir(verdir)
            if d.startswith(_BUCKET_COL + "=")
        }
        _publish_manifest(
            path,
            {
                "version": ver,
                "buckets": num_buckets,
                "keys": keys,
                "data": data,
                "schema": _schema_json(result),
            },
            expect=manifest["version"] if manifest is not None else None,
        )
        if manifest is None and exists:
            # move the legacy entries aside AFTER the manifest flip,
            # never before (same dance as _compact_locked): a crash
            # between move-aside and publish would leave a table with no
            # manifest AND no root files, which _exists reads as "never
            # created" — the next upsert would then publish only its own
            # batch and GC would reap the stranded legacy data (silent
            # total loss). Post-flip the root entries are invisible to
            # manifest readers, so a crash here only strands them; the
            # _sweep_legacy_leftovers call at the top of this function
            # (and _compact_locked's) reclaims them on the next write.
            # Rename keeps inodes: a reader holding open handles is
            # unaffected. The aside dir is pinned in this write's
            # keep-set and freshly touched so a zero-grace GC cannot
            # reap it from under an in-flight reader of the legacy
            # layout.
            aside = _move_aside_plain_entries(path)
        _gc_after_publish(path, keep={verdir} | ({aside} if aside else set()))
        return

    affected = sorted(
        r[0] for r in batch.select(_BUCKET_COL).distinct().collect()
    )
    if not affected:  # empty batch
        return
    # bucket pruning by construction: the merge scan lists ONLY the
    # affected buckets' data dirs out of the pinned manifest
    existing_dirs = [
        os.path.join(path, manifest["data"][str(b)])
        for b in affected
        if str(b) in manifest["data"]
    ]
    merged = batch
    if existing_dirs:
        reader = spark.read
        if manifest.get("schema"):
            from pyspark.sql.types import StructType

            reader = reader.schema(
                StructType.fromJson(json.loads(manifest["schema"]))
            )
        existing = (
            reader.parquet(*existing_dirs)
            .drop(_BUCKET_COL)
            .withColumn(_BUCKET_COL, _bucket_expr(keys, num_buckets))
        )
        merged = existing.unionByName(batch)
    result = _keep_first(merged, keys, order)
    result.write.mode("overwrite").partitionBy(_BUCKET_COL).parquet(verdir)
    data = dict(manifest["data"])  # untouched buckets carried by reference
    for d in os.listdir(verdir):  # rewritten buckets point at the new dir
        if d.startswith(_BUCKET_COL + "="):
            data[d.split("=", 1)[1]] = os.path.join(_VERSIONS_DIR, ver, d)
    _publish_manifest(
        path,
        {
            "version": ver,
            "buckets": num_buckets,
            "keys": keys,
            "data": data,
            "schema": _schema_json(result),
        },
        expect=manifest["version"],
    )
    _gc_after_publish(path, keep={verdir})


def seed_manifest_store(
    empty_df: DataFrame,
    path: str,
    layout: dict | None = None,
    extra: dict | None = None,
) -> None:
    """Create a brand-new manifest store as ONE atomic publish: seed data
    (normally an empty frame — the SCHEMA is the payload), optional
    recorded ``layout`` (so automatic folds keep the clustering the
    operator chose, exactly as a compact() would have recorded), and any
    ``extra`` app-level manifest keys (e.g. the rollup ledger's
    content_key_encoding) all flip together. This is the single seeding
    mechanism for stores that must be manifest tables FROM THEIR FIRST
    ROW (rollup ledgers, near-dup signature/pairs stores): a multi-step
    seed (plain write, then compact, then stamp) has crash windows that
    leave a plain dir a lock-free rival can race, or a manifest missing
    its markers. No-op if the store already has a manifest. A lost seed
    CAS reclaims its own version dir before retrying (a seed-loser dir
    is invisible to GC — no _gc_after_publish runs on the early-return
    path)."""

    def once() -> None:
        if _manifest_read(path) is not None:
            return  # a concurrent writer seeded first — nothing to do
        ver = _new_version_id()
        verdir = os.path.join(path, _VERSIONS_DIR, ver)
        empty_df.coalesce(1).write.mode("overwrite").parquet(verdir)
        m = dict(extra or {})
        m.update(
            {
                "version": ver,
                "data": {"all": os.path.join(_VERSIONS_DIR, ver)},
                "schema": empty_df.schema.json(),
            }
        )
        if layout:
            m["layout"] = layout
        try:
            _publish_manifest(path, m, expect=None)
        except ManifestConflictError:
            shutil.rmtree(verdir, ignore_errors=True)
            raise

    with _table_lock(path):
        _retry_cas(once)


def read_table_version(
    spark: SparkSession, root: str, name: str, version: str | int
) -> DataFrame:
    """Time-travel read: a PAST snapshot of an upsert table. ``version``
    is a manifest file path from :func:`list_versions` or an index into
    that list (0 = newest). Every manifest is a complete consistent table
    listing (the flip is whole-manifest atomic), so this is a plain
    parquet read of the paths it references — the lake-table ``VERSION AS
    OF`` without a transaction log, bounded by UPSERT_RETAIN_VERSIONS.
    Raises IndexError/FileNotFoundError for a version the GC already
    reclaimed."""
    path = _table_path(root, name)
    if isinstance(version, int):
        version = list_versions(path)[version][0]
    # no os.path.isfile pre-check: the version id is the storage seam's
    # OPAQUE history entry id (an 'key::version' string on the in-memory
    # conditional-PUT backend, a file path only on POSIX), so a
    # filesystem probe wrongly rejects every live version on non-POSIX
    # backends — the read itself raises for a GC-reclaimed version on
    # either backend (diff_table_versions already relied on exactly
    # that); normalize the in-memory backend's KeyError to the
    # documented FileNotFoundError
    try:
        m = _load_manifest_file(version)
    except KeyError as e:
        raise FileNotFoundError(version) from e
    return _read_manifest_data(spark, path, m).drop(_BUCKET_COL)


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

    Scale: between two BUCKETED manifests with the same bucket count,
    buckets whose manifest entries are IDENTICAL are bit-identical by
    construction (carry-by-reference — same path, same files), so only
    the buckets whose entries differ are read at all: diffing adjacent
    micro-batch versions costs O(changed buckets), not O(table). Both
    sides then carry only (keys, 32-byte state hash) into the join —
    never full rows — and the join keys are the table's natural keys, so
    AQE can split any skew; unchanged keys drop out with a filter before
    anything is returned."""
    keys = TABLE_KEYS[name]
    path = _table_path(root, name)
    versions = list_versions(path)
    if isinstance(old, int):
        old = versions[old][0]
    if isinstance(new, int):
        new = versions[new][0]
    om = _load_manifest_file(old)
    nm = _load_manifest_file(new)
    if (
        om.get("buckets")
        and om.get("buckets") == nm.get("buckets")
        and all(k.isdigit() for k in om["data"])
        and all(k.isdigit() for k in nm["data"])
    ):
        # bucket-pruned CDC: restrict both reads to the differing buckets
        changed = sorted(
            b
            for b in set(om["data"]) | set(nm["data"])
            if om["data"].get(b) != nm["data"].get(b)
        )
        if not changed:  # identical data maps: a no-op diff, typed empty
            return (
                _read_manifest_data(spark, path, nm)
                .drop(_BUCKET_COL)
                .select(*keys)
                .withColumn("change_type", F.lit(None).cast("string"))
                .limit(0)
            )
        om_pruned = {b: om["data"][b] for b in changed if b in om["data"]}
        nm_pruned = {b: nm["data"][b] for b in changed if b in nm["data"]}

        # a side whose changed buckets are all NEW on the other side
        # prunes to zero dirs — a zero-path parquet read is an error, so
        # stand in a typed empty relation (its rows all diff as
        # added/removed, which is exactly right). Built from the pinned
        # schema when recorded — no file listing; the full-manifest
        # limit(0) fallback only for pre-schema manifests.
        def _side(mm: dict, pruned: dict) -> DataFrame:
            if pruned:
                return _read_manifest_data(
                    spark, path, dict(mm, data=pruned)
                ).drop(_BUCKET_COL)
            if mm.get("schema"):
                from pyspark.sql.types import StructType

                return spark.createDataFrame(
                    [], StructType.fromJson(json.loads(mm["schema"]))
                )
            return (
                _read_manifest_data(spark, path, mm)
                .drop(_BUCKET_COL)
                .limit(0)
            )

        o = _side(om, om_pruned)
        n = _side(nm, nm_pruned)
    else:
        o = _read_manifest_data(spark, path, om).drop(_BUCKET_COL)
        n = _read_manifest_data(spark, path, nm).drop(_BUCKET_COL)
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
    # ascending raw-value tiebreaks mirror the BUILDERS' deterministic
    # same-height_tx survivor (ingest.scores/rewards/ema_scores): the
    # write-side merge must keep the same row the builder would, or a
    # replayed batch carrying a key whose height_tx ties the stored
    # row's could flip the survivor arbitrarily between runs
    "ema_scores": [
        ("height_tx", True), ("score_raw", False), ("is_active", False),
    ],
    "scores": [("height_tx", True), ("value_raw", False)],
    "rewards": [("height_tx", True), ("value_raw", False)],
}


def _order_cols(spec: list[tuple[str, bool]]) -> list[Column]:
    return [F.desc(c) if d else F.asc(c) for c, d in spec]


def _fk_levels(names) -> list[list[str]]:
    """Partition table names into FK dependency levels (schemas.TABLE_FKS
    restricted to the given set): level 0 has no in-set parents, level
    n+1 depends only on lower levels. Writing level-by-level preserves
    the parents-before-children crash contract while freeing every table
    WITHIN a level to write concurrently."""
    from allora_indexer_spark.schemas import TABLE_FKS

    names = list(names)
    if not names:  # empty batch dict: no levels, not max()-on-empty
        return []
    present = set(names)
    levels: dict[str, int] = {}

    def level(n: str, seen: tuple = ()) -> int:
        if n in levels:
            return levels[n]
        parents = {
            p
            for _, p, _ in TABLE_FKS.get(n, ())
            if p in present and p != n and p not in seen
        }
        lv = (
            0
            if not parents
            else 1 + max(level(p, seen + (n,)) for p in parents)
        )
        levels[n] = lv
        return lv

    for n in names:
        level(n)
    out: list[list[str]] = [[] for _ in range(max(levels.values()) + 1)]
    for n in names:  # keep the caller's dict order within each level
        out[levels[n]].append(n)
    return out


def write_tables(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    root: str,
    max_parallel: int = 8,
    key_spans: dict[str, tuple] | None = None,
) -> None:
    """Write a full build_tables() result idempotently. Parents before
    children per-TABLE (schemas.TABLE_FKS), which eliminates the
    reference's waitCreation FK retry loop (A4/T4) — every table is
    submitted to one shared pool and waits only on ITS OWN in-set
    parents, the engine's analog of the reference's 32-connection pool
    fanning block inserts out in parallel (README.md:76). This replaces
    the earlier level-barrier schedule (round-15 p90 cut): under
    barriers an unrelated table had to wait for the slowest member of
    every previous LEVEL, so the trigger's wall time was the sum of
    tier maxima; with per-table dependencies it is the longest actual
    FK chain. Tasks are submitted in topological order into a FIFO
    pool, so when a child starts its parents have already STARTED
    (finished or running — never queued behind it): parent waits cannot
    deadlock the pool. Per-table writer locks are per-path, so
    concurrent writes to DIFFERENT tables never contend; a failed write
    propagates (its children fail with it, and the streaming checkpoint
    retries the batch), preserving the parents-before-children crash
    contract: a child never commits unless its parents committed
    first."""
    os.makedirs(root, exist_ok=True)

    def _write(name: str) -> None:
        df = tables[name]
        if name in UPSERT_ORDER:
            write_keep_one(
                spark, df, root, name, _order_cols(UPSERT_ORDER[name])
            )
        else:
            write_insert_if_absent(
                spark, df, root, name,
                key_span=(key_spans or {}).get(name),
            )

    from allora_indexer_spark.schemas import TABLE_FKS

    present = set(tables.keys())
    # _fk_levels supplies the topological order AND the cycle-break: the
    # wait graph below keeps only FK edges that the level assignment
    # also honors (parent at a strictly lower level), so an FK cycle
    # degrades to same-level concurrency exactly as the old barrier
    # schedule did — raw-FK waits would deadlock the pool on a cycle
    # (A waiting on B's future while B waits on A's; round-15 review)
    tiers = _fk_levels(tables.keys())
    level = {n: i for i, tier in enumerate(tiers) for n in tier}
    parents = {
        n: {
            p
            for _, p, _ in TABLE_FKS.get(n, ())
            if p in present and p != n and level[p] < level[n]
        }
        for n in present
    }
    topo = [n for tier in tiers for n in tier]
    if not topo:  # empty batch dict: no-op, never a 0-worker pool
        return
    if len(topo) == 1:
        _write(topo[0])
        return

    from concurrent.futures import ThreadPoolExecutor

    futures: dict = {}

    def _write_after_parents(name: str) -> None:
        for p in parents[name]:
            futures[p].result()  # raises if the parent write failed
        _write(name)

    with ThreadPoolExecutor(
        max_workers=min(max_parallel, len(topo))
    ) as pool:
        for n in topo:
            futures[n] = pool.submit(_write_after_parents, n)
        for n in topo:
            futures[n].result()


# The reference finds the live backup through a `latest` pointer object in
# its S3 bucket (process_s3.go:90-111): the bucket holds dated snapshot
# prefixes plus one tiny object naming the current one, so publishing a new
# snapshot is upload-then-flip-pointer — never an in-place overwrite a
# half-restored reader could see. Same contract here: a snapshots root may
# hold many named snapshot dirs plus a `latest` file; the pointer write is
# a single atomic replace (single-PUT on an object store).
_LATEST_POINTER = "latest"


def publish_snapshot(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    snapshots_root: str,
    name: str,
) -> str:
    """S8 write side: materialize ``tables`` as a named snapshot under
    ``snapshots_root`` and atomically flip the `latest` pointer to it
    (the reference's backup upload + latest-object update,
    /root/reference/process_s3.go:90-111). A crash before the flip leaves
    the previous snapshot live and the half-written one unreferenced."""
    dest = os.path.join(snapshots_root, name)
    os.makedirs(snapshots_root, exist_ok=True)
    write_tables(spark, tables, dest)
    tmp = os.path.join(
        snapshots_root, f".{_LATEST_POINTER}.__tmp_" + uuid.uuid4().hex[:8]
    )
    with open(tmp, "w") as fh:
        fh.write(name)
    os.replace(tmp, os.path.join(snapshots_root, _LATEST_POINTER))
    return dest


def resolve_snapshot_root(snapshot_root: str) -> str:
    """Follow the `latest` pointer (if present) to the live snapshot dir;
    a plain snapshot dir without a pointer resolves to itself, so
    ``bootstrap_from_snapshot`` accepts both shapes."""
    p = os.path.join(snapshot_root, _LATEST_POINTER)
    if os.path.isfile(p):
        with open(p) as fh:
            name = fh.read().strip()
        if not name:
            # an empty pointer is a half-written/corrupt publish, not
            # "no pointer": resolving it to the snapshots ROOT would make
            # bootstrap_from_snapshot misread sibling snapshot dirs as
            # tables. The reference errors on an empty latest_backup.txt
            # (process_s3.go getLatestFileKey) — same contract here.
            raise ValueError(
                f"{p}: empty `latest` pointer file — refusing to treat "
                "the snapshots root as a snapshot"
            )
        resolved = os.path.join(snapshot_root, name)
        if not os.path.isdir(resolved):
            raise FileNotFoundError(
                f"{p} points at {name!r}, which does not exist under "
                f"{snapshot_root}"
            )
        return resolved
    return snapshot_root


def bootstrap_from_snapshot(
    spark: SparkSession, snapshot_root: str, warehouse_root: str
) -> list[str]:
    """S8 snapshot restore: seed an empty warehouse from a parquet snapshot
    before streaming starts (the reference's restoreBackupFromS3 +
    pg_restore, /root/reference/process_s3.go:30-149 — parallel parquet read
    replaces pg_restore -j). ``snapshot_root`` may be a snapshot dir or a
    snapshots ROOT carrying a `latest` pointer file (the reference's
    latest-object indirection, process_s3.go:90-111) — resolved here.
    Existing tables are left untouched so a restart after a partial
    bootstrap is safe. A snapshot of an upsert table (its dir carries a
    `_CURRENT` manifest) restores into the bucketed manifest layout so
    the first post-restore upsert stays O(batch)."""
    snapshot_root = resolve_snapshot_root(snapshot_root)
    os.makedirs(warehouse_root, exist_ok=True)
    restored = []
    for name in sorted(os.listdir(snapshot_root)):
        if name.startswith((".", "_")):  # hidden/internal entries
            continue
        src = os.path.join(snapshot_root, name)
        if not os.path.isdir(src):
            continue
        dst = _table_path(warehouse_root, name)
        if _exists(dst):
            continue
        src_manifest = _manifest_read(src)
        if src_manifest is not None and not (
            "buckets" in src_manifest and "keys" in src_manifest
        ):
            # manifest snapshot of a NON-upsert table (compact()'s
            # {"all": ...} layout carries no bucket meta): restore as a
            # plain parquet dir — the append writers handle it from there
            _read_manifest_data(spark, src, src_manifest).drop(
                _BUCKET_COL
            ).write.mode("overwrite").parquet(dst)
            restored.append(name)
            continue
        if src_manifest is not None:
            meta = {k: src_manifest[k] for k in ("buckets", "keys")}
            df = _read_manifest_data(spark, src, src_manifest).drop(
                _BUCKET_COL
            )
            ver = _new_version_id()
            verdir = os.path.join(dst, _VERSIONS_DIR, ver)
            (
                df.withColumn(
                    _BUCKET_COL, _bucket_expr(meta["keys"], meta["buckets"])
                )
                .write.mode("overwrite")
                .partitionBy(_BUCKET_COL)
                .parquet(verdir)
            )
            data = {
                d.split("=", 1)[1]: os.path.join(_VERSIONS_DIR, ver, d)
                for d in os.listdir(verdir)
                if d.startswith(_BUCKET_COL + "=")
            }
            _publish_manifest(
                dst,
                {
                    "version": ver,
                    "data": data,
                    "schema": _schema_json(df),
                    **meta,
                },
            )
        else:
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
    target_partitions: int | None = None,
    partition_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    transform=None,
    lock_timeout: float | None = None,
    range_by: list[str] | None = None,
) -> None:
    """Small-file compaction: streaming ingest appends a few rows per
    micro-batch, and a year of 5-second batches is millions of tiny files —
    the classic small-file problem that destroys scan throughput (every
    file is a task + an open/close). Rewrite the table at a target
    partition count (repartition by the layout key when given, so files
    align with bucket pruning). Publishing is the same atomic `_CURRENT`
    manifest flip as the upsert writer, so readers racing a compaction
    always see a full table; a plain parquet directory is converted to the
    manifest layout on its first compaction (its old files are moved
    aside and GC'd after the grace period). Run out-of-band, like
    VACUUM/OPTIMIZE.

    ``partition_cols`` lays files out as hive directories — directory-
    level pruning, but hive partition-VALUE inference types the column on
    read, which silently corrupts string columns whose values look
    numeric ('04' -> int 4 -> '4'). ``cluster_by`` instead keeps the
    column IN the data files and clusters+sorts rows by it, so parquet
    row-group min/max stats prune almost as well with none of the
    inference hazard — prefer it for string-typed layout keys (the LSH
    signature store's hex bucket). Mutually exclusive.

    ``transform`` (optional ``DataFrame -> DataFrame``) is applied to the
    table content before the rewrite — the repair hook for converting a
    LEGACY layout whose read needs normalization (e.g. re-padding a hive
    bucket column that partition-value inference mistyped: the plain-dir
    read here predates any manifest schema pin, so inference is
    unavoidable on the first conversion and only the caller knows the
    intended type).

    ``range_by`` RANGE-partitions on the key and sorts within each
    partition, so every output FILE covers a disjoint key span — the
    right mode for a monotone column (height): a height-range probe
    then prunes whole files, not just row groups. This is the DEFAULT
    for a keyed append table (schemas.TABLE_KEYS) when no layout is
    given or recorded: the idempotent writer's anti-join probe is
    range-pruned on the table's monotone key
    (:func:`existing_keys_in_range`), and a bare ``repartition(n)``
    rewrite round-robins rows so every post-compact file spans the FULL
    key range — min/max pruning dies and the O(batch) probe silently
    becomes O(table) (measured: 6 contiguous-span appends, one bare
    compact(4), every file's height span = the whole table).

    A recorded ``layout`` persists across plain compacts AND is now
    APPLIED by them (None means "keep what the operator chose" — both
    the auto-fold and an argument-less operator compact rely on it; a
    bare compact previously kept the layout metadata while physically
    flattening the rows). To deliberately FLATTEN a
    clustered/partitioned table, pass the explicit empty list
    (``cluster_by=[]``, ``partition_cols=[]`` or ``range_by=[]``): the
    rewrite is flat and the recorded layout is cleared, so auto-folds
    stop re-clustering deltas. For a KEYED append table the clearing is
    one-shot: with no recorded layout, the next argument-less compact
    or fold re-applies the probe-preserving ``range_by`` default (the
    O(batch) writer-probe contract outranks a standing flatten); pin an
    explicit ``cluster_by``/``partition_cols`` to choose a different
    durable layout instead.

    ``target_partitions=None`` (the default) resolves from the recorded
    layout's sizing, falling back to 1 — so a plain maintenance
    ``compact(spark, path)`` on a table recorded with
    ``{cluster_by: [...], target_partitions: 8}`` preserves BOTH the
    clustering and the sizing instead of silently rewriting (and
    re-recording) the table to 1 partition. An explicit value still wins
    and, being a base rewrite, is durably re-recorded."""
    if sum(map(bool, (partition_cols, cluster_by, range_by))) > 1:
        raise ValueError(
            "partition_cols, cluster_by and range_by are exclusive"
        )
    with _table_lock(path, timeout=lock_timeout):
        _retry_cas(
            lambda: _compact_locked(
                spark, path, target_partitions, partition_cols, cluster_by,
                transform, range_by,
            )
        )


def _compact_locked(
    spark: SparkSession,
    path: str,
    target_partitions: int | None = None,
    partition_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    transform=None,
    range_by: list[str] | None = None,
) -> None:
    # the explicit empty list is the layout-clearing sentinel (flatten +
    # forget); normalize to None so the rest treats it as "no layout key"
    reset_layout = partition_cols == [] or cluster_by == [] or range_by == []
    partition_cols = partition_cols or None
    cluster_by = cluster_by or None
    range_by = range_by or None
    _migrate_symlink_table(spark, path)  # no-op unless pre-manifest layout
    manifest = _manifest_read(path)
    if manifest is not None:
        # repair a conversion that crashed between the manifest flip and
        # the move-aside (shared with _write_keep_one_locked)
        _sweep_legacy_leftovers(path)
    meta = _read_meta(path)
    if manifest is not None:
        df = _read_manifest_data(spark, path, manifest)
    else:
        df = spark.read.parquet(path)
    if transform is not None:
        df = transform(df)
    if meta and _BUCKET_COL not in df.columns:
        df = df.withColumn(
            _BUCKET_COL, _bucket_expr(meta["keys"], meta["buckets"])
        )
    no_layout_args = (
        partition_cols is None and cluster_by is None and range_by is None
    )
    if no_layout_args and _BUCKET_COL in df.columns:
        partition_cols = [_BUCKET_COL]
    elif no_layout_args and not reset_layout:
        # an argument-less compact must not flatten a chosen layout:
        # apply the recorded one, else default a KEYED append table to
        # range-clustering on its monotone probe column — the layout
        # the idempotent writer's range-pruned anti-join depends on
        # (see compact()'s range_by note)
        lay = (manifest.get("layout") or {}) if manifest is not None else {}
        if lay:
            partition_cols = lay.get("partition_by")
            cluster_by = lay.get("cluster_by")
            range_by = lay.get("range_by")
        else:
            range_by = _keyed_default_range_by(path, df.columns)
    if target_partitions is None and manifest is not None:
        # an omitted target_partitions resolves from the recorded
        # layout's sizing WHATEVER columns were passed — a maintenance
        # compact, and equally an operator re-cluster that left sizing
        # unset, must not rewrite (and durably re-record) a table the
        # operator sized at N down to 1 partition
        target_partitions = (manifest.get("layout") or {}).get(
            "target_partitions"
        )
    if target_partitions is None:
        target_partitions = 1
    if partition_cols:
        out = df.repartition(target_partitions, *partition_cols)
    elif cluster_by:
        out = df.repartition(
            target_partitions, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    elif range_by:
        # disjoint per-FILE key spans: range shuffle + in-file sort, so
        # parquet footer min/max prunes whole files on the probe column
        out = df.repartitionByRange(
            target_partitions, *range_by
        ).sortWithinPartitions(*range_by)
    else:
        out = df.repartition(target_partitions)
    ver = _new_version_id()
    verdir = os.path.join(path, _VERSIONS_DIR, ver)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(verdir)
    if partition_cols and partition_cols[0] == _BUCKET_COL:
        data = {
            d.split("=", 1)[1]: os.path.join(_VERSIONS_DIR, ver, d)
            for d in os.listdir(verdir)
            if d.startswith(_BUCKET_COL + "=")
        }
    else:
        data = {"all": os.path.join(_VERSIONS_DIR, ver)}
    # carry APP-LEVEL manifest keys forward (everything outside the
    # structural keys this rewrite owns): stores ride state INSIDE the
    # manifest so it flips atomically with the data — the heavy-hitter
    # store's n_total/last_batch/batch_fps, the rollup ledger's
    # content_key_encoding. _append_data and _fold_appends_locked already
    # preserve them (dict(cur) + update); a full compact rebuilding from
    # scratch silently dropped them, so one out-of-band compact() on the
    # hh store would reset its count state — the exact loss the manifest
    # placement exists to prevent.
    m = {
        k: v
        for k, v in (manifest or {}).items()
        if k not in ("version", "data", "schema", "layout")
    }
    m.update({"version": ver, "data": data})
    if meta:
        m.update(meta)
    # compaction changes files, never content: carry the pinned logical
    # schema forward (or establish it from the compacted output)
    m["schema"] = _merged_schema_json(
        manifest.get("schema") if manifest is not None else None, out
    )
    # record the table's file LAYOUT so maintenance that runs without
    # the caller's arguments (the auto-fold in _append_data) keeps the
    # clustering/partitioning the operator chose — a bucket-clustered
    # signature store must never be flattened by an automatic fold. The
    # internal _kb bucketing is manifest-keyed, not a layout.
    # "by" records PROVENANCE: a compact-written layout means the BASE
    # was rewritten under it (probe pruning holds table-wide); a
    # fold-written one covers delta tiers only — table_health's
    # probe_pruning distinguishes the two
    if cluster_by:
        m["layout"] = {
            "cluster_by": cluster_by,
            "target_partitions": target_partitions,
            "by": "compact",
        }
    elif range_by:
        m["layout"] = {
            "range_by": range_by,
            "target_partitions": target_partitions,
            "by": "compact",
        }
    elif partition_cols and partition_cols != [_BUCKET_COL]:
        m["layout"] = {
            "partition_by": partition_cols,
            "target_partitions": target_partitions,
            "by": "compact",
        }
    elif reset_layout:
        pass  # operator flattened the table: drop the recorded layout
    elif manifest is not None and "layout" in manifest:
        m["layout"] = manifest["layout"]
    _publish_manifest(
        path, m,
        expect=manifest["version"] if manifest is not None else None,
    )
    aside = None
    if manifest is None and os.path.isdir(path):
        # one-time conversion of a plain dir (same dance as
        # write_keep_one) — AFTER the manifest flip, never before: a
        # crash between move-aside and publish would leave a table with
        # no manifest AND no root files, which _exists reads as "never
        # created" (the idempotent writer would then re-admit every key
        # and the streaming topic numbering would restart — data loss).
        # Post-flip the root entries are invisible to manifest readers,
        # so a crash here only strands them; the sweep at the top of
        # this function reclaims the leftovers on the next compact.
        aside = _move_aside_plain_entries(path)
    _gc_after_publish(path, keep={verdir} | ({aside} if aside else set()))


def fold_appends(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
    cluster_by: list[str] | None = None,
    lock_timeout: float | None = None,
    range_by: list[str] | None = None,
) -> bool:
    """Incremental compaction of a manifest-layout APPEND table: fold
    ONLY the version dirs appended since the last compact/fold into one
    new version, carrying the base ``"all"`` entry by reference — cost is
    O(deltas since last fold), never O(table), which is what makes a
    per-N-batches cadence affordable when the base holds a 100 TB store
    (a full :func:`compact` there re-writes everything). Returns False
    for a plain (non-manifest) directory — callers convert those with
    one full ``compact()`` first — and True otherwise, including the
    nothing-to-fold case. Same atomic `_CURRENT` flip; a crash leaves
    the previous manifest live."""
    if sum(map(bool, (partition_by, cluster_by, range_by))) > 1:
        raise ValueError(
            "partition_by, cluster_by and range_by are exclusive"
        )
    with _table_lock(path, timeout=lock_timeout):
        return _retry_cas(
            lambda: _fold_appends_locked(
                spark, path, partition_by, target_partitions, cluster_by,
                range_by,
            )
        )


def _fold_appends_locked(
    spark: SparkSession,
    path: str,
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
    cluster_by: list[str] | None = None,
    range_by: list[str] | None = None,
    record_layout: bool = True,
) -> bool:
    m = _manifest_read(path)
    if m is None:
        return False
    explicit_cols = (
        partition_by is not None
        or cluster_by is not None
        or range_by is not None
    )
    want_keyed_default = False
    if not explicit_cols:
        # argument-less folds (incl. the auto-fold) maintain the recorded
        # layout — a clustered store must never be flattened by cadence
        # maintenance. An EXPLICIT target_partitions still wins (the
        # caller is sizing this ONE fold's output; only unset values
        # resolve from the layout, and a fold never writes its sizing
        # back into the record).
        lay = m.get("layout") or {}
        partition_by = lay.get("partition_by")
        cluster_by = lay.get("cluster_by")
        range_by = lay.get("range_by")
        if target_partitions is None:
            target_partitions = lay.get("target_partitions")
        # same keyed-table default as _compact_locked: a never-compacted
        # keyed table's auto-fold must not flatten the contiguous delta
        # spans its own probe pruning relies on (applied after the delta
        # frame is built — the default is column-guarded)
        want_keyed_default = not lay
    if target_partitions is None:
        target_partitions = 1
    # tiering: raw per-batch deltas fold at the cadence; prior FOLD
    # outputs ("fold_*") and the compact base ("all") are carried by
    # reference, never re-read — so each fold costs O(deltas since the
    # LAST FOLD), not O(everything since the last full compact). Fold
    # entries accumulate one per cadence; table_health's needs_compaction
    # bound is the signal to run the occasional full compact() that
    # resets them (the LSM minor/major compaction split).
    carried = {
        k: rel
        for k, rel in m["data"].items()
        if k == "all" or k.startswith("fold_")
    }
    deltas = {k: rel for k, rel in m["data"].items() if k not in carried}
    if len(deltas) < 2:
        return True  # manifest-managed and already folded tight
    # Read the deltas under the manifest's PINNED schema when one is
    # recorded: _append_data widens it on every append, so it covers all
    # deltas, and pinning also fixes hive partition-value TYPES — folding
    # a partition_by append table whose values look numeric with per-root
    # inference would retype them ('04' -> int 4) in the fold output, the
    # exact corruption compact()'s docstring defends against. mergeSchema
    # remains only as the fallback for pre-schema manifests.
    ddirs = _data_dirs(path, dict(m, data=deltas))
    sj = m.get("schema")
    schema = None
    if sj:
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(sj))
    if len(ddirs) > 1 and any(_has_hive_entries(d) for d in ddirs):
        df = _union_dirs(
            spark, ddirs, merge_schema=schema is None, schema=schema
        )
    elif schema is not None:
        df = spark.read.schema(schema).parquet(*ddirs)
    else:
        df = spark.read.option("mergeSchema", "true").parquet(*ddirs)
    if want_keyed_default:
        range_by = _keyed_default_range_by(path, df.columns)
    if partition_by:
        df = df.repartition(target_partitions, *partition_by)
    elif cluster_by:
        # cluster+sort instead of hive dirs: row-group stats prune, and
        # the layout key stays a typed data column (see compact's note)
        df = df.repartition(
            target_partitions, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    elif range_by:
        # disjoint per-file key spans (see compact's range_by note)
        df = df.repartitionByRange(
            target_partitions, *range_by
        ).sortWithinPartitions(*range_by)
    else:
        df = df.repartition(target_partitions)
    ver = _new_version_id()
    verdir = os.path.join(path, _VERSIONS_DIR, ver)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(verdir)
    data = dict(carried)
    data["fold_" + ver] = os.path.join(_VERSIONS_DIR, ver)
    manifest = dict(m)
    manifest.update(
        {
            "version": ver,
            "data": data,
            "schema": _merged_schema_json(m.get("schema"), df),
        }
    )
    # layout recording is compact's job (a compact rewrites the BASE
    # under the layout; a fold only shapes delta tiers): folds carry the
    # existing record forward untouched — never overwriting its sizing
    # with a one-off override — and only CREATE a record when the caller
    # chose explicit columns on a record-less table, marked "by": "fold"
    # so table_health knows the base was not rewritten under it. The
    # keyed default is derived fresh each fold and never recorded.
    # record_layout=False (the auto-fold in _append_data) downgrades
    # explicit columns to a per-fold shaping hint: automatic maintenance
    # must never create durable layout records the operator did not
    # choose (on a keyed table such a record would also pre-empt the
    # probe-preserving range_by default).
    if record_layout and explicit_cols and "layout" not in m:
        if cluster_by:
            manifest["layout"] = {"cluster_by": cluster_by, "by": "fold"}
        elif range_by:
            manifest["layout"] = {"range_by": range_by, "by": "fold"}
        elif partition_by:
            manifest["layout"] = {"partition_by": partition_by, "by": "fold"}
    _publish_manifest(path, manifest, expect=m["version"])
    _gc_after_publish(path, keep={verdir})
    return True


def vacuum(
    path: str,
    retain: int | None = None,
    lock_timeout: float | None = None,
    grace: float | None = None,
) -> None:
    """Out-of-band space reclamation for a manifest table: run the same
    grace-period / retention GC the writers piggyback on their publishes
    — for tables that have STOPPED receiving writes (a table's superseded
    versions otherwise linger until its next write). ``retain`` overrides
    UPSERT_RETAIN_VERSIONS for this pass (e.g. ``retain=1`` keeps only
    the current snapshot). Takes the writer lock: vacuuming concurrently
    with a writer could delete the version a mid-cycle publish is about
    to carry by reference. Under LOCK_MODE="none" the lock is a no-op and
    vacuum is the ONLY reclamation path (writers skip piggybacked GC
    entirely — see _gc_after_publish): run it quiesced, or pass ``grace``
    sized above the longest in-flight write so a slow rival's unpublished
    version cannot be reclaimed."""
    with _table_lock(path, timeout=lock_timeout):
        _gc_versions(path, retain=retain, grace=grace)


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
    rewrite, no downtime; on Delta this is mergeSchema=true on write.
    Manifest-aware: on a compacted table the widened batch is published
    as a new version (:func:`_append_data`), never a root-path append."""
    path = _table_path(root, name)
    with _table_lock(path):
        if _exists(path):
            current = read_table_evolved(spark, root, name).schema
            for field in current.fields:
                if field.name not in df.columns:
                    df = df.withColumn(
                        field.name, F.lit(None).cast(field.dataType)
                    )
        _append_data(df, path)


def read_table_evolved(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read a table whose files may predate newer columns (mergeSchema)."""
    path = _table_path(root, name)
    m = _manifest_read(path)
    if m is not None:
        dirs = _data_dirs(path, m)
        if len(dirs) > 1 and any(_has_hive_entries(d) for d in dirs):
            return _union_dirs(spark, dirs, merge_schema=True)
        return spark.read.option("mergeSchema", "true").parquet(*dirs)
    return spark.read.option("mergeSchema", "true").parquet(path)


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
        if name.startswith((".", "_")) or not os.path.isdir(path):
            continue
        m = _manifest_read(path)
        roots = _data_dirs(path, m) if m is not None else [path]
        n_files, n_bytes = 0, 0
        for r in roots:
            for dirpath, _, files in os.walk(r):
                for f in files:
                    if f.endswith(".parquet"):
                        n_files += 1
                        try:
                            n_bytes += os.path.getsize(
                                os.path.join(dirpath, f)
                            )
                        except OSError:
                            pass
        if n_files == 0:
            continue
        n_entries = len(m["data"]) if m is not None else 0
        # count history through the STORAGE seam — an os.listdir here
        # would always see 0 on a non-POSIX backend (silencing the
        # lock-free needs_vacuum flag this report exists to raise) and
        # miscount .__tmp_* partials as history on POSIX. count_history
        # is a name count (one listdir), NOT the parse-every-manifest
        # listing: in lock-free mode history grows O(appends), and a
        # cron health check must not read hundreds of MB of manifest
        # JSON to produce one integer
        n_history = STORAGE.count_history(path)
        n_versions = len(_version_paths(path))
        # bucketed upsert manifests hold exactly `buckets` entries by
        # construction — growth-by-append only afflicts append manifests
        bucketed = (
            m is not None
            and "buckets" in m
            and all(k.isdigit() for k in m["data"])
        )
        # probe-pruning status for KEYED append tables: the idempotent
        # writer's anti-join probe stays O(batch) only while min/max
        # stats on the prune column actually skip files.
        #   "natural"   — no compacted "all" base: raw deltas carry
        #                 contiguous spans by construction and fold tiers
        #                 ride the keyed range_by default;
        #   "clustered" — a COMPACT-written layout covers the prune
        #                 column, so the base itself was rewritten under
        #                 it (layout "by" provenance; legacy records
        #                 without the marker were compact-written);
        #   "tiers_only"— a fold-created layout covers the column but the
        #                 "all" base predates it and stays flat — probes
        #                 still scan the whole base;
        #   "degraded"  — an "all" base exists with no covering layout.
        # Fix for the last two: one bare compact().
        probe_pruning = None
        if name in TABLE_KEYS and not bucketed:
            pc = _prune_col(TABLE_KEYS[name])
            lay = (m.get("layout") or {}) if m is not None else {}
            laid = (
                lay.get("range_by")
                or lay.get("cluster_by")
                or lay.get("partition_by")
                or []
            )
            covered = pc in laid
            base_rewritten = covered and lay.get("by", "compact") == "compact"
            has_all = m is not None and "all" in m["data"]
            if not has_all:
                probe_pruning = "natural"
            elif base_rewritten:
                probe_pruning = "clustered"
            elif covered:
                probe_pruning = "tiers_only"
            else:
                probe_pruning = "degraded"
        out.append(
            {
                "table": name,
                "n_files": n_files,
                "total_bytes": n_bytes,
                "mean_file_bytes": n_bytes // n_files,
                "n_versions": n_versions,
                "manifest_entries": n_entries,
                "manifest_history": n_history,
                # the compaction-cadence flag: appends past the bound mean
                # per-write overhead is growing — schedule compact()
                "needs_compaction": (
                    not bucketed and n_entries > APPEND_MANIFEST_WARN
                ),
                # lock-free deployments skip the piggybacked GC, so
                # history files and superseded version dirs grow
                # O(appends) until an operator runs vacuum() — surface
                # the growth instead of letting it silently accumulate
                # (ADVICE r9). In flock mode the publish-time GC bounds
                # both, so the flag stays off.
                "needs_vacuum": (
                    LOCK_MODE == "none"
                    and (
                        n_history > HISTORY_VACUUM_WARN
                        or n_versions > HISTORY_VACUUM_WARN
                    )
                ),
                "probe_pruning": probe_pruning,
            }
        )
    return out
