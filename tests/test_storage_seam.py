"""The storage-backend seam (plans/storage.py, verdict r8/r9 #4): the
CAS publish contract must hold identically on the POSIX backend (flock
micro-lock + os.replace) and on the in-memory conditional-PUT fake (the
object-store adapter template) — and the fake's deterministic conflict
injector must exercise the exact lost-update window flock-based tests can
only hit probabilistically.

Reference semantic: Postgres ON CONFLICT serialization
(/root/reference/db.go:1118-1185) — the seam is where that contract binds
to a storage system instead of a database.
"""

from __future__ import annotations

import os
import threading

import pytest

from allora_indexer_spark.plans import storage, warehouse


def _mem(monkeypatch) -> storage.InMemoryManifestStorage:
    st = storage.InMemoryManifestStorage()
    monkeypatch.setattr(warehouse, "STORAGE", st)
    return st


# ---------------------------------------------------------------------------
# Contract equivalence across backends
# ---------------------------------------------------------------------------


def test_seam_contract_equivalent(tmp_path, seam_backend):
    """read_current/publish/conflict behave identically on both backends:
    fresh table → None; _ANY publish lands; expect-guarded publish flips;
    stale expect raises; expect=None means 'no manifest yet'."""
    path = str(tmp_path / "t")
    os.makedirs(path)
    assert warehouse._manifest_read(path) is None
    warehouse._publish_manifest(path, {"version": "v0", "data": {}})
    assert warehouse._manifest_read(path)["version"] == "v0"
    warehouse._publish_manifest(
        path, {"version": "v1", "data": {"a": "x"}}, expect="v0"
    )
    m = warehouse._manifest_read(path)
    assert m["version"] == "v1" and m["data"] == {"a": "x"}
    with pytest.raises(storage.ManifestConflictError, match="v1"):
        warehouse._publish_manifest(
            path, {"version": "v2", "data": {}}, expect="v0"
        )
    with pytest.raises(storage.ManifestConflictError):
        warehouse._publish_manifest(
            path, {"version": "v2", "data": {}}, expect=None
        )
    # created/seq stamps ride through the seam unchanged
    assert "created" in m and "seq" in m and m["parent"] == "v0"


def test_conflict_error_is_warehouse_conflict_error():
    """The exception class re-exported by warehouse must BE the storage
    one — writers catching warehouse.ManifestConflictError must see
    conflicts raised by any backend."""
    assert warehouse.ManifestConflictError is storage.ManifestConflictError


# ---------------------------------------------------------------------------
# Deterministically losable conditional PUT (memory backend only — the
# interleave window cannot be scheduled deterministically with flock)
# ---------------------------------------------------------------------------


def test_memory_backend_deterministic_lost_put(tmp_path, monkeypatch):
    """A rival flip lands INSIDE the publish critical section, before the
    If-Match check: the conditional publish must lose loudly, and
    _retry_cas must then converge with both updates intact."""
    st = _mem(monkeypatch)
    path = str(tmp_path / "t")
    warehouse._publish_manifest(path, {"version": "v0", "data": {}})

    def rival():
        # fired from inside the victim's publish — the exact window
        warehouse._publish_manifest(
            path, {"version": "rival", "data": {"r": "x"}}, expect="v0"
        )

    st.interleave = rival
    with pytest.raises(storage.ManifestConflictError, match="rival"):
        warehouse._publish_manifest(
            path, {"version": "mine", "data": {"m": "y"}}, expect="v0"
        )
    # the rival's flip survived; nothing was overwritten
    assert warehouse._manifest_read(path)["version"] == "rival"

    # the full writer loop: lose once (hook re-armed), then converge
    calls = {"n": 0}

    def cycle():
        calls["n"] += 1
        m = warehouse._manifest_read(path)
        if calls["n"] == 1:
            st.interleave = lambda: warehouse._publish_manifest(
                path,
                {"version": "rival2", "data": dict(m["data"], r2="z")},
                expect=m["version"],
            )
        warehouse._publish_manifest(
            path,
            {"version": f"mine{calls['n']}", "data": dict(m["data"], m="y")},
            expect=m["version"],
        )

    warehouse._retry_cas(cycle)
    final = warehouse._manifest_read(path)
    assert calls["n"] == 2
    assert final["data"] == {"r": "x", "r2": "z", "m": "y"}
    # parent chain: v0 -> rival -> rival2 -> mine2
    chain = [m["version"] for m in st.history(path)]
    assert chain == ["v0", "rival", "rival2", "mine2"]


def test_memory_backend_threaded_hammer_no_lost_update(tmp_path, monkeypatch):
    """Many threads × many read-merge-publish cycles with NO mutex at all:
    conditional-PUT + retry alone must keep every update — the lost-update
    proof on pure object-store semantics."""
    _mem(monkeypatch)
    path = str(tmp_path / "t")
    warehouse._publish_manifest(path, {"version": "v0", "data": {}})
    n_threads, n_iters = 4, 12
    errors: list[Exception] = []

    def writer(wid: int) -> None:
        try:
            for i in range(n_iters):

                def attempt():
                    m = warehouse._manifest_read(path)
                    data = dict(m["data"])
                    data[f"w{wid}_{i}"] = "x"
                    warehouse._publish_manifest(
                        path,
                        {"version": f"vw{wid}_{i}", "data": data},
                        expect=m["version"],
                    )

                warehouse._retry_cas(attempt)
        except Exception as e:  # pragma: no cover — surfaced below
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    m = warehouse._manifest_read(path)
    expected = {
        f"w{w}_{i}" for w in range(n_threads) for i in range(n_iters)
    }
    assert set(m["data"]) == expected
    # every publish is one link of the parent chain (no forks survive)
    hist = warehouse.STORAGE.history(path)
    by_ver = {h["version"]: h for h in hist}
    chain = []
    v = m["version"]
    while v is not None:
        chain.append(v)
        v = by_ver[v]["parent"]
    assert len(chain) == n_threads * n_iters + 1


def test_memory_backend_list_versions_and_history_gc(tmp_path, monkeypatch):
    """The maintenance surface above the seam — parent-chain history
    ordering, manifest loads by opaque entry id, and retained-horizon
    history GC — must work unchanged on the conditional-PUT backend."""
    st = _mem(monkeypatch)
    path = str(tmp_path / "t")
    os.makedirs(path)
    warehouse._publish_manifest(path, {"version": "v0", "data": {}})
    warehouse._publish_manifest(
        path, {"version": "vA", "data": {"a": "x"}}, expect="v0"
    )
    warehouse._publish_manifest(
        path, {"version": "vB", "data": {"b": "y"}}, expect="vA"
    )
    got = [
        warehouse._load_manifest_file(mf)["version"]
        for mf, _ in warehouse.list_versions(path)
    ]
    assert got == ["vB", "vA", "v0"]
    # history GC beyond the retained horizon, via the seam
    warehouse._gc_versions(path, retain=2, grace=0.0)
    got2 = [
        warehouse._load_manifest_file(mf)["version"]
        for mf, _ in warehouse.list_versions(path)
    ]
    assert got2 == ["vB", "vA"]
    # the publish LOG keeps every flip (it is the log, not the live set)
    assert [m["version"] for m in st.history(path)] == ["v0", "vA", "vB"]


# ---------------------------------------------------------------------------
# End-to-end: a real Spark writer on the memory backend
# ---------------------------------------------------------------------------


def test_lockfree_upserts_on_memory_backend(spark, tmp_path, monkeypatch):
    """write_keep_one end-to-end with manifests in the memory backend and
    parquet data on disk, LOCK_MODE='none' — the deployment shape of an
    object store (conditional-PUT pointer, dumb blob data). Concurrent
    writers' rows must all survive, same as the POSIX variant in
    test_warehouse_cas.py."""
    _mem(monkeypatch)
    monkeypatch.setattr(warehouse, "LOCK_MODE", "none")
    root = str(tmp_path / "wh")
    order = warehouse._order_cols(warehouse.UPSERT_ORDER["scores"])

    def mk(rows):
        return spark.createDataFrame(
            rows,
            "height int, topic_id int, type string, address string,"
            " height_tx long, value double",
        )

    warehouse.write_keep_one(
        spark, mk([(0, 0, "inferer", "seed", 1, 0.0)]), root, "scores", order
    )
    errors: list[Exception] = []

    def writer(wid: int) -> None:
        try:
            for i in range(3):
                warehouse.write_keep_one(
                    spark,
                    mk([(100 * wid + i + 1, wid, "inferer", f"w{wid}", 10 + i, float(i))]),
                    root,
                    "scores",
                    order,
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    got = sorted(
        r["height"]
        for r in warehouse.read_table(spark, root, "scores").collect()
    )
    assert got == [0, 101, 102, 103, 201, 202, 203], got
