"""Flush/compact disk writes must not block collection readers.

VERDICT r4 weak-spot #3: a routine flush that escalates to a full
snapshot rewrite used to hold the collection lock for the whole write
(~2 min at 5M x 768 rows), stalling every query/get/upsert on that
collection. The rewrite now captures a point-in-time state under the
lock and writes OUTSIDE it; these tests pin that behaviour plus the
consistency edges (copy-on-write for racing in-place upserts, delete
records for rows deleted mid-write, pending restoration on IO failure).
"""

import os
import threading

import numpy as np
import pytest

from vit_research_tpu.store import vector_store
from vit_research_tpu.store.vector_store import Collection


def _big_col(tmp_path, n=100_000, d=16, seed=0):
    rng = np.random.default_rng(seed)
    col = Collection("big", space="cosine", path=str(tmp_path / "big"))
    emb = rng.normal(size=(n, d)).astype(np.float32)
    ids = [f"id{i}" for i in range(n)]
    col.upsert(ids, emb, [{"i": i} for i in range(n)])
    return col, emb, ids


class _GatedNpz:
    """Wraps _atomic_write_npz: blocks snapshot writes on a gate so the
    test can act while the write is provably mid-flight."""

    def __init__(self, match="snapshot"):
        self.in_write = threading.Event()
        self.release = threading.Event()
        self.match = match
        self._orig = vector_store._atomic_write_npz

    def __call__(self, path, **arrays):
        if self.match in os.path.basename(path):
            self.in_write.set()
            assert self.release.wait(30), "test never released the gate"
        self._orig(path, **arrays)


def test_queries_and_writes_proceed_during_compaction(tmp_path, monkeypatch):
    col, emb, ids = _big_col(tmp_path)
    gate = _GatedNpz()
    monkeypatch.setattr(vector_store, "_atomic_write_npz", gate)
    t = threading.Thread(target=col.compact)
    t.start()
    try:
        assert gate.in_write.wait(30)
        # The snapshot write is mid-flight. Readers and writers must not
        # wait on it: run them in a side thread with a deadline so a
        # regression (lock held across the write) fails instead of
        # hanging the suite.
        results = {}

        def reader():
            results["q"] = col.query(emb[7], n_results=3)
            results["g"] = col.get(ids=["id7"], include=("metadatas",))
            col.upsert(["id7"], np.ones((1, emb.shape[1]), np.float32))
            results["done"] = True

        r = threading.Thread(target=reader)
        r.start()
        r.join(20)
        assert results.get("done"), \
            "query/get/upsert blocked behind the compaction disk write"
        assert results["q"]["ids"][0][0] == "id7"
        assert results["g"]["metadatas"][0]["i"] == 7
    finally:
        gate.release.set()
        t.join(30)

    # The snapshot captured the PRE-upsert state (point-in-time), and the
    # racing upsert stayed pending for the next flush.
    with np.load(os.path.join(col._path, "snapshot.npz"),
                 allow_pickle=False) as snap:
        row = snap["embeddings"][snap["ids"].tolist().index("id7")]
    np.testing.assert_allclose(row, emb[7], atol=1e-6)
    assert col._dirty and "id7" in col._pending_dirty
    col.flush()
    reopened = Collection._load("big", col._path)
    got = reopened.get(ids=["id7"], include=("embeddings",))
    np.testing.assert_allclose(got["embeddings"][0],
                               np.ones(emb.shape[1], np.float32), atol=1e-6)


def test_inplace_upsert_during_snapshot_copy_on_write(tmp_path, monkeypatch):
    """An in-place row update racing the snapshot write must not tear the
    on-disk snapshot: the first racing update copies the matrix."""
    col, emb, ids = _big_col(tmp_path, n=500)
    gate = _GatedNpz()
    monkeypatch.setattr(vector_store, "_atomic_write_npz", gate)
    t = threading.Thread(target=col.flush)  # first flush => snapshot kind
    t.start()
    try:
        assert gate.in_write.wait(30)
        new = np.full((1, emb.shape[1]), 7.0, np.float32)
        col.upsert(["id3"], new)  # in-place branch -> COW
        # the writer's captured array is untouched
        assert not col._cow_pending
    finally:
        gate.release.set()
        t.join(30)
    with np.load(os.path.join(col._path, "snapshot.npz"),
                 allow_pickle=False) as snap:
        row = snap["embeddings"][snap["ids"].tolist().index("id3")]
    np.testing.assert_allclose(row, emb[3], atol=1e-6)  # old value
    # live object serves the new value and re-flushes it
    got = col.get(ids=["id3"], include=("embeddings",))
    np.testing.assert_allclose(got["embeddings"][0], new[0])
    col.flush()
    reopened = Collection._load("big", col._path)
    np.testing.assert_allclose(
        reopened.get(ids=["id3"], include=("embeddings",))["embeddings"][0],
        new[0])


def test_delete_during_snapshot_write_queues_delete_record(tmp_path,
                                                           monkeypatch):
    """A never-before-persisted id captured by an in-flight snapshot and
    deleted mid-write must get a delete record queued — delete() itself
    can't know the id is landing on disk."""
    col, emb, ids = _big_col(tmp_path, n=200)
    gate = _GatedNpz()
    monkeypatch.setattr(vector_store, "_atomic_write_npz", gate)
    t = threading.Thread(target=col.flush)
    t.start()
    try:
        assert gate.in_write.wait(30)
        col.delete(ids=["id5"])  # id5 is in the in-flight snapshot
    finally:
        gate.release.set()
        t.join(30)
    assert "id5" in col._pending_deleted and col._dirty
    col.flush()  # segment carries the delete
    reopened = Collection._load("big", col._path)
    assert reopened.get(ids=["id5"])["ids"] == []
    assert reopened.count() == 199


def test_flush_io_failure_restores_pending(tmp_path, monkeypatch):
    col = Collection("c", space="l2", path=str(tmp_path / "c"))
    col.upsert(["a", "b"], np.eye(2, 4, dtype=np.float32))

    orig = vector_store._atomic_write_npz
    calls = {"n": 0}

    def failing(path, **arrays):
        calls["n"] += 1
        raise OSError("disk full")

    monkeypatch.setattr(vector_store, "_atomic_write_npz", failing)
    with pytest.raises(OSError):
        col.flush()
    assert calls["n"] == 1
    assert col._dirty and col._pending_dirty == {"a", "b"}
    monkeypatch.setattr(vector_store, "_atomic_write_npz", orig)
    col.flush()
    reopened = Collection._load("c", col._path)
    assert sorted(reopened.get()["ids"]) == ["a", "b"]


def test_concurrent_flush_calls_serialize(tmp_path):
    """Hammer flush/compact/upsert from several threads: no deadlock, no
    lost rows, loadable final state."""
    col = Collection("h", space="l2", path=str(tmp_path / "h"))
    rng = np.random.default_rng(0)
    col.upsert([f"s{i}" for i in range(64)],
               rng.normal(size=(64, 8)).astype(np.float32))
    stop = threading.Event()
    errors = []

    def flusher(force):
        try:
            while not stop.is_set():
                (col.compact if force else col.flush)()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def writer():
        try:
            for i in range(200):
                col.upsert([f"w{i % 32}"],
                           rng.normal(size=(1, 8)).astype(np.float32))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=flusher, args=(False,)),
               threading.Thread(target=flusher, args=(True,)),
               threading.Thread(target=writer)]
    for t in threads:
        t.start()
    threads[2].join(60)
    stop.set()
    for t in threads[:2]:
        t.join(60)
    assert not errors, errors
    col.flush()
    reopened = Collection._load("h", col._path)
    assert reopened.count() == 64 + 32


def test_partial_snapshot_failure_adopts_landed_generation(tmp_path,
                                                           monkeypatch):
    """Review r5 finding: if snapshot.npz lands but the manifest write
    fails, the object must adopt the on-disk generation — otherwise
    every retry raises StaleCollectionError against its OWN write — and
    a row deleted mid-write must still get its delete record."""
    col = Collection("p", space="l2", path=str(tmp_path / "p"))
    col.upsert(["a", "b", "c"], np.eye(3, 4, dtype=np.float32))

    orig_json = vector_store._atomic_write_json

    def failing_manifest(path, obj):
        if os.path.basename(path) == "segments.json":
            raise OSError("disk full")
        orig_json(path, obj)

    monkeypatch.setattr(vector_store, "_atomic_write_json",
                        failing_manifest)
    with pytest.raises(OSError):
        col.flush()  # first flush = snapshot kind; manifest write fails
    monkeypatch.setattr(vector_store, "_atomic_write_json", orig_json)
    # "c" was never persisted before the snapshot; delete it now — the
    # landed snapshot contains it, so a delete record must be queued.
    col.delete(ids=["c"])
    col.flush()  # must NOT raise StaleCollectionError
    reopened = Collection._load("p", col._path)
    assert sorted(reopened.get()["ids"]) == ["a", "b"]


def test_detach_waits_for_inflight_write(tmp_path, monkeypatch):
    """detach()'s contract ('later flushes never reach disk') requires
    serializing on the writer: a detach during an in-flight snapshot
    write completes only after the write does."""
    col = Collection("d", space="l2", path=str(tmp_path / "d"))
    col.upsert(["a"], np.ones((1, 4), np.float32))
    gate = _GatedNpz()
    monkeypatch.setattr(vector_store, "_atomic_write_npz", gate)
    ft = threading.Thread(target=col.flush)
    ft.start()
    try:
        assert gate.in_write.wait(30)
        detached = threading.Event()

        def do_detach():
            col.detach()
            detached.set()

        dt = threading.Thread(target=do_detach)
        dt.start()
        assert not detached.wait(0.5), \
            "detach returned while a flush disk write was in flight"
    finally:
        gate.release.set()
        ft.join(30)
    assert detached.wait(30)
    dt.join(30)
    assert col._path is None
    col.flush()  # no-op, touches nothing
