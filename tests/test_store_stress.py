"""Vector store: concurrency stress and moderate-scale behavior."""

import threading

import numpy as np

from vit_research_tpu.store.vector_store import Collection
from vit_research_tpu.train.async_rebuild import SwappableCollection


def test_concurrent_reads_during_upserts():
    col = Collection("t", space="cosine")
    rng = np.random.default_rng(0)
    col.upsert([f"a{i}" for i in range(100)],
               rng.normal(size=(100, 16)).astype(np.float32),
               [{"vid_num": i % 4, "side": "left", "t_norm": 0.5}
                for i in range(100)])
    stop = threading.Event()
    errors = []

    def reader():
        q = rng.normal(size=(4, 16)).astype(np.float32)
        while not stop.is_set():
            try:
                res = col.query(q, n_results=5, where={"side": "left"})
                assert len(res["ids"]) == 4
                col.get(limit=10)
                col.count()
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=reader) for _ in range(3)]
    for t in threads:
        t.start()
    for j in range(20):
        col.upsert([f"b{j}"], rng.normal(size=(1, 16)).astype(np.float32),
                   [{"vid_num": 9, "side": "right", "t_norm": 0.1}])
        col.delete(ids=[f"b{j}"])
    stop.set()
    for t in threads:
        t.join()
    assert not errors
    assert col.count() == 100


def test_swappable_under_concurrent_swap_and_read():
    rng = np.random.default_rng(1)

    def fresh(n):
        c = Collection("t", space="l2")
        c.upsert([f"x{i}" for i in range(n)],
                 rng.normal(size=(n, 8)).astype(np.float32))
        return c

    sw = SwappableCollection(fresh(10))
    stop = threading.Event()
    sizes = []

    def reader():
        while not stop.is_set():
            sizes.append(sw.count())

    t = threading.Thread(target=reader)
    t.start()
    for n in (20, 30, 40):
        sw.swap(fresh(n))
    stop.set()
    t.join()
    # Readers only ever observed complete snapshots.
    assert set(sizes) <= {10, 20, 30, 40}


def test_store_scale_100k_query_latency():
    rng = np.random.default_rng(2)
    n, d = 100_000, 64
    col = Collection("big", space="cosine")
    col.upsert([str(i) for i in range(n)],
               rng.normal(size=(n, d)).astype(np.float32),
               [{"vid_num": i % 8, "side": "left" if i % 2 else "right",
                 "t_norm": (i % 100) / 100.0} for i in range(n)])
    q = rng.normal(size=(16, d)).astype(np.float32)
    res = col.query(q, n_results=10,
                    where={"$and": [{"side": "left"},
                                    {"t_norm": {"$gte": 0.25}},
                                    {"t_norm": {"$lte": 0.75}}]})
    assert len(res["ids"]) == 16
    for row, drow in zip(res["ids"], res["distances"]):
        assert len(row) == 10
        # Distances ascending (cosine distance).
        assert all(a <= b + 1e-6 for a, b in zip(drow, drow[1:]))
        for i in row:
            m = col._metadatas[col._id_to_idx[i]]
            assert m["side"] == "left" and 0.25 <= m["t_norm"] <= 0.75


def test_persistence_after_delete_and_reload(tmp_path):
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(str(tmp_path), autoflush=False)
    col = client.get_or_create_collection("c")
    col.upsert(["a", "b", "c"], np.eye(3, 4, dtype=np.float32))
    col.delete(ids=["b"])
    client.flush()
    col2 = PersistentClient(str(tmp_path),
                            autoflush=False).get_or_create_collection("c")
    assert sorted(col2.get()["ids"]) == ["a", "c"]
