"""Vector store: upsert/query/get/delete, where filters, persistence,
distance semantics, and device/numpy path agreement."""

import os

import numpy as np
import pytest

from vit_research_tpu.ops.topk import masked_topk
from vit_research_tpu.store.vector_store import Collection, PersistentClient


def make_col(n=50, d=16, space="l2", seed=0, path=None):
    rng = np.random.default_rng(seed)
    col = Collection("test", space=space, path=path)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    metas = [{"vid_num": f"vid{i % 3}", "side": "left" if i % 2 else "right",
              "t_norm": i / n, "clip_num": i % 5} for i in range(n)]
    col.upsert([f"id{i}" for i in range(n)], emb, metas)
    return col, emb, metas


def test_upsert_query_roundtrip():
    col, emb, _ = make_col(space="l2")
    res = col.query(emb[7], n_results=1, include=("distances",))
    assert res["ids"][0][0] == "id7"
    assert res["distances"][0][0] == pytest.approx(0.0, abs=1e-4)


def test_upsert_overwrites_existing():
    col, emb, _ = make_col()
    new = np.zeros((1, emb.shape[1]), np.float32)
    col.upsert(["id3"], new, [{"side": "none"}])
    assert col.count() == 50
    got = col.get(ids=["id3"], include=("embeddings", "metadatas"))
    np.testing.assert_array_equal(got["embeddings"][0], new[0])
    assert got["metadatas"][0]["side"] == "none"


def test_l2_distance_is_squared():
    col = Collection("t", space="l2")
    col.upsert(["a", "b"], np.array([[0.0, 0.0], [3.0, 4.0]], np.float32))
    res = col.query(np.array([0.0, 0.0], np.float32), n_results=2,
                    include=("distances",))
    assert res["ids"][0] == ["a", "b"]
    assert res["distances"][0][1] == pytest.approx(25.0, abs=1e-4)


def test_cosine_distance():
    col = Collection("t", space="cosine")
    col.upsert(["a", "b"],
               np.array([[1.0, 0.0], [0.0, 2.0]], np.float32))
    res = col.query(np.array([2.0, 0.0], np.float32), n_results=2,
                    include=("distances",))
    assert res["ids"][0][0] == "a"
    assert res["distances"][0][0] == pytest.approx(0.0, abs=1e-5)
    assert res["distances"][0][1] == pytest.approx(1.0, abs=1e-5)


def test_where_filters():
    col, emb, metas = make_col()
    res = col.query(emb[0], n_results=50,
                    where={"side": "left", "vid_num": {"$ne": "vid0"}})
    for metas_row in res["metadatas"]:
        for m in metas_row:
            assert m["side"] == "left" and m["vid_num"] != "vid0"
    # Range + $and/$or composition (frame_retriever pattern:
    # vid != x AND side == s AND t_norm in window).
    res = col.get(where={"$and": [{"t_norm": {"$gte": 0.2}},
                                  {"t_norm": {"$lt": 0.4}}]},
                  include=("metadatas",))
    assert res["ids"]
    for m in res["metadatas"]:
        assert 0.2 <= m["t_norm"] < 0.4
    res = col.get(where={"$or": [{"clip_num": 0}, {"clip_num": 4}]})
    assert all(int(i[2:]) % 5 in (0, 4) for i in res["ids"])
    res = col.get(where={"clip_num": {"$in": [1, 2]}})
    assert all(int(i[2:]) % 5 in (1, 2) for i in res["ids"])


def test_get_with_limit_offset():
    col, _, _ = make_col()
    a = col.get(limit=10)
    b = col.get(limit=10, offset=10)
    assert len(a["ids"]) == 10 and len(b["ids"]) == 10
    assert set(a["ids"]).isdisjoint(b["ids"])


def test_delete_by_ids_and_where():
    col, _, _ = make_col()
    col.delete(ids=["id0", "id1"])
    assert col.count() == 48
    col.delete(where={"vid_num": "vid2"})
    assert all(m["vid_num"] != "vid2" for m in col.get()["metadatas"])


def test_persistence_roundtrip(tmp_path):
    client = PersistentClient(str(tmp_path), autoflush=False)
    col = client.get_or_create_collection(
        "frames", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    col.upsert([f"f{i}" for i in range(10)], emb,
               [{"t_norm": i / 10} for i in range(10)])
    client.flush()

    client2 = PersistentClient(str(tmp_path), autoflush=False)
    assert client2.list_collections() == ["frames"]
    col2 = client2.get_or_create_collection("frames")
    assert col2.space == "cosine"
    assert col2.count() == 10
    res = col2.query(emb[4], n_results=1)
    assert res["ids"][0][0] == "f4"


def test_device_and_numpy_paths_agree():
    col, emb, _ = make_col(n=300, d=32, space="cosine")
    q = emb[:4] + 0.01
    mask = col._where_mask({"side": "left"})
    s_np, i_np = col._query_numpy(q, mask, 5)
    s_dev, i_dev = col._query_device(q, mask, 5)
    np.testing.assert_array_equal(i_np, i_dev)
    np.testing.assert_allclose(s_np, s_dev, atol=1e-4)


def test_masked_topk_respects_mask():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(64, 8)).astype(np.float32)
    q = corpus[:2]
    mask = np.zeros((2, 64), dtype=bool)
    mask[0, 10:20] = True
    mask[1, 30:40] = True
    scores, idx = masked_topk(q, corpus, mask, k=5, metric="l2")
    assert all(10 <= j < 20 for j in np.asarray(idx)[0])
    assert all(30 <= j < 40 for j in np.asarray(idx)[1])


def test_empty_collection_query():
    col = Collection("t", space="l2")
    res = col.query(np.zeros((2, 4), np.float32), n_results=3)
    assert res["ids"] == [[], []]


# ---------------------------------------------------------------- int8 path

def test_quantize_int8_roundtrip_bound():
    from vit_research_tpu.ops.topk import quantize_int8

    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 24)).astype(np.float32)
    q, scale = quantize_int8(x)
    q, scale = np.asarray(q), np.asarray(scale)
    assert q.dtype == np.int8
    # Symmetric rounding: per-element error <= half a quantization step.
    err = np.abs(x - q.astype(np.float32) * scale[:, None])
    assert (err <= scale[:, None] * 0.5 + 1e-7).all()
    # Zero rows don't divide by zero.
    q0, s0 = quantize_int8(np.zeros((2, 8), np.float32))
    assert np.asarray(q0).sum() == 0


def test_masked_topk_int8_near_optimal():
    from vit_research_tpu.ops.topk import (l2_normalize, masked_topk,
                                           masked_topk_int8, quantize_int8)
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    corpus = np.asarray(l2_normalize(jnp.asarray(
        rng.normal(size=(512, 32)).astype(np.float32))))
    queries = corpus[::97][:5]
    mask = np.ones((1, 512), bool)
    k = 8

    cq, cs = quantize_int8(jnp.asarray(corpus))
    qq, qs = quantize_int8(jnp.asarray(queries))
    s_i8, i_i8 = masked_topk_int8(qq, qs, cq, cs, jnp.asarray(mask), k=k)
    s_i8, i_i8 = np.asarray(s_i8), np.asarray(i_i8)

    exact = queries @ corpus.T
    for qi in range(len(queries)):
        kth_best = np.sort(exact[qi])[::-1][k - 1]
        # Every int8-selected neighbor is within quantization tolerance
        # of the true k-th best (near-ties may swap, bad picks may not).
        assert exact[qi][i_i8[qi]].min() >= kth_best - 0.02
        # Reported scores track the exact ones.
        np.testing.assert_allclose(s_i8[qi], exact[qi][i_i8[qi]],
                                   atol=0.03)
        # The unambiguous self-match stays rank 1.
        assert i_i8[qi][0] == qi * 97
    # And the f32 path on the same data is the reference it claims.
    s_f32, i_f32 = masked_topk(jnp.asarray(queries), jnp.asarray(corpus),
                               jnp.asarray(mask), k=k, metric="ip")
    assert (np.asarray(i_f32)[:, 0] == np.arange(5) * 97).all()


def _random_cosine_collection(n=4200, d=16, device_quant=None):
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    col = Collection("q", space="cosine", device_quant=device_quant)
    col.upsert([f"id{i}" for i in range(n)], emb,
               [{"vid": i % 3} for i in range(n)])
    return col, emb


def test_collection_int8_device_query_near_optimal():
    col, emb = _random_cosine_collection(device_quant="int8")
    ref, _ = _random_cosine_collection(device_quant=None)
    q = emb[:4]  # n * Q = 16800 >= 1<<14 -> device path
    k = 3
    a = col.query(q, n_results=k)
    b = ref.query(q, n_results=k)
    # Self-match first, with distance ~0.
    assert [row[0] for row in a["ids"]] == [f"id{i}" for i in range(4)]
    assert a["distances"][0][0] < 1e-3
    # int8 distances within quantization tolerance of exact, and every
    # neighbor near-optimal vs the exact k-th best.
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    exact = (en[:4] @ en.T)
    for qi in range(4):
        kth_best = np.sort(exact[qi])[::-1][k - 1]
        got = [exact[qi][int(_id[2:])] for _id in a["ids"][qi]]
        assert min(got) >= kth_best - 0.02
        np.testing.assert_allclose(a["distances"][qi], b["distances"][qi],
                                   atol=0.02)
    # Filtered queries run through the same int8 path without error.
    aw = col.query(q, n_results=k, where={"vid": 1})
    assert all(int(_id[2:]) % 3 == 1 for row in aw["ids"] for _id in row)


def test_device_quant_persisted(tmp_path):
    client = PersistentClient(str(tmp_path))
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine", "vrt:device_quant": "int8"})
    assert col.device_quant == "int8"
    col.upsert(["a"], np.ones((1, 4), np.float32))
    col.flush()
    reloaded = PersistentClient(str(tmp_path))
    assert reloaded.get_collection("c").device_quant == "int8"


def test_device_quant_toggle_and_validation():
    col = Collection("t", space="cosine")
    col.set_device_quantization("int8")
    assert col.device_quant == "int8"
    col.set_device_quantization(None)
    assert col.device_quant is None
    with pytest.raises(ValueError, match="unknown device_quant"):
        col.set_device_quantization("fp4")
    with pytest.raises(ValueError, match="l2"):
        Collection("t2", space="l2", device_quant="int8")



def test_query_fuzz_matches_bruteforce_oracle():
    """Randomized sweep: every space, random $-operator filters, random
    k, duplicate rows (ties), deletes and re-upserts — results must
    match an exact numpy oracle (ids as sets per rank-tier to allow
    tie reordering, scores exactly)."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        space = ("l2", "cosine", "ip")[trial % 3]
        n = int(rng.integers(3, 60))
        d = int(rng.integers(2, 12))
        col = Collection("fuzz", space=space)
        emb = rng.normal(size=(n, d)).astype(np.float32)
        if trial % 4 == 0 and n > 4:  # force exact ties
            emb[n // 2] = emb[0]
        metas = [{"g": int(rng.integers(0, 3)), "v": float(i) / n}
                 for i in range(n)]
        ids = [f"r{i}" for i in range(n)]
        col.upsert(ids, emb, metas)
        if trial % 3 == 0 and n > 6:  # deletes + re-upserts
            col.delete(ids=[f"r{i}" for i in range(0, n, 5)])
            col.upsert([f"r{0}"], rng.normal(size=(1, d)).astype(np.float32),
                       [{"g": 1, "v": 0.0}])
        got_ids = col.get()["ids"]
        cur = {i: j for j, i in enumerate(got_ids)}
        cur_emb = col.get(include=("embeddings",))["embeddings"]
        cur_meta = col.get()["metadatas"]

        where = None
        if trial % 2:
            where = {"$and": [{"g": {"$ne": 1}},
                              {"v": {"$lte": float(rng.random())}}]}

        q = rng.normal(size=(3, d)).astype(np.float32)
        k = int(rng.integers(1, 8))
        res = col.query(q, n_results=k, where=where)

        # Oracle over the CURRENT rows.
        def ok_fn(m):
            if where is None:
                return True
            return m["g"] != 1 and m["v"] <= where["$and"][1]["v"]["$lte"]

        mask = np.array([ok_fn(m) for m in cur_meta], bool)
        if space == "cosine":
            ce = cur_emb / np.maximum(
                np.linalg.norm(cur_emb, axis=1, keepdims=True), 1e-12)
            qe = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                                1e-12)
            s = qe @ ce.T
            dist = 1.0 - s
        elif space == "ip":
            s = q @ cur_emb.T
            dist = 1.0 - s
        else:
            s = -(((q[:, None, :] - cur_emb[None]) ** 2).sum(-1))
            dist = -s
        s = np.where(mask[None, :], s, -np.inf)
        for qi in range(3):
            order = np.argsort(-s[qi], kind="stable")
            valid = [j for j in order if np.isfinite(s[qi, j])][:k]
            exp_dists = sorted(round(float(dist[qi, j]), 4) for j in valid)
            got_dists = sorted(round(float(x), 4)
                               for x in res["distances"][qi])
            assert got_dists == exp_dists, (trial, space, qi)
            # id sets match when scores are distinct
            exp_ids = {got_ids[j] for j in valid}
            if len({round(float(s[qi, j]), 6) for j in valid}) == len(valid):
                assert set(res["ids"][qi]) == exp_ids, (trial, space, qi)


def test_upsert_duplicate_ids_within_one_call_last_wins(tmp_path):
    """An id repeated inside a single upsert call must produce ONE row
    with the last occurrence's data (Chroma semantics) — not duplicate
    rows leaking into count/get/query."""
    import numpy as np

    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(str(tmp_path / "db")).get_or_create_collection(
        "dups", metadata={"hnsw:space": "l2"})
    col.upsert(["a", "a", "b", "a"],
               np.eye(4, 3, dtype=np.float32),
               metadatas=[{"v": 1}, {"v": 2}, {"v": 3}, {"v": 4}])
    assert col.count() == 2
    got = col.get(ids=["a"], include=("embeddings", "metadatas"))
    assert got["metadatas"] == [{"v": 4}]
    np.testing.assert_array_equal(got["embeddings"][0],
                                  np.eye(4, 3)[3])
    # mixing an existing id with an in-batch duplicate keeps last-wins
    col.upsert(["b", "b"], np.full((2, 3), 7, np.float32),
               metadatas=[{"v": 5}, {"v": 6}])
    assert col.count() == 2
    assert col.get(ids=["b"])["metadatas"] == [{"v": 6}]


# ---- stale-writer protection (serve.py hot reload's failure mode) ----------


def test_stale_flush_refused_after_external_compaction(tmp_path):
    """A dirty collection object whose directory another process has
    COMPACTED past must refuse to flush: its compaction would atomically
    replace the newer corpus with the stale one, and its segment append
    would be generation-fenced away on the next load."""
    import numpy as np
    import pytest

    from vit_research_tpu.store.vector_store import (PersistentClient,
                                                     StaleCollectionError)

    db = str(tmp_path / "db")
    a = PersistentClient(db, autoflush=False).get_or_create_collection("c")
    a.upsert(["a0", "a1"], np.eye(2, 3, dtype=np.float32))
    a.flush()

    b = PersistentClient(db, autoflush=False).get_collection("c")
    b.upsert(["rebuilt"], np.full((1, 3), 2, np.float32))
    b.compact()  # generation moves past a's view

    a.upsert(["pending"], np.full((1, 3), 3, np.float32))
    with pytest.raises(StaleCollectionError, match="another writer"):
        a.flush()
    with pytest.raises(StaleCollectionError):
        a.compact()
    # disk still holds b's rebuild, untouched
    fresh = PersistentClient(db, autoflush=False).get_collection("c")
    assert sorted(fresh.get(include=())["ids"]) == ["a0", "a1", "rebuilt"]
    # the pending row is recoverable for carry-over into a fresh object
    pend = a.pending_mutations()
    assert pend["ids"] == ["pending"] and pend["deleted"] == []
    np.testing.assert_array_equal(pend["embeddings"],
                                  np.full((1, 3), 3, np.float32))


def test_stale_flush_refused_after_external_append(tmp_path):
    """Same-generation staleness: another writer APPENDED log segments
    this object never replayed — our append would collide with its
    segment numbering and our manifest write would drop its rows."""
    import numpy as np
    import pytest

    from vit_research_tpu.store.vector_store import (PersistentClient,
                                                     StaleCollectionError)

    db = str(tmp_path / "db")
    a = PersistentClient(db, autoflush=False).get_or_create_collection("c")
    # big enough that one extra row stays under compact_ratio: b's flush
    # APPENDS a segment at the same generation instead of compacting
    a.upsert([f"a{i}" for i in range(8)],
             np.eye(8, 3, dtype=np.float32))
    a.flush()

    b = PersistentClient(db, autoflush=False).get_collection("c")
    b.upsert(["b0"], np.full((1, 3), 2, np.float32))
    b.flush()  # appends seg_000000 at the same generation

    a.upsert(["a8"], np.full((1, 3), 3, np.float32))
    with pytest.raises(StaleCollectionError, match="never replayed"):
        a.flush()
    fresh = PersistentClient(db, autoflush=False).get_collection("c")
    assert sorted(fresh.get(include=())["ids"]) \
        == [f"a{i}" for i in range(8)] + ["b0"]


def test_autoflush_client_skips_stale_collection(tmp_path, capsys):
    """The atexit-style PersistentClient.flush must skip (not crash on,
    not clobber through) a stale collection and keep flushing the rest."""
    import numpy as np

    from vit_research_tpu.store.vector_store import PersistentClient

    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    stale = client.get_or_create_collection("stale")
    stale.upsert(["s0"], np.eye(1, 3, dtype=np.float32))
    stale.flush()
    ok = client.get_or_create_collection("ok")
    ok.upsert(["k0"], np.eye(1, 3, dtype=np.float32))

    ext = PersistentClient(db, autoflush=False).get_collection("stale")
    ext.upsert(["ext"], np.full((1, 3), 2, np.float32))
    ext.compact()

    stale.upsert(["s1"], np.full((1, 3), 3, np.float32))
    client.flush()  # must not raise
    assert "skipping flush" in capsys.readouterr().err
    fresh = PersistentClient(db, autoflush=False)
    assert fresh.get_collection("ok").count() == 1  # others still flushed
    assert sorted(fresh.get_collection("stale").get(include=())["ids"]) \
        == ["ext", "s0"]


def test_detach_neutralizes_flush_and_drops_device_cache(tmp_path):
    """detach(): flush/compact become no-ops (a swapped-out generation
    must never write), the device cache ref drops, reads keep working."""
    import numpy as np

    from vit_research_tpu.store.vector_store import PersistentClient

    db = str(tmp_path / "db")
    col = PersistentClient(db, autoflush=False).get_or_create_collection("c")
    col.upsert(["x0", "x1"], np.eye(2, 3, dtype=np.float32))
    col.flush()
    col.upsert(["x2"], np.full((1, 3), 2, np.float32))
    col._device_cache = object()  # stand-in for a staged HBM corpus
    col.detach()
    assert col._device_cache is None
    assert col.pending_mutations() is None
    col.flush()  # no-op, no error
    col.compact()
    # reads against the in-memory arrays still work post-detach
    assert col.count() == 3
    # disk was never touched by the detached object
    fresh = PersistentClient(db, autoflush=False).get_collection("c")
    assert sorted(fresh.get(include=())["ids"]) == ["x0", "x1"]


def test_prewarm_index_fits_ivf_only_when_path_engages(tmp_path):
    """prewarm_index mirrors query()'s IVF routing condition: fit up
    front at scale (so a serving daemon's first user query never pays
    the one-time k-means), no-op everywhere else."""
    rng = np.random.default_rng(0)
    col = Collection("c", space="cosine")
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    assert col._ivf is None
    assert col.prewarm_index() is True
    assert col._ivf is not None
    fitted = col._ivf
    assert col.prewarm_index() is True  # idempotent, no refit
    assert col._ivf is fitted
    # prewarmed index answers identically to a fresh collection's query
    q = rng.normal(size=(2, 16)).astype(np.float32)
    res = col.query(q, n_results=3)
    assert len(res["ids"][0]) == 3

    small = Collection("s", space="cosine")
    small.ivf_threshold = 64
    small.upsert(["a"], rng.normal(size=(1, 16)).astype(np.float32))
    assert small.prewarm_index() is False  # below threshold

    l2 = Collection("l", space="l2")
    l2.ivf_threshold = 1
    l2.upsert(["a"], rng.normal(size=(1, 16)).astype(np.float32))
    assert l2.prewarm_index() is False  # IVF is cosine-only

    quant = Collection("q", space="cosine", device_quant="int8")
    quant.ivf_threshold = 1
    quant.upsert(["a"], rng.normal(size=(1, 16)).astype(np.float32))
    assert quant.prewarm_index() is False  # exact device path


def test_prewarm_persists_fit_and_restart_adopts_it(tmp_path, monkeypatch):
    """A prewarmed fit is saved as ivf_meta.npz beside the snapshot;
    a fresh process (new client) adopts it WITHOUT re-running k-means
    (the ~370 s-at-5M startup cost this exists to remove), and the
    adopted index answers queries identically to the fit that wrote it."""
    from vit_research_tpu.store import ivf as ivf_mod

    rng = np.random.default_rng(1)
    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    col.flush()
    assert col.prewarm_index() is True
    assert os.path.exists(os.path.join(db, "c", "ivf_meta.npz"))
    q = rng.normal(size=(3, 16)).astype(np.float32)
    want = col.query(q, n_results=5)["ids"]

    def boom(self, x):
        raise AssertionError("restart should adopt the persisted fit, "
                            "not refit")

    monkeypatch.setattr(ivf_mod.IVFIndex, "fit", boom)
    col2 = PersistentClient(db, autoflush=False).get_collection("c")
    col2.ivf_threshold = 64
    assert col2.prewarm_index() is True
    assert col2.query(q, n_results=5)["ids"] == want


def test_prewarm_adopted_fit_searches_appended_tail_exactly(tmp_path,
                                                           monkeypatch):
    """Rows appended after the persisted fit don't invalidate it (the
    fitted prefix is unchanged): the restart adopts the fit and finds
    the new rows through the exact-tail path, same as live upserts."""
    from vit_research_tpu.store import ivf as ivf_mod

    rng = np.random.default_rng(2)
    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    assert col.prewarm_index() is True  # persists the 80-row fit
    tail = rng.normal(size=(4, 16)).astype(np.float32)
    col.upsert([f"t{k}" for k in range(4)], tail)
    col.flush()

    monkeypatch.setattr(
        ivf_mod.IVFIndex, "fit",
        lambda self, x: (_ for _ in ()).throw(AssertionError("refit")))
    col2 = PersistentClient(db, autoflush=False).get_collection("c")
    col2.ivf_threshold = 64
    assert col2.prewarm_index() is True
    assert col2._ivf_extra == set(range(80, 84))
    # an appended row is its own nearest neighbor via the exact tail
    res = col2.query(tail[2:3], n_results=1)
    assert res["ids"][0] == ["t2"]


def test_prewarm_stale_fit_is_refit_not_adopted(tmp_path):
    """Changing a fitted row's CONTENT (count unchanged) fails the
    corpus fingerprint: the restart refits rather than silently serving
    wrong neighbors through a stale cell assignment, and re-persists."""
    from vit_research_tpu.store import ivf as ivf_mod

    rng = np.random.default_rng(3)
    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    assert col.prewarm_index() is True
    meta = os.path.join(db, "c", "ivf_meta.npz")
    col.upsert(["i0"], rng.normal(size=(1, 16)).astype(np.float32))
    col.flush()

    col2 = PersistentClient(db, autoflush=False).get_collection("c")
    col2.ivf_threshold = 64
    fits = []
    orig = ivf_mod.IVFIndex.fit
    try:
        ivf_mod.IVFIndex.fit = (
            lambda self, x: fits.append(1) or orig(self, x))
        assert col2.prewarm_index() is True
    finally:
        ivf_mod.IVFIndex.fit = orig
    assert fits == [1]  # refit ran
    assert col2._ivf.matches(80)
    # the fresh fit was re-persisted: the stored fingerprint now matches
    # the live (mutated) corpus, where the stale one could not
    from vit_research_tpu.store.ivf import IVFIndex
    _, fp = IVFIndex.load_meta(meta)
    assert fp == col2._ivf_fingerprint(80)


def test_prewarm_corrupt_meta_falls_back_to_fit(tmp_path):
    """A torn/garbage ivf_meta.npz is treated as absent."""
    rng = np.random.default_rng(4)
    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    col.flush()
    meta = os.path.join(db, "c", "ivf_meta.npz")
    with open(meta, "wb") as f:
        f.write(b"not an npz")
    assert col.prewarm_index() is True
    assert col._ivf is not None
    # and the garbage was replaced by a valid persisted fit
    from vit_research_tpu.store.ivf import IVFIndex
    idx, fp = IVFIndex.load_meta(meta)
    assert idx.matches(80) and len(fp) == 20


def test_prewarm_persists_a_lazy_queryfit_and_skips_dirty_prefix(tmp_path):
    """A fit created lazily by the query path is persisted by the NEXT
    prewarm_index call (so a daemon bounce after heavy writes still
    adopts), but a fit whose prefix rows were updated in-place since
    fitting is never saved — a restart adopting it would serve those
    rows through stale cells."""
    rng = np.random.default_rng(5)
    db = str(tmp_path / "db")
    client = PersistentClient(db, autoflush=False)
    col = client.get_or_create_collection(
        "c", metadata={"hnsw:space": "cosine"})
    col.ivf_threshold = 64
    col.upsert([f"i{k}" for k in range(80)],
               rng.normal(size=(80, 16)).astype(np.float32))
    col.flush()
    col.query(rng.normal(size=(1, 16)).astype(np.float32), n_results=2)
    meta = os.path.join(db, "c", "ivf_meta.npz")
    assert col._ivf is not None and not col._ivf_persisted
    assert not os.path.exists(meta)  # query path never writes

    # appended tail (extras >= fit n): still persistable
    col.upsert(["t0"], rng.normal(size=(1, 16)).astype(np.float32))
    assert col.prewarm_index() is True
    assert col._ivf_persisted and os.path.exists(meta)
    from vit_research_tpu.store.ivf import IVFIndex
    idx, fp = IVFIndex.load_meta(meta)
    assert idx.matches(80)  # describes the fitted prefix, not the tail
    assert fp == col._ivf_fingerprint(80)

    # in-place update of a FITTED row -> the (refit-free) live index is
    # kept exact by _ivf_extra, but must not be persisted as-is
    os.remove(meta)
    col.upsert(["i3"], rng.normal(size=(1, 16)).astype(np.float32))
    assert col._ivf is not None and 3 in col._ivf_extra
    col._ivf_persisted = False
    assert col.prewarm_index() is True
    assert not os.path.exists(meta)
