"""IVF index: recall against exact search, mask composition, and the
collection's size-based switch."""

import numpy as np

from vit_research_tpu.store.ivf import IVFIndex
from vit_research_tpu.store.vector_store import Collection


def clustered(n, d=32, n_clusters=40, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 4
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + rng.normal(size=(n, d)).astype(np.float32) * 0.5
    return x.astype(np.float32)


def exact_topk(q, x, k):
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    s = qn @ xn.T
    idx = np.argsort(-s, axis=1)[:, :k]
    return idx


def test_ivf_recall_on_clustered_data():
    x = clustered(20_000)
    q = x[:64] + 0.01
    ivf = IVFIndex(nprobe=8, seed=1).fit(x)
    _, idx = ivf.search(q, x, 10)
    ref = exact_topk(q, x, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, ref)])
    assert recall >= 0.95, recall


def test_ivf_nprobe_controls_recall():
    x = clustered(10_000, seed=2)
    q = x[100:116] + 0.01
    ivf = IVFIndex(seed=2).fit(x)
    ref = exact_topk(q, x, 10)

    def recall(nprobe):
        _, idx = ivf.search(q, x, 10, nprobe=nprobe)
        return np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, ref)])

    r_all = recall(len(ivf.cells))  # probing everything == exact
    assert r_all == 1.0
    assert recall(1) <= r_all


def test_ivf_mask_filters_candidates():
    x = clustered(5_000, seed=3)
    q = x[:4] + 0.01
    mask = np.zeros(len(x), bool)
    mask[1000:2000] = True
    ivf = IVFIndex(nprobe=16, seed=3).fit(x)
    scores, idx = ivf.search(q, x, 5, mask=mask)
    valid = scores > -1e29
    assert valid.any()
    assert np.all((idx[valid] >= 1000) & (idx[valid] < 2000))


def test_ivf_tiny_corpus_and_k_clamp():
    x = clustered(8, d=16, n_clusters=2, seed=4)
    ivf = IVFIndex(seed=4).fit(x)
    scores, idx = ivf.search(x[:2], x, 20)
    assert idx.shape == (2, 8)
    # top-1 self-match
    assert idx[0, 0] == 0 and idx[1, 0] == 1


def test_spilled_search_matches_in_ram(tmp_path):
    x = clustered(12_000, seed=7)
    q = x[:32] + 0.01
    prefix = str(tmp_path / "ivf")
    ivf = IVFIndex(nprobe=8, seed=7).fit(x)
    s_ram, i_ram = ivf.search(q, x, 10)
    ivf.spill(x, prefix)
    s_disk, i_disk = ivf.search(q, None, 10)
    assert np.array_equal(i_ram, i_disk)
    np.testing.assert_allclose(s_ram, s_disk, rtol=1e-5)


def test_spilled_load_roundtrip_and_memmap_corpus(tmp_path):
    # Build straight from an np.memmap corpus (the >RAM shape) and reopen
    # the index from disk in a fresh object.
    x = clustered(8_000, seed=8)
    corpus = np.memmap(tmp_path / "corpus.dat", mode="w+",
                       dtype=np.float32, shape=x.shape)
    corpus[:] = x
    corpus.flush()
    prefix = str(tmp_path / "ivf")
    IVFIndex.build_spilled(corpus, prefix, nprobe=8, seed=8)
    del corpus
    ivf = IVFIndex.load(prefix)
    q = x[:16] + 0.01
    _, idx = ivf.search(q, None, 10)
    ref = exact_topk(q, x, 10)
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(idx, ref)])
    assert recall >= 0.95, recall
    # masks apply out-of-core too
    mask = np.zeros(len(x), bool)
    mask[2000:4000] = True
    scores, idx = ivf.search(q[:4], None, 5, mask=mask)
    valid = scores > -1e29
    assert valid.any()
    assert np.all((idx[valid] >= 2000) & (idx[valid] < 4000))


def test_spilled_tail_overrides_stale_rows(tmp_path):
    x = clustered(5_000, seed=9)
    prefix = str(tmp_path / "ivf")
    ivf = IVFIndex(nprobe=4, seed=9).fit(x).spill(x, prefix)
    # row 0 was updated after the spill: its fresh value must win and the
    # stale on-disk copy must not appear.
    probe = np.full(x.shape[1], 3.0, np.float32)
    fresh = probe * 2.0
    with np.errstate(all="ignore"):
        scores, idx = ivf.search(
            probe[None], None, 3,
            extra=np.array([0]), extra_rows=fresh[None])
    assert idx[0, 0] == 0
    assert abs(scores[0, 0] - 1.0) < 1e-5  # cosine vs fresh, not stale
    # x=None with extra but no extra_rows is an error
    try:
        ivf.search(probe[None], None, 3, extra=np.array([0]))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_refit_invalidates_spill(tmp_path):
    x = clustered(3_000, seed=10)
    prefix = str(tmp_path / "ivf")
    ivf = IVFIndex(seed=10).fit(x).spill(x, prefix)
    ivf.fit(clustered(2_000, seed=11))  # new fit, new cell order
    try:
        ivf.search(x[:2], None, 3)
        assert False, "stale spill must not be searchable after refit"
    except ValueError:
        pass


def test_spilled_tail_dedup_keeps_last(tmp_path):
    x = clustered(2_000, seed=12)
    prefix = str(tmp_path / "ivf")
    ivf = IVFIndex(nprobe=4, seed=12).fit(x).spill(x, prefix)
    probe = np.full(x.shape[1], 2.0, np.float32)
    stale = -probe
    fresh = probe * 3.0
    # row 7 updated twice: the later value must win, and index 7 must
    # occupy at most ONE top-k slot.
    scores, idx = ivf.search(
        probe[None], None, 4,
        extra=np.array([7, 7]), extra_rows=np.stack([stale, fresh]))
    hits = (idx[0] == 7) & (scores[0] > -1e29)
    assert hits.sum() == 1
    assert abs(scores[0][hits][0] - 1.0) < 1e-5  # cosine vs fresh


def test_collection_switches_to_ivf_above_threshold(monkeypatch):
    monkeypatch.setattr(Collection, "ivf_threshold", 5_000)
    col = Collection("big", space="cosine")
    x = clustered(6_000, seed=5)
    col.upsert([f"v{i}" for i in range(len(x))], x,
               [{"side": "left" if i % 2 else "right"}
                for i in range(len(x))])
    res = col.query(x[:8] + 0.01, n_results=5)
    assert col._ivf is not None  # the IVF path answered
    # self-hits come back first
    assert [r[0] for r in res["ids"]] == [f"v{i}" for i in range(8)]
    # filtered queries bypass IVF and honor the mask exactly
    res = col.query(x[:4], n_results=5, where={"side": "left"})
    for row in res["metadatas"]:
        assert all(m["side"] == "left" for m in row)
    # small mutations keep the fitted index; the new row is searched
    # exactly via the extra tail (no synchronous k-means refit)
    probe = x[0] * 0.5 + 3.0
    col.upsert(["new"], probe[None])
    assert col._ivf is not None and 6000 in col._ivf_extra
    res = col.query(probe, n_results=1)
    assert res["ids"][0][0] == "new"
    # updates to existing rows are also findable through the tail
    col.upsert(["v0"], (probe * -1.0)[None])
    res = col.query(-probe, n_results=1)
    assert res["ids"][0][0] == "v0"
    # a large tail (>20% of corpus) drops the index for a refit
    col.upsert([f"bulk{i}" for i in range(1500)], clustered(1500, seed=9))
    assert col._ivf is None


def test_device_quant_takes_precedence_over_ivf(monkeypatch):
    """device_quant exists to keep huge corpora on the exact int8 device
    path; crossing ivf_threshold must not silently reroute unfiltered
    queries to approximate IVF."""
    monkeypatch.setattr(Collection, "ivf_threshold", 1_000)
    col = Collection("bigq", space="cosine", device_quant="int8")
    x = clustered(1_200, seed=5)
    col.upsert([f"v{i}" for i in range(len(x))], x)
    res = col.query(x[:4] + 0.01, n_results=3)
    assert col._ivf is None  # IVF never engaged
    assert [r[0] for r in res["ids"]] == [f"v{i}" for i in range(4)]


def test_collection_ivf_distances_are_cosine():
    col = Collection("c", space="cosine")
    col.ivf_threshold = 100
    rng = np.random.default_rng(6)
    x = rng.normal(size=(500, 16)).astype(np.float32)
    col.upsert([str(i) for i in range(500)], x)
    res = col.query(x[:2], n_results=1, include=("distances",))
    assert res["ids"][0][0] == "0"
    assert abs(res["distances"][0][0]) < 1e-5  # self-distance ~ 0


def test_save_meta_load_meta_roundtrip(tmp_path):
    """save_meta persists ONLY the fit (no corpus copy); load_meta
    reproduces identical searches against the live array and hands the
    fingerprint back for the caller's validity check."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(600, 12)).astype(np.float32)
    idx = IVFIndex(n_lists=8, nprobe=3, seed=1).fit(x)
    q = rng.normal(size=(4, 12)).astype(np.float32)
    s0, i0 = idx.search(q, x, 5)

    meta = str(tmp_path / "m.npz")
    idx.save_meta(meta, b"\x01\x02tag")
    idx2, fp = IVFIndex.load_meta(meta)
    assert fp == b"\x01\x02tag"
    assert idx2.matches(600) and idx2.nprobe == 3
    s1, i1 = idx2.search(q, x, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, atol=1e-6)
    # fit-only on disk: orders of magnitude smaller than the corpus
    import os
    assert os.path.getsize(meta) < x.nbytes / 2

    unfitted = IVFIndex()
    try:
        unfitted.save_meta(str(tmp_path / "n.npz"))
        assert False, "save_meta on an unfitted index must raise"
    except ValueError:
        pass
