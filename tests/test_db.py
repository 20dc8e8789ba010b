"""Frame store, chunk index, enrichment, DB builders."""

import pytest
import numpy as np

from vit_research_tpu.data import chunks as chunks_mod
from vit_research_tpu.data import samples as samples_mod
from vit_research_tpu.data import synthetic
from vit_research_tpu.db import builders
from vit_research_tpu.db.enrich import Enricher, chunk_stats, chunk_stats_jax
from vit_research_tpu.db.frame_store import (
    FrameStore,
    build_chunk_index,
    gather_chunk_embedding_batch,
    load_chunk_index,
)
from vit_research_tpu.store.vector_store import Collection

D = 16


def fake_embed(paths):
    """Deterministic per-path embedding (hash-seeded)."""
    out = np.zeros((len(paths), D), np.float32)
    for i, p in enumerate(paths):
        rng = np.random.default_rng(abs(hash(str(p))) % (2 ** 31))
        out[i] = rng.normal(size=D)
    return out


def make_chunks(tmp_path, vids=(1, 2)):
    template, clip_labels, events = synthetic.make_mini_dataset(
        str(tmp_path), vids=vids, clips_per_vid=2, frames_per_clip=12)
    recs = samples_mod.load_samples(vids, template, clip_labels, events)
    return chunks_mod.build_chunks(recs, chunk_size=8, chunk_stride=4)


def test_frame_store_build_gather(tmp_path):
    chs = make_chunks(tmp_path)
    paths = [p for ch in chs for p in ch["frames"]]
    store = FrameStore.build(paths, fake_embed, str(tmp_path / "store"),
                             batch_size=7)
    assert store.covers(paths)
    # Dedup: store size equals unique frames.
    assert store.n == len(set(paths))
    # Gather matches direct embedding.
    got = store.gather_paths([chs[0]["frames"]])
    want = fake_embed(chs[0]["frames"])
    np.testing.assert_allclose(got[0], want, atol=1e-6)
    # Reopen from disk.
    store2 = FrameStore(str(tmp_path / "store")).open()
    np.testing.assert_allclose(store2.gather_paths([chs[0]["frames"]])[0],
                               want, atol=1e-6)


def test_chunk_index_roundtrip(tmp_path):
    chs = make_chunks(tmp_path)
    paths = [p for ch in chs for p in ch["frames"]]
    store = FrameStore.build(paths, fake_embed, str(tmp_path / "store"))
    arrays = build_chunk_index(chs, store, str(tmp_path / "store"))
    loaded = load_chunk_index(str(tmp_path / "store"))
    np.testing.assert_array_equal(arrays["frame_idx"], loaded["frame_idx"])
    batch = gather_chunk_embedding_batch(store, loaded, [0, 1])
    assert batch.shape == (2, 8, D)
    np.testing.assert_allclose(batch[0], fake_embed(chs[0]["frames"]),
                               atol=1e-6)


def test_enricher_deterministic_and_side_sensitive():
    enr1 = Enricher(base_dim=D, enrich_dim=8, side_dim=8, hidden=D, seed=0)
    enr2 = Enricher(base_dim=D, enrich_dim=8, side_dim=8, hidden=D, seed=0)
    base = np.ones((2, D), np.float32)
    a = enr1(base, [0.3, 0.7], ["left", "right"], [10, 20])
    b = enr2(base, [0.3, 0.7], ["left", "right"], [10, 20])
    np.testing.assert_allclose(a, b)
    assert a.shape == (2, D)
    # Side flip changes the embedding.
    c = enr1(base, [0.3, 0.7], ["right", "right"], [10, 20])
    assert np.abs(a[0] - c[0]).max() > 1e-3
    # Different seed = different space.
    enr3 = Enricher(base_dim=D, enrich_dim=8, side_dim=8, hidden=D, seed=1)
    d = enr3(base, [0.3, 0.7], ["left", "right"], [10, 20])
    assert np.abs(a - d).max() > 1e-3


def test_enriched_ragdb_write_is_batch_size_invariant():
    """The frame-index normalizer is corpus-level, so the same frame gets
    the same enriched embedding no matter how the write was batched."""
    from vit_research_tpu.db.builders import write_frame_ragdb
    from vit_research_tpu.store.vector_store import Collection

    samples = [{"pth": f"vid1_frame_{i + 1}.jpg", "side": "left",
                "t_norm": i / 10.0, "clip_num": 0, "vid_num": 1}
               for i in range(10)]
    rng = np.random.default_rng(0)
    table = {s["pth"]: rng.normal(size=D).astype(np.float32)
             for s in samples}

    def embed(paths):
        return np.stack([table[p] for p in paths])

    enr = Enricher(base_dim=D, enrich_dim=8, side_dim=8, hidden=D, seed=0)
    outs = []
    for bs in (3, 10):
        col = Collection("ragdb", space="cosine")
        write_frame_ragdb(samples, embed, col, enricher=enr, batch_size=bs)
        got = col.get(ids=[s["pth"] for s in samples],
                      include=("embeddings",))
        outs.append(np.asarray(got["embeddings"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_chunk_stats_numpy_jax_agree():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8, D)).astype(np.float32)
    a = chunk_stats(x)
    b = np.asarray(chunk_stats_jax(x))
    assert a.shape == (3, 3 * D)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_write_and_rebuild_frame_db(tmp_path):
    template, clip_labels, events = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1,), clips_per_vid=2, frames_per_clip=10)
    recs = samples_mod.load_samples((1,), template, clip_labels, events)
    col = Collection("ragdb", space="cosine")
    n = builders.write_frame_ragdb(recs, fake_embed, col, batch_size=8)
    assert n == len(recs) and col.count() == len(recs)
    meta = col.get(limit=1)["metadatas"][0]
    assert {"side", "t_norm", "clip_num", "vid_num"} <= set(meta)

    # Rebuild with a projection: all rows replaced, projected values stored.
    proj = lambda x: x * 2.0  # noqa: E731
    n2 = builders.rebuild_frame_db(recs, fake_embed, proj, col, batch_size=8)
    assert n2 == len(recs) and col.count() == len(recs)
    got = col.get(ids=[recs[0]["pth"]], include=("embeddings",))
    want = fake_embed([recs[0]["pth"]])[0] * 2.0
    np.testing.assert_allclose(got["embeddings"][0], want, atol=1e-5)


def test_rebuild_chunk_db(tmp_path):
    chs = make_chunks(tmp_path)
    col = Collection("ratt_db_chunks", space="cosine")
    proj = lambda stats: stats[:, :D]  # noqa: E731
    n = builders.rebuild_chunk_db(chs, fake_embed, proj, col, batch_size=4)
    assert n == len(chs) and col.count() == len(chs)
    meta = col.get(limit=1)["metadatas"][0]
    assert {"vid_num", "clip_num", "side", "t_center", "t_width", "label",
            "start_idx", "end_idx"} <= set(meta)


def test_write_ratt_chunk_db(tmp_path):
    chs = make_chunks(tmp_path)
    paths = [p for ch in chs for p in ch["frames"]]
    store = FrameStore.build(paths, fake_embed, str(tmp_path / "store"))
    idx = build_chunk_index(chs, store, str(tmp_path / "store"))

    def encode(frame_embs):
        emb = frame_embs.mean(axis=1)
        return emb, np.ones((emb.shape[0], 1))

    col_a = Collection("ratt_db", space="cosine")
    col_b = Collection("ratt_db_v2", space="cosine")
    n = builders.write_ratt_chunk_db(idx, store, encode, [col_a, col_b],
                                     batch_size=4)
    assert n == len(chs)
    assert col_a.count() == len(chs) and col_b.count() == len(chs)
    meta = col_a.get(limit=1)["metadatas"][0]
    assert "class_logit" in meta and "label" in meta
    # L2-normalized rows.
    embs = col_a.get(include=("embeddings",))["embeddings"]
    np.testing.assert_allclose(np.linalg.norm(embs, axis=1), 1.0, atol=1e-4)


def test_write_labeled_frame_collection_and_class_npz(tmp_path):
    frames = [f"/x/vid1_frame_{i}.jpg" for i in range(6)]
    labels = ["left"] * 3 + ["right"] * 3
    probs = [[0.9, 0.05, 0.05]] * 3 + [[0.05, 0.9, 0.05]] * 3
    col = Collection("vid1_p32_embeddings", space="l2")
    n = builders.write_labeled_frame_collection(frames, labels, probs,
                                                fake_embed, col, batch_size=4)
    assert n == 6 and col.count() == 6
    out = builders.write_class_npz(
        {"left": frames[:3], "right": frames[3:]},
        fake_embed, str(tmp_path / "{cls}_embeddings.npz"))
    data = np.load(out["left"])
    assert data["embeddings"].shape == (3, 1, D)
    assert data["frame_ids"].shape == (3,)


def test_reproject_chunk_rows(tmp_path):
    """The RATT training loop's rebuild (reference: db_rebuild_ratt from
    nba_proj/train/training_ratt.py:560-561): chunk_{i} rows get fresh
    live-projection embeddings while stored metadata — including
    class_logit from the original frozen-encoder write — is preserved."""
    chs = make_chunks(tmp_path)
    paths = [p for ch in chs for p in ch["frames"]]
    store = FrameStore.build(paths, fake_embed, str(tmp_path / "store"))
    idx = build_chunk_index(chs, store, str(tmp_path / "store"))

    def encode(frame_embs):
        emb = frame_embs.mean(axis=1)
        return emb, np.full((emb.shape[0], 1), 7.5)

    col = Collection("ratt_db", space="cosine")
    builders.write_ratt_chunk_db(idx, store, encode, col, batch_size=4)
    before = np.array(col.get(include=("embeddings",))["embeddings"])

    def frame_embs_fn(batch):
        return store.gather_paths([ch["frames"] for ch in batch])

    def project(fe):  # a projection that moves every row
        return fe.mean(axis=1) + 3.0

    n = builders.reproject_chunk_rows(chs, frame_embs_fn, project, col,
                                      batch_size=4)
    assert n == len(chs)
    assert col.count() == len(chs)
    got = col.get(include=("embeddings", "metadatas"))
    after = np.array(got["embeddings"])
    assert not np.allclose(after, before)  # embeddings moved
    np.testing.assert_allclose(np.linalg.norm(after, axis=1), 1.0,
                               atol=1e-4)
    for m in got["metadatas"]:  # original write's metadata preserved
        assert m["class_logit"] == 7.5 and "label" in m

    # Store/collection mismatch is a hard error, not silent poisoning.
    shifted = [dict(ch, start_idx=ch["start_idx"] + 999) for ch in chs]
    with pytest.raises(ValueError, match="different stores or chunkings"):
        builders.reproject_chunk_rows(shifted, frame_embs_fn, project, col,
                                      batch_size=4)
