"""Training loops: two epochs each on synthetic worlds; losses finite,
histories populated, learning signal present."""

import numpy as np
import pytest

from vit_research_tpu.retrieval import cache_bins as CB
from vit_research_tpu.retrieval import cache_stage2 as CS
from vit_research_tpu.retrieval.retrievers import (
    FrameRetriever,
    RattChunkRetriever,
)
from vit_research_tpu.store.vector_store import Collection
from vit_research_tpu.utils.configs import (
    ChunkEncoderConfig,
    ExperimentConfig,
    HeadConfig,
    RetrievalConfig,
    TrainConfig,
)

D = 32
T = 6
HEAD = HeadConfig(embed_dim=D, num_layers=1, num_heads=2, mlp_dim=16,
                  num_queries=2, max_tokens=16, k_sim=3, k_contrast=3,
                  k_temporal=2)
TRAIN = TrainConfig(batch_size=8, num_epochs=2, accum_steps=1,
                    lr_phase1=1e-3, lr_phase2=1e-4, rebuild_every=1)


def make_chunk(vid, clip, start, side, label, t_center):
    return {
        "vid": vid, "clip": clip, "start_idx": start, "end_idx": start + T - 1,
        "side": side, "label": label, "t_center": t_center, "t_width": 0.2,
        "status_id": label,
        "frames": [f"/v{vid}/c{clip}/f{start + i}.jpg" for i in range(T)],
    }


def chunk_world(n_vids=4, clips=2, per_clip=8):
    chunks = []
    for vid in range(1, n_vids + 1):
        for clip in range(clips):
            side = "left" if clip % 2 == 0 else "right"
            for s in range(per_clip):
                label = int(s >= per_clip // 2)  # later chunks are 'makes'
                chunks.append(make_chunk(vid, clip, s * 4, side, label,
                                         (s + 0.5) / per_clip))
    return chunks


def frame_embs_fn(batch):
    """Label-dependent synthetic frame embeddings — learnable signal."""
    out = np.zeros((len(batch), T, D), np.float32)
    for i, ch in enumerate(batch):
        rng = np.random.default_rng(ch["vid"] * 131 + ch["clip"] * 17
                                    + ch["start_idx"])
        base = np.zeros(D)
        base[ch["label"]] = 2.0
        base[4 + (0 if ch["side"] == "left" else 1)] = 1.0
        out[i] = base + 0.3 * rng.normal(size=(T, D))
    return out


def chunk_embed_fn(batch):
    emb = frame_embs_fn(batch).mean(axis=1)
    return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)


def fill_collection(chunks, time_field="t_center"):
    col = Collection("db", space="cosine")
    embs = chunk_embed_fn(chunks)
    ids = [f"v{c['vid']}c{c['clip']}s{c['start_idx']}" for c in chunks]
    metas = [{
        "vid_num": c["vid"], "clip_num": c["clip"], "side": c["side"],
        "label": c["label"], "t_center": c["t_center"],
        "t_width": c["t_width"], "t_norm": c["t_center"],
        "start_idx": c["start_idx"], "end_idx": c["end_idx"],
        "class_logit": 0.0,
    } for c in chunks]
    col.upsert(ids, embs, metas)
    return col


@pytest.fixture(scope="module")
def world():
    chunks = chunk_world()
    train = [c for c in chunks if c["vid"] <= 3]
    val = [c for c in chunks if c["vid"] == 4]
    col = fill_collection(chunks)
    return chunks, train, val, col


def test_train_rag_loop(world):
    from vit_research_tpu.train.train_rag import train_rag

    chunks, train, val, col = world
    cfg = ExperimentConfig(name="rag", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))
    retriever = FrameRetriever(col, top_k=4)
    rebuilds = []
    params, history = train_rag(
        train, val, chunk_embed_fn, retriever, cfg=cfg,
        rebuild_fn=lambda proj: rebuilds.append(proj(np.ones((1, D)))))
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"])
    assert len(rebuilds) == 2  # rebuild_every=1
    assert -1.0 <= history[-1]["retr_sim"] <= 1.0  # purity populated


def test_train_cls_only_ablation(world):
    from vit_research_tpu.train.train_rag import train_cls_only

    chunks, train, val, col = world
    cfg = ExperimentConfig(name="cls_only", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))
    retriever = FrameRetriever(col, top_k=4)
    params, history = train_cls_only(train, val, chunk_embed_fn, retriever,
                                     cfg=cfg)
    assert np.isfinite(history[-1]["val_loss"])


def test_train_ratt_loop(world):
    from vit_research_tpu.train.train_ratt import train_ratt

    chunks, train, val, col = world
    cfg = ExperimentConfig(name="ratt", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))
    retriever = RattChunkRetriever(col, top_k=4)
    rebuilds = []

    def rebuild_fn(project_fn):
        # Live 2304->768 chunk projection (reference: db_rebuild_ratt
        # invoked from the loop, training_ratt.py:560-561).
        rebuilds.append(project_fn(np.ones((1, 2, D), np.float32)))

    params, history = train_ratt(train, val, frame_embs_fn, retriever,
                                 cfg=cfg, attention_losses=True,
                                 rebuild_fn=rebuild_fn)
    h = history[-1]
    assert np.isfinite(h["train_loss"]) and np.isfinite(h["val_loss"])
    assert "loss_ibn" in h and "loss_attn_entropy" in h
    # learning: loss drops across epochs
    assert history[-1]["train_loss"] < history[0]["train_loss"] + 0.5
    # rebuild cadence (rebuild_every=1 in TRAIN): once per epoch, live
    # projection output shaped (1, D), and the projection CHANGED
    # between rebuilds (it is the live training projection, not a
    # snapshot).
    assert len(rebuilds) == 2
    assert rebuilds[0].shape == (1, D)
    assert not np.allclose(rebuilds[0], rebuilds[1])


def test_train_chunk_cached_loop(world):
    from vit_research_tpu.train.train_chunk_cached import train_chunk_cached

    chunks, train, val, col = world
    cache = CB.build_bin_cache(
        chunks, lambda ch: chunk_embed_fn([ch])[0], col,
        train_vids=[1, 2, 3, 4], candidates_per_bin=8, query_mult=8,
        max_per_video=6, max_global_appearances=20, min_time_gap=0.0,
        delta_t=0.5, seed=0)
    cfg = ExperimentConfig(name="chunks_cached", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))
    refreshes = []
    params, history = train_chunk_cached(
        train, val, chunk_embed_fn, cache, cfg=cfg, delta_t=0.5,
        refresh_fn=lambda e: refreshes.append(e) or cache)
    h = history[-1]
    assert np.isfinite(h["train_loss"])
    assert "agreement" in h and 0 <= h["agreement"] <= 1
    assert "attn_mass_same" in h
    assert refreshes == [0, 1]


def test_train_stage2_loop(world, tmp_path):
    from vit_research_tpu.train.train_stage2 import train_stage2

    chunks, train, val, col = world
    encode = lambda ch: chunk_embed_fn([ch])[0]  # noqa: E731
    cache = CS.build_stage2_cache(
        chunks, encode, col, k_sim=HEAD.k_sim, k_contrast=HEAD.k_contrast,
        k_temporal=HEAD.k_temporal, future_step=1)
    cfg = ExperimentConfig(name="stage2", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(
                               top_k=4, future_chunk_step=1,
                               search_k_content=16, search_k_temporal=8))
    dumps = []
    params, history = train_stage2(
        train, val, cache, encode_fn=encode, collection=col, cfg=cfg,
        log_probs_fn=lambda e, labels, probs: dumps.append((e, len(labels))))
    h = history[-1]
    assert np.isfinite(h["train_loss"]) and np.isfinite(h["val_loss"])
    assert any(k.startswith("grad_rms_") for k in h)
    assert "val_best_f1" in h
    assert len(dumps) == 2


def test_train_chunk_encoder_loop(tmp_path):
    from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index
    from vit_research_tpu.train.train_chunk_encoder import (
        make_encode_fn,
        train_chunk_encoder,
    )

    chunks = chunk_world(n_vids=2, clips=1, per_clip=8)
    paths = [p for c in chunks for p in c["frames"]]

    def embed(paths_batch):
        # path -> parse chunk identity -> reuse synthetic frame embedding
        out = np.zeros((len(paths_batch), D), np.float32)
        for i, p in enumerate(paths_batch):
            parts = p.strip("/").split("/")
            vid = int(parts[0][1:])
            clip = int(parts[1][1:])
            fnum = int(parts[2][1:-4])
            start = (fnum // 4) * 4
            ch = make_chunk(vid, clip, min(start, 28), "left",
                            int(start >= 16), 0.5)
            out[i] = frame_embs_fn([ch])[0, fnum - ch["start_idx"]
                                         if 0 <= fnum - ch["start_idx"] < T
                                         else 0]
        return out

    store = FrameStore.build(paths, embed, str(tmp_path / "store"))
    idx = build_chunk_index(chunks, store, str(tmp_path / "store"))
    n = len(chunks)
    cfg = ChunkEncoderConfig(embed_dim=D, num_layers=1, num_heads=2,
                             mlp_dim=4 * D, max_len=T)
    model, best_params, history = train_chunk_encoder(
        store, idx, list(range(n - 4)), list(range(n - 4, n)),
        config=cfg, num_epochs=2, batch_size=4)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train_loss"])
    assert "val_tp" in history[-1] and "separation_gap" in history[-1]
    # Frozen encode fn contract for DB writers.
    encode = make_encode_fn(model, best_params)
    emb, logit = encode(np.zeros((2, T, D), np.float32))
    assert emb.shape == (2, D) and logit.shape == (2, 1)


def test_train_chunk_encoder_resume_reproduces_trajectory(tmp_path):
    """2 epochs + --resume for 2 more == 4 uninterrupted epochs, exactly
    (optimizer state restored; per-epoch folded RNG replays)."""
    from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_encoder import train_chunk_encoder

    chunks = chunk_world(n_vids=2, clips=1, per_clip=8)
    paths = [p for c in chunks for p in c["frames"]]
    embed = lambda pb: np.stack(  # noqa: E731
        [frame_embs_fn([chunks[0]])[0, 0] + 0.01 * i
         for i in range(len(pb))])
    store = FrameStore.build(paths, embed, str(tmp_path / "s"))
    idx = build_chunk_index(chunks, store, str(tmp_path / "s"))
    n = len(chunks)
    cfg = ChunkEncoderConfig(embed_dim=D, num_layers=1, num_heads=2,
                             mlp_dim=4 * D, max_len=T)
    args = (store, idx, list(range(n - 4)), list(range(n - 4, n)))
    kw = dict(config=cfg, batch_size=4, seed=5)

    _, _, ref_hist = train_chunk_encoder(*args, num_epochs=4, **kw)

    mngr = CheckpointManager(str(tmp_path), "run")
    train_chunk_encoder(*args, num_epochs=2, ckpt_manager=mngr, **kw)
    mngr.wait()
    mngr2 = CheckpointManager(str(tmp_path), "run")
    _, _, hist = train_chunk_encoder(*args, num_epochs=4, ckpt_manager=mngr2,
                                     resume=True, **kw)
    mngr2.wait()
    assert len(hist) == 2  # only the remaining epochs ran
    for h_ref, h in zip(ref_hist[2:], hist):
        np.testing.assert_allclose(h_ref["train_loss"], h["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(h_ref["val_loss"], h["val_loss"],
                                   rtol=1e-5)


def test_train_stage2_resume(world, tmp_path):
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_stage2 import train_stage2

    chunks, train, val, col = world
    encode = lambda ch: chunk_embed_fn([ch])[0]  # noqa: E731
    cache = CS.build_stage2_cache(
        chunks, encode, col, k_sim=HEAD.k_sim, k_contrast=HEAD.k_contrast,
        k_temporal=HEAD.k_temporal, future_step=1)
    cfg = ExperimentConfig(
        name="stage2", head=HEAD,
        train=TrainConfig(batch_size=8, num_epochs=4, accum_steps=1,
                          lr_phase1=1e-3, lr_phase2=1e-4),
        retrieval=RetrievalConfig(top_k=4, future_chunk_step=1,
                                  search_k_content=16, search_k_temporal=8))

    _, ref_hist = train_stage2(train, val, cache, cfg=cfg)

    # Crash mid-run after epoch 1's checkpoint, then resume: the LR
    # schedule and RNG must line up so epochs 2-3 replay exactly.
    def crash_at_2(epoch, labels, probs):
        if epoch == 2:
            raise RuntimeError("simulated crash")

    mngr = CheckpointManager(str(tmp_path), "s2")
    with pytest.raises(RuntimeError):
        train_stage2(train, val, cache, cfg=cfg, ckpt_manager=mngr,
                     log_probs_fn=crash_at_2)
    mngr.wait()
    mngr2 = CheckpointManager(str(tmp_path), "s2")
    _, hist = train_stage2(train, val, cache, cfg=cfg, ckpt_manager=mngr2,
                           resume=True)
    mngr2.wait()
    assert len(hist) == 2  # epochs 2 and 3 only
    for h_ref, h in zip(ref_hist[2:], hist):
        np.testing.assert_allclose(h_ref["train_loss"], h["train_loss"],
                                   rtol=1e-5)
        np.testing.assert_allclose(h_ref["val_loss"], h["val_loss"],
                                   rtol=1e-5)


def test_train_chunk_cached_resume(world, tmp_path):
    """All main loops share maybe_resume + per-epoch folded RNG; check the
    cached-RATT loop replays the uninterrupted trajectory after a resume."""
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_cached import train_chunk_cached

    chunks, train, val, col = world
    cache = CB.build_bin_cache(
        chunks, lambda ch: chunk_embed_fn([ch])[0], col,
        train_vids=[1, 2, 3, 4], candidates_per_bin=8, query_mult=8,
        max_per_video=6, max_global_appearances=20, min_time_gap=0.0,
        delta_t=0.5, seed=0)
    cfg = ExperimentConfig(
        name="chunks_cached", head=HEAD,
        train=TrainConfig(batch_size=8, num_epochs=4, accum_steps=1,
                          lr_phase1=1e-3, lr_phase2=1e-4),
        retrieval=RetrievalConfig(top_k=4))

    _, ref_hist = train_chunk_cached(train, val, chunk_embed_fn, cache,
                                     cfg=cfg, delta_t=0.5)

    # interrupt after epoch 1 by checkpointing only 2 epochs' worth
    cfg2 = ExperimentConfig(
        name="chunks_cached", head=HEAD,
        train=TrainConfig(batch_size=8, num_epochs=4, accum_steps=1,
                          lr_phase1=1e-3, lr_phase2=1e-4),
        retrieval=RetrievalConfig(top_k=4))
    mngr = CheckpointManager(str(tmp_path), "cc")

    calls = {"n": 0}
    def refresh(epoch):
        calls["n"] += 1
        if epoch == 2:
            raise RuntimeError("simulated crash")
        return cache

    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        train_chunk_cached(train, val, chunk_embed_fn, cache, cfg=cfg2,
                           delta_t=0.5, ckpt_manager=mngr,
                           refresh_fn=refresh)
    mngr.wait()
    mngr2 = CheckpointManager(str(tmp_path), "cc")
    _, hist = train_chunk_cached(train, val, chunk_embed_fn, cache,
                                 cfg=cfg2, delta_t=0.5, ckpt_manager=mngr2,
                                 resume=True)
    mngr2.wait()
    for h_ref, h in zip(ref_hist[len(ref_hist) - len(hist):], hist):
        np.testing.assert_allclose(h_ref["train_loss"], h["train_loss"],
                                   rtol=1e-5)
