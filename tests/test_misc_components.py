"""RAG-ViT fused model, reranker, joint train step, pipeline, changepoint,
streaks, profiling, fileops."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.data import synthetic
from vit_research_tpu.data.pipeline import chunk_dataset, load_chunk_frames
from vit_research_tpu.data.preprocess import PreprocessSpec
from vit_research_tpu.models.rag_vit import (
    RAGVisionTransformer,
    RetrievalModule,
    build_rag_vit,
)
from vit_research_tpu.models.reranker import CandidateReranker
from vit_research_tpu.segment.changepoint import (
    changepoint_scores,
    detect_changepoints,
)
from vit_research_tpu.segment.streaks import streak_intervals
from vit_research_tpu.store.vector_store import Collection
from vit_research_tpu.utils.configs import ViTConfig
from vit_research_tpu.utils.fileops import clear_dirs, move_frames
from vit_research_tpu.utils.profiling import Profiler, timed

TINY = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                 num_layers=1, num_heads=2, mlp_dim=64,
                 use_flash_attention=False)


def test_rag_vit_forward_and_retrieval_module():
    model, params = build_rag_vit(TINY, num_retrieval_tokens=3, seed=0)
    imgs = jnp.ones((2, 32, 32, 3))
    retrieved = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 5, 32)), jnp.float32)
    out = model.apply(params, imgs, retrieved)
    n_tokens = 17 + 3  # cls + 16 patches + 3 retrieval tokens
    assert out["encoded_tokens"].shape == (2, n_tokens, 32)
    assert out["pooled"].shape == (2, 32)
    assert out["retrieval_tokens"].shape == (2, 3, 32)
    # Retrieval actually influences the output.
    out2 = model.apply(params, imgs, retrieved * 10)
    assert np.abs(np.asarray(out["pooled"] - out2["pooled"])).max() > 1e-5

    # Host-side RetrievalModule with filters.
    col = Collection("ragdb", space="cosine")
    rng = np.random.default_rng(1)
    embs = rng.normal(size=(20, 32)).astype(np.float32)
    metas = [{"side": "left" if i % 2 == 0 else "right",
              "t_norm": i / 20, "clip_num": i % 3, "vid_num": i % 2}
             for i in range(20)]
    col.upsert([f"f{i}" for i in range(20)], embs, metas)
    rm = RetrievalModule(col, top_k=4, time_window=0.5)
    got = rm(embs[:2], ["left", "right"], [0.5, 0.5], [0, 1], [0, 1])
    assert got.shape == (2, 4, 32)
    assert np.abs(got).sum() > 0


def test_reranker():
    rr = CandidateReranker(embed_dim=8, hidden_dim=16)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)), jnp.float32)
    c = jnp.asarray(np.random.default_rng(1).normal(size=(2, 5, 8)),
                    jnp.float32)
    params = rr.init(jax.random.PRNGKey(0), q, c)
    scores = rr.apply(params, q, c)
    assert scores.shape == (2, 5)
    ranked = CandidateReranker.rerank(scores, c, top_k=3)
    assert ranked.shape == (2, 3, 8)
    # Best-scored candidate is first after rerank.
    best = jnp.argmax(scores, axis=1)
    np.testing.assert_allclose(np.asarray(ranked[0, 0]),
                               np.asarray(c[0, best[0]]))


def test_joint_train_step():
    from vit_research_tpu.models.heads import ProjectionHead, RAGHead
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.train.train_step import make_joint_train_step
    from vit_research_tpu.utils.configs import HeadConfig

    vit, vit_params = init_vit(TINY, seed=0)
    proj = ProjectionHead(input_dim=32, hidden_dim=32, proj_dim=32)
    head = RAGHead(HeadConfig(embed_dim=32, num_layers=1, num_heads=2,
                              mlp_dim=16, num_queries=2))
    key = jax.random.PRNGKey(0)
    params = {
        "vit": vit_params,
        "proj": proj.init(key, jnp.zeros((1, 32))),
        "head": head.init(key, jnp.zeros((1, 32)), jnp.zeros((1, 3, 32))),
    }
    tx = optax.adam(1e-3)
    step = make_joint_train_step(vit, proj, head, tx)
    frames = jnp.ones((2, 2, 32, 32, 3))
    retrieved = jnp.zeros((2, 3, 32))
    labels = jnp.asarray([0.0, 1.0])
    params2, opt_state, loss = step(params, tx.init(params), frames,
                                    retrieved, labels)
    assert np.isfinite(float(loss))
    # ViT received gradients (joint training).
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params["vit"],
        params2["vit"])
    assert max(jax.tree_util.tree_leaves(delta)) > 0


def test_chunk_dataset_pipeline(tmp_path):
    from vit_research_tpu.data import chunks as chunks_mod
    from vit_research_tpu.data import samples as samples_mod

    template, clip_labels, events = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1,), clips_per_vid=2, frames_per_clip=12)
    recs = samples_mod.load_samples((1,), template, clip_labels, events)
    chs = chunks_mod.build_chunks(recs, chunk_size=8, chunk_stride=4)
    spec = PreprocessSpec(size=(24, 32))
    batches = list(chunk_dataset(chs, spec, batch_size=2, seed=0,
                                 num_workers=2))
    assert batches
    frames, md, labels = batches[0]
    assert frames.shape == (2, 8, 24, 32, 3) and frames.dtype == np.uint8
    assert labels.shape == (2,)
    assert set(md) >= {"vid", "side", "t_center", "t_width", "label"}
    # Prefetch and non-prefetch agree.
    plain = list(chunk_dataset(chs, spec, batch_size=2, seed=0,
                               num_workers=1, prefetch=False))
    np.testing.assert_array_equal(batches[0][0], plain[0][0])


def test_changepoint_detection():
    x = np.concatenate([np.full(100, 2.0), np.full(100, -2.0),
                        np.full(100, 2.0)])
    x += 0.1 * np.random.default_rng(0).normal(size=300)
    scores = changepoint_scores(x, window=20)
    cps = detect_changepoints(x, window=20, min_separation=50)
    assert len(cps) >= 2
    assert any(abs(c - 100) < 10 for c in cps)
    assert any(abs(c - 200) < 10 for c in cps)
    assert scores.shape == (300,)


def test_streak_intervals():
    decisions = np.asarray([2] * 30 + [0] * 80 + [2] * 20 + [1] * 30)
    conf = np.ones(160)
    conf[50] = 0.1  # low-confidence frame inside the left streak
    decisions[50] = 1  # ...with a wrong decision, should be re-checked
    ivs = streak_intervals(decisions, conf, window=20, min_len=40)
    assert any(s == 0 and (e - b + 1) >= 75 for s, b, e in ivs)
    # The wrong flagged frame was absorbed, not splitting the streak.
    left_ivs = [iv for iv in ivs if iv[0] == 0]
    assert len(left_ivs) == 1


def test_global_profiler_env_gate(monkeypatch):
    from vit_research_tpu.utils import profiling

    monkeypatch.setattr(profiling, "_GLOBAL", None)
    monkeypatch.delenv("VRT_PROFILE", raising=False)
    with profiling.span("x"):
        pass
    assert profiling.active() is None  # no-op without the env var
    monkeypatch.setenv("VRT_PROFILE", "1")
    with profiling.span("x"):
        pass
    assert profiling.active().counts["x"] == 1
    monkeypatch.setattr(profiling, "_GLOBAL", None)


def test_streak_intervals_reject_contested_margins():
    """A side run bordered by heavy OPPOSITE-side flicker is contested
    and must be rejected; the same run bordered by 'none' is kept."""
    conf = np.ones(120)
    # left run [40, 90) bordered by right decisions on both sides.
    contested = np.asarray([1] * 40 + [0] * 50 + [1] * 30)
    ivs = streak_intervals(contested, conf, window=20, min_len=40,
                           dominance=0.8)
    assert not any(s == 0 for s, _, _ in ivs)  # left run rejected
    clean = np.asarray([2] * 40 + [0] * 50 + [2] * 30)
    ivs = streak_intervals(clean, conf, window=20, min_len=40,
                           dominance=0.8)
    assert any(s == 0 and (e - b + 1) == 50 for s, b, e in ivs)


def test_profiler_and_fileops(tmp_path):
    prof = Profiler()
    with prof.span("work"):
        sum(range(1000))
    with prof.span("work"):
        sum(range(1000))
    rep = prof.report()
    assert rep["work"]["count"] == 2 and rep["work"]["total_s"] >= 0
    with timed("noop", verbose=False):
        pass

    src = tmp_path / "a"
    dst = tmp_path / "b"
    os.makedirs(src)
    for i in range(3):
        (src / f"vid1_frame_{i}.jpg").write_text("x")
    n = move_frames(str(src), str(dst), pattern="frame")
    assert n == 3 and len(os.listdir(dst)) == 3
    clear_dirs(str(dst))
    assert os.listdir(dst) == []
