"""Temporally-strided embedding with inter-frame reuse."""

import os

import numpy as np

from vit_research_tpu.data import synthetic
from vit_research_tpu.data.preprocess import PreprocessSpec
from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.parallel.embed import EmbeddingEngine, embed_video_strided
from vit_research_tpu.utils.configs import ViTConfig

TINY = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                 num_layers=1, num_heads=2, mlp_dim=64,
                 use_flash_attention=False)
SPEC = PreprocessSpec(size=(32, 32))


def make_engine():
    model, params = init_vit(TINY, seed=0)
    return EmbeddingEngine(model, params, SPEC, batch_size=8,
                           use_fused_patch_embed=False)


def test_strided_keyframes_and_interp(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 7), ("right", 6)], size=(32, 32))
    eng = make_engine()
    full = eng.embed_paths(paths, num_workers=2)
    strided = embed_video_strided(eng, paths, stride=3, num_workers=2)
    assert strided.shape == full.shape
    # Keyframes match the full embedding exactly (modulo final L2 norm).
    for i in range(0, len(paths), 3):
        cos = strided[i] @ full[i]
        assert cos > 0.9999
    # Interior frames are close to the full embedding (smooth content).
    cos_all = np.sum(strided * full, axis=1)
    assert cos_all.mean() > 0.9
    # Rows L2-normalized.
    np.testing.assert_allclose(np.linalg.norm(strided, axis=1), 1.0,
                               atol=1e-5)


def test_strided_hold_mode(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 9)], size=(32, 32))
    eng = make_engine()
    out = embed_video_strided(eng, paths, stride=4, interpolate=False,
                              num_workers=1)
    np.testing.assert_allclose(out[1], out[0], atol=1e-6)
    np.testing.assert_allclose(out[5], out[4], atol=1e-6)


def test_strided_segmentation_matches_full(tmp_path):
    """HMM segmentation from strided embeddings decodes the same
    boundaries (the design justification)."""
    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.hmm import STATES, smooth_probabilities

    import dataclasses

    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1,
        [("left", 40), ("none", 10), ("right", 40)], size=(32, 32))
    truth = ["left"] * 40 + ["none"] * 10 + ["right"] * 40
    # GAP pooling: a shallow random ViT's CLS is nearly content-blind,
    # while the patch-token mean carries the side signal directly.
    model, params = init_vit(dataclasses.replace(TINY, pooler="gap"), seed=0)
    eng = EmbeddingEngine(model, params, SPEC, batch_size=8,
                          use_fused_patch_embed=False)

    # Seed corpus from a second synthetic video.
    seed_paths = synthetic.write_video_frames(
        str(tmp_path / "g"), 2,
        [("left", 30), ("none", 30), ("right", 30)], size=(32, 32))
    corpus = eng.embed_paths(seed_paths, num_workers=2)
    corpus_labels = np.asarray([0] * 30 + [2] * 30 + [1] * 30)

    def decode(embs):
        nl, _, _ = knn_mod.knn_labels(embs, corpus, corpus_labels, k=15,
                                      metric="ip")
        counts = knn_mod.vote_counts(nl).astype(np.float64)
        probs = counts / counts.sum(axis=1, keepdims=True)
        return [STATES[i] for i in smooth_probabilities(probs)]

    full = decode(eng.embed_paths(paths, num_workers=2))
    strided = decode(embed_video_strided(eng, paths, stride=4,
                                         num_workers=2))
    agree_full = np.mean([a == b for a, b in zip(full, truth)])
    agree_strided = np.mean([a == b for a, b in zip(strided, truth)])
    assert agree_full > 0.9
    assert agree_strided > agree_full - 0.05  # near-parity at 4x speed


class _ScriptedEngine:
    """Fake engine with path->embedding lookup so refine tests can craft
    exact novelty structure; records every embed_paths call."""

    def __init__(self, emb_by_path, l2_normalize=True):
        self.emb_by_path = {k: np.asarray(v, np.float32)
                            for k, v in emb_by_path.items()}
        self.l2_normalize = l2_normalize
        self.out_dim = next(iter(self.emb_by_path.values())).shape[0]
        self.calls = []

    def embed_paths(self, paths, num_workers=8, use_native=False):
        self.calls.append(list(paths))
        out = np.stack([self.emb_by_path[p] for p in paths])
        if self.l2_normalize:
            out = out / np.maximum(
                np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_refine_quiet_content_is_free():
    """Identical keyframes -> zero novelty -> no second embed call, and
    the output equals plain interpolation."""
    e = [1.0, 0.0, 0.0]
    paths = [f"p{i}" for i in range(9)]
    eng = _ScriptedEngine({p: e for p in paths})
    stats = {}
    out = embed_video_strided(eng, paths, stride=4, refine_threshold=0.05,
                              stats=stats)
    assert stats == {"gaps": 2, "refined_gaps": 0, "refined_frames": 0,
                     "keys": 3, "keys_s": stats["keys_s"],
                     "novelty_p50": stats["novelty_p50"],
                     "novelty_max": stats["novelty_max"]}
    assert stats["novelty_max"] < 1e-6
    assert len(eng.calls) == 1  # keyframes only
    np.testing.assert_allclose(out, np.tile(_unit(e), (9, 1)), atol=1e-6)


def test_refine_hot_gap_gets_exact_embeddings():
    """A cut inside one gap: that gap's interior frames are re-embedded
    exactly instead of blended between the two sides."""
    e1, e2 = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    paths = [f"p{i}" for i in range(12)]
    # frames 0-3 content A, frames 4-11 content B; stride-4 keys are
    # p0 (A), p4/p8/p11 (B) -> only gap 0 (p0..p4) is hot
    emb = {p: (e1 if i < 4 else e2) for i, p in enumerate(paths)}
    eng = _ScriptedEngine(emb)
    stats = {}
    out = embed_video_strided(eng, paths, stride=4, refine_threshold=0.05,
                              stats=stats)
    assert stats["gaps"] == 3
    assert stats["refined_gaps"] == 1
    assert stats["refined_frames"] == 3
    assert eng.calls[1] == ["p1", "p2", "p3"]
    # refined interior frames carry their TRUE embedding, not a blend
    for i in (1, 2, 3):
        np.testing.assert_allclose(out[i], _unit(e1), atol=1e-6)
    # un-refined gaps keep the interpolation path (here: constant e2)
    np.testing.assert_allclose(out[5], _unit(e2), atol=1e-6)
    # without refinement the same frames would be smeared blends
    blended = embed_video_strided(eng, paths, stride=4)
    assert float(blended[2] @ _unit(e1)) < 0.95


def test_refine_radius_dilates_neighbouring_gaps():
    e1, e2 = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    paths = [f"p{i}" for i in range(12)]
    emb = {p: (e1 if i < 4 else e2) for i, p in enumerate(paths)}
    eng = _ScriptedEngine(emb)
    stats = {}
    embed_video_strided(eng, paths, stride=4, refine_threshold=0.05,
                        refine_radius=1, stats=stats)
    assert stats["refined_gaps"] == 2  # hot gap 0 + dilated gap 1
    assert eng.calls[1] == ["p1", "p2", "p3", "p5", "p6", "p7"]


def test_refine_threshold_zero_recovers_full_rate():
    """On content where every keyframe differs, threshold 0 degrades to
    exact full-rate embedding everywhere — the right answer there."""
    rng = np.random.default_rng(3)
    paths = [f"p{i}" for i in range(10)]
    emb = {p: rng.normal(size=4) for p in paths}
    eng = _ScriptedEngine(emb)
    out = embed_video_strided(eng, paths, stride=3, refine_threshold=0.0)
    want = eng.embed_paths(paths)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_refine_blind_to_sub_stride_interior_event():
    """Documented LIMIT: an event shorter than the stride that starts
    and ends strictly inside one gap touches no keyframe, so the gate
    cannot see it — pins the docstring's 'choose stride <= shortest
    event' deployment rule."""
    e1, ev = [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]
    paths = [f"p{i}" for i in range(12)]
    emb = {p: (ev if i in (5, 6) else e1) for i, p in enumerate(paths)}
    eng = _ScriptedEngine(emb)
    stats = {}
    embed_video_strided(eng, paths, stride=4, refine_threshold=0.05,
                        refine_radius=2, stats=stats)
    assert stats["refined_frames"] == 0  # keys p0/p4/p8/p11 all agree


def test_refine_rejects_negative_radius():
    import pytest as _pytest

    eng = _ScriptedEngine({"p0": [1.0, 0.0]})
    with _pytest.raises(ValueError, match="refine_radius"):
        embed_video_strided(eng, ["p0"], stride=2, refine_threshold=0.05,
                            refine_radius=-1)


def test_device_interp_matches_host_math():
    """strided_interp_device == embed_video_strided's host interpolation
    on the same keyframes (the device twin the e2e segment bench jits)."""
    from vit_research_tpu.parallel.embed import strided_interp_device

    rng = np.random.default_rng(0)
    n, stride, d = 16, 4, 8
    key_idx = list(range(0, n, stride)) + [n - 1]
    key_embs = rng.normal(size=(len(key_idx), d)).astype(np.float32)

    # Host oracle: the interpolate branch of embed_video_strided,
    # reproduced on raw keys (the function itself embeds from paths).
    out = np.empty((n, d), np.float32)
    for j in range(len(key_idx) - 1):
        i0, i1 = key_idx[j], key_idx[j + 1]
        span = i1 - i0
        w = np.arange(span, dtype=np.float32)[:, None] / span
        out[i0:i1] = (1.0 - w) * key_embs[j] + w * key_embs[j + 1]
    out[n - 1] = key_embs[-1]
    out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)

    got = np.asarray(strided_interp_device(key_embs, stride, n))
    np.testing.assert_allclose(got, out, atol=1e-6)


def test_device_interp_stride1_identity():
    """stride=1 keys carry NO tail key (range(0, n, 1) already ends at
    n-1) — the device twin must accept that host layout as-is."""
    from vit_research_tpu.parallel.embed import strided_interp_device

    rng = np.random.default_rng(1)
    key_embs = rng.normal(size=(6, 4)).astype(np.float32)
    got = np.asarray(strided_interp_device(key_embs, 1, 6))
    want = key_embs / np.maximum(
        np.linalg.norm(key_embs, axis=1, keepdims=True), 1e-12)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_device_interp_validates_shapes():
    import pytest as _pytest

    from vit_research_tpu.parallel.embed import strided_interp_device

    with _pytest.raises(ValueError, match="divide"):
        strided_interp_device(np.zeros((5, 4), np.float32), 3, 16)
    with _pytest.raises(ValueError, match="keys"):
        strided_interp_device(np.zeros((3, 4), np.float32), 4, 16)


def test_refine_single_frame_input_still_populates_stats():
    """ADVICE r4: a single-frame input (one key, zero gaps) with
    refine_threshold set must still fill the stats dict — the dossier
    harness and the CLI print read gaps/refined_* via .get and silently
    reported 0/0 when stats stayed empty."""
    eng = _ScriptedEngine({"p0": [1.0, 0.0, 0.0]})
    stats = {}
    out = embed_video_strided(eng, ["p0"], stride=4, refine_threshold=0.05,
                              stats=stats)
    assert stats == {"gaps": 0, "refined_gaps": 0, "refined_frames": 0,
                     "keys": 1, "keys_s": stats["keys_s"]}
    assert out.shape == (1, 3)
