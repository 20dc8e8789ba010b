"""Gated GOLDEN parity vs the real ``google/vit-base-patch16-224``.

BASELINE.md's "<=1e-3 cosine drift vs reference embeddings" is proven
architecture-level by test_hf_full_parity.py (random-weight transplant at
the exact production shape). This file makes the claim checkable against
the REAL checkpoint the moment an environment has the weights
(zero-egress images skip, visibly):

- set ``VRT_HF_WEIGHTS=/path/to/vit-base-patch16-224`` (a local
  ``from_pretrained``-loadable directory), or
- have the checkpoint in the local HF cache.

Exercises :func:`models.hf_import.load_hf_vit` against the real
safetensors naming — not only in-memory ``vit_from_torch_model``
transplants — and reproduces the reference's frozen-embedder usage
(reference: nba_proj/train/training.py:37-60 — processor, ViTModel, CLS
token, L2 normalize) end to end through the EmbeddingEngine.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

MODEL = "google/vit-base-patch16-224"


def _checkpoint_source():
    """(source, explicit): a from_pretrained-loadable name/path, or None."""
    path = os.environ.get("VRT_HF_WEIGHTS", "").strip()
    if path:
        return path, True
    return MODEL, False


@pytest.fixture(scope="module")
def hf_model():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    source, explicit = _checkpoint_source()
    try:
        hf = transformers.ViTModel.from_pretrained(
            source, local_files_only=True)
    except Exception as e:
        if explicit:
            # The user pointed at weights; a load failure is a real bug.
            raise AssertionError(
                f"VRT_HF_WEIGHTS={source!r} is set but the checkpoint "
                f"failed to load: {e}") from e
        pytest.skip(
            f"real {MODEL} weights unavailable (no VRT_HF_WEIGHTS, not in "
            "the local HF cache) — golden parity not checkable in this "
            "environment; the transplant test covers the math")
    _ = torch
    return hf.eval(), source


def _fixed_frames(n=4):
    """Deterministic synthetic uint8 frames (decoded-JPEG stand-ins)."""
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(n, 224, 224, 3)).astype(np.uint8)


def test_load_hf_vit_from_saved_safetensors(tmp_path):
    """Ungated: load_hf_vit against a real on-disk safetensors checkpoint
    (random weights, small shape) — proves the from_pretrained path and
    tensor naming work in THIS image, so the gated golden tests below
    can't rot unnoticed until an environment finally has the weights."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from vit_research_tpu.models.hf_import import load_hf_vit

    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8)
    torch.manual_seed(0)
    hf = transformers.ViTModel(cfg).eval()
    hf.save_pretrained(tmp_path / "ckpt")  # writes model.safetensors

    loaded = load_hf_vit(str(tmp_path / "ckpt"), local_files_only=True)
    assert loaded is not None
    model, params, _ = loaded

    x = np.random.default_rng(0).normal(
        scale=0.5, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref_cls = hf(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()[:, 0]
    got_cls = np.asarray(model.apply(params, jnp.asarray(x))["pooled"])
    np.testing.assert_allclose(got_cls, ref_cls, atol=5e-4, rtol=1e-3)


def test_load_hf_vit_real_safetensors(hf_model):
    """load_hf_vit maps the real checkpoint's tensor names end to end."""
    import jax.numpy as jnp
    import torch

    from vit_research_tpu.models.hf_import import load_hf_vit

    hf, source = hf_model
    loaded = load_hf_vit(source, local_files_only=True)
    assert loaded is not None, (
        f"load_hf_vit({source!r}) returned None although "
        "ViTModel.from_pretrained succeeded")
    model, params, cfg = loaded
    assert cfg.hidden_size == 768 and cfg.num_layers == 12

    x = _fixed_frames(2).astype(np.float32) / 255.0
    with torch.no_grad():
        ref_cls = hf(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).last_hidden_state.numpy()[:, 0]
    got_cls = np.asarray(model.apply(params, jnp.asarray(x))["pooled"])
    cos = (ref_cls * got_cls).sum(-1) / (
        np.linalg.norm(ref_cls, axis=-1) * np.linalg.norm(got_cls, axis=-1))
    assert (1 - cos).max() < 1e-3, (1 - cos).max()


def test_engine_matches_reference_embedder_golden(hf_model):
    """EmbeddingEngine on real weights == the reference's
    hf_vit_embed_batch (processor -> ViTModel -> CLS -> L2 normalize),
    within the 1e-3 cosine production budget (BASELINE.md)."""
    import torch
    from transformers import ViTImageProcessor

    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import load_hf_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine

    hf, source = hf_model
    try:
        processor = ViTImageProcessor.from_pretrained(
            source, local_files_only=True)
    except Exception:
        pytest.skip(f"{source}: weights present but no preprocessor config")

    frames = _fixed_frames(4)
    # Reference usage: nba_proj/train/training.py:47-60.
    with torch.no_grad():
        inputs = processor(images=[f for f in frames], return_tensors="pt")
        out = hf(**inputs).last_hidden_state[:, 0].numpy()
    ref = out / np.linalg.norm(out, axis=-1, keepdims=True)

    model, params, _ = load_hf_vit(source, local_files_only=True)
    eng = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=4,
                          endpoint="pooled", l2_normalize=True)
    got = eng.embed_batch(frames)

    cos = (ref * got).sum(-1)
    assert (1 - cos).max() < 1e-3, (1 - cos).max()
