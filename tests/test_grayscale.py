"""Grayscale embedding ablation — the reference's ``USE_GRAYSCALE`` toggle
(reference: nba_proj/db_maintainence/db_rebuild_chunk.py:101-115 and
nba_proj/train/training_chunk_cached.py:473-505).

Covers: the host oracle differentially against BOTH reference drift
variants (uint8 clip+truncate vs float32 unclipped), the device-side
engine conversion against the host oracle, and the ablation contract
(different embeddings, identical shapes/metadata; already-gray input is a
fixed point).
"""

import dataclasses

import numpy as np
import pytest

from _ref_oracle import load_module, load_truncated, stub_set, permissive_module, AnyStub
from vit_research_tpu.data.preprocess import (
    PreprocessSpec,
    normalize_host,
    to_grayscale_3ch,
)
from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.parallel.embed import EmbeddingEngine
from vit_research_tpu.utils.configs import ViTConfig

TINY = ViTConfig(
    image_size=(32, 32), patch_size=8, hidden_size=64, num_layers=2,
    num_heads=2, mlp_dim=128, use_flash_attention=False,
)
SPEC = PreprocessSpec(size=(32, 32))
GRAY_SPEC = dataclasses.replace(SPEC, grayscale=True)


def rand_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 32, 32, 3)).astype(np.uint8)


# ------------------------------------------------------ host oracle parity


@pytest.fixture(scope="module")
def ref_gray_uint8():
    """training_chunk_cached.py's to_grayscale_3ch (uint8 variant)."""
    pytest.importorskip("tensorflow")
    mod = load_module("ref_tcc_gray", "train/training_chunk_cached.py",
                      stub_set("chroma", "hf", "official", "dbm"))
    return mod.to_grayscale_3ch


@pytest.fixture(scope="module")
def ref_gray_float():
    """db_rebuild_chunk.py's to_grayscale_3ch (float32 unclipped variant).

    The module's preamble loads trained projector weights at module scope;
    everything the grayscale helper needs is pure numpy, so the script is
    executed only up to ``def hf_vit_embed_batch`` with the weight-loading
    preamble stubbed."""
    stubs = stub_set("chroma", "hf", "tf", "joblib")
    for name in ("cv2", "config_chunks_cached", "dataset",
                 "models.projection_head"):
        stubs[name] = permissive_module(name)
    stubs["models.projection_head"].ProjectionHead = AnyStub
    mod = load_truncated("ref_dbrc_gray",
                         "db_maintainence/db_rebuild_chunk.py",
                         "def hf_vit_embed_batch", stubs)
    return mod.to_grayscale_3ch


def test_uint8_variant_matches_reference(ref_gray_uint8):
    frames = rand_batch(3, seed=1)
    ours = to_grayscale_3ch(frames)
    ref = ref_gray_uint8(frames)
    assert ours.dtype == ref.dtype == np.uint8
    np.testing.assert_array_equal(ours, ref)


def test_float_variant_matches_reference(ref_gray_float):
    frames = rand_batch(3, seed=2).astype(np.float32)
    ours = to_grayscale_3ch(frames)
    ref = ref_gray_float(frames)
    assert ours.dtype == ref.dtype == np.float32
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-4)


def test_gray_channels_replicated_and_idempotent():
    frames = rand_batch(2, seed=3)
    g = to_grayscale_3ch(frames)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])
    np.testing.assert_array_equal(g[..., 0], g[..., 2])
    # Luminance weights sum to 0.9999, not 1.0 — the reference constants —
    # so a second pass drifts each level by at most 1 (truncation of
    # value*0.9999); exact idempotence is NOT part of the contract.
    g2 = to_grayscale_3ch(g)
    assert np.abs(g2.astype(int) - g.astype(int)).max() <= 1


# ----------------------------------------------------- engine device path


@pytest.fixture(scope="module")
def model_params():
    return init_vit(TINY, seed=0)


@pytest.mark.parametrize("fused", [False, True])
def test_engine_grayscale_matches_host_oracle(model_params, fused):
    """engine(grayscale=True) on RGB == engine(grayscale=False) on
    host-converted frames — the device conversion is byte-exact."""
    model, params = model_params
    kw = dict(batch_size=4, use_fused_patch_embed=fused,
              interpret_pallas=fused)
    gray_eng = EmbeddingEngine(model, params, GRAY_SPEC, **kw)
    rgb_eng = EmbeddingEngine(model, params, SPEC, **kw)
    frames = rand_batch(4, seed=4)
    a = gray_eng.embed_batch(frames)
    b = rgb_eng.embed_batch(to_grayscale_3ch(frames))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_grayscale_changes_embeddings_same_shape(model_params):
    model, params = model_params
    kw = dict(batch_size=4, use_fused_patch_embed=False)
    gray_eng = EmbeddingEngine(model, params, GRAY_SPEC, **kw)
    rgb_eng = EmbeddingEngine(model, params, SPEC, **kw)
    frames = rand_batch(4, seed=5)
    a = gray_eng.embed_batch(frames)
    b = rgb_eng.embed_batch(frames)
    assert a.shape == b.shape and a.dtype == b.dtype
    # Different feature space on colored input. (No fixed-point check on
    # already-gray input: re-graying shifts levels by ~1 — weights sum to
    # 0.9999 + truncation — see test_gray_channels_replicated_and_idempotent.)
    assert np.abs(a - b).max() > 1e-3


def test_normalize_host_honors_grayscale():
    frames = rand_batch(2, seed=6)
    a = normalize_host(frames, GRAY_SPEC)
    b = normalize_host(to_grayscale_3ch(frames),
                       dataclasses.replace(GRAY_SPEC, grayscale=False))
    np.testing.assert_array_equal(a, b)
