"""Golden-value regression: the seeded-init contract must be stable.

The whole segmentation stack is calibrated to one specific random-ViT
feature space (the reference's ``vit_random_weights.h5``,
nba_proj/write_embeddings.py:243). Our contract is (config, seed) ->
deterministic params; these fingerprints freeze it — if a refactor of
models/vit.py changes the init or the forward math, these fail and the
calibration contract is broken (regenerate only deliberately via
``python tests/test_golden_values.py``)."""

import os

import jax.numpy as jnp
import numpy as np

from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.utils.configs import ViTConfig

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "tiny_vit_seed0.npz")
TINY = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                 num_layers=2, num_heads=2, mlp_dim=64,
                 use_flash_attention=False)


def compute_fingerprint():
    model, params = init_vit(TINY, seed=0)
    x = jnp.asarray(
        np.linspace(0, 255, 1 * 32 * 32 * 3, dtype=np.float32)
        .reshape(1, 32, 32, 3))
    out = model.apply(params, x)
    return {
        "pooled": np.asarray(out["pooled"], np.float32),
        "tokens_sum": np.asarray(
            jnp.sum(out["encoded_tokens"], axis=(0, 1)), np.float32),
    }


def test_seeded_init_fingerprint_stable():
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run `python tests/test_golden_values.py`")
    golden = np.load(GOLDEN_PATH)
    got = compute_fingerprint()
    np.testing.assert_allclose(got["pooled"], golden["pooled"],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got["tokens_sum"], golden["tokens_sum"],
                               atol=2e-3, rtol=1e-3)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez(GOLDEN_PATH, **compute_fingerprint())
    print(f"wrote {GOLDEN_PATH}")
