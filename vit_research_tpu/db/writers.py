"""One-shot weight/artifact writers.

Equivalents of the reference's init scripts:
- ``init_proj_head`` — build a fresh 768->768 ProjectionHead and save its
  initial weights (reference: nba_proj/models/init_proj_head.py:9-17);
- the random-ViT weight artifact ``vit_random_weights.h5`` saved once and
  loaded by six pipeline stages (reference: nba_proj/write_embeddings.py:243,
  nba_proj/chroma.py:159, nba_proj/finalize_clips.py:125). Here the
  artifact is the seeded-init contract made durable: (config, seed) ->
  params, exported as npz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_research_tpu.models.heads import ProjectionHead
from vit_research_tpu.train.checkpoint import load_params_npz, save_params_npz
from vit_research_tpu.utils.configs import VIT_P32_432x768, ViTConfig


def init_projection_head(path: str, *, input_dim: int = 768,
                         hidden_dim: int = 768, proj_dim: int = 768,
                         seed: int = 0):
    """Create + save initial ProjectionHead weights; returns (model, params)."""
    model = ProjectionHead(input_dim=input_dim, hidden_dim=hidden_dim,
                           proj_dim=proj_dim)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, input_dim)))
    save_params_npz(params, path)
    return model, params


def save_random_vit_weights(path: str, *, config: ViTConfig | None = None,
                            seed: int = 0):
    """Persist the seeded random-ViT feature space the segmentation stack
    is calibrated to. Returns (model, params)."""
    from vit_research_tpu.models.vit import init_vit

    model, params = init_vit(config or VIT_P32_432x768, seed=seed)
    save_params_npz(params, path)
    return model, params


def load_random_vit_weights(path: str, *, config: ViTConfig | None = None):
    from vit_research_tpu.models.vit import init_vit

    model, template = init_vit(config or VIT_P32_432x768, seed=0)
    return model, load_params_npz(template, path)
