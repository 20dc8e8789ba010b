"""Single-frame ViT smoke test.

Equivalent of the reference's eager-mode endpoint-shape check
(reference: nba_proj/vit_prediction.py:38-63) — build the backbone, run
one frame, report every endpoint's shape. Usable as a module:
``python -m vit_research_tpu.evaluate.smoke``.
"""

from __future__ import annotations

import numpy as np


def smoke_test(config=None, seed: int = 0, verbose: bool = True) -> dict:
    import jax.numpy as jnp

    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.utils.configs import VIT_P32_432x768

    config = config or VIT_P32_432x768
    model, params = init_vit(config, seed=seed)
    frame = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, size=(1, *config.image_size, 3)).astype(np.float32))
    out = model.apply(params, frame)
    shapes = {k: tuple(v.shape) for k, v in out.items()}
    if verbose:
        for k, v in shapes.items():
            print(f"{k}: {v}")
    return shapes


if __name__ == "__main__":
    smoke_test()
