"""Determinism: same seed => bit-identical training trajectories.

The reference chased reproducibility with seeds + PYTHONHASHSEED +
tf op-determinism (reference: nba_proj/train/training_stage2.py:51-62);
in JAX determinism is structural — verify it end to end anyway."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_training_loops import (  # noqa: E402
    HEAD,
    TRAIN,
    chunk_embed_fn,
    chunk_world,
    fill_collection,
)

from vit_research_tpu.retrieval import cache_stage2 as CS  # noqa: E402
from vit_research_tpu.train.train_stage2 import train_stage2  # noqa: E402
from vit_research_tpu.utils.configs import (  # noqa: E402
    ExperimentConfig,
    RetrievalConfig,
)


def test_stage2_training_is_deterministic():
    chunks = chunk_world(n_vids=2, clips=1, per_clip=8)
    col = fill_collection(chunks)
    encode = lambda ch: chunk_embed_fn([ch])[0]  # noqa: E731
    cache = CS.build_stage2_cache(
        chunks, encode, col, k_sim=HEAD.k_sim, k_contrast=HEAD.k_contrast,
        k_temporal=HEAD.k_temporal, future_step=1)
    cfg = ExperimentConfig(name="stage2", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(future_chunk_step=1))
    train = [c for c in chunks if c["vid"] == 1]
    val = [c for c in chunks if c["vid"] == 2]

    runs = []
    for _ in range(2):
        params, history = train_stage2(train, val, cache, cfg=cfg, seed=12)
        runs.append((params, history))

    h0, h1 = runs[0][1], runs[1][1]
    for a, b in zip(h0, h1):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], atol=0, rtol=0,
                                       err_msg=k)
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(runs[0][0]),
                    jax.tree_util.tree_leaves(runs[1][0])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
