"""ViTConfig.attn_layout='bthd' (transpose-free attention einsums) must
be numerically equivalent to the default 'bhtd' path — same
contractions, different operand layouts. Motivated by the 2026-08-21
device trace: the transpose form costs 29.5 ms/batch of pure layout
copies at B=512 (BENCH_NOTES.md trace table)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.utils.configs import ViTConfig

CFG = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=64,
                num_layers=2, num_heads=4, mlp_dim=128)


def _outputs(cfg, images):
    model, params = init_vit(cfg, seed=0)
    endpoints = model.apply(params, images)  # dict of endpoints
    return params, endpoints


def test_bthd_matches_default_forward():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, size=(3, 32, 32, 3),
                                      dtype=np.uint8))
    params_a, out_a = _outputs(CFG, images)
    cfg_b = dataclasses.replace(CFG, attn_layout="bthd")
    params_b, out_b = _outputs(cfg_b, images)
    # Identical parameter trees (same seed, same tree structure).
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params_a, params_b)
    assert set(out_a) == set(out_b)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=1e-5), out_a, out_b)


def test_bthd_matches_default_grads():
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 3),
                                      dtype=np.uint8))

    def loss(cfg):
        model, params = init_vit(cfg, seed=0)

        def f(p):
            return jnp.sum(model.apply(p, images)["pre_logits"] ** 2)
        return jax.grad(f)(params)

    g_a = loss(CFG)
    g_b = loss(dataclasses.replace(CFG, attn_layout="bthd"))
    flat_a = jax.tree.leaves(g_a)
    flat_b = jax.tree.leaves(g_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=1e-4)


def test_bthd_output_metric_and_scores_shapes():
    """ToMe's matching features (head-averaged keys) and attention
    scores keep their contract under the new layout."""
    from vit_research_tpu.models.vit import MultiHeadSelfAttention

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    outs = {}
    for layout in ("bhtd", "bthd"):
        mod = MultiHeadSelfAttention(num_heads=4, attn_layout=layout)
        params = mod.init(jax.random.PRNGKey(0), x)
        out, scores, metric = mod.apply(
            params, x, output_scores=True, output_metric=True)
        assert scores.shape == (2, 4, 9, 9)
        assert metric.shape == (2, 9, 8)
        outs[layout] = (np.asarray(out), np.asarray(scores),
                        np.asarray(metric))
    for a, b in zip(outs["bhtd"], outs["bthd"]):
        np.testing.assert_allclose(b, a, atol=1e-5)
