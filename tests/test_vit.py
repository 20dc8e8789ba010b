"""ViT backbone: shapes, endpoints, pos-emb interpolation, HF parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_research_tpu.models.vit import (
    VisionTransformer,
    init_vit,
    interpolate_pos_embedding,
)
from vit_research_tpu.utils.configs import ViTConfig

TINY = ViTConfig(
    image_size=(32, 32), patch_size=8, hidden_size=64, num_layers=2,
    num_heads=2, mlp_dim=128, use_flash_attention=False,
)


def test_endpoints_and_shapes():
    model, params = init_vit(TINY, seed=0)
    x = jnp.ones((2, 32, 32, 3))
    out = model.apply(params, x)
    n = TINY.num_patches + 1
    assert out["tokens_before_encoder"].shape == (2, n, 64)
    assert out["encoded_tokens"].shape == (2, n, 64)
    assert out["pooled"].shape == (2, 64)
    assert out["pre_logits"].shape == (2, 64)


def test_seeded_init_contract_deterministic():
    _, p1 = init_vit(TINY, seed=0)
    _, p2 = init_vit(TINY, seed=0)
    _, p3 = init_vit(TINY, seed=1)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert all(np.array_equal(a, b) for a, b in zip(leaves1, leaves2))
    leaves3 = jax.tree_util.tree_leaves(p3)
    assert any(not np.array_equal(a, b) for a, b in zip(leaves1, leaves3))


def test_pos_embedding_interpolation_shapes():
    pos = jnp.arange(1 * 17 * 8, dtype=jnp.float32).reshape(1, 17, 8)
    out = interpolate_pos_embedding(pos, (4, 4), (6, 8), has_cls=True)
    assert out.shape == (1, 49, 8)
    # CLS row untouched.
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])
    # Identity when grids match.
    same = interpolate_pos_embedding(pos, (4, 4), (4, 4), has_cls=True)
    np.testing.assert_array_equal(same, pos)


def test_apply_at_different_resolution():
    # Init at 32x32/p8 grid 4x4, apply at 48x64 -> grid 6x8 via interpolation.
    model, params = init_vit(TINY, seed=0)
    x = jnp.ones((1, 48, 64, 3))
    out = model.apply(params, x)
    assert out["encoded_tokens"].shape == (1, 6 * 8 + 1, 64)


def test_gap_pooler():
    cfg = dataclasses.replace(TINY, pooler="gap")
    model, params = init_vit(cfg, seed=0)
    out = model.apply(params, jnp.ones((1, 32, 32, 3)))
    assert out["pooled"].shape == (1, 64)


def test_attention_scores_endpoint():
    cfg = dataclasses.replace(TINY, output_attention_scores=True)
    model, params = init_vit(cfg, seed=0)
    out = model.apply(params, jnp.ones((1, 32, 32, 3)))
    n = cfg.num_patches + 1
    assert out["attention_scores"].shape == (1, 2, 2, n, n)
    probs = np.asarray(out["attention_scores"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("use_pooler", [False, True])
def test_hf_vit_parity(use_pooler):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8,
    )
    hf = transformers.ViTModel(hf_cfg, add_pooling_layer=use_pooler).eval()

    from vit_research_tpu.models.hf_import import vit_from_torch_model

    model, params, cfg = vit_from_torch_model(hf)
    assert cfg.layer_norm_eps == hf_cfg.layer_norm_eps

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = model.apply(params, jnp.asarray(x))

    ref_tokens = ref.last_hidden_state.numpy()
    got_tokens = np.asarray(out["encoded_tokens"])
    np.testing.assert_allclose(got_tokens, ref_tokens, atol=2e-4, rtol=1e-3)

    # CLS embedding cosine parity (the quantity the pipeline stores).
    ref_cls = ref_tokens[:, 0]
    got_cls = got_tokens[:, 0]
    cos = (ref_cls * got_cls).sum(-1) / (
        np.linalg.norm(ref_cls, axis=-1) * np.linalg.norm(got_cls, axis=-1))
    assert (1 - cos).max() < 1e-5

    if use_pooler:
        ref_pooled = ref.pooler_output.numpy()
        np.testing.assert_allclose(
            np.asarray(out["pre_logits"]), ref_pooled, atol=2e-4, rtol=1e-3)


def test_remat_is_semantics_preserving():
    """remat=True recomputes activations in backward; outputs and grads
    must match the stored-activation path exactly."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.utils.configs import ViTConfig

    base = dict(image_size=(32, 32), patch_size=8, hidden_size=32,
                num_layers=2, num_heads=2, mlp_dim=64,
                use_flash_attention=False)
    m0, p0 = init_vit(ViTConfig(**base), seed=7)
    m1, p1 = init_vit(ViTConfig(**base, remat=True), seed=7)
    jax.tree.map(np.testing.assert_array_equal, p0, p1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, x)["pooled"] ** 2)
        return f

    np.testing.assert_allclose(np.asarray(loss(m0)(p0)),
                               np.asarray(loss(m1)(p1)), rtol=1e-6)
    g0 = jax.grad(loss(m0))(p0)
    g1 = jax.grad(loss(m1))(p1)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), g0, g1)

    # training-mode call (dropout rngs path) also traces under remat
    cfg_d = ViTConfig(**{**base, "dropout_rate": 0.1}, remat=True)
    md, pd = init_vit(cfg_d, seed=7)
    out = md.apply(pd, x, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    assert out["pooled"].shape == (2, 32)
