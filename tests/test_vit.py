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


# ----------------------------------------------------------------- ToMe

def test_tome_reduces_tokens_and_tracks_sizes():
    cfg = dataclasses.replace(TINY, tome_r=2)
    model, params = init_vit(cfg, seed=0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    out = model.apply(params, x)
    n = TINY.num_patches + 1  # 17
    n_final = n - cfg.tome_r * cfg.num_layers  # 13
    assert out["encoded_tokens"].shape == (2, n_final, 64)
    assert out["token_sizes"].shape == (2, n_final)
    # Every original token is accounted for in exactly one merged token.
    np.testing.assert_allclose(np.asarray(out["token_sizes"]).sum(-1),
                               n, rtol=1e-5)
    assert out["pooled"].shape == (2, 64)


def test_tome_params_interchangeable_with_plain_vit():
    # Same submodule names => one weight tree serves both forwards.
    cfg = dataclasses.replace(TINY, tome_r=2)
    plain_model, plain_params = init_vit(TINY, seed=3)
    tome_model, tome_params = init_vit(cfg, seed=3)
    s1 = jax.tree_util.tree_structure(plain_params)
    s2 = jax.tree_util.tree_structure(tome_params)
    assert s1 == s2
    x = jnp.ones((1, 32, 32, 3))
    out = tome_model.apply(plain_params, x)  # plain weights, ToMe forward
    assert out["pooled"].shape == (1, 64)


def test_tome_exact_on_duplicate_tokens():
    # With the position table zeroed and a constant image, every patch
    # token is identical, so merging (size-weighted mean of equals) is
    # lossless: the ToMe forward must match the plain forward.
    cfg = dataclasses.replace(TINY, tome_r=2)
    plain_model, params = init_vit(TINY, seed=1)
    tome_model, _ = init_vit(cfg, seed=1)
    params = jax.tree_util.tree_map(lambda a: a, params)  # shallow copy ok
    params = {"params": dict(params["params"])}
    params["params"]["pos_embedding"] = jnp.zeros_like(
        params["params"]["pos_embedding"])
    x = jnp.full((2, 32, 32, 3), 0.25, jnp.float32)
    ref = plain_model.apply(params, x)
    out = tome_model.apply(params, x)
    np.testing.assert_allclose(np.asarray(out["pooled"]),
                               np.asarray(ref["pooled"]), atol=2e-4)
    # gap pooling is size-weighted, so it is exact here too
    cfg_gap = dataclasses.replace(cfg, pooler="gap")
    tiny_gap = dataclasses.replace(TINY, pooler="gap")
    ref = VisionTransformer(tiny_gap).apply(params, x)
    out = VisionTransformer(cfg_gap).apply(params, x)
    np.testing.assert_allclose(np.asarray(out["pooled"]),
                               np.asarray(ref["pooled"]), atol=2e-4)


def test_tome_cls_never_merged():
    # Run with an input whose CLS trajectory we can compare: r=0 vs r>0
    # keeps the CLS slot at index 0 (merge output order is
    # [kept sources (CLS first), destinations]).
    cfg = dataclasses.replace(TINY, tome_r=3)
    model, params = init_vit(cfg, seed=2)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 32, 3)),
                    jnp.float32)
    out = model.apply(params, x)
    sizes = np.asarray(out["token_sizes"])
    # CLS represents only itself — it never absorbed or joined a merge.
    assert sizes[0, 0] == 1.0


def test_tome_rejects_remat_and_scores():
    with pytest.raises(ValueError):
        init_vit(dataclasses.replace(TINY, tome_r=2, remat=True))
    with pytest.raises(ValueError):
        init_vit(dataclasses.replace(
            TINY, tome_r=2, output_attention_scores=True))
