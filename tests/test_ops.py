"""Pallas kernels (interpreter mode on CPU) vs. XLA references."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.ops import attention as A
from vit_research_tpu.ops import patch_embed as PE


def test_pallas_attention_matches_xla():
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 3, 197, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    ref = A.xla_attention(q, k, v)
    got = A.multi_head_attention(q, k, v, use_pallas=True, interpret=True)
    # Interpreter mode emulates TPU MXU precision (~bf16 mantissa on the
    # matmuls), so compare at hardware tolerance, not f32 tolerance.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=0)
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).mean()) < 3e-4


def test_pallas_attention_interpret_is_differentiable():
    """interpret=True must route through the custom_vjp wrapper (XLA
    backward) — CPU CI exercises the kernel's gradient wiring."""
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)

    def f(q):
        return A.multi_head_attention(q, k, v, use_pallas=True,
                                      interpret=True).sum()

    g = jax.grad(f)(q)
    g_ref = jax.grad(lambda q: A.xla_attention(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-3, rtol=0)


def test_pallas_attention_padding_independence():
    # t=197 pads to 256 inside the kernel; padded keys must not leak.
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 2, 130, 32
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    ref = A.xla_attention(q, k, v)
    got = A.multi_head_attention(q, k, v, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-3, rtol=0)


def test_patchify_layout_matches_conv():
    # patchify + matmul == strided conv with the same kernel.
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(size=(2, 16, 24, 3)), jnp.float32)
    p, dout = 8, 32
    w = jnp.asarray(rng.normal(size=(p, p, 3, dout)), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        imgs, w, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv = conv.reshape(2, -1, dout)
    rows = PE.patchify(imgs, p)
    mm = rows @ w.reshape(p * p * 3, dout)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(conv),
                               atol=1e-4, rtol=1e-4)


def test_patchify_crops_nondivisible_like_valid_conv():
    # 432x768 @ p32 -> 13x24 grid with the last 16 rows cropped
    # (reference backbone geometry, SURVEY.md section 5.7).
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.normal(size=(1, 44, 40, 3)), jnp.float32)
    p, dout = 16, 8
    w = jnp.asarray(rng.normal(size=(p, p, 3, dout)), jnp.float32)
    conv = jax.lax.conv_general_dilated(
        imgs, w, window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).reshape(1, -1, dout)
    rows = PE.patchify(imgs, p)
    assert rows.shape == (1, 2 * 2, p * p * 3)
    mm = rows @ w.reshape(p * p * 3, dout)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(conv),
                               atol=1e-4, rtol=1e-4)


def test_fused_patch_embed_matches_reference():
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, size=(2, 32, 32, 3)).astype(np.uint8)
    p, dout = 16, 64
    w = jnp.asarray(rng.normal(size=(p * p * 3, dout)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(dout,)), jnp.float32)
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)

    got = PE.fused_patch_embed(
        jnp.asarray(imgs), w, bias, patch_size=p, rescale=1 / 255.0,
        mean=mean, std=std, use_pallas=True, interpret=True)

    x = imgs.astype(np.float32) / 255.0
    x = (x - np.array(mean)) / np.array(std)
    rows = np.asarray(PE.patchify(jnp.asarray(x), p))
    ref = rows @ np.asarray(w) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4, rtol=1e-4)


def test_fused_patch_embed_grad_flows():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
    p, dout = 8, 16
    w = jnp.asarray(rng.normal(size=(p * p * 3, dout)), jnp.float32)
    bias = jnp.zeros((dout,), jnp.float32)

    def loss(w):
        out = PE.fused_patch_embed(
            imgs, w, bias, patch_size=p, use_pallas=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
