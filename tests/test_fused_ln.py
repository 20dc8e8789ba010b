"""Fused LN+GEMM kernel vs the XLA composition (values and gradients).

NOTE: the kernel measured slower than XLA at ViT-B bench shapes and is
intentionally NOT wired into the model — see ops/fused_ln.py's docstring
and BENCH_NOTES.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_research_tpu.ops import fused_ln


def _case(m, k, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(m, k)), dtype)
    gamma = jnp.asarray(rng.normal(1.0, 0.1, size=(k,)), jnp.float32)
    beta = jnp.asarray(rng.normal(0.0, 0.1, size=(k,)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.02, size=(k, n)), dtype)
    b = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    return x, gamma, beta, w, b


@pytest.mark.parametrize("m,k,n", [(256, 256, 128), (300, 128, 384),
                                   (64, 768, 256)])
@pytest.mark.parametrize("act", [None, "gelu", "gelu_tanh"])
def test_ln_matmul_matches_xla(m, k, n, act):
    x, gamma, beta, w, b = _case(m, k, n, jnp.float32)
    got = fused_ln.ln_matmul(x, gamma, beta, w, b, activation=act,
                             interpret=True)
    want = fused_ln._ln_matmul_xla(x, gamma, beta, w, b, eps=1e-6,
                                   activation=act, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ln_matmul_bf16_weights():
    x, gamma, beta, w, b = _case(128, 256, 128, jnp.bfloat16)
    got = fused_ln.ln_matmul(x, gamma, beta, w, b, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = fused_ln._ln_matmul_xla(x, gamma, beta, w, b, eps=1e-6,
                                   activation=None, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.05, rtol=0.05)


def test_ln_matmul_leading_dims_and_no_bias():
    x, gamma, beta, w, _ = _case(8 * 32, 128, 128, jnp.float32)
    x3 = x.reshape(8, 32, 128)
    got = fused_ln.ln_matmul(x3, gamma, beta, w, interpret=True)
    assert got.shape == (8, 32, 128)
    want = fused_ln.ln_matmul(x, gamma, beta, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got).reshape(-1, 128),
                               np.asarray(want), atol=1e-6)


def test_ln_matmul_gradients_match_xla():
    x, gamma, beta, w, b = _case(64, 128, 128, jnp.float32)

    def loss_fused(x, gamma, beta, w, b):
        return fused_ln.ln_matmul(x, gamma, beta, w, b, activation="gelu",
                                  interpret=True).sum()

    def loss_xla(x, gamma, beta, w, b):
        return fused_ln._ln_matmul_xla(
            x, gamma, beta, w, b, eps=1e-6, activation="gelu",
            out_dtype=jnp.float32).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4,
                                   rtol=1e-4)
