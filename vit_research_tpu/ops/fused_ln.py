"""Fused LayerNorm + projection (Pallas) with XLA fallback.

In the pre-norm ViT block every projection reads a LayerNorm output:
``qkv = LN(x) @ W_qkv`` and ``h = gelu(LN(y) @ W1)``
(reference block structure: nba_proj/models/vit_backbone.py:159-175).
XLA schedules LN as its own fusion, so the normalized (M, D) tensor makes
a full HBM round trip before each GEMM reads it back. At ViT-B/16 bench
shapes (M = B*T ~ 10^5 rows, bf16) that's ~0.3 GB written + re-read per LN
site per layer — pure bandwidth waste on an HBM-bound model.

This kernel computes the row statistics in-register on the (M_tile, K)
block feeding the MXU, so the normalized tensor never exists in HBM:

    x_tile -> mean/var (f32, VPU) -> normalize * gamma + beta
           -> cast bf16 -> @ W_tile (MXU, f32 accum) -> + bias [-> gelu]

K (the model dim, 768) fits one block, so stats are exact per row.

MEASURED RESULT (v5e, 2026-08-16, ViT-B/16 bench shapes M=512*197, D=768,
bf16 — see BENCH_NOTES.md): this fusion does NOT beat XLA and is not
wired into the model. Site-level it ties XLA's LN+GEMM (~±3%); spliced
into the flax EncoderBlock (param-holder trick, identical tree) the block
runs 19.7 ms/layer vs 17.2 stock — the pallas_call boundary costs XLA
more inter-op fusion/scheduling than the saved LN round trip is worth.
Apply-level forward rewrites fared worse still (hand-composed XLA
versions of the flax block measured +5.6 ms/layer; XLA schedules the
flax-emitted graph best). Kept as a tested building block for shapes
where the LN share is larger; do not re-integrate at ViT-B shapes
without re-measuring.

Backward falls back to the XLA composition via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_research_tpu.ops.common import (VMEM_BUDGET as _VMEM_BUDGET,
                                          round_up as _round_up)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_M_BLOCK = 256




def _erf(x):
    """Polynomial erf (Abramowitz & Stegun 7.1.26, |err| < 1.5e-7) —
    Mosaic implements neither erf nor erfc, only exp."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps: float,
            activation: str | None):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * g_ref[0] + b_ref[0]
    out = jax.lax.dot_general(
        y.astype(w_ref.dtype), w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0]
    if activation == "gelu":
        out = out * 0.5 * (1.0 + _erf(out * (2.0 ** -0.5)))
    elif activation == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_matmul_pallas(x, gamma, beta, w, bias, *, eps, activation,
                      out_dtype, interpret=False):
    m, k = x.shape
    n = w.shape[1]
    m_pad = _round_up(m, _M_BLOCK)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    bytes_per = jnp.dtype(w.dtype).itemsize
    n_block = n if (k * n * bytes_per) <= _VMEM_BUDGET else _round_up(
        max(_VMEM_BUDGET // (k * bytes_per), 128), 128)
    grid = (m_pad // _M_BLOCK, pl.cdiv(n, n_block))
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, activation=activation),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_M_BLOCK, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_M_BLOCK, n_block), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, gamma[None, :], beta[None, :], w, bias[None, :])
    return out[:m]


def _ln_matmul_xla(x, gamma, beta, w, bias, *, eps, activation, out_dtype):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = (xc * jax.lax.rsqrt(var + eps) * gamma + beta).astype(w.dtype)
    out = jnp.dot(y, w, preferred_element_type=jnp.float32) + bias
    if activation == "gelu":
        out = jax.nn.gelu(out, approximate=False)
    elif activation == "gelu_tanh":
        out = jax.nn.gelu(out, approximate=True)
    return out.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _ln_matmul(x, gamma, beta, w, bias, eps, activation, out_dtype,
               interpret):
    return _ln_matmul_pallas(x, gamma, beta, w, bias, eps=eps,
                             activation=activation, out_dtype=out_dtype,
                             interpret=interpret)


def _fwd(x, gamma, beta, w, bias, eps, activation, out_dtype, interpret):
    out = _ln_matmul(x, gamma, beta, w, bias, eps, activation, out_dtype,
                     interpret)
    return out, (x, gamma, beta, w, bias)


def _bwd(eps, activation, out_dtype, interpret, res, g):
    x, gamma, beta, w, bias = res
    _, vjp = jax.vjp(
        lambda *a: _ln_matmul_xla(*a, eps=eps, activation=activation,
                                  out_dtype=out_dtype), x, gamma, beta, w,
        bias)
    return vjp(g)


_ln_matmul.defvjp(_fwd, _bwd)


def ln_matmul(x, gamma, beta, w, bias=None, *, eps: float = 1e-6,
              activation: str | None = None, out_dtype=None,
              use_pallas: bool = True, interpret: bool = False):
    """``activation(LayerNorm(x; gamma, beta) @ w + bias)`` in one pass.

    Args:
      x: (..., K) input; leading dims are flattened into rows.
      gamma, beta: (K,) LayerNorm scale/bias.
      w: (K, N) projection. bias: (N,) or None.
      activation: None | 'gelu' | 'gelu_tanh' (exact / tanh-approx).
      out_dtype: output dtype (defaults to w.dtype).
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = w.shape[1]
    out_dtype = out_dtype or w.dtype
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)
    x2 = x.reshape(-1, k)
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas and (on_tpu or interpret):
        out = _ln_matmul(x2, gamma, beta, w, bias, eps, activation,
                         out_dtype, interpret)
    else:
        out = _ln_matmul_xla(x2, gamma, beta, w, bias, eps=eps,
                             activation=activation, out_dtype=out_dtype)
    return out.reshape(*lead, n)
