"""Dynamic int8 quantization for the transformer GEMMs (opt-in).

TPU v5e's MXU runs int8 matmuls ~1.8x faster than bf16 (measured
307 TOP/s vs 168 TFLOP/s at the ViT-B MLP shape, BENCH_NOTES.md). This
module
provides ``int8_dot_general`` — a drop-in for ``jax.lax.dot_general``
that dynamically quantizes both operands to symmetric int8 (per-token
activation scales, per-output-channel weight scales), runs the
contraction as s8 x s8 -> s32 on the MXU, dequantizes, and backprops
via a straight-through estimator (QAT-ready). It is injected into the
flax ``nn.Dense``/``nn.DenseGeneral`` layers via their ``dot_general``
argument, so the module structure — and therefore XLA's schedule of the
surrounding graph, measured to matter (BENCH_NOTES.md, "apply-level
rewrites are a trap") — and the parameter tree are unchanged: any
checkpoint loads into the quantized model.

Measured end-to-end at ViT-B/16 embed shapes the dynamic-quantization
elementwise passes offset the MXU gain (throughput ties bf16), so this
is a quantization-aware-training and GEMM-dominated-shape capability,
not an embed-throughput knob. Off the parity path (quantization
perturbs outputs ~1e-2 relative per GEMM); enable via
``ViTConfig(gemm_quant="int8")``; composes with ``tome_r``. No
reference counterpart — the reference runs f32 throughout
(e.g. nba_proj/train/training.py:47-60).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _axmax_scale(x: jnp.ndarray, axes: tuple) -> jnp.ndarray:
    """Symmetric abs-max scale over ``axes`` (kept as size-1 dims)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(s, 1e-12) / 127.0


def _int8_dot_forward(dimension_numbers, lhs, rhs):
    (lc, rc), (lb, rb) = dimension_numbers

    ls = _axmax_scale(lhs, lc)
    rs = _axmax_scale(rhs, rc)
    lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                  -127, 127).astype(jnp.int8)
    rq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / rs),
                  -127, 127).astype(jnp.int8)

    out = lax.dot_general(lq, rq, dimension_numbers,
                          preferred_element_type=jnp.int32)

    ls_free = jnp.squeeze(ls, axis=lc)  # (*lhs_free,)
    rs_free = jnp.squeeze(rs, axis=rc)  # (*rhs_free,)
    scale = ls_free.reshape(ls_free.shape + (1,) * rs_free.ndim) * rs_free
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    return (out.astype(jnp.float32) * scale).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _int8_dot_ste(dimension_numbers, lhs, rhs):
    return _int8_dot_forward(dimension_numbers, lhs, rhs)


def _ste_fwd(dimension_numbers, lhs, rhs):
    return _int8_dot_forward(dimension_numbers, lhs, rhs), (lhs, rhs)


def _ste_bwd(dimension_numbers, res, g):
    # Straight-through estimator: gradients as if the contraction were
    # the unquantized dot evaluated at the same operands (round/clip
    # would otherwise zero every gradient, silently breaking training
    # with gemm_quant enabled). The primal f32 dot inside jax.vjp is
    # unused and DCE'd under jit; only the two transpose contractions
    # remain.
    lhs, rhs = res
    _, vjp = jax.vjp(
        lambda a, b: lax.dot_general(a, b, dimension_numbers), lhs, rhs)
    dl, dr = vjp(g.astype(jnp.promote_types(lhs.dtype, rhs.dtype)))
    return dl, dr


_int8_dot_ste.defvjp(_ste_fwd, _ste_bwd)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with both operands dynamically quantized to int8.

    Scales are per-slice along the non-contracted dims (per token for the
    activations, per output channel for the weights), so the dequantized
    result ``(s8 @ s8).int32 * (s_lhs x s_rhs)`` tracks the f32 product to
    ~1e-2 relative error. Differentiable via a straight-through
    estimator (backward is the unquantized dot's transpose), so
    quantization-aware training works. Batch dims are unsupported (the
    flax dense layers never pass them); ``precision``/
    ``preferred_element_type`` of the float contraction are irrelevant to
    the int8 path and ignored.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:
        raise NotImplementedError("int8_dot_general supports no batch dims")
    lc = tuple(a % lhs.ndim for a in lc)
    rc = tuple(a % rhs.ndim for a in rc)
    return _int8_dot_ste(((lc, rc), (lb, rb)), lhs, rhs)
