"""Dynamic int8 quantization for the transformer GEMMs (opt-in).

TPU v5e's MXU runs int8 matmuls at 2x the bf16 peak (394 vs 197
TFLOP/s). This module provides ``int8_dot_general`` — a drop-in for
``jax.lax.dot_general`` that dynamically quantizes both operands to
symmetric int8 (per-token activation scales, per-output-channel weight
scales), runs the contraction as s8 x s8 -> s32 on the MXU, and
dequantizes. It is injected into the flax ``nn.Dense``/``nn.DenseGeneral``
layers via their ``dot_general`` argument, so the module structure — and
therefore XLA's schedule of the surrounding graph, measured to matter
(BENCH_NOTES.md, "apply-level rewrites are a trap") — and the parameter
tree are unchanged: any checkpoint loads into the quantized model.

Off the parity path (quantization perturbs outputs ~1e-2 relative per
GEMM); enable via ``ViTConfig(gemm_quant="int8")`` as a speed/accuracy
trade for deployment-scale embedding, like ``tome_r`` (with which it
composes). No reference counterpart — the reference runs f32 throughout
(e.g. nba_proj/train/training.py:47-60).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _axmax_scale(x: jnp.ndarray, axes: tuple) -> jnp.ndarray:
    """Symmetric abs-max scale over ``axes`` (kept as size-1 dims)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(s, 1e-12) / 127.0


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with both operands dynamically quantized to int8.

    Scales are per-slice along the non-contracted dims (per token for the
    activations, per output channel for the weights), so the dequantized
    result ``(s8 @ s8).int32 * (s_lhs x s_rhs)`` tracks the f32 product to
    ~1e-2 relative error. Batch dims are unsupported (the flax dense
    layers never pass them); ``precision``/``preferred_element_type`` of
    the float contraction are irrelevant to the int8 path and ignored.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:
        raise NotImplementedError("int8_dot_general supports no batch dims")
    lc = tuple(a % lhs.ndim for a in lc)
    rc = tuple(a % rhs.ndim for a in rc)

    ls = _axmax_scale(lhs, lc)
    rs = _axmax_scale(rhs, rc)
    lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                  -127, 127).astype(jnp.int8)
    rq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / rs),
                  -127, 127).astype(jnp.int8)

    out = lax.dot_general(lq, rq, ((lc, rc), (lb, rb)),
                          preferred_element_type=jnp.int32)

    ls_free = jnp.squeeze(ls, axis=lc)  # (*lhs_free,)
    rs_free = jnp.squeeze(rs, axis=rc)  # (*rhs_free,)
    scale = ls_free.reshape(ls_free.shape + (1,) * rs_free.ndim) * rs_free
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    return (out.astype(jnp.float32) * scale).astype(out_dtype)
