"""Fused multi-head attention for TPU (Pallas) with an XLA fallback.

The reference runs attention through TF-Model-Garden's
``TransformerEncoderBlock`` (reference: nba_proj/models/vit_backbone.py:159-175)
and tf_keras MHA (nba_proj/models/ratt_v2.py:598-626) — unfused, HBM-bound.
Here the hot path is a Pallas kernel that computes softmax(QK^T/sqrt(d))V
entirely in VMEM, tiled over query blocks so the full score matrix never
touches HBM.

ViT sequence lengths in this framework are modest (197 tokens for p16@224,
325 for p32@432x768, ~1297 for p16@432x768), so each kernel instance keeps
the whole K/V for one (batch, head) in VMEM and tiles only the query axis —
one softmax pass, no streaming-max bookkeeping. The kernel asserts
``T <= MAX_KV_LEN``; longer sequences fall back to XLA (which is where a
streaming flash variant would slot in, but the reference's temporal
hierarchy — chunking + retrieval, SURVEY.md section 5.7 — makes long
attention windows unnecessary by design).

Backward pass: ``jax.custom_vjp`` forwarding to the XLA reference
implementation's VJP — simple, numerically identical to differentiating the
fallback, and XLA fuses it well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vit_research_tpu.ops.common import round_up as _round_up
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_KV_LEN = 4096  # full-K/V-in-VMEM limit; beyond this use the XLA path
_Q_BLOCK = 256
_NEG_INF = -1e30




def xla_attention(q, k, v, *, scale=None):
    """Reference implementation: (B, H, T, d) -> (B, H, T, d)."""
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_actual: int, scale: float):
    # Blocks: q (1, Q_BLOCK, d), k/v (1, T_pad, d), o (1, Q_BLOCK, d).
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale
    # Mask padded key columns.
    t_pad = k.shape[0]
    if t_pad != t_actual:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < t_actual, scores, _NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_attention_fwd_impl(q, k, v, scale: float, interpret: bool = False):
    b, h, t, d = q.shape
    t_pad = _round_up(t, _Q_BLOCK)
    if t_pad != t:
        pad = [(0, 0), (0, 0), (0, t_pad - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    bh = b * h
    qf = q.reshape(bh, t_pad, d)
    kf = k.reshape(bh, t_pad, d)
    vf = v.reshape(bh, t_pad, d)

    grid = (bh, t_pad // _Q_BLOCK)
    kernel = functools.partial(_attn_kernel, t_actual=t, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _Q_BLOCK, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, t_pad, d)[:, :, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention(q, k, v, scale, interpret=False):
    return _pallas_attention_fwd_impl(q, k, v, scale, interpret=interpret)


def _pallas_attention_fwd(q, k, v, scale, interpret=False):
    return (_pallas_attention_fwd_impl(q, k, v, scale, interpret=interpret),
            (q, k, v))


def _pallas_attention_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v, scale=scale), q, k, v)
    return vjp(g)


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def multi_head_attention(q, k, v, *, scale=None, use_pallas: bool = True,
                         interpret: bool = False):
    """Dispatch: Pallas fused kernel on TPU, XLA everywhere else.

    Args:
      q, k, v: (B, H, T, head_dim).
      scale: score scale; default 1/sqrt(head_dim).
      use_pallas: allow the Pallas path.
      interpret: run the Pallas kernel in interpreter mode (CPU testing).
    """
    d = q.shape[-1]
    scale = float(d ** -0.5) if scale is None else float(scale)
    t = q.shape[2]
    if use_pallas and t <= MAX_KV_LEN and (on_tpu() or interpret):
        # interpret=True is the interpreter-mode twin for CPU CI; it goes
        # through the same custom_vjp wrapper so gradients work (the
        # kernel itself has no reverse rule — the vjp falls back to XLA).
        return _pallas_attention(q, k, v, scale, interpret)
    return xla_attention(q, k, v, scale=scale)
