"""Fused normalize + patchify + projection (Pallas) with XLA fallback.

The reference preprocesses frames on the host (cv2/PIL/tf decode, resize,
rescale; reference: nba_proj/loader.py:4-8, nba_proj/dataset.py:262-271)
and then runs a strided Conv2D patch embedding on device
(reference: nba_proj/models/vit_backbone.py:255-349). On TPU the conv with
stride == kernel == patch size is exactly a reshape + matmul, so we fuse
the whole front of the network into one kernel:

    uint8/float image -> (x * a - b)   per-channel affine (rescale+normalize)
                      -> patch rows    (pure layout, done by XLA reshape)
                      -> rows @ W + c  patch projection on the MXU

which saves one full HBM round-trip of the normalized f32 image — the
embedding pipeline is HBM-bound, so this is the hot preprocessing win.

The affine is folded into two K-length vectors (K = P*P*C):
    a_vec[k] = rescale / std[channel(k)],  b_vec[k] = mean[channel(k)] / std[channel(k)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_research_tpu.ops.common import (VMEM_BUDGET as _VMEM_BUDGET,
                                          round_up as _round_up)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256




def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, C) -> (B, N, P*P*C) patch rows. Pure layout transform.

    Row layout is (py, px, c) fastest-last, matching a HWIO conv kernel
    reshaped to (P*P*C, D). Non-divisible trailing rows/cols are cropped,
    matching a VALID-padded strided conv (the reference's p32 backbone at
    432x768 drops the last 16 rows: 432 // 32 = 13 patches)."""
    b, h, w, c = images.shape
    p = patch_size
    gh, gw = h // p, w // p
    if h != gh * p or w != gw * p:
        images = images[:, : gh * p, : gw * p, :]
    x = images.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, c)
    return x.reshape(b, gh * gw, p * p * c)


def fold_affine(patch_size: int, channels: int = 3, *, rescale: float = 1.0,
                mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0)):
    """Fold rescale+normalize into K-length (a, b) vectors."""
    k = patch_size * patch_size * channels
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    a = np.tile(rescale / std, k // channels).astype(np.float32)
    b = np.tile(mean / std, k // channels).astype(np.float32)
    return a, b


def _kernel(rows_ref, w_ref, a_ref, b_ref, bias_ref, o_ref):
    rows = rows_ref[:]
    if rows.dtype == jnp.uint8:
        rows = rows.astype(jnp.int32)  # Mosaic has no direct u8->f32 cast
    rows = rows.astype(jnp.float32)
    x = rows * a_ref[0] - b_ref[0]  # affine rows are (1, K) in VMEM
    o_ref[:] = (
        jax.lax.dot_general(
            x, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias_ref[0]
    ).astype(o_ref.dtype)


def _pallas_rows_project(rows, w, a_vec, b_vec, bias, out_dtype,
                         interpret: bool = False):
    n, k = rows.shape
    d = w.shape[1]
    n_pad = _round_up(n, _ROW_BLOCK)
    if n_pad != n:
        rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    # Tile the output dim so the weight block fits VMEM even at K=3072.
    d_block = d if (k * d * 4) <= _VMEM_BUDGET else _round_up(d // 2, 128)
    grid = (n_pad // _ROW_BLOCK, pl.cdiv(d, d_block))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_block), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, d_block), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows, w, a_vec[None, :], b_vec[None, :], bias[None, :])
    return out[:n]


def _rows_project_xla(rows, w, a_vec, b_vec, bias):
    x = rows.astype(jnp.float32) * a_vec - b_vec
    return x @ w + bias


@jax.custom_vjp
def _rows_project(rows, w, a_vec, b_vec, bias):
    return _pallas_rows_project(rows, w, a_vec, b_vec, bias, jnp.float32)


def _rows_project_fwd(rows, w, a_vec, b_vec, bias):
    return _rows_project(rows, w, a_vec, b_vec, bias), (rows, w, a_vec, b_vec, bias)


def _rows_project_bwd(res, g):
    _, vjp = jax.vjp(_rows_project_xla, *res)
    return vjp(g)


_rows_project.defvjp(_rows_project_fwd, _rows_project_bwd)


def fused_patch_embed(images, w, bias, *, patch_size: int, rescale: float = 1.0,
                      mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0),
                      out_dtype=jnp.float32, use_pallas: bool = True,
                      interpret: bool = False):
    """Normalize + patchify + project in one pass.

    Args:
      images: (B, H, W, C), uint8 or float.
      w: (P*P*C, D) projection weight (HWIO conv kernel reshaped).
      bias: (D,).
    Returns:
      (B, N, D) patch embeddings.
    """
    b = images.shape[0]
    rows = patchify(images, patch_size)
    k = rows.shape[-1]
    rows_flat = rows.reshape(b * rows.shape[1], k)
    a_vec, b_vec = fold_affine(
        patch_size, images.shape[-1], rescale=rescale, mean=mean, std=std)
    a_vec = jnp.asarray(a_vec)
    b_vec = jnp.asarray(b_vec)

    from vit_research_tpu.ops.attention import on_tpu

    if use_pallas and (on_tpu() or interpret):
        if interpret:
            out = _pallas_rows_project(rows_flat, w, a_vec, b_vec, bias,
                                       jnp.float32, interpret=True)
        else:
            out = _rows_project(rows_flat, w, a_vec, b_vec, bias)
    else:
        out = _rows_project_xla(rows_flat, w, a_vec, b_vec, bias)
    return out.astype(out_dtype).reshape(b, -1, w.shape[1])
