"""Token merging (ToMe) — opt-in ViT speedup, off the parity path.

Implements bipartite soft matching from "Token Merging: Your ViT But
Faster" (Bolya et al., 2022): at every encoder block, the ``r`` most
similar token pairs (similarity = mean attention key, cosine) are merged
by size-weighted average, shrinking the sequence by ``r`` per layer.
Merged token "sizes" are tracked and fed back into attention as a
+log(size) key bias (proportional attention), so a merged token keeps the
attention mass of its constituents.

This changes model outputs, so it is NOT used on any reference-parity
path (the reference has no equivalent; SURVEY.md section 6 lists parity
targets). It exists as the documented speed/accuracy trade for
deployment-scale embedding throughput (TODO.md) — enable with
``ViTConfig(tome_r=...)``.

TPU notes: everything is static-shaped (token counts shrink by the
static ``r`` each layer, so XLA sees one fixed shape per layer).
The scatter in the merge is expressed as a one-hot matmul — (B, r, Dst)
x (B, r, D) on the MXU — instead of an irregular scatter-add, which
Mosaic/XLA handle poorly at small sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bipartite_merge(x: jnp.ndarray, metric: jnp.ndarray,
                    sizes: jnp.ndarray, r: int):
    """Merge ``r`` tokens of ``x`` into their best matches.

    Tokens alternate into source (even positions — includes the CLS token,
    which is protected from merging) and destination (odd positions) sets;
    each source token's nearest destination (cosine over ``metric``) is a
    candidate edge, and the ``r`` strongest edges merge by size-weighted
    mean. Output order is [kept sources (CLS first), destinations].

    Args:
      x: (B, T, D) token features.
      metric: (B, T, Dm) matching features (mean attention keys).
      sizes: (B, T) how many original tokens each current token represents.
      r: number of tokens to remove (clamped to len(src) - 1 so the CLS
        token always survives).

    Returns: (x', sizes') with T' = T - r_eff.
    """
    b, t, d = x.shape
    src_m = metric[:, 0::2]
    dst_m = metric[:, 1::2]
    s, dst_n = src_m.shape[1], dst_m.shape[1]
    r = max(0, min(r, s - 1))
    if r == 0 or dst_n == 0:
        return x, sizes

    def _norm(m):
        return m / jnp.maximum(
            jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)

    scores = jnp.einsum("bsd,bkd->bsk", _norm(src_m.astype(jnp.float32)),
                        _norm(dst_m.astype(jnp.float32)))
    scores = scores.at[:, 0, :].set(-jnp.inf)  # CLS is never a merge source

    node_max = scores.max(axis=-1)            # (B, S)
    node_idx = scores.argmax(axis=-1)         # (B, S) best dst per src
    order = jnp.argsort(-node_max, axis=-1)
    merged = order[:, :r]                     # (B, r) src rows to fold in
    kept = jnp.sort(order[:, r:], axis=-1)    # ascending => CLS stays first

    x_src, x_dst = x[:, 0::2], x[:, 1::2]
    s_src, s_dst = sizes[:, 0::2], sizes[:, 1::2]

    take = lambda a, i: jnp.take_along_axis(a, i, axis=1)  # noqa: E731
    x_unm = take(x_src, kept[..., None])
    s_unm = take(s_src, kept)

    dst_of_merged = take(node_idx, merged)    # (B, r)
    x_merged = take(x_src, merged[..., None])  # (B, r, D)
    s_merged = take(s_src, merged)             # (B, r)

    # One-hot matmul scatter: rows of src fold into their dst slots.
    # Size bookkeeping and the weighted mean run in float32 regardless of
    # the token dtype (bf16 sums drift once sizes grow).
    onehot = jax.nn.one_hot(dst_of_merged, dst_n,
                            dtype=jnp.float32)  # (B, r, Dst)
    add_x = jnp.einsum(
        "brk,brd->bkd", onehot,
        x_merged.astype(jnp.float32) * s_merged[..., None])
    add_s = jnp.einsum("brk,br->bk", onehot, s_merged)

    new_s_dst = s_dst + add_s
    new_x_dst = ((x_dst.astype(jnp.float32) * s_dst[..., None] + add_x)
                 / new_s_dst[..., None]).astype(x.dtype)

    x_out = jnp.concatenate([x_unm, new_x_dst], axis=1)
    s_out = jnp.concatenate([s_unm, new_s_dst], axis=1)
    return x_out, s_out
