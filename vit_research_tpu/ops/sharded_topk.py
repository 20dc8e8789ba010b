"""Mesh-sharded exact top-k: corpora bigger than one chip's HBM.

The reference's vector search is single-host and single-process —
ChromaDB HNSW walks (reference: nba_proj/retrieval/frame_retriever.py:41-53)
or an in-process numpy cosine scan (reference:
nba_proj/retrieval/ratt_chunk_retriever.py:123-151) — so its corpus is
bounded by one machine's RAM. The TPU-native scaling axis is the device
mesh (SURVEY.md section 5.8): shard the corpus rows across chips, score
each shard locally on that chip's MXU, and merge the per-shard winners
with one tiny `all_gather` over ICI.

Per query batch the collective moves only ``n_dev * k`` candidate
(score, index) pairs — a few KB — never the ``(Q, N)`` score matrix, so
the merge is latency-bound on ICI while capacity and scan throughput
scale linearly with the mesh. One v5e chip holds ~10M x 768 int8 rows
(ops/topk.py); a v5e-8 holds ~80M exact-searchable vectors.

Results are exactly those of the flat single-device path
(ops/topk.py::masked_topk), including tie-breaking: `lax.top_k` breaks
ties toward lower index, shards are gathered in axis-index order, and
global row ids increase with shard id, so the merged candidate order
equals global index order for equal scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_research_tpu.ops.topk import NEG_INF, _scores

__all__ = ["pad_corpus", "place_sharded", "sharded_masked_topk",
           "sharded_masked_topk_int8"]


def pad_corpus(corpus, n_dev: int):
    """Zero-pad corpus rows to a multiple of ``n_dev``. Returns
    ``(padded, n_valid)``; padded rows must be masked out by callers
    (the public entry points below do this automatically)."""
    n = corpus.shape[0]
    pad = (-n) % n_dev
    if pad:
        corpus = jnp.concatenate(
            [jnp.asarray(corpus),
             jnp.zeros((pad,) + corpus.shape[1:], corpus.dtype)], axis=0)
    return corpus, n


def place_sharded(x, mesh: Mesh, axis: str = "data", dim: int = 0):
    """Place an array with dim ``dim`` sharded over ``mesh[axis]`` (rows
    must already be padded to a multiple of the axis size). This is the
    capacity step: each chip holds only its shard in HBM."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def _pad_mask(mask, n: int, n_padded: int):
    """Normalize a caller mask (broadcastable to (Q, N), like the flat
    masked_topk contract) to 2-D (1|Q, n_padded) with padding columns
    False. ``None`` stays ``None`` — padded rows are rejected inside the
    kernel by an index comparison against ``n_valid``, so the unfiltered
    path never materializes (or ships) an all-ones (Q, N) mask."""
    if mask is None:
        return None
    m = jnp.asarray(mask, bool)
    if m.ndim == 1:
        m = m[None]
    if m.shape[1] == 1 and n != 1:
        # Broadcast column masks to full width BEFORE padding; padding a
        # (Q, 1) mask directly would silently mask out every row but 0.
        m = jnp.broadcast_to(m, (m.shape[0], n))
    if m.shape[1] != n:
        raise ValueError(
            f"mask has {m.shape[1]} columns; expected 1 or {n}")
    if n_padded != n:
        m = jnp.concatenate(
            [m, jnp.zeros((m.shape[0], n_padded - n), bool)], axis=1)
    return m


def _local_topk_merge(s, m, axis: str, k: int, n_valid):
    """Mask invalid columns (caller mask + index-based padding-row
    rejection), take the local top-k, then all-gather each shard's
    winners and re-top-k. ``n_valid`` is a TRACED scalar so a growing
    corpus only recompiles when the padded shape changes, not on every
    row-count change (cold compiles cost minutes over the dev tunnel)."""
    local_n = s.shape[1]
    start = jax.lax.axis_index(axis) * local_n
    valid = start + jnp.arange(local_n) < n_valid
    if m is not None:
        valid = valid[None, :] & m
    s = jnp.where(valid, s, NEG_INF)
    s_l, i_l = jax.lax.top_k(s, min(k, local_n))
    i_l = i_l + start
    s_all = jax.lax.all_gather(s_l, axis, axis=1, tiled=True)
    i_all = jax.lax.all_gather(i_l, axis, axis=1, tiled=True)
    top_s, pos = jax.lax.top_k(s_all, k)
    return top_s, jnp.take_along_axis(i_all, pos, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("k", "metric", "mesh", "axis"))
def _sharded_impl(queries, corpus, mask, n_valid, *, k, metric, mesh, axis):
    def local(q, c, nv, *m):
        s = _scores(q.astype(jnp.float32), c.astype(jnp.float32), metric)
        return _local_topk_merge(s, m[0] if m else None, axis, k, nv)

    mask_spec = () if mask is None else (P(None, axis),)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis, None), P()) + mask_spec,
        out_specs=(P(), P()),
        # all_gather makes every shard's output identical; the static
        # replication checker can't see that through the index math.
        check_vma=False)(queries, corpus, n_valid,
                         *(() if mask is None else (mask,)))


@functools.partial(jax.jit,
                   static_argnames=("k", "mesh", "axis"))
def _sharded_int8_impl(queries_q, queries_scale, corpus_q, corpus_scale,
                       mask, n_valid, *, k, mesh, axis):
    def local(qq, qs, cq, cs, nv, *m):
        s32 = jax.lax.dot_general(qq, cq, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qs[:, None] * cs[None, :])
        return _local_topk_merge(s, m[0] if m else None, axis, k, nv)

    mask_spec = () if mask is None else (P(None, axis),)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()) + mask_spec,
        out_specs=(P(), P()), check_vma=False)(
            queries_q, queries_scale, corpus_q, corpus_scale, n_valid,
            *(() if mask is None else (mask,)))


def sharded_masked_topk(queries, corpus, mask=None, *, k: int, mesh: Mesh,
                        axis: str = "data", metric: str = "cosine",
                        n_valid: int | None = None):
    """Exact masked top-k with the corpus row-sharded over ``mesh[axis]``.

    Same contract as ops/topk.py::masked_topk — (Q, D) queries, (N, D)
    corpus, mask broadcastable to (Q, N), similarities out, NEG_INF for
    masked-out fill — but the (N, D) corpus lives sharded across the
    mesh. For >HBM corpora pre-place it with :func:`pad_corpus` +
    :func:`place_sharded` and pass the true row count as ``n_valid``
    (padding rows are zero vectors, which would otherwise score 0 and
    pollute results); an unsharded, unpadded array needs neither.
    Returns replicated (Q, k') ``(scores, indices)`` with
    ``k' = min(k, N)``. Indices of NEG_INF fill entries may point at
    padding rows; callers filter on ``scores > -1e29`` exactly as with
    the flat path.
    """
    n_dev = mesh.shape[axis]
    queries = jnp.asarray(queries)
    corpus_p, n = pad_corpus(corpus, n_dev)
    if n_valid is not None:
        n = n_valid  # pre-padded corpus: only the first n rows are real
    if n == 0:
        raise ValueError("empty corpus")
    m = _pad_mask(mask, n, corpus_p.shape[0])
    return _sharded_impl(queries, corpus_p, m, jnp.int32(n),
                         k=min(k, n), metric=metric, mesh=mesh, axis=axis)


def sharded_masked_topk_int8(queries_q, queries_scale, corpus_q,
                             corpus_scale, mask=None, *, k: int, mesh: Mesh,
                             axis: str = "data", n_valid: int | None = None):
    """int8 variant of :func:`sharded_masked_topk` (dot-product metric,
    callers pre-normalize for cosine). Scores accumulate in int32 on each
    chip's MXU int8 path and rescale to f32 before the merge. A v5e-8
    holds ~80M x 768 int8 rows device-resident."""
    n_dev = mesh.shape[axis]
    queries_q = jnp.asarray(queries_q)
    corpus_p, n = pad_corpus(corpus_q, n_dev)
    if n_valid is not None:
        n = n_valid
    if n == 0:
        raise ValueError("empty corpus")
    scale_p, _ = pad_corpus(jnp.asarray(corpus_scale), n_dev)
    m = _pad_mask(mask, n, corpus_p.shape[0])
    return _sharded_int8_impl(queries_q, jnp.asarray(queries_scale),
                              corpus_p, scale_p, m, jnp.int32(n),
                              k=min(k, n), mesh=mesh, axis=axis)
