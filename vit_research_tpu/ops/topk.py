"""Exact masked top-k similarity search on device.

The reference's retrieval is ChromaDB's HNSW (approximate, host-side,
one query at a time — reference: nba_proj/retrieval/frame_retriever.py:41-53)
or an in-process numpy cosine scan (reference:
nba_proj/retrieval/ratt_chunk_retriever.py:123-151). At the corpus sizes
this pipeline sees (<=1M vectors), an exact batched matmul + `lax.top_k`
on the MXU is both faster and exact, and metadata filters become boolean
masks fused into the score matrix. This op is the device query path of
store/vector_store.py and the retrievers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _qct(queries, corpus):
    # dot_general contracting dim 1 of BOTH operands: algebraically
    # queries @ corpus.T with no transpose in the graph. Measured
    # equivalent to the transpose form on v5e at (256, 1M, 768) — XLA
    # fuses the transpose either way (BENCH_NOTES.md 2026-08-17) — but
    # this form states the layout intent directly.
    # Matmul precision stays at the platform default ON PURPOSE
    # (measured 2026-08-17, BENCH_NOTES.md): TPU default (bf16x3-class,
    # ~2.4e-4 cosine-score error) flips ~3% of top-8 ids among genuine
    # near-ties (within 2.4e-4) at 131k random rows — semantically
    # irrelevant for retrieval — while Precision.HIGHEST made the
    # (64, 131k, 768) dot+top_k COMPILE exceed 480 s on this backend
    # (pathological lowering; don't retry). "Exact" here means no ANN
    # approximation; scores carry f32-accumulated default-matmul
    # precision. CPU runs pin highest via test config and are bitwise
    # against numpy.
    return jax.lax.dot_general(queries, corpus, (((1,), (1,)), ((), ())))


def _scores(queries, corpus, metric: str):
    if metric in ("cosine", "ip"):
        # For 'cosine' the caller pre-normalizes the corpus/queries.
        return _qct(queries, corpus)
    if metric == "l2":
        # Negated squared L2 so that "higher is better" uniformly.
        q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)
        c2 = jnp.sum(corpus * corpus, axis=-1)
        return -(q2 - 2.0 * _qct(queries, corpus) + c2[None, :])
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def masked_topk(queries: jax.Array, corpus: jax.Array, mask: jax.Array | None,
                *, k: int, metric: str = "cosine"):
    """Top-k most similar corpus rows per query, honoring a boolean mask.

    Args:
      queries: (Q, D).
      corpus: (N, D).
      mask: broadcastable to (Q, N); True = candidate allowed. None = all.
      k: number of neighbors.
      metric: 'cosine' | 'ip' (dot) | 'l2'.

    Returns:
      (scores, indices): (Q, k) each. Scores are similarities (cosine/dot)
      or negated squared L2. Masked-out entries score NEG_INF.
    """
    s = _scores(queries.astype(jnp.float32), corpus.astype(jnp.float32), metric)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    # Flat lax.top_k. Measured at (256, 1M) on v5e (2026-08-17,
    # BENCH_NOTES.md): flat 30 ms; a two-stage exact top-k (8K-chunk
    # top-k then top-k of candidates) 181 ms (6x worse — the
    # pad/reshape/batched-top_k graph lowers poorly); approx_max_k
    # 29 ms (no win). Flat is optimal here — don't retry those.
    return jax.lax.top_k(s, min(k, corpus.shape[0]))


def quantize_int8(x, eps: float = 1e-12):
    """Per-row symmetric int8 quantization.

    Returns ``(q, scale)`` with ``x ~= q * scale[..., None]`` —
    ``scale = max|row| / 127``. Jittable; used by the int8 device search
    path to hold corpora at 1/4 the HBM footprint — a 10M x 768 corpus
    drops from ~30 GB to ~7.7 GB, fitting one v5e chip. Query latency
    ties f32 at 1M rows (the `lax.top_k` sort dominates, not the scan
    — BENCH_NOTES.md); the capacity is the win.
    """
    x = jnp.asarray(x, jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1) / 127.0
    q = jnp.round(x / jnp.maximum(scale, eps)[..., None])
    return q.astype(jnp.int8), scale


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk_int8(queries_q: jax.Array, queries_scale: jax.Array,
                     corpus_q: jax.Array, corpus_scale: jax.Array,
                     mask: jax.Array | None, *, k: int):
    """int8 variant of :func:`masked_topk` for dot-product similarity
    (callers pre-normalize rows for cosine, as in the f32 path).

    Scores accumulate in int32 on the MXU and rescale to f32 as
    ``s32 * (q_scale x c_scale)`` — exact up to the per-row
    quantization of the inputs.
    """
    s32 = jax.lax.dot_general(
        queries_q, corpus_q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    s = s32.astype(jnp.float32) * (queries_scale[:, None]
                                   * corpus_scale[None, :])
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    return jax.lax.top_k(s, min(k, corpus_q.shape[0]))


def l2_normalize(x, axis=-1, eps: float = 1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)
