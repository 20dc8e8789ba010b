"""Batched metadata-filtered retrievers over the vector store.

Re-designs of the reference retrievers with the same call contract —
``retriever(chunk_embs (B, D), metadata{vid, side, t_center, t_width})
-> (B, top_k, D)`` zero-padded, L2-normalized — but one device call per
batch instead of per-sample ANN walks:

- ``FrameRetriever`` (reference: nba_proj/retrieval/frame_retriever.py:9-73)
  issued B sequential Chroma queries with
  ``vid_num != vid AND side == side AND t_norm in [t_center +/- t_width/2]``.
- ``RattChunkRetriever``
  (reference: nba_proj/retrieval/ratt_chunk_retriever.py:62-159) batched
  per side with an in-process numpy cosine scan and per-query masks.

Here both build one boolean mask (B, N) from columnar metadata and run a
single masked matmul + top-k on the MXU (ops/topk.py). Exact, batched,
and the metadata filters are free (fused into the score matrix).
"""

from __future__ import annotations

import functools

import numpy as np

from vit_research_tpu.ops.topk import masked_topk  # noqa: F401 (re-export)


@functools.partial(
    __import__("jax").jit, static_argnames=("k", "metric"))
def _masked_query(q, corpus, c_vids, c_sides, c_times, q_vids, q_sides,
                  t_min, t_max, *, k: int, metric: str = "ip"):
    """Metadata mask built in-graph: only the (B,) query columns upload.

    ``metric`` follows the collection's space: 'ip' (dot over the
    pre-normalized corpus) for cosine collections, negated squared L2
    over the raw corpus for l2 collections — so ranking matches what the
    reference's Chroma space would return for the same collection."""
    import jax.numpy as jnp
    from jax import lax

    mask = (
        (c_vids[None, :] != q_vids[:, None])
        & (c_sides[None, :] == q_sides[:, None])
        & (c_times[None, :] >= t_min[:, None])
        & (c_times[None, :] <= t_max[:, None])
    )
    q = q.astype(jnp.float32)
    if metric == "l2":
        q2 = jnp.sum(q * q, axis=-1, keepdims=True)
        c2 = jnp.sum(corpus * corpus, axis=-1)
        s = -(q2 - 2.0 * (q @ corpus.T) + c2[None, :])
    else:
        s = q @ corpus.T
    s = jnp.where(mask, s, -1e30)
    return lax.top_k(s, k)


def _as_numpy(x):
    if hasattr(x, "numpy"):
        x = x.numpy()
    return np.asarray(x)


def _meta_arrays(metadata, b):
    vids = np.asarray([int(v) for v in _as_numpy(metadata["vid"])[:b]])
    sides_raw = _as_numpy(metadata["side"])[:b]
    sides = np.asarray([
        s.decode() if isinstance(s, bytes) else str(s) for s in sides_raw],
        dtype=object)
    t_center = np.asarray(_as_numpy(metadata["t_center"])[:b], np.float64)
    t_width = np.asarray(_as_numpy(metadata["t_width"])[:b], np.float64)
    return vids, sides, t_center, t_width


class _StoreView:
    """Columnar snapshot of a collection for vectorized mask building."""

    def __init__(self, collection, time_field: str):
        self.collection = collection
        self.time_field = time_field
        self._version = None

    def refresh(self):
        col = self.collection
        n = col.count()
        # Collections mutate between epochs (db_rebuild); re-snapshot
        # when anything changed. Keyed on the collection's mutation
        # counter — (count, array id) misses in-place same-id upserts,
        # which replace rows without changing either.
        version = col._mutations
        if version == self._version:
            return
        self._version = version
        self.embeddings = col._embeddings
        norm = np.linalg.norm(self.embeddings, axis=1, keepdims=True)
        self.normalized = self.embeddings / (norm + 1e-8)
        # Device-resident snapshot: corpus AND metadata columns upload once
        # per snapshot; per-query masks are then built in-graph (shipping a
        # (B, N) bool mask per call dominates at 100k-vector scale).
        import jax.numpy as jnp

        # Ranking follows the collection's space: l2 collections rank by
        # true L2 over the raw rows (reference hnsw:space semantics),
        # cosine/ip by dot over the normalized rows. Returned vectors
        # are L2-normalized either way (reference contract).
        self.metric = "l2" if col.space == "l2" else "ip"
        self.rank_dev = jnp.asarray(
            self.embeddings.astype(np.float32) if self.metric == "l2"
            else self.normalized)
        if n:
            self.vids = np.asarray(
                [int(v) for v in col._column("vid_num")], np.int64)
            self.sides = col._column("side").astype(object)
            self.times = np.asarray(
                [float(t) for t in col._column(self.time_field)], np.float64)
        else:
            self.vids = np.zeros((0,), np.int64)
            self.sides = np.zeros((0,), object)
            self.times = np.zeros((0,), np.float64)
        self.side_ids = {s: i for i, s in enumerate(sorted(set(self.sides)))}
        self.vids_dev = jnp.asarray(self.vids.astype(np.int32))
        self.sides_dev = jnp.asarray(
            np.asarray([self.side_ids[s] for s in self.sides], np.int32))
        self.times_dev = jnp.asarray(self.times.astype(np.float32))


class _BatchedRetriever:
    """Shared engine: mask build + device top-k + pad/normalize."""

    time_field = "t_norm"
    normalize_query = False

    def __init__(self, collection, top_k: int = 10, search_k: int = 200):
        self.collection = collection
        self.top_k = top_k
        self.search_k = search_k  # kept for API parity; exact top-k needs no
        # over-fetch (the reference over-fetched to survive HNSW recall).
        self._view = _StoreView(collection, self.time_field)

    def __call__(self, chunk_embs, metadata):
        q = np.asarray(_as_numpy(chunk_embs), np.float32)
        b, d = q.shape
        if self.normalize_query:
            q = q / (np.linalg.norm(q, axis=1, keepdims=True) + 1e-8)

        view = self._view
        view.refresh()
        n = view.embeddings.shape[0]
        out = np.zeros((b, self.top_k, d), np.float32)
        if n == 0:
            return out

        vids, sides, t_center, t_width = _meta_arrays(metadata, b)
        t_min = (t_center - t_width / 2).astype(np.float32)
        t_max = (t_center + t_width / 2).astype(np.float32)
        # Unknown sides can never match; encode as -1.
        side_ids = np.asarray([view.side_ids.get(s, -1) for s in sides],
                              np.int32)
        scores, idx = _masked_query(
            q, view.rank_dev, view.vids_dev, view.sides_dev,
            view.times_dev, vids.astype(np.int32), side_ids, t_min, t_max,
            k=min(self.top_k, n), metric=view.metric)
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        valid = scores > -1e29
        k = idx.shape[1]
        vecs = view.normalized[idx.reshape(-1)].reshape(b, k, d)
        vecs = np.where(valid[:, :, None], vecs, 0.0)
        out[:, :k] = vecs.astype(np.float32)
        return out


class FrameRetriever(_BatchedRetriever):
    """Frame-level RAG retrieval: filter on ``t_norm``
    (reference: nba_proj/retrieval/frame_retriever.py:41-53)."""

    time_field = "t_norm"
    normalize_query = False


class RattChunkRetriever(_BatchedRetriever):
    """Chunk-level RATT retrieval: filter on ``t_center`` and normalize
    queries (reference: nba_proj/retrieval/ratt_chunk_retriever.py:70-71,
    123-151)."""

    time_field = "t_center"
    normalize_query = True
