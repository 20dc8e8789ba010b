"""IVF (inverted-file) approximate index for large collections.

The exact masked-matmul top-k (ops/topk via store/vector_store) is the
right call at this pipeline's native scale (<=100k chunk embeddings —
SURVEY.md section 5.8) and stays the default. Past ~10^6 vectors the
(Q, N) score matrix stops being free; the classic fix is IVF: k-means
partition the corpus into ``n_lists`` cells, search only the ``nprobe``
cells whose centroids score highest for each query.

Design notes (host-side numpy on purpose):
- probing is a small (Q, n_lists) matmul + per-query cell gathers —
  irregular gathers are a poor fit for the TPU's tiled memory, and the
  corpus at this size lives in host RAM anyway;
- cells store *row indices* into the collection's embedding array, so the
  index never copies the vectors and invalidates cheaply;
- metadata ``where`` filters compose by masking after the probe: the
  candidate pool is the probed cells, so heavily-selective filters should
  use the exact path instead (the collection handles that switch).
"""

from __future__ import annotations

import numpy as np


class IVFIndex:
    def __init__(self, n_lists: int | None = None, nprobe: int = 8,
                 iters: int = 8, seed: int = 0):
        self.n_lists = n_lists
        self.nprobe = nprobe
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None  # (L, D) L2-normalized
        self.cells: list[np.ndarray] = []  # row indices per cell
        self._n = 0

    # ------------------------------------------------------------------ fit

    def fit(self, x: np.ndarray) -> "IVFIndex":
        """K-means over (unit-normalized) rows. ``x`` is the collection's
        embedding array; rows are referenced by index, never copied."""
        n, d = x.shape
        ln = self.n_lists or max(int(np.sqrt(n)), 1)
        ln = min(ln, n)
        rng = np.random.default_rng(self.seed)
        xn = _normalize(x)

        # k-means++ -lite init: sample, then Lloyd iterations on cosine.
        sample = xn[rng.choice(n, size=min(n, 100_000), replace=False)]
        cent = sample[rng.choice(len(sample), size=ln, replace=False)].copy()
        for _ in range(self.iters):
            assign = _chunked_argmax(sample, cent)
            for c in range(ln):
                rows = sample[assign == c]
                if len(rows):
                    cent[c] = rows.mean(axis=0)
            cent = _normalize(cent)

        assign = _chunked_argmax(xn, cent)
        self.centroids = cent
        self.cells = [np.nonzero(assign == c)[0] for c in range(ln)]
        self._n = n
        return self

    def matches(self, n: int) -> bool:
        """Does the fitted index still describe a corpus of n rows?"""
        return self.centroids is not None and self._n == n

    # --------------------------------------------------------------- search

    def search(self, q: np.ndarray, x: np.ndarray, k: int, *,
               mask: np.ndarray | None = None, nprobe: int | None = None,
               extra: np.ndarray | None = None):
        """Approximate cosine top-k.

        Args:
          q: (Q, D) queries. x: the embedding array (its first fit-time
            rows must be the ones passed to fit; rows appended or updated
            since go in ``extra``).
          mask: optional (N,) bool — rows allowed in results.
          extra: row indices searched exactly in addition to the probed
            cells (the collection's post-fit mutation tail).
        Returns (scores, idx): (Q, k) each; invalid slots score -1e30.
        """
        nprobe = min(nprobe or self.nprobe, len(self.cells))
        qn = _normalize(np.asarray(q, np.float32))
        cq = qn @ self.centroids.T  # (Q, L)
        probe = np.argpartition(-cq, kth=nprobe - 1, axis=1)[:, :nprobe]

        n_total = len(x)
        qk = min(k, n_total)
        out_s = np.full((len(qn), qk), -1e30, np.float32)
        out_i = np.zeros((len(qn), qk), np.int64)
        xn = x  # score against raw rows, normalizing candidates on the fly
        tail = (np.asarray(extra, np.int64)
                if extra is not None and len(extra) else None)
        for qi in range(len(qn)):
            cand = np.concatenate([self.cells[c] for c in probe[qi]]) \
                if nprobe else np.empty(0, np.int64)
            if tail is not None:
                cand = np.unique(np.concatenate([cand, tail]))
            if mask is not None and len(cand):
                cand = cand[mask[cand]]
            if not len(cand):
                continue
            rows = xn[cand]
            norms = np.linalg.norm(rows, axis=1)
            s = (rows @ qn[qi]) / np.maximum(norms, 1e-12)
            kk = min(qk, len(cand))
            top = np.argpartition(-s, kth=kk - 1)[:kk]
            order = np.argsort(-s[top], kind="stable")
            top = top[order]
            out_s[qi, :kk] = s[top]
            out_i[qi, :kk] = cand[top]
        return out_s, out_i


def _normalize(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def _chunked_argmax(x: np.ndarray, cent: np.ndarray,
                    chunk: int = 65536) -> np.ndarray:
    out = np.empty(len(x), np.int64)
    for i in range(0, len(x), chunk):
        out[i:i + chunk] = np.argmax(x[i:i + chunk] @ cent.T, axis=1)
    return out
