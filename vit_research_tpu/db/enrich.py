"""Frame-embedding enrichment: temporal/side/index encodings + fixed
random projection.

Equivalent of the reference's enriched RAG-DB write path
(reference: nba_proj/write_clips_to_ragdb.py:156-224): the base CLS
embedding is concatenated with a randomized-phase temporal sine encoding,
a +/-1 side mask, and a frame-index cosine encoding, weighted
(0.4/0.15/0.35/0.10) and projected back to HIDDEN dims through a fixed
Gaussian matrix.

The reference drew its random phases and projection from an *unseeded*
global RNG — irreproducible across runs. Here they're a seeded contract
(same seed => same enrichment space), vectorized over the batch.
"""

from __future__ import annotations

import numpy as np

ENRICH_DIM = 768
SIDE_DIM = 768
HIDDEN = 768
WEIGHTS = (0.4, 0.15, 0.35, 0.10)


class Enricher:
    def __init__(self, base_dim: int = 768, enrich_dim: int = ENRICH_DIM,
                 side_dim: int = SIDE_DIM, hidden: int = HIDDEN,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.enrich_dim = enrich_dim
        self.side_dim = side_dim
        self.temporal_freqs = np.linspace(5, 300, enrich_dim)
        self.temporal_phases = rng.uniform(0, 2 * np.pi, enrich_dim)
        self.index_freqs = np.linspace(1, 16, enrich_dim)
        total = base_dim + enrich_dim + side_dim + enrich_dim
        self.projection = rng.normal(
            0, 1 / np.sqrt(total), (total, hidden)).astype(np.float32)

    def temporal_encoding(self, t_norm) -> np.ndarray:
        """sin(2*pi*f*t^1.5 + phi) — nonlinear time warp, fast oscillation."""
        t = np.asarray(t_norm, np.float64)[..., None] ** 1.5
        return np.sin(2 * np.pi * self.temporal_freqs * t
                      + self.temporal_phases)

    def side_mask(self, sides) -> np.ndarray:
        s = np.asarray([1.0 if str(x) == "left" else -1.0 for x in sides])
        return np.tile(s[:, None], (1, self.side_dim))

    def frame_index_encoding(self, idx, total_frames) -> np.ndarray:
        t = np.asarray(idx, np.float64)[..., None] / max(total_frames, 1)
        return np.cos(2 * np.pi * self.index_freqs * t)

    def __call__(self, base_embs, t_norms, sides, frame_indices,
                 max_frame_idx: int | None = None) -> np.ndarray:
        """(B, 768) base + metadata -> (B, HIDDEN) enriched embeddings.

        ``max_frame_idx`` is the corpus-level frame-index normalizer;
        callers that write in batches MUST pass it (db/builders computes
        it once over all samples) or the same frame's encoding would
        depend on how the write was batched — breaking the 'same seed =>
        same enrichment space' reproducibility contract. Defaults to the
        per-call max (the reference's per-call behavior,
        nba_proj/write_clips_to_ragdb.py:156-224) for single-shot use.
        """
        base = np.asarray(base_embs, np.float64)
        b = base.shape[0]
        max_idx = (int(max_frame_idx) if max_frame_idx
                   else (int(np.max(frame_indices)) if len(frame_indices)
                         else 1))
        w0, w1, w2, w3 = WEIGHTS
        concat = np.concatenate([
            w0 * base,
            w1 * self.temporal_encoding(t_norms).reshape(b, -1),
            w2 * self.side_mask(sides),
            w3 * self.frame_index_encoding(frame_indices, max_idx),
        ], axis=1).astype(np.float32)
        return concat @ self.projection


def chunk_stats(frame_embs) -> np.ndarray:
    """(B, T, D) -> (B, 3D) concat(mean, mean-delta, std-delta)
    (reference: nba_proj/db_maintainence/db_rebuild_chunk.py:226-232)."""
    import numpy as np

    x = np.asarray(frame_embs, np.float32)
    deltas = x[:, 1:] - x[:, :-1]
    return np.concatenate([
        x.mean(axis=1), deltas.mean(axis=1), deltas.std(axis=1)], axis=-1)


def chunk_stats_jax(frame_embs):
    """jittable twin of :func:`chunk_stats` for in-graph use
    (reference: nba_proj/train/training_ratt.py:188-197)."""
    import jax.numpy as jnp

    x = frame_embs.astype(jnp.float32)
    deltas = x[:, 1:] - x[:, :-1]
    return jnp.concatenate([
        x.mean(axis=1), deltas.mean(axis=1), deltas.std(axis=1)], axis=-1)
