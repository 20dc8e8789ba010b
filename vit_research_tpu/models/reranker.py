"""Candidate reranker for retrieved chunks.

The reference *imports* ``models.candidate_reranker.CandidateReranker``
(reference: nba_proj/train/training_stage2.py:17) but the module does not
exist in the repo — stage 2 crashes on import unless stubbed, and the
usage is commented out (:33-35). This module provides a *working*
implementation of the evidently-intended capability: score each retrieved
candidate against the query and re-order/trim the retrieved set.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class CandidateReranker(nn.Module):
    """Bilinear query-candidate scorer with an MLP refinement.

    score(q, c) = MLP([q * c, q - c]) — standard lightweight reranker.
    """

    embed_dim: int = 768
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, candidates):
        """query (B, D); candidates (B, K, D) -> scores (B, K)."""
        q = query[:, None, :].astype(self.dtype)
        c = candidates.astype(self.dtype)
        feats = jnp.concatenate([q * c, q - c], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype,
                             name="fc1")(feats))
        return nn.Dense(1, dtype=self.dtype, name="score")(h)[..., 0]

    @staticmethod
    def rerank(scores, candidates, top_k: int | None = None):
        """Sort candidates by descending score; optionally trim to top_k."""
        order = jnp.argsort(-scores, axis=1)
        reordered = jnp.take_along_axis(candidates, order[..., None], axis=1)
        if top_k is not None:
            reordered = reordered[:, :top_k]
        return reordered
