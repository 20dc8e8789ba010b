"""TemporalHead: 1-D CNN over per-frame embedding sequences.

Flax re-design of the reference's PyTorch side classifier
(reference: nba_proj/smarter_generate_clips.py:189-214): five Conv1d
layers 768->256->256->128->64->3 with kernels 9/7/5/3/1 and ReLU, SAME
padding, producing per-frame left/right/none logits. Training uses
cross-entropy with ignore_index=-1 (reference:
nba_proj/smarter_generate_clips.py:244-266); see train/train_temporal.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TemporalHead(nn.Module):
    embed_dim: int = 768
    num_classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, D) embeddings -> (B, T, 3) per-frame logits."""
        x = x.astype(self.dtype)
        specs = [(256, 9), (256, 7), (128, 5), (64, 3)]
        for i, (feat, k) in enumerate(specs):
            x = nn.Conv(feat, kernel_size=(k,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(x)
        return nn.Conv(self.num_classes, kernel_size=(1,), padding="SAME",
                       dtype=self.dtype, name="conv_out")(x)


def masked_cross_entropy(logits, labels, ignore_index: int = -1):
    """Mean CE over frames whose label != ignore_index
    (reference: CrossEntropyLoss(ignore_index=-1),
    nba_proj/smarter_generate_clips.py:251)."""
    logits = logits.reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom
