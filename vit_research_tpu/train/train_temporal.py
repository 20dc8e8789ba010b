"""TemporalHead training: full-sequence Adam on masked cross-entropy.

Equivalent of the reference's PyTorch loop — Adam lr=1e-5, 3000 epochs,
single full-sequence batch, CrossEntropy(ignore_index=-1)
(reference: nba_proj/smarter_generate_clips.py:22-24,244-266) — as one
jitted ``lax.scan`` over update steps: the whole 3000-epoch optimization
is a single device program instead of 3000 Python-loop dispatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.models.temporal_head import (
    TemporalHead,
    masked_cross_entropy,
)


def train_temporal_head(embeddings, labels, *, epochs: int = 3000,
                        lr: float = 1e-5, seed: int = 0,
                        init_params=None, log_every: int = 0):
    """Train on one full sequence.

    Args:
      embeddings: (T, D) float per-frame embeddings.
      labels: (T,) int in {-1, 0, 1, 2}; -1 = ignore.
      init_params: optional warm-start parameter tree (e.g. a previous
        run's params, or a transplant); fresh seeded init when None.
    Returns (model, params, final_loss)."""
    emb = jnp.asarray(embeddings, jnp.float32)[None]  # (1, T, D)
    y = jnp.asarray(labels, jnp.int32)[None]

    model = TemporalHead(embed_dim=emb.shape[-1])
    params = (jax.tree_util.tree_map(jnp.asarray, init_params)
              if init_params is not None
              else model.init(jax.random.PRNGKey(seed), emb))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        return masked_cross_entropy(model.apply(p, emb), y)

    @jax.jit
    def run(params, opt_state):
        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=epochs)
        return params, opt_state, losses

    params, opt_state, losses = run(params, opt_state)
    losses = np.asarray(losses)
    if log_every:
        for i in range(0, epochs, log_every):
            print(f"epoch {i} loss {losses[i]:.4f}")
    return model, params, float(losses[-1])


def predict_probs(model, params, embeddings) -> np.ndarray:
    """(T, D) -> (T, 3) softmax probabilities
    (reference: nba_proj/smarter_generate_clips.py:274-283)."""
    emb = jnp.asarray(embeddings, jnp.float32)[None]
    logits = model.apply(params, emb)[0]
    return np.asarray(jax.nn.softmax(logits, axis=-1))
