"""Minimal joint train-step template: full ViT + RAGHead in one graph.

Equivalent of the reference's template (reference:
nba_proj/train/train_step.py:3-21) — the never-used-but-documented path
where the backbone is NOT frozen and gradients flow through the full ViT.
The multichip version of exactly this step (DP batch sharding + TP weight
sharding) lives in __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vit_research_tpu.train import losses


def make_joint_train_step(vit, proj, head, tx):
    """Returns jitted step(params, opt_state, frames (B,T,H,W,3),
    retrieved (B,K,D), labels (B,)) -> (params, opt_state, loss)."""

    def loss_fn(params, frames, retrieved, labels):
        b, t = frames.shape[:2]
        flat = frames.reshape(b * t, *frames.shape[2:])
        emb = vit.apply(params["vit"], flat)["pooled"]
        emb = emb.reshape(b, t, -1).mean(axis=1)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        z = proj.apply(params["proj"], emb)
        logits, _ = head.apply(params["head"], z, retrieved)
        return losses.bce_with_logits(labels, logits)

    @jax.jit
    def train_step(params, opt_state, frames, retrieved, labels):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, frames, retrieved, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step
