"""The loss zoo used across the training stages.

JAX re-implementations with the reference's exact semantics:

- BCE / weighted BCE with ``pos_weight = sqrt(neg/pos)``
  (reference: nba_proj/train/training_stage2.py:943-953, 1177-1189).
- Simple retrieval contrastive: pull toward own retrieved mean, push from
  the batch-rolled neighbor (reference: nba_proj/train/training.py:62-86).
- Attention-weighted retrieval contrastive + attention entropy
  (reference: nba_proj/train/training_chunk_works.py:100-135).
- In-batch InfoNCE over the chunk-embedding similarity matrix
  (reference: nba_proj/train/training_ratt.py:225-238).
- Supervised contrastive (reference:
  nba_proj/train/training_chunk_cached.py:781-812).
- Retrieval margin with hard negatives and validity masking
  (reference: nba_proj/train/training_chunk_cached.py:815-860).

All are pure functions — jit/pjit-safe, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def l2_normalize(x, axis=-1, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


def bce_with_logits(labels, logits, *, pos_weight=None,
                    label_smoothing: float = 0.0):
    """Mean binary cross-entropy on logits. ``pos_weight`` scales the
    positive term (pass :func:`sqrt_pos_weight` for the stage-2 rule)."""
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    logits = jnp.reshape(logits, (-1,)).astype(jnp.float32)
    if label_smoothing:
        labels = labels * (1.0 - label_smoothing) + 0.5 * label_smoothing
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    pw = 1.0 if pos_weight is None else pos_weight
    per = -(pw * labels * log_p + (1.0 - labels) * log_not_p)
    return jnp.mean(per)


def sqrt_pos_weight(labels):
    """sqrt(neg/pos) from a label batch/dataset
    (reference: nba_proj/train/training_stage2.py:943-953)."""
    labels = jnp.reshape(labels, (-1,)).astype(jnp.float32)
    pos = jnp.maximum(jnp.sum(labels), 1.0)
    neg = jnp.maximum(jnp.sum(1.0 - labels), 1.0)
    return jnp.sqrt(neg / pos)


def compute_accuracy(labels, logits):
    labels = jnp.reshape(labels, (-1,)).astype(jnp.int32)
    preds = (jax.nn.sigmoid(jnp.reshape(logits, (-1,))) > 0.5).astype(jnp.int32)
    return jnp.mean((preds == labels).astype(jnp.float32))


def simple_retrieval_contrastive(q, retrieved):
    """pull = 1 - cos(q, mean(retrieved)); push = cos(q, rolled neighbor)."""
    r_mean = jnp.mean(retrieved, axis=1)
    pos_sim = jnp.sum(q * r_mean, axis=-1)
    r_other = jnp.roll(r_mean, shift=1, axis=0)
    neg_sim = jnp.sum(q * r_other, axis=-1)
    return jnp.mean((1.0 - pos_sim) + neg_sim)


def max_retrieval_contrastive(q, retrieved):
    """The RATT-stage variant of the simple contrastive term: the pull is
    against the BEST-matching retrieved token (max cosine over K), the
    push is a batch-scalar — the mean cosine against the rolled
    neighborhood mean — added to every sample's pull
    (reference: nba_proj/train/training_ratt.py:66-98; kept at weight 0
    in the reference's own loop, exposed here for capability parity)."""
    pos_sim = jnp.max(jnp.sum(q[:, None, :] * retrieved, axis=-1), axis=1)
    r_mean = jnp.mean(retrieved, axis=1)
    push = jnp.mean(jnp.sum(q * jnp.roll(r_mean, shift=1, axis=0), axis=-1))
    return jnp.mean((1.0 - pos_sim) + push)


def attention_weighted_contrastive(q, retrieved, importance):
    """Same pull/push but the retrieved set is attention-pooled with the
    CLS importance weights."""
    r_attn = jnp.sum(importance[:, :, None] * retrieved, axis=1)
    pos_sim = jnp.sum(q * r_attn, axis=-1)
    neg_sim = jnp.sum(q * jnp.roll(r_attn, shift=1, axis=0), axis=-1)
    return jnp.mean((1.0 - pos_sim) + neg_sim)


def attention_entropy(importance, eps: float = 1e-8):
    ent = -jnp.sum(importance * jnp.log(importance + eps), axis=1)
    return jnp.mean(ent)


def in_batch_infonce(z):
    """Cross-entropy of each row's self-similarity against the batch
    (row i's positive is column i)."""
    z = l2_normalize(z)
    sim = z @ z.T
    labels = jnp.arange(z.shape[0])
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(sim, labels))


def supervised_contrastive(z, labels, temperature: float = 0.1):
    labels = jnp.reshape(labels, (-1,)).astype(jnp.int32)
    b = z.shape[0]
    sim = (z @ z.T) / temperature
    self_mask = jnp.eye(b, dtype=bool)
    label_eq = labels[:, None] == labels[None, :]
    pos_mask = label_eq & ~self_mask

    sim = sim - jnp.max(sim, axis=1, keepdims=True)
    exp_sim = jnp.exp(sim) * (~self_mask).astype(jnp.float32)
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-8)

    pos_f = pos_mask.astype(jnp.float32)
    pos_count = jnp.sum(pos_f, axis=1)
    mean_log_prob_pos = jnp.sum(pos_f * log_prob, axis=1) / (pos_count + 1e-8)
    valid = (pos_count > 0).astype(jnp.float32)
    return -jnp.sum(mean_log_prob_pos * valid) / jnp.maximum(
        jnp.sum(valid), 1.0)


def retrieval_margin(anchor, retrieved, is_hard_negative, margin: float = 0.2):
    """Hinge on (mean positive cosine) - (mean hard-negative cosine).

    ``is_hard_negative``: (B, K) with 0 = positive, 1 = hard negative,
    -1 = padding. Samples lacking either side are masked out. Returns
    (loss, diagnostics)."""
    anchor = l2_normalize(anchor)
    retrieved = l2_normalize(retrieved)
    sims = jnp.sum(anchor[:, None, :] * retrieved, axis=-1)

    pos_mask = (is_hard_negative == 0).astype(jnp.float32)
    neg_mask = (is_hard_negative == 1).astype(jnp.float32)
    pos_count = jnp.sum(pos_mask, axis=1)
    neg_count = jnp.sum(neg_mask, axis=1)
    pos_score = jnp.sum(sims * pos_mask, axis=1) / jnp.maximum(pos_count, 1.0)
    neg_score = jnp.sum(sims * neg_mask, axis=1) / jnp.maximum(neg_count, 1.0)

    valid = ((pos_count > 0) & (neg_count > 0)).astype(jnp.float32)
    per = jax.nn.relu(margin - pos_score + neg_score) * valid
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    loss = jnp.sum(per) / denom
    diag = {
        "ret_pos_score": jnp.sum(pos_score * valid) / denom,
        "ret_neg_score": jnp.sum(neg_score * valid) / denom,
        "ret_valid_frac": jnp.mean(valid),
    }
    return loss, diag


def find_best_f1(labels, probs, thresholds=None):
    """Threshold sweep for F1 (reference: nba_proj/train/training.py:105-117).
    Host-side numpy (used in evaluation, not inside jit)."""
    import numpy as np

    labels = np.reshape(np.asarray(labels), (-1,))
    probs = np.reshape(np.asarray(probs), (-1,))
    thresholds = (np.linspace(0.05, 0.95, 50) if thresholds is None
                  else np.asarray(thresholds))
    best_f1, best_t = 0.0, 0.5
    for t in thresholds:
        preds = (probs > t).astype(int)
        tp = np.sum((preds == 1) & (labels == 1))
        fp = np.sum((preds == 1) & (labels == 0))
        fn = np.sum((preds == 0) & (labels == 1))
        f1 = 2 * tp / max(2 * tp + fp + fn, 1)
        if f1 > best_f1:
            best_f1, best_t = float(f1), float(t)
    return best_f1, best_t
