"""Validation-as-testing diagnostics.

The reference's training loops carry a battery of per-epoch diagnostic
invariants instead of tests (SURVEY.md section 4):

- retrieval purity / combined-vs-retrieved cosine stats
  (reference: nba_proj/train/training.py:283-353),
- retrieved-label agreement and attention mass on pos vs. neg tokens
  (reference: nba_proj/train/training_chunk_cached.py:1039-1100),
- conditioned embedding separation — same side, close time, different
  video (reference: nba_proj/train/train_chunk_encoder.py:60-123),
- per-branch gradient RMS (reference:
  nba_proj/train/training_stage2.py:1008-1058),
- confusion counts (reference: nba_proj/train/train_chunk_encoder.py:184-213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cosine_stats(a, b):
    """Mean/std cosine similarity between row-aligned embeddings."""
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(an * bn, axis=-1)
    return {"mean": jnp.mean(cos), "std": jnp.std(cos)}


def retrieval_purity(query, retrieved):
    """Mean cosine between each query and its retrieved set (nonzero rows)."""
    qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
    rn = retrieved / (jnp.linalg.norm(retrieved, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.sum(qn[:, None, :] * rn, axis=-1)  # (B, K)
    nonzero = (jnp.linalg.norm(retrieved, axis=-1) > 1e-6).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(nonzero), 1.0)
    return jnp.sum(cos * nonzero) / denom


def label_agreement(retrieved_labels, labels, pad_value: int = -1):
    """Fraction of retrieved tokens whose label matches the anchor's."""
    labels = jnp.reshape(labels, (-1, 1))
    valid = (retrieved_labels != pad_value).astype(jnp.float32)
    agree = (retrieved_labels == labels).astype(jnp.float32) * valid
    return jnp.sum(agree) / jnp.maximum(jnp.sum(valid), 1.0)


def attention_mass_by_label(importance, retrieved_labels, labels,
                            pad_value: int = -1):
    """Attention mass on same-label vs. different-label retrieved tokens."""
    labels = jnp.reshape(labels, (-1, 1))
    valid = (retrieved_labels != pad_value).astype(jnp.float32)
    same = (retrieved_labels == labels).astype(jnp.float32) * valid
    diff = (retrieved_labels != labels).astype(jnp.float32) * valid
    return {
        "mass_same": jnp.mean(jnp.sum(importance * same, axis=1)),
        "mass_diff": jnp.mean(jnp.sum(importance * diff, axis=1)),
    }


def conditioned_separation(embs, labels, sides, t_centers, vids,
                           time_gap: float = 0.15):
    """Pos-vs-neg cosine gap among comparable pairs: same side, close
    t_center, different video. Host-side numpy (pair enumeration)."""
    embs = np.asarray(embs)
    embs = embs / (np.linalg.norm(embs, axis=-1, keepdims=True) + 1e-8)
    labels = np.reshape(np.asarray(labels), (-1,))
    sides = np.asarray(sides, dtype=object)
    t_centers = np.asarray(t_centers, np.float64)
    vids = np.asarray(vids)

    n = len(labels)
    comparable = (
        (sides[:, None] == sides[None, :])
        & (np.abs(t_centers[:, None] - t_centers[None, :]) <= time_gap)
        & (vids[:, None] != vids[None, :])
    )
    cos = embs @ embs.T
    same = comparable & (labels[:, None] == labels[None, :])
    diff = comparable & (labels[:, None] != labels[None, :])
    pos = float(cos[same].mean()) if same.any() else float("nan")
    neg = float(cos[diff].mean()) if diff.any() else float("nan")
    return {"pos_cos": pos, "neg_cos": neg, "gap": pos - neg}


def confusion_counts(labels, logits):
    labels = jnp.reshape(labels, (-1,)).astype(jnp.int32)
    preds = (jax.nn.sigmoid(jnp.reshape(logits, (-1,))) > 0.5).astype(jnp.int32)
    return {
        "tp": jnp.sum((preds == 1) & (labels == 1)),
        "tn": jnp.sum((preds == 0) & (labels == 0)),
        "fp": jnp.sum((preds == 1) & (labels == 0)),
        "fn": jnp.sum((preds == 0) & (labels == 1)),
    }


def gradient_rms_by_branch(grads, branches=("support", "contrast",
                                            "temporal", "query")):
    """Per-branch gradient RMS (reference computed these with a persistent
    tape; here it's a pure tree reduction over the grad pytree)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for branch in branches:
        total, count = 0.0, 0
        for keypath, leaf in flat:
            path = "/".join(str(getattr(k, "key", k)) for k in keypath)
            if branch in path:
                total = total + jnp.sum(jnp.square(leaf))
                count = count + leaf.size
        out[branch] = jnp.sqrt(total / count) if count else jnp.asarray(0.0)
    return out
