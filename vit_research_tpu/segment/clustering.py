"""Embedding-space clustering study + MLP side classifier.

Equivalents of the reference's clustering pipeline
(reference: nba_proj/clustering.py, clustering_per_vid.py):

- class-mean embedding separation distances — the calibration check for
  the random-ViT feature space (reference: nba_proj/clustering.py:43-49,
  reported L<->R 3.862, L<->N 5.243, R<->N 4.360);
- KMeans seeded with class-mean centroids (reference: :69-93) — uses
  sklearn with ``init=centroids`` when available, else a small Lloyd
  iteration;
- an MLP side classifier Dense(512) -> Dense(128) -> softmax(3) with
  class weights (reference: :130-160, saved as ``side_nn.keras``; here
  params save via train/checkpoint.save_params_npz).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

SIDES = ("left", "right", "none")


def class_mean_separation(embeddings, labels) -> dict:
    """Pairwise L2 distances between class-mean embeddings."""
    embeddings = np.asarray(embeddings)
    labels = np.asarray(labels)
    means = {c: embeddings[labels == c].mean(axis=0)
             for c in np.unique(labels)}
    out = {}
    keys = sorted(means)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            out[(int(a), int(b))] = float(np.linalg.norm(means[a] - means[b]))
    return out


def kmeans_with_class_means(embeddings, labels, *, n_iter: int = 50):
    """KMeans initialized at the class means. Returns (centroids,
    assignments)."""
    embeddings = np.asarray(embeddings, np.float64)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    centroids = np.stack([embeddings[labels == c].mean(axis=0)
                          for c in classes])
    try:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=len(classes), init=centroids, n_init=1,
                    max_iter=n_iter)
        assign = km.fit_predict(embeddings)
        return km.cluster_centers_, assign
    except ImportError:
        for _ in range(n_iter):
            d = ((embeddings[:, None, :] - centroids[None]) ** 2).sum(-1)
            assign = d.argmin(axis=1)
            for c in range(len(classes)):
                sel = assign == c
                if sel.any():
                    centroids[c] = embeddings[sel].mean(axis=0)
        return centroids, assign


class SideMLP(nn.Module):
    num_classes: int = 3

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        x = nn.relu(nn.Dense(128, name="fc2")(x))
        return nn.Dense(self.num_classes, name="out")(x)


def train_side_classifier(embeddings, labels, *, num_epochs: int = 50,
                          batch_size: int = 64, lr: float = 1e-3,
                          seed: int = 0, class_weights=None):
    """Returns (model, params, history). ``class_weights`` defaults to
    inverse-frequency (the reference passed explicit class weights)."""
    x = np.asarray(embeddings, np.float32)
    y = np.asarray(labels, np.int32)
    n_classes = int(y.max()) + 1
    if class_weights is None:
        counts = np.bincount(y, minlength=n_classes).astype(np.float64)
        class_weights = counts.sum() / np.maximum(counts * n_classes, 1)
    cw = jnp.asarray(class_weights, jnp.float32)

    model = SideMLP(num_classes=n_classes)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, x.shape[1])))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply(p, xb)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            return jnp.mean(ce * cw[yb]), logits
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == yb).astype(jnp.float32))
        return params, opt_state, loss, acc

    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(num_epochs):
        idx = rng.permutation(len(x))
        losses, accs = [], []
        for s in range(0, len(x) - batch_size + 1, batch_size):
            b = idx[s:s + batch_size]
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(x[b]), jnp.asarray(y[b]))
            losses.append(float(loss))
            accs.append(float(acc))
        history.append({"loss": float(np.mean(losses or [0])),
                        "acc": float(np.mean(accs or [0]))})
    return model, params, history


def classify_sides(model, params, embeddings) -> np.ndarray:
    logits = model.apply(params, jnp.asarray(embeddings, jnp.float32))
    return np.asarray(jnp.argmax(logits, axis=-1))
