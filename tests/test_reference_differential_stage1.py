"""Differential tests: the reference's STAGE-1 TRAINING MODULE
(train/train_chunk_encoder.py) as the oracle.

The module is import-clean (everything under defs + a __main__ guard),
so we load it directly with the Model Garden stand-ins and run its own
``train_step`` / ``val_step`` / ``compute_conditioned_separation``
against our ``vit_research_tpu.train.train_chunk_encoder`` equivalents
with transplanted weights (reference:
nba_proj/train/train_chunk_encoder.py:60-123,250-382,440-444).

What is pinned here (each caught a real divergence while writing):

- label smoothing is ``labels*0.9+0.05`` -> {0.05, 0.95} (we had 0.90
  for positives);
- gradient clipping is per-variable ``tf.clip_by_norm``, not global-norm;
- the validation loss is UNscaled (no 0.5x) and unsmoothed;
- the optimizer is keras ``Adam(weight_decay=...)`` = decoupled AdamW
  with epsilon 1e-7.

Dropout caveat: the reference hardcodes dropout 0.1/0.1/0.2 and its
train_step hardcodes training=True; dropout masks are not comparable
across frameworks, so the train-step differential neutralizes Dropout on
BOTH sides (keras Dropout.call and flax nn.Dropout.__call__ patched to
identity) — everything else (smoothing, 0.5x, BCE, grads, per-var clip)
is live. The optimizer chain is pinned separately on synthetic gradients
with nothing patched.

Skipped when no reference tree is present.
"""

import contextlib
import os

import numpy as np
import pytest

from _ref_oracle import REF_ROOT, load_module, stub_set

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


@pytest.fixture(scope="module")
def tf():
    pytest.importorskip("tf_keras")
    import tensorflow
    return tensorflow


@pytest.fixture(scope="module")
def ref_s1(tf):
    return load_module("ref_train_chunk_encoder",
                       "train/train_chunk_encoder.py", stub_set("garden"))


@contextlib.contextmanager
def _no_dropout(tf):
    """Neutralize dropout in BOTH frameworks (see module docstring)."""
    import flax.linen as nn
    import tf_keras

    patched = []
    for cls in {tf.keras.layers.Dropout, tf_keras.layers.Dropout}:
        patched.append((cls, "call", cls.call))
        cls.call = lambda self, inputs, training=None: inputs
    patched.append((nn.Dropout, "__call__", nn.Dropout.__call__))
    nn.Dropout.__call__ = lambda self, inputs, **kw: inputs
    try:
        yield
    finally:
        for cls, name, orig in patched:
            setattr(cls, name, orig)


class _TrackedRef:
    """Restores the reference-environment variable set (the keras-2/3
    tracking trap — see the _tf_garden module docstring): forward calls
    pass through untouched; ``trainable_variables`` is the union the
    reference's single-keras environment would produce."""

    def __init__(self, model):
        self._model = model

    def __call__(self, *a, **k):
        return self._model(*a, **k)

    @property
    def trainable_variables(self):
        from _tf_garden import tracked_variables
        return tracked_variables(self._model)


def _transplant(ref):
    """Reference ChunkEncoder weights -> our flax param tree (layout
    validated by test_reference_differential_garden.py)."""
    from test_reference_differential_garden import (_blocks_params, _dense,
                                                    _ln)
    return {
        "cls_token": ref.cls_token.numpy(),
        "pos_embedding": ref.pos_embedding.numpy(),
        "norm": _ln(ref.norm),
        "class_head": {"fc": _dense(ref.class_head.layers[0]),
                       "logit": _dense(ref.class_head.layers[2])},
        **_blocks_params(ref.transformer_blocks),
    }


def _build_pair(ref_s1, tf, seed=40):
    """A reference ChunkEncoder + our ChunkEncoder sharing exact weights,
    plus a labeled batch."""
    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    d, n_layers, heads, max_frames, t, b = 32, 2, 4, 8, 8, 6
    ref = ref_s1.ChunkEncoder(hidden_size=d, num_layers=n_layers,
                              num_heads=heads, max_frames=max_frames)
    ref(tf.zeros((2, t, d)), training=False)  # build
    rng = np.random.default_rng(seed)
    frames = rng.normal(size=(b, t, d)).astype(np.float32)
    labels = np.array([1, 0, 1, 0, 1, 1], np.float32)
    cfg = ChunkEncoderConfig(embed_dim=d, num_layers=n_layers,
                             num_heads=heads, mlp_dim=4 * d,
                             max_len=max_frames, dropout_rate=0.0)
    return ref, ChunkEncoder(cfg), frames, labels


def _tree_leaves_with_path(tree, prefix=""):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _tree_leaves_with_path(tree[k], f"{prefix}/{k}")
    else:
        yield prefix, np.asarray(tree)


def test_train_step_matches_reference(ref_s1, tf):
    """One reference train_step with SGD(lr=1) — so the applied delta IS
    the clipped gradient — vs ours: loss, accuracy, and every clipped
    gradient leaf (smoothing 0.9/0.05, 0.5x BCE, per-variable clip)
    (reference: nba_proj/train/train_chunk_encoder.py:258-281)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit_research_tpu.train.optim import clip_each_by_norm
    from vit_research_tpu.train.train_chunk_encoder import make_step_fns

    with _no_dropout(tf):
        ref, ours, frames, labels = _build_pair(ref_s1, tf)
        before = _transplant(ref)

        opt = tf.keras.optimizers.SGD(learning_rate=1.0)
        loss_fn = tf.keras.losses.BinaryCrossentropy(from_logits=True)
        ref_loss, ref_acc = ref_s1.train_step(
            chunk_encoder=_TrackedRef(ref), optimizer=opt, loss_fn=loss_fn,
            frame_embs=tf.convert_to_tensor(frames),
            labels=tf.convert_to_tensor(labels))
        after = _transplant(ref)

        tx = optax.chain(clip_each_by_norm(ref_s1.GRAD_CLIP_NORM),
                         optax.sgd(1.0))
        train_step, _ = make_step_fns(ours, tx)
        params = {"params": jax.tree_util.tree_map(jnp.asarray, before)}
        new_params, _, loss, acc = train_step(
            params, tx.init(params), jnp.asarray(frames),
            jnp.asarray(labels), jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    np.testing.assert_allclose(float(acc), float(ref_acc), atol=0)
    ref_delta = {p: b - a for (p, b), (_, a) in zip(
        _tree_leaves_with_path(before), _tree_leaves_with_path(after))}
    for path, leaf_after in _tree_leaves_with_path(new_params["params"]):
        ours_delta = next(
            b for p, b in _tree_leaves_with_path(before) if p == path
        ) - leaf_after
        np.testing.assert_allclose(ours_delta, ref_delta[path], atol=2e-5,
                                   err_msg=path)


def test_val_step_matches_reference(ref_s1, tf):
    """val_step: the loss is plain (unscaled, unsmoothed) BCE — the 0.5x
    smoothing path is train-only (reference:
    nba_proj/train/train_chunk_encoder.py:284-294)."""
    import jax.numpy as jnp

    from vit_research_tpu.train.train_chunk_encoder import (make_step_fns,
                                                            stage1_optimizer)

    ref, ours, frames, labels = _build_pair(ref_s1, tf, seed=41)
    loss_fn = tf.keras.losses.BinaryCrossentropy(from_logits=True)
    ref_loss, ref_acc = ref_s1.val_step(
        chunk_encoder=ref, loss_fn=loss_fn,
        frame_embs=tf.convert_to_tensor(frames),
        labels=tf.convert_to_tensor(labels))

    _, eval_step = make_step_fns(ours, stage1_optimizer(5e-5))
    emb, logits, loss, acc = eval_step({"params": _transplant(ref)},
                                       jnp.asarray(frames),
                                       jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-6)
    np.testing.assert_allclose(float(acc), float(ref_acc), atol=0)
    assert emb.shape == (frames.shape[0], frames.shape[2])
    assert logits.shape[0] == frames.shape[0]


def test_stage1_optimizer_matches_keras_adam(ref_s1, tf):
    """The full update rule on synthetic gradients over 3 steps:
    per-variable tf.clip_by_norm (norms above AND below the threshold)
    then keras Adam(lr=5e-5, weight_decay=5e-4, eps=1e-7) vs our
    clip_each_by_norm + optax.adamw chain (reference:
    nba_proj/train/train_chunk_encoder.py:273-278,440-444)."""
    import jax.numpy as jnp
    import jax

    from vit_research_tpu.train.train_chunk_encoder import stage1_optimizer

    rng = np.random.default_rng(42)
    vals = {"a": rng.normal(size=(3, 4)).astype(np.float32),
            "b": rng.normal(size=(5,)).astype(np.float32) * 0.02,
            "c": rng.normal(size=(2, 2, 2)).astype(np.float32)}
    # step k gradients: scaled so some leaves exceed norm 1 (clip active)
    # and some stay below (clip is a no-op).
    grad_steps = [
        {k: (v * s).astype(np.float32) for k, v in vals.items()}
        for s in (3.0, 0.01, 0.7)
    ]

    lr, wd, clip = 5e-5, 5e-4, float(ref_s1.GRAD_CLIP_NORM)
    tf_vars = {k: tf.Variable(v) for k, v in vals.items()}
    opt = tf.keras.optimizers.Adam(learning_rate=lr, weight_decay=wd)
    for grads in grad_steps:
        clipped = [tf.clip_by_norm(tf.constant(grads[k]), clip)
                   for k in sorted(tf_vars)]
        opt.apply_gradients(zip(clipped,
                                [tf_vars[k] for k in sorted(tf_vars)]))

    tx = stage1_optimizer(lr, grad_clip=clip, weight_decay=wd)
    params = {k: jnp.asarray(v) for k, v in vals.items()}
    state = tx.init(params)
    for grads in grad_steps:
        updates, state = tx.update(
            {k: jnp.asarray(v) for k, v in grads.items()}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    for k in vals:
        np.testing.assert_allclose(np.asarray(params[k]),
                                   tf_vars[k].numpy(), atol=1e-6,
                                   err_msg=k)


def test_conditioned_separation_matches_reference(ref_s1, tf):
    """compute_conditioned_separation / compute_train_separation_conditioned
    with a shared deterministic encoder: same-side, close-t, diff-video
    pair filters and the pos/neg cosine means (reference:
    nba_proj/train/train_chunk_encoder.py:60-123,331-382). The reference
    samples a random subset first; with max_samples >= n that is a
    permutation and the pairwise means are permutation-invariant."""
    from vit_research_tpu.train.diagnostics import conditioned_separation

    rng = np.random.default_rng(43)
    n, t, d, n_frames = 36, 4, 16, 120
    frame_mm = rng.normal(size=(n_frames, d)).astype(np.float32)
    chunk_indices = rng.integers(0, n_frames, size=(n, t))
    labels = rng.integers(0, 2, size=n).astype(np.float32)
    sides = np.array([("left", "right")[i % 2] for i in range(n)])
    vids = np.array([f"vid{i % 3}" for i in range(n)])
    # two temporal clusters so the 0.08 gap filter both passes and cuts
    t_centers = (np.where(np.arange(n) < n // 2, 0.3, 0.8)
                 + rng.uniform(-0.03, 0.03, size=n)).astype(np.float32)
    w = rng.normal(size=(d, d)).astype(np.float32)

    def ref_encoder(x, training=False):
        return tf.matmul(tf.reduce_mean(x, axis=1), tf.constant(w)), None

    meta = {"side": sides, "vid": vids, "t_center": t_centers}
    np.random.seed(7)
    ref_gap = ref_s1.compute_conditioned_separation(
        ref_encoder, frame_mm, chunk_indices, labels, meta, max_samples=n,
        max_time_gap=0.08)
    np.random.seed(7)
    ref_pos, ref_neg = ref_s1.compute_train_separation_conditioned(
        ref_encoder, frame_mm, chunk_indices, labels, sides, vids,
        t_centers, max_samples=n, max_time_gap=0.08)

    embs = frame_mm[chunk_indices].mean(axis=1) @ w
    ours = conditioned_separation(embs, labels, sides, t_centers, vids,
                                  time_gap=0.08)
    assert ref_gap is not None and ref_pos is not None
    np.testing.assert_allclose(ours["pos_cos"], ref_pos, atol=1e-5)
    np.testing.assert_allclose(ours["neg_cos"], ref_neg, atol=1e-5)
    np.testing.assert_allclose(ours["gap"], ref_gap, atol=1e-5)


def test_stage1_accuracy_matches_reference(ref_s1, tf):
    """compute_accuracy over a logit/label grid incl. both classes
    (reference: nba_proj/train/train_chunk_encoder.py:250-255)."""
    from vit_research_tpu.train.losses import compute_accuracy

    logits = np.array([[-2.0], [0.3], [1.5], [-0.1], [4.0]], np.float32)
    labels = np.array([0, 1, 0, 1, 1], np.float32)
    ref = float(ref_s1.compute_accuracy(tf.constant(labels),
                                        tf.constant(logits)))
    ours = float(compute_accuracy(labels, logits))
    assert ref == ours
