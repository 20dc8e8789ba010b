"""Stage 1: supervised ChunkEncoder training from the memmap frame store.

Equivalent of the reference's stage-1 loop
(reference: nba_proj/train/train_chunk_encoder.py:218-559): batches gather
(B, T, 768) frame embeddings straight from the memmap (no image decode in
the loop), the train step applies label smoothing (0.9 / 0.05), a 0.5x
BCE scale, and gradient clipping 1.0 (:258-294); per-epoch validation
tracks accuracy + confusion counts (:184-213) and the conditioned
embedding-separation metric (:60-123); the best-by-val-acc checkpoint is
kept. The reference's per-block weight pickles (:553-558, written against
attributes ChunkEncoder didn't define) are unnecessary here — Orbax
checkpoints the whole param tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.db.frame_store import gather_chunk_embedding_batch
from vit_research_tpu.models.heads import ChunkEncoder
from vit_research_tpu.train import losses
from vit_research_tpu.train.common import (
    MetricAverager,
    TrainState,
    batch_iterator,
    maybe_resume,
)
from vit_research_tpu.train.diagnostics import (
    confusion_counts,
    conditioned_separation,
)
from vit_research_tpu.train.optim import clip_each_by_norm
from vit_research_tpu.utils.configs import ChunkEncoderConfig


def stage1_optimizer(lr: float, grad_clip: float = 1.0,
                     weight_decay: float = 0.0, adam_eps: float = 1e-7):
    """Per-variable grad clip -> Adam with decoupled weight decay —
    the reference's ``tf.clip_by_norm`` per gradient tensor +
    ``Adam(learning_rate=5e-5, weight_decay=5e-4)`` (keras epsilon 1e-7)
    (reference: nba_proj/train/train_chunk_encoder.py:273-278,440-444)."""
    chain = [clip_each_by_norm(grad_clip)] if grad_clip else []
    chain.append(optax.adamw(lr, eps=adam_eps, weight_decay=weight_decay))
    return optax.chain(*chain)


def make_step_fns(model: ChunkEncoder, tx):
    def loss_fn(params, frame_embs, labels, rng):
        _, logits = model.apply(params, frame_embs, train=True,
                                rngs={"dropout": rng})
        # Label smoothing labels*0.9+0.05 (0 -> 0.05, 1 -> 0.95) and the
        # 0.5x scale, train-side only
        # (reference: nba_proj/train/train_chunk_encoder.py:267-271).
        smooth = labels * 0.9 + 0.05
        loss = 0.5 * losses.bce_with_logits(smooth, logits)
        return loss, logits

    @jax.jit
    def train_step(state_params, opt_state, frame_embs, labels, rng):
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state_params, frame_embs, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, state_params)
        params = optax.apply_updates(state_params, updates)
        acc = losses.compute_accuracy(labels, logits)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_step(params, frame_embs, labels):
        emb, logits = model.apply(params, frame_embs)
        # Validation loss is UNscaled and unsmoothed (the 0.5x smoothing
        # path is train-only; reference:
        # nba_proj/train/train_chunk_encoder.py:284-294).
        loss = losses.bce_with_logits(labels, logits)
        acc = losses.compute_accuracy(labels, logits)
        return emb, logits, loss, acc

    return train_step, eval_step


def train_chunk_encoder(store, chunk_index, train_ids, val_ids, *,
                        config: ChunkEncoderConfig | None = None,
                        num_epochs: int = 10, batch_size: int = 32,
                        lr: float = 5e-5, grad_clip: float = 1.0,
                        weight_decay: float = 5e-4,
                        seed: int = 42, ckpt_manager=None,
                        resume: bool = False, verbose: bool = False):
    """Returns (model, best_params, history). ``resume=True`` continues
    from the manager's latest checkpoint (params + optimizer + step)."""
    config = config or ChunkEncoderConfig()
    model = ChunkEncoder(config)
    t = chunk_index["frame_idx"].shape[1]
    base_key = jax.random.PRNGKey(seed)
    params = model.init(base_key, jnp.zeros((1, t, config.embed_dim)))
    tx = stage1_optimizer(lr, grad_clip, weight_decay)
    state = TrainState(params=params, opt_state=tx.init(params))
    state, start_epoch = maybe_resume(ckpt_manager, state, resume)
    train_step, eval_step = make_step_fns(model, tx)

    labels_all = chunk_index["label"]
    best_acc, best_params = -1.0, state.params
    if resume and ckpt_manager is not None and start_epoch > 0:
        # Carry best-tracking across the crash: without this the resumed
        # run would return the latest params even when an earlier epoch's
        # val_acc was the true best.
        best_step, best_metric = ckpt_manager.best
        if best_step is not None:
            restored_best = ckpt_manager.restore(
                best_step, template={"params": state.params,
                                     "opt_state": state.opt_state,
                                     "step": state.step})
            best_acc, best_params = best_metric, restored_best["params"]
    history = []
    for epoch in range(start_epoch, num_epochs):
        # Per-epoch derived RNG: a resumed run replays the exact keys the
        # uninterrupted run would have used from this epoch on.
        key = jax.random.fold_in(base_key, epoch)
        m = MetricAverager()
        for batch_ids in batch_iterator(list(train_ids), batch_size,
                                        seed=seed + epoch):
            ids = np.asarray(batch_ids)
            frame_embs = jnp.asarray(
                gather_chunk_embedding_batch(store, chunk_index, ids))
            labels = jnp.asarray(labels_all[ids], jnp.float32)
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, acc = train_step(
                state.params, state.opt_state, frame_embs, labels, sub)
            state.step += 1
            m.update(train_loss=loss, train_acc=acc)

        # Validation with confusion + conditioned separation diagnostics.
        conf = {"tp": 0, "tn": 0, "fp": 0, "fn": 0}
        val_embs, val_labels, val_meta = [], [], []
        for batch_ids in batch_iterator(list(val_ids), batch_size,
                                        shuffle=False, drop_remainder=False):
            ids = np.asarray(batch_ids)
            frame_embs = jnp.asarray(
                gather_chunk_embedding_batch(store, chunk_index, ids))
            labels = jnp.asarray(labels_all[ids], jnp.float32)
            emb, logits, loss, acc = eval_step(state.params, frame_embs,
                                               labels)
            m.update(val_loss=loss, val_acc=acc)
            for k, v in confusion_counts(labels, logits).items():
                conf[k] += int(v)
            val_embs.append(np.asarray(emb))
            val_labels.append(np.asarray(labels))
            val_meta.append(ids)

        metrics = m.result()
        metrics.update({f"val_{k}": v for k, v in conf.items()})
        if val_embs:
            ids = np.concatenate(val_meta)
            sep = conditioned_separation(
                np.concatenate(val_embs), np.concatenate(val_labels),
                chunk_index["side"][ids], chunk_index["t_center"][ids],
                chunk_index["vid"][ids])
            metrics["separation_gap"] = sep["gap"]
        history.append(metrics)
        if verbose:
            print(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()
                if isinstance(v, float)))

        val_acc = metrics.get("val_acc", 0.0)
        if val_acc > best_acc:
            best_acc, best_params = val_acc, state.params
        if ckpt_manager is not None:
            ckpt_manager.save(epoch, {"params": state.params,
                                      "opt_state": state.opt_state,
                                      "step": state.step},
                              metrics={k: v for k, v in metrics.items()
                                       if isinstance(v, (int, float))})
            ckpt_manager.maybe_update_best(epoch, val_acc)
    return model, best_params, history


def make_encode_fn(model: ChunkEncoder, params):
    """Frozen-encoder callable for the DB writers / cache builders:
    (B, T, D) -> (chunk_embs, class_logits)."""
    @jax.jit
    def _encode(frame_embs):
        return model.apply(params, frame_embs)

    def encode(frame_embs):
        emb, logit = _encode(jnp.asarray(frame_embs, jnp.float32))
        return np.asarray(emb), np.asarray(logit)

    return encode
