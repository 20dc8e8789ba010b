"""Stage 2: RATTHeadV2 over cached sim / contrast / temporal branches.

Equivalent of the reference's most recent loop
(reference: nba_proj/train/training_stage2.py:998-1239,1241-1403):

- determinism: seeded numpy/jax RNGs (the reference pinned seed 12 +
  op determinism, :51-62; JAX is deterministic by construction);
- training consumes the pickled per-chunk cache (``fetch_cache_batch``),
  validation retrieves LIVE against the current collection
  (``fetch_live_batch``) (:1092-1100);
- weighted BCE with ``pos_weight = sqrt(neg/pos)`` computed from the
  training labels (:943-953,1177-1189);
- per-branch gradient RMS diagnostics (:1008-1058) as a pure tree
  reduction instead of a persistent tape;
- run-ID-stamped checkpoints (:1402).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.models.ratt_v2 import RATTHeadV2
from vit_research_tpu.retrieval import cache_stage2 as CS
from vit_research_tpu.train import losses
from vit_research_tpu.train.common import (
    MetricAverager,
    TrainState,
    batch_iterator,
    maybe_resume,
    num_batches,
)
from vit_research_tpu.train.diagnostics import gradient_rms_by_branch
from vit_research_tpu.utils.configs import ExperimentConfig
from vit_research_tpu.train.optim import make_optimizer


def make_step_fns(head: RATTHeadV2, tx, pos_weight: float):
    def loss_fn(params, batch, rng):
        logit, cls_out, aux = head.apply(
            params, batch["query_emb"], batch["sim_embs"],
            batch["contrast_embs"], batch["temporal_embs"],
            train=True, rngs={"dropout": rng})
        loss = losses.bce_with_logits(batch["labels"], logit,
                                      pos_weight=pos_weight)
        return loss, logit

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (loss, logit), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = losses.compute_accuracy(batch["labels"], logit)
        grad_rms = gradient_rms_by_branch(grads)
        return params, opt_state, loss, acc, grad_rms

    @jax.jit
    def eval_step(params, batch):
        logit, _, _ = head.apply(
            params, batch["query_emb"], batch["sim_embs"],
            batch["contrast_embs"], batch["temporal_embs"])
        loss = losses.bce_with_logits(batch["labels"], logit,
                                      pos_weight=pos_weight)
        acc = losses.compute_accuracy(batch["labels"], logit)
        probs = jax.nn.sigmoid(jnp.reshape(logit, (-1,)))
        return loss, acc, probs

    return train_step, eval_step


def _device_batch(raw: dict) -> dict:
    return {
        "query_emb": jnp.asarray(raw["query_emb"], jnp.float32),
        "sim_embs": jnp.asarray(raw["sim_embs"], jnp.float32),
        "contrast_embs": jnp.asarray(raw["contrast_embs"], jnp.float32),
        "temporal_embs": jnp.asarray(raw["temporal_embs"], jnp.float32),
        "labels": jnp.asarray(raw["labels"], jnp.float32),
    }


def train_stage2(train_chunks, val_chunks, cache, *, encode_fn=None,
                 collection=None, cfg: ExperimentConfig | None = None,
                 ckpt_manager=None, seed: int = 12, verbose: bool = False,
                 log_probs_fn=None, init_params=None, resume: bool = False):
    """Args:
      cache: per-chunk stage-2 cache (retrieval/cache_stage2).
      encode_fn / collection: enable LIVE validation retrieval; when
        omitted, validation also reads the cache.
      log_probs_fn: optional callable(epoch, labels, probs) — the
        per-batch label/logit/prob dump hook
        (reference: nba_proj/train/training_stage2.py:1227-1232).
      init_params: optional head params to continue from — the stage-3
        pinned-run path (reference: nba_proj/config_stage3.py:82-88 pins a
        historical RUN_ID's weights instead of a fresh init).
      resume: continue from ckpt_manager's latest checkpoint (params +
        optimizer + step), skipping already-completed epochs."""
    cfg = cfg or ExperimentConfig(name="stage2")
    t = cfg.train
    r = cfg.retrieval
    head = RATTHeadV2(cfg.head)
    d = cfg.head.embed_dim
    base_key = jax.random.PRNGKey(seed)
    params = head.init(
        base_key, jnp.zeros((1, d)), jnp.zeros((1, cfg.head.k_sim, d)),
        jnp.zeros((1, cfg.head.k_contrast, d)),
        jnp.zeros((1, cfg.head.k_temporal, d)))
    if init_params is not None:
        params = jax.tree.map(jnp.asarray, init_params)

    train_labels = np.asarray([int(c["label"]) for c in train_chunks])
    pos_weight = float(losses.sqrt_pos_weight(
        jnp.asarray(train_labels, jnp.float32)))

    steps = max(num_batches(len(train_chunks), t.batch_size), 1)
    tx = make_optimizer(t, steps)
    state = TrainState(params=params, opt_state=tx.init(params))
    state, start_epoch = maybe_resume(ckpt_manager, state, resume)
    train_step, eval_step = make_step_fns(head, tx, pos_weight)

    history = []
    # Encode the validation pool ONCE: encode_fn is the frozen stage-1
    # encoder, so the embeddings are identical across batches AND epochs
    # (per-batch or per-epoch re-encoding wastes O(N) device forwards).
    val_pool_embs = None
    if encode_fn is not None and collection is not None:
        val_pool_embs = {
            CS.make_chunk_key(ch): np.asarray(encode_fn(ch), np.float32)
            for ch in val_chunks}

    for epoch in range(start_epoch, t.num_epochs):
        key = jax.random.fold_in(base_key, epoch)  # resume-stable RNG
        m = MetricAverager()
        for batch in batch_iterator(train_chunks, t.batch_size,
                                    seed=seed + epoch):
            raw = CS.fetch_cache_batch(cache, batch)
            dev = _device_batch(raw)
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, acc, grad_rms = train_step(
                state.params, state.opt_state, dev, sub)
            state.step += 1
            m.update(train_loss=loss, train_acc=acc,
                     **{f"grad_rms_{k}": float(v)
                        for k, v in grad_rms.items()})

        all_labels, all_probs = [], []
        for batch in batch_iterator(val_chunks, t.batch_size, shuffle=False,
                                    drop_remainder=False):
            if encode_fn is not None and collection is not None:
                raw = CS.fetch_live_batch(
                    batch, encode_fn, collection, k_sim=cfg.head.k_sim,
                    k_contrast=cfg.head.k_contrast,
                    k_temporal=cfg.head.k_temporal,
                    future_step=r.future_chunk_step,
                    search_k_content=r.search_k_content,
                    search_k_temporal=r.search_k_temporal,
                    all_chunks=val_chunks, pool_embs=val_pool_embs)
            else:
                raw = CS.fetch_cache_batch(cache, batch)
            dev = _device_batch(raw)
            loss, acc, probs = eval_step(state.params, dev)
            m.update(val_loss=loss, val_acc=acc)
            all_labels.append(np.asarray(raw["labels"]))
            all_probs.append(np.asarray(probs))

        metrics = m.result()
        if all_labels:
            f1, thr = losses.find_best_f1(
                np.concatenate(all_labels), np.concatenate(all_probs))
            metrics["val_best_f1"] = f1
            metrics["val_best_threshold"] = thr
            if log_probs_fn is not None:
                log_probs_fn(epoch, np.concatenate(all_labels),
                             np.concatenate(all_probs))
        history.append(metrics)
        if verbose:
            print(f"epoch {epoch}: " + " ".join(
                f"{k2}={v:.4f}" for k2, v in metrics.items()))
        if ckpt_manager is not None:
            ckpt_manager.save(epoch, {"params": state.params,
                                      "opt_state": state.opt_state,
                                      "step": state.step}, metrics=metrics)
            ckpt_manager.maybe_update_best(epoch, metrics.get("val_acc", 0))
    return state.params, history
