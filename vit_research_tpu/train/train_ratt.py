"""RATT training with chunk-stat embeddings and live chunk retrieval.

Covers two reference loops:
- training_ratt (reference: nba_proj/train/training_ratt.py:188-238):
  chunk representation = 2304-d concat(mean, mean-delta, std-delta) of
  frame embeddings -> 2304->768 ProjectionHead -> RattChunkRetriever ->
  RATTHead; loss = BCE + 0.1 * in-batch InfoNCE (the simple contrastive
  term is kept but zero-weighted, as the reference left it).
- training_chunk_works (reference:
  nba_proj/train/training_chunk_works.py:100-135): adds the
  CLS->retrieved attention importance, the attention-weighted
  contrastive loss and the attention-entropy regularizer
  (``attention_losses=True``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.db.enrich import chunk_stats_jax
from vit_research_tpu.models.heads import (
    ProjectionHead,
    RATTHead,
    cls_retrieval_importance,
)
from vit_research_tpu.train import losses
from vit_research_tpu.train.common import (
    maybe_resume,
    maybe_rebuild_db,
    finish_rebuilds,
    MetricAverager,
    TrainState,
    batch_iterator,
    chunk_metadata_batch,
    num_batches,
)
from vit_research_tpu.train.optim import make_optimizer
from vit_research_tpu.utils.configs import ExperimentConfig


def make_step_fns(proj: ProjectionHead, head: RATTHead, tx, *,
                  ibn_weight: float = 0.1, contrastive_weight: float = 0.0,
                  attention_weight: float = 0.0, entropy_weight: float = 0.0):
    def loss_fn(params, frame_embs, retrieved, labels, rng):
        stats = chunk_stats_jax(frame_embs)  # (B, 3D)
        z = proj.apply(params["proj"], stats)
        ret = jax.lax.stop_gradient(retrieved)
        logit, _, fused, scores = head.apply(
            params["head"], z, ret, train=True, rngs={"dropout": rng})
        loss_cls = losses.bce_with_logits(labels, logit)
        loss_ibn = losses.in_batch_infonce(z)
        loss = loss_cls + ibn_weight * loss_ibn
        terms = {"loss_cls": loss_cls, "loss_ibn": loss_ibn}
        if contrastive_weight:
            # the RATT stage's own variant (max-pull / batch-scalar push),
            # not training.py's mean-pull one
            # (reference: nba_proj/train/training_ratt.py:66-98)
            lc = losses.max_retrieval_contrastive(z, ret)
            loss = loss + contrastive_weight * lc
            terms["loss_contrastive"] = lc
        if attention_weight or entropy_weight:
            importance = cls_retrieval_importance(scores)
            importance = importance / (jnp.sum(importance, axis=1,
                                               keepdims=True) + 1e-8)
            if attention_weight:
                la = losses.attention_weighted_contrastive(z, ret, importance)
                loss = loss + attention_weight * la
                terms["loss_attn_contrastive"] = la
            if entropy_weight:
                le = losses.attention_entropy(importance)
                loss = loss + entropy_weight * le
                terms["loss_attn_entropy"] = le
        return loss, (logit, terms)

    @jax.jit
    def train_step(params, opt_state, frame_embs, retrieved, labels, rng):
        (loss, (logit, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, frame_embs, retrieved, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = losses.compute_accuracy(labels, logit)
        return params, opt_state, loss, acc, terms

    @jax.jit
    def eval_step(params, frame_embs, retrieved, labels):
        stats = chunk_stats_jax(frame_embs)
        z = proj.apply(params["proj"], stats)
        logit, _, _, _ = head.apply(params["head"], z, retrieved)
        return (losses.bce_with_logits(labels, logit),
                losses.compute_accuracy(labels, logit), z)

    return train_step, eval_step


def train_ratt(train_chunks, val_chunks, frame_embs_fn, retriever, *,
               cfg: ExperimentConfig | None = None,
               attention_losses: bool = False,
               contrastive_weight: float = 0.0,
               rebuild_fn=None, rebuild_scheduler=None,
               ckpt_manager=None, resume: bool = False,
               seed: int = 1234, verbose: bool = False):
    """Args:
      frame_embs_fn: callable(batch_chunks) -> (B, T, 768) frame
        embeddings (memmap store gather or live embed engine).
      retriever: RattChunkRetriever-contract callable.
      contrastive_weight: weight on the max-pull retrieval contrastive
        term; 0.0 matches the reference, which hardcodes its
        coefficient to zero (reference: nba_proj/train/training_ratt.py:240).
      rebuild_fn / rebuild_scheduler: chunk-DB rebuild feedback loop,
        every ``rebuild_every`` epochs after validation (reference:
        nba_proj/train/training_ratt.py:560-561 calls
        db_rebuild_ratt.rebuild_db every REBUILD_EVERY epochs). Same
        contract as train_rag: ``rebuild_fn(project_fn)`` synchronous,
        or a train.async_rebuild.RebuildScheduler kicked with the LIVE
        2304->768 chunk projection (``project_fn(frame_embs) -> (B,D)``)
        and swapped at epoch boundaries.
    """
    cfg = cfg or ExperimentConfig(name="ratt")
    t = cfg.train
    d = cfg.head.embed_dim
    proj = ProjectionHead(input_dim=3 * d, hidden_dim=d, proj_dim=d)
    head = RATTHead(cfg.head)
    base_key = jax.random.PRNGKey(seed)
    k = cfg.retrieval.top_k
    params = {
        "proj": proj.init(base_key, jnp.zeros((1, 3 * d))),
        "head": head.init(base_key, jnp.zeros((1, d)), jnp.zeros((1, k, d))),
    }
    steps = max(num_batches(len(train_chunks), t.batch_size), 1)
    tx = make_optimizer(t, steps)
    state = TrainState(params=params, opt_state=tx.init(params))
    state, start_epoch = maybe_resume(ckpt_manager, state, resume)
    aw = 0.1 if attention_losses else 0.0
    ew = 0.01 if attention_losses else 0.0
    train_step, eval_step = make_step_fns(
        proj, head, tx, contrastive_weight=contrastive_weight,
        attention_weight=aw, entropy_weight=ew)

    @jax.jit
    def project(pp, frame_embs):
        return proj.apply(pp, chunk_stats_jax(frame_embs))

    def z_np(frame_embs):
        return np.asarray(project(state.params["proj"],
                                  jnp.asarray(frame_embs, jnp.float32)))

    history = []
    for epoch in range(start_epoch, t.num_epochs):
        key = jax.random.fold_in(base_key, epoch)  # resume-stable
        m = MetricAverager()
        for batch in batch_iterator(train_chunks, t.batch_size,
                                    seed=seed + epoch):
            md = chunk_metadata_batch(batch)
            frame_embs = jnp.asarray(frame_embs_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            retrieved = jnp.asarray(retriever(z_np(frame_embs), {
                "vid": md["vid"], "side": md["side"],
                "t_center": md["t_center"], "t_width": md["t_width"],
            }), jnp.float32)
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, acc, terms = train_step(
                state.params, state.opt_state, frame_embs, retrieved,
                labels, sub)
            state.step += 1
            m.update(train_loss=loss, train_acc=acc,
                     **{k2: float(v) for k2, v in terms.items()})

        for batch in batch_iterator(val_chunks, t.batch_size, shuffle=False,
                                    drop_remainder=False):
            md = chunk_metadata_batch(batch)
            frame_embs = jnp.asarray(frame_embs_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            retrieved = jnp.asarray(retriever(z_np(frame_embs), {
                "vid": md["vid"], "side": md["side"],
                "t_center": md["t_center"], "t_width": md["t_width"],
            }), jnp.float32)
            loss, acc, _ = eval_step(state.params, frame_embs, retrieved,
                                     labels)
            m.update(val_loss=loss, val_acc=acc)

        metrics = m.result()
        history.append(metrics)
        if verbose:
            print(f"epoch {epoch}: " + " ".join(
                f"{k2}={v:.4f}" for k2, v in metrics.items()))
        if ckpt_manager is not None:
            ckpt_manager.save(epoch, {"params": state.params,
                                      "opt_state": state.opt_state,
                                      "step": state.step}, metrics=metrics)
            ckpt_manager.maybe_update_best(epoch, metrics.get("val_acc", 0))
        # Chunk-DB rebuild feedback (reference: training_ratt.py:560-561
        # rebuilds after validation every REBUILD_EVERY epochs).
        maybe_rebuild_db(epoch, t, z_np, rebuild_fn=rebuild_fn,
                         rebuild_scheduler=rebuild_scheduler,
                         verbose=verbose)
    finish_rebuilds(rebuild_scheduler)
    return state.params, history
