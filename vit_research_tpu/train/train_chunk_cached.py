"""RATT training against the label-conditioned retrieval cache.

Equivalent of the reference's cached loop
(reference: nba_proj/train/training_chunk_cached.py:815-1636): the frozen
stage-1 ChunkEncoder provides chunk embeddings; retrieval is a cache
lookup instead of per-step ANN (:710-777,928); loss = BCE + 0.1 *
retrieval margin with hard negatives (margin 0.2, :815-860) — the
supcon / in-batch / entropy / contrastive terms exist but are
zero-weighted, as the reference left them (:1104-1109); diagnostics
track retrieved-label agreement and attention mass on same- vs
different-label tokens (:1039-1100); the cache and collection refresh
per epoch via ``refresh_fn`` (:1616-1636).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vit_research_tpu.models.heads import RATTHead, cls_retrieval_importance
from vit_research_tpu.retrieval.cache_bins import get_retrieval_cache
from vit_research_tpu.train import losses
from vit_research_tpu.train.common import (
    maybe_resume,
    MetricAverager,
    TrainState,
    batch_iterator,
    chunk_metadata_batch,
    num_batches,
)
from vit_research_tpu.train.diagnostics import (
    attention_mass_by_label,
    label_agreement,
)
from vit_research_tpu.train.optim import make_optimizer
from vit_research_tpu.utils.configs import ExperimentConfig


def make_step_fns(head: RATTHead, tx, *, margin_weight: float = 0.1,
                  margin: float = 0.2, supcon_weight: float = 0.0,
                  ibn_weight: float = 0.0, entropy_weight: float = 0.0):
    def loss_fn(params, chunk_embs, retrieved, hardneg, labels, rng):
        ret = jax.lax.stop_gradient(retrieved)
        logit, _, fused, scores = head.apply(
            params, chunk_embs, ret, train=True, rngs={"dropout": rng})
        loss_cls = losses.bce_with_logits(labels, logit)
        loss_margin, diag = losses.retrieval_margin(
            chunk_embs, ret, hardneg, margin=margin)
        loss = loss_cls + margin_weight * loss_margin
        terms = {"loss_cls": loss_cls, "loss_margin": loss_margin, **diag}
        if supcon_weight:
            loss = loss + supcon_weight * losses.supervised_contrastive(
                losses.l2_normalize(chunk_embs), labels)
        if ibn_weight:
            loss = loss + ibn_weight * losses.in_batch_infonce(chunk_embs)
        importance = cls_retrieval_importance(scores)
        importance = importance / (jnp.sum(importance, axis=1,
                                           keepdims=True) + 1e-8)
        if entropy_weight:
            loss = loss + entropy_weight * losses.attention_entropy(importance)
        return loss, (logit, importance, terms)

    @jax.jit
    def train_step(params, opt_state, chunk_embs, retrieved, hardneg,
                   labels, rng):
        (loss, (logit, importance, terms)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, chunk_embs, retrieved, hardneg,
                                   labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = losses.compute_accuracy(labels, logit)
        return params, opt_state, loss, acc, importance, terms

    @jax.jit
    def eval_step(params, chunk_embs, retrieved, labels):
        logit, _, _, scores = head.apply(params, chunk_embs, retrieved)
        importance = cls_retrieval_importance(scores)
        importance = importance / (jnp.sum(importance, axis=1,
                                           keepdims=True) + 1e-8)
        return (losses.bce_with_logits(labels, logit),
                losses.compute_accuracy(labels, logit), importance)

    return train_step, eval_step


def train_chunk_cached(train_chunks, val_chunks, chunk_embed_fn, cache, *,
                       cfg: ExperimentConfig | None = None, refresh_fn=None,
                       ckpt_manager=None, resume: bool = False, seed: int = 1234,
                       delta_t: float = 0.1, verbose: bool = False):
    """Args:
      chunk_embed_fn: callable(batch_chunks) -> (B, D) frozen stage-1
        chunk embeddings.
      cache: (side, bin, label) -> pool dict (retrieval/cache_bins).
      refresh_fn: optional callable(epoch) -> new cache (per-epoch cache /
        collection refresh)."""
    cfg = cfg or ExperimentConfig(name="chunks_cached")
    t = cfg.train
    d = cfg.head.embed_dim
    top_k = cfg.retrieval.top_k
    head = RATTHead(cfg.head)
    base_key = jax.random.PRNGKey(seed)
    params = head.init(base_key, jnp.zeros((1, d)), jnp.zeros((1, top_k, d)))
    steps = max(num_batches(len(train_chunks), t.batch_size), 1)
    tx = make_optimizer(t, steps)
    state = TrainState(params=params, opt_state=tx.init(params))
    state, start_epoch = maybe_resume(ckpt_manager, state, resume)
    train_step, eval_step = make_step_fns(
        head, tx, margin=t.margin, margin_weight=t.contrastive_weight)

    def fetch(batch, md):
        retrieved, rlabels, hardneg = get_retrieval_cache(
            {"side": md["side"], "t_center": md["t_center"],
             "vid": md["vid"], "label": md["label"]},
            cache, top_k=top_k, delta_t=delta_t, dim=d)
        return (jnp.asarray(retrieved, jnp.float32),
                jnp.asarray(rlabels), jnp.asarray(hardneg))

    history = []
    for epoch in range(start_epoch, t.num_epochs):
        key = jax.random.fold_in(base_key, epoch)  # resume-stable
        m = MetricAverager()
        for batch in batch_iterator(train_chunks, t.batch_size,
                                    seed=seed + epoch):
            md = chunk_metadata_batch(batch)
            chunk_embs = jnp.asarray(chunk_embed_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            retrieved, rlabels, hardneg = fetch(batch, md)
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, acc, importance, terms = \
                train_step(state.params, state.opt_state, chunk_embs,
                           retrieved, hardneg, labels, sub)
            state.step += 1
            agree = label_agreement(rlabels, md["label"])
            mass = attention_mass_by_label(importance, rlabels, md["label"])
            m.update(train_loss=loss, train_acc=acc, agreement=agree,
                     attn_mass_same=mass["mass_same"],
                     attn_mass_diff=mass["mass_diff"],
                     **{k2: float(v) for k2, v in terms.items()})

        for batch in batch_iterator(val_chunks, t.batch_size, shuffle=False,
                                    drop_remainder=False):
            md = chunk_metadata_batch(batch)
            chunk_embs = jnp.asarray(chunk_embed_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            retrieved, rlabels, _ = fetch(batch, md)
            loss, acc, _ = eval_step(state.params, chunk_embs, retrieved,
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
        if refresh_fn is not None:
            cache = refresh_fn(epoch) or cache
    return state.params, history
