"""RAG-stage training: ProjectionHead + RAGHead with live frame retrieval.

Equivalent of the reference's main loop
(reference: nba_proj/train/training.py:144-201,360-480) and its
no-retrieval ablation (reference: nba_proj/train/train_cls_only.py:186-190):

- chunk embedding = L2-normalized mean pool of the frozen ViT's frame
  embeddings (:158-159) — supplied by a pluggable ``chunk_embed_fn``;
- ProjectionHead -> FrameRetriever (stop-gradient, fixed-K zero-padded)
  -> RAGHead -> BCE + lambda * simple retrieval contrastive (:176-182);
- gradient accumulation (optax.MultiSteps == the reference Accumulator,
  :125-141) and the two-phase LR switch at half epochs (:453-458);
- per-epoch evaluate with cosine diagnostics (combined-vs-retrieved /
  retrieval purity, :283-353);
- ``rebuild_fn`` invoked every ``rebuild_every`` epochs with the current
  projection apply — the DB-rebuild feedback loop (:479-480).

Retrieval runs on the host between jitted steps (the cached-retrieval
loops exist precisely because of this latency; see train_chunk_cached).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.models.heads import ProjectionHead, RAGHead
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
from vit_research_tpu.train.diagnostics import cosine_stats, retrieval_purity
from vit_research_tpu.train.optim import make_optimizer
from vit_research_tpu.utils.configs import ExperimentConfig


def chunk_embed_from_store(store):
    """chunk_embed_fn from the memmap frame store: mean-pool + L2
    (reference chunk representation: nba_proj/train/training.py:158-159)."""
    def fn(batch_chunks):
        idx = np.asarray([[store.index_of(p) for p in ch["frames"]]
                          for ch in batch_chunks])
        frame_embs = store.gather(idx)
        emb = frame_embs.mean(axis=1)
        return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
    return fn


def make_step_fns(proj: ProjectionHead, head: RAGHead, tx,
                  use_retrieval: bool):
    def loss_fn(params, chunk_embs, retrieved, labels, rng, cw):
        z = proj.apply(params["proj"], chunk_embs)
        if use_retrieval:
            ret = jax.lax.stop_gradient(retrieved)
        else:
            # Ablation: placeholder tokens = the chunk embedding itself
            # (reference: nba_proj/train/train_cls_only.py:186-190).
            ret = jnp.tile(chunk_embs[:, None, :], (1, retrieved.shape[1], 1))
        logits, fused = head.apply(params["head"], z, ret, train=True,
                                   rngs={"dropout": rng})
        loss_cls = losses.bce_with_logits(labels, logits)
        loss_con = losses.simple_retrieval_contrastive(z, ret)
        # cw is a traced scalar: the reference re-assigns the contrastive
        # coefficient at the LR phase boundary (nba_proj/train/
        # training.py:453-458) — traced, not closed over, so the phase
        # switch doesn't recompile the step.
        loss = loss_cls + cw * loss_con
        return loss, (logits, fused, z, loss_cls, loss_con)

    @jax.jit
    def train_step(params, opt_state, chunk_embs, retrieved, labels, rng,
                   cw):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, chunk_embs, retrieved, labels, rng, cw)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        logits = aux[0]
        acc = losses.compute_accuracy(labels, logits)
        return params, opt_state, loss, acc, aux[3], aux[4]

    @jax.jit
    def eval_step(params, chunk_embs, retrieved, labels):
        z = proj.apply(params["proj"], chunk_embs)
        ret = retrieved if use_retrieval else jnp.tile(
            chunk_embs[:, None, :], (1, retrieved.shape[1], 1))
        logits, fused = head.apply(params["head"], z, ret)
        loss = losses.bce_with_logits(labels, logits)
        acc = losses.compute_accuracy(labels, logits)
        purity = retrieval_purity(z, ret)
        comb = cosine_stats(fused, z)
        return loss, acc, purity, comb["mean"], comb["std"], logits

    return train_step, eval_step


def train_rag(train_chunks, val_chunks, chunk_embed_fn, retriever, *,
              cfg: ExperimentConfig | None = None, use_retrieval: bool = True,
              rebuild_fn=None, rebuild_scheduler=None, ckpt_manager=None, resume: bool = False,
              seed: int = 1234, verbose: bool = False, init_params=None):
    """Returns (params, history). ``retriever`` follows the
    FrameRetriever call contract.

    DB-rebuild feedback loop, two modes:
    - ``rebuild_fn(project_fn)``: synchronous rebuild every
      ``rebuild_every`` epochs (reference behavior — training stalls,
      nba_proj/train/training.py:479-480);
    - ``rebuild_scheduler``: a train.async_rebuild.RebuildScheduler whose
      ``rebuild_fn`` accepts ``(shadow_collection, project_fn)`` — this
      loop kicks it with the LIVE projection each rebuild; rebuilds run
      on a host thread into a shadow collection and swap in at epoch
      boundaries — training never stalls."""
    cfg = cfg or ExperimentConfig(name="rag")
    t = cfg.train
    proj = ProjectionHead(input_dim=cfg.head.embed_dim,
                          proj_dim=cfg.head.embed_dim)
    head = RAGHead(cfg.head)
    base_key = jax.random.PRNGKey(seed)
    d = cfg.head.embed_dim
    k = cfg.retrieval.top_k
    params = {
        "proj": proj.init(base_key, jnp.zeros((1, d))),
        "head": head.init(base_key, jnp.zeros((1, d)), jnp.zeros((1, k, d))),
    }
    if init_params is not None:
        # Warm start / pinned weights — the reference __main__ keeps
        # load_weights calls for exactly this
        # (reference: nba_proj/train/training.py:397-417 commented loads).
        params = jax.tree.map(jnp.asarray, init_params)
    steps_per_epoch = max(
        num_batches(len(train_chunks), t.batch_size), 1)
    tx = make_optimizer(t, steps_per_epoch)
    state = TrainState(params=params, opt_state=tx.init(params))
    state, start_epoch = maybe_resume(ckpt_manager, state, resume)
    train_step, eval_step = make_step_fns(proj, head, tx, use_retrieval)

    @jax.jit
    def project(params_proj, x):
        return proj.apply(params_proj, x)

    def project_np(x):
        return np.asarray(project(state.params["proj"],
                                  jnp.asarray(x, jnp.float32)))

    def retrieve(z, md):
        metadata = {"vid": md["vid"], "side": md["side"],
                    "t_center": md["t_center"], "t_width": md["t_width"]}
        return retriever(z, metadata)

    # Contrastive coefficient per phase, switched WITH the LR at the
    # same epoch boundary (reference: nba_proj/train/training.py:453-458;
    # shared helper so the two can't desync).
    from vit_research_tpu.train.optim import phase1_epoch_count

    phase1_epochs = phase1_epoch_count(t)

    history = []
    for epoch in range(start_epoch, t.num_epochs):
        cw = t.contrastive_weight
        if t.contrastive_weight_phase2 is not None \
                and epoch >= phase1_epochs:
            cw = t.contrastive_weight_phase2
        key = jax.random.fold_in(base_key, epoch)  # resume-stable
        m = MetricAverager()
        for batch in batch_iterator(train_chunks, t.batch_size,
                                    seed=seed + epoch):
            md = chunk_metadata_batch(batch)
            chunk_embs = jnp.asarray(chunk_embed_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            z_now = project_np(chunk_embs)
            retrieved = jnp.asarray(retrieve(z_now, md), jnp.float32)
            key, sub = jax.random.split(key)
            state.params, state.opt_state, loss, acc, lc, lcon = train_step(
                state.params, state.opt_state, chunk_embs, retrieved,
                labels, sub, cw)
            state.step += 1
            m.update(train_loss=loss, train_acc=acc, loss_cls=lc,
                     loss_contrastive=lcon)

        for batch in batch_iterator(val_chunks, t.batch_size, shuffle=False,
                                    drop_remainder=False):
            md = chunk_metadata_batch(batch)
            chunk_embs = jnp.asarray(chunk_embed_fn(batch), jnp.float32)
            labels = jnp.asarray(md["label"], jnp.float32)
            retrieved = jnp.asarray(
                retrieve(project_np(chunk_embs), md), jnp.float32)
            loss, acc, purity, comb_mean, comb_std, _ = eval_step(
                state.params, chunk_embs, retrieved, labels)
            m.update(val_loss=loss, val_acc=acc, retr_sim=purity,
                     comb_sim=comb_mean, comb_sim_std=comb_std)

        metrics = m.result()
        history.append(metrics)
        if verbose:
            print(f"epoch {epoch}: " + " ".join(
                f"{k2}={v:.4f}" for k2, v in metrics.items()))
        if ckpt_manager is not None:
            ckpt_manager.save(epoch, {"params": state.params,
                                      "opt_state": state.opt_state,
                                      "step": state.step},
                              metrics=metrics)
            ckpt_manager.maybe_update_best(epoch, metrics.get("val_acc", 0))
        # Forward the LIVE projection: the scheduler's rebuild_fn
        # signature is (shadow, project_fn).
        maybe_rebuild_db(epoch, t, project_np, rebuild_fn=rebuild_fn,
                         rebuild_scheduler=rebuild_scheduler,
                         verbose=verbose)
    finish_rebuilds(rebuild_scheduler)
    return state.params, history


train_cls_only = functools.partial(train_rag, use_retrieval=False)
"""No-retrieval ablation baseline (reference: nba_proj/train/train_cls_only.py)."""
