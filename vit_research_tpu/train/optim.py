"""Optimizers, schedules, accumulation — optax equivalents of the
reference's training machinery.

- Gradient accumulation: the reference hand-rolls an ``Accumulator``
  summing grads over N steps (reference: nba_proj/train/training.py:125-141);
  here it's ``optax.MultiSteps``.
- Two-phase LR: the reference swaps optimizers halfway through training
  (reference: nba_proj/train/training.py:453-458); here it's
  ``optax.join_schedules``.
- Grad clipping 1.0 (reference: nba_proj/train/train_chunk_encoder.py:258-294).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from vit_research_tpu.utils.configs import TrainConfig


def clip_each_by_norm(max_norm: float) -> optax.GradientTransformation:
    """Per-variable L2-norm clipping — ``tf.clip_by_norm`` applied to each
    gradient tensor independently, the reference's stage-1 semantics
    (reference: nba_proj/train/train_chunk_encoder.py:273-277), as opposed
    to ``optax.clip_by_global_norm`` which couples all leaves through one
    global factor."""

    def clip_leaf(g):
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
        return g * scale

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def two_phase_schedule(lr1: float, lr2: float, total_steps: int,
                       split: float = 0.5):
    boundary = max(int(total_steps * split), 1)
    return optax.join_schedules(
        [optax.constant_schedule(lr1), optax.constant_schedule(lr2)],
        [boundary])


def phase1_epoch_count(cfg: TrainConfig) -> int:
    """Whole epochs trained at phase-1 settings. The SINGLE source of
    truth for the phase boundary: make_optimizer (LR) and the training
    loops (contrastive coefficient) must flip together, as the reference
    does (nba_proj/train/training.py:453-458)."""
    return max(int(cfg.num_epochs * cfg.phase_split), 1)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """Adam + clip + two-phase LR + accumulation, from one TrainConfig.

    ``steps_per_epoch`` is in MICRO-batches (what the training loop
    iterates); with accumulation the inner schedule only advances once
    per ``accum_steps`` micro-steps (optax.MultiSteps), so the phase
    boundary is converted to accumulated-update units — otherwise the
    phase-2 LR would never engage (the count ends at total/accum)."""
    accum = cfg.accum_steps if cfg.accum_steps and cfg.accum_steps > 1 else 1
    # Epoch-aligned phase boundary: the reference switches the LR when a
    # whole-epoch count crosses half the run (nba_proj/train/
    # training.py:453-458), so the boundary is floor(E * split) FULL
    # epochs expressed in accumulated-update units — not a fraction of
    # total updates, which lands mid-epoch when E * split is fractional.
    boundary = max(int(round(
        phase1_epoch_count(cfg) * steps_per_epoch / accum)), 1)
    sched = optax.join_schedules(
        [optax.constant_schedule(cfg.lr_phase1),
         optax.constant_schedule(cfg.lr_phase2)], [boundary])
    chain = [optax.clip_by_global_norm(cfg.grad_clip_norm)] \
        if cfg.grad_clip_norm else []
    # eps=1e-7: the reference optimizer family is keras Adam, whose
    # default epsilon is 1e-7 (optax defaults to 1e-8) — pinned
    # empirically in test_reference_differential_stage1.py.
    if cfg.weight_decay:
        chain.append(optax.adamw(sched, eps=1e-7,
                                 weight_decay=cfg.weight_decay))
    else:
        chain.append(optax.adam(sched, eps=1e-7))
    tx = optax.chain(*chain)
    if cfg.accum_steps and cfg.accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx
