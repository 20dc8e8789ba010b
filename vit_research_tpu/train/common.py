"""Shared training-loop infrastructure.

The reference's loops share a skeleton — chunk batches, eager retrieval
between steps, GradientTape steps, per-epoch evaluate, weight saves
(reference: nba_proj/train/training.py:360-480 and siblings). Here the
skeleton is: host-side batcher (seeded shuffle, fixed shapes) ->
host retrieval (fixed-K padded) -> ONE jitted train step (grads, optax
update, metrics) -> per-epoch diagnostics + Orbax checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def maybe_resume(ckpt_manager, state: TrainState, resume: bool):
    """Restore the latest checkpoint into ``state``.

    Returns (state, start_epoch). The reference could only reload weights
    and restarted Adam on every resume (SURVEY.md section 5.4); here the
    optimizer state and step counter come back too, so the continued run
    reproduces the uninterrupted trajectory (tests/test_resume.py) —
    provided the loop derives its RNG per epoch (fold_in), which the
    training loops here do."""
    if not resume or ckpt_manager is None:
        return state, 0
    latest = ckpt_manager.latest_step()
    if latest is None:
        return state, 0
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": state.step}
    try:
        restored = ckpt_manager.restore(latest, template=template)
    except Exception as e:
        raise RuntimeError(
            f"--resume could not restore step {latest} from "
            f"{getattr(ckpt_manager, 'dir', ckpt_manager)}: the saved "
            "tree does not match the current optimizer/model structure. "
            "A checkpoint written before an optimizer change cannot "
            "resume its optimizer state (see MIGRATING.md 'Checkpoint "
            "compatibility notes'); restart the run, or warm-start from "
            "the checkpoint's params tree only.") from e
    return TrainState(params=restored["params"],
                      opt_state=restored["opt_state"],
                      step=int(restored["step"])), latest + 1


def chunk_metadata_batch(batch_chunks) -> dict:
    """Chunk dicts -> columnar metadata arrays (the reference shipped
    these as tf tensors through tf.data, nba_proj/dataset.py:427-469)."""
    return {
        "vid": np.asarray([c["vid"] for c in batch_chunks], np.int32),
        "clip": np.asarray([c["clip"] for c in batch_chunks], np.int32),
        "side": np.asarray([c["side"] for c in batch_chunks], dtype=object),
        "t_center": np.asarray([c["t_center"] for c in batch_chunks],
                               np.float32),
        "t_width": np.asarray([c["t_width"] for c in batch_chunks],
                              np.float32),
        "label": np.asarray([c["label"] for c in batch_chunks], np.int32),
        "status_id": np.asarray([c["status_id"] for c in batch_chunks],
                                np.int32),
        "start_idx": np.asarray([c["start_idx"] for c in batch_chunks],
                                np.int32),
    }


def batch_iterator(items, batch_size: int, *, shuffle: bool = True,
                   seed: int = 0, drop_remainder: bool = True):
    """Seeded-shuffle batch iterator (reference: seeded dataset shuffle,
    nba_proj/dataset.py:460; drop_remainder keeps shapes static for jit).

    Note: without drop_remainder the LAST batch can be ragged, which
    costs one extra jit compile per distinct tail size — acceptable for
    validation (the tail shape is stable across epochs), never used for
    training."""
    idx = np.arange(len(items))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    end = len(idx) - (len(idx) % batch_size) if drop_remainder else len(idx)
    if items and end == 0:
        # A dataset smaller than one batch would otherwise "train" for
        # zero steps per epoch while still validating and checkpointing
        # — a complete-looking run that never optimized.
        import warnings

        warnings.warn(
            f"batch_iterator: {len(items)} items < batch_size="
            f"{batch_size} with drop_remainder — yielding NO batches",
            RuntimeWarning, stacklevel=2)
    for start in range(0, end, batch_size):
        yield [items[i] for i in idx[start:start + batch_size]]


def num_batches(n_items: int, batch_size: int,
                drop_remainder: bool = True) -> int:
    return n_items // batch_size if drop_remainder else -(-n_items // batch_size)


def tree_finite(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(np.isfinite(np.asarray(x)).all()) for x in leaves)


def split_train_val(items, val_frac: float = 0.2, seed: int = 0):
    idx = np.arange(len(items))
    np.random.default_rng(seed).shuffle(idx)
    n_val = max(1, int(len(items) * val_frac))
    val = [items[i] for i in idx[:n_val]]
    train = [items[i] for i in idx[n_val:]]
    return train, val


class MetricAverager:
    """Streaming scalar means (keras Mean metric analog,
    reference: nba_proj/train/training_stage2.py:1330-1334)."""

    def __init__(self):
        self.sums: dict = {}
        self.counts: dict = {}

    def update(self, **metrics):
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v)
            self.counts[k] = self.counts.get(k, 0) + 1

    def result(self) -> dict:
        return {k: self.sums[k] / max(self.counts[k], 1) for k in self.sums}

    def reset(self):
        self.sums, self.counts = {}, {}


def maybe_rebuild_db(epoch, train_cfg, project_fn, *, rebuild_fn=None,
                     rebuild_scheduler=None, verbose=False) -> None:
    """Epoch-end DB-rebuild cadence, shared by the retrieval trainers
    (reference: nba_proj/train/training.py:479-480 and
    training_ratt.py:560-561 — 1-indexed ``epoch % R == 0`` there ==
    ``(epoch + 1) % R == 0`` here).

    ``project_fn`` is the trainer's LIVE projection (its signature is
    trainer-specific: train_rag projects (B, d) chunk embeddings,
    train_ratt projects (B, T, d) frame embeddings — a scheduler
    rebuild_fn is written against its own trainer's contract).
    """
    if rebuild_scheduler is not None:
        swapped = rebuild_scheduler.maybe_swap()
        if swapped and verbose:
            print(f"epoch {epoch}: swapped in async DB rebuild")
        if train_cfg.rebuild_every and \
                (epoch + 1) % train_cfg.rebuild_every == 0:
            rebuild_scheduler.kick(project_fn)
    elif rebuild_fn is not None and train_cfg.rebuild_every and \
            (epoch + 1) % train_cfg.rebuild_every == 0:
        rebuild_fn(project_fn)


def finish_rebuilds(rebuild_scheduler) -> None:
    """Drain the async rebuild scheduler at end of training. A failed
    final rebuild must not raise past the trained params."""
    if rebuild_scheduler is not None:
        rebuild_scheduler.wait()
        rebuild_scheduler.maybe_swap(raise_on_error=False)
