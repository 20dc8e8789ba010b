"""Checkpoint / resume via Orbax.

The reference saves Keras ``.weights.h5`` every epoch plus per-block
weight pickles (a workaround for unreliable Keras MHA restore,
reference: nba_proj/train/train_chunk_encoder.py:543-558,
nba_proj/test/get_clip_sequences.py:527-541) and never checkpoints the
optimizer, so resume restarts optimization (SURVEY.md section 5.4).
Here one Orbax checkpoint carries params + optimizer state + step +
config JSON, with run-ID-stamped directories and best-by-metric
retention — full resume, no pickles.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from vit_research_tpu.utils.metrics import MetricsLogger


class CheckpointManager:
    """Orbax manager with a retention policy: keep the newest
    ``max_to_keep`` steps (resume), PLUS the best-by-metric step (eval),
    PLUS every ``keep_period``-th step (archival), instead of Orbax's
    plain newest-N — which would eventually garbage-collect the best
    checkpoint out from under ``restore_best``. Saves are async
    (background write threads); call :meth:`wait` before process exit."""

    def __init__(self, directory: str, run_id: str, max_to_keep: int = 5,
                 keep_period: int | None = None):
        self.dir = os.path.abspath(os.path.join(directory, run_id))
        self.max_to_keep = max_to_keep
        self.keep_period = keep_period
        os.makedirs(self.dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.dir,
            # Retention is ours (_sweep); Orbax would count only recency.
            options=ocp.CheckpointManagerOptions(max_to_keep=None,
                                                 create=True),
        )
        # Append-only per-run ledger; unlike the per-step metrics files
        # below it survives retention sweeps and resumes, giving the
        # full training curve (utils/metrics.py; the reference's analog
        # was epoch logs pasted as source comments).
        self.metrics_log = MetricsLogger(
            os.path.join(self.dir, "metrics.jsonl"))
        self._best_metric = -np.inf
        self._best_step = None
        best = os.path.join(self.dir, "best.json")
        if os.path.exists(best):  # resume best-tracking across restarts
            try:
                with open(best) as f:
                    prev = json.load(f)
                self._best_metric = float(prev["metric"])
                self._best_step = int(prev["step"])
            except (ValueError, KeyError):
                pass  # torn write from a crash; tracking restarts

    def save(self, step: int, state: Any, *, metrics: dict | None = None,
             config_json: str | None = None) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if config_json is not None:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                f.write(config_json)
        if metrics:
            with open(os.path.join(self.dir, f"metrics_{step}.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
            self.metrics_log.log(step, metrics)
        self._sweep()

    def maybe_update_best(self, step: int, metric: float) -> bool:
        """Track best-by-metric (reference keeps best-by-val-acc,
        nba_proj/train/train_chunk_encoder.py:543-552)."""
        if metric > self._best_metric:
            self._best_metric = metric
            self._best_step = step
            path = os.path.join(self.dir, "best.json")
            tmp = path + ".tmp"  # atomic: a crash mid-write must not brick
            with open(tmp, "w") as f:  # the run dir for --resume
                json.dump({"step": step, "metric": float(metric)}, f)
            os.replace(tmp, path)
            return True
        return False

    @property
    def best(self):
        """(step, metric) of the best checkpoint, or (None, -inf)."""
        return self._best_step, self._best_metric

    def _sweep(self) -> None:
        """Apply the retention policy; never touches the newest step, the
        best step, or keep_period multiples."""
        steps = sorted(self._mngr.all_steps())
        if self.max_to_keep is None or len(steps) <= self.max_to_keep:
            return
        keep = set(steps[-self.max_to_keep:])
        if self._best_step is not None:
            keep.add(self._best_step)
        if self.keep_period:
            keep.update(s for s in steps if s % self.keep_period == 0)
        for s in steps:
            if s not in keep:
                # An async save of s may still be in flight only for the
                # newest step, which is always kept.
                self._mngr.delete(s)
                metrics_file = os.path.join(self.dir, f"metrics_{s}.json")
                if os.path.exists(metrics_file):
                    os.unlink(metrics_file)

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mngr.restore(step)

    def restore_best(self, template: Any = None) -> Any:
        best = os.path.join(self.dir, "best.json")
        if os.path.exists(best):
            try:
                with open(best) as f:
                    step = json.load(f)["step"]
            except (ValueError, KeyError):
                # Torn write from a crash (same tolerance as __init__):
                # fall back to the latest checkpoint.
                step = None
            if step is not None:
                return self.restore(step, template)
        return self.restore(template=template)

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()


def save_params_npz(params, path: str) -> None:
    """Flat .npz export of a param tree (portable, pickle-free analog of
    the reference's weight files)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        arrays[key] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params_npz(template, path: str):
    """Restore a param tree saved by :func:`save_params_npz`."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: "
                             f"{arr.shape} vs {np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
