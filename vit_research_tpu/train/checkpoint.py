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


class CheckpointManager:
    def __init__(self, directory: str, run_id: str, max_to_keep: int = 5):
        self.dir = os.path.abspath(os.path.join(directory, run_id))
        os.makedirs(self.dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self._best_metric = -np.inf
        self._best_step = None

    def save(self, step: int, state: Any, *, metrics: dict | None = None,
             config_json: str | None = None) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if config_json is not None:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                f.write(config_json)
        if metrics:
            with open(os.path.join(self.dir, f"metrics_{step}.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)

    def maybe_update_best(self, step: int, metric: float) -> bool:
        """Track best-by-metric (reference keeps best-by-val-acc,
        nba_proj/train/train_chunk_encoder.py:543-552)."""
        if metric > self._best_metric:
            self._best_metric = metric
            self._best_step = step
            with open(os.path.join(self.dir, "best.json"), "w") as f:
                json.dump({"step": step, "metric": float(metric)}, f)
            return True
        return False

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
            with open(best) as f:
                return self.restore(json.load(f)["step"], template)
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
