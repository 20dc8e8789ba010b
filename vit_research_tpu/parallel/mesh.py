"""Device meshes and sharding rules.

The reference's only "distribution" is CUDA_VISIBLE_DEVICES masks
(reference: nba_proj/train/training.py:34, nba_proj/vit_prediction.py:11) —
no collectives anywhere (SURVEY.md section 2.8). The TPU realization is a
`jax.sharding.Mesh` with:

- ``data`` axis: batch-sharded embedding and training (gradients psum over
  ICI via jit's partitioner);
- ``model`` axis: optional tensor-parallel sharding of the ViT MLP/attention
  weights (exposed but defaulting to 1 — ViT-B fits one chip, matching the
  vestigial ``transformer_partition_dims`` the reference never used,
  reference: nba_proj/models/vit_backbone.py:242).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: tuple | None = None,
              axes: tuple = ("data",)) -> Mesh:
    """Mesh over available devices. Default: all devices on one 'data' axis."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axes)


def data_sharding(mesh: Mesh, ndim: int = 1,
                  axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
