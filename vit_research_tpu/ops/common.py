"""Shared Pallas-kernel sizing helpers (attention / fused_ln / patch_embed)."""

from __future__ import annotations

#: Per-weight-block VMEM budget for kernels that tile a (K, N) weight
#: panel into VMEM. One constant so a retune applies everywhere.
VMEM_BUDGET = 6 << 20


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
