"""Multi-host (pod) execution: ``jax.distributed`` bootstrap, hybrid
DCN x ICI meshes, and host-local <-> global array plumbing.

The reference has no distributed story at all — its only "parallelism" is
a CUDA_VISIBLE_DEVICES mask (reference: nba_proj/train/training.py:34,
SURVEY.md section 2.8). This module is the TPU-native scale-out layer the
rebuild adds on top:

- :func:`initialize` — one-call process bootstrap (coordinator address /
  process id from args or env), a no-op for single-process runs so every
  entry point can call it unconditionally.
- :func:`pod_mesh` — hybrid device mesh: axes that cross hosts ride DCN
  (put data-parallel there — gradients reduce once per step), axes inside
  a slice ride ICI (tensor/fsdp sharding — per-layer collectives). Mirrors
  the scaling-book recipe: mesh outermost-slowest.
- :func:`global_batch` — per-host numpy shard -> one globally-sharded
  ``jax.Array`` (each host loads only its rows; no cross-host copies).
- :func:`process_rows` — which rows of the global batch this host loads.
- :func:`all_gather_to_hosts` — replicate a sharded result to every host
  process (embedding shards -> host offload, e.g. FrameStore.build on
  process 0).
- :func:`barrier` — named cross-host sync (checkpoint / DB-swap fences).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_COORD = "VRT_COORDINATOR_ADDRESS"
_ENV_NPROC = "VRT_NUM_PROCESSES"
_ENV_PID = "VRT_PROCESS_ID"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None, auto: bool = False) -> bool:
    """Bootstrap ``jax.distributed`` when running multi-process.

    Args fall back to ``VRT_COORDINATOR_ADDRESS`` / ``VRT_NUM_PROCESSES`` /
    ``VRT_PROCESS_ID`` env vars. ``auto=True`` (or ``VRT_AUTO_CLUSTER=1``)
    hands off to JAX's own cluster auto-detection (TPU pod metadata /
    SLURM) when no explicit config is present — pass it on real pods,
    where there is nothing to set by hand. Returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op, so single-host users never need to think about it.
    """
    coordinator_address = coordinator_address or os.environ.get(_ENV_COORD)
    if num_processes is None and os.environ.get(_ENV_NPROC):
        num_processes = int(os.environ[_ENV_NPROC])
    if process_id is None and os.environ.get(_ENV_PID):
        process_id = int(os.environ[_ENV_PID])
    if coordinator_address is None and num_processes in (None, 1):
        env_auto = os.environ.get("VRT_AUTO_CLUSTER", "").strip().lower()
        if auto or env_auto not in ("", "0", "false", "no", "off"):
            jax.distributed.initialize()  # JAX cluster auto-detection
            return jax.process_count() > 1
        return False  # single process, nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def pod_mesh(ici: dict[str, int], dcn: dict[str, int] | None = None,
             *, devices=None) -> Mesh:
    """Hybrid mesh: ``ici`` axis sizes partition devices inside one slice /
    host; ``dcn`` axis sizes span slices. Axis order = ici key order, with
    DCN-spanning axes moved outermost (slowest-varying), which is what
    ``create_hybrid_device_mesh`` requires and what performance wants:
    cross-host traffic on the outermost (least-frequently-communicating)
    axis.

    Example (2 hosts x 4 chips, DP across hosts, TP inside)::

        mesh = pod_mesh(ici={"data": 1, "model": 4}, dcn={"data": 2})
        # mesh axes: data=2 (DCN), model=4 (ICI)
    """
    from jax.experimental import mesh_utils

    dcn = dict(dcn or {})
    unknown = set(dcn) - set(ici)
    if unknown:
        raise ValueError(f"dcn axes {sorted(unknown)} not in ici axes "
                         f"{sorted(ici)} (use ici={{axis: 1}} for "
                         "DCN-only axes)")
    # DCN-spanning axes outermost, preserving given order within each group.
    names = ([a for a in ici if dcn.get(a, 1) > 1]
             + [a for a in ici if dcn.get(a, 1) <= 1])
    ici_shape = [ici[a] for a in names]
    dcn_shape = [dcn.get(a, 1) for a in names]
    if any(s > 1 for s in dcn_shape):
        devs_in = list(devices) if devices is not None else jax.devices()
        need = int(np.prod(dcn_shape))
        n_slices = len({getattr(d, "slice_index", 0) for d in devs_in})
        n_procs = len({getattr(d, "process_index", 0) for d in devs_in})
        if n_slices != need and n_procs != need:
            raise ValueError(
                f"dcn axes need {need} slices/hosts but the runtime sees "
                f"{n_slices} slice(s) across {n_procs} process(es) — did "
                "initialize() run on every host?")
        # TPU pods expose slice_index; single-slice platforms (CPU workers,
        # GPU hosts) granule on the OS process instead.
        devs = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devs_in,
            process_is_granule=(n_slices != need))
    else:
        devs = mesh_utils.create_device_mesh(
            ici_shape,
            devices=devices if devices is not None else jax.devices())
    return Mesh(devs, tuple(names))


def process_rows(n_global: int) -> slice:
    """Rows of a global batch this process loads (contiguous block).

    ``n_global`` must divide evenly by the process count — keep global
    batch sizes a multiple of (hosts x local devices).
    """
    np_, pid = jax.process_count(), jax.process_index()
    if n_global % np_:
        raise ValueError(f"global batch {n_global} not divisible by "
                         f"{np_} processes")
    per = n_global // np_
    return slice(pid * per, (pid + 1) * per)


def shard_items(items) -> list:
    """Partition a work list (e.g. frame paths) across processes.

    Unlike :func:`process_rows` (batches, which must divide evenly so
    arrays shard), arbitrary-length work lists split as evenly as
    possible: the first ``n % procs`` processes take one extra item."""
    n, np_, pid = len(items), jax.process_count(), jax.process_index()
    base, rem = divmod(n, np_)
    start = pid * base + min(pid, rem)
    return list(items[start:start + base + (1 if pid < rem else 0)])


def global_batch(mesh: Mesh, local_data: np.ndarray,
                 pspec: P | None = None) -> jax.Array:
    """Assemble per-process host data into one globally-sharded array.

    ``local_data`` is this host's ``process_rows``-slice of the global
    batch; the result behaves as the full (global-shape) array with its
    leading dim sharded over the mesh — no host ever materializes rows it
    did not load.
    """
    pspec = P("data") if pspec is None else pspec
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_data)


def all_gather_to_hosts(x) -> np.ndarray:
    """Fetch a (possibly cross-host-sharded) array to every host as numpy.

    Device-side the gather rides ICI/DCN collectives (one compiled
    all-gather), then each host reads only its local copy — the pattern for
    offloading sharded embedding batches into the host-side FrameStore /
    vector store.
    """
    from jax.experimental import multihost_utils

    if isinstance(x, jax.Array) and x.is_fully_addressable:
        return np.asarray(x)
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def barrier(name: str = "vrt") -> None:
    """Cross-host sync point (checkpoint commits, DB shadow swaps)."""
    from jax.experimental import multihost_utils

    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)
