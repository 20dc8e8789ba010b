"""Worker process for the two-host DCN test (tests/test_distributed.py).

Each worker owns 4 virtual CPU devices; together they form a 2-process
"pod". Prints WORKER<pid> OK on success.
"""

import os
import sys

# sys.path[0] is tests/helpers — put the repo root first so the package
# imports regardless of the parent process's PYTHONPATH.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from vit_research_tpu.parallel import distributed as D  # noqa: E402

assert D.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc and jax.process_index() == pid
assert jax.local_device_count() == 4
assert jax.device_count() == 4 * nproc

# DP across "hosts" (DCN), a 4-wide model axis inside each (ICI).
mesh = D.pod_mesh(ici={"data": 1, "model": 4}, dcn={"data": nproc})
assert mesh.shape == {"data": nproc, "model": 4}

# Each process loads only its rows of the global batch.
n_global = 16
full = np.arange(n_global * 8, dtype=np.float32).reshape(n_global, 8)
local = full[D.process_rows(n_global)]
assert local.shape == (n_global // nproc, 8)
gb = D.global_batch(mesh, local)
assert gb.shape == (n_global, 8)
assert not gb.is_fully_addressable


@jax.jit
def mean_fn(x):
    return x.mean(axis=0)  # cross-host psum inserted by the partitioner


m = mean_fn(gb)
np.testing.assert_allclose(D.all_gather_to_hosts(m), full.mean(0), rtol=1e-5)

# Cross-host-sharded array gathers back to every host intact.
np.testing.assert_allclose(D.all_gather_to_hosts(gb), full)

# Work-list sharding covers everything exactly once.
items = [f"frame{i}" for i in range(n_global)]
mine = D.shard_items(items)
assert mine == items[pid * 8:(pid + 1) * 8]

D.barrier("dcn-test")
print(f"WORKER{pid} OK", flush=True)
