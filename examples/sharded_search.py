"""Mesh-sharded exact vector search: the >1-chip-HBM retrieval path.

Demonstrates ops/sharded_topk.py + Collection.shard_device end-to-end:
the corpus rows live sharded across the device mesh (each chip holds
rows/n_dev in HBM and scores its shard on the local MXU; one tiny
all_gather merges the winners), with results exactly identical to the
single-device path, including tie order. Runs self-contained on a
virtual 8-device CPU mesh:

    python examples/sharded_search.py

On TPU hardware drop the CPU pinning; with ``device_quant="int8"`` a
v5e-8 holds ~80M x 768 rows device-resident (BENCH_NOTES.md).
"""

import os

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("VRT_PLATFORM"):
    jax.config.update("jax_platforms", "cpu")  # demo only

import numpy as np  # noqa: E402

from vit_research_tpu.parallel.mesh import make_mesh  # noqa: E402
from vit_research_tpu.store.vector_store import Collection  # noqa: E402


def main():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(0)
    n, d = 100_000, 256
    corpus = rng.normal(size=(n, d)).astype(np.float32)

    col = Collection("demo", space="cosine", device_quant="int8")
    col.upsert([f"row{i}" for i in range(n)], corpus,
               [{"bucket": i % 4} for i in range(n)])

    queries = corpus[:5] + 0.01 * rng.normal(size=(5, d)).astype(np.float32)
    baseline = col.query(queries, n_results=4)

    col.shard_device(mesh)  # each device now holds ~n/n_dev int8 rows
    sharded = col.query(queries, n_results=4)
    assert sharded["ids"] == baseline["ids"], "sharded path must be exact"
    print(f"{n} x {d} int8 corpus sharded over {n_dev} devices "
          f"(~{n // n_dev} rows/device)")
    for qi, ids in enumerate(sharded["ids"]):
        print(f"  query {qi}: {ids}  (expected nearest: row{qi})")

    filtered = col.query(queries[:1], n_results=4,
                         where={"bucket": {"$eq": 0}})
    assert all(int(i[3:]) % 4 == 0 for i in filtered["ids"][0])
    print(f"  filtered (bucket=0): {filtered['ids'][0]}")


if __name__ == "__main__":
    main()
