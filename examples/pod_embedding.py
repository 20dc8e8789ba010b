"""Multi-host frame embedding: the pod version of the embedding engine.

Demonstrates the scale-out layer (parallel/distributed.py) end-to-end:
each host loads ONLY its shard of the frame list, embeds it on its local
devices, and the embeddings are gathered to every host (process 0 would
write the FrameStore / vector store). Runs self-contained on one machine
by forking two worker processes with 4 virtual CPU devices each:

    python examples/pod_embedding.py

On a real TPU pod, delete the __main__ fork block and launch one process
per host with VRT_COORDINATOR_ADDRESS / VRT_NUM_PROCESSES /
VRT_PROCESS_ID set (or pass auto=True on TPU pod metadata).
"""

import os
import subprocess
import sys


def worker(pid: int, nproc: int, port: str) -> None:
    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")  # demo only; pods skip this

    import numpy as np

    from vit_research_tpu import parallel as par
    from vit_research_tpu.data.preprocess import PreprocessSpec
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine
    from vit_research_tpu.utils.configs import ViTConfig

    par.initialize(f"localhost:{port}", nproc, pid)
    mesh = par.pod_mesh(ici={"data": jax.local_device_count()},
                        dcn={"data": nproc})

    # Tiny random ViT so the demo is self-contained; swap in
    # make_hf_frame_embedder for the real backbone.
    cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                    num_layers=1, num_heads=2, mlp_dim=64,
                    use_flash_attention=False)
    model, params = init_vit(cfg, seed=0)
    eng = EmbeddingEngine(model, params, PreprocessSpec(size=(32, 32)),
                          batch_size=16, use_fused_patch_embed=False)

    # 96 "frames"; each host decodes only its shard.
    all_ids = list(range(96))
    mine = par.shard_items(all_ids)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(len(mine), 32, 32, 3), dtype=np.uint8)
    local_emb = eng.embed_batch(frames)  # (len(mine), D) on this host

    # Everyone ends up with the full (96, D) matrix; process 0 persists.
    full = par.all_gather_to_hosts(
        par.global_batch(mesh, local_emb.astype(np.float32)))
    par.barrier("embed-done")
    print(f"[host {pid}] embedded {len(mine)} frames locally, "
          f"gathered {full.shape} total", flush=True)
    if pid == 0:
        print(f"[host 0] would now FrameStore.build / upsert {len(full)} "
              "embeddings", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:  # forked worker
        worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
    else:
        import socket

        s = socket.socket()
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
        s.close()
        procs = [subprocess.Popen([sys.executable, __file__, str(p), "2",
                                   port]) for p in range(2)]
        rc = [p.wait() for p in procs]
        # signal deaths are NEGATIVE return codes — max() would mask them
        sys.exit(1 if any(rc) else 0)
