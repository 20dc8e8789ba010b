"""Measure the ToMe (token merging) speed/throughput trade on a real chip.

Usage: python examples/bench_tome.py [tome_r]

Same methodology as bench.py (device-resident uint8 batches, checksum
readback, steady-state wall clock); run one ``tome_r`` per process so each
TPU compile stays short. r=0 reproduces the parity bench configuration.
"""

import dataclasses
import json
import sys
import time

import numpy as np


def main(tome_r: int) -> None:
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine

    cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16",
                              use_flash_attention=False, tome_r=tome_r)
    model, params = init_vit(cfg, seed=0)
    batch = 512
    eng = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=batch,
                          use_fused_patch_embed=True)
    fwd = eng._jitted

    @jax.jit
    def fwd_checksum(params, images):
        emb = fwd(params, images)
        return jnp.sum(emb[:, :8], axis=None)

    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            rng.integers(0, 256, size=(batch, 224, 224, 3)).astype(np.uint8))
        for _ in range(8)
    ]
    t0 = time.time()
    _ = float(fwd_checksum(eng.params, batches[0]))
    compile_s = time.time() - t0

    iters = 16
    t0 = time.time()
    sums = [fwd_checksum(eng.params, batches[i % 8]) for i in range(iters)]
    _ = [float(s) for s in sums]
    dt = time.time() - t0
    fps = batch * iters / dt
    print(json.dumps({"tome_r": tome_r, "frames_per_sec": round(fps, 1),
                      "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
