"""Headline benchmark: ViT-B/16 frame-embedding throughput per chip.

Measures the flagship path of the framework — the batched frame-embedding
engine (parallel/embed.py) that replaces the reference's
``hf_vit_embed_batch``/``model.predict`` loops — in frames/sec on one TPU
chip, and prints ONE JSON line.

Baseline context (BASELINE.md): the reference embeds with HF ViT-base at
batch 16 per 24 GB GPU (nba_proj/db_maintainence/db_rebuild.py:176) or
batch 1024 throughput mode (build_embeddings_store.py:20-21); the
north-star target is 10,000 frames/sec/chip on v5e. ``vs_baseline`` is
throughput / 10,000.

Methodology: device-resident uint8 batches; per batch the (B, 768)
embeddings are reduced to a tiny checksum on device so the measurement
drains compute without shipping megabytes through this dev harness's
network-tunneled host link (a real TPU host reads results over PCIe;
the tunnel here moves ~25 MB/s and would dominate). Wall clock over 16
steady-state batches after compile+warmup.
"""

import json
import os
import sys
import time

import numpy as np

# Tool-window guard (VRT_WINDOW_S; unset = inert): shared with the
# examples/ harnesses so the abort protocol can't drift.
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "examples"))
import _window  # noqa: E402


def measure_embed_throughput(tome_r: int = 0, batch: int = 512,
                             iters: int = 16, scan_len: int = 0,
                             **cfg_overrides) -> dict:
    """Shared harness: returns {frames_per_sec, compile_s}. Defaults are
    the parity configuration; examples/bench_tome.py reuses this with
    tome_r>0 (and other ViTConfig overrides, e.g. num_heads=6 for the
    dh=128 attention variant) so non-parity numbers stay
    methodology-comparable to the headline.

    ``scan_len=S`` groups S batches into one `lax.scan` dispatch
    (device-resident stacked buffers, one checksum readback per group) —
    the megabatch form a production feeder would use, amortizing
    per-dispatch overhead that the per-batch form pays 16 times."""
    import dataclasses

    # Honor VRT_PLATFORM before any backend initializes (same contract
    # as examples/_engines.route_platform): tests exercise the window
    # guard on CPU; without this the subprocess would silently open a
    # TPU tunnel connection whenever the axon plugin is importable.
    if os.environ.get("VRT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])

    import jax
    import jax.numpy as jnp

    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine

    cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16",
                              use_flash_attention=False, tome_r=tome_r,
                              **cfg_overrides)
    model, params = init_vit(cfg, seed=0)
    eng = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=batch,
                          use_fused_patch_embed=True)

    fwd = eng._jitted

    @jax.jit
    def fwd_checksum(params, images):
        emb = fwd(params, images)
        return jnp.sum(emb[:, :8], axis=None)

    rng = np.random.default_rng(0)
    n_buffers = 8
    import sys as _sys

    def _phase(msg):
        # stderr progress marks: a timeout-killed run must say WHICH
        # phase (staging vs compile vs measure) ate the window.
        print(f"[bench] {msg}", file=_sys.stderr, flush=True)

    # Backend init barrier: the first device op pays the (volatile)
    # tunnel handshake; decide afterwards whether the rest fits.
    t0 = time.time()
    _ = float(jnp.asarray(1.0) + 1.0)
    _phase(f"backend init {time.time() - t0:.1f}s")
    _window.checkpoint("post-init", 300.0)

    _phase(f"staging {n_buffers} device buffers "
           f"({n_buffers * batch * 224 * 224 * 3 / 1e6:.0f} MB)")
    batches = [
        jax.device_put(
            rng.integers(0, 256, size=(batch, 224, 224, 3), dtype=np.uint8))
        for _ in range(n_buffers)
    ]

    if scan_len:
        assert iters % scan_len == 0, (iters, scan_len)
        # A scan_len beyond the staged buffers would silently stack fewer
        # batches than frames_per_sec divides by — inflating the number.
        assert scan_len <= n_buffers, (scan_len, n_buffers)
        stacked = jnp.stack(batches[:scan_len])  # (S, B, H, W, C) on device

        @jax.jit
        def fwd_scan(params, stacked):
            def body(acc, images):
                return acc + fwd_checksum(params, images), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), stacked)
            return acc

        t0 = time.time()
        _ = float(fwd_scan(eng.params, stacked))  # warmup / compile
        compile_s = time.time() - t0
        t0 = time.time()
        sums = [fwd_scan(eng.params, stacked)
                for _ in range(iters // scan_len)]
        _ = [float(s) for s in sums]
        dt = time.time() - t0
        return {"frames_per_sec": round(batch * iters / dt, 1),
                "compile_s": round(compile_s, 1)}

    _window.checkpoint("post-staging", 240.0,
                       barrier=lambda: int(batches[-1][0, 0, 0, 0]))
    _phase("staged; compiling the B=%d forward" % batch)
    t0 = time.time()
    _ = float(fwd_checksum(eng.params, batches[0]))  # warmup / compile
    compile_s = time.time() - t0
    _phase(f"compiled in {compile_s:.1f}s; measuring")
    _window.checkpoint("post-compile", 30.0)

    t0 = time.time()
    sums = [fwd_checksum(eng.params, batches[i % n_buffers])
            for i in range(iters)]
    _ = [float(s) for s in sums]
    dt = time.time() - t0
    return {"frames_per_sec": round(batch * iters / dt, 1),
            "compile_s": round(compile_s, 1)}


def vit_flops_per_frame(t: int = 197, d: int = 768, layers: int = 12,
                        mlp: int = 3072, patch_in: int = 16 * 16 * 3) -> float:
    """Analytic forward FLOPs (2 x MACs) for one ViT-B/16 @224 frame:
    patch projection + per-layer QKV/out projections, attention score and
    mix matmuls, and the 2-matmul MLP. ~35.2 GFLOP — note the widely
    cited '17.6 GFLOPs' for ViT-B/16 is the MAC count."""
    patch = (t - 1) * d * patch_in
    per_layer = 4 * t * d * d + 2 * t * t * d + 2 * t * d * mlp
    return 2.0 * (patch + layers * per_layer)


def main() -> None:
    r = measure_embed_throughput()
    fps = r["frames_per_sec"]
    # Speed-of-light context so rounds stop re-deriving it (BENCH_NOTES.md
    # has the full derivation): v5e peak is 197 TFLOP/s bf16, so the
    # matmul-only ceiling for the 35.2 GFLOP/frame parity model is
    # ~5.6k frames/sec/chip — BASELINE.md's 10k "north star" exceeds bf16
    # speed-of-light on this hardware (it would need int8 end-to-end or a
    # token-reduction mode like ToMe, both shipped opt-in). `mfu` is
    # achieved/peak; the VPU-bound softmax (~4 ms/layer at B=512, within
    # a ~8 ms/layer fused-attention speed-of-light) keeps even a perfect
    # schedule well under mfu=1.
    flops = vit_flops_per_frame()
    peak_tflops = 197.0
    achieved = fps * flops / 1e12
    print(json.dumps({
        "metric": "vit_b16_embed_throughput",
        "value": fps,
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 10000.0, 4),
        "achieved_tflops": round(achieved, 1),
        "mfu": round(achieved / peak_tflops, 3),
        "sol_fps_matmul_only": round(peak_tflops * 1e12 / flops),
        # Diagnosability for driver logs: a healthy-window compile is
        # ~20-90 s; hundreds of seconds = degraded compile service.
        "compile_s": r["compile_s"],
    }))


if __name__ == "__main__":
    main()
