"""Static-calibrated int8 GEMMs: the last unmeasured throughput lever.

VERDICT r3 item 1 / BENCH_NOTES "dynamic int8 GEMMs": dynamic
quantization measured an end-to-end TIE with bf16 because every GEMM
pays an abs-max reduction over its activations before it can quantize.
``gemm_quant='int8-static'`` (ops/quant.py::StaticInt8DotGeneral) bakes
per-site activation scales — calibrated once offline — into the graph
as constants, so the forward keeps the s8xs8->s32 MXU contraction
(2x bf16 peak) while paying only a fusable round/clip.

Protocol (per the init-amortization playbook — ONE process measures
everything):

1. ``--calibrate-only`` (spawned as a CPU subprocess): one eager
   forward of the bf16 parity model on a synthetic batch under
   ``quant.calibration_mode()``; prints the 72 per-site scales AND the
   full-dims accuracy of the static path vs the f32 parity embeddings
   (cosine) — the accuracy number costs nothing on CPU.
2. main process (TPU): parity engine and static-int8 engine measured
   back-to-back through bench.py's shared harness (device-resident
   buffers, checksum readbacks, same B=512 shape as the headline).

Run: python examples/bench_int8_static.py            (TPU, ~2 compiles)
     python examples/bench_int8_static.py --variant static   (one only)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _window  # noqa: E402  (window-guard clock starts here)
from _engines import route_platform  # noqa: E402


def mark(msg):
    print(f"[int8-static] {msg}", file=sys.stderr, flush=True)


def calibrate_cpu(batch: int = 4, tome_r: int = 0) -> dict:
    """Eager CPU calibration + full-dims accuracy readout (no TPU)."""
    import dataclasses

    route_platform()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.ops.quant import calibration_mode

    cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16",
                              gemm_quant="int8-static", tome_r=tome_r)
    model, params = init_vit(cfg, seed=0)
    rng = np.random.default_rng(0)
    # The engine feeds normalized f32 in [-1, 1]-ish; calibrate on the
    # same distribution the bench measures (synthetic frames through the
    # HF normalize).
    imgs = (rng.integers(0, 256, size=(batch, 224, 224, 3))
            .astype(np.float32) / 255.0 - 0.5) / 0.5
    mark(f"eager calibration forward (B={batch}, bf16, CPU)")
    with calibration_mode() as scales:
        model.apply(params, imgs)
    mark(f"recorded {len(scales)} site scales")

    # Accuracy at full dims, free on CPU: static-int8 vs bf16 parity.
    cfg_s = dataclasses.replace(cfg, gemm_quant_scales=tuple(scales))
    model_s, _ = init_vit(cfg_s, seed=0)
    cfg_f = dataclasses.replace(cfg, gemm_quant=None)
    model_f, _ = init_vit(cfg_f, seed=0)
    imgs2 = (rng.integers(0, 256, size=(batch, 224, 224, 3))
             .astype(np.float32) / 255.0 - 0.5) / 0.5  # held-out batch
    e_s = np.asarray(model_s.apply(params, imgs2)["pre_logits"], np.float32)
    e_f = np.asarray(model_f.apply(params, imgs2)["pre_logits"], np.float32)
    cos = np.sum(e_s * e_f, -1) / (
        np.linalg.norm(e_s, axis=-1) * np.linalg.norm(e_f, axis=-1))
    return {"scales": [float(s) for s in scales],
            "cos_vs_parity_mean": round(float(cos.mean()), 5),
            "cos_vs_parity_min": round(float(cos.min()), 5)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate-only", action="store_true")
    ap.add_argument("--variant", choices=["all", "parity", "static"],
                    default="all")
    ap.add_argument("--tome-r", type=int, default=0,
                    help="stack token merging on the static-int8 engine "
                         "(composition measurement; calibration re-runs "
                         "with tome active — merged-token activations "
                         "have their own ranges)")
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    if args.calibrate_only:
        print(json.dumps(calibrate_cpu(tome_r=args.tome_r)), flush=True)
        return

    # 1. CPU calibration in a subprocess (this process must keep its
    # backend unset until the TPU measurement).
    mark("calibrating in a CPU subprocess")
    env = dict(os.environ, VRT_PLATFORM="cpu")
    env.pop("VRT_WINDOW_S", None)  # the guard clock belongs to US
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--calibrate-only",
         "--tome-r", str(args.tome_r)],
        capture_output=True, text=True, timeout=3600, env=env)
    if r.returncode != 0:
        raise SystemExit(f"calibration failed:\n{r.stderr[-2000:]}")
    calib = json.loads(r.stdout.strip().splitlines()[-1])
    scales = tuple(calib["scales"])
    mark(f"calibrated {len(scales)} sites; CPU cosine vs parity "
         f"mean {calib['cos_vs_parity_mean']} min {calib['cos_vs_parity_min']}")

    # 2. TPU measurements, one process, shared harness.
    route_platform()
    from bench import measure_embed_throughput

    out = {"metric": "int8_static_embed", "batch": args.batch,
           "tome_r": args.tome_r,
           "cpu_cos_vs_parity_mean": calib["cos_vs_parity_mean"],
           "cpu_cos_vs_parity_min": calib["cos_vs_parity_min"]}
    if args.variant in ("all", "parity"):
        mark(f"measuring baseline (bf16, tome_r={args.tome_r})")
        p = measure_embed_throughput(tome_r=args.tome_r, batch=args.batch)
        out["parity_fps"] = p["frames_per_sec"]
        out["parity_compile_s"] = p["compile_s"]
        _window.checkpoint("post-parity", 400.0)
    if args.variant in ("all", "static"):
        mark(f"measuring int8-static (tome_r={args.tome_r})")
        s = measure_embed_throughput(tome_r=args.tome_r, batch=args.batch,
                                     gemm_quant="int8-static",
                                     gemm_quant_scales=scales)
        out["int8_static_fps"] = s["frames_per_sec"]
        out["int8_static_compile_s"] = s["compile_s"]
    if "parity_fps" in out and "int8_static_fps" in out:
        out["speedup"] = round(out["int8_static_fps"] / out["parity_fps"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
