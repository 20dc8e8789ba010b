"""Measure the bf16 attention-softmax variant vs the f32 parity softmax.

The attention softmax over the (B,H,T,T) scores is the embed path's VPU
bottleneck (BENCH_NOTES.md: ~4 ms/layer floor at B=512); f32 up-casts
double its element traffic. ``ViTConfig.softmax_dtype='bfloat16'`` keeps
it in bf16 — this script measures the throughput delta with bench.py's
exact protocol (device-resident uint8 batches, checksum readback,
steady-state wall clock) and reads back one batch of embeddings so the
two variants' cosine agreement can be checked across runs.

Each invocation does exactly ONE TPU compile (keeps every call well
inside a tool-call window — CLAUDE.md):

  python examples/bench_softmax_bf16.py f32        # throughput, f32
  python examples/bench_softmax_bf16.py bf16       # throughput, bf16
  python examples/bench_softmax_bf16.py emb-f32    # save batch-0 embs
  python examples/bench_softmax_bf16.py emb-bf16   # save batch-0 embs
  python examples/bench_softmax_bf16.py compare    # host-side cosine
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _engines import build_engine, route_platform  # noqa: E402

route_platform()

from bench import measure_embed_throughput  # noqa: E402


def embed_batch0(softmax_dtype: str, batch: int = 512) -> np.ndarray:
    """One batch of embeddings under the given softmax dtype (same seed/
    inputs across variants so the files are directly comparable)."""
    eng = build_engine(batch, softmax_dtype=softmax_dtype)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, size=(batch, 224, 224, 3), dtype=np.uint8)
    return eng.embed_batch(imgs)


if __name__ == "__main__":
    variant = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    if variant == "compare":
        a = np.load("/tmp/softmax_emb-f32.npy")
        b = np.load("/tmp/softmax_emb-bf16.npy")
        cos = (a * b).sum(-1)  # both L2-normalized
        print(json.dumps({"cos_min": float(cos.min()),
                          "cos_mean": float(cos.mean()),
                          "within_1e-3": bool((1 - cos).max() < 1e-3)}))
    elif variant.startswith("emb-"):
        sm = {"emb-f32": "float32", "emb-bf16": "bfloat16"}[variant]
        emb = embed_batch0(sm)
        np.save(f"/tmp/softmax_{variant}.npy", emb)
        print(json.dumps({"softmax_dtype": sm, "saved": variant,
                          "norm_ok": bool(np.allclose(
                              np.linalg.norm(emb, axis=-1), 1.0,
                              atol=1e-3))}))
    else:
        sm = {"f32": "float32", "bf16": "bfloat16"}[variant]
        res = measure_embed_throughput(softmax_dtype=sm)
        print(json.dumps({"softmax_dtype": sm, **res}))
