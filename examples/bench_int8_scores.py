"""int8 attention SCORE matmuls via plain XLA dot_general (VERDICT r2
item 2's unmeasured lever).

The quant sweep (examples/bench_quant.py) covered the six WEIGHT GEMMs
per encoder layer; the QK^T and PV score matmuls were only ever tried
inside Pallas kernels (Mosaic-blocked). This measures the XLA route:
dynamic symmetric int8 with per-(batch*head, token) row scales for
Q/K/probs and per-(batch*head, channel) scales for V, contractions as
s8 x s8 -> s32 (``preferred_element_type=int32``), dequant folded into
the softmax input / output scale.

Shapes are the parity attention population — ViT-B/16 @224, B=512:
(b*h, T, dh) = (6144, 197, 64) per layer, 12 layers chained through a
``fori_loop`` (one dispatch, float readback barrier — CLAUDE.md: only
readbacks are real completion barriers over this tunnel).

Context for interpretation (CLAUDE.md perf notes): attention here is
VPU-bound — the f32 softmax over 403M score elements/layer is a ~4 ms
floor, and the bf16 score matmuls are ~3.4 ms/layer at ~30% MXU. An
ideal int8 MXU (1.83x measured on clean MLP shapes) would cut the
matmul part to ~1.9 ms/layer; the quantize/dequant VPU passes (extra
elementwise over the same 403M elements) compete with the softmax for
the same unit, so the prior is a wash — this bench replaces that prior
with a number.

Usage:
  python examples/bench_int8_scores.py --variant bf16      # baseline
  python examples/bench_int8_scores.py --variant int8-qk   # int8 QK^T only
  python examples/bench_int8_scores.py --variant int8-full # QK^T and PV
  python examples/bench_int8_scores.py --variant all       # all three
  python examples/bench_int8_scores.py --tiny ...          # CPU smoke
``--variant all`` shares one process (and one backend-init handshake —
the dominant cost when the tunnel is degraded) across the three
compiles; per-variant invocations remain for tight tool windows.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _window  # noqa: E402  (window-guard clock starts here)


def make_attention(variant: str):
    import jax.numpy as jnp
    from jax import lax

    def _rowquant(x):
        """Per-(bh, t) symmetric abs-max int8: scale (bh, t, 1)."""
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                        1e-12) / 127.0
        q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        return q, s

    def _colquant(x):
        """Per-(bh, dh) channel abs-max int8 (contract over tokens)."""
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True),
                        1e-12) / 127.0
        q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
        return q, s

    def attn(q, k, v):
        # q,k,v: (bh, t, dh) bf16
        dh = q.shape[-1]
        inv = 1.0 / np.sqrt(dh)
        if variant == "bf16":
            scores = jnp.einsum("btd,bsd->bts", q, k,
                                preferred_element_type=jnp.float32) * inv
        else:
            qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
            qi, sq = _rowquant(qf)
            ki, sk = _rowquant(kf)
            raw = lax.dot_general(
                qi, ki, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (bh, t, s) s32
            # dequant: outer product of row scales, folded with 1/sqrt(dh)
            scores = raw.astype(jnp.float32) * (sq * inv) \
                * jnp.swapaxes(sk, 1, 2)
        import jax

        probs = jax.nn.softmax(scores, axis=-1)  # f32, the parity default
        if variant == "int8-full":
            pi, sp = _rowquant(probs)
            vi, sv = _colquant(v.astype(jnp.float32))
            raw = lax.dot_general(
                pi, vi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)  # (bh, t, dh)
            out = raw.astype(jnp.float32) * sp * sv
            return out.astype(jnp.bfloat16)
        return jnp.einsum("bts,bsd->btd", probs.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)

    return attn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="bf16",
                    choices=["bf16", "int8-qk", "int8-full", "all"],
                    help="'all' measures the three variants in ONE "
                         "process (one backend-init handshake — the "
                         "dominant cost in degraded tunnel windows)")
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--iters", type=int, default=4,
                    help="timed fori-chain invocations")
    ap.add_argument("--check", action="store_true",
                    help="also compile single-layer jits for a numerics "
                         "check vs bf16 (2 extra full-shape compiles — "
                         "skip on the TPU tool-call budget; implied by "
                         "--tiny)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke shapes")
    args = ap.parse_args()

    if args.tiny:
        os.environ.setdefault("VRT_PLATFORM", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax import lax

    bh, t, dh = (8, 16, 8) if args.tiny else (512 * 12, 197, 64)
    variants = (["bf16", "int8-qk", "int8-full"] if args.variant == "all"
                else [args.variant])

    def _phase(msg):
        # stderr progress marks (CLAUDE.md): a timeout-killed run must say
        # WHICH phase (staging vs compile vs measure) ate the window.
        print(f"[int8-scores] {msg}", file=sys.stderr, flush=True)

    # Backend-init barrier, then decide whether the rest fits the window
    # (budget scales with variant count: one full-shape compile each).
    _ = float(jnp.asarray(1.0) + 1.0)
    _window.checkpoint("post-init", 180.0 * len(variants))
    _phase(f"staging q/k/v ({3 * bh * t * dh * 2 / 1e6:.0f} MB bf16)")
    rng = np.random.default_rng(0)
    q = jax.device_put(jnp.asarray(
        rng.normal(size=(bh, t, dh)).astype(np.float32), jnp.bfloat16))
    k = jax.device_put(jnp.asarray(
        rng.normal(size=(bh, t, dh)).astype(np.float32), jnp.bfloat16))
    v = jax.device_put(jnp.asarray(
        rng.normal(size=(bh, t, dh)).astype(np.float32), jnp.bfloat16))

    for i, variant in enumerate(variants):
        # Drained here (prior variant ended on float() readbacks; first
        # iteration follows the staging device_puts — barrier them).
        _window.checkpoint(f"pre-{variant}", 170.0 * (len(variants) - i),
                           barrier=(lambda: float(q[0, 0, 0]))
                           if i == 0 else None)
        attn = make_attention(variant)

        @jax.jit
        def chain(q, k, v, attn=attn):
            def body(_, x):
                return attn(x, k, v)
            out = lax.fori_loop(0, args.layers, body, q)
            return jnp.sum(out.astype(jnp.float32))

        _phase(f"compiling {args.layers}-layer {variant} chain")
        t0 = time.time()
        _ = float(chain(q, k, v))  # compile + run (readback barrier)
        compile_s = time.time() - t0
        _phase(f"compiled in {compile_s:.1f}s; measuring {args.iters} iters")

        t0 = time.time()
        for _ in range(args.iters):
            _ = float(chain(q, k, v))
        wall = time.time() - t0
        ms_layer = wall / args.iters / args.layers * 1e3

        # numerics vs bf16 reference on one layer (quantization error
        # scale); two extra full-shape compiles, so opt-in off the TPU
        # budget path
        rel = None
        if args.check or args.tiny:
            f32_attn = make_attention("bf16")
            ref = np.asarray(jax.jit(f32_attn)(q, k, v), np.float32)
            got = np.asarray(jax.jit(attn)(q, k, v), np.float32)
            rel = round(float(np.abs(got - ref).max()
                              / (np.abs(ref).max() + 1e-9)), 5)

        print(json.dumps({
            "metric": "attention_scores_dtype",
            "variant": variant,
            "shape": [bh, t, dh],
            "layers": args.layers,
            "ms_per_layer": round(ms_layer, 3),
            "compile_s": round(compile_s, 1),
            "max_rel_err_vs_bf16": rel,
        }), flush=True)


if __name__ == "__main__":
    main()
