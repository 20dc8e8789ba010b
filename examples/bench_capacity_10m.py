"""Validate the 10M-row device-resident capacity claim ON-chip
(VERDICT r2 item 4 — previously extrapolated from the 1M-row
measurement, never executed).

Claim under test (BENCH_NOTES int8 section): ``Collection
(device_quant='int8')`` keeps a 10M x 768 corpus (~7.7 GB int8 + 40 MB
scales) device-resident on one v5e chip (16 GB HBM) where f32 (~30 GB)
cannot, at near-1M-row query latency.

Methodology (CLAUDE.md): the corpus is generated ON-DEVICE with the jax
PRNG inside one jit (a fori_loop of dynamic_update_slice chunks — no
multi-GB host->device transfer through the ~25 MB/s dev tunnel, no
(N, D) f32/int32 intermediate), and the query path is EXACTLY what
``Collection._query_device`` runs for a device_quant='int8' cosine
collection: ``quantize_int8(queries)`` + ``masked_topk_int8(..., k)``
(store/vector_store.py::_query_device). int() readbacks are the
completion barriers. Host-side id materialization (python strings) is
bookkeeping outside the device claim and is excluded — 10M id strings
are gigabytes of host RAM regardless of the accelerator.

Records: corpus-gen time, top-k compile time, warm latency (p50 over
iters), qps, and HBM bytes_in_use/bytes_limit headroom.

Usage:
  python examples/bench_capacity_10m.py                 # 10M x 768, k=16
  python examples/bench_capacity_10m.py --rows 1000000  # cross-check 1M
  python examples/bench_capacity_10m.py --tiny          # CPU smoke
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

if "--tiny" in sys.argv:
    os.environ.setdefault("VRT_PLATFORM", "cpu")
if os.environ.get("VRT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1 << 18,
                    help="on-device generation chunk (rows)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: 64k rows, dim 64")
    args = ap.parse_args()
    if args.tiny:
        args.rows, args.dim, args.chunk = 1 << 16, 64, 1 << 14

    import jax
    import jax.numpy as jnp

    from vit_research_tpu.ops.topk import masked_topk_int8, quantize_int8

    def _phase(msg):
        # stderr progress marks (CLAUDE.md): a timeout-killed run must say
        # WHICH phase (gen vs compile vs measure) ate the window.
        print(f"[capacity] {msg}", file=sys.stderr, flush=True)

    n, d, ch = args.rows, args.dim, args.chunk
    ch = min(ch, n)
    n = ((n + ch - 1) // ch) * ch  # round UP to whole chunks (>= --rows)

    @jax.jit
    def gen_corpus(key):
        out = jnp.zeros((n, d), jnp.int8)

        def body(i, carry):
            out, key = carry
            key, sub = jax.random.split(key)
            blk = jax.random.randint(sub, (ch, d), -127, 128,
                                     dtype=jnp.int8)
            return jax.lax.dynamic_update_slice(out, blk, (i * ch, 0)), key

        out, key = jax.lax.fori_loop(0, n // ch, body, (out, key))
        # Row scales like quantize_int8 produces for unit-norm rows.
        scale = jax.random.uniform(key, (n,), minval=0.005, maxval=0.012,
                                   dtype=jnp.float32)
        return out, scale

    # Backend-init barrier, then decide whether gen+compile+measure fits.
    _ = float(jnp.asarray(1.0) + 1.0)
    _window.checkpoint("post-init", 260.0)
    _phase(f"generating {n}x{d} int8 corpus on-device "
           f"({n * d / 1e9:.1f} GB, compile included)")
    t0 = time.time()
    corpus_q, corpus_scale = gen_corpus(jax.random.PRNGKey(0))
    _ = int(corpus_q[0, 0]) + float(corpus_scale[-1])  # real barrier
    gen_s = time.time() - t0

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    hbm_used = stats.get("bytes_in_use")
    hbm_limit = stats.get("bytes_limit")

    # The production query path (Collection._query_device, int8 branch).
    rng = np.random.default_rng(1)
    q_host = rng.normal(size=(args.queries, d)).astype(np.float32)
    q_host /= np.linalg.norm(q_host, axis=1, keepdims=True)
    qd = jax.device_put(q_host)

    _window.checkpoint("post-gen", 180.0,
                       barrier=lambda: float(qd[0, 0]))
    _phase(f"corpus up in {gen_s:.1f}s; compiling top-k at "
           f"({args.queries}, {n}) k={args.k}")
    t0 = time.time()
    qq, qscale = jax.jit(quantize_int8)(qd)
    scores, idx = masked_topk_int8(qq, qscale, corpus_q, corpus_scale,
                                   None, k=args.k)
    _ = int(np.asarray(idx)[0, 0])
    compile_s = time.time() - t0
    _phase(f"compiled in {compile_s:.1f}s; measuring {args.iters} iters")

    lat = []
    for _ in range(args.iters):
        t0 = time.time()
        qq, qscale = jax.jit(quantize_int8)(qd)
        scores, idx = masked_topk_int8(qq, qscale, corpus_q, corpus_scale,
                                       None, k=args.k)
        _ = int(np.asarray(idx)[0, 0])
        lat.append(time.time() - t0)
    lat = np.sort(lat)
    p50 = float(lat[len(lat) // 2])

    idx_h = np.asarray(idx)
    assert idx_h.shape == (args.queries, args.k)
    assert (idx_h >= 0).all() and (idx_h < n).all()
    assert np.isfinite(np.asarray(scores)).all()

    print(json.dumps({
        "metric": "device_capacity_int8_topk",
        "rows": n,
        "dim": d,
        "corpus_gb": round(n * d / 1e9, 2),
        "queries": args.queries,
        "k": args.k,
        "gen_s": round(gen_s, 1),
        "topk_compile_s": round(compile_s, 1),
        "warm_p50_ms": round(p50 * 1e3, 1),
        "qps": round(args.queries / p50, 0),
        "hbm_used_gb": round(hbm_used / 1e9, 2) if hbm_used else None,
        "hbm_limit_gb": round(hbm_limit / 1e9, 2) if hbm_limit else None,
    }))


if __name__ == "__main__":
    main()
