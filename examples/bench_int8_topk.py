"""Benchmark: exact top-k retrieval, f32 vs int8 corpus, on one chip.

Measures the device query path of the vector store
(ops/topk.py::masked_topk vs masked_topk_int8) at production scale —
1M x 768 corpus, batched queries. Measured result (v5e, 2026-08-17):
both ~29-30 ms per 256-query batch (~8.8k qps/chip) — the `lax.top_k`
dominates, not the scan — so int8's win is CAPACITY (4x less HBM:
10M x 768 device-resident on one chip), not latency.
The corpus is GENERATED ON DEVICE (jax.random) so the dev
tunnel's ~25 MB/s host link is not part of the measurement; readbacks
are tiny checksums (CLAUDE.md methodology).

Run FOREGROUND on the real chip, one TPU job at a time, never under
shell `timeout` (see CLAUDE.md). Prints one JSON line per variant.
"""

import json
import time

import jax
import jax.numpy as jnp

from vit_research_tpu.ops.topk import (l2_normalize, masked_topk,
                                       masked_topk_int8, quantize_int8)

N, D, Q, K, ITERS = 1_000_000, 768, 256, 16, 8


def main():
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    corpus = l2_normalize(jax.random.normal(kc, (N, D), jnp.float32))
    queries = l2_normalize(jax.random.normal(kq, (Q, D), jnp.float32))
    float(jnp.sum(corpus[0]) + jnp.sum(queries[0]))  # real barrier

    def run(label, fn, *args):
        t0 = time.time()
        s, i = fn(*args)
        # int() readback, NOT block_until_ready(): the latter can return
        # before completion over the dev tunnel (CLAUDE.md), letting the
        # timed loop dispatch into an in-flight compile — measured as an
        # escalating 0.9 s -> 93 s pathology on the first variant.
        int(jnp.sum(i))
        compile_s = time.time() - t0
        t0 = time.time()
        acc = []
        for _ in range(ITERS):
            s, i = fn(*args)
            acc.append(jnp.sum(i))
        _ = [int(a) for a in acc]
        dt = (time.time() - t0) / ITERS
        print(json.dumps({
            "variant": label, "corpus": [N, D], "queries": Q, "k": K,
            "ms_per_query_batch": round(dt * 1e3, 2),
            "qps": round(Q / dt, 1),
            "compile_s": round(compile_s, 1)}), flush=True)
        return dt

    dt_f32 = run("f32", lambda q, c: masked_topk(q, c, None, k=K,
                                                 metric="ip"),
                 queries, corpus)

    cq, cs = jax.jit(quantize_int8)(corpus)
    qq, qs = jax.jit(quantize_int8)(queries)
    float(jnp.sum(cs) + jnp.sum(qs))  # real barrier
    del corpus  # free the f32 copy like a real int8 deployment would
    dt_i8 = run("int8", lambda a, b, c, d: masked_topk_int8(
        a, b, c, d, None, k=K), qq, qs, cq, cs)

    print(json.dumps({"variant": "speedup_f32_over_int8",
                      "value": round(dt_f32 / dt_i8, 2)}), flush=True)


if __name__ == "__main__":
    main()
