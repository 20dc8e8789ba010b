"""Tunnel health gauge: dispatch latency AND compile-service latency.

A trivial-op probe (CLAUDE.md) proves the dispatch path is alive, but
the compile service degrades independently — measured 2026-08-20: a
3.5 s trivial probe followed immediately by a bench.py whose compile
blew the 580 s tool window. This probes both:

1. trivial op (dispatch+readback RTT);
2. a small matmul with a RANDOMIZED never-cached shape (forces a real
   XLA compile through the service — the persistent cache can't answer
   a shape it has never seen).

Rule of thumb before real TPU work: trivial <10 s AND fresh-compile
<60 s. Keep the whole probe well under the tool window; it holds no
device state worth protecting (a kill mid-tiny-compile is still a kill
— run it with a generous timeout).
"""

import json
import os
import sys
import time

import numpy as np

if os.environ.get("VRT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    _ = float(jnp.asarray(2.0) + 3.0)
    trivial_s = time.time() - t0

    # Second trivial op: the first pays one-time backend init/handshake;
    # this one is the STEADY-STATE dispatch+readback RTT — the number a
    # long-lived bench process actually experiences per readback.
    t0 = time.time()
    _ = float(jnp.asarray(5.0) + 7.0)
    trivial2_s = time.time() - t0

    # Never-cached shape: odd dimensions from the pid + clock.
    rng = np.random.default_rng(os.getpid() ^ int(time.time()))
    m = 128 + int(rng.integers(0, 64)) * 2 + 1  # odd, 129..255
    k = 256 + int(rng.integers(0, 32)) * 2 + 1
    a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k, m)).astype(np.float32))
    t0 = time.time()
    _ = float(jnp.sum(jax.jit(lambda a, b: jnp.tanh(a @ b))(a, b)))
    compile_s = time.time() - t0

    # Init (first op) is paid once per process; what gates a bench is the
    # steady dispatch RTT and the compile service.
    healthy = trivial_s < 10 and compile_s < 60
    steady_ok = trivial2_s < 5 and compile_s < 60
    print(json.dumps({
        "metric": "tunnel_probe",
        "trivial_s": round(trivial_s, 1),
        "steady_dispatch_s": round(trivial2_s, 2),
        "steady_ok_init_slow": steady_ok and not healthy,
        "fresh_compile_s": round(compile_s, 1),
        "shape": [m, k],
        "healthy_for_benches": healthy,
    }))
    sys.exit(0 if healthy else 1)


if __name__ == "__main__":
    main()
