"""Trace-pin the single-chip embed ceiling (VERDICT r2 item 2): capture
a ``jax.profiler`` device trace of warm parity batches (ViT-B/16 @224,
B=512 — bench.py's scored shape) and print the per-op time table, so
the gap between the measured ~217 ms/batch and the ~154 ms
perfect-schedule arithmetic (BENCH_NOTES.md speed-of-light section) is
attributed op-by-op instead of inferred from layer-level timings.

The trace protobuf (XSpace) is parsed in-process: the device plane's
"XLA Ops" line events are aggregated by HLO category and by op name.
Methodology per CLAUDE.md: device-resident inputs, float readback
barriers, ONE process, warm the jit before tracing.

Usage:
  python examples/trace_embed.py                # parity B=512 on the chip
  python examples/trace_embed.py --tiny         # CPU smoke
  python examples/trace_embed.py --keep-trace DIR   # keep the raw trace
"""

import argparse
import collections
import glob
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _window  # noqa: E402  (window-guard clock starts here)
from _engines import build_engine, route_platform  # noqa: E402

if "--tiny" in sys.argv:
    # --tiny is a CPU smoke: NEVER let it route to the axon tunnel (a
    # timeout-killed compile there wedges the tunnel — CLAUDE.md).
    os.environ.setdefault("VRT_PLATFORM", "cpu")
route_platform()


def parse_xspace(log_dir: str):
    """Aggregate device-plane XLA op durations from a jax.profiler trace.

    Returns (plane_name, by_category, by_op, total_ps) where by_* map
    name -> [total_ps, count]."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = glob.glob(os.path.join(log_dir, "plugins", "profile", "*",
                                 "*.xplane.pb"))
    if not pbs:
        raise SystemExit(f"no xplane.pb under {log_dir}")
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())

    # Prefer a real accelerator plane; fall back to the host CPU plane
    # (the smoke path) — jax names device planes '/device:TPU:0' etc.
    planes = list(space.planes)
    device_planes = [p for p in planes
                     if "TPU" in p.name or "GPU" in p.name]
    plane = (device_planes
             or [p for p in planes if "/device:" in p.name]
             or [p for p in planes if p.name == "/host:CPU"]
             or planes)[0]

    by_cat = collections.defaultdict(lambda: [0, 0])
    by_op = collections.defaultdict(lambda: [0, 0])
    total_ps = 0
    stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
    ev_meta = plane.event_metadata
    for line in plane.lines:
        # TPU/GPU device planes put HLO executions on "XLA Ops" lines;
        # the CPU backend (smoke path) uses "tf_XLAPjRtCpuClient/..."
        # thread-pool lines.
        if "Ops" not in line.name and "XLAPjRt" not in line.name:
            continue
        for ev in line.events:
            meta = ev_meta[ev.metadata_id]
            dur = ev.duration_ps
            total_ps += dur
            name = meta.name
            by_op[name][0] += dur
            by_op[name][1] += 1
            cat = None
            for st in list(ev.stats) + list(meta.stats):
                if stat_names.get(st.metadata_id, "") in (
                        "hlo_category", "category"):
                    cat = st.str_value or stat_names.get(st.ref_value)
                    if cat:
                        break
            if cat is None:
                # heuristic bucket from the HLO name
                low = name.lower()
                for key, bucket in (("conv", "convolution"),
                                    ("dot", "dot"),
                                    ("fusion", "fusion"),
                                    ("copy", "copy"),
                                    ("transpose", "transpose"),
                                    ("reduce", "reduce"),
                                    ("all-", "collective")):
                    if key in low:
                        cat = bucket
                        break
                cat = cat or "other"
            by_cat[cat][0] += dur
            by_cat[cat][1] += 1
    return plane.name, dict(by_cat), dict(by_op), total_ps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--trace-batches", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep-trace", default=None,
                    help="copy the raw trace dir here")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    def _phase(msg):
        # stderr progress marks (CLAUDE.md): a timeout-killed run must say
        # WHICH phase (staging vs compile vs trace) ate the window.
        print(f"[trace] {msg}", file=sys.stderr, flush=True)

    eng = build_engine(args.batch, tiny=args.tiny)
    hw = 32 if args.tiny else 224
    rng = np.random.default_rng(0)
    # Backend-init barrier, then decide whether the rest fits the window.
    import jax.numpy as jnp
    _ = float(jnp.asarray(1.0) + 1.0)
    _window.checkpoint("post-init", 320.0)
    _phase(f"engine built; staging one ({args.batch},{hw},{hw},3) buffer")
    buf = jax.device_put(rng.integers(
        0, 256, size=(args.batch, hw, hw, 3), dtype=np.uint8))

    _window.checkpoint("post-staging", 300.0,
                       barrier=lambda: int(buf[0, 0, 0, 0]))
    _phase("staged; compiling the forward")
    t0 = time.time()
    out = eng._jitted(eng.params, buf)
    _ = float(out[0, 0])  # compile + warm, real barrier
    compile_s = time.time() - t0
    _window.checkpoint("post-compile", 60.0)
    _phase(f"compiled in {compile_s:.1f}s; timing untraced reference")

    # Timed reference for the traced region (no profiler overhead).
    t0 = time.time()
    for _ in range(args.trace_batches):
        _ = float(eng._jitted(eng.params, buf)[0, 0])
    untraced_s = time.time() - t0

    _phase(f"untraced {untraced_s / args.trace_batches * 1e3:.0f} ms/batch; "
           f"tracing {args.trace_batches} batches")
    log_dir = tempfile.mkdtemp(prefix="vrt_trace_")
    jax.profiler.start_trace(log_dir)
    try:
        for _ in range(args.trace_batches):
            _ = float(eng._jitted(eng.params, buf)[0, 0])
    finally:
        jax.profiler.stop_trace()

    _phase("trace captured; parsing XSpace")
    plane, by_cat, by_op, total_ps = parse_xspace(log_dir)
    n = args.trace_batches
    ms = 1e-9  # ps -> ms

    cats = sorted(by_cat.items(), key=lambda kv: -kv[1][0])
    ops = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:args.top]
    print(json.dumps({
        "metric": "embed_device_trace",
        "batch": args.batch,
        "plane": plane,
        "batches_traced": n,
        "untraced_wall_ms_per_batch": round(untraced_s / n * 1e3, 1),
        "device_total_ms_per_batch": round(total_ps * ms / n, 1),
        "compile_s": round(compile_s, 1),
        "by_category_ms_per_batch": {
            k: round(v[0] * ms / n, 2) for k, v in cats},
        "top_ops_ms_per_batch": [
            {"op": k, "ms": round(v[0] * ms / n, 2), "count": v[1] // n}
            for k, v in ops],
    }))

    if args.keep_trace:
        shutil.copytree(log_dir, args.keep_trace, dirs_exist_ok=True)
        print(f"trace kept at {args.keep_trace}", file=sys.stderr)
    else:
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
