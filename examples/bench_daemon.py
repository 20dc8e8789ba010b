"""Quantify the serve daemon: requests/sec and p50/p99 latency under
concurrent games, with and without --coalesce-ms.

The daemon's pitch is "N games share one warm chip" (serve.py; the
reference instead re-created the HF embedder per script —
nba_proj/write_per_vid_embeddings_chroma.py:18-24 and 7 siblings). This
harness puts numbers behind it at the REAL surface: it spawns
``python -m vit_research_tpu.cli serve`` as a subprocess, then N client
threads (one per simulated game) stream ``{"op": "embed", "frames_b64"}``
requests over the unix socket, exactly like follow-mode segmentation
pushes do.

Why coalescing matters on this engine: the embed jit has ONE static
batch shape — a 16-frame request pads to the full engine batch
(parallel/embed.py::_dispatch), so uncoalesced concurrent games serialize
full-size device batches that are each ~97% padding. With --coalesce-ms,
requests landing within the linger window share one padded batch
(serve.py::_Coalescer), so device work scales with offered load, not
request count.

Methodology (CLAUDE.md): ONE TPU process (the daemon); the bench process
itself stays off-device. One warmup request triggers the single embed
compile before timing starts. Latency includes b64 decode + JPEG decode
+ device embed + reply — the full price a follower pays. Run ONE
invocation per tool call on the real chip; ~60 s per invocation after
the compile cache is warm.

Usage:
  python examples/bench_daemon.py --games 4 --coalesce-ms 4
  python examples/bench_daemon.py --games 4 --coalesce-ms 0   # baseline
  python examples/bench_daemon.py --transport binary-jpeg ... # binary framing
  python examples/bench_daemon.py --transport binary-raw ...  # raw u8 pixels
  python examples/bench_daemon.py --tiny ...                  # CPU smoke
"""

import argparse
import base64
import io
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _window  # noqa: E402  (window-guard clock starts here)


def make_frames(n: int, hw: int, seed: int = 0):
    """n random frames in all three wire forms: raw uint8 pixels, JPEG
    bytes, and base64-encoded JPEG strings (what JSON followers send)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    raw, jpegs, b64 = [], [], []
    for _ in range(n):
        arr = rng.integers(0, 256, size=(hw, hw, 3), dtype=np.uint8)
        raw.append(arr)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())
        b64.append(base64.b64encode(buf.getvalue()).decode("ascii"))
    return raw, jpegs, b64


def run_game(socket_path: str, data: list, transport: str, per_req: int,
             n_requests: int, latencies: list, errors: list,
             start_gate: threading.Event) -> None:
    from vit_research_tpu.serve import SessionClient

    try:
        with SessionClient(socket_path, timeout=600.0) as client:
            start_gate.wait()
            for i in range(n_requests):
                lo = (i * per_req) % len(data)
                chunk = data[lo:lo + per_req]
                if len(chunk) < per_req:  # wrap
                    chunk = chunk + data[:per_req - len(chunk)]
                t0 = time.monotonic()
                if transport == "json":
                    resp = client.request(
                        {"op": "embed", "frames_b64": chunk})
                elif transport == "binary-jpeg":
                    resp = client.request_binary({"op": "embed"},
                                                 jpegs=chunk)
                else:  # binary-raw: decoded pixels, zero-copy into HBM
                    resp = client.request_binary({"op": "embed"},
                                                 frames=np.stack(chunk))
                dt = time.monotonic() - t0
                if not resp.get("ok"):
                    errors.append(resp.get("error"))
                    return
                latencies.append(dt)
    except Exception as exc:  # connect/transport failures must surface,
        errors.append(repr(exc))  # not die silently in the thread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=4,
                    help="concurrent client threads")
    ap.add_argument("--coalesce-ms", type=float, default=4.0)
    ap.add_argument("--frames-per-req", type=int, default=16,
                    help="frames per embed request (a follow-mode push)")
    ap.add_argument("--requests-per-game", type=int, default=25)
    ap.add_argument("--batch-size", type=int, default=512,
                    help="daemon engine batch (512 == bench.py's cached "
                         "compile shape)")
    ap.add_argument("--transport", default="json",
                    choices=["json", "binary-jpeg", "binary-raw", "all"],
                    help="wire format for embed pushes: JSON+base64 "
                         "(reference protocol), binary JPEG frames, or "
                         "binary raw uint8 pixels (serve.py binary "
                         "framing). 'all' measures the three against ONE "
                         "daemon (one engine compile + one backend-init "
                         "handshake), printing one JSON line each")
    ap.add_argument("--tiny", action="store_true",
                    help="VRT_TINY daemon on CPU (smoke, not a bench)")
    args = ap.parse_args()

    hw = 32 if args.tiny else 224
    env = dict(os.environ)
    if args.tiny:
        env["VRT_TINY"] = "1"
        env["VRT_PLATFORM"] = "cpu"

    from vit_research_tpu.serve import request

    raw, jpegs, frames = make_frames(max(args.frames_per_req * 8, 64), hw)
    data_of = {"json": frames, "binary-jpeg": jpegs, "binary-raw": raw}
    transports = (["json", "binary-jpeg", "binary-raw"]
                  if args.transport == "all" else [args.transport])

    with tempfile.TemporaryDirectory() as td:
        sock = os.path.join(td, "vrt.sock")
        proc = subprocess.Popen(
            [sys.executable, "-m", "vit_research_tpu.cli", "serve",
             "--socket", sock, "--batch-size", str(args.batch_size),
             "--coalesce-ms", str(args.coalesce_ms)],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        # If THIS process is SIGTERMed (tool timeout), the finally below
        # never runs and the daemon is orphaned holding the TPU client.
        # Leave a pid record so it can be reaped by PID (never by pattern
        # — CLAUDE.md) once any in-flight device work has drained. The
        # record is keyed by pid (concurrent/successive runs don't
        # clobber each other) and carries the start time so a reaper can
        # detect PID reuse (compare against /proc/<pid>/stat starttime or
        # ps -o lstart=).
        pid_record = f"/tmp/vrt_bench_daemon.{proc.pid}.pid"
        with open(pid_record, "w") as f:
            json.dump({"pid": proc.pid, "started_unix": time.time(),
                       "argv": "vit_research_tpu.cli serve"}, f)
        try:
            # Generous: the socket appears immediately (the warming
            # placeholder binds before engine build), but READINESS
            # waits on the engine — and a backend-init handshake alone
            # has measured 677-1883 s in degraded tunnel windows
            # (CLAUDE.md). A tight deadline orphans a daemon mid-init
            # and loses the run; this bound covers both loops below.
            deadline = time.monotonic() + 2400
            while not os.path.exists(sock):
                if proc.poll() is not None:
                    raise SystemExit("daemon died during startup")
                if time.monotonic() > deadline:
                    raise SystemExit("daemon socket never appeared")
                time.sleep(0.2)
            # The socket may be the WARMING placeholder (serve.py binds
            # it before the engine builds): poll ping until the real
            # server answers. The sub-second rebind gap between the two
            # surfaces as a transient connect error — retry through it.
            while True:
                if proc.poll() is not None:
                    raise SystemExit("daemon died while warming")
                if time.monotonic() > deadline:
                    raise SystemExit("daemon never finished warming "
                                     "(still initializing at deadline)")
                try:
                    r = request(sock, {"op": "ping"}, timeout=10.0)
                except (OSError, ConnectionError):
                    time.sleep(0.5)
                    continue
                if r.get("ok") and not r.get("warming"):
                    break
                time.sleep(2.0)

            # Warmup: one full-engine-batch request compiles the single
            # jit shape (and a second tiny one exercises the padded path)
            # so the timed section measures steady state, not compile.
            # The budget is deliberately huge: a degraded tunnel window
            # pushed this compile past 900 s on 2026-08-19 and the old
            # tight timeout aborted the whole bench after paying for most
            # of the compile.
            # Window guard (daemon is IDLE here — a SystemExit propagates
            # to the finally below, which shuts it down gracefully).
            _window.checkpoint("pre-warmup", 300.0)
            t0 = time.monotonic()
            big = frames * ((args.batch_size // len(frames)) + 1)
            resp = request(sock, {"op": "embed",
                                  "frames_b64": big[:args.batch_size]},
                           timeout=3600.0)
            assert resp.get("ok"), resp
            resp = request(sock, {"op": "embed", "frames_b64": frames[:2]},
                           timeout=3600.0)
            assert resp.get("ok"), resp
            warmup_s = time.monotonic() - t0
            # Daemon idle again (warmup replies received = device drained).
            _window.checkpoint("post-warmup", 120.0 * len(transports))

            prev = request(sock, {"op": "stats"}, timeout=60.0)
            for transport in transports:
                latencies: list[float] = []
                errors: list = []
                gate = threading.Event()
                threads = [
                    threading.Thread(
                        target=run_game,
                        args=(sock, data_of[transport], transport,
                              args.frames_per_req, args.requests_per_game,
                              latencies, errors, gate))
                    for _ in range(args.games)]
                for t in threads:
                    t.start()
                time.sleep(0.3)  # let every game connect before the clock
                gate.set()
                t0 = time.monotonic()
                for t in threads:
                    t.join()
                wall = time.monotonic() - t0

                stats = request(sock, {"op": "stats"}, timeout=60.0)
                delta = {k: (stats.get(k, 0) or 0) - (prev.get(k, 0) or 0)
                         for k in ("device_batches", "frames_embedded")}
                prev = stats
                # Report (and fail) PER TRANSPORT: an error in one must
                # not silently burn the window on the rest, and rows
                # already measured must not be lost to a later failure.
                if errors:
                    raise SystemExit(
                        f"[{transport}] embed errors: {errors[:3]}")
                lat = np.sort(np.asarray(latencies))
                n_req = len(lat)
                if n_req == 0:
                    raise SystemExit(f"[{transport}] no successful requests")
                print(json.dumps({
                    "metric": "daemon_embed_serving",
                    "games": args.games,
                    "transport": transport,
                    "coalesce_ms": args.coalesce_ms,
                    "frames_per_req": args.frames_per_req,
                    "requests": n_req,
                    "wall_s": round(wall, 2),
                    "rps": round(n_req / wall, 1),
                    "frames_per_s": round(
                        n_req * args.frames_per_req / wall, 1),
                    "p50_ms": round(float(lat[n_req // 2]) * 1e3, 1),
                    "p99_ms": round(
                        float(lat[min(n_req - 1, int(n_req * 0.99))]) * 1e3,
                        1),
                    "device_batches": delta["device_batches"],
                    "frames_embedded": delta["frames_embedded"],
                    "warmup_s": round(warmup_s, 1),
                    # which embedding profile the daemon served with
                    # (tome/quant/grayscale — cli/common.engine_profile);
                    # the fast-profile rows are only meaningful if this
                    # confirms the env actually reached the engine
                    "engine_profile": stats.get("engine_profile"),
                }), flush=True)
        finally:
            # Always try the graceful shutdown op first: on an error path
            # the daemon is most likely MID-COMPILE, and killing it then
            # wedges the TPU tunnel for ~an hour (CLAUDE.md). Only kill as
            # the absolute last resort, after a generous drain window.
            if proc.poll() is None:
                try:
                    request(sock, {"op": "shutdown"}, timeout=60.0)
                except Exception:
                    pass
            try:
                proc.wait(timeout=1800)
                try:  # daemon reaped — a stale pid record would point
                    os.remove(pid_record)  # at PID reuse
                except OSError:
                    pass
            except subprocess.TimeoutExpired:
                # 30 min without exiting after a shutdown op means the
                # daemon is stuck inside a device call; killing it now
                # trades a zombie for a wedged tunnel. Leave it and report.
                print(f"WARNING: daemon pid {proc.pid} did not exit; "
                      "NOT killing (mid-compile kill wedges the tunnel). "
                      "Reap it manually by pid once the tunnel recovers.",
                      file=sys.stderr)

if __name__ == "__main__":
    main()
