"""End-to-end embed+segment wall clock for a 10-minute video (BASELINE.md
target: <5 s for ~18k frames @30 fps).

Measures the production segmentation composition on one chip —
ViT-B/16 @224 frame embedding (parallel/embed.py) -> k-NN against a
per-game labeled corpus (ops/topk.masked_topk, the device core of
segment/knn.knn_labels) -> confidence fusion (segment/knn.fused_confidence,
host numpy) -> Viterbi smoothing (segment/hmm.smooth_probabilities) ->
clip intervals (segment/clips.clip_intervals_from_decoded). This is the
same math `cli segment --method knn-hmm` runs
(reference counterpart: nba_proj/generate_clips_hmm.py:367-490, which made
3 device/DB crossings PER FRAME; here the game is 4 device calls total).

Methodology (CLAUDE.md): device-resident uint8 inputs and a device-resident
corpus (production stages the corpus once — KnnHmmStreamSession), tiny
readbacks only (neighbor ids ~4 MB, the decoded path ~72 KB); host JPEG
decode is excluded as environment-bound (the native decoder does 120+ f/s
per host core and scales across cores). float() readbacks are the
completion barriers (block_until_ready lies over this tunnel).

Modes:
  parity    embed every frame with the parity engine
  strided   embed every 4th frame + device-side linear interpolation
            (parallel/embed.strided_interp_device == embed_video_strided)
  tome      every frame, ToMe r=16 token merging (opt-in, non-parity)

--decode (composes with parity/strided): the game is real JPEGs on disk
and the embed phase runs the engine's threaded-prefetch path
(parallel/embed.embed_paths / embed_video_strided) — host decode
overlapped under device dispatch, the full price the reference's
pipeline pays (nba_proj/smarter_generate_clips.py:69-94 decodes every
frame before embedding). Also measures the single-core decode rate
(load_frames num_workers=1, native decoder), so "N host cores make
decode vanish" is a formula with measured constants:
N = device_frames_per_sec / decode_fps_per_core. JPEGs are generated
once into --frames-dir (reused across invocations).

Run ONE mode per process (compiles stay short; the persistent compile
cache makes repeat invocations cheap). --warmup {embed,segment} compiles
just that phase and exits — use to pre-populate the cache so the measured
invocation fits comfortably inside a tool-call window.

Usage: python examples/bench_e2e_segment.py --mode parity
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
from _engines import build_engine as _build_engine  # noqa: E402
from _engines import route_platform  # noqa: E402

if "--tiny" in sys.argv:
    # --tiny is a CPU smoke: NEVER let it route to the axon tunnel (a
    # timeout-killed compile there wedges the tunnel -- CLAUDE.md).
    os.environ.setdefault("VRT_PLATFORM", "cpu")
route_platform()


def build_engine(mode: str, batch: int, tiny: bool = False):
    tome_r = (2 if tiny else 16) if mode in ("tome", "fast") else 0
    quant, scales = None, ()
    if mode == "fast" and not tiny:  # tiny smoke: tome-only (no 7-min calib)
        # The full fast stack: ToMe r=16 + static-int8 GEMMs (+ strided
        # embed in the caller). Scales calibrate in a CPU subprocess
        # exactly like bench_int8_static (eager forwards must not run
        # over the TPU tunnel); the result is deterministic (seed 0,
        # fixed inputs), so it is cached on disk — a --warmup run plus
        # the measured run must not pay the eager ViT-B calibration
        # twice.
        cache = f"/tmp/vrt_int8_scales_tome{tome_r}.json"
        if os.path.exists(cache):
            with open(cache) as f:
                scales = tuple(json.load(f)["scales"])
            print(f"[e2e] loaded {len(scales)} cached int8-static sites "
                  f"from {cache}", file=sys.stderr, flush=True)
        else:
            import subprocess

            env = dict(os.environ, VRT_PLATFORM="cpu")
            env.pop("VRT_WINDOW_S", None)
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_int8_static.py"),
                 "--calibrate-only", "--tome-r", str(tome_r)],
                capture_output=True, text=True, timeout=3600, env=env)
            if r.returncode != 0:
                raise SystemExit(f"calibration failed:\n{r.stderr[-2000:]}")
            scales = tuple(
                json.loads(r.stdout.strip().splitlines()[-1])["scales"])
            with open(cache, "w") as f:
                json.dump({"scales": list(scales), "tome_r": tome_r}, f)
            print(f"[e2e] calibrated {len(scales)} int8-static sites "
                  f"(cached to {cache})", file=sys.stderr, flush=True)
        quant = "int8-static"
    return _build_engine(batch, tiny=tiny, tome_r=tome_r,
                         **({"gemm_quant": quant,
                             "gemm_quant_scales": scales} if quant else {}))


def _ensure_frames(frames_dir: str, n: int, src_hw: tuple) -> list:
    """n JPEG frames on disk (generated once, reused across invocations).

    ``src_hw`` is the STORED resolution — what the frame-dump stage wrote.
    224x224 models a dump stage that owns the downscale (decode cost
    scales with stored pixels, the TPU-native layout); (1080, 1920)
    models the reference's dump (nba_proj/preprocess_frames.py:59-91
    stores 1920x1080 and every later pass re-decodes full frames)."""
    os.makedirs(frames_dir, exist_ok=True)
    paths = [os.path.join(frames_dir, f"vid1_frame_{i}.jpg")
             for i in range(n)]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        from PIL import Image

        h, w = src_hw
        rng = np.random.default_rng(0)
        t0 = time.time()
        for p in missing:
            # Low-frequency noise: pure white noise JPEGs are
            # pathologically entropy-dense (unrealistic decode cost).
            small = rng.integers(0, 256, size=(h // 8, w // 8, 3),
                                 dtype=np.uint8)
            img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
            img.save(p, format="JPEG", quality=90)
        print(json.dumps({"setup": "wrote_jpegs", "n": len(missing),
                          "src_hw": list(src_hw),
                          "seconds": round(time.time() - t0, 1)}),
              file=sys.stderr)
    return paths


def _ensure_content_frames(frames_dir: str, n: int, cut_every: int,
                           hw: int, jitter: int = 4) -> list:
    """n JPEGs with SCENE structure — the refine gate is content-driven,
    so unlike _ensure_frames these carry controlled novelty: scene
    ``i // cut_every`` gets its own low-frequency base image; frames
    inside a scene add only a tiny brightness jitter (novelty ~0 between
    neighbouring keyframes), while a scene cut inside a stride gap makes
    its bounding keyframes disagree (novelty >> threshold)."""
    os.makedirs(frames_dir, exist_ok=True)
    paths = [os.path.join(frames_dir, f"vid1_frame_{i}.jpg")
             for i in range(n)]
    if all(os.path.exists(p) for p in paths):
        return paths
    from PIL import Image

    t0 = time.time()
    base, base_scene = None, -1
    for i, p in enumerate(paths):
        if os.path.exists(p):
            continue
        s = i // cut_every
        if s != base_scene:
            rng = np.random.default_rng(1_000_003 + s)
            small = rng.integers(0, 256, size=(hw // 8, hw // 8, 3),
                                 dtype=np.uint8)
            base = np.asarray(Image.fromarray(small).resize(
                (hw, hw), Image.BILINEAR), dtype=np.int32)
            base_scene = s
        shift = int(np.random.default_rng(i).integers(-jitter, jitter + 1))
        img = np.clip(base + shift, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(p, format="JPEG", quality=90)
    print(json.dumps({"setup": "wrote_content_jpegs", "n": n,
                      "cut_every": cut_every,
                      "seconds": round(time.time() - t0, 1)}),
          file=sys.stderr, flush=True)
    return paths


def run_refine_mode(args):
    """The REFINED fast stack, measured (VERDICT r4 item 1): ToMe r=16 +
    static-int8 GEMMs + strided-4 embedding + novelty-gated refinement
    (`--stride-refine auto`, parallel/embed.embed_video_strided) on two
    content regimes in ONE process — a quiet dossier-like sequence
    (scene cuts rarer than the stride window: refinement ~free) and a
    cut-dense one (a cut in every other stride gap: the gate fires
    often, approaching full-rate cost by design). Decode-included (the
    refine pass re-decodes interior frames of hot gaps from disk, so a
    device-resident variant would misprice it); a same-engine full-rate
    run gives the retained-speedup denominator."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.ops.topk import masked_topk
    from vit_research_tpu.parallel.embed import (REFINE_THRESHOLD_DEFAULT,
                                                 embed_video_strided)
    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.clips import clip_intervals_from_decoded
    from vit_research_tpu.segment.hmm import STATES, smooth_probabilities

    def _phase(msg):
        print(f"[e2e-refine] {msg}", file=sys.stderr, flush=True)

    n, b = args.frames, args.batch
    hw = 32 if args.tiny else 224
    _phase(f"building FAST engine (tome+int8-static, B={b})")
    eng = build_engine("fast", b, tiny=args.tiny)
    _ = float(jnp.asarray(1.0) + 1.0)
    _window.checkpoint("post-init", 600.0)

    # Two content regimes: scene cuts far apart (quiet) vs a cut inside
    # every other stride gap (cut-dense). Cut period 2*stride lands one
    # cut per two gaps -> ~50% hot.
    worlds = [("quiet", max(n // 8, 512)), ("cutdense", 2 * args.stride)]
    # cut_every is part of the cache key: the cutdense world's period is
    # 2*stride, so a rerun with a different --stride must not silently
    # reuse frames with the wrong scene-cut density.
    world_paths = {
        name: _ensure_content_frames(
            os.path.join(args.frames_dir or "/tmp",
                         f"vrt_refine_frames_{hw}_{n}_{name}_c{cut_every}"),
            n, cut_every, hw)
        for name, cut_every in worlds}

    _phase("warming jits (pad buckets + topk + viterbi)")
    t0 = time.time()
    eng.warmup()
    d = eng.out_dim
    rng = np.random.default_rng(0)
    topk_jit = jax.jit(lambda q, c: masked_topk(q, c, None, k=args.k,
                                                metric="l2"))
    wq = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    _, wi = topk_jit(wq, wq)
    _ = int(jnp.asarray(wi)[0, 0])
    del wq, wi
    warm_probs = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 1e-3
    smooth_probabilities(warm_probs / warm_probs.sum(1, keepdims=True))
    warm_s = round(time.time() - t0, 1)
    _window.checkpoint("post-warm", 600.0)
    _phase(f"warm in {warm_s}s; measuring")

    corpus_labels = rng.integers(0, 3, size=n)
    corpus_probs = np.eye(3, dtype=np.float32)[corpus_labels]

    def segment_from(embs_h):
        t0 = time.time()
        embs = jax.device_put(embs_h.astype(np.float32))
        scores, idx = topk_jit(embs, embs)
        idx_h = np.asarray(idx)
        valid = np.asarray(scores) > -1e29
        nl = np.where(valid, corpus_labels[idx_h], -1)
        fused = knn_mod.fused_confidence(nl, corpus_probs[idx_h],
                                         top_n=args.k,
                                         confidence_threshold=0.7)
        path = smooth_probabilities(fused["emissions"])
        decoded = [STATES[i] for i in path]
        intervals = clip_intervals_from_decoded(decoded, min_len=100,
                                                pad=100)
        return time.time() - t0, len(intervals)

    def row(world, variant, embed_s, seg_s, clips, stats=None):
        total = embed_s + seg_s
        out = {
            "metric": "e2e_refined_fast_stack",
            "world": world, "variant": variant, "frames": n,
            "value": round(total, 2), "unit": "seconds",
            "phases": {"decode_embed_s": round(embed_s, 2),
                       "segment_s": round(seg_s, 2)},
            "clips": clips,
            "fps_effective": round(n / total, 1),
        }
        if stats is not None:
            gaps = max(stats.get("gaps", 0), 1)
            out["refine"] = {
                "hot_gap_frac": round(stats.get("refined_gaps", 0)
                                      / gaps, 3),
                "refined_frames": stats.get("refined_frames", 0),
                "exact_embed_frac": round(
                    (stats.get("keys", 0)
                     + stats.get("refined_frames", 0)) / n, 3),
                "novelty_p50": round(stats.get("novelty_p50", 0.0), 4),
                "novelty_max": round(stats.get("novelty_max", 0.0), 4),
                # phase attribution (embed_video_strided stats): where
                # the refined path's time goes beyond raw upload
                "keys_s": stats.get("keys_s"),
                "refine_embed_s": stats.get("refine_embed_s"),
            }
        print(json.dumps(out), flush=True)
        return total

    # Full-rate denominator (one world: content doesn't change its cost
    # — every frame decodes + embeds regardless).
    _phase(f"full-rate fast engine on quiet ({n} frames)")
    t0 = time.time()
    embs_h = eng.embed_paths(world_paths["quiet"],
                             num_workers=args.decode_workers, prefetch=3,
                             use_native=args.native_decode)
    full_embed_s = time.time() - t0
    seg_s, clips = segment_from(embs_h)
    full_total = row("quiet", "fullrate", full_embed_s, seg_s, clips)
    _window.checkpoint("post-fullrate", 600.0)

    results = {}
    for world in ("quiet", "cutdense"):
        for variant in ("strided", "refined"):
            _phase(f"{variant} on {world}")
            stats = {} if variant == "refined" else None
            thresh = (REFINE_THRESHOLD_DEFAULT if variant == "refined"
                      else None)
            t0 = time.time()
            embs_h = embed_video_strided(
                eng, world_paths[world], stride=args.stride,
                refine_threshold=thresh, stats=stats,
                num_workers=args.decode_workers,
                use_native=args.native_decode)
            embed_s = time.time() - t0
            seg_s, clips = segment_from(embs_h)
            results[(world, variant)] = row(world, variant, embed_s,
                                            seg_s, clips, stats)
            _window.checkpoint(f"post-{world}-{variant}", 600.0)

    print(json.dumps({
        "metric": "e2e_refined_fast_stack_summary",
        "frames": n,
        "fullrate_s": round(full_total, 2),
        "retained_speedup": {
            w: round(full_total / results[(w, "refined")], 2)
            for w in ("quiet", "cutdense")},
        "strided_speedup": {
            w: round(full_total / results[(w, "strided")], 2)
            for w in ("quiet", "cutdense")},
        "warm_s": warm_s,
    }), flush=True)


def run_decode_mode(args):
    """Full path WITH host JPEG decode (VERDICT r2 item 1): decode
    overlapped under device dispatch via the engine prefetch path."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.data.preprocess import load_frames
    from vit_research_tpu.ops.topk import masked_topk
    from vit_research_tpu.parallel.embed import embed_video_strided
    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.clips import clip_intervals_from_decoded
    from vit_research_tpu.segment.hmm import STATES, smooth_probabilities

    def _phase(msg):
        # stderr progress marks (CLAUDE.md): a timeout-killed run must say
        # WHICH phase (warm vs decode+embed vs segment) ate the window.
        print(f"[e2e-decode] {msg}", file=sys.stderr, flush=True)

    n, b = args.frames, args.batch
    assert args.mode in ("parity", "strided", "both"), \
        "--decode: parity/strided/both"
    # 'both' measures parity AND strided in ONE process: the engine,
    # decode probe, and warm jits are shared, so the (degraded-window
    # dominant) backend-init handshake is paid once.
    modes = ["parity", "strided"] if args.mode == "both" else [args.mode]
    hw = 32 if args.tiny else 224
    src_hw = ((hw, hw) if args.tiny or args.src_size == "224"
              else (1080, 1920))
    dir_tag = hw if src_hw == (hw, hw) else "1080p"
    frames_dir = args.frames_dir or os.path.join(
        "/tmp", f"vrt_bench_frames_{dir_tag}_{n}")
    paths = _ensure_frames(frames_dir, n, src_hw)

    _phase(f"{len(paths)} JPEGs ready; building engine (B={b})")
    eng = build_engine(modes[0], b, tiny=args.tiny)
    # Backend-init barrier, then decide whether warm+measure still fits.
    _ = float(jnp.asarray(1.0) + 1.0)
    _window.checkpoint("post-init", 380.0)
    topk_jit = jax.jit(lambda q, c: masked_topk(q, c, None, k=args.k,
                                                metric="l2"))

    # Single-core decode rate: the measured constant in
    # "cores_needed = device_fps / decode_fps_per_core". PIL is the
    # HF-parity decoder (antialiased resize; load_frames docstring) and
    # is what the timed path below uses.
    _phase("measuring single-core decode rate")
    probe = paths[:min(512 if args.src_size == "224" else 128, n)]
    load_frames(probe[:32], eng.spec, num_workers=1,
                use_native=args.native_decode)  # warm
    t0 = time.time()
    load_frames(probe, eng.spec, num_workers=1,
                use_native=args.native_decode)
    decode_fps_core = len(probe) / (time.time() - t0)
    _phase(f"decode {decode_fps_core:.0f} f/s/core; warming jits "
           "(embed compile included)")

    # Warm every jit in-process (cross-process cache is unreliable over
    # the tunnel — BENCH_NOTES 2026-08-19).
    t0 = time.time()
    rng = np.random.default_rng(0)
    eng.embed_batch(rng.integers(0, 256, size=(b, hw, hw, 3),
                                 dtype=np.uint8))
    if "strided" in modes:
        # (embed_video_strided interpolates on HOST numpy — no extra
        # device jit to warm beyond the embed path exercised here.)
        embed_video_strided(eng, paths[: b * args.stride],
                            stride=args.stride,
                            num_workers=args.decode_workers,
                            use_native=args.native_decode)
    d = eng.out_dim
    wq = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
    _, wi = topk_jit(wq, wq)
    _ = int(jnp.asarray(wi)[0, 0])
    warm_probs = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 1e-3
    smooth_probabilities(warm_probs / warm_probs.sum(1, keepdims=True))
    warm_s = round(time.time() - t0, 1)
    # The measured phase is decode-bound at worst: n frames at the
    # just-measured single-core rate, plus segment slack.
    frames_to_decode = sum(
        (n if mode == "parity" else n // args.stride + 1) for mode in modes)
    _window.checkpoint("post-warm",
                       frames_to_decode / max(decode_fps_core, 1.0) + 40.0)
    _phase(f"warm in {warm_s}s; measuring ({n} frames x {modes})")

    corpus_labels = rng.integers(0, 3, size=n)
    corpus_probs = np.eye(3, dtype=np.float32)[corpus_labels]

    for mode in modes:
        phases = {}
        total0 = time.time()

        # ---- decode+embed, overlapped ----------------------------------
        t0 = time.time()
        if mode == "strided":
            embs_h = embed_video_strided(eng, paths, stride=args.stride,
                                         num_workers=args.decode_workers,
                                         use_native=args.native_decode)
        else:
            embs_h = eng.embed_paths(paths,
                                     num_workers=args.decode_workers,
                                     prefetch=3,
                                     use_native=args.native_decode)
        phases["decode_embed_s"] = time.time() - t0

        # ---- kNN (self-corpus) + confidence fusion ---------------------
        t0 = time.time()
        embs = jax.device_put(embs_h.astype(np.float32))
        scores, idx = topk_jit(embs, embs)
        idx_h = np.asarray(idx)
        valid = np.asarray(scores) > -1e29
        nl = np.where(valid, corpus_labels[idx_h], -1)
        fused = knn_mod.fused_confidence(nl, corpus_probs[idx_h],
                                         top_n=args.k,
                                         confidence_threshold=0.7)
        phases["knn_fuse_s"] = time.time() - t0

        # ---- Viterbi + clips --------------------------------------------
        t0 = time.time()
        path = smooth_probabilities(fused["emissions"])
        decoded = [STATES[i] for i in path]
        intervals = clip_intervals_from_decoded(decoded, min_len=100,
                                                pad=100)
        phases["viterbi_clips_s"] = time.time() - t0

        total = time.time() - total0
        if mode == "strided":
            # Mirror embed_video_strided's key layout exactly: the n-1
            # tail key is added only when it isn't already a stride
            # multiple.
            keys = list(range(0, n, args.stride))
            frames_decoded = len(keys) + (1 if keys[-1] != n - 1 else 0)
        else:
            frames_decoded = n
        print(json.dumps({
            "metric": "e2e_embed_segment_10min_video_decode_included",
            "mode": mode,
            "src_hw": list(src_hw),
            "frames": n,
            "frames_decoded": frames_decoded,
            "value": round(total, 2),
            "unit": "seconds",
            "meets_target_5s": total < 5.0,
            "phases": {k: round(v, 2) for k, v in phases.items()},
            "decode_fps_per_core": round(decode_fps_core, 1),
            "native_decode": args.native_decode,
            "decode_workers": args.decode_workers,
            "warm_s": warm_s,
            "clips": len(intervals),
            "fps_effective": round(n / total, 1),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=["parity", "strided", "tome", "fast", "both",
                             "refine"],
                    default="parity",
                    help="'both' (only with --decode) measures parity AND "
                         "strided in one process (one backend-init); "
                         "'fast' = ToMe r=16 + static-int8 GEMMs + "
                         "strided embed, device-resident only (no "
                         "--decode); 'refine' = the refined fast stack "
                         "(fast + --stride-refine auto) on a quiet AND a "
                         "cut-dense content sequence, decode-included, "
                         "plus a same-engine full-rate denominator")
    ap.add_argument("--frames", type=int, default=18432,
                    help="video length (default ~10 min @30fps, 36 batches)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--warmup", choices=["embed", "segment"], default=None,
                    help="compile just this phase and exit")
    ap.add_argument("--decode", action="store_true",
                    help="feed real JPEGs from disk through the engine's "
                         "threaded-prefetch path (decode overlapped under "
                         "device dispatch) instead of device-resident "
                         "pixels")
    ap.add_argument("--frames-dir", default=None,
                    help="--decode: directory of vidN_frame JPEGs; "
                         "generated (once) if missing")
    ap.add_argument("--native-decode", action="store_true",
                    help="--decode: route JPEGs through the C decoder "
                         "(native/jpeg_fast.c, DCT-scaled libjpeg — "
                         "~5x faster per core on 1080p sources; its "
                         "resize is not antialiased, so embeddings are "
                         "off the exact HF-parity path)")
    ap.add_argument("--src-size", choices=["224", "1080p"], default="224",
                    help="--decode: STORED frame resolution. 224 = the "
                         "dump stage owns the downscale (decode cost "
                         "scales with stored pixels); 1080p = the "
                         "reference's layout (1920x1080 stored, "
                         "re-decoded full every pass)")
    ap.add_argument("--decode-workers", type=int, default=8,
                    help="--decode: decode thread pool size")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny ViT + 32x32 frames (CPU smoke, not a bench)")
    args = ap.parse_args()

    if args.mode == "both" and not args.decode:
        ap.error("--mode both is only meaningful with --decode")
    if args.decode and args.mode in ("fast", "refine"):
        ap.error("--mode fast is the device-resident fast stack and "
                 "--mode refine is decode-included by construction; the "
                 "--decode flag applies to parity/strided/both")
    if args.mode == "refine":
        return run_refine_mode(args)
    if args.decode:
        return run_decode_mode(args)

    import jax
    import jax.numpy as jnp

    from vit_research_tpu.ops.topk import masked_topk
    from vit_research_tpu.parallel.embed import strided_interp_device
    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.clips import clip_intervals_from_decoded
    from vit_research_tpu.segment.hmm import STATES, smooth_probabilities

    n, b = args.frames, args.batch
    assert n % b == 0, (n, b)
    n_dispatch = n // b
    d = 64 if args.tiny else 768
    hw = 32 if args.tiny else 224

    topk_jit = jax.jit(lambda q, c: masked_topk(q, c, None, k=args.k,
                                                metric="l2"))

    rng = np.random.default_rng(0)

    if args.warmup == "segment":
        # Compile the kNN top-k at full shape from synthetic device data
        # (no engine build needed); Viterbi compiles in seconds.
        q = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
        c = jax.device_put(rng.normal(size=(n, d)).astype(np.float32))
        t0 = time.time()
        _, idx = topk_jit(q, c)
        _ = int(jnp.asarray(idx)[0, 0])
        print(json.dumps({"warmup": "segment-topk",
                          "compile_s": round(time.time() - t0, 1)}))
        probs = np.abs(rng.normal(size=(n, 3))) + 1e-3
        t0 = time.time()
        smooth_probabilities(probs / probs.sum(1, keepdims=True))
        print(json.dumps({"warmup": "segment-viterbi",
                          "compile_s": round(time.time() - t0, 1)}))
        return

    eng = build_engine(args.mode, b, tiny=args.tiny)

    # Stage device-resident inputs (decode excluded; see module docstring).
    n_buffers = 8
    buffers = [jax.device_put(rng.integers(0, 256, size=(b, hw, hw, 3),
                                           dtype=np.uint8))
               for _ in range(n_buffers)]

    t0 = time.time()
    first = eng._jitted(eng.params, buffers[0])
    _ = float(first[0, 0])
    embed_compile_s = round(time.time() - t0, 1)
    if args.warmup == "embed":
        print(json.dumps({"warmup": f"embed-{args.mode}",
                          "compile_s": embed_compile_s}))
        return

    # Per-game corpus: this game's own labeled frame embeddings (the
    # self-corpus flow of cli segment --method knn-hmm), staged on device
    # once, as KnnHmmStreamSession does in production (untimed setup).
    corpus_parts = [eng._jitted(eng.params, buffers[i % n_buffers])
                    for i in range(n_dispatch)]
    corpus = jnp.concatenate(corpus_parts, axis=0)
    _ = float(corpus[-1, 0])
    corpus_labels = rng.integers(0, 3, size=n)
    corpus_probs = np.eye(3, dtype=np.float32)[corpus_labels]

    # Warm every phase jit IN-PROCESS before the clock (measured 2026-08-19:
    # cross-process compile caching over the axon tunnel is unreliable — the
    # same embed graph recompiled 341.9 s then 374.1 s in back-to-back
    # processes, so the separate-process --warmup modes only help when the
    # server-side cache cooperates). Production is a long-lived daemon with
    # warm jits serving many games; the steady-state per-game cost is what
    # the <5 s target is about, so compiles stay outside the clock.
    t0 = time.time()
    _s, _i = topk_jit(corpus, corpus)
    _ = int(jnp.asarray(_i)[0, 0])
    warm_probs = np.abs(rng.normal(size=(n, 3))).astype(np.float32) + 1e-3
    smooth_probabilities(warm_probs / warm_probs.sum(1, keepdims=True))
    if args.mode in ("strided", "fast"):
        # Warm the EXACT key-assembly signature the timed section runs:
        # an n_key_dispatch-part concatenate + [:n_keys] slice + interp
        # (parity's 36-part concat is already warmed by building the
        # corpus above; strided's 10-part concat is a different op).
        n_keys = n // args.stride + (1 if args.stride > 1 else 0)
        n_key_dispatch = (n_keys + b - 1) // b
        warm_parts = [corpus[i * b:(i + 1) * b]
                      for i in range(n_key_dispatch)]
        warm_keys = jnp.concatenate(warm_parts, axis=0)[:n_keys]
        _ = float(strided_interp_device(warm_keys, args.stride, n)[-1, 0])
    phase_warm_s = round(time.time() - t0, 1)

    phases = {}
    total0 = time.time()

    # ---- embed ----------------------------------------------------------
    t0 = time.time()
    if args.mode in ("strided", "fast"):
        # Key layout per strided_interp_device: [0, stride, ..., n-stride,
        # n-1] for stride>1 (tail key), every frame (no tail) at stride 1.
        n_keys = n // args.stride + (1 if args.stride > 1 else 0)
        # Key batches: ceil(keys / b) dispatches; the production engine
        # pads the ragged tail exactly like this (EmbeddingEngine._dispatch).
        n_key_dispatch = (n_keys + b - 1) // b
        key_parts = [eng._jitted(eng.params, buffers[i % n_buffers])
                     for i in range(n_key_dispatch)]
        keys = jnp.concatenate(key_parts, axis=0)[:n_keys]
        embs = strided_interp_device(keys, args.stride, n)
    else:
        parts = [eng._jitted(eng.params, buffers[i % n_buffers])
                 for i in range(n_dispatch)]
        embs = jnp.concatenate(parts, axis=0)
    _ = float(embs[-1, 0])  # completion barrier
    phases["embed_s"] = time.time() - t0

    # ---- kNN (device) + confidence fusion (host) ------------------------
    t0 = time.time()
    scores, idx = topk_jit(embs, corpus)
    idx_h = np.asarray(idx)
    valid = np.asarray(scores) > -1e29
    nl = np.where(valid, corpus_labels[idx_h], -1)
    neighbor_probs = corpus_probs[idx_h]
    fused = knn_mod.fused_confidence(nl, neighbor_probs, top_n=args.k,
                                     confidence_threshold=0.7)
    phases["knn_fuse_s"] = time.time() - t0

    # ---- Viterbi + clip intervals ---------------------------------------
    t0 = time.time()
    path = smooth_probabilities(fused["emissions"])
    decoded = [STATES[i] for i in path]
    intervals = clip_intervals_from_decoded(decoded, min_len=100, pad=100)
    phases["viterbi_clips_s"] = time.time() - t0

    total = time.time() - total0
    print(json.dumps({
        "metric": "e2e_embed_segment_10min_video",
        "mode": args.mode,
        "frames": n,
        "value": round(total, 2),
        "unit": "seconds",
        "meets_target_5s": total < 5.0,
        "phases": {k: round(v, 2) for k, v in phases.items()},
        "embed_compile_s": embed_compile_s,
        "phase_warm_s": phase_warm_s,
        "clips": len(intervals),
        "fps_effective": round(n / total, 1),
    }))


if __name__ == "__main__":
    main()
