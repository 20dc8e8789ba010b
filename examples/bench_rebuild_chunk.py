"""Chunk-level DB rebuild wall clock vs the reference's own number.

The reference's ONLY committed rebuild timing is 421.17 s for the
chunk-level DB rebuild on its multi-GPU node (decode + HF ViT embed at
batch 16 + 2304-d stats + projector + chroma write):
/root/reference/nba_proj/db_maintainence/db_rebuild_chunk.py:53
("# time it took: 421.1687158672139"). This harness runs OUR production
rebuild — `db.builders.rebuild_chunk_db` (wipe -> per-chunk frame
embeddings -> concat(mean, mean-delta, std-delta) 2304-d stats ->
trained ProjectionHead -> upsert with chunk metadata) — at the
reference's dataset scale (~3.7k train chunks of 8-12 frames,
nba_proj/config_stage2.py:48-62) on ONE TPU chip, against a real
on-disk Collection.

Methodology (CLAUDE.md): frame pixels are staged device-resident before
the clock starts and `frame_embed_fn` consumes them in the engine's
cached (512, 224, 224, 3) jit shape — host JPEG decode is excluded as
environment-bound, exactly like bench_e2e_segment.py (the native
decoder does 120+ f/s per host core and overlaps with device embed in
the production `embed_paths` pipeline). Everything else is the real
path, including the per-batch device->host embedding readback that
chunk_stats/store writes require, the projector forward, and the
store's upsert + flush to disk.

Chunk batch 64 x 8 frames/chunk = 512 frames per embed dispatch — the
exact jit signature bench.py and the e2e bench already prime in the
persistent compile cache.

Usage: python examples/bench_rebuild_chunk.py            # on-chip
       python examples/bench_rebuild_chunk.py --tiny     # CPU smoke
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _engines import build_engine, route_platform  # noqa: E402

if "--tiny" in sys.argv:
    # --tiny is a CPU smoke: NEVER let it route to the axon tunnel (a
    # timeout-killed compile there wedges the tunnel -- CLAUDE.md).
    os.environ.setdefault("VRT_PLATFORM", "cpu")
route_platform()

REF_SECONDS = 421.17  # db_rebuild_chunk.py:53, multi-GPU node


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=3712,
                    help="reference scale: ~3.7k train chunks")
    ap.add_argument("--frames-per-chunk", type=int, default=8)
    ap.add_argument("--chunk-batch", type=int, default=64,
                    help="64 chunks x 8 frames = one 512-frame dispatch")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny ViT + 32x32 frames (CPU smoke, not a bench)")
    args = ap.parse_args()
    if args.chunks % args.chunk_batch != 0 and not args.tiny:
        # frame_embed_fn asserts exact full-batch dispatches; fail here,
        # before any device work, not on the ragged tail mid-bench.
        ap.error(f"--chunks ({args.chunks}) must be a multiple of "
                 f"--chunk-batch ({args.chunk_batch})")

    import jax

    from vit_research_tpu.db.builders import rebuild_chunk_db
    from vit_research_tpu.models.heads import ProjectionHead
    from vit_research_tpu.store.vector_store import PersistentClient

    if args.tiny:
        args.chunks, args.chunk_batch = 48, 16
        hw, d = 32, 64
    else:
        hw, d = 224, 768

    t, cb = args.frames_per_chunk, args.chunk_batch
    frames_per_dispatch = cb * t
    eng = build_engine(frames_per_dispatch, tiny=args.tiny)

    # Trained projector stand-in: real ProjectionHead at the reference's
    # 2304 -> 768 shape (db_rebuild_chunk.py:47-49), random weights (the
    # rebuild cost does not depend on the weight values).
    proj = ProjectionHead(input_dim=3 * d, hidden_dim=d, proj_dim=d)
    proj_params = proj.init(jax.random.PRNGKey(0), np.zeros((1, 3 * d),
                                                            np.float32))
    proj_jit = jax.jit(lambda s: proj.apply(proj_params, s))

    rng = np.random.default_rng(0)

    # Stage device-resident pixel buffers (decode excluded — docstring).
    n_buffers = 4
    buffers = [jax.device_put(rng.integers(
        0, 256, size=(frames_per_dispatch, hw, hw, 3), dtype=np.uint8))
        for _ in range(n_buffers)]

    calls = {"n": 0}

    def frame_embed_fn(frame_paths):
        # Production signature (paths in, embeddings out); pixels come
        # from the pre-staged device buffers instead of the decode pool.
        assert len(frame_paths) == frames_per_dispatch, len(frame_paths)
        out = eng._jitted(eng.params, buffers[calls["n"] % n_buffers])
        calls["n"] += 1
        return np.asarray(out, np.float32)  # real device->host readback

    def project_fn(stats):
        return np.asarray(proj_jit(np.asarray(stats, np.float32)))

    # Reference-shaped chunk metadata (dataset.py windows).
    chunk_samples = [{
        "vid": int(i % 8), "clip": int(i % 30),
        "start_idx": int(2 * i), "end_idx": int(2 * i + t),
        "frames": [f"vid{i % 8}_frame_{2 * i + j}.jpg" for j in range(t)],
        "side": ["left", "right"][i % 2], "label": int(i % 2),
        "t_center": (i % 100) / 100.0, "t_width": 0.05,
    } for i in range(args.chunks)]

    # Warm the two jit shapes outside the clock (the reference's 421 s is
    # a steady-state epoch-periodic rebuild; torch/TF warm-up is likewise
    # excluded from its timing line).
    _ = frame_embed_fn(chunk_samples[0]["frames"] * cb)
    _ = project_fn(np.zeros((cb, 3 * d), np.float32))
    calls["n"] = 0

    with tempfile.TemporaryDirectory() as root:
        client = PersistentClient(path=root, autoflush=False)
        col = client.get_or_create_collection(
            "ratt_chunks", metadata={"hnsw:space": "cosine"})
        t0 = time.time()
        total = rebuild_chunk_db(chunk_samples, frame_embed_fn, project_fn,
                                 col, batch_size=cb)
        col.flush()
        wall = time.time() - t0

    n_frames = args.chunks * t
    print(json.dumps({
        "metric": "chunk_db_rebuild_wall",
        "value": round(wall, 2),
        "unit": "seconds",
        "vs_reference_s": REF_SECONDS,
        "speedup_vs_reference": round(REF_SECONDS / wall, 1),
        "chunks": total,
        "frame_embeds": n_frames,
        "frames_per_sec": round(n_frames / wall, 1),
        "tiny": args.tiny,
    }))


if __name__ == "__main__":
    main()
