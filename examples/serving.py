"""Game-day serving demo: ONE warm daemon, many consumers.

The reference re-created its HF embedder in 8 separate scripts and had
no serving surface at all; here a single `cli serve`-equivalent daemon
owns the jitted engine, the labeled corpus and the trained scoring
stack, and everything else is a thin socket client:

1. stateless ops: embed / query / stats;
2. a scored segment session over :class:`SessionClient` — possession
   clips AND make/miss event rows stream back mid-game;
3. two CONCURRENT `segment --follow --socket` followers (two "games")
   sharing the one chip — no engine spin-up per game, device work
   serialized and micro-batched by the daemon;
4. final daemon stats (the `stats` op).

Tiny synthetic data; CPU-friendly, finishes in under a minute:

    python examples/serving.py [workdir]
"""

import os
import shutil
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("VRT_PLATFORM", "cpu"))

import numpy as np  # noqa: E402

from vit_research_tpu.data.preprocess import PreprocessSpec  # noqa: E402
from vit_research_tpu.models.vit import init_vit  # noqa: E402
from vit_research_tpu.parallel.embed import EmbeddingEngine  # noqa: E402
from vit_research_tpu.utils.configs import ViTConfig  # noqa: E402

TINY = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=64,
                 num_layers=1, num_heads=2, mlp_dim=128,
                 use_flash_attention=False)
SPEC = PreprocessSpec(size=(32, 32), rescale=1 / 255.0,
                      mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))

GAME = [("none", 10), ("left", 60), ("none", 12), ("right", 55),
        ("none", 10)]
CHUNK = dict(chunk_size=6, chunk_stride=3, k_sim=3, k_contrast=3,
             k_temporal=2, future_step=1)


def make_world(workdir):
    """Corpus collection + trained-run checkpoints + a ratt_db chunk
    collection (stands in for write-frame-db / train-stage1 /
    train-stage2 / write-ratt-db)."""
    from PIL import Image

    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.utils.configs import (ChunkEncoderConfig,
                                                HeadConfig)
    import jax.numpy as jnp

    model, params = init_vit(TINY, seed=0)
    engine = EmbeddingEngine(model, params, SPEC, batch_size=32,
                             use_fused_patch_embed=False)
    sides = ("left", "right", "none")
    paths = {}
    for i, side in enumerate(sides):
        img = np.full((32, 32, 3), 40 + 80 * i, np.uint8)
        img[: 8 * (i + 1), :8] = 255
        p = os.path.join(workdir, f"{side}.png")
        Image.fromarray(img).save(p)
        paths[side] = p
    embs = engine.embed_batch(
        np.stack([np.asarray(Image.open(paths[s])) for s in sides]))
    client = PersistentClient(os.path.join(workdir, "db"))
    coll = client.get_or_create_collection(
        "corpus", metadata={"hnsw:space": "l2"})
    ids, rows, metas = [], [], []
    for i, side in enumerate(sides):
        probs = {f"{s}_prob": (0.9 if s == side else 0.05) for s in sides}
        for c in range(5):
            ids.append(f"{side}{c}")
            rows.append(embs[i])
            metas.append({"label": side, **probs})
    coll.upsert(ids, np.asarray(rows), metadatas=metas)

    # "trained" stage-1/stage-2 runs (random init saved through the real
    # checkpoint path — the restore plumbing is what the demo exercises)
    dim = engine.out_dim
    enc = ChunkEncoder(ChunkEncoderConfig(
        embed_dim=dim, mlp_dim=4 * dim, max_len=CHUNK["chunk_size"]))
    p1 = enc.init(jax.random.PRNGKey(1),
                  jnp.zeros((1, CHUNK["chunk_size"], dim)))
    head = RATTHeadV2(HeadConfig(embed_dim=dim, k_sim=CHUNK["k_sim"],
                                 k_contrast=CHUNK["k_contrast"],
                                 k_temporal=CHUNK["k_temporal"]))
    p2 = head.init(jax.random.PRNGKey(2), jnp.zeros((1, dim)),
                   jnp.zeros((1, CHUNK["k_sim"], dim)),
                   jnp.zeros((1, CHUNK["k_contrast"], dim)),
                   jnp.zeros((1, CHUNK["k_temporal"], dim)))
    ckpt = os.path.join(workdir, "ckpts")
    for run, p in (("stage1_demo", p1), ("stage2_demo", p2)):
        m = CheckpointManager(ckpt, run)
        m.save(1, {"params": p}, metrics={"val_acc": 1.0})
        m.maybe_update_best(1, 1.0)
        m.wait()

    ratt = client.get_or_create_collection(
        "ratt_db", metadata={"hnsw:space": "cosine"})
    rng = np.random.default_rng(3)
    ids, rows, metas = [], [], []
    for vid in (7, 8):
        for clip in range(2):
            side = "left" if clip % 2 == 0 else "right"
            for s in range(4):
                ids.append(f"v{vid}c{clip}s{s}")
                e = rng.normal(size=dim).astype(np.float32)
                rows.append(e / np.linalg.norm(e))
                metas.append({"vid_num": vid, "clip_num": clip,
                              "side": side, "label": (vid + clip) % 2,
                              "t_center": (s + 0.5) / 4, "t_width": 0.1,
                              "start_idx": s * 3, "end_idx": s * 3 + 5})
    ratt.upsert(ids, np.stack(rows), metadatas=metas)
    client.flush()
    return engine, paths, coll, ckpt


def score_cfg(workdir, ckpt):
    return {"ckpt": ckpt, "stage1_run_id": "stage1_demo",
            "stage2_run_id": "stage2_demo",
            "db": os.path.join(workdir, "db"), "collection": "ratt_db",
            **CHUNK}


def stateless_ops(sock, paths):
    from vit_research_tpu.serve import request

    print("== stateless ops: embed / query / stats ==")
    emb = request(sock, {"op": "embed", "paths": [paths["left"]]})
    print(f"  embed: {len(emb['embeddings'])} row(s), "
          f"D={len(emb['embeddings'][0])}")
    q = request(sock, {"op": "query", "paths": [paths["left"]],
                       "n_results": 2})
    print(f"  query: top ids {q['ids'][0]}")
    st = request(sock, {"op": "stats"})
    print(f"  stats: uptime {st['uptime_s']}s, "
          f"requests {st['requests']}")


def scored_session(sock, paths, workdir, ckpt):
    from vit_research_tpu.serve import SessionClient

    print("== scored segment session: clips + event rows mid-game ==")
    stream = [s for side, n in GAME for s in [side] * n]
    with SessionClient(sock) as c:
        start = c.request({"op": "segment_start", "k": 5, "min_len": 40,
                           "pad": 8, "max_lag": 128, "vid": 1,
                           "score_events": score_cfg(workdir, ckpt)})
        assert start["ok"], start
        print(f"  session open (scoring={start['scoring']})")
        replies = []
        for i in range(0, len(stream), 32):
            r = c.request({"op": "segment_push",
                           "paths": [paths[s] for s in stream[i: i + 32]]})
            replies.append(r)
        replies.append(c.request({"op": "segment_finish"}))
    for r in replies:
        for clip, ev in zip(r["clips"], r.get("events", [])):
            top = (ev or {}).get("topk_chunks", [None])[0]
            where = (f"top event chunk idx {top['chunk_start_idx']}.."
                     f"{top['chunk_end_idx']} P(make)={top['prob']:.3f}"
                     if top else "too short to chunk")
            print(f"  clip {clip['side']:5s} {clip['start']}.."
                  f"{clip['end']}: {where}")


def concurrent_followers(sock, paths, workdir, ckpt):
    """Two 'games' dumping frames to disk, two `segment --follow
    --socket` loops sharing the daemon."""
    from vit_research_tpu import cli

    print("== two concurrent --follow --socket games, one daemon ==")
    stream = [s for side, n in GAME for s in [side] * n]
    outs = []
    for vid in (1, 2):
        fdir = os.path.join(workdir, f"game{vid}")
        os.makedirs(fdir, exist_ok=True)
        for i, s in enumerate(stream, start=1):
            shutil.copy(paths[s],
                        os.path.join(fdir, f"vid{vid}_frame_{i}.jpg"))
        open(os.path.join(fdir, "STOP"), "w").close()
        outs.append(os.path.join(workdir, f"clips_game{vid}"))

    sc = score_cfg(workdir, ckpt)
    def follow(vid):
        cli.main(["segment", os.path.join(workdir, f"game{vid}"),
                  "--method", "knn-hmm", "--follow", "--socket", sock,
                  "--k", "5", "--min-len", "40", "--pad", "8",
                  "--max-lag", "128", "--out", outs[vid - 1],
                  "--vid", str(vid), "--idle-timeout", "20",
                  "--poll-interval", "0.05", "--batch-size", "32",
                  "--score-events", "--score-ckpt", sc["ckpt"],
                  "--stage1-run-id", sc["stage1_run_id"],
                  "--stage2-run-id", sc["stage2_run_id"],
                  "--score-db", sc["db"],
                  "--score-collection", sc["collection"],
                  "--chunk-size", str(sc["chunk_size"]),
                  "--chunk-stride", str(sc["chunk_stride"]),
                  "--k-sim", str(sc["k_sim"]),
                  "--k-contrast", str(sc["k_contrast"]),
                  "--k-temporal", str(sc["k_temporal"]),
                  "--future-step", str(sc["future_step"])])

    threads = [threading.Thread(target=follow, args=(v,)) for v in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for vid in (1, 2):
        clips = sorted(d for d in os.listdir(outs[vid - 1])
                       if d.startswith(f"vid{vid}_clip"))
        print(f"  game {vid}: {clips} + events.jsonl")


def main():
    from vit_research_tpu.serve import EmbedServer, request

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="vrt_serving_")
    os.makedirs(workdir, exist_ok=True)
    engine, paths, coll, ckpt = make_world(workdir)

    srv = EmbedServer(engine, collection=coll)
    sock = os.path.join(workdir, "vrt.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    # a False here means serve() raised (e.g. a live previous run still
    # owns the socket) — fail with the real cause, not a downstream
    # connection error
    assert ready.wait(30), f"daemon failed to start on {sock}"

    stateless_ops(sock, paths)
    scored_session(sock, paths, workdir, ckpt)
    concurrent_followers(sock, paths, workdir, ckpt)
    st = request(sock, {"op": "stats"})
    print(f"== final stats == sessions: {st['segment']}, "
          f"frames embedded: {st['frames_embedded']}")
    srv.stop()
    t.join(timeout=10)


if __name__ == "__main__":
    main()
