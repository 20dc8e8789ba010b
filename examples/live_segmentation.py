"""Live possession segmentation demo: clips surface MID-GAME.

Two ways to consume a frame stream, both on tiny synthetic data
(CPU-friendly, finishes in seconds):

1. **Library**: feed (frame_names, embeddings) micro-batches to
   ``segment_knn_hmm_stream`` as the embedder produces them and receive
   ClipIntervals the moment their padded extent is final — bounded
   memory (StreamingViterbi fixed-lag window), exact vs the offline
   decode wherever survivor paths coalesce.
2. **Daemon**: start the serving daemon on a labeled corpus collection,
   open a segment session over its unix socket, push frames as they
   "arrive", and print clips as the server streams them back.

The reference's incremental loop (nba_proj/generate_clips_hmm.py) could
only decode after the whole game; here the first possession prints
while the stream is still running.

    python examples/live_segmentation.py [workdir]
"""

import os
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

GAME = [("none", 30), ("left", 150), ("none", 40), ("right", 140),
        ("none", 30)]  # the synthetic broadcast: two possessions


def make_world(workdir):
    """Three distinct 'camera angles' + a labeled corpus collection
    built from the engine's own embeddings (stands in for
    `cli write-frame-db` over manually-labeled frames)."""
    from PIL import Image

    from vit_research_tpu.store.vector_store import PersistentClient

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
    coll = PersistentClient(os.path.join(workdir, "db")) \
        .get_or_create_collection("corpus", metadata={"hnsw:space": "l2"})
    ids, rows, metas = [], [], []
    for i, side in enumerate(sides):
        probs = {f"{s}_prob": (0.9 if s == side else 0.05) for s in sides}
        for c in range(5):
            ids.append(f"{side}{c}")
            rows.append(embs[i])
            metas.append({"label": side, **probs})
    coll.upsert(ids, np.asarray(rows), metadatas=metas)
    return engine, paths, coll


def library_stream(engine, paths, coll):
    from vit_research_tpu.segment.knn import corpus_from_collection
    from vit_research_tpu.segment.pipeline import segment_knn_hmm_stream

    print("== library: segment_knn_hmm_stream ==")
    corpus = corpus_from_collection(coll)

    def batches():
        stream = [s for side, n in GAME for s in [side] * n]
        for i in range(0, len(stream), 32):  # frames "arrive" in batches
            chunk = stream[i: i + 32]
            from PIL import Image

            frames = np.stack([np.asarray(Image.open(paths[s]))
                               for s in chunk])
            names = [f"vid1_frame_{i + j}.jpg"
                     for j in range(len(chunk))]
            yield names, engine.embed_batch(frames)

    total = sum(n for _, n in GAME)
    for clip in segment_knn_hmm_stream(batches(), corpus, k=5,
                                       min_len=100, pad=20,
                                       drain_every=8, max_lag=128):
        print(f"  clip: {clip.side:5s} frames {clip.start}..{clip.end} "
              f"(game is {total} frames)")


def daemon_stream(engine, paths, coll, workdir):
    from vit_research_tpu.serve import EmbedServer, SessionClient

    print("== daemon: segment session over the unix socket ==")
    srv = EmbedServer(engine, collection=coll)
    sock = os.path.join(workdir, "vrt.sock")
    ready = threading.Event()
    t = threading.Thread(target=srv.serve, args=(sock,),
                         kwargs={"ready_event": ready}, daemon=True)
    t.start()
    ready.wait(30)
    stream = [s for side, n in GAME for s in [side] * n]
    with SessionClient(sock) as client:
        start = client.request({"op": "segment_start", "k": 5,
                                "min_len": 100, "pad": 20,
                                "max_lag": 128})
        print(f"  session open: corpus_size={start['corpus_size']} "
              f"metric={start['metric']}")
        for i in range(0, len(stream), 32):
            resp = client.request({
                "op": "segment_push",
                "paths": [paths[s] for s in stream[i: i + 32]]})
            for c in resp["clips"]:
                print(f"  clip at frame {resp['frames_seen']}: "
                      f"{c['side']:5s} frames {c['start']}..{c['end']}")
        fin = client.request({"op": "segment_finish"})
        for c in fin["clips"]:
            print(f"  clip at finish: {c['side']:5s} "
                  f"frames {c['start']}..{c['end']}")
        print(f"  done: {fin['frames_seen']} frames, "
              f"{fin['forced']} forced commits")
    srv.stop()
    t.join(timeout=10)


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="vrt_live_")
    os.makedirs(workdir, exist_ok=True)
    engine, paths, coll = make_world(workdir)
    library_stream(engine, paths, coll)
    daemon_stream(engine, paths, coll, workdir)


if __name__ == "__main__":
    main()
