"""Extended benchmark suite: the five BASELINE.json configs.

``bench.py`` stays the driver's single headline JSON line; this suite
measures every benchmark config named in BASELINE.json on real hardware
and prints one JSON object per line:

1. single-frame ViT-B/16 embedding forward (latency),
2. batched preprocess -> per-video embeddings (throughput incl. host
   decode, the write_per_video_embeddings path),
3. HMM Viterbi clip-boundary segmentation over per-frame probabilities,
4. retrieval + RATT head classification step (kNN fused into the head),
5. multi-video end-to-end: decode -> embed -> kNN+HMM segment -> clip
   DB write,
6. stage-2 training step (RATTHeadV2 fwd+bwd+Adam update over cached
   sim/contrast/temporal branches — the training_stage2.py hot loop).
"""

import json
import os
import tempfile
import time

import numpy as np


def report(name, value, unit, **extra):
    print(json.dumps({"config": name, "value": round(value, 2),
                      "unit": unit, **extra}), flush=True)


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vit_research_tpu.data import synthetic
    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine

    cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16",
                              use_flash_attention=False)
    model, params = init_vit(cfg, seed=0)
    B = 512
    eng = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=B)
    rng = np.random.default_rng(0)

    # ---- 1. single-frame latency -----------------------------------------
    eng1 = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=1)
    frame = rng.integers(0, 256, size=(1, 224, 224, 3)).astype(np.uint8)
    eng1.embed_batch(frame)  # compile
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        eng1.embed_batch(frame)
    report("single_frame_embed", (time.time() - t0) / iters * 1000,
           "ms/frame", note="includes host<->device transfer")

    # ---- 2. batched per-video embedding throughput ------------------------
    with tempfile.TemporaryDirectory() as tmp:
        paths = synthetic.write_video_frames(
            os.path.join(tmp, "f"), 1, [("left", 512), ("right", 512)],
            size=(432, 768))
        eng.embed_paths(paths[:B], use_native=True)  # warm decode+compile
        t0 = time.time()
        embs = eng.embed_paths(paths, use_native=True)
        dt = time.time() - t0
        report("per_video_embed_path", len(paths) / dt, "frames/sec",
               note="1024 frames, native decode+resize+embed, 8 decode threads")

    # ---- 3. Viterbi segmentation ------------------------------------------
    from vit_research_tpu.segment.hmm import smooth_probabilities

    probs = rng.dirichlet(np.ones(3), size=(2, 200_000)).astype(np.float32)
    smooth_probabilities(probs[0])  # compile the 200k shape
    t0 = time.time()
    path = smooth_probabilities(probs[1])
    dt = time.time() - t0
    report("hmm_viterbi_segment", len(path) / dt / 1e6, "Mframes/sec",
           note="full 200k-frame game decode, steady state")

    # ---- 4. retrieval + RATT head step ------------------------------------
    from vit_research_tpu.models.heads import RATTHead
    from vit_research_tpu.retrieval.retrievers import RattChunkRetriever
    from vit_research_tpu.store.vector_store import Collection
    from vit_research_tpu.utils.configs import HeadConfig

    col = Collection("ratt_db", space="cosine")
    n_db = 100_000
    db = rng.normal(size=(n_db, 768)).astype(np.float32)
    metas = [{"vid_num": i % 8, "side": "left" if i % 2 else "right",
              "t_center": (i % 100) / 100, "t_width": 0.2}
             for i in range(n_db)]
    col.upsert([f"c{i}" for i in range(n_db)], db, metas)
    retr = RattChunkRetriever(col, top_k=8)
    head_cfg = HeadConfig(num_layers=2, num_heads=4)
    head = RATTHead(head_cfg)
    key = jax.random.PRNGKey(0)
    bq = 64
    hparams = head.init(key, jnp.zeros((bq, 768)), jnp.zeros((bq, 8, 768)))

    @jax.jit
    def head_step(p, q, r):
        logit, _, _, _ = head.apply(p, q, r)
        return logit

    q = rng.normal(size=(bq, 768)).astype(np.float32)
    md = {"vid": np.arange(bq) % 8,
          "side": np.asarray(["left"] * bq, object),
          "t_center": np.full(bq, 0.5, np.float32),
          "t_width": np.full(bq, 0.4, np.float32)}
    r = retr(q, md)
    _ = np.asarray(head_step(hparams, jnp.asarray(q), jnp.asarray(r)))
    t0 = time.time()
    iters = 10
    for _ in range(iters):
        r = retr(q, md)
        _ = np.asarray(head_step(hparams, jnp.asarray(q), jnp.asarray(r)))
    dt = (time.time() - t0) / iters
    report("retrieval_plus_ratt_head", dt * 1000, "ms/batch",
           note=f"batch {bq} queries over {n_db}-vector store, exact top-8")

    # ---- 5. multi-video end-to-end ----------------------------------------
    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.hmm import STATES

    with tempfile.TemporaryDirectory() as tmp:
        all_paths = {}
        for vid in (1, 2):
            all_paths[vid] = synthetic.write_video_frames(
                os.path.join(tmp, f"v{vid}"), vid,
                [("left", 256), ("none", 64), ("right", 256)],
                size=(432, 768))
        corpus = eng.embed_paths(all_paths[1], use_native=True)
        corpus_labels = np.asarray([0] * 256 + [2] * 64 + [1] * 256)
        probs_store = np.full((len(corpus_labels), 3), 0.05, np.float32)
        probs_store[np.arange(len(corpus_labels)), corpus_labels] = 0.9
        out_col = Collection("frames", space="l2")
        t0 = time.time()
        embs = eng.embed_paths(all_paths[2], use_native=True)
        nl, idx, _ = knn_mod.knn_labels(embs, corpus, corpus_labels, k=25,
                                        metric="ip")
        fused = knn_mod.fused_confidence(
            nl, probs_store[np.asarray(idx)], top_n=25)
        decoded = smooth_probabilities(fused["emissions"])
        out_col.upsert([os.path.basename(p) for p in all_paths[2]], embs,
                       [{"label": STATES[d]} for d in decoded])
        dt = time.time() - t0
        report("multi_video_e2e", len(all_paths[2]) / dt, "frames/sec",
               note="decode+embed+kNN+HMM+DB write, 576-frame video")

    # ---- 6. stage-2 train step --------------------------------------------
    import optax

    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.train.train_stage2 import make_step_fns

    bt, k = 256, 8
    head2 = RATTHeadV2(HeadConfig(num_layers=2, num_heads=4))
    batch = {
        "query_emb": jnp.asarray(rng.normal(size=(bt, 768)), jnp.float32),
        "sim_embs": jnp.asarray(rng.normal(size=(bt, k, 768)), jnp.float32),
        "contrast_embs": jnp.asarray(
            rng.normal(size=(bt, k, 768)), jnp.float32),
        "temporal_embs": jnp.asarray(
            rng.normal(size=(bt, k, 768)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 2, size=(bt,)), jnp.float32),
    }
    p2 = head2.init(jax.random.PRNGKey(0), batch["query_emb"],
                    batch["sim_embs"], batch["contrast_embs"],
                    batch["temporal_embs"])
    tx = optax.adam(1e-4)
    opt_state = tx.init(p2)
    step_fn, _ = make_step_fns(head2, tx, pos_weight=1.0)
    key = jax.random.PRNGKey(1)
    p2, opt_state, loss, _, _ = step_fn(p2, opt_state, batch, key)  # compile
    _ = float(loss)  # real completion barrier over the tunnel
    t0 = time.time()
    iters = 20
    for i in range(iters):
        p2, opt_state, loss, _, _ = step_fn(
            p2, opt_state, batch, jax.random.fold_in(key, i))
    _ = float(loss)
    dt = (time.time() - t0) / iters
    report("stage2_train_step", bt / dt, "chunks/sec",
           note=f"batch {bt}, k={k}/branch, fwd+bwd+Adam; "
                f"{dt * 1000:.1f} ms/step")


if __name__ == "__main__":
    main()
