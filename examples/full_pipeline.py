"""Runnable end-to-end walkthrough on synthetic data (CPU-friendly).

Mirrors the reference's full workflow — raw frames -> ViT embeddings ->
HMM possession segmentation -> clips -> chunks -> memmap store -> stage-1
chunk encoder -> RATT vector DB -> stage-2 retrieval cache -> RATTHeadV2
training -> per-clip event inference — end to end in one script, using
the tiny synthetic fixtures so it finishes in ~2 minutes on a laptop CPU.

    python examples/full_pipeline.py [workdir]

Swap the tiny ViT for ``make_hf_frame_embedder`` + real frame dirs to run
the production path (see vit_research_tpu/cli.py for the stage-by-stage
commands).
"""

import os
import sys
import tempfile

import jax
import numpy as np

# CPU-friendly demo: without an explicit VRT_PLATFORM this pins CPU —
# otherwise an environment whose sitecustomize preselects a TPU backend
# runs the "laptop" walkthrough over the device tunnel (minutes of
# compile; a hang if the tunnel is down).
jax.config.update("jax_platforms",
                  os.environ.get("VRT_PLATFORM", "cpu"))


def main(workdir: str | None = None):
    workdir = workdir or tempfile.mkdtemp(prefix="vrt_demo_")
    print(f"[demo] working in {workdir}")

    from vit_research_tpu.data import labels as labels_mod
    from vit_research_tpu.data import naming, samples, synthetic
    from vit_research_tpu.data import chunks as chunks_mod
    from vit_research_tpu.data.preprocess import PreprocessSpec
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine
    from vit_research_tpu.utils.configs import ViTConfig

    # 1. Two synthetic "games" of raw frames.
    frame_dirs = {}
    for vid in (1, 2):
        frame_dirs[vid] = synthetic.write_video_frames(
            os.path.join(workdir, f"frames_{vid}"), vid,
            [("none", 6), ("left", 40), ("none", 6), ("right", 40),
             ("none", 6)], size=(32, 32))
    print(f"[demo] wrote {sum(len(v) for v in frame_dirs.values())} frames")

    # 2. Embedding engine (seeded random ViT — the reference's random
    #    backbone regime; swap in make_hf_frame_embedder for pretrained).
    cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                    num_layers=1, num_heads=2, mlp_dim=64,
                    use_flash_attention=False)
    model, params = init_vit(cfg, seed=0)
    eng = EmbeddingEngine(model, params, PreprocessSpec(size=(32, 32)),
                          batch_size=16, use_fused_patch_embed=False)

    # 3. Segmentation: temporal head + Viterbi HMM -> possession clips.
    from vit_research_tpu.segment.pipeline import segment_with_temporal_head

    clip_labels, events = {}, {}
    for vid, paths in frame_dirs.items():
        names = [os.path.basename(p) for p in paths]
        embs = eng.embed_paths(paths, num_workers=2)
        mi = labels_mod.ManualIntervals()
        mi.intervals["none"] += [(vid, 1, 6), (vid, 47, 52), (vid, 93, 98)]
        mi.intervals["left"].append((vid, 7, 46))
        mi.intervals["right"].append((vid, 53, 92))
        decoded, clip_dirs, _ = segment_with_temporal_head(
            names, embs, mi,
            out_root=os.path.join(workdir, f"clips_hmm_smooth_{vid}_smart"),
            src_dir=os.path.join(workdir, f"frames_{vid}"), vid=vid,
            epochs=200, lr=1e-3, min_len=25, pad=3)
        print(f"[demo] vid{vid}: {len(clip_dirs)} clips")
        for cdir in clip_dirs:
            _, _, side = naming.parse_clip_dir(os.path.basename(cdir))
            label = 1 if side == "left" else 0
            clip_labels[cdir] = label
            frames = sorted(os.listdir(cdir), key=naming.frame_sort_key)
            mid = naming.frame_num(frames[len(frames) // 2])
            key = "event_make" if label else "event_miss"
            events[cdir] = {"event_make": [], "event_miss": [],
                            "event_none": [], key: [[mid, mid + 3]]}

    # 4. Samples -> chunks -> memmap frame store.
    from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index

    recs = samples.load_samples(
        (1, 2), os.path.join(workdir, "clips_hmm_smooth_{vid}_smart"),
        clip_labels, events)
    chunks = chunks_mod.build_chunks(recs, chunk_size=6, chunk_stride=3)
    store_dir = os.path.join(workdir, "store")
    store = FrameStore.build([p for c in chunks for p in c["frames"]],
                             eng.embed_paths, store_dir)
    idx = build_chunk_index(chunks, store, store_dir)
    print(f"[demo] {len(chunks)} chunks over {store.n} unique frames")

    # 5. Stage-1 chunk encoder.
    from vit_research_tpu.train.train_chunk_encoder import (
        make_encode_fn,
        train_chunk_encoder,
    )
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    n = len(chunks)
    ce_model, ce_params, hist = train_chunk_encoder(
        store, idx, list(range(0, n, 2)), list(range(1, n, 2)),
        config=ChunkEncoderConfig(embed_dim=32, num_layers=1, num_heads=2,
                                  mlp_dim=128, max_len=6),
        num_epochs=3, batch_size=4)
    print(f"[demo] stage-1 val acc {hist[-1].get('val_acc', 0):.3f}")
    encode = make_encode_fn(ce_model, ce_params)

    # 6. RATT vector DB.
    from vit_research_tpu.db.builders import write_ratt_chunk_db
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(os.path.join(workdir, "db"), autoflush=False)
    col = client.get_or_create_collection(
        "ratt_db", metadata={"hnsw:space": "cosine"})
    write_ratt_chunk_db(idx, store, encode, col)
    client.flush()
    print(f"[demo] ratt_db holds {col.count()} chunk embeddings")

    # 7. Stage-2 cache + RATTHeadV2 training with live validation.
    from vit_research_tpu.retrieval import cache_stage2 as CS
    from vit_research_tpu.train.train_stage2 import train_stage2
    from vit_research_tpu.utils.configs import (
        ExperimentConfig,
        HeadConfig,
        RetrievalConfig,
        TrainConfig,
    )

    def encode_chunk(ch):
        emb, _ = encode(store.gather_paths([ch["frames"]]))
        return emb[0] / (np.linalg.norm(emb[0]) + 1e-8)

    head_cfg = HeadConfig(embed_dim=32, num_layers=1, num_heads=2,
                          mlp_dim=16, k_sim=3, k_contrast=3, k_temporal=2)
    cache = CS.build_stage2_cache(chunks, encode_chunk, col, k_sim=3,
                                  k_contrast=3, k_temporal=2, future_step=1)
    cfg2 = ExperimentConfig(
        name="stage2", head=head_cfg,
        train=TrainConfig(batch_size=4, num_epochs=3, accum_steps=1),
        retrieval=RetrievalConfig(future_chunk_step=1, search_k_content=16,
                                  search_k_temporal=8))
    train_c = [c for c in chunks if c["vid"] == 1]
    val_c = [c for c in chunks if c["vid"] == 2]
    s2_params, s2_hist = train_stage2(train_c, val_c, cache,
                                      encode_fn=encode_chunk, collection=col,
                                      cfg=cfg2, verbose=True)

    # 8. Per-clip event inference.
    from vit_research_tpu.evaluate.clip_sequences import (
        infer_clip_sequences,
        save_results,
    )
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2

    head = RATTHeadV2(head_cfg)
    rows = infer_clip_sequences(
        val_c,
        lambda q, s, c, t: head.apply(s2_params, q, s, c, t)[0],
        encode_chunk, col, k_sim=3, k_contrast=3, k_temporal=2,
        future_step=1, batch_size=4)
    out = os.path.join(workdir, "results.json")
    save_results(rows, out, out.replace(".json", ".csv"))
    print(f"[demo] wrote {len(rows)} clip rows -> {out}")
    for r in rows:
        top = r["topk_chunks"][0]
        print(f"  clip {r['clip_key']} label={r['label']} "
              f"top-chunk logit={top['logit']:.3f} pred={top['pred']}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
