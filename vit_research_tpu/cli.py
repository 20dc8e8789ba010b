"""Command-line entry points wiring the pipeline stages together.

The reference runs as a constellation of scripts (``python -m
train.training``, per-stage writers, eval programs). This CLI exposes the
same operations as subcommands of one program::

    python -m vit_research_tpu.cli smoke
    python -m vit_research_tpu.cli extract-frames game.mp4 --vid 1 --out frames/
    python -m vit_research_tpu.cli segment frames/ --manual-csv data/manual_intervals.csv --vid 1 --out clips/
    python -m vit_research_tpu.cli build-frame-store --clip-root 'clips_hmm_smooth_{vid}_smart' --vids 1 2 --out store/
    python -m vit_research_tpu.cli train-stage1 --store store/ --ckpt ckpts/
    python -m vit_research_tpu.cli write-ratt-db --store store/ --ckpt ckpts/ --db db/
    python -m vit_research_tpu.cli train-stage2 --store store/ --db db/ --ckpt ckpts/
    python -m vit_research_tpu.cli eval-clips --store store/ --db db/ --ckpt ckpts/ --out results/
"""

from __future__ import annotations

import argparse
import os


def _engine(preset: str = "hf", batch_size: int = 256):
    """VRT_TINY=1 swaps in a small random ViT (CI / smoke runs)."""
    if os.environ.get("VRT_TINY"):
        from vit_research_tpu.data.preprocess import PreprocessSpec
        from vit_research_tpu.models.vit import init_vit
        from vit_research_tpu.parallel.embed import EmbeddingEngine
        from vit_research_tpu.utils.configs import ViTConfig

        cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                        num_layers=1, num_heads=2, mlp_dim=64,
                        use_flash_attention=False)
        model, params = init_vit(cfg, seed=0)
        return EmbeddingEngine(model, params, PreprocessSpec(size=(32, 32)),
                               batch_size=min(batch_size, 16),
                               use_fused_patch_embed=False)
    from vit_research_tpu.parallel.embed import make_hf_frame_embedder

    return make_hf_frame_embedder(batch_size=batch_size)


def _load_world(args):
    from vit_research_tpu.data import chunks as chunks_mod
    from vit_research_tpu.data import labels as labels_mod
    from vit_research_tpu.data import samples as samples_mod

    clip_labels = labels_mod.load_clip_labels(args.clip_labels) \
        if args.clip_labels else {}
    events = labels_mod.load_event_template(args.event_template) \
        if args.event_template else {}
    recs = samples_mod.load_samples(args.vids, args.clip_root, clip_labels,
                                    events)
    chunks = chunks_mod.build_chunks(recs, chunk_size=args.chunk_size,
                                     chunk_stride=args.chunk_stride)
    return recs, chunks


def cmd_smoke(args):
    from vit_research_tpu.evaluate.smoke import smoke_test

    smoke_test()


def cmd_extract_frames(args):
    from vit_research_tpu.data.video import extract_frames

    paths = extract_frames(args.video, args.out, args.vid,
                           size=(args.height, args.width), every=args.every)
    print(f"wrote {len(paths)} frames to {args.out}")


def cmd_segment(args):
    from vit_research_tpu.data import naming
    from vit_research_tpu.data.labels import ManualIntervals
    from vit_research_tpu.segment.pipeline import segment_with_temporal_head

    os.makedirs(args.out, exist_ok=True)
    frames = sorted(os.listdir(args.frames), key=naming.frame_sort_key)
    eng = _engine(batch_size=args.batch_size)
    embs = eng.embed_paths([os.path.join(args.frames, f) for f in frames])
    mi = ManualIntervals.from_csv(args.manual_csv)
    decoded, clip_dirs, _ = segment_with_temporal_head(
        frames, embs, mi, out_root=args.out, src_dir=args.frames,
        vid=args.vid, epochs=args.epochs, min_len=args.min_len,
        pad=args.pad,
        params_path=os.path.join(args.out, "temporal_head.npz"))
    print(f"decoded {len(decoded)} frames -> {len(clip_dirs)} clips")


def cmd_build_frame_store(args):
    from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index

    recs, chunks = _load_world(args)
    paths = [r["pth"] for r in recs]
    eng = _engine(batch_size=args.batch_size)
    store = FrameStore.build(paths, eng.embed_paths, args.out,
                             batch_size=1024, verbose=True)
    build_chunk_index(chunks, store, args.out)
    print(f"frame store: {store.n} frames, {len(chunks)} chunks -> {args.out}")


def cmd_train_stage1(args):
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_encoder import train_chunk_encoder
    from vit_research_tpu.utils.configs import preset

    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    n = len(idx["label"])
    split = max(int(n * 0.8), 1)
    cfg = preset("chunks_cached")
    ce_cfg = ChunkEncoderConfig(
        embed_dim=store.dim, mlp_dim=4 * store.dim,
        max_len=int(idx["frame_idx"].shape[1]))
    mngr = CheckpointManager(args.ckpt, f"stage1_{cfg.run_id()}")
    model, best, history = train_chunk_encoder(
        store, idx, list(range(split)), list(range(split, n)),
        config=ce_cfg, num_epochs=args.epochs, batch_size=args.batch_size,
        ckpt_manager=mngr, verbose=True)
    print("best val acc:",
          max((h.get("val_acc", 0) for h in history), default=0))


def cmd_write_ratt_db(args):
    import jax.numpy as jnp

    from vit_research_tpu.db.builders import write_ratt_chunk_db
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_encoder import make_encode_fn
    from vit_research_tpu.utils.configs import ChunkEncoderConfig

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    t = int(idx["frame_idx"].shape[1])
    cfg = ChunkEncoderConfig(embed_dim=store.dim, mlp_dim=4 * store.dim,
                             max_len=t)
    model = ChunkEncoder(cfg)
    import jax

    template_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, t, cfg.embed_dim)))
    params = template_params
    if args.run_id:
        mngr = CheckpointManager(args.ckpt, args.run_id)
        try:
            restored = mngr.restore_best()
            if restored is not None:
                from vit_research_tpu.train.checkpoint import load_params_npz
                _ = load_params_npz  # (npz path unused here)
                params = restored["params"]
        except Exception as e:
            print(f"[write-ratt-db] checkpoint restore failed ({e}); "
                  "using fresh params")
    encode = make_encode_fn(model, params)
    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    n = write_ratt_chunk_db(idx, store, encode, col)
    client.flush()
    print(f"wrote {n} chunk embeddings into {args.collection}")


def cmd_eval_clips(args):
    """Per-clip logit sequences + event localization from a trained
    stage-2 run (reference: nba_proj/test/get_clip_sequences.py)."""
    import jax
    import jax.numpy as jnp

    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.evaluate.clip_sequences import (
        infer_clip_sequences,
        save_results,
    )
    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_encoder import make_encode_fn
    from vit_research_tpu.utils.configs import ChunkEncoderConfig, HeadConfig

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    t = int(idx["frame_idx"].shape[1])

    # Rebuild chunk dicts for the test vids from the index arrays.
    chunks = []
    for i in range(len(idx["label"])):
        if int(idx["vid"][i]) not in set(args.vids):
            continue
        chunks.append({
            "vid": int(idx["vid"][i]), "clip": int(idx["clip"][i]),
            "start_idx": int(idx["start_idx"][i]),
            "end_idx": int(idx["end_idx"][i]),
            "side": str(idx["side"][i]), "label": int(idx["label"][i]),
            "t_center": float(idx["t_center"][i]),
            "t_width": float(idx["t_width"][i]),
            "frames": [str(store.paths[j]) for j in idx["frame_idx"][i]],
        })
    if not chunks:
        print("no chunks for the requested vids")
        return

    ce_cfg = ChunkEncoderConfig(embed_dim=store.dim, mlp_dim=4 * store.dim,
                                max_len=t)
    ce = ChunkEncoder(ce_cfg)
    key = jax.random.PRNGKey(0)
    ce_params = ce.init(key, jnp.zeros((1, t, store.dim)))
    if args.stage1_run_id:
        mngr = CheckpointManager(args.ckpt, args.stage1_run_id)
        restored = mngr.restore_best()
        if restored is not None:
            ce_params = restored["params"]
    encode = make_encode_fn(ce, ce_params)

    def encode_chunk(ch):
        emb, _ = encode(store.gather_paths([ch["frames"]]))
        import numpy as _np

        return emb[0] / (_np.linalg.norm(emb[0]) + 1e-8)

    head_cfg = HeadConfig(embed_dim=store.dim, k_sim=args.k_sim,
                          k_contrast=args.k_contrast,
                          k_temporal=args.k_temporal)
    head = RATTHeadV2(head_cfg)
    h_params = head.init(
        key, jnp.zeros((1, store.dim)),
        jnp.zeros((1, args.k_sim, store.dim)),
        jnp.zeros((1, args.k_contrast, store.dim)),
        jnp.zeros((1, args.k_temporal, store.dim)))
    if args.stage2_run_id:
        mngr = CheckpointManager(args.ckpt, args.stage2_run_id)
        restored = mngr.restore_best()
        if restored is not None:
            h_params = restored["params"]

    col = PersistentClient(args.db, autoflush=False).get_or_create_collection(
        args.collection)
    rows = infer_clip_sequences(
        chunks, lambda q, s, c, tm: head.apply(h_params, q, s, c, tm)[0],
        encode_chunk, col, k_sim=args.k_sim, k_contrast=args.k_contrast,
        k_temporal=args.k_temporal, future_step=args.future_step,
        zeros_query=args.zeros_query, batch_size=16)
    save_results(rows, os.path.join(args.out, "logit_sequences.json"),
                 os.path.join(args.out, "logit_sequences.csv"))
    print(f"wrote {len(rows)} clip rows to {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="vit-research-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("smoke").set_defaults(fn=cmd_smoke)

    ef = sub.add_parser("extract-frames")
    ef.add_argument("video")
    ef.add_argument("--out", required=True)
    ef.add_argument("--vid", type=int, required=True)
    ef.add_argument("--height", type=int, default=1080)
    ef.add_argument("--width", type=int, default=1920)
    ef.add_argument("--every", type=int, default=1)
    ef.set_defaults(fn=cmd_extract_frames)

    sg = sub.add_parser("segment")
    sg.add_argument("frames")
    sg.add_argument("--manual-csv", required=True)
    sg.add_argument("--out", required=True)
    sg.add_argument("--vid", type=int, required=True)
    sg.add_argument("--epochs", type=int, default=3000)
    sg.add_argument("--batch-size", type=int, default=256)
    sg.add_argument("--min-len", type=int, default=100)
    sg.add_argument("--pad", type=int, default=100)
    sg.set_defaults(fn=cmd_segment)

    def world_args(sp):
        sp.add_argument("--clip-root", dest="clip_root", required=True)
        sp.add_argument("--vids", type=int, nargs="+", required=True)
        sp.add_argument("--clip-labels", dest="clip_labels", default=None)
        sp.add_argument("--event-template", dest="event_template",
                        default=None)
        sp.add_argument("--chunk-size", type=int, default=8)
        sp.add_argument("--chunk-stride", type=int, default=2)

    bs = sub.add_parser("build-frame-store")
    world_args(bs)
    bs.add_argument("--out", required=True)
    bs.add_argument("--batch-size", type=int, default=256)
    bs.set_defaults(fn=cmd_build_frame_store)

    t1 = sub.add_parser("train-stage1")
    t1.add_argument("--store", required=True)
    t1.add_argument("--ckpt", required=True)
    t1.add_argument("--epochs", type=int, default=10)
    t1.add_argument("--batch-size", type=int, default=32)
    t1.set_defaults(fn=cmd_train_stage1)

    wr = sub.add_parser("write-ratt-db")
    wr.add_argument("--store", required=True)
    wr.add_argument("--ckpt", required=True)
    wr.add_argument("--db", required=True)
    wr.add_argument("--collection", default="ratt_db")
    wr.add_argument("--run-id", default=None)
    wr.set_defaults(fn=cmd_write_ratt_db)

    ec = sub.add_parser("eval-clips")
    ec.add_argument("--store", required=True)
    ec.add_argument("--ckpt", required=True)
    ec.add_argument("--db", required=True)
    ec.add_argument("--collection", default="ratt_db")
    ec.add_argument("--vids", type=int, nargs="+", required=True)
    ec.add_argument("--out", required=True)
    ec.add_argument("--stage1-run-id", default=None)
    ec.add_argument("--stage2-run-id", default=None)
    ec.add_argument("--k-sim", type=int, default=6)
    ec.add_argument("--k-contrast", type=int, default=6)
    ec.add_argument("--k-temporal", type=int, default=4)
    ec.add_argument("--future-step", type=int, default=2)
    ec.add_argument("--zeros-query", action="store_true")
    ec.set_defaults(fn=cmd_eval_clips)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
