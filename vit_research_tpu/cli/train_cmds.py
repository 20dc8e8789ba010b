"""Training commands: train-stage1 (ChunkEncoder), train-rag,
train-cached (bin-cache RATT), train-stage2/stage3 (RATTHeadV2)."""

from __future__ import annotations

import os

from vit_research_tpu.cli import common


def cmd_train_stage1(args):
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_encoder import train_chunk_encoder
    from vit_research_tpu.utils.configs import (ChunkEncoderConfig, preset,
                                                save_config)

    import dataclasses

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    n = len(idx["label"])
    split = max(int(n * 0.8), 1)
    cfg = preset("chunks_cached")
    # the run-ID exists to encode the ACTUAL hyperparameters
    # (reference: nba_proj/config_stage2.py:65-81)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, lr_phase1=args.lr, lr_phase2=args.lr,
            weight_decay=args.weight_decay))
    ce_cfg = ChunkEncoderConfig(
        embed_dim=store.dim, mlp_dim=4 * store.dim,
        max_len=int(idx["frame_idx"].shape[1]))
    run_id = args.run_id or f"stage1_{cfg.run_id()}"
    mngr = CheckpointManager(args.ckpt, run_id)
    # Like every other training verb: the run dir records its exact
    # encoder config for reproducibility.
    save_config(ce_cfg, os.path.join(mngr.dir, "experiment.json"))
    model, best, history = train_chunk_encoder(
        store, idx, list(range(split)), list(range(split, n)),
        config=ce_cfg, num_epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr, weight_decay=args.weight_decay,
        ckpt_manager=mngr, resume=args.resume, verbose=True)
    mngr.wait()  # flush async Orbax saves before the interpreter exits
    print(f"run {run_id}: best val acc",
          max((h.get("val_acc", 0) for h in history), default=0))


def cmd_train_rag(args):
    """Stage-0 RAG loop: ProjectionHead + RAGHead over live frame retrieval,
    with optional periodic DB rebuilds
    (reference: nba_proj/train/training.py:125-141,453-480)."""
    from dataclasses import replace

    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.retrieval.retrievers import FrameRetriever
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_rag import (
        chunk_embed_from_store,
        train_rag,
    )
    from vit_research_tpu.utils.configs import preset, save_config

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    chunks = common._chunks_from_index(store, idx)
    train, val = common._split_by_vids(chunks, args.train_vids, args.val_vids)

    cfg = preset("cls_only" if args.no_retrieval else "rag")
    cfg = replace(
        cfg,
        head=replace(cfg.head, embed_dim=store.dim),
        retrieval=replace(cfg.retrieval, top_k=args.top_k,
                          collection=args.collection),
        train=replace(cfg.train, num_epochs=args.epochs,
                      batch_size=args.batch_size,
                      rebuild_every=args.rebuild_every),
        train_vids=tuple(args.train_vids), test_vids=tuple(args.val_vids))

    client = PersistentClient(args.db, autoflush=False)
    col = client.get_or_create_collection(args.collection)
    retriever = FrameRetriever(col, top_k=cfg.retrieval.top_k)

    rebuild_fn = None
    if args.rebuild == "sync":
        if not args.clip_root:
            raise SystemExit("--rebuild sync requires --clip-root/--vids "
                             "(per-frame metadata for the DB rewrite)")
        from vit_research_tpu.db.builders import rebuild_frame_db

        recs, _ = common._load_world(args)

        def embed(paths):
            return store.gather_paths([[p] for p in paths])[:, 0]

        def rebuild_fn(project_fn):
            n = rebuild_frame_db(recs, embed, project_fn, col)
            client.flush()
            return n

    run_id = args.run_id or cfg.run_id()
    os.makedirs(args.ckpt, exist_ok=True)
    mngr = CheckpointManager(args.ckpt, run_id)
    save_config(cfg, os.path.join(mngr.dir, "experiment.json"))
    params, history = train_rag(
        train, val, chunk_embed_from_store(store), retriever, cfg=cfg,
        use_retrieval=not args.no_retrieval, rebuild_fn=rebuild_fn,
        ckpt_manager=mngr, resume=args.resume, verbose=True)
    mngr.wait()
    best = max((h.get("val_acc", 0.0) for h in history), default=0.0)
    print(f"run {run_id}: best val acc {best:.4f}")


def cmd_train_ratt(args):
    """Live-retrieval RATT training: 2304-d chunk stats -> projection ->
    RattChunkRetriever -> RATTHead (reference: nba_proj/train/
    training_ratt.py as a script; ``--attention-losses`` is the
    training_chunk_works.py line, :100-135)."""
    from dataclasses import replace

    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.retrieval.retrievers import RattChunkRetriever
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_ratt import train_ratt
    from vit_research_tpu.utils.configs import preset, save_config

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    chunks = common._chunks_from_index(store, idx)
    train, val = common._split_by_vids(chunks, args.train_vids,
                                       args.val_vids)

    # Flags default to None so the preset's reference values ('chunks':
    # 12 epochs / top_k 12 / rebuild_every 3) survive unless the user
    # explicitly overrides them (ADVICE r3).
    cfg = preset("chunks" if args.attention_losses else "ratt")
    cfg = replace(
        cfg,
        head=replace(cfg.head, embed_dim=store.dim),
        retrieval=replace(
            cfg.retrieval, collection=args.collection,
            **({} if args.top_k is None else {"top_k": args.top_k})),
        train=replace(
            cfg.train,
            **{k: v for k, v in (
                ("num_epochs", args.epochs),
                ("batch_size", args.batch_size),
                ("rebuild_every", args.rebuild_every)) if v is not None}),
        train_vids=tuple(args.train_vids), test_vids=tuple(args.val_vids))
    r = cfg.retrieval

    client = PersistentClient(args.db, autoflush=False)
    try:
        # Strict lookup: a typoed --collection must fail loudly, not
        # train against a silently created empty collection.
        col = client.get_collection(args.collection)
    except ValueError as e:
        raise SystemExit(str(e))
    retriever = RattChunkRetriever(col, top_k=r.top_k, search_k=r.search_k)

    def frame_embs_fn(batch):
        return store.gather_paths([ch["frames"] for ch in batch])

    rebuild_fn = None
    if args.rebuild == "sync":
        from vit_research_tpu.db.builders import reproject_chunk_rows

        def rebuild_fn(project_fn):
            n = reproject_chunk_rows(chunks, frame_embs_fn, project_fn,
                                     col)
            client.flush()
            print(f"rebuilt {n} chunk rows with the live projection")

    run_id = args.run_id or cfg.run_id()
    os.makedirs(args.ckpt, exist_ok=True)
    mngr = CheckpointManager(args.ckpt, run_id)
    save_config(cfg, os.path.join(mngr.dir, "experiment.json"))
    params, history = train_ratt(
        train, val, frame_embs_fn, retriever, cfg=cfg,
        attention_losses=args.attention_losses,
        contrastive_weight=args.contrastive_weight,
        rebuild_fn=rebuild_fn, ckpt_manager=mngr, resume=args.resume,
        verbose=True)
    mngr.wait()
    best = max((h.get("val_acc", 0.0) for h in history), default=0.0)
    print(f"run {run_id}: best val acc {best:.4f}")


def cmd_train_cached(args):
    """RATT over the label-conditioned bin cache
    (reference: nba_proj/train/training_chunk_cached.py:815-1636)."""
    from dataclasses import replace

    import numpy as np

    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.retrieval import cache_bins as CB
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_chunk_cached import train_chunk_cached
    from vit_research_tpu.utils.configs import preset, save_config

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    chunks = common._chunks_from_index(store, idx)
    train, val = common._split_by_vids(chunks, args.train_vids, args.val_vids)
    encode_batch, encode_chunk = common._stage1_encode(store, idx, args.ckpt,
                                                args.stage1_run_id)

    cfg = preset("chunks_cached")
    cfg = replace(
        cfg,
        head=replace(cfg.head, embed_dim=store.dim),
        retrieval=replace(cfg.retrieval, top_k=args.top_k,
                          collection=args.collection),
        train=replace(cfg.train, num_epochs=args.epochs,
                      batch_size=args.batch_size),
        train_vids=tuple(args.train_vids), test_vids=tuple(args.val_vids))
    r = cfg.retrieval

    col = PersistentClient(args.db, autoflush=False).get_or_create_collection(
        args.collection)
    if os.path.exists(args.cache):
        cache = CB.load_cache(args.cache)
        print(f"loaded bin cache ({len(cache)} bins) from {args.cache}")
    else:
        cache = CB.build_bin_cache(
            chunks, encode_chunk, col, train_vids=args.train_vids,
            candidates_per_bin=r.candidates_per_bin,
            query_mult=r.query_mult, max_per_video=r.per_video_cap,
            max_global_appearances=r.global_cap,
            min_time_gap=r.min_time_gap,
            hard_negative_ratio=r.hard_negative_ratio,
            lambda_global=r.lambda_global, delta_t=args.delta_t,
            seed=cfg.train.seed, verbose=True)
        CB.save_cache(cache, args.cache)
        print(f"built bin cache ({len(cache)} bins) -> {args.cache}")

    def chunk_embed(batch):
        emb, _ = encode_batch(
            store.gather_paths([ch["frames"] for ch in batch]))
        return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)

    run_id = args.run_id or cfg.run_id()
    os.makedirs(args.ckpt, exist_ok=True)
    mngr = CheckpointManager(args.ckpt, run_id)
    save_config(cfg, os.path.join(mngr.dir, "experiment.json"))
    params, history = train_chunk_cached(
        train, val, chunk_embed, cache, cfg=cfg, delta_t=args.delta_t,
        ckpt_manager=mngr, resume=args.resume, verbose=True)
    mngr.wait()
    best = max((h.get("val_acc", 0.0) for h in history), default=0.0)
    print(f"run {run_id}: best val acc {best:.4f}")


def cmd_train_stage2(args):
    """Stage-2 RATTHeadV2: cached training batches, live validation
    retrieval (reference: nba_proj/train/training_stage2.py:998-1403).
    ``--preset stage3 --init-run-id <stage2-run>`` continues a pinned
    run's weights (reference: nba_proj/config_stage3.py:82-88)."""
    from dataclasses import replace

    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.retrieval import cache_stage2 as CS
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import CheckpointManager
    from vit_research_tpu.train.train_stage2 import train_stage2
    from vit_research_tpu.utils.configs import preset, save_config

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    chunks = common._chunks_from_index(store, idx)
    train, val = common._split_by_vids(chunks, args.train_vids, args.val_vids)
    _, encode_chunk = common._stage1_encode(store, idx, args.ckpt,
                                     args.stage1_run_id)

    cfg = preset(args.preset)
    cfg = replace(
        cfg,
        head=replace(cfg.head, embed_dim=store.dim, k_sim=args.k_sim,
                     k_contrast=args.k_contrast, k_temporal=args.k_temporal),
        retrieval=replace(cfg.retrieval, collection=args.collection),
        train=replace(cfg.train, num_epochs=args.epochs,
                      batch_size=args.batch_size),
        train_vids=tuple(args.train_vids), test_vids=tuple(args.val_vids),
        pinned_run_id=args.init_run_id or "")

    col = PersistentClient(args.db, autoflush=False).get_or_create_collection(
        args.collection)
    if os.path.exists(args.cache):
        cache = CS.load_cache(args.cache)
        print(f"loaded stage-2 cache ({len(cache)} chunks) from {args.cache}")
    else:
        cache = CS.build_stage2_cache(
            chunks, encode_chunk, col, k_sim=cfg.head.k_sim,
            k_contrast=cfg.head.k_contrast, k_temporal=cfg.head.k_temporal,
            future_step=cfg.retrieval.future_chunk_step,
            search_k_content=cfg.retrieval.search_k_content,
            search_k_temporal=cfg.retrieval.search_k_temporal,
            checkpoint_path=args.cache, verbose=True)
        print(f"built stage-2 cache ({len(cache)} chunks) -> {args.cache}")

    init_params = None
    if args.init_run_id:
        if not os.path.isdir(os.path.join(args.ckpt, args.init_run_id)):
            raise SystemExit(
                f"--init-run-id {args.init_run_id}: no such run under "
                f"{args.ckpt}")
        restored = CheckpointManager(args.ckpt,
                                     args.init_run_id).restore_best()
        if restored is None:
            raise SystemExit(
                f"--init-run-id {args.init_run_id}: no best checkpoint")
        init_params = restored["params"]

    run_id = args.run_id or cfg.run_id()
    os.makedirs(args.ckpt, exist_ok=True)
    mngr = CheckpointManager(args.ckpt, run_id)
    save_config(cfg, os.path.join(mngr.dir, "experiment.json"))
    params, history = train_stage2(
        train, val, cache,
        encode_fn=None if args.cached_val else encode_chunk,
        collection=None if args.cached_val else col,
        cfg=cfg, ckpt_manager=mngr, verbose=True, init_params=init_params,
        resume=args.resume)
    mngr.wait()
    best = max((h.get("val_acc", 0.0) for h in history), default=0.0)
    f1 = max((h.get("val_best_f1", 0.0) for h in history), default=0.0)
    print(f"run {run_id}: best val acc {best:.4f} best f1 {f1:.4f}")


def register(sub):
    t1 = sub.add_parser("train-stage1")
    t1.add_argument("--store", required=True)
    t1.add_argument("--ckpt", required=True)
    t1.add_argument("--epochs", type=int, default=10)
    t1.add_argument("--batch-size", type=int, default=32)
    # Reference stage-1 hyperparameters
    # (reference: nba_proj/train/train_chunk_encoder.py:23-24).
    t1.add_argument("--lr", type=float, default=5e-5)
    t1.add_argument("--weight-decay", type=float, default=5e-4)
    t1.add_argument("--run-id", default=None,
                    help="name the run dir (required to --resume it later)")
    t1.add_argument("--resume", action="store_true",
                    help="continue --run-id's latest checkpoint")
    t1.set_defaults(fn=cmd_train_stage1)

    tr = sub.add_parser("train-rag")
    common.split_args(tr)
    tr.add_argument("--store", required=True)
    tr.add_argument("--db", required=True)
    tr.add_argument("--ckpt", required=True)
    tr.add_argument("--collection", default="ragdb")
    tr.add_argument("--epochs", type=int, default=24)
    tr.add_argument("--batch-size", type=int, default=8)
    tr.add_argument("--top-k", type=int, default=5)
    tr.add_argument("--no-retrieval", action="store_true")
    tr.add_argument("--rebuild", choices=["none", "sync"], default="none")
    tr.add_argument("--rebuild-every", type=int, default=4)
    tr.add_argument("--run-id", default=None)
    tr.add_argument("--resume", action="store_true")
    # world args only needed for --rebuild sync
    tr.add_argument("--clip-root", dest="clip_root", default=None)
    tr.add_argument("--vids", type=int, nargs="+", default=None)
    tr.add_argument("--clip-labels", dest="clip_labels", default=None)
    tr.add_argument("--event-template", dest="event_template", default=None)
    tr.add_argument("--chunk-size", type=int, default=8)
    tr.add_argument("--chunk-stride", type=int, default=2)
    tr.set_defaults(fn=cmd_train_rag)

    tt = sub.add_parser("train-ratt")
    common.split_args(tt)
    tt.add_argument("--store", required=True)
    tt.add_argument("--db", required=True)
    tt.add_argument("--ckpt", required=True)
    tt.add_argument("--collection", default="ratt_db")
    tt.add_argument("--epochs", type=int, default=None,
                    help="override the preset's epoch count "
                         "(ratt: 24, chunks: 12)")
    tt.add_argument("--batch-size", type=int, default=None)
    tt.add_argument("--top-k", type=int, default=None,
                    help="override the preset's top_k (ratt: 8, chunks: 12)")
    tt.add_argument("--attention-losses", action="store_true",
                    help="add the CLS-attention weighted contrastive + "
                         "entropy terms (the training_chunk_works line)")
    tt.add_argument("--contrastive-weight", type=float, default=0.0,
                    help="max-pull retrieval contrastive weight (the "
                         "reference hardcodes 0 in its step, "
                         "training_ratt.py:240)")
    tt.add_argument("--rebuild", choices=["none", "sync"], default="none",
                    help="sync: re-project every chunk row with the LIVE "
                         "2304->768 projection every --rebuild-every "
                         "epochs (reference: db_rebuild_ratt from the "
                         "loop, training_ratt.py:560-561)")
    tt.add_argument("--rebuild-every", type=int, default=None,
                    help="override the preset's cadence "
                         "(ratt: 4, chunks: 3)")
    tt.add_argument("--run-id", default=None)
    tt.add_argument("--resume", action="store_true")
    tt.set_defaults(fn=cmd_train_ratt)

    tc = sub.add_parser("train-cached")
    common.split_args(tc)
    tc.add_argument("--store", required=True)
    tc.add_argument("--db", required=True)
    tc.add_argument("--ckpt", required=True)
    tc.add_argument("--collection", default="ratt_db_chunks")
    tc.add_argument("--cache", required=True,
                    help="bin-cache pickle; built (and saved) if missing")
    tc.add_argument("--stage1-run-id", default=None)
    tc.add_argument("--epochs", type=int, default=24)
    tc.add_argument("--batch-size", type=int, default=8)
    tc.add_argument("--top-k", type=int, default=8)
    tc.add_argument("--delta-t", type=float, default=0.1)
    tc.add_argument("--run-id", default=None)
    tc.add_argument("--resume", action="store_true")
    tc.set_defaults(fn=cmd_train_cached)

    t2 = sub.add_parser("train-stage2")
    common.split_args(t2)
    t2.add_argument("--store", required=True)
    t2.add_argument("--db", required=True)
    t2.add_argument("--ckpt", required=True)
    t2.add_argument("--collection", default="ratt_db_s2")
    t2.add_argument("--cache", required=True,
                    help="stage-2 cache pickle; built (and saved) if missing")
    t2.add_argument("--stage1-run-id", default=None)
    t2.add_argument("--preset", choices=["stage2", "stage3"],
                    default="stage2")
    t2.add_argument("--init-run-id", default=None,
                    help="continue a previous stage-2 run's best weights")
    t2.add_argument("--epochs", type=int, default=30)
    t2.add_argument("--batch-size", type=int, default=8)
    t2.add_argument("--k-sim", type=int, default=6)
    t2.add_argument("--k-contrast", type=int, default=6)
    t2.add_argument("--k-temporal", type=int, default=4)
    t2.add_argument("--cached-val", action="store_true",
                    help="validate from the cache instead of live retrieval")
    t2.add_argument("--run-id", default=None,
                    help="name the run dir (required to --resume it later)")
    t2.add_argument("--resume", action="store_true",
                    help="continue --run-id's latest checkpoint "
                         "(params + optimizer + step)")
    t2.set_defaults(fn=cmd_train_stage2)
