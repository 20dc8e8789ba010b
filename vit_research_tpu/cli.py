"""Command-line entry points wiring the pipeline stages together.

The reference runs as a constellation of scripts (``python -m
train.training``, per-stage writers, eval programs). This CLI exposes the
same operations as subcommands of one program::

    python -m vit_research_tpu.cli smoke
    python -m vit_research_tpu.cli extract-frames game.mp4 --vid 1 --out frames/
    python -m vit_research_tpu.cli write-frame-db frames/ --manual-csv data/manual_intervals.csv --db db/ --collection 1_p32_embeddings
    python -m vit_research_tpu.cli segment frames/ --manual-csv data/manual_intervals.csv --vid 1 --out clips/
    python -m vit_research_tpu.cli segment frames/ --method knn-hmm --db db/ --corpus-collection 1_p32_embeddings --vid 1 --out clips/
    python -m vit_research_tpu.cli self-label frames/ --db db/ --collection 1_p32_embeddings --out labels.csv --upsert
    python -m vit_research_tpu.cli finalize-clips --clips clips/ --db db/ --collection 1_p32_embeddings --out clips_final/
    python -m vit_research_tpu.cli merge-clips --clips clips_final/ --frame-pool frames/ --out clips_merged/
    python -m vit_research_tpu.cli clustering --db db/ --collection 1_p32_embeddings --out side_nn.npz
    python -m vit_research_tpu.cli fresh-test frames/ --params side_nn.npz --out fresh/
    python -m vit_research_tpu.cli write-embeddings frames/ --manual-csv data/manual_intervals.csv --out-template '{cls}_embeddings.npz'
    python -m vit_research_tpu.cli build-frame-store --clip-root 'clips_hmm_smooth_{vid}_smart' --vids 1 2 --out store/
    python -m vit_research_tpu.cli train-stage1 --store store/ --ckpt ckpts/
    python -m vit_research_tpu.cli write-ratt-db --store store/ --ckpt ckpts/ --db db/
    python -m vit_research_tpu.cli train-stage2 --store store/ --db db/ --ckpt ckpts/
    python -m vit_research_tpu.cli eval-clips --store store/ --db db/ --ckpt ckpts/ --out results/
    python -m vit_research_tpu.cli metrics ckpts/            # per-run training curves
    python -m vit_research_tpu.cli serve --socket /tmp/vrt.sock --db db/ --collection ratt_db
"""

from __future__ import annotations

import argparse
import os


def _engine(preset: str = "hf", batch_size: int = 256):
    """VRT_TINY=1 swaps in a small random ViT (CI / smoke runs).

    VRT_TOME_R=<int> enables token merging (ops/tome.py) in the frame
    embedder — a speed/accuracy trade (r=13 measured +33% throughput on
    v5e), OFF by default because merged embeddings drift from the
    reference-parity outputs. VRT_GEMM_QUANT=int8 likewise swaps the
    encoder GEMMs for dynamic int8 (ops/quant.py); the two compose. All
    embeddings a pipeline compares must come from the same settings.

    VRT_GRAYSCALE=1 embeds luminance-converted frames — the reference's
    USE_GRAYSCALE ablation constant as an env toggle (reference:
    nba_proj/db_maintainence/db_rebuild_chunk.py:101-115,
    nba_proj/train/training_chunk_cached.py:473-505). Like the reference
    toggle it changes the feature space globally: every embedding a
    pipeline compares must be produced with the same setting."""
    raw_tome = os.environ.get("VRT_TOME_R", "").strip()
    try:
        tome_r = int(raw_tome) if raw_tome else 0
    except ValueError:
        raise SystemExit(
            f"VRT_TOME_R must be an integer, got {raw_tome!r}")
    gemm_quant = os.environ.get("VRT_GEMM_QUANT", "").strip() or None
    if gemm_quant not in (None, "int8"):
        raise SystemExit(
            f"VRT_GEMM_QUANT must be 'int8' or unset, got {gemm_quant!r}")
    grayscale = os.environ.get("VRT_GRAYSCALE", "").strip() not in ("", "0")
    if os.environ.get("VRT_TINY"):
        from vit_research_tpu.data.preprocess import PreprocessSpec
        from vit_research_tpu.models.vit import init_vit
        from vit_research_tpu.parallel.embed import EmbeddingEngine
        from vit_research_tpu.utils.configs import ViTConfig

        cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                        num_layers=1, num_heads=2, mlp_dim=64,
                        use_flash_attention=False, tome_r=tome_r,
                        gemm_quant=gemm_quant)
        model, params = init_vit(cfg, seed=0)
        return EmbeddingEngine(model, params,
                               PreprocessSpec(size=(32, 32),
                                              grayscale=grayscale),
                               batch_size=min(batch_size, 16),
                               use_fused_patch_embed=False)
    from vit_research_tpu.parallel.embed import make_hf_frame_embedder

    return make_hf_frame_embedder(batch_size=batch_size, tome_r=tome_r,
                                  gemm_quant=gemm_quant,
                                  grayscale=grayscale)


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


def _chunks_from_index(store, idx, vids=None):
    """Rebuild chunk dicts (data/chunks schema) from a stored chunk index."""
    want = {int(v) for v in vids} if vids else None
    chunks = []
    for i in range(len(idx["label"])):
        if want is not None and int(idx["vid"][i]) not in want:
            continue
        chunks.append({
            "vid": int(idx["vid"][i]), "clip": int(idx["clip"][i]),
            "start_idx": int(idx["start_idx"][i]),
            "end_idx": int(idx["end_idx"][i]),
            "side": str(idx["side"][i]), "label": int(idx["label"][i]),
            "status_id": int(idx["status_id"][i]),
            "t_center": float(idx["t_center"][i]),
            "t_width": float(idx["t_width"][i]),
            "frames": [str(store.paths[j]) for j in idx["frame_idx"][i]],
        })
    return chunks


def _scoring_call(fn, *a, **kw):
    """Run an evaluate/scoring loader, converting its
    :class:`ScoringUnavailable` into the CLI's clean-exit convention
    (the daemon converts the same error into a protocol reply instead —
    evaluate/scoring.py holds the shared logic)."""
    from vit_research_tpu.evaluate.scoring import ScoringUnavailable

    try:
        return fn(*a, **kw)
    except ScoringUnavailable as e:
        raise SystemExit(str(e))


def _stage1_encode_batch(dim: int, t: int, ckpt, run_id, *,
                         strict: bool = False):
    """Frozen stage-1 ChunkEncoder as a raw (B, T, D) -> (embs, logits)
    callable (evaluate/scoring.py, CLI error convention)."""
    from vit_research_tpu.evaluate import scoring

    return _scoring_call(scoring.stage1_encode_batch, dim, t, ckpt,
                         run_id, strict=strict)


def _stage1_encode(store, idx, ckpt, run_id):
    """Frozen stage-1 ChunkEncoder; restored from ``run_id`` when given.

    Returns ``(encode_batch, encode_chunk)``: the raw (B, T, D) ->
    (embs, logits) callable and a single-chunk dict -> L2-normalized (D,)
    convenience wrapper (what the cache builders / retrieval DB expect)."""
    import numpy as np

    encode_batch = _stage1_encode_batch(
        store.dim, int(idx["frame_idx"].shape[1]), ckpt, run_id)

    def encode_chunk(ch):
        emb, _ = encode_batch(store.gather_paths([ch["frames"]]))
        v = np.asarray(emb[0])
        return v / (np.linalg.norm(v) + 1e-8)

    return encode_batch, encode_chunk


def _stage2_head(dim: int, ckpt, run_id, *, k_sim: int, k_contrast: int,
                 k_temporal: int, strict: bool = False):
    """Stage-2 RATTHeadV2 as ``apply(query, sim, contrast, temporal) ->
    (B, 1) logits`` (evaluate/scoring.py, CLI error convention)."""
    from vit_research_tpu.evaluate import scoring

    return _scoring_call(scoring.stage2_head, dim, ckpt, run_id,
                         k_sim=k_sim, k_contrast=k_contrast,
                         k_temporal=k_temporal, strict=strict)


def _open_collection(db_path, name):
    """Open an EXISTING collection for read-side commands
    (evaluate/scoring.py, CLI error convention)."""
    from vit_research_tpu.evaluate import scoring

    return _scoring_call(scoring.open_collection, db_path, name)


def _live_event_scorer(args, eng, emb_cache_cap=None):
    """Optional live make/miss scorer for ``segment --score-events``
    (None when the flag is off) — evaluate/scoring.make_live_scorer
    with the CLI's flags and error convention."""
    if not getattr(args, "score_events", False):
        return None
    from vit_research_tpu.evaluate import scoring

    return _scoring_call(
        scoring.make_live_scorer, eng.embed_paths, dim=eng.out_dim,
        ckpt=args.score_ckpt, stage1_run_id=args.stage1_run_id,
        stage2_run_id=args.stage2_run_id, db=args.score_db or args.db,
        collection=args.score_collection, chunk_size=args.chunk_size,
        chunk_stride=args.chunk_stride, k_sim=args.k_sim,
        k_contrast=args.k_contrast, k_temporal=args.k_temporal,
        future_step=args.future_step, emb_cache_cap=emb_cache_cap)


def _score_clip_dir(scorer, clip_dir):
    """Score one written clip directory; returns the eval row or None
    (clip shorter than one chunk)."""
    from vit_research_tpu.data import naming

    vid, clip_num, side = naming.parse_clip_dir(
        os.path.basename(os.path.normpath(clip_dir)))
    frames = naming.list_frames(clip_dir)
    return scorer.score_clip(
        [os.path.join(clip_dir, f) for f in frames],
        side=side, clip_num=clip_num, vid=vid)


def _event_row_summary(row) -> str:
    top = (row.get("topk_chunks") or [None])[0]
    if top is None:
        return f"{row['clip_key']}: no chunks"
    where = (f"frames {top['start_frame']}..{top['end_frame']}"
             if top.get("start_frame") is not None else
             f"chunk idx {top['chunk_start_idx']}..{top['chunk_end_idx']}")
    return (f"{row['clip_key']} ({row['side']}): top event chunk {where} "
            f"P(make)={top['prob']:.3f} over {row['num_chunks']} chunks")


def _split_by_vids(chunks, train_vids, val_vids):
    train = [c for c in chunks if c["vid"] in set(train_vids)]
    val = [c for c in chunks if c["vid"] in set(val_vids)]
    return train, val


def cmd_smoke(args):
    from vit_research_tpu.evaluate.smoke import smoke_test

    smoke_test()


def cmd_metrics(args):
    """Inspect per-run metrics.jsonl ledgers (utils/metrics.py) — the
    replacement for the reference's workflow of reading epoch logs
    pasted as comments in the training scripts
    (reference: nba_proj/train/training.py:481-760)."""
    from vit_research_tpu.utils.metrics import read_metrics

    ledger = os.path.join(args.dir, "metrics.jsonl")
    if os.path.exists(ledger):  # one run: print the curve
        rows = read_metrics(ledger)
        if args.csv:
            _metrics_to_csv(rows, args.csv)
            print(f"wrote {len(rows)} rows to {args.csv}")
            return
        for row in rows:
            items = " ".join(f"{k}={row[k]:.4f}" for k in sorted(row)
                             if k not in ("step", "ts"))
            print(f"epoch {row['step']}: {items}")
        return
    # A checkpoint root: summarize every run under it.
    if args.csv:
        raise SystemExit(
            f"--csv needs a single run dir (no metrics.jsonl in "
            f"{args.dir}); pick one run under it")
    found = False
    for name in sorted(os.listdir(args.dir)) if os.path.isdir(args.dir) \
            else []:
        rows = read_metrics(os.path.join(args.dir, name, "metrics.jsonl"))
        if not rows:
            continue
        found = True
        accs = [r["val_acc"] for r in rows if "val_acc" in r]
        best = f"best val_acc {max(accs):.4f}" if accs else "no val_acc"
        print(f"{name}: {len(rows)} epochs, {best}")
    if not found:
        raise SystemExit(f"no metrics.jsonl ledgers under {args.dir}")


def _metrics_to_csv(rows, path):
    import csv

    keys = ["step"] + sorted({k for r in rows for k in r}
                             - {"step", "ts"})
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        for row in rows:
            w.writerow(row)


def cmd_serve(args):
    """Warm embedding/retrieval daemon (serve.py): one jitted engine,
    no per-script model reload (the reference re-created the HF
    embedder in 8 separate scripts)."""
    from vit_research_tpu.serve import EmbedServer

    coll, mesh = None, None
    if args.db:
        if not args.collection:
            raise SystemExit("--collection is required with --db")
        from vit_research_tpu.store.vector_store import PersistentClient

        coll = PersistentClient(args.db).get_collection(args.collection)
        if args.shard_device:
            from vit_research_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            coll.shard_device(mesh)
            print(f"collection {args.collection} sharded over "
                  f"{mesh.devices.size} device(s)", flush=True)
    server = EmbedServer(_engine(batch_size=args.batch_size),
                         collection=coll, coalesce_ms=args.coalesce_ms,
                         # the reload op's defaults (+ re-shard target):
                         # serve-ctl reload / rebuild-db --notify-socket
                         collection_source=((args.db, args.collection)
                                            if args.db else None),
                         shard_mesh=mesh)
    print(f"serving on {args.socket}"
          + (f" (collection {args.collection})" if coll else ""),
          flush=True)
    server.serve(args.socket)


def cmd_serve_ctl(args):
    """Operator client for a running daemon: ping / stats / reload /
    shutdown over its unix socket — no engine, no jax, instant."""
    import json

    from vit_research_tpu.serve import request

    # missing-socket pre-check lives in serve.request (shared with the
    # session client); the FileNotFoundError lands in the OSError branch
    if args.timeout is not None:
        timeout = args.timeout
    else:
        # reload reopens the whole collection from disk before replying —
        # minutes for a multi-GB corpus (rebuild-db --notify-socket uses
        # the same 300 s); everything else answers instantly
        timeout = 300.0 if args.op == "reload" else 60.0
    req = {"op": args.op}
    if args.db or args.collection:
        if args.op != "reload":
            raise SystemExit("--db/--collection only apply to reload")
        if args.db:
            req["db"] = args.db
        if args.collection:
            req["collection"] = args.collection
    try:
        resp = request(args.socket, req, timeout=timeout)
    except (OSError, ConnectionError) as e:
        raise SystemExit(f"daemon at {args.socket!r} did not answer: {e}")
    if not resp.get("ok"):
        raise SystemExit(f"daemon error: {resp.get('error')}")
    print(json.dumps(resp, indent=2, sort_keys=True))


def _labeled_frames(frames_dir: str, manual_csv: str):
    """Sorted frame names with manual-interval side labels ('ignore' for
    unlabeled)."""
    from vit_research_tpu.data import naming
    from vit_research_tpu.data.labels import ManualIntervals

    frames = naming.list_frames(frames_dir)
    mi = ManualIntervals.from_csv(manual_csv)
    return frames, [mi.class_from_frame(f) for f in frames]


def _corpus_from_collection(col):
    """CLI shim over segment/knn.py::corpus_from_collection: same corpus
    dict, ValueError surfaced as a clean exit instead of a traceback."""
    from vit_research_tpu.segment.knn import corpus_from_collection

    try:
        return corpus_from_collection(col)
    except ValueError as e:
        raise SystemExit(str(e))


def cmd_write_frame_db(args):
    """Manually-labeled frames -> labeled frame collection with one-hot
    prob metadata (reference:
    nba_proj/write_per_vid_embeddings_chroma.py:203-278)."""
    from vit_research_tpu.db.builders import write_labeled_frame_collection
    from vit_research_tpu.segment.knn import SIDES
    from vit_research_tpu.store.vector_store import PersistentClient

    frames, sides = _labeled_frames(args.frames, args.manual_csv)
    keep = [(f, s) for f, s in zip(frames, sides) if s != "ignore"]
    if not keep:
        raise SystemExit("no frames fall inside the manual intervals")
    paths = [os.path.join(args.frames, f) for f, _ in keep]
    labels = [s for _, s in keep]
    probs = [[1.0 if s == t else 0.0 for t in SIDES] for s in labels]
    eng = _engine(batch_size=args.batch_size)
    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "l2"})
    n = write_labeled_frame_collection(paths, labels, probs, eng.embed_paths,
                                       col, batch_size=args.batch_size)
    client.flush()
    print(f"wrote {n} labeled frame embeddings into {args.collection}")


def cmd_write_embeddings(args):
    """Per-class npz artifacts ({cls}_embeddings.npz)
    (reference: nba_proj/write_embeddings.py:177-243,
    nba_proj/write_per_video_embeddings.py:167-232)."""
    from vit_research_tpu.db.builders import write_class_npz

    frames, sides = _labeled_frames(args.frames, args.manual_csv)
    by_class: dict = {}
    for f, s in zip(frames, sides):
        if s != "ignore":
            by_class.setdefault(s, []).append(os.path.join(args.frames, f))
    if not by_class:
        raise SystemExit("no frames fall inside the manual intervals")
    eng = _engine(batch_size=args.batch_size)
    out = write_class_npz(by_class, eng.embed_paths, args.out_template)
    for cls, path in sorted(out.items()):
        print(f"{cls}: {len(by_class[cls])} frames -> {path}")


def cmd_self_label(args):
    """Two-pass kNN self-labeling against a labeled seed collection
    (reference: nba_proj/chroma.py:36-134,196-309). Writes a labels CSV;
    --upsert also writes accepted pass-1 frames back into the
    collection, enlarging the corpus like the reference's re-upserts."""
    import csv

    import numpy as np

    from vit_research_tpu.data import naming
    from vit_research_tpu.segment.knn import SIDES, two_pass_self_label
    from vit_research_tpu.store.vector_store import PersistentClient

    frames = naming.list_frames(args.frames)
    if not frames:
        raise SystemExit(f"no frames under {args.frames}")
    client = PersistentClient(args.db)
    col = client.get_collection(args.collection)
    corpus = _corpus_from_collection(col)
    eng = _engine(batch_size=args.batch_size)
    embs = np.asarray(
        eng.embed_paths([os.path.join(args.frames, f) for f in frames]))
    labels, probs, accepted = two_pass_self_label(
        embs, corpus["embeddings"], corpus["labels"], k=args.k,
        min_votes=args.min_votes, temperature=args.temperature)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["frame", "label", "pass", "left_prob", "right_prob",
                    "none_prob"])
        for i, frame in enumerate(frames):
            w.writerow([frame, SIDES[int(labels[i])],
                        1 if accepted[i] else 2] +
                       [f"{p:.6f}" for p in probs[i]])
    if args.upsert and accepted.any():
        # Enlarge the corpus with NEW frames only: ids are frame
        # basenames, and overwriting an existing row would replace
        # manually-labeled seed metadata with a kNN-derived guess
        # (one >=min_votes misvote would silently corrupt ground truth).
        existing = set(col.get(ids=frames)["ids"])
        sel = [i for i in np.nonzero(accepted)[0]
               if frames[i] not in existing]
        if sel:
            col.upsert([frames[i] for i in sel], embs[sel],
                       [{"label": SIDES[int(labels[i])],
                         **{f"{s}_prob": float(probs[i][j])
                            for j, s in enumerate(SIDES)}} for i in sel])
            client.flush()
        skipped = int(accepted.sum()) - len(sel)
        if skipped:
            print(f"kept {skipped} existing corpus rows (not overwritten)")
    print(f"labeled {len(frames)} frames ({int(accepted.sum())} pass-1, "
          f"{len(frames) - int(accepted.sum())} pass-2) -> {args.out}")


def cmd_finalize_clips(args):
    """Per-clip refinement: re-embed each clip's frames, 5-NN vote, a
    fresh HMM per clip, keep frames whose decoded state matches the clip
    label (reference: nba_proj/finalize_clips.py:134-192)."""
    import numpy as np

    from vit_research_tpu.segment import knn as knn_mod
    from vit_research_tpu.segment.clips import finalize_clip_dirs
    from vit_research_tpu.store.vector_store import PersistentClient

    clip_dirs = _list_clip_dirs(args.clips)
    col = PersistentClient(args.db).get_collection(args.collection)
    corpus = _corpus_from_collection(col)
    eng = _engine(batch_size=args.batch_size)

    def frame_probs(paths):
        embs = np.asarray(eng.embed_paths(paths))
        nl, _, _ = knn_mod.knn_labels(embs, corpus["embeddings"],
                                      corpus["labels"], args.k)
        return knn_mod.vote_counts(nl) / args.k

    out = finalize_clip_dirs(clip_dirs, frame_probs, args.out)
    print(f"finalized {len(out)} clips -> {args.out}")


def cmd_merge_clips(args):
    """Merge adjacent same-side clips with gap <= --max-gap, rebuilding
    merged dirs from the full frame pool
    (reference: nba_proj/merge_clips.py:17-113)."""
    from vit_research_tpu.segment.clips import merge_clip_dirs

    clip_dirs = _list_clip_dirs(args.clips)
    out = merge_clip_dirs(clip_dirs, args.frame_pool, args.out,
                          max_gap=args.max_gap)
    print(f"merged {len(clip_dirs)} clips -> {len(out)} under {args.out}")


def _list_clip_dirs(root: str) -> list:
    from vit_research_tpu.data import naming

    dirs = []
    for d in sorted(os.listdir(root)):
        if not os.path.isdir(os.path.join(root, d)):
            continue
        try:
            naming.parse_clip_dir(d)
        except (IndexError, ValueError):
            continue
        dirs.append(os.path.join(root, d))
    if not dirs:
        raise SystemExit(f"no vid*_clip_* directories under {root}")
    return dirs


def cmd_clustering(args):
    """Embedding-space study + side classifier: class-mean separation
    distances, KMeans seeded at class means, and a Dense(512)->Dense(128)
    MLP saved as portable npz (reference: nba_proj/clustering.py:43-160
    saved side_nn.keras)."""
    from vit_research_tpu.segment.clustering import (
        SIDES, class_mean_separation, kmeans_with_class_means,
        train_side_classifier)
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train.checkpoint import save_params_npz

    col = PersistentClient(args.db).get_collection(args.collection)
    corpus = _corpus_from_collection(col)
    embs, labels = corpus["embeddings"], corpus["labels"]
    sep = class_mean_separation(embs, labels)
    for (a, b), d in sorted(sep.items()):
        print(f"class-mean L2 {SIDES[a]}<->{SIDES[b]}: {d:.3f}")
    _, assign = kmeans_with_class_means(embs, labels)
    agree = float((assign == labels).mean())
    print(f"kmeans(class-mean init) label agreement: {agree:.3f}")
    model, params, history = train_side_classifier(
        embs, labels, num_epochs=args.epochs, batch_size=args.batch_size,
        seed=args.seed)
    if history:
        print(f"side MLP final train acc {history[-1]['acc']:.3f}")
    save_params_npz(params, args.out)
    print(f"saved side classifier params -> {args.out}")


def cmd_fresh_test(args):
    """Qualitative eval: classify unseen frames with the saved side
    classifier and copy them into left/right/none dirs
    (reference: nba_proj/fresh_test.py:64-101)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_research_tpu.data import naming
    from vit_research_tpu.evaluate.fresh_test import dump_classified_frames
    from vit_research_tpu.segment.clustering import SideMLP, classify_sides
    from vit_research_tpu.train.checkpoint import load_params_npz

    eng = _engine(batch_size=args.batch_size)
    # Size the template from the npz itself: `clustering` builds the MLP
    # as max(label)+1 classes over input dim D, so a 2-class or
    # non-default-D save must load back without a shape mismatch.
    with np.load(args.params) as saved:
        in_dim, _ = saved["params/fc1/kernel"].shape
        _, n_classes = saved["params/out/kernel"].shape
    if in_dim != eng.out_dim:
        raise SystemExit(
            f"{args.params} was trained on {in_dim}-d embeddings but the "
            f"engine produces {eng.out_dim}-d (check VRT_TINY)")
    model = SideMLP(num_classes=n_classes)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, in_dim)))
    params = load_params_npz(template, args.params)
    frames = naming.list_frames(args.frames)
    buckets = dump_classified_frames(
        [os.path.join(args.frames, f) for f in frames], eng.embed_paths,
        lambda e: classify_sides(model, params, e), args.out)
    counts = " ".join(f"{s}={len(v)}" for s, v in sorted(buckets.items()))
    print(f"classified {len(frames)} frames -> {args.out} ({counts})")


def cmd_rebuild_db(args):
    """Standalone frame-level DB rebuild, optionally re-projecting with a
    trained rag run's ProjectionHead (reference:
    nba_proj/db_maintainence/db_rebuild.py:100-232 — run standalone there,
    and every REBUILD_EVERY epochs from training.py:479-480; the
    in-training equivalents are train-rag --rebuild sync and
    train/async_rebuild.py)."""
    from vit_research_tpu.db.builders import rebuild_frame_db
    from vit_research_tpu.db.frame_store import FrameStore
    from vit_research_tpu.store.vector_store import PersistentClient

    recs, _ = _load_world(args)
    store = FrameStore(args.store).open()

    def embed(paths):
        return store.gather_paths([[p] for p in paths])[:, 0]

    project_fn = None
    if args.run_id:
        import jax.numpy as jnp
        import numpy as np

        from vit_research_tpu.models.heads import ProjectionHead
        from vit_research_tpu.train.checkpoint import CheckpointManager

        if args.ckpt is None:
            raise SystemExit("--run-id needs --ckpt (the checkpoint root)")
        if not os.path.isdir(os.path.join(args.ckpt, args.run_id)):
            raise SystemExit(f"--run-id {args.run_id}: no such run under "
                             f"{args.ckpt!r}")
        restored = CheckpointManager(args.ckpt, args.run_id).restore_best()
        if restored is None or "proj" not in restored.get("params", {}):
            raise SystemExit(f"--run-id {args.run_id}: no best checkpoint "
                             "with ProjectionHead params (expect a "
                             "train-rag run)")
        proj_params = restored["params"]["proj"]
        proj = ProjectionHead(input_dim=store.dim, proj_dim=store.dim)

        def project_fn(x):
            return np.asarray(proj.apply(proj_params, jnp.asarray(x)))

    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    n = rebuild_frame_db(recs, embed, project_fn, col,
                         batch_size=args.batch_size)
    client.flush()
    print(f"rebuilt {args.collection}: {n} frame embeddings"
          + (" (re-projected)" if project_fn else ""))
    if args.notify_socket:
        # Close the train->serve loop: the daemon hot-swaps to the
        # rebuilt generation without an engine restart. Flush happened
        # above, so the reopened collection sees every row.
        from vit_research_tpu.serve import request as serve_request

        try:
            resp = serve_request(
                args.notify_socket,
                {"op": "reload", "db": args.db,
                 "collection": args.collection},
                timeout=300.0)
        except (OSError, ConnectionError) as e:
            raise SystemExit(
                f"rebuild succeeded but the daemon at "
                f"{args.notify_socket!r} did not answer the reload: {e}")
        if not resp.get("ok"):
            raise SystemExit("rebuild succeeded but the daemon reload "
                             f"failed: {resp.get('error')}")
        print(f"daemon reloaded {args.collection}: {resp['rows']} rows "
              f"(was {resp['previous_rows']})")


def cmd_search(args):
    """Ad-hoc neighbor lookup: embed frames (or take rows from an .npz)
    and query a collection, printing one JSON line per query. The
    scriptable face of the store's exact device top-k."""
    import json

    import numpy as np

    from vit_research_tpu.store.vector_store import PersistentClient

    col = PersistentClient(args.db).get_collection(args.collection)
    if args.npz:
        with np.load(args.npz) as data:
            key = args.npz_key or data.files[0]
            q = np.asarray(data[key], np.float32)
        if q.ndim == 3:  # (N, 1, D): the reference's class-npz layout
            q = q[:, 0]
        elif q.ndim == 1:
            q = q[None]
        names = [f"{args.npz}[{key}][{i}]" for i in range(len(q))]
    elif args.frames:
        eng = _engine(batch_size=args.batch_size)
        q = np.asarray(eng.embed_paths(args.frames))
        names = list(args.frames)
    else:
        raise SystemExit("pass frame paths or --npz")
    where = json.loads(args.where) if args.where else None
    got = col.query(q, n_results=args.k, where=where,
                    include=("metadatas", "distances"))
    for name, ids, dists, metas in zip(names, got["ids"],
                                       got["distances"], got["metadatas"]):
        print(json.dumps({
            "query": name,
            "neighbors": [{"id": i, "distance": round(float(d), 6),
                           "metadata": m}
                          for i, d, m in zip(ids, dists, metas)],
        }))


def cmd_db_info(args):
    """Inspect a vector-store root: per-collection rows, space, dim,
    device quantization, and log-segment state (the ops view of
    store/vector_store.py's snapshot+append-log layout)."""
    from vit_research_tpu.store.vector_store import PersistentClient

    client = PersistentClient(args.db, autoflush=False)
    names = client.list_collections()
    if not names:
        raise SystemExit(f"no collections under {args.db}")
    for name in names:
        col = client.get_collection(name)
        segs = len(col._segments)
        print(f"{name}: {col.count()} rows  space={col.space}  "
              f"dim={col._dim}  device_quant={col.device_quant or '-'}  "
              f"log_segments={segs}")
        if args.compact and segs:
            col.compact()
            print(f"  compacted {segs} segments into a fresh snapshot")


def cmd_extract_frames(args):
    from vit_research_tpu.data.video import extract_frames

    frame_range = None
    if args.start is not None or args.end is not None:
        if args.start is None or args.end is None:
            raise SystemExit("--start and --end go together")
        frame_range = (args.start, args.end)
    paths = extract_frames(args.video, args.out, args.vid,
                           size=(args.height, args.width), every=args.every,
                           frame_range=frame_range)
    print(f"wrote {len(paths)} frames to {args.out}")


def cmd_segment(args):
    """Frames -> possession clips. ``--method temporal`` (default) is the
    reference's modern path (TemporalHead CNN + HMM,
    nba_proj/smarter_generate_clips.py:349-423); ``--method knn-hmm`` is
    the kNN-vote streaming path (nba_proj/generate_clips_hmm.py:367-490)
    and ``--method streaks`` the pre-HMM sliding-window classifier
    (nba_proj/generate_clips.py:99-368, also writes clip_intervals.csv) —
    both run against a labeled frame collection (--db/--corpus-collection,
    built by write-frame-db), with optional confident write-back."""
    from vit_research_tpu.data import naming
    from vit_research_tpu.data.labels import ManualIntervals
    from vit_research_tpu.segment.pipeline import (segment_with_knn_hmm,
                                                   segment_with_temporal_head)

    # Validate method arguments BEFORE the engine spins up: embedding a
    # whole frames dir (minutes of TPU compile + transfer) only to fail
    # on a missing flag is hostile.
    if args.socket:
        if not args.follow:
            raise SystemExit("--socket is the daemon-routed live mode: "
                             "it requires --follow (for offline scoring "
                             "against a daemon, use the daemon's query/"
                             "embed ops or run segment locally)")
        if args.method != "knn-hmm":
            raise SystemExit("--socket supports --method knn-hmm only "
                             "(the daemon's segment sessions)")
        if args.db or args.corpus_collection:
            raise SystemExit("--socket ranks against the DAEMON's "
                             "collection (cli serve --collection); drop "
                             "--db/--corpus-collection — scoring still "
                             "takes --score-db/--score-collection")
    if args.method in ("knn-hmm", "streaks") and not args.socket:
        if not (args.db and args.corpus_collection):
            raise SystemExit(f"--method {args.method} needs --db and "
                             "--corpus-collection (see write-frame-db)")
        from vit_research_tpu.store.vector_store import PersistentClient

        client = PersistentClient(args.db)
        col = client.get_collection(args.corpus_collection)
        corpus = _corpus_from_collection(col)
        # rank with the collection's own metric on every surface (the
        # daemon's segment sessions already do; a cosine corpus must not
        # silently rank by L2 here)
        space = getattr(col, "space", "l2")
    elif args.method == "temporal" and not args.manual_csv:
        raise SystemExit("--method temporal needs --manual-csv")

    if args.transitions and args.method != "knn-hmm":
        raise SystemExit("--transitions applies to --method knn-hmm only "
                         "(the temporal/streaks paths don't take an HMM "
                         "transition override)")
    transitions = _load_transitions(args.transitions) \
        if args.transitions else None
    if args.score_events and not (args.score_collection and args.score_ckpt
                                  and args.stage1_run_id
                                  and args.stage2_run_id
                                  and (args.score_db or args.db)):
        raise SystemExit(
            "--score-events needs --score-collection, --score-ckpt, "
            "--stage1-run-id and --stage2-run-id (the TRAINED runs to "
            "score with — without them the head would be random weights "
            "producing plausible-looking garbage), plus a retrieval "
            "store (--score-db, or --db when they share one); see "
            "eval-clips for the training pipeline")
    if args.score_events and (args.chunk_size < 1 or args.chunk_stride < 1):
        # build_chunks raises the same complaint, but only AFTER the
        # full game embed (offline) or mid-game at the first clip
        # (--follow) — this block exists to fail before embedding
        raise SystemExit("--score-events needs positive --chunk-size and "
                         "--chunk-stride")

    if args.follow:
        if args.method != "knn-hmm":
            raise SystemExit("--follow supports --method knn-hmm only")
        if args.socket:
            backend = _DaemonFollowBackend(args,
                                           transition_matrix=transitions)
        else:
            backend = _LocalFollowBackend(
                args, corpus, col if args.write_back else None,
                client if args.write_back else None,
                metric=space, transition_matrix=transitions)
        return _segment_follow(args, backend)

    os.makedirs(args.out, exist_ok=True)
    frames = naming.list_frames(args.frames)
    eng = _engine(batch_size=args.batch_size)
    # construct the scorer BEFORE the expensive embed: a typo'd
    # --score-collection or a missing checkpoint must fail here, not
    # after minutes of embedding + segmentation
    scorer = _live_event_scorer(args, eng)
    frame_paths = [os.path.join(args.frames, f) for f in frames]
    embs = eng.embed_paths(frame_paths)
    if scorer is not None:
        # the clip dirs hold COPIES of these frames under the same
        # basenames — remember the embeddings so scoring does not
        # re-embed the whole game a second time
        scorer.remember(frame_paths, embs)
    if args.method in ("knn-hmm", "streaks"):
        if args.method == "streaks":
            from vit_research_tpu.segment.pipeline import (
                segment_with_knn_streaks)

            decoded, clip_dirs, _ = segment_with_knn_streaks(
                frames, embs, corpus, out_root=args.out,
                src_dir=args.frames, vid=args.vid, k=args.k,
                confidence_threshold=args.confidence_threshold,
                window=args.window, min_len=args.min_len, pad=args.pad,
                collection=col if args.write_back else None, metric=space,
                intervals_csv=os.path.join(args.out, "clip_intervals.csv"))
        else:
            decoded, clip_dirs, _ = segment_with_knn_hmm(
                frames, embs, corpus, out_root=args.out,
                src_dir=args.frames, vid=args.vid, k=args.k,
                confidence_threshold=args.confidence_threshold,
                min_len=args.min_len, pad=args.pad, metric=space,
                collection=col if args.write_back else None,
                transition_matrix=transitions)
        if args.write_back:
            client.flush()
    else:
        mi = ManualIntervals.from_csv(args.manual_csv)
        decoded, clip_dirs, _ = segment_with_temporal_head(
            frames, embs, mi, out_root=args.out, src_dir=args.frames,
            vid=args.vid, epochs=args.epochs, min_len=args.min_len,
            pad=args.pad,
            params_path=os.path.join(args.out, "temporal_head.npz"))
    print(f"decoded {len(decoded)} frames -> {len(clip_dirs)} clips")

    if scorer is not None:
        from vit_research_tpu.evaluate.clip_sequences import save_results

        rows = []
        for cdir in clip_dirs:
            row = _score_clip_dir(scorer, cdir)
            if row is None:
                print(f"{os.path.basename(cdir)}: too short to chunk "
                      f"(< {scorer.chunk_size} frames) — not scored")
                continue
            print(_event_row_summary(row))
            rows.append(row)
        save_results(rows, os.path.join(args.out, "events.json"),
                     os.path.join(args.out, "events.csv"))
        print(f"scored {len(rows)}/{len(clip_dirs)} clips -> "
              f"{os.path.join(args.out, 'events.json')} "
              "(score with: score-events)")


def _load_transitions(path):
    """Read a (3, 3) HMM transition matrix from JSON: either a bare
    nested list, or a ``tune-segment`` output dict (uses its
    ``best_transition_matrix``)."""
    import json

    from vit_research_tpu.segment.hmm import validate_transition_matrix

    with open(path) as fh:
        data = json.load(fh)
    if isinstance(data, dict):
        if "best_transition_matrix" not in data:
            raise SystemExit(f"{path}: JSON dict carries no "
                             "'best_transition_matrix' (expected a "
                             "tune-segment output or a bare 3x3 list)")
        data = data["best_transition_matrix"]
    try:
        return validate_transition_matrix(data)
    except ValueError as e:
        raise SystemExit(f"{path}: {e}")


class _LocalFollowBackend:
    """--follow in-process: own engine + KnnHmmStreamSession (+ scorer).
    Clips are scored from their just-written dirs, reusing the stream's
    embeddings via the scorer's LRU."""

    def __init__(self, args, corpus, collection, client, *,
                 metric: str = "l2", transition_matrix=None):
        from vit_research_tpu.segment.pipeline import KnnHmmStreamSession

        self.eng = _engine(batch_size=args.batch_size)
        # bounded LRU: a followed game grows without limit, but clips
        # are always recent (fixed-lag commits) — 16k frames (~48 MB at
        # D=768) covers any possession; evicted frames re-embed on miss
        self.scorer = _live_event_scorer(args, self.eng,
                                         emb_cache_cap=16384)
        self.scoring = self.scorer is not None
        self._client = client
        self.session = KnnHmmStreamSession(
            corpus, k=args.k,
            confidence_threshold=args.confidence_threshold,
            min_len=args.min_len, pad=args.pad, max_lag=args.max_lag,
            drain_every=8, collection=collection, vid=args.vid,
            metric=metric, transition_matrix=transition_matrix)

    def push(self, names, paths):
        """(clip intervals, None): local clips are scored later, from
        the written dir (score_dir)."""
        # prefetch=0: each call is a single <=batch_size chunk, so a
        # producer thread can't overlap anything — it would just add
        # a thread spawn + queue per poll on a 200k-frame session
        embs = self.eng.embed_paths(paths, prefetch=0)
        if self.scorer is not None:
            # the stream already paid for these embeddings; event
            # scoring reuses them instead of re-embedding each clip
            self.scorer.remember(names, embs)
        return self.session.push_batch(names, embs), None

    def finish(self):
        clips = self.session.finish()
        if self._client is not None:
            self._client.flush()
        return clips, None, self.session.forced

    def score_dir(self, clip_dir):
        return _score_clip_dir(self.scorer, clip_dir)


class _DaemonFollowBackend:
    """--follow --socket: a running ``cli serve`` daemon owns the warm
    engine, the corpus collection and (optionally) the scoring stack;
    this process only tails the frames dir, pushes paths over the unix
    socket and writes clip dirs / event rows from the replies. N games
    can follow concurrently against ONE chip — the daemon serializes
    device work and micro-batches concurrent embeds (serve.py), where
    N local --follow loops would each demand their own engine.

    Resilience: daemon session state is CONNECTION-scoped, so a dropped
    connection (or a daemon restart) loses the lattice — but this
    backend records every successful push and, on ConnectionError,
    reconnects (waiting up to ``RECONNECT_DEADLINE_S`` for the socket
    to come back), opens a fresh session and REPLAYS the history. The
    replay is deterministic, so already-returned clips re-emerge
    identically and are skipped by count; the game continues mid-stream
    instead of dying with the connection. --write-back sessions cannot
    replay (their corpus grew mid-game, shifting the decode) and a
    failure DURING replay poisons the backend — both fail loudly rather
    than continue on misaligned state."""

    RECONNECT_DEADLINE_S = 120.0

    def __init__(self, args, transition_matrix=None):
        self._args = args
        self._transitions = (None if transition_matrix is None else
                             [[float(x) for x in row]
                              for row in transition_matrix])
        self._history: list[list[str]] = []  # successful pushes (paths)
        self._clips_returned = 0
        self._poisoned: str | None = None
        self.client = None
        self._connect(first=True)

    def _connect(self, *, first: bool) -> None:
        from vit_research_tpu.serve import SessionClient

        args = self._args
        try:
            # generous timeout: the daemon's first batches may hit fresh
            # jit compiles (minutes over a TPU tunnel)
            self.client = SessionClient(args.socket, timeout=600.0)
        except FileNotFoundError as e:
            if first:  # operator error, not a flap: clean exit
                raise SystemExit(str(e))
            raise
        req = {"op": "segment_start", "k": args.k,
               "confidence_threshold": args.confidence_threshold,
               "min_len": args.min_len, "pad": args.pad,
               "max_lag": args.max_lag,
               "write_back": bool(args.write_back), "vid": args.vid}
        if self._transitions is not None:
            req["transitions"] = self._transitions
        if args.score_events:
            # same preflight as the local scorer, evaluated daemon-side
            # (the daemon replies with the loader's error on a bad run).
            # Paths go ABSOLUTE, like the frame paths: relative ones
            # would resolve against the daemon's cwd, not the user's
            req["score_events"] = {
                "ckpt": os.path.abspath(args.score_ckpt),
                "stage1_run_id": args.stage1_run_id,
                "stage2_run_id": args.stage2_run_id,
                "db": os.path.abspath(args.score_db or args.db),
                "collection": args.score_collection,
                "chunk_size": args.chunk_size,
                "chunk_stride": args.chunk_stride,
                "k_sim": args.k_sim, "k_contrast": args.k_contrast,
                "k_temporal": args.k_temporal,
                "future_step": args.future_step,
                "emb_cache_cap": 16384}
        resp = self.client.request(req)
        if not resp.get("ok"):
            # only the FIRST connect turns a refusal into a clean exit
            # (bad user config); a refusal after a reconnect is a
            # changed daemon — surface it loudly
            err = f"daemon refused the segment session: {resp.get('error')}"
            if first:
                raise SystemExit(err)
            raise RuntimeError(err)
        self.scoring = bool(resp.get("scoring"))

    @staticmethod
    def _ivs(clips):
        from vit_research_tpu.segment.clips import ClipInterval

        return [ClipInterval(side=c["side"], start=int(c["start"]),
                             end=int(c["end"])) for c in clips]

    def _poison(self, why: str):
        """Refuse every further push: continuing on a partially-replayed
        session would silently misalign every later clip's global frame
        indices against the wrong frames."""
        self._poisoned = why
        return RuntimeError(f"daemon follow backend unrecoverable: {why} "
                            "— restart the follower")

    def _reconnect_and_replay(self, pending_paths):
        """New connection + session, replay the push history (and the
        interrupted push, when given); returns only the clips/events
        BEYOND those already returned to the follow loop. Any failure
        DURING the replay poisons the backend — a half-replayed session
        must never accept more pushes."""
        import time

        try:
            self.client.close()
        except Exception:  # noqa: BLE001 - already broken
            pass
        if self._args.write_back:
            # replay is only deterministic against the session's
            # start-time corpus; a write-back session grew the corpus
            # mid-game, so the reconnected decode could shift clip
            # boundaries and break the skip-by-count dedupe — refuse
            raise self._poison(
                "connection lost on a --write-back session (replay "
                "against the grown corpus is not deterministic)")
        print(f"WARNING: daemon connection lost after "
              f"{len(self._history)} pushes; reconnecting and replaying "
              "(session state is connection-scoped)", flush=True)
        deadline = time.monotonic() + self.RECONNECT_DEADLINE_S
        while True:
            try:
                self._connect(first=False)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise self._poison(
                        "daemon did not come back within "
                        f"{self.RECONNECT_DEADLINE_S:.0f}s")
                time.sleep(2.0)
        replay = self._history + (
            [pending_paths] if pending_paths is not None else [])
        all_clips, all_events = [], []
        for paths in replay:
            try:
                r = self.client.request({"op": "segment_push",
                                         "paths": paths})
            except Exception as e:  # noqa: BLE001 - poison, don't nest
                raise self._poison(f"replay failed mid-history: {e}")
            if not r.get("ok"):
                raise self._poison(
                    f"replay failed mid-history: {r.get('error')}")
            all_clips.extend(r["clips"])
            all_events.extend(r.get("events") or [])
        new_clips = all_clips[self._clips_returned:]
        new_events = (all_events[self._clips_returned:]
                      if self.scoring else None)
        self._clips_returned = len(all_clips)
        print(f"reconnected: replayed {len(replay)} pushes, "
              f"{len(new_clips)} new clip(s)", flush=True)
        return self._ivs(new_clips), new_events

    def push(self, names, paths):
        if self._poisoned:
            raise RuntimeError(
                f"daemon follow backend unrecoverable: {self._poisoned}")
        paths = [os.path.abspath(p) for p in paths]
        try:
            resp = self.client.request(
                {"op": "segment_push", "paths": paths})
        except OSError:
            # ConnectionError AND timeouts (a busy daemon past the 600s
            # recv window poisons the SessionClient the same way)
            clips, events = self._reconnect_and_replay(paths)
            self._history.append(paths)
            return clips, events
        if not resp.get("ok"):
            # surfaced like a local embed failure so the follow loop's
            # isolate/decode-retry logic applies unchanged (the daemon
            # embeds BEFORE advancing session state, so a failed push
            # consumed nothing)
            raise RuntimeError(f"daemon segment_push failed: "
                               f"{resp.get('error')}")
        self._history.append(paths)
        self._clips_returned += len(resp["clips"])
        return self._ivs(resp["clips"]), resp.get("events")

    def finish(self):
        if self._poisoned:
            raise RuntimeError(
                f"daemon follow backend unrecoverable: {self._poisoned}")
        pre_clips, pre_events = [], []
        try:
            resp = self.client.request({"op": "segment_finish"})
        except OSError:
            pre_clips, pre_events = self._reconnect_and_replay(None)
            pre_events = pre_events or []
            resp = self.client.request({"op": "segment_finish"})
        if not resp.get("ok"):
            raise SystemExit(
                f"daemon segment_finish failed: {resp.get('error')}")
        self.client.close()
        clips = pre_clips + self._ivs(resp["clips"])
        events = ((pre_events + (resp.get("events") or []))
                  if self.scoring else None)
        return clips, events, int(resp.get("forced", 0))


def _segment_follow(args, backend):
    """Live mode: tail --frames for newly arriving frames (increasing
    frame-number order — e.g. an ffmpeg dump in progress), feed them
    through the streaming kNN+HMM session, and write/announce each
    possession clip the moment its padded extent is final — mid-game,
    not after it. Stops after --idle-timeout seconds with no new
    frames, or when a file named STOP appears (drains everything on
    disk first). Robust to non-atomic writers: the highest-numbered
    frame is held back until a newer one appears (it may still be
    mid-write), a frame whose decode fails is retried on later polls
    (then skipped with a warning), and a frame that surfaces AFTER a
    higher-numbered one was consumed is dropped with a warning rather
    than corrupting the stream order the clip indices depend on. The
    reference's incremental loop
    (nba_proj/generate_clips_hmm.py:367-490) could only decode at the
    end; see segment/pipeline.py::KnnHmmStreamSession.

    ``backend`` owns the embed+segment(+score) stack: in this process
    (:class:`_LocalFollowBackend`) or a shared daemon
    (:class:`_DaemonFollowBackend`)."""
    import json
    import shutil
    import time

    from vit_research_tpu.data import naming

    events_path = os.path.join(args.out, "events.jsonl")
    os.makedirs(args.out, exist_ok=True)
    if backend.scoring:
        # one JSONL per session: a rerun into the same --out must not
        # silently append to the previous game's rows
        open(events_path, "w").close()
    consumed: list = []  # frame names in stream order
    seen: set = set()    # consumed or permanently skipped
    retries: dict = {}   # name -> failed decode attempts
    clip_count = 0
    event_count = 0
    last_num = -1        # highest consumed frame number

    def emit(clips, rows=None):
        nonlocal clip_count, event_count
        for j, iv in enumerate(clips):
            clip_count += 1
            cdir = os.path.join(
                args.out, naming.clip_dir_name(args.vid, clip_count,
                                               iv.side))
            os.makedirs(cdir, exist_ok=True)
            for f in consumed[iv.start: iv.end + 1]:
                src = os.path.join(args.frames, f)
                if os.path.exists(src):
                    shutil.copy(src, os.path.join(cdir, f))
            print(f"clip {clip_count}: {iv.side} frames "
                  f"{iv.start}..{iv.end} -> {cdir}", flush=True)
            if not backend.scoring:
                continue
            # score the possession the moment it is final — mid-game
            # (the reference's event harness only ran post-hoc over a
            # rebuilt dataset, nba_proj/test/get_clip_sequences.py:600-813).
            # Daemon rows arrive WITH the clips; local clips score from
            # the dir just written.
            row = rows[j] if rows is not None else backend.score_dir(cdir)
            if row is None:
                print(f"  not scored: too short to chunk "
                      f"(< {args.chunk_size} frames)", flush=True)
                continue
            if "clip_key" not in row:  # daemon per-clip scoring error
                print(f"  WARNING: scoring failed: "
                      f"{row.get('error', row)}", flush=True)
                continue
            event_count += 1
            with open(events_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")
            print(f"  {_event_row_summary(row)}", flush=True)

    def scan_fresh():
        # os.scandir + seen-check BEFORE parsing: a 2-hour game leaves
        # ~200k consumed names; regex-parsing and sorting all of them
        # every poll would turn quadratic on the host.
        # is_canonical_frame_name (strict), NOT is_frame_name: the
        # tolerant parser accepts 'vid1_frame_5.jpg.part', so a lax
        # filter would race an atomic copy-then-rename writer (consume
        # the .part name, then drop the real frame as out-of-order).
        # Same-vid only: a dump dir shared across games must not leak
        # another video's frames into this stream's clip indices.
        fresh = []
        with os.scandir(args.frames) as it:
            for entry in it:
                f = entry.name
                if f in seen or not naming.is_canonical_frame_name(f):
                    continue
                if naming.parse_frame_name(f)[0] != args.vid:
                    continue
                fresh.append(f)
        fresh.sort(key=naming.frame_sort_key)
        return fresh

    def consume(chunk) -> bool:
        """Returns False when the stream must STALL at a not-yet-
        decodable frame — the caller must stop consuming this poll's
        later chunks too, or the held frame would come back
        'out-of-order' next poll and be dropped."""
        nonlocal last_num
        try:
            clips, rows = backend.push(
                chunk, [os.path.join(args.frames, f) for f in chunk])
        except Exception:
            if len(chunk) > 1:  # isolate the bad frame, preserve order
                for f in chunk:
                    if not consume([f]):
                        return False
                return True
            f = chunk[0]
            # Decode the frame alone to tell a bad FILE from a broken
            # ENGINE: if the bytes decode fine, the embed failure is
            # systemic (device/tunnel down, OOM) — re-raise instead of
            # silently skipping every frame and exiting 0 with
            # 'followed N frames -> 0 clips'.
            from vit_research_tpu.data.preprocess import decode_image
            decoded_ok = False
            try:
                decode_image(os.path.join(args.frames, f))
                decoded_ok = True
            except Exception:
                pass
            if decoded_ok:
                raise
            retries[f] = retries.get(f, 0) + 1
            if retries[f] >= 3:
                seen.add(f)
                print(f"WARNING: skipping undecodable frame {f} "
                      f"after {retries[f]} attempts", flush=True)
                return True  # permanently skipped; stream continues
            return False  # likely still being written; retry next poll
        consumed.extend(chunk)
        seen.update(chunk)
        last_num = naming.frame_num(chunk[-1])
        emit(clips, rows)
        return True

    last_new = time.monotonic()
    while True:
        # STOP means "the producer is done": drain everything already
        # on disk, then finish — never abandon arrived frames.
        stopping = os.path.exists(os.path.join(args.frames, "STOP"))
        fresh = scan_fresh()
        late = [f for f in fresh if naming.frame_num(f) <= last_num]
        if late:
            seen.update(late)
            # remove by membership, not a prefix slice: robustness if
            # sort order and lateness ever disagree (they can't for a
            # single-vid scan, but a slice would then consume a frame
            # the warning just claimed to drop)
            dropped = set(late)
            fresh = [f for f in fresh if f not in dropped]
            print(f"WARNING: dropping {len(late)} out-of-order "
                  f"frame(s) (<= already-consumed #{last_num}): "
                  f"{late[:3]}...", flush=True)
        idle = time.monotonic() - last_new > args.idle_timeout
        if fresh and not (stopping or idle):
            # the newest frame may still be mid-write; hold it back
            # until a newer name appears — on STOP or idle expiry it is
            # consumed rather than stranded (idle means it has been
            # stable on disk for the whole timeout)
            fresh = fresh[:-1]
        if not fresh:
            if stopping or idle:
                break
            time.sleep(args.poll_interval)
            continue
        last_new = time.monotonic()
        stalled = False
        for i in range(0, len(fresh), args.batch_size):
            if not consume(fresh[i: i + args.batch_size]):
                stalled = True
                break  # stalled at a mid-write frame; re-poll
        if stalled:
            # give the writer a real poll interval before the next
            # attempt — without this, the STOP-drain (and any poll where
            # other frames keep arriving) re-scans immediately and burns
            # all 3 decode retries back-to-back within milliseconds,
            # permanently skipping a frame that was merely mid-write
            time.sleep(args.poll_interval)
    clips, rows, forced = backend.finish()
    emit(clips, rows)
    print(f"followed {len(consumed)} frames -> {clip_count} clips "
          f"({forced} forced commits)", flush=True)
    if backend.scoring:
        print(f"scored {event_count} clips live -> {events_path} "
              "(JSONL, one eval row per clip; score with: score-events)",
              flush=True)


def cmd_tune_segment(args):
    """Calibrate the kNN+HMM segmentation grid against manual intervals.

    The reference hand-tuned its HMM transitions, vote thresholds and
    streak/pad rules to one specific random-ViT feature space
    (nba_proj/hmm.py:10, nba_proj/generate_clips_hmm.py:58,155-165,262);
    any backbone change silently invalidates them. This embeds the
    frames once, runs ONE device top-k at the largest k, sweeps the
    cheap host stages over the whole grid, and reports clip-level F1 +
    frame accuracy per combo (segment/tune.py). The JSON output plugs
    straight back in via ``segment --transitions``."""
    import json

    from vit_research_tpu.data import naming
    from vit_research_tpu.data.labels import ManualIntervals
    from vit_research_tpu.segment import tune as tune_mod
    from vit_research_tpu.segment.knn import fused_confidence
    from vit_research_tpu.store.vector_store import PersistentClient

    def grid(name, text):
        vals = [int(x) for x in str(text).split(",") if x != ""]
        if not vals:  # fail BEFORE the engine spins up / frames embed
            raise SystemExit(f"{name} is empty — pass a comma-separated "
                             f"list of integers (got {text!r})")
        return vals

    ks = grid("--k-grid", args.k_grid)
    min_lens = grid("--min-len-grid", args.min_len_grid)
    pads = grid("--pad-grid", args.pad_grid)
    client = PersistentClient(args.db)
    col = client.get_collection(args.corpus_collection)
    corpus = _corpus_from_collection(col)
    space = getattr(col, "space", "l2")
    manual = ManualIntervals.from_csv(args.manual_csv)
    frames = naming.list_frames(args.frames)
    if not frames:
        raise SystemExit(f"no frames found under {args.frames}")
    eng = _engine(batch_size=args.batch_size)
    embs = eng.embed_paths([os.path.join(args.frames, f) for f in frames])

    results, trans, knn = tune_mod.tune_knn_hmm(
        frames, embs, corpus, manual, ks=ks,
        min_lens=min_lens, pads=pads,
        fit_transitions=not args.no_fit_transitions, metric=space,
        iou=args.iou)
    if not results:
        raise SystemExit("empty sweep — check the grids against the "
                         f"corpus size ({len(corpus['labels'])} rows)")

    best = results[0]
    # write-back threshold at the winning k: the sweep's k_max top-k is
    # score-sorted, so its k-prefix IS the k-NN result — no second
    # device top-k (each distinct jit shape costs 60-340 s cold over
    # the tunnel)
    k = best.params["k"]
    fused = fused_confidence(knn["neighbor_labels"][:, :k],
                             knn["neighbor_probs"][:, :k], top_n=k)
    wb = tune_mod.writeback_threshold(
        fused["emissions"], fused["decision"],
        tune_mod.truth_states(manual, frames),
        target_precision=args.target_precision)

    print(f"swept {len(results)} combos over {len(frames)} frames "
          f"(corpus {len(corpus['labels'])} rows, metric {space})")
    print(f"{'f1':>6} {'P':>6} {'R':>6} {'frame_acc':>9}  params")
    for r in results[: args.top]:
        print(f"{r.f1:6.3f} {r.precision:6.3f} {r.recall:6.3f} "
              f"{r.frame_accuracy:9.4f}  {r.params}")
    if wb["threshold"] is not None:
        print(f"write-back threshold >= {wb['threshold']:.2f} gives "
              f"precision {wb['precision']:.4f} at coverage "
              f"{wb['coverage']:.2f} (target {args.target_precision})")
    else:
        best_seen = (f" (best observed: {wb['precision']:.4f} at "
                     f">= {wb['best_threshold']:.2f}, coverage "
                     f"{wb['coverage']:.2f})"
                     if wb.get("best_threshold") is not None else "")
        print("write-back: no threshold on the grid reaches precision "
              f"{args.target_precision} — leave --write-back off"
              f"{best_seen}")

    if args.out:
        payload = {
            "best": best.to_json(),
            "best_transition_matrix":
                trans[best.params["transitions"]].tolist(),
            "transition_matrices":
                {n: m.tolist() for n, m in trans.items()},
            "writeback": wb,
            "metric": space,
            "results": [r.to_json() for r in results],
        }
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {args.out} — apply with: segment --method knn-hmm "
              f"--k {k} --min-len {best.params['min_len']} "
              f"--pad {best.params['pad']} --transitions {args.out}")


def cmd_build_frame_store(args):
    from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index

    recs, chunks = _load_world(args)
    paths = [r["pth"] for r in recs]
    eng = _engine(batch_size=args.batch_size)
    store = FrameStore.build(paths, eng.embed_paths, args.out,
                             batch_size=1024, verbose=True)
    build_chunk_index(chunks, store, args.out)
    labels = [int(c["label"]) for c in chunks]
    n_unlabeled = sum(1 for v in labels if v < 0)
    if args.clip_labels and n_unlabeled == len(chunks) and chunks:
        print(f"WARNING: all {len(chunks)} chunks are unlabeled (-1) — "
              f"the keys in {args.clip_labels} did not match any clip "
              "directory. Label keys must be the clip-dir paths exactly "
              "as resolved from --clip-root (check relative vs absolute).")
    print(f"frame store: {store.n} frames, {len(chunks)} chunks -> "
          f"{args.out} (labels: {len(chunks) - n_unlabeled} labeled, "
          f"{n_unlabeled} unlabeled)")


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


def cmd_write_ratt_db(args):
    from vit_research_tpu.db.builders import write_ratt_chunk_db
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.store.vector_store import PersistentClient

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)
    encode, _ = _stage1_encode(store, idx, args.ckpt, args.run_id)
    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    n = write_ratt_chunk_db(idx, store, encode, col)
    client.flush()
    print(f"wrote {n} chunk embeddings into {args.collection}")


def cmd_eval_clips(args):
    """Per-clip logit sequences + event localization from a trained
    stage-2 run (reference: nba_proj/test/get_clip_sequences.py)."""
    from vit_research_tpu.db.frame_store import FrameStore, load_chunk_index
    from vit_research_tpu.evaluate.clip_sequences import (
        infer_clip_sequences,
        save_results,
    )

    store = FrameStore(args.store).open()
    idx = load_chunk_index(args.store)

    chunks = _chunks_from_index(store, idx, vids=args.vids)
    if not chunks:
        print("no chunks for the requested vids")
        return

    _, encode_chunk = _stage1_encode(store, idx, args.ckpt,
                                     args.stage1_run_id)
    head_apply = _stage2_head(store.dim, args.ckpt, args.stage2_run_id,
                              k_sim=args.k_sim, k_contrast=args.k_contrast,
                              k_temporal=args.k_temporal)

    col = _open_collection(args.db, args.collection)
    rows = infer_clip_sequences(
        chunks, head_apply,
        encode_chunk, col, k_sim=args.k_sim, k_contrast=args.k_contrast,
        k_temporal=args.k_temporal, future_step=args.future_step,
        zeros_query=args.zeros_query, batch_size=16)
    save_results(rows, os.path.join(args.out, "logit_sequences.json"),
                 os.path.join(args.out, "logit_sequences.csv"))
    print(f"wrote {len(rows)} clip rows to {args.out}")


def cmd_score_events(args):
    """Score eval-clips' top-k event localization against the labeled
    events — the number the reference's harness never computed (it
    dumped rankings to JSON and kept results as source comments,
    nba_proj/test/get_clip_sequences.py:569-598,800-813)."""
    import json

    from vit_research_tpu.data.labels import load_event_template
    from vit_research_tpu.evaluate.event_scoring import (
        score_event_localization, truth_events_by_clip)

    with open(args.results) as fh:
        if args.results.endswith(".jsonl"):
            # segment --follow --score-events appends one row per live
            # clip; score the stream output directly
            rows = [json.loads(line) for line in fh if line.strip()]
        else:
            rows = json.load(fh)
    truth = None
    if args.events:
        # load_event_template returns {} for missing files (an optional
        # template elsewhere) — here a typo'd path must not masquerade
        # as an empty template
        if not os.path.exists(args.events):
            raise SystemExit(f"{args.events}: no such file")
        try:
            truth = truth_events_by_clip(load_event_template(args.events))
        except ValueError as e:
            raise SystemExit(f"{args.events}: {e}")
        if not truth:
            raise SystemExit(f"{args.events}: no event_make/event_miss "
                             "intervals found")
    try:
        report = score_event_localization(
            rows, truth, ks=[int(x) for x in args.ks.split(",") if x])
    except ValueError as e:
        raise SystemExit(str(e))

    print(f"scored {report['clips_scored']} clips "
          f"(ground truth: {report['ground_truth']}; "
          f"{report['clips_without_events']} without events, "
          f"{report['clips_without_frame_numbers']} without frame "
          "numbers)")
    for k, v in report["hit_at"].items():
        print(f"  hit@{k}: {v:.4f}" if v is not None else f"  hit@{k}: n/a")
    if "center_error_mean" in report:
        print(f"  top-1 center error: mean {report['center_error_mean']:.1f} "
              f"median {report['center_error_median']:.1f} frames")
    for side, vals in sorted(report["per_side_hit_at"].items()):
        pretty = ", ".join(f"hit@{k}={v:.3f}" for k, v in vals.items()
                           if v is not None)
        print(f"  {side}: {pretty}")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"wrote {args.out}")


def cmd_write_rag_db(args):
    """Frame-level RAG DB from the memmap frame store
    (reference: nba_proj/write_clips_to_ragdb.py:296-391)."""
    from vit_research_tpu.db.builders import write_frame_ragdb
    from vit_research_tpu.db.frame_store import FrameStore
    from vit_research_tpu.store.vector_store import PersistentClient

    recs, _ = _load_world(args)
    store = FrameStore(args.store).open()

    def embed(paths):
        return store.gather_paths([[p] for p in paths])[:, 0]

    client = PersistentClient(args.db)
    col = client.get_or_create_collection(
        args.collection, metadata={"hnsw:space": "cosine"})
    n = write_frame_ragdb(recs, embed, col, batch_size=args.batch_size)
    client.flush()
    print(f"wrote {n} frame embeddings into {args.collection}")


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
    chunks = _chunks_from_index(store, idx)
    train, val = _split_by_vids(chunks, args.train_vids, args.val_vids)

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

        recs, _ = _load_world(args)

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
    chunks = _chunks_from_index(store, idx)
    train, val = _split_by_vids(chunks, args.train_vids, args.val_vids)
    encode_batch, encode_chunk = _stage1_encode(store, idx, args.ckpt,
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
    chunks = _chunks_from_index(store, idx)
    train, val = _split_by_vids(chunks, args.train_vids, args.val_vids)
    _, encode_chunk = _stage1_encode(store, idx, args.ckpt,
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


def main(argv=None):
    # Platform pin: JAX_PLATFORMS in the environment is ignored when a
    # sitecustomize pre-imports jax (backends init lazily, the env is read
    # at import). VRT_PLATFORM=cpu|tpu routes through jax.config instead —
    # e.g. VRT_TINY=1 VRT_PLATFORM=cpu for smoke runs off-device.
    if os.environ.get("VRT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])
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
    ef.add_argument("--start", type=int, default=None,
                    help="inclusive first frame index (the reference "
                         "hardcoded per-game windows)")
    ef.add_argument("--end", type=int, default=None,
                    help="inclusive last frame index")
    ef.set_defaults(fn=cmd_extract_frames)

    sg = sub.add_parser("segment")
    sg.add_argument("frames")
    sg.add_argument("--method", choices=["temporal", "knn-hmm", "streaks"],
                    default="temporal")
    sg.add_argument("--window", type=int, default=50,
                    help="sliding window (streaks method)")
    sg.add_argument("--manual-csv", default=None,
                    help="manual intervals (temporal method)")
    sg.add_argument("--db", default=None,
                    help="vector-store root (knn-hmm method)")
    sg.add_argument("--corpus-collection", default=None,
                    help="labeled frame collection (knn-hmm method)")
    sg.add_argument("--k", type=int, default=50,
                    help="kNN neighbors (knn-hmm method)")
    sg.add_argument("--confidence-threshold", type=float, default=0.7)
    sg.add_argument("--write-back", action="store_true",
                    help="upsert confident frames back into the corpus")
    sg.add_argument("--follow", action="store_true",
                    help="live mode (knn-hmm): tail the frames dir and "
                    "emit clips as they finalize, mid-game")
    sg.add_argument("--socket", default=None,
                    help="--follow through a running `cli serve` daemon "
                    "(unix socket): the daemon's warm engine embeds, its "
                    "collection is the kNN corpus, and --score-events "
                    "runs daemon-side — N games can follow concurrently "
                    "on one chip, no engine spin-up here")
    sg.add_argument("--idle-timeout", type=float, default=30.0,
                    help="--follow: stop after this many seconds with "
                    "no new frames (or on a STOP file)")
    sg.add_argument("--poll-interval", type=float, default=0.5)
    sg.add_argument("--max-lag", type=int, default=512,
                    help="--follow: fixed-lag Viterbi window")
    sg.add_argument("--out", required=True)
    sg.add_argument("--vid", type=int, required=True)
    sg.add_argument("--epochs", type=int, default=3000)
    sg.add_argument("--batch-size", type=int, default=256)
    sg.add_argument("--min-len", type=int, default=100)
    sg.add_argument("--pad", type=int, default=100)
    sg.add_argument("--transitions", default=None,
                    help="JSON with a 3x3 HMM transition matrix (bare "
                    "list or tune-segment output); default is the "
                    "reference's hand-tuned matrix (knn-hmm method)")
    sg.add_argument("--score-events", action="store_true",
                    help="score each clip for make/miss events the "
                    "moment it is written (live in --follow mode): "
                    "chunk + stage-1 encode + live retrieval + stage-2 "
                    "head, one eval row per clip")
    sg.add_argument("--score-ckpt", default=None,
                    help="checkpoint root holding the stage-1/stage-2 "
                    "runs (--score-events)")
    sg.add_argument("--stage1-run-id", default=None,
                    help="trained stage-1 (ChunkEncoder) run under "
                    "--score-ckpt; required with --score-events")
    sg.add_argument("--stage2-run-id", default=None,
                    help="trained stage-2 (RATTHeadV2) run under "
                    "--score-ckpt; required with --score-events")
    sg.add_argument("--score-db", default=None,
                    help="vector-store root of the chunk retrieval "
                    "collection (defaults to --db)")
    sg.add_argument("--score-collection", default=None,
                    help="chunk collection for live retrieval "
                    "(e.g. ratt_db)")
    sg.add_argument("--chunk-size", type=int, default=8)
    sg.add_argument("--chunk-stride", type=int, default=2)
    sg.add_argument("--k-sim", type=int, default=6)
    sg.add_argument("--k-contrast", type=int, default=6)
    sg.add_argument("--k-temporal", type=int, default=4)
    sg.add_argument("--future-step", type=int, default=2)
    sg.set_defaults(fn=cmd_segment)

    tn = sub.add_parser(
        "tune-segment",
        help="calibrate segmentation thresholds against manual intervals")
    tn.add_argument("frames")
    tn.add_argument("--manual-csv", required=True)
    tn.add_argument("--db", required=True)
    tn.add_argument("--corpus-collection", required=True)
    tn.add_argument("--k-grid", default="5,10,25,50")
    tn.add_argument("--min-len-grid", default="50,100,150")
    tn.add_argument("--pad-grid", default="0,50,100")
    tn.add_argument("--iou", type=float, default=0.5,
                    help="IoU for clip-interval matching")
    tn.add_argument("--target-precision", type=float, default=0.99,
                    help="required write-back precision when suggesting "
                    "a confidence threshold")
    tn.add_argument("--no-fit-transitions", action="store_true",
                    help="sweep only the reference transition matrix "
                    "(skip the counting fit from the manual labels)")
    tn.add_argument("--top", type=int, default=10)
    tn.add_argument("--out", default=None, help="JSON report path "
                    "(feed back via segment --transitions)")
    tn.add_argument("--batch-size", type=int, default=256)
    tn.set_defaults(fn=cmd_tune_segment)

    wf = sub.add_parser(
        "write-frame-db",
        help="manually-labeled frames -> labeled frame collection")
    wf.add_argument("frames")
    wf.add_argument("--manual-csv", required=True)
    wf.add_argument("--db", required=True)
    wf.add_argument("--collection", required=True)
    wf.add_argument("--batch-size", type=int, default=128)
    wf.set_defaults(fn=cmd_write_frame_db)

    we = sub.add_parser(
        "write-embeddings",
        help="per-class npz artifacts ({cls}_embeddings.npz)")
    we.add_argument("frames")
    we.add_argument("--manual-csv", required=True)
    we.add_argument("--out-template", required=True,
                    help="e.g. 'out/{cls}_embeddings.npz'")
    we.add_argument("--batch-size", type=int, default=256)
    we.set_defaults(fn=cmd_write_embeddings)

    sl = sub.add_parser(
        "self-label", help="two-pass kNN self-labeling vs a seed corpus")
    sl.add_argument("frames")
    sl.add_argument("--db", required=True)
    sl.add_argument("--collection", required=True)
    sl.add_argument("--out", required=True, help="labels CSV")
    sl.add_argument("--k", type=int, default=25)
    sl.add_argument("--min-votes", type=int, default=20)
    sl.add_argument("--temperature", type=float, default=7.0)
    sl.add_argument("--upsert", action="store_true",
                    help="write accepted pass-1 frames back to the corpus")
    sl.add_argument("--batch-size", type=int, default=256)
    sl.set_defaults(fn=cmd_self_label)

    fc = sub.add_parser(
        "finalize-clips", help="per-clip kNN+HMM refinement")
    fc.add_argument("--clips", required=True, help="clip-dirs root")
    fc.add_argument("--db", required=True)
    fc.add_argument("--collection", required=True,
                    help="labeled frame collection for the kNN vote")
    fc.add_argument("--out", required=True)
    fc.add_argument("--k", type=int, default=5)
    fc.add_argument("--batch-size", type=int, default=256)
    fc.set_defaults(fn=cmd_finalize_clips)

    mc = sub.add_parser(
        "merge-clips", help="merge adjacent same-side clips")
    mc.add_argument("--clips", required=True, help="clip-dirs root")
    mc.add_argument("--frame-pool", required=True,
                    help="full frame dir to rebuild merged clips from")
    mc.add_argument("--out", required=True)
    mc.add_argument("--max-gap", type=int, default=30)
    mc.set_defaults(fn=cmd_merge_clips)

    cl = sub.add_parser(
        "clustering",
        help="class-mean separation + kmeans + side-MLP training")
    cl.add_argument("--db", required=True)
    cl.add_argument("--collection", required=True)
    cl.add_argument("--out", required=True, help="side classifier npz")
    cl.add_argument("--epochs", type=int, default=50)
    cl.add_argument("--batch-size", type=int, default=64)
    cl.add_argument("--seed", type=int, default=0)
    cl.set_defaults(fn=cmd_clustering)

    ft = sub.add_parser(
        "fresh-test",
        help="classify unseen frames into left/right/none dirs")
    ft.add_argument("frames")
    ft.add_argument("--params", required=True,
                    help="side classifier npz from 'clustering'")
    ft.add_argument("--out", required=True)
    ft.add_argument("--batch-size", type=int, default=256)
    ft.set_defaults(fn=cmd_fresh_test)

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
    # Reference stage-1 hyperparameters
    # (reference: nba_proj/train/train_chunk_encoder.py:23-24).
    t1.add_argument("--lr", type=float, default=5e-5)
    t1.add_argument("--weight-decay", type=float, default=5e-4)
    t1.add_argument("--run-id", default=None,
                    help="name the run dir (required to --resume it later)")
    t1.add_argument("--resume", action="store_true",
                    help="continue --run-id's latest checkpoint")
    t1.set_defaults(fn=cmd_train_stage1)

    wr = sub.add_parser("write-ratt-db")
    wr.add_argument("--store", required=True)
    wr.add_argument("--ckpt", required=True)
    wr.add_argument("--db", required=True)
    wr.add_argument("--collection", default="ratt_db")
    wr.add_argument("--run-id", default=None)
    wr.set_defaults(fn=cmd_write_ratt_db)

    def split_args(sp):
        sp.add_argument("--train-vids", type=int, nargs="+", required=True)
        sp.add_argument("--val-vids", type=int, nargs="+", required=True)

    wg = sub.add_parser("write-rag-db")
    world_args(wg)
    wg.add_argument("--store", required=True)
    wg.add_argument("--db", required=True)
    wg.add_argument("--collection", default="ragdb")
    wg.add_argument("--batch-size", type=int, default=256)
    wg.set_defaults(fn=cmd_write_rag_db)

    tr = sub.add_parser("train-rag")
    split_args(tr)
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

    tc = sub.add_parser("train-cached")
    split_args(tc)
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
    split_args(t2)
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

    sev = sub.add_parser(
        "score-events",
        help="score eval-clips' top-k event localization (hit@k, "
        "center error)")
    sev.add_argument("results", help="logit_sequences.json from eval-clips")
    sev.add_argument("--events", default=None,
                     help="clip_labelling_template.json; omitted -> the "
                     "rows' own chunk status_id ground truth")
    sev.add_argument("--ks", default="1,3,5")
    sev.add_argument("--out", default=None, help="JSON report path")
    sev.set_defaults(fn=cmd_score_events)

    rb = sub.add_parser(
        "rebuild-db", help="standalone frame-level DB rebuild")
    world_args(rb)
    rb.add_argument("--store", required=True)
    rb.add_argument("--db", required=True)
    rb.add_argument("--collection", default="ragdb")
    rb.add_argument("--ckpt", default=None)
    rb.add_argument("--run-id", default=None,
                    help="train-rag run whose ProjectionHead re-projects "
                         "the embeddings")
    rb.add_argument("--batch-size", type=int, default=256)
    rb.add_argument("--notify-socket", default=None,
                    help="after the rebuild, hot-reload the collection "
                         "in the serve daemon on this socket (its "
                         "followers keep their warm engine)")
    rb.set_defaults(fn=cmd_rebuild_db)

    se = sub.add_parser(
        "search", help="embed frames (or .npz rows) and print neighbors")
    se.add_argument("frames", nargs="*", help="frame image paths")
    se.add_argument("--db", required=True)
    se.add_argument("--collection", required=True)
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--where", default=None,
                    help='metadata filter as JSON, e.g. \'{"side": "left"}\'')
    se.add_argument("--npz", default=None,
                    help="query embeddings from an .npz instead of frames")
    se.add_argument("--npz-key", default=None)
    se.add_argument("--batch-size", type=int, default=256)
    se.set_defaults(fn=cmd_search)

    di = sub.add_parser("db-info",
                        help="inspect a vector-store root's collections")
    di.add_argument("db")
    di.add_argument("--compact", action="store_true",
                    help="merge each collection's append-log into a "
                         "fresh snapshot")
    di.set_defaults(fn=cmd_db_info)

    mt = sub.add_parser("metrics", help="inspect run metrics.jsonl ledgers")
    mt.add_argument("dir", help="a run dir (prints the curve) or a "
                    "checkpoint root (summarizes every run)")
    mt.add_argument("--csv", default=None,
                    help="export a single run's curve to CSV")
    mt.set_defaults(fn=cmd_metrics)

    sv = sub.add_parser(
        "serve", help="warm embedding/retrieval daemon on a unix socket")
    sv.add_argument("--socket", required=True)
    sv.add_argument("--batch-size", type=int, default=256)
    sv.add_argument("--db", default=None)
    sv.add_argument("--collection", default=None)
    sv.add_argument("--shard-device", action="store_true",
                    help="shard the collection's device corpus across "
                         "all local chips (exact results; >1-chip-HBM "
                         "capacity — ops/sharded_topk.py)")
    sv.add_argument("--coalesce-ms", type=float, default=2.0,
                    help="micro-batch concurrent embed requests arriving "
                         "within this window into one device batch "
                         "(0 disables)")
    sv.set_defaults(fn=cmd_serve)

    sc = sub.add_parser(
        "serve-ctl", help="operate a running serve daemon: ping, stats, "
                          "reload (hot-swap the collection from disk), "
                          "shutdown")
    sc.add_argument("op", choices=["ping", "stats", "reload", "shutdown"])
    sc.add_argument("--socket", required=True)
    sc.add_argument("--timeout", type=float, default=None,
                    help="reply wait in seconds (default: 300 for reload "
                         "— a big collection takes a while to reopen — "
                         "60 otherwise)")
    sc.add_argument("--db", default=None,
                    help="reload only: store root to reload from "
                         "(default: the daemon's own --db)")
    sc.add_argument("--collection", default=None,
                    help="reload only: collection name "
                         "(default: the daemon's own --collection)")
    sc.set_defaults(fn=cmd_serve_ctl)

    args = p.parse_args(argv)
    try:
        args.fn(args)
    except BrokenPipeError:
        # `cli ... | head` closed our stdout early — exit quietly like
        # any well-behaved unix filter instead of dumping a traceback.
        # Safe to scope this broadly because the daemon socket clients
        # (serve.py) re-raise their pipe errors as plain ConnectionError
        # — a dead daemon can never land here and masquerade as success.
        # Redirect stdout to devnull: the interpreter's exit-time flush
        # (and the finally below) would otherwise raise a SECOND
        # BrokenPipeError after this handler.
        import sys

        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
    finally:
        # VRT_PROFILE=1: per-stage span report (embed.decode/dispatch/
        # readback, store.query, ... — utils/profiling.py).
        from vit_research_tpu.utils.profiling import print_global_report

        try:
            print_global_report()
        except BrokenPipeError:
            # the pipe can also close AFTER the command's own output
            # succeeded — the report has nowhere to go, same quiet exit
            pass


if __name__ == "__main__":
    main()
