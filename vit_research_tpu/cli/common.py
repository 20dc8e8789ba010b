"""Shared CLI plumbing: engine construction, world loading, stage-1/2
restores, and the small helpers every command arc uses. Tests monkeypatch
here (e.g. ``cli.common._engine``); arc modules resolve helpers through
this module at call time so those patches take effect."""

from __future__ import annotations

import os


def _engine(preset: str = "hf", batch_size: int = 256):
    """VRT_TINY=1 swaps in a small random ViT (CI / smoke runs).

    VRT_TOME_R=<int> enables token merging (ops/tome.py) in the frame
    embedder — a speed/accuracy trade (r=13 measured +33% throughput on
    v5e), OFF by default because merged embeddings drift from the
    reference-parity outputs. VRT_GEMM_QUANT=int8 likewise swaps the
    encoder GEMMs for dynamic int8 (ops/quant.py); 'int8-static'
    additionally needs VRT_GEMM_SCALES=<json file> of calibrated
    per-site activation scales (examples/bench_int8_static.py
    --calibrate-only) and removes the dynamic path's per-GEMM abs-max
    pass. The quant modes compose with tome_r. All embeddings a
    pipeline compares must come from the same settings.

    VRT_GRAYSCALE=1 embeds luminance-converted frames — the reference's
    USE_GRAYSCALE ablation constant as an env toggle (reference:
    nba_proj/db_maintainence/db_rebuild_chunk.py:101-115,
    nba_proj/train/training_chunk_cached.py:473-505). Like the reference
    toggle it changes the feature space globally: every embedding a
    pipeline compares must be produced with the same setting."""
    env = _engine_env()
    if os.environ.get("VRT_TINY"):
        from vit_research_tpu.data.preprocess import PreprocessSpec
        from vit_research_tpu.models.vit import init_vit
        from vit_research_tpu.parallel.embed import EmbeddingEngine

        cfg = _tiny_vit_config(env)
        model, params = init_vit(cfg, seed=0)
        return EmbeddingEngine(model, params,
                               PreprocessSpec(size=(32, 32),
                                              grayscale=env["grayscale"]),
                               batch_size=min(batch_size, 16),
                               use_fused_patch_embed=False)
    from vit_research_tpu.parallel.embed import make_hf_frame_embedder

    return make_hf_frame_embedder(batch_size=batch_size,
                                  tome_r=env["tome_r"],
                                  gemm_quant=env["gemm_quant"],
                                  gemm_quant_scales=env["gemm_scales"],
                                  grayscale=env["grayscale"])


def _engine_env(require_scales: bool = True) -> dict:
    """Parse the embedding env toggles ONCE for every consumer
    (engine construction, calibrate-int8, engine_profile): tome_r (int),
    gemm_quant, gemm_scales (loaded + validated from VRT_GEMM_SCALES
    when quant is int8-static), grayscale. ``require_scales=False``
    skips the scales-file requirement — calibrate-int8 runs BEFORE the
    file exists (it produces it)."""
    raw_tome = os.environ.get("VRT_TOME_R", "").strip()
    try:
        tome_r = int(raw_tome) if raw_tome else 0
    except ValueError:
        raise SystemExit(
            f"VRT_TOME_R must be an integer, got {raw_tome!r}")
    gemm_quant = os.environ.get("VRT_GEMM_QUANT", "").strip() or None
    if gemm_quant not in (None, "int8", "int8-static"):
        raise SystemExit(
            f"VRT_GEMM_QUANT must be 'int8', 'int8-static' or unset, "
            f"got {gemm_quant!r}")
    gemm_scales: tuple = ()
    if gemm_quant == "int8-static" and require_scales:
        # Static scales come from an offline calibration run
        # (cli calibrate-int8, or examples/bench_int8_static.py
        # --calibrate-only); the engine cannot calibrate here — eager
        # forwards over a TPU tunnel cost minutes, and silent
        # auto-calibration would bake whatever batch happened first.
        scales_path = os.environ.get("VRT_GEMM_SCALES", "").strip()
        if not scales_path:
            raise SystemExit(
                "VRT_GEMM_QUANT=int8-static needs VRT_GEMM_SCALES="
                "<scales.json> (produce it with cli calibrate-int8)")
        import json

        try:
            with open(scales_path) as f:
                loaded = json.load(f)
        except (OSError, ValueError) as e:
            raise SystemExit(f"VRT_GEMM_SCALES {scales_path!r}: {e}")
        raw_scales = (loaded.get("scales")
                      if isinstance(loaded, dict) else loaded)
        try:
            gemm_scales = tuple(float(s) for s in raw_scales)
        except (TypeError, ValueError):
            raise SystemExit(
                f"VRT_GEMM_SCALES {scales_path!r} must hold a list of "
                "floats (or an object with a 'scales' list)")
        if not gemm_scales:
            raise SystemExit(f"VRT_GEMM_SCALES {scales_path!r} is empty")
    grayscale = os.environ.get("VRT_GRAYSCALE", "").strip() not in ("", "0")
    return {"tome_r": tome_r, "gemm_quant": gemm_quant,
            "gemm_scales": gemm_scales, "grayscale": grayscale}


def _tiny_vit_config(env: dict):
    """The ONE tiny test-ViT configuration (VRT_TINY), shared by
    _engine and calibrate-int8 so calibration and the engine can never
    drift apart architecturally."""
    from vit_research_tpu.utils.configs import ViTConfig

    return ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                     num_layers=1, num_heads=2, mlp_dim=64,
                     use_flash_attention=False, tome_r=env["tome_r"],
                     gemm_quant=env["gemm_quant"],
                     gemm_quant_scales=env["gemm_scales"])


def engine_profile() -> str:
    """Canonical string for the CURRENT embedding settings (the env
    toggles _engine reads): collections stamp it at write time
    (vector_store.Collection.stamp_embedding_profile) and read-side
    commands warn when querying across profiles — embeddings from
    different settings live in different spaces and rank garbage
    against each other."""
    env = _engine_env()
    quant = env["gemm_quant"] or "none"
    if env["gemm_quant"] == "int8-static":
        # Two int8-static engines with DIFFERENT calibration files are
        # different embedding spaces (measured: random- vs
        # representative-calibrated scales differ by cosine ~0.988) —
        # fold the scale VALUES into the profile so the fence sees it.
        import hashlib

        digest = hashlib.sha256(
            ",".join(f"{s:.9e}" for s in env["gemm_scales"])
            .encode()).hexdigest()[:8]
        quant = f"int8-static:{digest}"
    gray = "1" if env["grayscale"] else "0"
    tiny = "tiny|" if os.environ.get("VRT_TINY") else ""
    return f"{tiny}tome{env['tome_r']}|quant-{quant}|gray{gray}"


def check_embedding_profile(col, what: str = "collection") -> None:
    """Warn (stderr) when querying a collection whose stored profile
    differs from the current engine settings. A warning, not an error:
    cross-profile reads are usually a misconfiguration but measurement
    harnesses do it deliberately (quality_fast_profile)."""
    import sys

    stored = getattr(col, "embedding_profile", None)
    current = engine_profile()
    if stored is not None and stored != current:
        print(
            f"WARNING: {what} {getattr(col, 'name', '?')!r} was built "
            f"with embedding profile {stored!r} but this command runs "
            f"{current!r} (VRT_TOME_R/VRT_GEMM_QUANT/VRT_GRAYSCALE) — "
            "distances across profiles are not comparable; rebuild the "
            "collection or match the settings",
            file=sys.stderr, flush=True)


def _stamp_profile(col, profile=None) -> None:
    """Writer-side stamp (vector_store.stamp_embedding_profile) with the
    CLI error convention: a profile mismatch is a clean SystemExit, not
    a traceback."""
    try:
        col.stamp_embedding_profile(profile if profile is not None
                                    else engine_profile())
    except ValueError as e:
        raise SystemExit(str(e))


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


def _labeled_frames(frames_dir: str, manual_csv: str):
    """Sorted frame names with manual-interval side labels ('ignore' for
    unlabeled)."""
    from vit_research_tpu.data import naming
    from vit_research_tpu.data.labels import ManualIntervals

    frames = naming.list_frames(frames_dir)
    mi = ManualIntervals.from_csv(manual_csv)
    return frames, [mi.class_from_frame(f) for f in frames]


def _corpus_from_collection(col, *, check_profile: bool = True):
    """CLI shim over segment/knn.py::corpus_from_collection: same corpus
    dict, ValueError surfaced as a clean exit instead of a traceback.
    ``check_profile`` warns when the stored rows were embedded under a
    different profile than the current env (the queries about to be
    ranked against them would live in a different space); pass False on
    surfaces that rank nothing new against the corpus (clustering)."""
    from vit_research_tpu.segment.knn import corpus_from_collection

    if check_profile:
        check_embedding_profile(col, what="corpus collection")
    try:
        return corpus_from_collection(col)
    except ValueError as e:
        raise SystemExit(str(e))


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


def world_args(sp):
    sp.add_argument("--clip-root", dest="clip_root", required=True)
    sp.add_argument("--vids", type=int, nargs="+", required=True)
    sp.add_argument("--clip-labels", dest="clip_labels", default=None)
    sp.add_argument("--event-template", dest="event_template",
                    default=None)
    sp.add_argument("--chunk-size", type=int, default=8)
    sp.add_argument("--chunk-stride", type=int, default=2)


def split_args(sp):
    sp.add_argument("--train-vids", type=int, nargs="+", required=True)
    sp.add_argument("--val-vids", type=int, nargs="+", required=True)
