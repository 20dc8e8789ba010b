"""Quality dossier for the FAST (non-parity) embedding profile.

VERDICT r3 item 2: the levers that actually meet BASELINE's speed
targets — ToMe token merging (r=8/13/16: +6/+33/+54% embed throughput)
and strided embedding (stride 4: 5,992 effective f/s) — were justified
only by published ImageNet numbers, never by THIS pipeline's own
metrics. This harness measures them (and the never-measured
ToMe+strided composite) on a synthetic world with the production
ViT-B/16 graph, CPU-only, against four downstream metrics:

  fidelity      per-frame cosine vs the parity embedding (both L2)
  segmentation  kNN+HMM clip F1 + boundary drift (frames) vs manual
                truth — corpus AND queries from the variant (the
                homogeneous fast deployment)
  retrieval     top-k id overlap vs parity queries against a
                PARITY-built chunk store (the train-at-parity /
                serve-fast deployment) through the trained stage-1
                encoder
  events        hit@1 / hit@3 + center error of stage-2 event
                localization (evaluate/event_scoring) with a stack
                trained ONCE at parity, scoring live clips through the
                variant embeddings — the `segment --score-events`
                deployment

The world encodes possessions exactly like data/synthetic.py
(side-dependent brightness + tint) plus a VISUAL event signal the
reference world lacks: a 6-frame "shot" span per possession marked with
a label-dependent block (make: top, miss: bottom), so a trained stage-2
head can genuinely localize and hit@k measures signal preservation, not
noise. Results append one JSON line per variant to --out and a summary
line to stdout; BENCH_NOTES.md carries the table.

Runtime: ~30-45 min at the default size on the 1-core box (the ViT-B/16
CPU forward is ~1.2 s/frame; ToMe/strided variants are cheaper).
--tiny swaps in the 1-layer test ViT for a seconds-long smoke run
(tests/test_quality_fast_profile.py).

STATISTICAL POWER: the default 4 possessions/vid score only 4 event
clips (hit@k quanta of 0.25 — round-4 conclusions drawn at that n did
not survive re-measurement). The round-5 reference configuration is
``--possessions 24`` with ``--only`` trimmed to the deployment
variants (~60-100 min/world): 24 scored clips, hit@k quanta 1/24.
BENCH_NOTES.md "Dossier at statistical power" carries those tables.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mark(msg: str) -> None:
    print(f"[quality] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------- world


def _frame(vid, fnum, side, event, size, rng, entropy="low"):
    from vit_research_tpu.data.synthetic import synth_frame

    img = synth_frame(vid, fnum, side, size, rng).astype(np.int32)
    if entropy == "high":
        # Adversarial content for token merging: full-range iid pixel
        # noise blended 50% makes every 16x16 patch token DISTINCT, so
        # ToMe cannot find redundant tokens and must merge dissimilar
        # ones — the worst case for merging quality. The default world's
        # large uniform regions are ToMe's best case; measuring both
        # brackets real footage.
        noise = rng.integers(0, 256, size=img.shape)
        img = (img + noise) // 2
    if event is not None:  # label-dependent marker: make=top, miss=bottom
        h, w = size
        bh, bw = max(h // 4, 4), max(w // 4, 4)
        r0 = 0 if event else h - bh
        c0 = (w - bw) // 2
        img[r0:r0 + bh, c0:c0 + bw] = 245
    return np.minimum(img, 255).astype(np.uint8)


def build_world(root, vids=(1, 2), possessions=4, frames_per=32, gap=6,
                lead=4, event_start=18, event_len=6, size=(112, 112),
                entropy="low"):
    """Frames dirs + clip dirs + labels + event template + manual truth.

    Each vid: ``lead`` none frames, then ``possessions`` alternating
    left/right runs of ``frames_per`` frames separated by ``gap`` none
    frames, then ``lead`` none frames. Possession p carries label p%2
    (1=make) and a visual event on frames [event_start, event_start +
    event_len) of the possession."""
    from PIL import Image

    from vit_research_tpu.data import labels as labels_mod
    from vit_research_tpu.data import naming

    world = {"frames": {}, "clip_labels": {}, "events": {},
             "clip_ranges": {}, "manual": labels_mod.ManualIntervals()}
    for vid in vids:
        fdir = os.path.join(root, f"frames_{vid}")
        os.makedirs(fdir, exist_ok=True)
        rng = np.random.default_rng(vid)
        paths, fnum = [], 1

        def emit(side, n, event_span=None, label=None):
            nonlocal fnum
            first = fnum
            for i in range(n):
                ev = (label == 1 if event_span is not None
                      and event_span[0] <= i < event_span[1] else None)
                img = _frame(vid, fnum, side, ev, size, rng,
                             entropy=entropy)
                p = os.path.join(fdir, naming.frame_name(vid, fnum))
                Image.fromarray(img).save(p, quality=90)
                paths.append(p)
                fnum += 1
            world["manual"].intervals[side].append((vid, first, fnum - 1))
            return first

        emit("none", lead)
        for p in range(possessions):
            side = ("left", "right")[p % 2]
            label = p % 2  # alternate make/miss like make_mini_dataset
            first = emit(side, frames_per,
                         event_span=(event_start, event_start + event_len),
                         label=label)
            # clip dir: the same frames re-rendered under the clip name
            croot = os.path.join(root, f"clips_hmm_smooth_{vid}_smart")
            cdir = os.path.join(croot, naming.clip_dir_name(vid, p, side))
            os.makedirs(cdir, exist_ok=True)
            for k in range(frames_per):
                os.link(paths[first - 1 + k],
                        os.path.join(cdir, naming.frame_name(vid,
                                                             first + k)))
            world["clip_labels"][cdir] = label
            ev0 = first + event_start
            key = "event_make" if label == 1 else "event_miss"
            world["events"][cdir] = {
                "event_make": [], "event_miss": [], "event_none": [],
                key: [[ev0, ev0 + event_len - 1]]}
            world["clip_ranges"][(vid, p)] = (first, side,
                                              paths[first - 1:
                                                    first - 1 + frames_per])
            if p < possessions - 1:
                emit("none", gap)
        emit("none", lead)
        world["frames"][vid] = paths
    world["clip_template"] = os.path.join(root, "clips_hmm_smooth_{vid}_smart")
    return world


# ------------------------------------------------------------- variants


def build_engine(tome_r: int, *, tiny: bool, batch_size: int = 16,
                 quant: str | None = None, calib_paths=()):
    """``quant='int8-static'`` calibrates eagerly here on
    REPRESENTATIVE world frames (``calib_paths``) and bakes the scales —
    the dossier variant of the +16% throughput lever. Calibration
    coverage MATTERS: random-pixel calibration measured fidelity 0.9884
    on this world's structured frames vs 0.99986 with representative
    frames (BENCH_NOTES 'static-int8 calibration coverage')."""
    import dataclasses

    if tiny:
        from vit_research_tpu.data.preprocess import PreprocessSpec
        from vit_research_tpu.models.vit import init_vit
        from vit_research_tpu.parallel.embed import EmbeddingEngine
        from vit_research_tpu.utils.configs import ViTConfig

        cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=64,
                        num_layers=2, num_heads=2, mlp_dim=128,
                        use_flash_attention=False, tome_r=tome_r)
        spec = PreprocessSpec(size=(32, 32))
        if quant:
            cfg = dataclasses.replace(cfg, gemm_quant=quant)
            cfg = _calibrate(cfg, spec, calib_paths)
        model, params = init_vit(cfg, seed=0)
        return EmbeddingEngine(model, params, spec,
                               batch_size=batch_size,
                               use_fused_patch_embed=False)
    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.parallel.embed import make_hf_frame_embedder

    scales = ()
    if quant == "int8-static":
        cfg = dataclasses.replace(HF_VIT_B16_224, tome_r=tome_r,
                                  gemm_quant=quant)
        scales = _calibrate(cfg, HF_VIT_SPEC, calib_paths).gemm_quant_scales
    return make_hf_frame_embedder(batch_size=batch_size, tome_r=tome_r,
                                  gemm_quant=quant,
                                  gemm_quant_scales=scales)


def _calibrate(cfg, spec, calib_paths):
    """One eager calibration forward on representative frames -> cfg
    with gemm_quant_scales filled."""
    import dataclasses

    from vit_research_tpu.data.preprocess import load_frames
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.ops.quant import calibration_mode

    if not calib_paths:
        raise ValueError("int8-static calibration needs representative "
                         "frames (calib_paths)")
    model, params = init_vit(cfg, seed=0)
    imgs = load_frames(list(calib_paths), spec)
    mark(f"calibrating int8-static scales (tome_r={cfg.tome_r}, "
         f"{len(imgs)} representative frames, eager)")
    with calibration_mode() as scales:
        model.apply(params, imgs)
    return dataclasses.replace(cfg, gemm_quant_scales=tuple(scales))


def variant_defs(tiny: bool):
    """(name, tome_r, stride, quant, refine) — tome radii shrink in
    --tiny mode (the 2-layer 17-token test ViT can't merge 16/layer);
    refine='auto' is the novelty-gated strided refinement
    (embed_video_strided refine_threshold, the fix for strided's
    adversarial-world event-localization collapse)."""
    if tiny:
        return [("parity", 0, 1, None, None), ("tome2", 2, 1, None, None),
                ("strided2", 0, 2, None, None),
                ("strided2_refined", 0, 2, None, "auto"),
                ("tome2_strided2", 2, 2, None, None),
                ("int8static", 0, 1, "int8-static", None)]
    return [("parity", 0, 1, None, None), ("tome8", 8, 1, None, None),
            ("tome13", 13, 1, None, None), ("tome16", 16, 1, None, None),
            ("strided4", 0, 4, None, None),
            ("strided4_refined", 0, 4, None, "auto"),
            ("tome16_strided4", 16, 4, None, None),
            ("int8static", 0, 1, "int8-static", None),
            ("tome16_int8static", 16, 1, "int8-static", None),
            ("tome16_int8static_strided4", 16, 4, "int8-static", None),
            ("tome16_int8static_strided4r", 16, 4, "int8-static", "auto")]


def embed_variant(engines, tome_r, stride, quant, paths, refine=None,
                  stats=None):
    from vit_research_tpu.parallel.embed import (REFINE_THRESHOLD_DEFAULT,
                                                 embed_video_strided)

    eng = engines[(tome_r, quant)]
    if stride == 1:
        return np.asarray(eng.embed_paths(paths), np.float32)
    thresh = REFINE_THRESHOLD_DEFAULT if refine == "auto" else refine
    return np.asarray(
        embed_video_strided(eng, paths, stride=stride,
                            refine_threshold=thresh, stats=stats),
        np.float32)


# -------------------------------------------------------------- metrics


def _matched_pairs(pred, true, iou=0.5):
    from vit_research_tpu.segment.tune import _iou

    pairs = sorted(((_iou(p, t), i, j) for i, p in enumerate(pred)
                    for j, t in enumerate(true) if p.side == t.side),
                   key=lambda x: -x[0])
    used_p, used_t, out = set(), set(), []
    for score, i, j in pairs:
        if score < iou:
            break
        if i in used_p or j in used_t:
            continue
        used_p.add(i)
        used_t.add(j)
        out.append((pred[i], true[j]))
    return out


def segmentation_metrics(world, embs_by_vid, train_vid, eval_vid, *, k=15,
                         min_len=16):
    """Homogeneous fast deployment: corpus (labels from manual truth of
    ``train_vid``) and queries both from the variant's embeddings."""
    from vit_research_tpu.segment.hmm import STATES
    from vit_research_tpu.segment.pipeline import segment_with_knn_hmm
    from vit_research_tpu.segment.tune import (interval_prf, truth_intervals,
                                               truth_states)

    names = {v: [os.path.basename(p) for p in world["frames"][v]]
             for v in (train_vid, eval_vid)}
    t_train = truth_states(world["manual"], names[train_vid])
    labeled = t_train >= 0
    probs = np.full((int(labeled.sum()), 3), 0.05, np.float32)
    probs[np.arange(len(probs)), t_train[labeled]] = 0.9
    corpus = {"embeddings": embs_by_vid[train_vid][labeled],
              "labels": t_train[labeled], "probs": probs}
    decoded, _, _ = segment_with_knn_hmm(
        names[eval_vid], embs_by_vid[eval_vid], corpus, k=k,
        metric="cosine")
    from vit_research_tpu.segment.clips import decoded_runs

    pred = [r for r in decoded_runs(decoded)
            if r.side in ("left", "right") and r.end - r.start + 1 >= min_len]
    t_eval = truth_states(world["manual"], names[eval_vid])
    true = truth_intervals(t_eval)
    prf = interval_prf(pred, true)
    acc = float((np.array([STATES.index(d) if d in STATES else -2
                           for d in decoded]) == t_eval)[t_eval >= 0].mean())
    pairs = _matched_pairs(pred, true)
    drift = (float(np.mean([(abs(p.start - t.start) + abs(p.end - t.end)) / 2
                            for p, t in pairs])) if pairs else None)
    return {"clip_f1": round(prf["f1"], 3),
            "clip_precision": round(prf["precision"], 3),
            "clip_recall": round(prf["recall"], 3),
            "frame_accuracy": round(acc, 3),
            "boundary_drift_frames": (None if drift is None
                                      else round(drift, 1)),
            "n_pred": prf["n_pred"], "n_true": prf["n_true"]}


def chunk_embs(chunks, frame_emb_lookup, encode_batch):
    """(N, D) trained-stage-1 chunk embeddings from per-frame lookups."""
    gathered = np.stack([
        np.stack([frame_emb_lookup[os.path.basename(p)] for p in ch["frames"]])
        for ch in chunks])
    emb, _ = encode_batch(gathered)
    emb = np.asarray(emb, np.float32)
    return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)


def retrieval_overlap(store_embs, parity_q, variant_q, *, top_k=8):
    """Mean fraction of shared ids in top-k between parity and variant
    queries against the same (parity-built) store."""
    def topk_ids(q):
        scores = q @ store_embs.T
        return np.argsort(-scores, axis=1)[:, :top_k]

    a, b = topk_ids(parity_q), topk_ids(variant_q)
    return float(np.mean([len(set(r1) & set(r2)) / top_k
                          for r1, r2 in zip(a, b)]))


# ------------------------------------------------------------------ main


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="1-layer test ViT, seconds (smoke/CI)")
    ap.add_argument("--out", default=None, help="JSONL results path")
    ap.add_argument("--root", default=None)
    ap.add_argument("--possessions", type=int, default=4)
    ap.add_argument("--frames-per", type=int, default=32)
    ap.add_argument("--stage2-epochs", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to measure "
                         "(parity is always included as the baseline)")
    ap.add_argument("--world-entropy", choices=["low", "high"],
                    default="low",
                    help="'high' blends full-range iid pixel noise into "
                         "every frame — adversarial for token merging "
                         "(every patch token distinct); 'low' is the "
                         "default block-structured world (ToMe's best "
                         "case). Measure both to bracket real footage.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import optax

    from vit_research_tpu.data.chunks import build_chunks
    from vit_research_tpu.data.samples import load_samples
    from vit_research_tpu.evaluate.event_scoring import (
        score_event_localization, truth_events_by_clip)
    from vit_research_tpu.evaluate.live import LiveEventScorer
    from vit_research_tpu.models.heads import ChunkEncoder
    from vit_research_tpu.retrieval import cache_stage2 as CS
    from vit_research_tpu.store.vector_store import PersistentClient
    from vit_research_tpu.train import train_chunk_encoder as TCE
    from vit_research_tpu.train.train_stage2 import train_stage2
    from vit_research_tpu.utils.configs import (ChunkEncoderConfig,
                                                ExperimentConfig, HeadConfig,
                                                RetrievalConfig, TrainConfig)

    root = args.root or tempfile.mkdtemp(prefix="vrt_quality_")
    t_start = time.monotonic()
    size = (32, 32) if args.tiny else (112, 112)
    cs, cstride = (6, 3) if args.tiny else (8, 4)
    ks, kc, kt = 3, 3, 2
    mark(f"building world under {root}")
    world = build_world(root, possessions=args.possessions,
                        frames_per=args.frames_per, size=size,
                        event_start=(2 if args.tiny else 18),
                        event_len=(3 if args.tiny else 6),
                        entropy=args.world_entropy)

    samples = load_samples([1, 2], world["clip_template"],
                           world["clip_labels"], world["events"])
    chunks = build_chunks(samples, chunk_size=cs, chunk_stride=cstride)
    train_chunks = [c for c in chunks if c["vid"] == 1]
    eval_chunks = [c for c in chunks if c["vid"] == 2]
    mark(f"{len(train_chunks)} train / {len(eval_chunks)} eval chunks")

    defs = variant_defs(args.tiny)
    if args.only:
        want = {v.strip() for v in args.only.split(",")} | {"parity"}
        known = {d[0] for d in defs}
        unknown = want - known
        if unknown:
            raise SystemExit(
                f"--only: unknown variant(s) {sorted(unknown)} "
                f"(have: {sorted(known)})")
        defs = [d for d in defs if d[0] in want]
    # Sub-stride event guard (mirrors cli segment --event-template): a
    # variant whose stride exceeds the shortest labeled event cannot
    # localize it — by interpolation OR refinement — so its event rows
    # would be structurally, not statistically, degraded.
    from vit_research_tpu.evaluate.event_scoring import min_event_span
    _span = min_event_span(world["events"])
    for _name, _r, _stride, _q, _refine in defs:
        if _span is not None and _stride > _span:
            mark(f"WARNING: variant {_name} stride {_stride} exceeds the "
                 f"shortest labeled event ({_span} frames): sub-stride "
                 "events are invisible (deployment rule: stride <= "
                 "shortest event)")
    engines = {}
    # Calibration frames: per vid-1 possession, its first frame (side
    # signal) AND a mid-event frame (the marker block) — the two
    # activation regimes scoring will see; vid 2 stays held out.
    # (Calibration coverage matters — see build_engine; an even [::N]
    # stride missed every event span.)
    calib_paths = []
    for (vid, _clip), (_first, _side, cpaths) in sorted(
            world["clip_ranges"].items()):
        if vid != 1:
            continue
        mid_event = min((2 if args.tiny else 18) + 2, len(cpaths) - 1)
        calib_paths += [cpaths[0], cpaths[mid_event]]
    for _, r, _, q, _ in defs:
        if (r, q) not in engines:
            engines[(r, q)] = build_engine(r, tiny=args.tiny, quant=q,
                                           calib_paths=calib_paths)
    dim = engines[(0, None)].out_dim

    # ---- per-variant frame embeddings (both vids; ~1.2 s/frame parity)
    embs, refine_stats = {}, {}
    for name, r, stride, q, refine in defs:
        t0 = time.monotonic()
        st = {1: {}, 2: {}}
        embs[name] = {v: embed_variant(engines, r, stride, q,
                                       world["frames"][v], refine=refine,
                                       stats=st[v]) for v in (1, 2)}
        if refine is not None:
            refine_stats[name] = {
                "gaps": st[1].get("gaps", 0) + st[2].get("gaps", 0),
                "keys": st[1].get("keys", 0) + st[2].get("keys", 0),
                "refined_gaps": (st[1].get("refined_gaps", 0)
                                 + st[2].get("refined_gaps", 0)),
                "refined_frames": (st[1].get("refined_frames", 0)
                                   + st[2].get("refined_frames", 0))}
        mark(f"embedded {name} in {time.monotonic() - t0:.0f}s"
             + (f" (refine: {refine_stats[name]})"
                if refine is not None else ""))
    lookup = {name: {os.path.basename(p): embs[name][v][i]
                     for v in (1, 2)
                     for i, p in enumerate(world["frames"][v])}
              for name, _, _, _, _ in defs}

    # ---- train ONCE at parity: stage-1 encoder, ratt store, stage-2 head
    mark("training stage-1 ChunkEncoder at parity")
    enc_cfg = ChunkEncoderConfig(embed_dim=dim, mlp_dim=4 * dim, max_len=cs)
    enc = ChunkEncoder(enc_cfg)
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    enc_params = enc.init(key, jnp.zeros((1, cs, dim)))
    tx = TCE.stage1_optimizer(5e-4)
    opt = tx.init(enc_params)
    step, _ = TCE.make_step_fns(enc, tx)
    gathered = np.stack([
        np.stack([lookup["parity"][os.path.basename(p)]
                  for p in ch["frames"]]) for ch in train_chunks])
    labels = np.asarray([float(ch["label"]) for ch in train_chunks])
    for epoch in range(30 if not args.tiny else 8):
        key, sub = jax.random.split(key)
        enc_params, opt, loss, acc = step(enc_params, opt,
                                          jnp.asarray(gathered),
                                          jnp.asarray(labels), sub)
    mark(f"stage-1 final train acc {float(acc):.2f}")
    encode_batch = TCE.make_encode_fn(enc, enc_params)

    # ratt-db-schema collection from PARITY train chunks (the train-time
    # store the fast profile queries against).
    client = PersistentClient(os.path.join(root, "db"), autoflush=False)
    col = client.get_or_create_collection(
        "ratt_db", metadata={"hnsw:space": "cosine"})
    store_embs = chunk_embs(train_chunks, lookup["parity"], encode_batch)
    ids, metas = [], []
    for i, ch in enumerate(train_chunks):
        ids.append(f"chunk_{i}")
        metas.append({"vid_num": int(ch["vid"]), "clip_num": int(ch["clip"]),
                      "side": ch["side"], "label": int(ch["label"]),
                      "t_center": float(ch["t_center"]),
                      "t_width": float(ch["t_width"]),
                      "start_idx": int(ch["start_idx"]),
                      "end_idx": int(ch["end_idx"])})
    col.upsert(ids, store_embs, metadatas=metas)

    mark("building stage-2 cache + training RATTHeadV2 at parity")
    chunk_emb_map = {CS.make_chunk_key(ch): e
                     for ch, e in zip(train_chunks, store_embs)}

    def encode_chunk(ch):
        k2 = CS.make_chunk_key(ch)
        if k2 in chunk_emb_map:
            return chunk_emb_map[k2]
        return chunk_embs([ch], lookup["parity"], encode_batch)[0]

    cache = CS.build_stage2_cache(
        train_chunks, encode_chunk, col, k_sim=ks, k_contrast=kc,
        k_temporal=kt, future_step=1, search_k_content=16,
        search_k_temporal=8)
    cfg = ExperimentConfig(
        name="quality",
        head=HeadConfig(embed_dim=dim, k_sim=ks, k_contrast=kc,
                        k_temporal=kt),
        train=TrainConfig(num_epochs=args.stage2_epochs, batch_size=8,
                          chunk_size=cs, chunk_stride=cstride),
        retrieval=RetrievalConfig(collection="ratt_db", top_k=ks))
    head_params, hist = train_stage2(train_chunks, train_chunks, cache,
                                     cfg=cfg)
    mark(f"stage-2 final val acc {hist[-1].get('val_acc', 0):.2f}")

    from vit_research_tpu.models.ratt_v2 import RATTHeadV2

    head = RATTHeadV2(cfg.head)

    def head_apply(q, s, c, tm):
        return head.apply(head_params, q, s, c, tm)[0]

    truth = truth_events_by_clip(world["events"])
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        "quality_fast_profile.jsonl")
    rows_out = []
    parity_q = None
    for name, r, stride, q, refine in defs:
        t0 = time.monotonic()
        row = {"variant": name, "tome_r": r, "stride": stride,
               "gemm_quant": q, "world_entropy": args.world_entropy}
        if q:
            row["calibration"] = "representative-frames"
        if refine is not None:
            row["stride_refine"] = refine
            rs = refine_stats.get(name, {})
            row["refined_frame_frac"] = round(
                rs.get("refined_frames", 0)
                / max(sum(len(world["frames"][v]) for v in (1, 2)), 1), 3)
            row.update({f"refine_{k}": v for k, v in rs.items()})
            # exact forwards paid / total frames: per-video keyframe
            # counts summed (stats['keys'] from embed_video_strided)
            # plus refined interiors — the throughput story
            n_total = sum(len(world["frames"][v]) for v in (1, 2))
            row["exact_embed_frac"] = round(
                (rs.get("keys", 0) + rs.get("refined_frames", 0))
                / max(n_total, 1), 3)
        # fidelity vs parity
        cos = np.sum(embs[name][2] * embs["parity"][2], axis=1)
        row["fidelity_cos_mean"] = round(float(cos.mean()), 4)
        row["fidelity_cos_p5"] = round(float(np.percentile(cos, 5)), 4)
        # segmentation (homogeneous variant corpus + queries)
        row.update(segmentation_metrics(
            world, embs[name], 1, 2,
            min_len=(4 if args.tiny else 16)))
        # retrieval overlap (parity store, trained stage-1 encoder)
        var_q = chunk_embs(eval_chunks, lookup[name], encode_batch)
        if parity_q is None:
            parity_q = var_q  # defs[0] is parity
        row["retrieval_top8_overlap"] = round(
            retrieval_overlap(store_embs, parity_q, var_q), 3)
        # event localization through the parity-trained stack
        scorer = LiveEventScorer(
            lambda paths, _n=name: np.stack(
                [lookup[_n][os.path.basename(p)] for p in paths]),
            encode_batch, head_apply, col, chunk_size=cs,
            chunk_stride=cstride, k_sim=ks, k_contrast=kc, k_temporal=kt,
            future_step=1)
        ev_rows = []
        for (vid, clip), (first, side, paths) in sorted(
                world["clip_ranges"].items()):
            if vid != 2:
                continue
            ev_rows.append(scorer.score_clip(paths, side=side,
                                             clip_num=clip, vid=vid))
        ev = score_event_localization(
            [r_ for r_ in ev_rows if r_ is not None], truth)
        h1, h3 = ev["hit_at"].get("1"), ev["hit_at"].get("3")
        row["event_hit@1"] = None if h1 is None else round(h1, 3)
        row["event_hit@3"] = None if h3 is None else round(h3, 3)
        ce = ev.get("center_error_mean")
        row["event_center_err"] = None if ce is None else round(ce, 1)
        row["scored_clips"] = ev.get("clips_scored")
        row["metric_wall_s"] = round(time.monotonic() - t0, 1)
        rows_out.append(row)
        mark(json.dumps(row))
    with open(out_path, "a") as f:
        for row in rows_out:
            f.write(json.dumps(row) + "\n")
    print(json.dumps({
        "metric": "quality_fast_profile",
        "variants": {r["variant"]: {
            "clip_f1": r["clip_f1"],
            "boundary_drift": r["boundary_drift_frames"],
            "retrieval_top8_overlap": r["retrieval_top8_overlap"],
            "event_hit@1": r["event_hit@1"],
            "fidelity": r["fidelity_cos_mean"]} for r in rows_out},
        "wall_s": round(time.monotonic() - t_start, 1),
        "out": os.path.abspath(out_path)}), flush=True)


if __name__ == "__main__":
    main()
