"""Wall-to-wall pipeline on a synthetic mini-world:

frames on disk -> tiny-ViT embedding engine -> segmentation (temporal
head + HMM) -> clip dirs -> samples/chunks -> memmap frame store ->
stage-1 chunk encoder -> RATT vector DB -> stage-2 cache -> RATTHeadV2
training -> clip-sequence inference. The reference has no such test
(SURVEY.md section 4); this is the framework's minimum end-to-end slice
exercised in one process on the virtual CPU mesh."""

import os

import numpy as np
import pytest

from vit_research_tpu.data import chunks as chunks_mod
from vit_research_tpu.data import labels as labels_mod
from vit_research_tpu.data import naming, samples, synthetic
from vit_research_tpu.data.preprocess import PreprocessSpec
from vit_research_tpu.db.builders import write_ratt_chunk_db
from vit_research_tpu.db.frame_store import FrameStore, build_chunk_index
from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.parallel.embed import EmbeddingEngine
from vit_research_tpu.retrieval import cache_stage2 as CS
from vit_research_tpu.store.vector_store import PersistentClient
from vit_research_tpu.utils.configs import (
    ChunkEncoderConfig,
    ExperimentConfig,
    HeadConfig,
    RetrievalConfig,
    TrainConfig,
    ViTConfig,
)

TINY_VIT = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=32,
                     num_layers=1, num_heads=2, mlp_dim=64,
                     use_flash_attention=False)
SPEC = PreprocessSpec(size=(32, 32), rescale=1 / 255.0,
                      mean=(0.5,) * 3, std=(0.5,) * 3)
D = 32


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    # ---- 1. raw video frames on disk (two "games") ----------------------
    frame_dirs = {}
    for vid in (1, 2):
        segs = [("none", 6), ("left", 40), ("none", 6), ("right", 40),
                ("none", 6)]
        frame_dirs[vid] = synthetic.write_video_frames(
            str(tmp_path / f"frames_{vid}"), vid, segs, size=(32, 32))

    # ---- 2. embedding engine (seeded random tiny ViT) --------------------
    model, params = init_vit(TINY_VIT, seed=0)
    eng = EmbeddingEngine(model, params, SPEC, batch_size=16,
                          use_fused_patch_embed=False)

    # ---- 3. segmentation: temporal head + HMM -> clip dirs ---------------
    from vit_research_tpu.segment.pipeline import segment_with_temporal_head

    clip_roots = {}
    for vid, paths in frame_dirs.items():
        names = [os.path.basename(p) for p in paths]
        embs = eng.embed_paths(paths, num_workers=2)
        mi = labels_mod.ManualIntervals()
        mi.intervals["none"].append((vid, 1, 6))
        mi.intervals["left"].append((vid, 7, 46))
        mi.intervals["none"].append((vid, 47, 52))
        mi.intervals["right"].append((vid, 53, 92))
        mi.intervals["none"].append((vid, 93, 98))
        out_root = str(tmp_path / f"clips_hmm_smooth_{vid}_smart")
        decoded, clip_dirs, _ = segment_with_temporal_head(
            names, embs, mi, out_root=out_root,
            src_dir=str(tmp_path / f"frames_{vid}"), vid=vid,
            epochs=200, lr=1e-3, min_len=25, pad=3)
        assert len(clip_dirs) >= 2, f"vid{vid}: expected 2 clips"
        clip_roots[vid] = out_root
        sides = {naming.parse_clip_dir(os.path.basename(c))[2]
                 for c in clip_dirs}
        assert {"left", "right"} <= sides

    # ---- 4. labels + samples + chunks ------------------------------------
    clip_labels, events = {}, {}
    for vid in (1, 2):
        for cdir in sorted(os.listdir(clip_roots[vid])):
            path = os.path.join(clip_roots[vid], cdir)
            _, cnum, side = naming.parse_clip_dir(cdir)
            label = 1 if side == "left" else 0
            clip_labels[path] = label
            frames = sorted(os.listdir(path), key=naming.frame_sort_key)
            mid = naming.frame_num(frames[len(frames) // 2])
            events[path] = {
                "event_make": [[mid, mid + 3]] if label else [],
                "event_miss": [] if label else [[mid, mid + 3]],
                "event_none": [],
            }
    recs = samples.load_samples(
        (1, 2), str(tmp_path / "clips_hmm_smooth_{vid}_smart"),
        clip_labels, events)
    assert recs
    chunks = chunks_mod.build_chunks(recs, chunk_size=6, chunk_stride=3)
    assert len(chunks) >= 8

    # ---- 5. memmap frame store + chunk index -----------------------------
    store_dir = str(tmp_path / "store")
    all_paths = [p for ch in chunks for p in ch["frames"]]
    store = FrameStore.build(all_paths, eng.embed_paths, store_dir,
                             batch_size=64)
    idx = build_chunk_index(chunks, store, store_dir)

    # ---- 6. stage-1 chunk encoder ----------------------------------------
    from vit_research_tpu.train.train_chunk_encoder import (
        make_encode_fn,
        train_chunk_encoder,
    )

    n = len(chunks)
    ce_cfg = ChunkEncoderConfig(embed_dim=D, num_layers=1, num_heads=2,
                                mlp_dim=4 * D, max_len=6)
    ce_model, ce_params, ce_hist = train_chunk_encoder(
        store, idx, list(range(0, n, 2)), list(range(1, n, 2)),
        config=ce_cfg, num_epochs=2, batch_size=4)
    assert np.isfinite(ce_hist[-1]["train_loss"])
    encode = make_encode_fn(ce_model, ce_params)

    # ---- 7. RATT vector DB ------------------------------------------------
    client = PersistentClient(str(tmp_path / "db"), autoflush=False)
    col = client.get_or_create_collection(
        "ratt_db", metadata={"hnsw:space": "cosine"})
    wrote = write_ratt_chunk_db(idx, store, encode, col, batch_size=16)
    assert wrote == n and col.count() == n
    client.flush()

    # ---- 8. stage-2 cache + training --------------------------------------
    from vit_research_tpu.train.train_stage2 import train_stage2

    def encode_chunk(ch):
        fe = store.gather_paths([ch["frames"]])
        emb, _ = encode(fe)
        return emb[0] / (np.linalg.norm(emb[0]) + 1e-8)

    head_cfg = HeadConfig(embed_dim=D, num_layers=1, num_heads=2, mlp_dim=16,
                          k_sim=3, k_contrast=3, k_temporal=2)
    cache = CS.build_stage2_cache(
        chunks, encode_chunk, col, k_sim=3, k_contrast=3, k_temporal=2,
        future_step=1, search_k_content=16, search_k_temporal=8)
    cfg = ExperimentConfig(
        name="stage2", head=head_cfg,
        train=TrainConfig(batch_size=4, num_epochs=2, accum_steps=1),
        retrieval=RetrievalConfig(future_chunk_step=1, search_k_content=16,
                                  search_k_temporal=8))
    train_c = [c for c in chunks if c["vid"] == 1]
    val_c = [c for c in chunks if c["vid"] == 2]
    s2_params, s2_hist = train_stage2(train_c, val_c, cache,
                                      encode_fn=encode_chunk,
                                      collection=col, cfg=cfg)
    assert np.isfinite(s2_hist[-1]["val_loss"])

    # ---- 9. clip-sequence inference ---------------------------------------
    import functools

    from vit_research_tpu.evaluate.clip_sequences import (
        infer_clip_sequences,
        save_results,
    )
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2

    head = RATTHeadV2(head_cfg)

    def head_apply(q, sim, con, tmp):
        logit, _, _ = head.apply(s2_params, q, sim, con, tmp)
        return logit

    rows = infer_clip_sequences(
        val_c, head_apply, encode_chunk, col, k_sim=3, k_contrast=3,
        k_temporal=2, future_step=1, search_k_content=16,
        search_k_temporal=8, batch_size=4)
    assert rows and all(r["num_chunks"] >= 1 for r in rows)
    out_json = str(tmp_path / "results.json")
    save_results(rows, out_json, str(tmp_path / "results.csv"))
    assert os.path.getsize(out_json) > 0

    # ---- 10. event-localization scoring ------------------------------------
    from vit_research_tpu.evaluate.event_scoring import (
        score_event_localization,
        truth_events_by_clip,
    )

    # chunk frame spans were parsed from the clip-dir frame names
    assert all(c["start_frame"] is not None
               for r in rows for c in r["topk_chunks"])
    truth = truth_events_by_clip(events)
    rep = score_event_localization(rows, truth, ks=(1, 3))
    # every synthetic clip carries one labeled event interval
    assert rep["clips_scored"] == len(rows)
    assert rep["clips_without_frame_numbers"] == 0
    for v in rep["hit_at"].values():
        assert v is not None and 0.0 <= v <= 1.0
    assert rep["hit_at"]["3"] >= rep["hit_at"]["1"]
    assert np.isfinite(rep["center_error_mean"])
    # the status_id fallback scores the same clips without the template
    rep2 = score_event_localization(rows, None, ks=(1, 3))
    assert rep2["ground_truth"] == "status_id"
    assert rep2["clips_scored"] >= 1

    # ---- 11. LIVE event scoring: one finished clip dir, same stack --------
    from vit_research_tpu.evaluate.live import LiveEventScorer

    scorer = LiveEventScorer(
        lambda ps: eng.embed_paths(list(ps), num_workers=2),
        encode, head_apply, col, chunk_size=6, chunk_stride=3,
        k_sim=3, k_contrast=3, k_temporal=2, future_step=1,
        search_k_content=16, search_k_temporal=8)
    cdir = sorted(
        os.path.join(clip_roots[2], d) for d in os.listdir(clip_roots[2])
        if d.startswith("vid2_clip"))[0]
    _, cnum, side = naming.parse_clip_dir(os.path.basename(cdir))
    frames = naming.list_frames(cdir)
    live_row = scorer.score_clip([os.path.join(cdir, f) for f in frames],
                                 side=side, clip_num=cnum, vid=2)
    offline = next(r for r in rows if r["vid"] == 2 and r["clip"] == cnum)
    # identical chunk windows and frame bounds as the offline dataset path
    assert live_row["num_chunks"] == offline["num_chunks"]
    assert live_row["start_idxs"] == offline["start_idxs"]
    assert live_row["start_frames"] == offline["start_frames"]
    assert live_row["end_frames"] == offline["end_frames"]
    assert live_row["side"] == offline["side"]
    # a live clip is unlabeled by construction (offline knew the label)
    assert live_row["label"] == -1
    assert len(live_row["topk_chunks"]) >= 1
    assert all(np.isfinite(x) for x in live_row["raw_sequence"])
