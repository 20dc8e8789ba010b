"""Retrieval caches: greedy diversity, bin cache, stage-2 branches."""

from collections import Counter, defaultdict

import numpy as np

from vit_research_tpu.retrieval import cache_bins as CB
from vit_research_tpu.retrieval import cache_stage2 as CS
from vit_research_tpu.store.vector_store import Collection

D = 16


def make_chunk(vid, clip, start, side, label, t_center, t_width=0.1):
    return {
        "vid": vid, "clip": clip, "start_idx": start, "end_idx": start + 7,
        "side": side, "label": label, "t_center": t_center,
        "t_width": t_width, "status_id": label, "frames": [],
    }


def seeded_emb(vid, clip, start, label):
    rng = np.random.default_rng(vid * 7919 + clip * 104729 + start)
    base = np.zeros(D)
    base[label] = 3.0  # label clusters
    return (base + 0.3 * rng.normal(size=D)).astype(np.float32)


def build_world(n_vids=4, clips_per_vid=2, chunks_per_clip=6):
    chunks, col = [], Collection("ratt_db", space="cosine")
    ids, embs, metas = [], [], []
    for vid in range(1, n_vids + 1):
        for clip in range(clips_per_vid):
            side = "left" if clip % 2 == 0 else "right"
            label = (vid + clip) % 2
            for s in range(chunks_per_clip):
                t = (s + 0.5) / chunks_per_clip
                ch = make_chunk(vid, clip, s * 4, side, label, t)
                chunks.append(ch)
                ids.append(f"v{vid}c{clip}s{s}")
                embs.append(seeded_emb(vid, clip, s * 4, label))
                metas.append({
                    "vid_num": vid, "clip_num": clip, "side": side,
                    "label": label, "t_center": t, "t_width": 0.1,
                    "start_idx": s * 4, "end_idx": s * 4 + 7,
                    "class_logit": 0.0,
                })
    col.upsert(ids, np.stack(embs), metas)
    return chunks, col


def test_greedy_select_constraints():
    cands = []
    for i in range(20):
        cands.append({
            "sig": (i % 5, "left", i),  # 5 videos
            "vid": i % 5,
            "t_center": i * 0.1,
            "base_score": -float(i),
            "label": 1, "emb": np.zeros(4), "side": "left",
        })
    gc = Counter()
    kept = CB.greedy_select_candidates(
        cands, 10, gc, max_per_video=2, max_global_appearances=5,
        min_time_gap=0.05, lambda_global=0.1)
    assert len(kept) == 10
    per_vid = Counter(c["vid"] for c in kept)
    assert max(per_vid.values()) <= 2
    # Higher scores picked first (modulo constraints): best is sig idx 0.
    assert kept[0]["base_score"] == 0.0
    # Global cap: re-run starting from saturated counts.
    gc2 = Counter({c["sig"]: 5 for c in cands})
    kept2 = CB.greedy_select_candidates(
        cands, 10, gc2, max_per_video=2, max_global_appearances=5,
        min_time_gap=0.05)
    assert kept2 == []


def test_greedy_backfill_carries_constraint_state():
    """A backfill call continuing a selection must honor the per-video
    caps / time gaps against the already-kept picks (shared state)."""
    cands = [{"sig": ("a", i), "vid": 7, "t_center": 0.5 + i * 1e-4,
              "base_score": -float(i), "label": 1, "emb": np.zeros(4),
              "side": "left"} for i in range(6)]
    gc = Counter()
    state = dict(video_counts={}, video_times=defaultdict(list))
    first = CB.greedy_select_candidates(
        cands, 1, gc, max_per_video=1, max_global_appearances=9,
        min_time_gap=0.01, **state)
    assert len(first) == 1
    # Same vid (cap 1) and within min_time_gap of the kept pick: with
    # carried state the backfill must return nothing.
    again = CB.greedy_select_candidates(
        [c for c in cands if c["sig"] != first[0]["sig"]], 2, gc,
        max_per_video=1, max_global_appearances=9, min_time_gap=0.01,
        **state)
    assert again == []


def test_hard_negative_ratio_zero_disables_negatives():
    chunks, col = build_world()
    cache = CB.build_bin_cache(
        chunks, embed_anchor, col, train_vids=[1, 2, 3],
        candidates_per_bin=6, query_mult=20, max_per_video=10,
        max_global_appearances=50, min_time_gap=0.0,
        hard_negative_ratio=0.0, delta_t=0.5, seed=0)
    any_rows = False
    for pool in cache.values():
        if len(pool["label"]):
            any_rows = True
            assert not pool["is_hard_negative"].any()
    assert any_rows


def test_stage2_diff_branch_excludes_unlabeled():
    from vit_research_tpu.retrieval.cache_stage2 import _select_branch

    q_meta = {"vid": 1, "clip": 0, "side": "left", "label": 1,
              "t_center": 0.5, "start_idx": 0}
    cands = []
    for i, lbl in enumerate([0, -1, 1]):
        m = {"vid_num": 2 + i, "clip_num": 5, "side": "left",
             "t_center": 0.3, "start_idx": 8}
        if i != 1:
            m["label"] = lbl
        # i == 1 has NO label key at all (unlabeled candidate).
        cands.append({"emb": np.full(4, float(i + 1), np.float32),
                      "meta": m})
    embs, metas = _select_branch(cands, q_meta, want="diff", k=3, dim=4)
    # Only the label-0 candidate qualifies; unlabeled and same-label don't.
    assert (embs[0] == 1.0).all()
    assert (embs[1:] == 0.0).all()


def embed_anchor(ch):
    return seeded_emb(ch["vid"], ch["clip"], ch["start_idx"], ch["label"])


def test_build_bin_cache_and_lookup():
    chunks, col = build_world()
    cache = CB.build_bin_cache(
        chunks, embed_anchor, col, train_vids=[1, 2, 3, 4],
        candidates_per_bin=8, query_mult=10, max_per_video=4,
        max_global_appearances=10, min_time_gap=0.0,
        hard_negative_ratio=0.3, delta_t=0.5, seed=0)
    assert cache
    # Pools contain both positives and hard negatives with correct flags.
    has_pos = has_neg = False
    for (side, bin_id, label), pool in cache.items():
        n = len(pool["vid"])
        if n == 0:
            continue
        assert pool["embeddings"].shape == (n, D)
        same = pool["label"] == label
        flags = pool["is_hard_negative"]
        assert ((flags == 0) == same).all()  # flag consistency
        has_pos |= bool((flags == 0).any())
        has_neg |= bool((flags == 1).any())
    assert has_pos and has_neg

    # Consumer lookup: same-video exclusion + padding.
    md = {
        "side": ["left", "right"],
        "t_center": [0.2, 0.9],
        "vid": [1, 2],
        "label": [chunks[0]["label"], 1],
    }
    retrieved, labels, hardneg = CB.get_retrieval_cache(
        md, cache, top_k=6, delta_t=0.5, dim=D)
    assert retrieved.shape == (2, 6, D)
    assert labels.shape == (2, 6) and hardneg.shape == (2, 6)
    # Nonzero rows are L2-normalized.
    norms = np.linalg.norm(retrieved, axis=2)
    nz = norms > 1e-6
    np.testing.assert_allclose(norms[nz], 1.0, atol=1e-5)
    # Padded rows flagged -1.
    assert ((norms < 1e-6) == (labels == -1)).all()


def test_future_lookup():
    chunks = [make_chunk(1, 0, s * 4, "left", 1, s / 6) for s in range(5)]
    fut = CS.build_future_lookup(chunks, future_step=2)
    keys = [CS.make_chunk_key(c) for c in chunks]
    assert fut[keys[0]] == keys[2]
    assert fut[keys[3]] is None and fut[keys[4]] is None


def test_stage2_cache_branches(tmp_path):
    chunks, col = build_world()
    cache = CS.build_stage2_cache(
        chunks, embed_anchor, col, k_sim=3, k_contrast=3, k_temporal=2,
        future_step=1, search_k_content=32, search_k_temporal=16,
        checkpoint_path=str(tmp_path / "cache.pkl"), checkpoint_every=10)
    assert len(cache) == len(chunks)
    entry = cache[CS.make_chunk_key(chunks[0])]
    q = chunks[0]
    assert entry["sim_embs"].shape == (3, D)
    assert entry["contrast_embs"].shape == (3, D)
    assert entry["temporal_embs"].shape == (2, D)
    # sim = same side + same label; contrast = same side + different label.
    for m in entry["sim_meta"]:
        if m["label"] != -1:
            assert m["label"] == q["label"] and m["side"] == q["side"]
            assert not (m["vid_num"] == q["vid"] and m["clip_num"] == q["clip"]
                        and m["start_idx"] == q["start_idx"])
    for m in entry["contrast_meta"]:
        if m["label"] != -1:
            assert m["label"] != q["label"] and m["side"] == q["side"]

    # Batch fetch shapes.
    batch = CS.fetch_cache_batch(cache, chunks[:4])
    assert batch["sim_embs"].shape == (4, 3, D)
    assert batch["labels"].shape == (4,)

    # Live fetch matches cached build for identical state.
    live = CS.fetch_live_batch(
        chunks[:4], embed_anchor, col, k_sim=3, k_contrast=3, k_temporal=2,
        future_step=1, search_k_content=32, search_k_temporal=16,
        all_chunks=chunks)
    np.testing.assert_allclose(live["sim_embs"], batch["sim_embs"], atol=1e-5)
    np.testing.assert_allclose(live["temporal_embs"], batch["temporal_embs"],
                               atol=1e-5)

    # Pickle roundtrip.
    loaded = CS.load_cache(str(tmp_path / "cache.pkl"))
    assert len(loaded) == len(cache)
