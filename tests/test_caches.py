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
        # i == 1 has NO label key at all (unlabeled candidate);
        # normalize_meta (applied by _query in production) maps it to -1.
        cands.append({"emb": np.full(4, float(i + 1), np.float32),
                      "meta": CS.normalize_meta(m)})
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
    # End-of-clip chunks clamp to the last chunk (reference
    # min(idx+step, last)) — never None/zero, which would cosine-match
    # everything at 0.0 and fill the temporal branch with garbage.
    assert fut[keys[3]] == keys[4] and fut[keys[4]] == keys[4]


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
        # Uniform normalized schema: every row (real or PAD) has the
        # same vid/clip keys (reference normalized metas the same way).
        assert set(m) == set(CS.PAD_META)
        if m["label"] != -1:
            assert m["label"] == q["label"] and m["side"] == q["side"]
            assert not (m["vid"] == q["vid"] and m["clip"] == q["clip"]
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


def test_coarse_time_bin_float32_roundtrip_stable():
    # Build keys come from float64 chunk dicts; lookups come through
    # chunk_metadata_batch's float32 columns. Bins must agree anyway.
    for t in [0.2, 0.3, 0.7, 0.1, 0.9, 0.35, 0.6000001]:
        assert (CB.coarse_time_bin(t)
                == CB.coarse_time_bin(float(np.float32(t)))), t


def test_greedy_accepts_plain_dict_state():
    cands = [{"sig": (v, "left", 0.1 * v), "vid": v, "t_center": 0.1 * v,
              "base_score": -v, "label": 1, "emb": np.zeros(4)}
             for v in range(5)]
    kept = CB.greedy_select_candidates(
        cands, 3, Counter(), max_per_video=1, max_global_appearances=5,
        min_time_gap=0.0, video_counts={}, video_times={})
    assert [c["vid"] for c in kept] == [0, 1, 2]


def test_stage2_end_of_clip_temporal_branch_uses_clamped_future():
    chunks, col = build_world()
    cache = CS.build_stage2_cache(
        chunks, embed_anchor, col, k_sim=2, k_contrast=2, k_temporal=2,
        future_step=2, search_k_content=32, search_k_temporal=16)
    # The LAST chunk of a clip: its future clamps to itself, so the
    # temporal query embedding is its own (nonzero) embedding — never
    # the zero vector (which would return arbitrary rows in cosine).
    last = [c for c in chunks if c["vid"] == 1 and c["clip"] == 0][-1]
    entry = cache[CS.make_chunk_key(last)]
    np.testing.assert_allclose(entry["future_emb"], embed_anchor(last),
                               atol=1e-6)
    assert np.abs(entry["future_emb"]).max() > 0


def test_stage2_temporal_branch_survives_labelless_collection(tmp_path):
    # A collection written without labels must not crash the batch
    # stack (the temporal branch admits label-less candidates).
    chunks, _ = build_world(n_vids=2, clips_per_vid=1, chunks_per_clip=4)
    col = Collection("nolabel", space="cosine")
    ids, embs, metas = [], [], []
    for ch in chunks:
        ids.append(f"v{ch['vid']}s{ch['start_idx']}")
        embs.append(embed_anchor(ch))
        metas.append({"vid_num": ch["vid"], "clip_num": ch["clip"],
                      "side": ch["side"], "t_center": ch["t_center"],
                      "t_width": ch["t_width"],
                      "start_idx": ch["start_idx"],
                      "end_idx": ch["end_idx"]})
    col.upsert(ids, np.stack(embs), metas)
    cache = CS.build_stage2_cache(
        chunks, embed_anchor, col, k_sim=2, k_contrast=2, k_temporal=2,
        future_step=1, search_k_content=16, search_k_temporal=8)
    batch = CS.fetch_cache_batch(cache, chunks[:2])  # must not KeyError
    assert batch["temporal_labels"].shape == (2, 2)
    # contrast branch excludes unlabeled candidates entirely
    assert (batch["contrast_labels"] == -1).all()


def test_stage2_partial_checkpoint_resume(tmp_path):
    chunks, col = build_world(n_vids=2, clips_per_vid=1, chunks_per_clip=6)
    path = str(tmp_path / "cache.pkl")
    kw = dict(k_sim=2, k_contrast=2, k_temporal=1, future_step=1,
              search_k_content=16, search_k_temporal=8,
              checkpoint_path=path, checkpoint_every=4)

    class DyingCollection:
        # encode_fn runs before the loop, so the crash is injected into
        # the per-chunk query path: 2 queries/chunk -> dies on chunk 6,
        # after the periodic checkpoint at chunk 4.
        def __init__(self, inner, max_queries):
            self._inner, self._left = inner, max_queries

        def query(self, *a, **k):
            self._left -= 1
            if self._left < 0:
                raise RuntimeError("simulated crash")
            return self._inner.query(*a, **k)

    try:
        CS.build_stage2_cache(chunks, embed_anchor,
                              DyingCollection(col, 10), **kw)
    except RuntimeError:
        pass
    import os
    # The incomplete cache must NOT exist at the real path (a cache-file
    # existence check would load it as complete); the partial does.
    assert not os.path.exists(path)
    assert os.path.exists(path + ".partial")

    cache = CS.build_stage2_cache(chunks, embed_anchor, col, **kw)
    assert len(cache) == len(chunks)
    assert os.path.exists(path) and not os.path.exists(path + ".partial")
    loaded = CS.load_cache(path)
    assert len(loaded) == len(chunks)


def test_greedy_sweep_matches_naive_max_loop_fuzz():
    # The single-sweep implementation must reproduce the naive
    # "pick the global max eligible each round" loop exactly —
    # including ties, duplicate sigs, and carried cross-call state.
    def naive(candidates, k, global_counts, *, max_per_video,
              max_global_appearances, min_time_gap, lambda_global,
              video_counts, video_times):
        kept, selected = [], set()
        while len(kept) < k:
            best_idx, best_score = None, -1e18
            for i, cand in enumerate(candidates):
                sig = cand["sig"]
                if sig in selected:
                    continue
                if video_counts.get(cand["vid"], 0) >= max_per_video:
                    continue
                if global_counts[sig] >= max_global_appearances:
                    continue
                if any(abs(cand["t_center"] - t) < min_time_gap
                       for t in video_times.get(cand["vid"], ())):
                    continue
                score = (cand["base_score"]
                         - lambda_global * global_counts[sig])
                if score > best_score:
                    best_score, best_idx = score, i
            if best_idx is None:
                break
            cand = candidates[best_idx]
            kept.append(cand)
            selected.add(cand["sig"])
            video_counts[cand["vid"]] = video_counts.get(cand["vid"], 0) + 1
            video_times.setdefault(cand["vid"], []).append(cand["t_center"])
            global_counts[cand["sig"]] += 1
        return kept

    rng = np.random.default_rng(0)
    for trial in range(60):
        n = int(rng.integers(0, 40))
        cands = []
        for _ in range(n):
            vid = int(rng.integers(1, 5))
            # quantized times/scores force frequent exact ties; small
            # sig space forces duplicate sigs
            t = round(float(rng.integers(0, 8)) / 8, 5)
            cands.append({
                "sig": (vid, "left", t), "vid": vid, "t_center": t,
                "base_score": float(rng.integers(-4, 0)),
                "label": 1, "emb": np.zeros(2),
            })
        kw = dict(max_per_video=int(rng.integers(1, 4)),
                  max_global_appearances=int(rng.integers(1, 4)),
                  min_time_gap=float(rng.choice([0.0, 0.1, 0.3])),
                  lambda_global=float(rng.choice([0.0, 0.5, 2.0])))
        k = int(rng.integers(0, 8))
        # carried state: seed counts from a previous "call"
        gc_a, gc_b = Counter(), Counter()
        for c in cands[: n // 3]:
            gc_a[c["sig"]] += 1
            gc_b[c["sig"]] += 1
        st_a = dict(video_counts={}, video_times={})
        st_b = dict(video_counts={}, video_times={})
        got = CB.greedy_select_candidates(cands, k, gc_a, **kw, **st_a)
        want = naive(cands, k, gc_b, **kw, **st_b)
        assert [id(c) for c in got] == [id(c) for c in want], (trial, kw, k)
        assert gc_a == gc_b and st_a == st_b, trial
