"""Segmentation: kNN votes, fused confidence, clip extraction, merge,
finalize, and the end-to-end synthetic pipelines."""

import os

import numpy as np
import pytest

from vit_research_tpu.segment import clips as clips_mod
from vit_research_tpu.segment import knn as knn_mod
from vit_research_tpu.segment import pipeline as seg_pipeline
from vit_research_tpu.segment.clips import ClipInterval


def clustered_corpus(n_per_class=40, d=16, seed=0, spread=0.15):
    """Three well-separated clusters, one per side."""
    rng = np.random.default_rng(seed)
    centers = np.eye(3, d) * 4.0
    embs, labels = [], []
    for c in range(3):
        embs.append(centers[c] + spread * rng.normal(size=(n_per_class, d)))
        labels += [c] * n_per_class
    return (np.concatenate(embs).astype(np.float32),
            np.asarray(labels, np.int32), centers)


def test_classify_pass1_and_pass2():
    corpus, labels, centers = clustered_corpus()
    q = centers[[0, 1, 2]].astype(np.float32)
    nl, _, _ = knn_mod.knn_labels(q, corpus, labels, k=25, metric="l2")
    decision, probs = knn_mod.classify_pass1(nl, min_votes=20)
    np.testing.assert_array_equal(decision, [0, 1, 2])
    assert probs.shape == (3, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-9)
    # Ambiguous query (between clusters) defers to pass 2.
    mid = ((centers[0] + centers[1]) / 2)[None].astype(np.float32)
    nl_mid, _, _ = knn_mod.knn_labels(mid, corpus, labels, k=25, metric="l2")
    d_mid, _ = knn_mod.classify_pass1(nl_mid, min_votes=25)
    if d_mid[0] == -1:
        d2, _ = knn_mod.classify_pass2(nl_mid)
        assert d2[0] in (0, 1)


def test_two_pass_self_label():
    corpus, labels, centers = clustered_corpus()
    rng = np.random.default_rng(1)
    q = np.concatenate([
        centers[0] + 0.1 * rng.normal(size=(10, 16)),
        centers[1] + 0.1 * rng.normal(size=(10, 16)),
    ]).astype(np.float32)
    out_labels, out_probs, accepted = knn_mod.two_pass_self_label(
        q, corpus, labels, k=25, min_votes=20)
    np.testing.assert_array_equal(out_labels, [0] * 10 + [1] * 10)
    assert out_probs.shape == (20, 3)


def test_fused_confidence_unanimous_and_threshold():
    k = 10
    nl = np.zeros((2, k), np.int64)  # all neighbors 'left'
    probs = np.zeros((2, k, 3))
    probs[0, :, 0] = 0.9   # confident stored probs
    probs[1, :, 0] = 0.4   # weak stored probs
    out = knn_mod.fused_confidence(nl, probs, top_n=k,
                                   confidence_threshold=0.7)
    assert out["decision"].tolist() == [0, 0]
    assert out["confident"].tolist() == [True, False]
    # Unanimous vote stores the 0.999998 one-hot.
    np.testing.assert_allclose(out["upsert_probs"][0, 0], 0.999998)
    np.testing.assert_allclose(out["emissions"][1, 0], 0.4)


def test_clip_intervals_from_decoded():
    decoded = (["none"] * 20 + ["left"] * 150 + ["none"] * 30
               + ["right"] * 80 + ["none"] * 10)
    ivs = clips_mod.clip_intervals_from_decoded(decoded, min_len=100, pad=10)
    # Only the left streak qualifies (right is 80 < 100).
    assert len(ivs) == 1
    iv = ivs[0]
    assert iv.side == "left" and iv.start == 10 and iv.end == 179
    # Lower threshold picks up the right streak too.
    ivs2 = clips_mod.clip_intervals_from_decoded(decoded, min_len=75, pad=0)
    assert [i.side for i in ivs2] == ["left", "right"]


def test_save_clips_from_sequence(tmp_path):
    from vit_research_tpu.data import synthetic

    src = str(tmp_path / "frames")
    paths = synthetic.write_video_frames(
        src, 1, [("none", 5), ("left", 30), ("none", 5)], size=(16, 16))
    names = [os.path.basename(p) for p in paths]
    decoded = ["none"] * 5 + ["left"] * 30 + ["none"] * 5
    out = clips_mod.save_clips_from_sequence(
        decoded, names, src, str(tmp_path / "clips"), min_len=20, pad=3)
    assert len(out) == 1
    files = sorted(os.listdir(out[0]))
    assert len(files) == 36  # 30 + 2*3 pad
    assert os.path.basename(out[0]) == "vid1_clip_1_left"


def test_merge_clip_ranges():
    clips = [("left", 0, 100), ("left", 120, 200), ("left", 300, 400),
             ("right", 405, 500), ("right", 800, 900)]
    merged = clips_mod.merge_clip_ranges(clips, max_gap=30)
    assert merged == [("left", 0, 200), ("left", 300, 400),
                      ("right", 405, 500), ("right", 800, 900)]


def test_finalize_clip_keeps_matching_frames():
    probs = np.tile(np.array([0.9, 0.05, 0.05]), (50, 1))
    probs[:5] = [0.05, 0.05, 0.9]  # leading 'none' frames
    keep = clips_mod.finalize_clip(probs, "left")
    assert keep[10:].all()
    # 'none' prefix decoded as none should be dropped.
    assert not keep[:3].all() or keep.sum() < 50


def test_segment_with_knn_hmm_end_to_end():
    corpus, labels, centers = clustered_corpus(spread=0.1)
    probs = np.full((len(labels), 3), 0.05)
    probs[np.arange(len(labels)), labels] = 0.9
    rng = np.random.default_rng(5)
    segs = [("none", 30), ("left", 150), ("none", 30), ("right", 150),
            ("none", 20)]
    side_ids = {"left": 0, "right": 1, "none": 2}
    frames, truth = [], []
    for side, n in segs:
        c = side_ids[side]
        frames.append(centers[c] + 0.1 * rng.normal(size=(n, 16)))
        truth += [side] * n
    frames = np.concatenate(frames).astype(np.float32)
    names = [f"vid9_frame_{i+1}.jpg" for i in range(len(truth))]

    from vit_research_tpu.store.vector_store import Collection

    col = Collection("frames", space="l2")
    decoded, _, fused = seg_pipeline.segment_with_knn_hmm(
        names, frames, {"embeddings": corpus, "labels": labels,
                        "probs": probs},
        k=25, collection=col, vid=9)
    agree = np.mean([d == t for d, t in zip(decoded, truth)])
    assert agree > 0.95
    # Confident frames were written back with prob metadata.
    assert col.count() > 0
    meta = col.get(limit=1)["metadatas"][0]
    assert {"label", "video", "left_prob", "right_prob",
            "none_prob"} <= set(meta)


def test_merge_clip_dirs_never_merges_across_vids(tmp_path):
    """Frame numbers overlap freely between videos; merge must be
    per-vid and name outputs with each clip's own vid."""
    import os

    pool = tmp_path / "pool"
    os.makedirs(pool)
    clips_root = tmp_path / "clips"
    for vid, lo, hi in [(1, 1, 40), (2, 20, 60)]:
        cdir = clips_root / f"vid{vid}_clip_1_left"
        os.makedirs(cdir)
        for n in range(lo, hi + 1):
            name = f"vid{vid}_frame_{n}.jpg"
            (pool / name).write_text("x")
            (cdir / name).write_text("x")
    from vit_research_tpu.segment.clips import merge_clip_dirs

    out = merge_clip_dirs(
        [str(clips_root / d) for d in sorted(os.listdir(clips_root))],
        str(pool), str(tmp_path / "merged"), max_gap=30)
    names = sorted(os.path.basename(d) for d in out)
    assert names == ["vid1_clip_1_left", "vid2_clip_1_left"]
    # Each merged clip holds only its own vid's frames and range.
    v1 = sorted(os.listdir(tmp_path / "merged" / "vid1_clip_1_left"))
    assert len(v1) == 40 and all(f.startswith("vid1_") for f in v1)
    v2 = sorted(os.listdir(tmp_path / "merged" / "vid2_clip_1_left"))
    assert len(v2) == 41 and all(f.startswith("vid2_") for f in v2)


def test_confident_writeback_preserves_existing_rows():
    """segment --write-back must only ADD frames; seed rows keep their
    manual metadata (same contract as self-label --upsert)."""
    corpus, labels, centers = clustered_corpus(spread=0.1)
    probs = np.full((len(labels), 3), 0.05)
    probs[np.arange(len(labels)), labels] = 0.9
    from vit_research_tpu.store.vector_store import Collection

    col = Collection("frames", space="l2")
    seed_id = "vid9_frame_1.jpg"
    col.upsert([seed_id], centers[1][None].astype(np.float32),
               [{"label": "right", "left_prob": 0.0, "right_prob": 1.0,
                 "none_prob": 0.0}])
    # Frames near the LEFT center, including a name colliding with the
    # seed row; the kNN vote will confidently say 'left'.
    rng = np.random.default_rng(0)
    frames = (centers[0] + 0.05 * rng.normal(size=(5, 16))).astype(
        np.float32)
    names = [f"vid9_frame_{i + 1}.jpg" for i in range(5)]
    seg_pipeline.segment_with_knn_hmm(
        names, frames, {"embeddings": corpus, "labels": labels,
                        "probs": probs}, k=25, collection=col, vid=9)
    meta = col.get(ids=[seed_id])["metadatas"][0]
    assert meta["label"] == "right" and meta["right_prob"] == 1.0
    assert col.count() >= 5  # the new frames were added


def test_segment_with_knn_streaks_end_to_end(tmp_path):
    corpus, labels, centers = clustered_corpus(spread=0.1)
    probs = np.full((len(labels), 3), 0.05)
    probs[np.arange(len(labels)), labels] = 0.9
    rng = np.random.default_rng(5)
    segs = [("none", 30), ("left", 150), ("none", 30), ("right", 150),
            ("none", 20)]
    side_ids = {"left": 0, "right": 1, "none": 2}
    frames, truth = [], []
    for side, n in segs:
        c = side_ids[side]
        frames.append(centers[c] + 0.1 * rng.normal(size=(n, 16)))
        truth += [side] * n
    frames = np.concatenate(frames).astype(np.float32)
    names = [f"vid9_frame_{i+1}.jpg" for i in range(len(truth))]

    from vit_research_tpu.store.vector_store import Collection

    col = Collection("frames", space="l2")
    csv_path = str(tmp_path / "clip_intervals.csv")
    decoded, _, intervals = seg_pipeline.segment_with_knn_streaks(
        names, frames, {"embeddings": corpus, "labels": labels,
                        "probs": probs},
        k=25, collection=col, vid=9, intervals_csv=csv_path)
    agree = np.mean([d == t for d, t in zip(decoded, truth)])
    assert agree > 0.9
    # Two possession intervals found, one per side, in order.
    sides = [s for s, _, _ in intervals]
    assert sides == [0, 1]
    # CSV uses frame NUMBERS from the names (1-based), header included.
    with open(csv_path) as f:
        rows = f.read().strip().splitlines()
    assert rows[0] == "side,start_frame,end_frame"
    assert len(rows) == 3
    side, start, end = rows[1].split(",")
    assert side == "left" and 20 <= int(start) <= 45
    # Confident frames were written back.
    assert col.count() > 0


def test_segment_with_temporal_head_end_to_end(tmp_path):
    from vit_research_tpu.data import labels as labels_mod

    rng = np.random.default_rng(7)
    d = 16
    centers = np.eye(3, d) * 3.0
    segs = [("left", 120), ("none", 40), ("right", 120)]
    side_ids = {"left": 0, "right": 1, "none": 2}
    emb, truth = [], []
    for side, n in segs:
        emb.append(centers[side_ids[side]] + 0.2 * rng.normal(size=(n, d)))
        truth += [side] * n
    emb = np.concatenate(emb).astype(np.float32)
    names = [f"vid1_frame_{i+1}.jpg" for i in range(len(truth))]

    mi = labels_mod.ManualIntervals()
    mi.intervals["left"].append((1, 1, 120))
    mi.intervals["none"].append((1, 121, 160))
    mi.intervals["right"].append((1, 161, 280))

    params_path = str(tmp_path / "temporal.npz")
    decoded, _, probs = seg_pipeline.segment_with_temporal_head(
        names, emb, mi, epochs=300, lr=1e-3, params_path=params_path)
    agree = np.mean([d == t for d, t in zip(decoded, truth)])
    assert agree > 0.9
    assert os.path.exists(params_path)
    # Cached-params path reproduces the decode.
    decoded2, _, _ = seg_pipeline.segment_with_temporal_head(
        names, emb, mi, epochs=1, params_path=params_path)
    assert decoded2 == decoded


def test_knn_labels_cosine_ranks_by_angle_not_norm():
    """metric='cosine' must L2-normalize both sides (masked_topk's
    cosine branch expects pre-normalized inputs); raw rows would let a
    large-norm wrong-class row outrank every right-class one."""
    rng = np.random.default_rng(11)
    d = 8
    a = rng.normal(size=d).astype(np.float32)
    a /= np.linalg.norm(a)
    b = rng.normal(size=d).astype(np.float32)
    b -= (b @ a) * a  # orthogonal to a
    b /= np.linalg.norm(b)
    # class-0 rows point along a with tiny norms; class-1 rows along b
    # with huge norms
    corpus = np.concatenate([0.01 * np.outer(np.ones(5), a),
                             100.0 * np.outer(np.ones(5), b)]).astype(
        np.float32)
    labels = np.asarray([0] * 5 + [1] * 5, np.int32)
    nl, _, _ = knn_mod.knn_labels(a[None], corpus, labels, k=5,
                                  metric="cosine")
    assert (nl == 0).all()  # angle wins; raw dot would pick the 1s
