"""Coverage for the remaining dir-level and edge-case paths."""

import os

import numpy as np
import pytest

from vit_research_tpu.data import naming, synthetic
from vit_research_tpu.segment import clips as clips_mod


def test_finalize_clip_dirs(tmp_path):
    clip_dirs = synthetic.write_clips(
        str(tmp_path / "clips"), 1, [(1, "left", 10, 20)], size=(16, 16))

    def probs_fn(paths):
        # First 5 frames vote 'none', rest vote 'left'.
        t = len(paths)
        p = np.tile(np.array([0.9, 0.05, 0.05]), (t, 1))
        p[:5] = [0.05, 0.05, 0.9]
        return p

    out = clips_mod.finalize_clip_dirs(
        clip_dirs, probs_fn, str(tmp_path / "final"))
    assert len(out) == 1
    kept = sorted(os.listdir(out[0]), key=naming.frame_sort_key)
    # The none-prefix frames were dropped, left frames kept.
    assert 0 < len(kept) < 20
    assert naming.frame_num(kept[0]) >= 15
    # Idempotent: second run skips existing dirs (reference behavior).
    out2 = clips_mod.finalize_clip_dirs(
        clip_dirs, probs_fn, str(tmp_path / "final"))
    assert out2 == out


def test_merge_clip_dirs(tmp_path):
    pool = str(tmp_path / "pool")
    synthetic.write_video_frames(pool, 1, [("left", 80)], size=(16, 16))
    clip_dirs = synthetic.write_clips(
        str(tmp_path / "clips"), 1,
        [(1, "left", 1, 20), (2, "left", 30, 20), (3, "left", 70, 10)],
        size=(16, 16))
    merged = clips_mod.merge_clip_dirs(
        clip_dirs, pool, str(tmp_path / "merged"), max_gap=15)
    # Clips 1 (1-20) and 2 (30-49) merge (gap 10 <= 15); clip 3 separate.
    assert len(merged) == 2
    first = sorted(os.listdir(merged[0]), key=naming.frame_sort_key)
    assert naming.frame_num(first[0]) == 1
    assert naming.frame_num(first[-1]) == 49


def test_retriever_unknown_side_returns_zeros():
    from vit_research_tpu.retrieval.retrievers import FrameRetriever
    from vit_research_tpu.store.vector_store import Collection

    col = Collection("r", space="cosine")
    col.upsert(["a"], np.ones((1, 8), np.float32),
               [{"vid_num": 1, "side": "left", "t_norm": 0.5}])
    ret = FrameRetriever(col, top_k=2)
    md = {"vid": np.asarray([0]), "side": np.asarray(["diagonal"], object),
          "t_center": np.asarray([0.5]), "t_width": np.asarray([2.0])}
    out = ret(np.ones((1, 8), np.float32), md)
    np.testing.assert_array_equal(out, 0.0)


def test_two_pass_all_accepted():
    from vit_research_tpu.segment.knn import two_pass_self_label

    rng = np.random.default_rng(0)
    corpus = np.concatenate([
        np.full((30, 8), 3.0), np.full((30, 8), -3.0)]).astype(np.float32)
    corpus += 0.1 * rng.normal(size=corpus.shape).astype(np.float32)
    labels = np.asarray([0] * 30 + [1] * 30)
    q = corpus[:5] + 0.01
    out, probs, accepted = two_pass_self_label(q, corpus, labels, k=25,
                                               min_votes=20)
    assert accepted.all()
    np.testing.assert_array_equal(out, 0)


def test_extract_frames_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from vit_research_tpu.data.video import extract_frames

    video = str(tmp_path / "game.avi")
    w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    if not w.isOpened():
        pytest.skip("no codec available")
    rng = np.random.default_rng(0)
    for _ in range(12):
        w.write(rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8))
    w.release()

    out_dir = str(tmp_path / "frames")
    paths = extract_frames(video, out_dir, vid=3, size=(24, 32), every=2)
    assert len(paths) == 6
    assert os.path.basename(paths[0]) == "vid3_frame_1.jpg"
    img = cv2.imread(paths[0])
    assert img.shape == (24, 32, 3)
    # Frame-range windowing.
    paths2 = extract_frames(video, str(tmp_path / "f2"), vid=3,
                            size=(24, 32), frame_range=(5, 8))
    assert len(paths2) == 4
