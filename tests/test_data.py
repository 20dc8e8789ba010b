"""Data layer: naming, labels, samples, chunking, oversampling, preprocess."""

import numpy as np
import pytest

from vit_research_tpu.data import chunks as chunks_mod
from vit_research_tpu.data import labels as labels_mod
from vit_research_tpu.data import naming, preprocess, samples, synthetic


def test_naming_roundtrip():
    assert naming.parse_frame_name("vid3_frame_120.jpg") == (3, 120)
    assert naming.parse_clip_dir("vid3_clip_7_left") == (3, 7, "left")
    assert naming.frame_name(3, 120) == "vid3_frame_120.jpg"
    names = [naming.frame_name(1, i) for i in (10, 2, 100, 1)]
    assert sorted(names, key=naming.frame_sort_key) == [
        "vid1_frame_1.jpg", "vid1_frame_2.jpg",
        "vid1_frame_10.jpg", "vid1_frame_100.jpg"]


def test_manual_intervals_csv_roundtrip(tmp_path):
    mi = labels_mod.ManualIntervals()
    mi.intervals["left"].append((1, 1, 420))
    mi.intervals["right"].append((1, 500, 900))
    mi.intervals["none"].append((2, 10, 20))
    p = str(tmp_path / "manual_intervals.csv")
    mi.to_csv(p)
    mi2 = labels_mod.ManualIntervals.from_csv(p)
    assert mi2.intervals == mi.intervals

    assert mi2.class_from_frame("vid1_frame_420.jpg") == "left"
    assert mi2.class_from_frame("vid1_frame_421.jpg") == "ignore"
    assert mi2.class_from_frame("vid1_frame_500.jpg") == "right"
    assert mi2.class_from_frame("vid2_frame_15.jpg") == "none"
    assert mi2.class_from_frame("vid3_frame_15.jpg") == "ignore"


def test_manual_intervals_skips_malformed_cells(tmp_path):
    # Ragged/NaN-ish cells (reference CSVs have them) must be skipped,
    # not crash the load — including a malformed END token ('nan').
    p = str(tmp_path / "manual_intervals.csv")
    with open(p, "w") as f:
        f.write("left_start,left_end,right_start,right_end,"
                "none_start,none_end\n")
        f.write("vid1_5,nan,vid1_10,vid1_20,,\n")
        f.write("vid1_30,vid1_40,nan,vid1_50,vid2_1,vid2_9\n")
    mi = labels_mod.ManualIntervals.from_csv(p)
    assert mi.intervals["left"] == [(1, 30, 40)]
    assert mi.intervals["right"] == [(1, 10, 20)]
    assert mi.intervals["none"] == [(2, 1, 9)]


def test_load_samples_ignores_stray_files_in_clip_dirs(tmp_path):
    # A .DS_Store (or notes.txt) inside a clip dir must not crash the
    # scan or inflate num_frames / skew t_norm.
    import os

    template, clip_labels, events = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1,), clips_per_vid=1, frames_per_clip=4)
    clip_dir = next(iter(clip_labels))
    open(os.path.join(clip_dir, ".DS_Store"), "w").close()
    open(os.path.join(clip_dir, "notes.txt"), "w").close()
    recs = samples.load_samples((1,), template, clip_labels, events)
    assert len(recs) == 4
    assert recs[-1]["t_norm"] == 1.0  # num_frames not inflated by strays


def test_clip_labels_roundtrip(tmp_path):
    p = str(tmp_path / "clips_label.csv")
    labels_mod.save_clip_labels({"/a/clip0": 1, "/a/clip1": -1}, p)
    got = labels_mod.load_clip_labels(p)
    assert got == {"/a/clip0": 1, "/a/clip1": -1}


def test_frame_event_status():
    ev = {"event_make": [[10, 20]], "event_miss": [[30, 40]],
          "event_none": [[50, 60]]}
    assert labels_mod.frame_event_status(15, ev) == ("event-made", 2)
    assert labels_mod.frame_event_status(35, ev) == ("event-miss", 1)
    assert labels_mod.frame_event_status(55, ev) == ("event-none", 0)
    assert labels_mod.frame_event_status(5, ev) == ("", -1)


def test_chunk_event_label_rule():
    assert chunks_mod.chunk_event_label([2, 2, 2, 0, 0]) == 2
    assert chunks_mod.chunk_event_label([1, 1, 1, 0, 0]) == 1
    assert chunks_mod.chunk_event_label([2, 2, 0, 0, 0]) == 0  # below threshold
    assert chunks_mod.chunk_event_label([2, 2, 2, 1, 1, 1]) == 2  # make ties win
    assert chunks_mod.chunk_event_label([2, 2, 2, 1, 1, 1, 1]) == 1


def test_load_samples_and_build_chunks(tmp_path):
    template, clip_labels, events = synthetic.make_mini_dataset(
        str(tmp_path), vids=(1, 2), clips_per_vid=2, frames_per_clip=16)
    recs = samples.load_samples((1, 2), template, clip_labels, events)
    assert len(recs) == 2 * 2 * 16
    r = recs[0]
    assert set(r) >= {"pth", "side", "t_norm", "clip_num", "vid_num",
                      "label", "status", "status_id"}
    assert 0 < r["t_norm"] <= 1.0

    ch = chunks_mod.build_chunks(recs, chunk_size=8, chunk_stride=4)
    # Each 16-frame clip yields 3 chunks at size 8 stride 4.
    assert len(ch) == 4 * 3
    c = ch[0]
    assert len(c["frames"]) == 8
    assert c["end_idx"] - c["start_idx"] == 7
    assert 0 <= c["t_center"] <= 1
    # Event chunks must exist (4 event frames in each clip's middle).
    assert any(x["status_id"] in (1, 2) for x in ch)
    # Chunks from short clips are dropped.
    short = chunks_mod.build_chunks(recs[:4], chunk_size=8, chunk_stride=4)
    assert short == []


def test_oversample_balances():
    base = []
    for i in range(30):
        base.append({"status_id": 0, "i": i})
    for i in range(6):
        base.append({"status_id": 1, "i": i})
    for i in range(3):
        base.append({"status_id": 2, "i": i})
    out = chunks_mod.oversample_chunk_samples(base, target="max", seed=1)
    counts = {k: sum(1 for x in out if x["status_id"] == k) for k in (0, 1, 2)}
    assert counts == {0: 30, 1: 30, 2: 30}


def test_preprocess_frame_and_load(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "frames"), 1, [("left", 3)], size=(48, 64))
    img = preprocess.preprocess_frame(paths[0], size=(24, 32))
    assert img.shape == (24, 32, 3) and img.dtype == np.uint8
    batch = preprocess.load_frames(paths, preprocess.PreprocessSpec(
        size=(24, 32)), num_workers=2)
    assert batch.shape == (3, 24, 32, 3)
    # Left-side frames are brighter on the left half.
    assert batch[0, :, :16].mean() > batch[0, :, 16:].mean()


def test_resize_area_integer_factor_is_block_mean():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    out = preprocess.resize_area(img, (4, 6))
    blocks = img.astype(np.float64).reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_array_equal(out, np.floor(blocks + 0.5).astype(np.uint8))


def _brute_area(img, h, w):
    """Direct O(out*in) fractional pixel-area average — the INTER_AREA
    definition, written independently of the separable fast path.
    (cv2 itself is not installed in this image; note PIL's BOX filter is
    NOT an oracle here — it weights by pixel-center inclusion, not
    fractional area.)"""
    hi, wi = img.shape[:2]
    sy, sx = hi / h, wi / w
    out = np.zeros((h, w, img.shape[2]))
    for i in range(h):
        for j in range(w):
            y0, y1, x0, x1 = i * sy, (i + 1) * sy, j * sx, (j + 1) * sx
            acc, wsum = 0.0, 0.0
            for yy in range(int(y0), int(np.ceil(y1))):
                for xx in range(int(x0), int(np.ceil(x1))):
                    wgt = ((min(y1, yy + 1) - max(y0, yy))
                           * (min(x1, xx + 1) - max(x0, xx)))
                    acc += wgt * img[yy, xx].astype(np.float64)
                    wsum += wgt
            out[i, j] = acc / wsum
    return np.floor(out + 0.5).astype(np.uint8)


@pytest.mark.parametrize("shape,size", [((25, 40), (10, 16)),
                                        ((54, 96), (24, 40)),
                                        ((27, 48), (9, 19))])
def test_resize_area_fractional_matches_brute_force(shape, size):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ours = preprocess.resize_area(img, size).astype(np.int16)
    ref = _brute_area(img, *size).astype(np.int16)
    assert np.abs(ours - ref).max() <= 1  # float-order rounding only
    assert (ours != ref).mean() < 0.01


def test_resize_area_upscale_falls_back_to_bilinear():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(10, 10, 3), dtype=np.uint8)
    out = preprocess.resize_area(img, (20, 24))
    assert out.shape == (20, 24, 3) and out.dtype == np.uint8


def test_resize_frame_area_path_without_cv2():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(54, 96, 3), dtype=np.uint8)
    out = preprocess.resize_frame(img, (27, 48), interpolation="area")
    np.testing.assert_array_equal(out, preprocess.resize_area(img, (27, 48)))


def test_normalize_host_matches_spec():
    spec = preprocess.HF_VIT_SPEC
    x = np.full((1, 2, 2, 3), 255, np.uint8)
    out = preprocess.normalize_host(x, spec)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    x0 = np.zeros((1, 2, 2, 3), np.uint8)
    np.testing.assert_allclose(preprocess.normalize_host(x0, spec), -1.0,
                               atol=1e-6)
