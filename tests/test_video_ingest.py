"""L0 video ingest: extract_frames over a synthetic cv2 video.

Covers the reference's frame-dump semantics
(reference: nba_proj/preprocess_frames.py:59-91 — resize + windowed
frame ranges; nba_proj/script.py:45-86) on a video we synthesize with
cv2.VideoWriter, so the test needs no real broadcast footage.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vit_research_tpu.data import naming  # noqa: E402
from vit_research_tpu.data.video import extract_frames  # noqa: E402

# Bright, JPEG-robust colors (BGR order, like everything cv2 touches).
COLORS = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 255, 255),
          (255, 0, 255), (255, 255, 0), (64, 64, 64), (200, 200, 200),
          (0, 128, 255), (255, 128, 0), (128, 0, 128), (30, 200, 100)]


def _write_video(path, n_frames, h=48, w=64, fps=10):
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                             fps, (w, h))
    if not writer.isOpened():
        pytest.skip("no MJPG VideoWriter codec in this OpenCV build")
    for i in range(n_frames):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:] = COLORS[i % len(COLORS)]
        writer.write(frame)
    writer.release()


@pytest.fixture()
def tiny_video(tmp_path):
    p = str(tmp_path / "game.avi")
    _write_video(p, n_frames=12)
    return p


def test_extract_frames_all(tiny_video, tmp_path):
    out = str(tmp_path / "frames")
    paths = extract_frames(tiny_video, out, vid=3, size=(48, 64))
    # 1-indexed, every frame, reference naming.
    assert [os.path.basename(p) for p in paths] == [
        naming.frame_name(3, i) for i in range(1, 13)]
    for i, p in enumerate(paths):
        img = cv2.imread(p)
        assert img.shape == (48, 64, 3)
        # MJPG + JPEG are lossy twice over; solid colors survive loosely.
        mean = img.reshape(-1, 3).mean(axis=0)
        expect = np.array(COLORS[i % len(COLORS)], np.float64)
        assert np.abs(mean - expect).max() < 40, (i, mean, expect)


def test_extract_frames_resize(tiny_video, tmp_path):
    out = str(tmp_path / "frames")
    paths = extract_frames(tiny_video, out, vid=1, size=(24, 32))
    assert len(paths) == 12
    assert cv2.imread(paths[0]).shape == (24, 32, 3)


def test_extract_frames_window_and_stride(tiny_video, tmp_path):
    out = str(tmp_path / "frames")
    # Inclusive window 3..8, keep every 2nd absolute frame index:
    # i in 3..8 with (i-1) % 2 == 0  ->  3, 5, 7.
    paths = extract_frames(tiny_video, out, vid=2, size=(48, 64),
                           frame_range=(3, 8), every=2)
    assert [os.path.basename(p) for p in paths] == [
        naming.frame_name(2, i) for i in (3, 5, 7)]
    # Window start respects the same absolute-index stride phase.
    paths = extract_frames(tiny_video, str(tmp_path / "f2"), vid=2,
                           size=(48, 64), frame_range=(4, 8), every=2)
    assert [os.path.basename(p) for p in paths] == [
        naming.frame_name(2, i) for i in (5, 7)]


def test_extract_frames_stops_after_window(tiny_video, tmp_path):
    # frame_range upper bound short-circuits decoding; output identical
    # to decoding the whole file then filtering.
    out = str(tmp_path / "frames")
    paths = extract_frames(tiny_video, out, vid=5, size=(48, 64),
                           frame_range=(1, 2))
    assert [os.path.basename(p) for p in paths] == [
        naming.frame_name(5, 1), naming.frame_name(5, 2)]
