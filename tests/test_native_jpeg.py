"""Native JPEG decoder: builds, decodes correctly, beats PIL."""

import time

import numpy as np
import pytest

from vit_research_tpu import native
from vit_research_tpu.data import preprocess as pp
from vit_research_tpu.data import synthetic

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no compiler/libjpeg in this image")


def test_decode_matches_pil(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 4), ("right", 4)], size=(96, 128))
    target = (48, 64)
    got = native.decode_batch(paths, target)
    assert got.shape == (8, 48, 64, 3) and got.dtype == np.uint8
    ref = pp.load_frames(paths, pp.PreprocessSpec(size=target),
                         num_workers=1)
    # Different bilinear conventions (non-antialiased vs PIL filter);
    # images must agree closely in content.
    diff = np.abs(got.astype(int) - ref.astype(int)).mean()
    assert diff < 12.0
    # Side signal preserved: left half brighter for 'left' frames.
    assert got[0, :, :32].mean() > got[0, :, 32:].mean()


def test_decode_single_and_errors(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("none", 1)], size=(64, 64))
    img = native.decode_file(paths[0], (32, 32))
    assert img.shape == (32, 32, 3)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    with pytest.raises(ValueError):
        native.decode_batch([str(bad)], (32, 32))


def test_load_frames_native_path(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 3)], size=(96, 128))
    spec = pp.PreprocessSpec(size=(48, 64))
    a = pp.load_frames(paths, spec, use_native=True)
    b = pp.load_frames(paths, spec, use_native=False)
    assert a.shape == b.shape
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 12.0


def test_threaded_decode_matches_serial(tmp_path):
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 4), ("right", 5)], size=(96, 128))
    a = native.decode_batch(paths, (48, 64), num_workers=1)
    b = native.decode_batch(paths, (48, 64), num_workers=3)
    np.testing.assert_array_equal(a, b)


def test_native_faster_than_pil_on_downscale(tmp_path):
    # 1080p-ish frames downscaled to 224: scaled decode should win clearly.
    # Best-of-5, interleaved: single-run wall-clock comparisons flake on a
    # loaded 1-core box (a scheduler hiccup during either run flips the
    # sign); the min over several alternated runs is robust to load
    # spikes while still failing if the native path genuinely regresses.
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 6)], size=(540, 960))
    target = (224, 224)
    spec = pp.PreprocessSpec(size=target)
    native.decode_batch(paths, target)  # warm (build/load)
    pp.load_frames(paths, spec, num_workers=1)
    t_native, t_pil = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        native.decode_batch(paths, target)
        t_native.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        pp.load_frames(paths, spec, num_workers=1)
        t_pil.append(time.perf_counter() - t0)
    assert min(t_native) < min(t_pil), (t_native, t_pil)
