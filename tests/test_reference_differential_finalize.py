"""Differential tests: the reference's FINALIZE-CLIPS SCRIPT as the
oracle (reference: nba_proj/finalize_clips.py — a module-level pipeline
over hardcoded '/home/vasantgc/...' paths; executed here whole with only
that path prefix rewritten into a temp world, cur_vid='vid4' as
shipped). The TF-Model-Garden ViT / cv2 / chroma externals are stubbed
to a deterministic channel: each frame's embedding encodes its frame
number, and the 5-NN query returns fixture neighbors whose stored
left/right/none probs are the designed per-frame emission (all five
neighbors share the triple, so the reference's stored-prob MEAN — the
only part of determine_class that feeds its HMM, finalize_clips.py:67-83
— equals the triple exactly, matching what our frame_probs_fn is handed).

Agreement pinned: same clip-dir names; per-clip HMM smoothing of the
5-NN probabilities keeps only frames whose decoded state matches the
clip label; interior drop segments agree modulo the documented shift;
pre-existing output dirs are skipped untouched (idempotent re-runs).

Documented divergences asserted (not hidden) — the reference's per-clip
composition quirks (SURVEY §2.4 / §7 "faithful quirk handling"):

- EVERY clip's first two frames drop: the backtrace leaves
  decoded[0:2] = -1 (hmm.py:116-124), which never equals the label.
- Interior keep/drop boundaries land 2 frames late on the FIRST clip
  the script processes and 3 frames late on every later clip: its
  `add_first` flag goes False after the first frame ever and the
  lattice is recreated per clip (finalize_clips.py:133,170-174,192), so
  later clips push every frame through add_col_to_lattice — one extra
  count increment — on top of the decode's inherent off-by-ones
  (column k is frame k-1 or k-2, and the backtrace reads
  backpointers[cur][i-1], hmm.py:124). Empirically (asserted below):
  ref keeps clip-local frame j  iff  j >= 2 and (j < s or ours[j - s]),
  with s=2 for the first-processed clip and s=3 for later ones.
  Which clip runs first follows os.listdir order, so the multi-clip
  test identifies the roles from the outputs and requires exactly one
  clip to have gotten the s=2 treatment.

Ours (segment/clips.py::finalize_clip_dirs) is the capability version:
a fresh, correctly-indexed decode per clip — no dropped frames, no
shift.

Skipped when no reference tree is present.
"""

import contextlib
import io
import os
import types

import numpy as np
import pytest

from _ref_oracle import REF_ROOT, ref_import_env

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")

L = (0.97, 0.02, 0.01)   # decisively left
N = (0.01, 0.02, 0.97)   # decisively none


def _frame_num(path):
    return int(os.path.basename(path).split("_")[2].split(".")[0])


def _stubs(probs_by_frame):
    """cv2/vit/chroma stubs forming the deterministic frame->probs
    channel described in the module docstring."""
    cv2 = types.ModuleType("cv2")
    cv2.COLOR_BGR2RGB = 4
    cv2.INTER_AREA = 3
    cv2.imread = lambda p: np.full((2, 2, 3), _frame_num(p), dtype=np.float64)
    cv2.cvtColor = lambda im, code: im
    cv2.resize = lambda im, size, interpolation=None: im

    class _Model:
        def load_weights(self, *a, **k):
            pass

        def predict(self, arr, batch_size=1, verbose=0):
            num = int(round(float(np.asarray(arr).flat[0])))
            return {"pre_logits": np.full((1, 768), num, dtype=np.float32)}

    vit_mod = types.ModuleType("official.vision.modeling.backbones.vit")
    vit_mod.VisionTransformer = lambda **k: _Model()

    class _Collection:
        def query(self, query_embeddings=None, n_results=5):
            num = int(round(float(np.asarray(query_embeddings)[0][0])))
            l, r, n = probs_by_frame[num]
            lab = ("left", "right", "none")[int(np.argmax([l, r, n]))]
            md = [{"label": lab, "left_prob": l, "right_prob": r,
                   "none_prob": n} for _ in range(n_results)]
            return {"ids": [[f"nb{j}" for j in range(n_results)]],
                    "metadatas": [md],
                    "distances": [[0.1 * j for j in range(n_results)]]}

    class _Client:
        def __init__(self, *a, **k):
            pass

        def get_or_create_collection(self, *a, **k):
            return _Collection()

    chromadb = types.ModuleType("chromadb")
    chromadb.PersistentClient = _Client

    def _mod(name):
        m = types.ModuleType(name)
        m.__path__ = []
        return m

    class _Layers:
        InputSpec = staticmethod(lambda **k: None)

    tf_keras = _mod("tf_keras")
    tf_keras.layers = _Layers
    backbones = _mod("official.vision.modeling.backbones")
    backbones.vit = vit_mod  # `from ... import vit` binds the attribute
    return {
        "cv2": cv2,
        "chromadb": chromadb,
        "tensorflow": _mod("tensorflow"),
        "tf_keras": tf_keras,
        "official": _mod("official"),
        "official.vision": _mod("official.vision"),
        "official.vision.modeling": _mod("official.vision.modeling"),
        "official.vision.modeling.backbones": backbones,
        "official.vision.modeling.backbones.vit": vit_mod,
    }


def _make_world(root, clips):
    """clips: list of (k, side, [frame numbers]). Builds the source clip
    dirs and the (required pre-existing) output root."""
    main = root / "clips_hmm_smooth_vid4"
    main.mkdir()
    (root / "clips_hmm_final_vid4").mkdir()
    for k, side, nums in clips:
        d = main / f"vid4_clip_{k}_{side}"
        d.mkdir()
        for n in nums:
            (d / f"vid4_frame_{n}.jpg").write_bytes(b"jpg")
    return main


def _run_ref_finalize(root, probs_by_frame):
    path = os.path.join(REF_ROOT, "finalize_clips.py")
    with open(path) as f:
        src = f.read()
    needle = "/home/vasantgc/venv/nba_proj/data/unseen_test_images"
    assert needle in src
    mod = types.ModuleType("ref_finalize_run")
    mod.__file__ = path
    with ref_import_env(_stubs(probs_by_frame)):
        with contextlib.redirect_stdout(io.StringIO()):  # per-frame spam
            exec(compile(src.replace(needle, str(root)), path, "exec"),
                 mod.__dict__)


def _tree(out_root):
    return {d: sorted((_frame_num(f)
                       for f in os.listdir(os.path.join(out_root, d))))
            for d in sorted(os.listdir(out_root))}


def _ours(root, probs_by_frame, main):
    from vit_research_tpu.segment.clips import finalize_clip_dirs

    def probs_fn(paths):
        return np.array([probs_by_frame[_frame_num(p)] for p in paths],
                        dtype=np.float32)

    out = root / "ours_final"
    dirs = sorted(str(main / d) for d in os.listdir(main))
    finalize_clip_dirs(dirs, probs_fn, str(out))
    return _tree(str(out))


def _expected_ref(frames, ours_kept, shift):
    """The empirical composition law from the module docstring."""
    kept = set(ours_kept)
    return sorted(n for j, n in enumerate(frames)
                  if j >= 2 and (j < shift or frames[j - shift] in kept))


def test_finalize_constant_clip_drops_first_two(tmp_path):
    """One clip, uniformly-left emissions: the reference keeps all but
    the first two frames (decoded[0:2] stay -1); ours keeps all."""
    frames = list(range(60))
    pb = {n: L for n in frames}
    main = _make_world(tmp_path, [(1, "left", frames)])
    _run_ref_finalize(tmp_path, pb)
    ref = _tree(str(tmp_path / "clips_hmm_final_vid4"))
    ours = _ours(tmp_path, pb, main)
    assert set(ref) == set(ours) == {"vid4_clip_1_left"}
    assert ours["vid4_clip_1_left"] == frames
    assert ref["vid4_clip_1_left"] == frames[2:]


def test_finalize_interior_boundary_first_clip_shift(tmp_path):
    """One clip, a 20-frame none segment at local 30..49: both sides
    drop the segment; the reference's boundaries land 2 frames late
    (first-processed clip) and its first two frames drop."""
    frames = list(range(400, 480))
    pb = {n: (N if 30 <= i < 50 else L) for i, n in enumerate(frames)}
    main = _make_world(tmp_path, [(1, "left", frames)])
    _run_ref_finalize(tmp_path, pb)
    ref = _tree(str(tmp_path / "clips_hmm_final_vid4"))
    ours = _ours(tmp_path, pb, main)
    assert ours["vid4_clip_1_left"] == frames[:30] + frames[50:]
    assert ref["vid4_clip_1_left"] == _expected_ref(
        frames, ours["vid4_clip_1_left"], shift=2)
    # spell the law out once concretely: dropped segment [432, 451]
    # (ours: [430, 449]), first two frames 400-401 gone
    assert ref["vid4_clip_1_left"] == (
        list(range(402, 432)) + list(range(452, 480)))


def test_finalize_later_clip_gets_extra_shift(tmp_path):
    """Two none-segment clips: whichever the script processes first gets
    the +2 boundary shift, the other +3 (its fresh lattice never sees
    add_first, adding one extra count increment). Both agree with ours
    modulo that law; exactly one clip is the first-processed one."""
    worlds = {1: list(range(500, 580)), 2: list(range(600, 680))}
    pb = {n: (N if 30 <= i < 50 else L)
          for frames in worlds.values() for i, n in enumerate(frames)}
    main = _make_world(
        tmp_path, [(k, "left", frames) for k, frames in worlds.items()])
    _run_ref_finalize(tmp_path, pb)
    ref = _tree(str(tmp_path / "clips_hmm_final_vid4"))
    ours = _ours(tmp_path, pb, main)
    shifts = {}
    for k, frames in worlds.items():
        name = f"vid4_clip_{k}_left"
        assert ours[name] == frames[:30] + frames[50:]
        matched = [s for s in (2, 3)
                   if ref[name] == _expected_ref(frames, ours[name], s)]
        assert len(matched) == 1, (name, ref[name])
        shifts[k] = matched[0]
    assert sorted(shifts.values()) == [2, 3], shifts


def test_finalize_existing_output_dir_skipped(tmp_path):
    """Idempotent re-run semantics both sides: a pre-existing output
    clip dir short-circuits before any embed/kNN work and is left
    untouched (reference: finalize_clips.py:138-140)."""
    frames = list(range(40))
    pb = {n: L for n in frames}
    main = _make_world(tmp_path, [(1, "left", frames)])
    marker = tmp_path / "clips_hmm_final_vid4" / "vid4_clip_1_left"
    marker.mkdir()
    (marker / "sentinel.jpg").write_bytes(b"keep")
    _run_ref_finalize(tmp_path, pb)
    assert os.listdir(marker) == ["sentinel.jpg"]

    from vit_research_tpu.segment.clips import finalize_clip_dirs

    def boom(paths):  # must never be called for a skipped clip
        raise AssertionError("frame_probs_fn called despite existing dst")

    out = tmp_path / "ours_final"
    out.mkdir()
    ours_marker = out / "vid4_clip_1_left"
    ours_marker.mkdir()
    (ours_marker / "sentinel.jpg").write_bytes(b"keep")
    got = finalize_clip_dirs([str(main / "vid4_clip_1_left")], boom,
                             str(out))
    assert got == [str(ours_marker)]
    assert os.listdir(ours_marker) == ["sentinel.jpg"]
