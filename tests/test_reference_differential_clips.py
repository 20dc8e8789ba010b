"""Differential tests round 5: the reference's CLIP-EXTRACTION layer
(decoded label sequence -> clip directories on disk) as the oracle.

Two reference generations exist:

- ``smarter_generate_clips.save_clips_from_sequence`` (the current path,
  reference: nba_proj/smarter_generate_clips.py:297-338) — index-based
  streak extraction with clamped +/-pad, 'none' skipped, ``>= min_len``.
  Our ``segment.clips.save_clips_from_sequence`` re-designs exactly this
  contract; the differential compares the resulting directory TREES
  file-for-file.
- ``generate_clips_hmm.generate_clip_intervals`` (the older kNN+HMM
  path, reference: nba_proj/generate_clips_hmm.py:135-177) — strict
  ``streak > 100``, +/-100 by frame NUMBER without clamping, plus three
  quirks we deliberately do not reproduce: the final trailing run is
  ALWAYS stored (any length, any side, unpadded); an edge run is
  extended past the sequence (negative frame numbers); and the streak
  counter is off by one for every run but the first (on a run change it
  resets to 0 AT the new run's first index without counting it, so an
  interior run of length L scores streak L-1 and needs L >= 102 to pass
  ``> 100``, while the sequence-initial run counts its index 0 and
  qualifies at L >= 101). The differential pins exact agreement in the
  interior (where index-pad == number-pad) and asserts the quirks on
  the reference so the divergence stays documented, not hidden.

Skipped when no reference tree is present.
"""

import os

import numpy as np
import pytest

from _ref_oracle import (REF_ROOT, load_module as _load_module,
                         load_truncated as _load_truncated,
                         stub_set as _stub_set)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


@pytest.fixture(scope="module")
def ref_smarter():
    """smarter_generate_clips.py with its heavy imports stubbed (tf /
    model-garden never touched by the clip writer; torch+cv2 are real)."""
    pytest.importorskip("torch")
    pytest.importorskip("cv2")
    return _load_module("ref_smarter_clips", "smarter_generate_clips.py",
                        _stub_set("chroma", "official", "tf"))


@pytest.fixture(scope="module")
def ref_gch(tmp_path_factory):
    """generate_clips_hmm.py helpers (truncated before the frame loop);
    its prelude lists a data dir and builds a 20001-frame HMM lattice."""
    root = tmp_path_factory.mktemp("gch_clips")
    (root / "data" / "unseen_test_images" / "ims_vid5").mkdir(parents=True)
    return _load_truncated(
        "ref_gch_clips", "generate_clips_hmm.py", "test_ims = sorted",
        _stub_set("chroma", "official", "tf", "joblib"), cwd=str(root))


def _runs(rng, n, lengths=(1, 60)):
    """Random decoded sequence of plateau runs over left/right/none."""
    out = []
    while len(out) < n:
        out.extend([rng.choice(["left", "right", "none"])]
                   * int(rng.integers(*lengths)))
    return out[:n]


def _tree(root):
    return {d: sorted(os.listdir(os.path.join(root, d)))
            for d in sorted(os.listdir(root))}


def test_save_clips_from_sequence_matches_reference(ref_smarter, tmp_path):
    """Directory-tree equality on random and crafted sequences: same
    clip dirs (ids, sides), same frames in each (clamped padding,
    >= min_len keep, 'none' skipped, trailing-run handling)
    (reference: nba_proj/smarter_generate_clips.py:297-338)."""
    from vit_research_tpu.segment.clips import save_clips_from_sequence

    min_len, pad = 30, 17
    rng = np.random.default_rng(7)
    cases = [_runs(rng, 600) for _ in range(3)] + [
        ["left"] * min_len + ["none"] * 200,          # exactly min_len
        ["left"] * (min_len - 1) + ["none"] * 200,    # one short: dropped
        ["none"] * 150 + ["right"] * 80,              # streak to the end
        ["none"] * 120,                               # no clips at all
        ["right"] * 300,                              # one run, whole seq
    ]
    for ci, decoded in enumerate(cases):
        n = len(decoded)
        # non-contiguous frame numbers prove both sides slice by INDEX
        names = [f"vid7_frame_{1000 + 3 * i}.jpg" for i in range(n)]
        src = tmp_path / f"src{ci}"
        src.mkdir()
        for f in names:
            (src / f).write_bytes(b"x")
        out_ref = tmp_path / f"ref{ci}"
        out_ours = tmp_path / f"ours{ci}"
        ref_smarter.save_clips_from_sequence(
            list(decoded), list(names), str(src), out_root=str(out_ref),
            min_len=min_len, pad=pad, vid="vid7")
        save_clips_from_sequence(
            list(decoded), list(names), str(src), str(out_ours),
            min_len=min_len, pad=pad, vid=7)
        assert _tree(out_ref) == _tree(out_ours), f"case {ci}"


def _record_store_clip(ref_gch):
    calls = []
    orig = ref_gch.store_clip
    ref_gch.store_clip = lambda s, e, d: calls.append((s, e, d))
    return calls, orig


def test_generate_clip_intervals_interior_matches_ours(ref_gch):
    """In the interior (runs >100 frames from both ends, consecutive
    numbering) the older path's number-based +/-100 extension equals our
    index-based clamped pad with min_len=102 (its `streak > 100` counts
    an interior run of length L as L-1 — see module docstring)
    (reference: nba_proj/generate_clips_hmm.py:135-177)."""
    from vit_research_tpu.segment.clips import clip_intervals_from_decoded

    # none(150) left(120) none(130) right(102) none(140) -> two interior
    # qualifying runs; trailing none run is short (handled separately).
    decoded = (["none"] * 150 + ["left"] * 120 + ["none"] * 130
               + ["right"] * 102 + ["none"] * 140)
    base = 5000
    names = [f"vid5_frame_{base + i}.jpg" for i in range(len(decoded))]

    calls, orig = _record_store_clip(ref_gch)
    try:
        ref_gch.generate_clip_intervals(list(decoded), list(names))
    finally:
        ref_gch.store_clip = orig

    ours = clip_intervals_from_decoded(decoded, min_len=102, pad=100)
    expected = [(names[iv.start], names[iv.end], iv.side) for iv in ours]
    # the reference's last call is the trailing-run quirk; before it, the
    # qualifying interior runs, extended +/-100 by frame number
    assert calls[:-1] == expected
    assert [c[2] for c in calls[:-1]] == ["left", "right"]


def test_generate_clip_intervals_reference_quirks(ref_gch):
    """The quirks we deliberately do NOT reproduce, pinned on the
    reference so the divergence stays documented:

    - the final run is ALWAYS stored — unpadded, any length, even 'none'
      (reference: nba_proj/generate_clips_hmm.py:177);
    - a qualifying run at the sequence edge is extended past it by frame
      NUMBER, yielding names of frames that do not exist (:155-161);
    - the streak counter is off by one for interior runs (reset to 0 at
      the new run's first index, :170-173): interior length 102
      qualifies, 101 does not — but a sequence-INITIAL run counts its
      index 0 and qualifies at 101.
    """
    from vit_research_tpu.segment.clips import clip_intervals_from_decoded

    base = 50
    # qualifying left run at the very start; short trailing none run
    decoded = ["left"] * 110 + ["none"] * 20
    names = [f"vid5_frame_{base + i}.jpg" for i in range(len(decoded))]
    calls, orig = _record_store_clip(ref_gch)
    try:
        ref_gch.generate_clip_intervals(list(decoded), list(names))
    finally:
        ref_gch.store_clip = orig
    # edge run: start extended to frame number base-100 = -50 (no clamp)
    assert calls[0] == (f"vid5_frame_{base - 100}.jpg",
                        f"vid5_frame_{base + 109 + 100}.jpg", "left")
    # trailing 20-frame 'none' run stored verbatim
    assert calls[-1] == (names[110], names[-1], "none")
    # ours: clamped to the sequence (end 109+100 -> 129), no trailing run
    ours = clip_intervals_from_decoded(decoded, min_len=101, pad=100)
    assert [(iv.start, iv.end, iv.side) for iv in ours] == [(0, 129, "left")]

    # streak boundaries: interior run needs 102 (first frame uncounted);
    # a sequence-initial run counts its index 0, so 101 suffices there
    for prefix, run, stored in (
            (150, 102, True), (150, 101, False),   # interior
            (0, 101, True), (0, 100, False)):      # sequence-initial
        decoded = ["none"] * prefix + ["right"] * run + ["none"] * 150
        names = [f"vid5_frame_{i}.jpg" for i in range(len(decoded))]
        calls, orig = _record_store_clip(ref_gch)
        try:
            ref_gch.generate_clip_intervals(list(decoded), list(names))
        finally:
            ref_gch.store_clip = orig
        assert (len(calls) == 2) == stored, (prefix, run)  # store + trailing
