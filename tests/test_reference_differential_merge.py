"""Differential tests: the reference's MERGE-CLIPS SCRIPT as the oracle
(reference: nba_proj/merge_clips.py — a module-level pipeline over
hardcoded '/home/vasantgc/...' paths; executed here with only that path
prefix rewritten into a temp world, cur_vid='vid4' as shipped).

Agreement pinned: same-side adjacent clips merge when they overlap or
the gap is <= 30; none-side clips are dropped from the merged output
(and do NOT break a merge chain running across them, since the script
skips them before updating its prev-type state); identical output dir
names and frame sets, rebuilt from the full frame pool.

Documented divergences asserted (not hidden):

- 3+-clip merge chains: after merging clips A+B the reference resets its
  running interval to B's own bounds, so when C also merges it deletes
  the A+B dir and rebuilds from B.start..C.end — silently dropping A's
  frames. Ours keeps the full A.start..C.end range (capability, not the
  data-loss quirk).
- the reference takes min()/max() of frame FILENAMES (lexicographic), so
  clip ranges whose frame numbers cross a digit-length boundary pick
  wrong endpoints; the worlds here use same-width numbers, and ours
  compares numerically everywhere.

Skipped when no reference tree is present.
"""

import os
import types

import pytest

from _ref_oracle import REF_ROOT

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


def _make_world(root, clips):
    """clips: list of (clip_num, side, start, end). Builds the pool,
    the source clip dirs, and the output dirs the script requires to
    pre-exist."""
    pool = root / "ims"
    pool.mkdir()
    src = root / "clips_hmm_final_vid4"
    src.mkdir()
    (root / "clips_finalized_vid4").mkdir()
    (root / "clips_finalized_vid2").mkdir()  # the script's tail lists it
    for k, side, s, e in clips:
        cdir = src / f"vid4_clip_{k}_{side}"
        cdir.mkdir()
        for n in range(s, e + 1):
            (cdir / f"vid4_frame_{n}.jpg").write_bytes(b"jpg")
            p = pool / f"vid4_frame_{n}.jpg"
            if not p.exists():
                p.write_bytes(b"jpg")
    return pool, src


def _run_ref_merge(root):
    path = os.path.join(REF_ROOT, "merge_clips.py")
    with open(path) as f:
        src = f.read()
    needle = "/home/vasantgc/venv/nba_proj/data/unseen_test_images"
    assert needle in src
    mod = types.ModuleType("ref_merge_run")
    mod.__file__ = path
    exec(compile(src.replace(needle, str(root)), path, "exec"),
         mod.__dict__)


def _tree(out_root):
    return {d: sorted(os.listdir(os.path.join(out_root, d)))
            for d in sorted(os.listdir(out_root))}


def test_merge_matches_reference_pairwise(tmp_path, capsys):
    """Pair merges, a none clip inside a merge chain, a side switch, and
    a beyond-gap clip: identical output trees."""
    from vit_research_tpu.segment.clips import merge_clip_dirs

    clips = [(1, "left", 100, 160), (2, "none", 165, 180),
             (3, "left", 185, 220), (4, "right", 300, 340),
             (5, "left", 400, 450)]
    ref_root = tmp_path / "ref"
    ref_root.mkdir()
    _make_world(ref_root, clips)
    _run_ref_merge(ref_root)
    capsys.readouterr()  # the script prints its whole walk
    ref_tree = _tree(str(ref_root / "clips_finalized_vid4"))

    our_root = tmp_path / "ours"
    our_root.mkdir()
    pool, src = _make_world(our_root, clips)
    out = our_root / "merged"
    merge_clip_dirs([str(src / d) for d in sorted(os.listdir(src))],
                    str(pool), str(out), max_gap=30)
    assert _tree(str(out)) == ref_tree
    assert set(ref_tree) == {"vid4_clip_1_left", "vid4_clip_2_right",
                             "vid4_clip_3_left"}
    assert ref_tree["vid4_clip_1_left"][0] == "vid4_frame_100.jpg"
    assert ref_tree["vid4_clip_1_left"][-1] == "vid4_frame_220.jpg"


def test_merge_chain_documented_divergence(tmp_path, capsys):
    """A 3-clip chain: the reference output starts at the SECOND clip's
    first frame (its interval-reset quirk drops clip A); ours keeps the
    full chain (reference: nba_proj/merge_clips.py:85-95,107-108)."""
    from vit_research_tpu.segment.clips import merge_clip_dirs

    clips = [(1, "left", 100, 150), (2, "left", 160, 200),
             (3, "left", 210, 260)]
    ref_root = tmp_path / "ref"
    ref_root.mkdir()
    _make_world(ref_root, clips)
    _run_ref_merge(ref_root)
    capsys.readouterr()
    ref_tree = _tree(str(ref_root / "clips_finalized_vid4"))
    assert set(ref_tree) == {"vid4_clip_1_left"}
    # the pool only holds frames inside the source clip ranges, so the
    # rebuilt dirs contain the pooled frames within each span
    assert ref_tree["vid4_clip_1_left"][0] == "vid4_frame_160.jpg"  # quirk
    assert len(ref_tree["vid4_clip_1_left"]) == (200 - 160 + 1) + \
        (260 - 210 + 1)

    our_root = tmp_path / "ours"
    our_root.mkdir()
    pool, src = _make_world(our_root, clips)
    out = our_root / "merged"
    merge_clip_dirs([str(src / d) for d in sorted(os.listdir(src))],
                    str(pool), str(out), max_gap=30)
    tree = _tree(str(out))
    assert set(tree) == {"vid4_clip_1_left"}
    assert tree["vid4_clip_1_left"][0] == "vid4_frame_100.jpg"
    assert len(tree["vid4_clip_1_left"]) == (150 - 100 + 1) + \
        (200 - 160 + 1) + (260 - 210 + 1)
