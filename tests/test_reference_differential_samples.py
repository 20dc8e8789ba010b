"""Differential test: the reference's ``load_samples`` as the oracle
(reference: nba_proj/dataset.py:75-164) — clip walking + sort order,
the clips_label.csv join (missing row and NaN both -> -1), sequential
event-interval overwrites (make -> miss -> none, later wins on overlap,
status string 'event-made'), t_norm = i/num_frames with 1-based i, the
stride-counter keep rule, and the start/end clip window.

The reference hardcodes its clip root under '/home/vasantgc/...'; it is
executed here with only that path prefix rewritten into a temp world
and cwd pointed at the label artifacts. Skipped when no reference tree
is present.
"""

import json
import os
import types

import pytest

from _ref_oracle import REF_ROOT, ref_import_env

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


def _load_ref_dataset(root):
    pytest.importorskip("tensorflow")
    path = os.path.join(REF_ROOT, "dataset.py")
    with open(path) as f:
        src = f.read()
    needle = "/home/vasantgc/venv/nba_proj/data/unseen_test_images"
    assert needle in src
    mod = types.ModuleType("ref_dataset_subst")
    mod.__file__ = path
    with ref_import_env({}):
        old = os.getcwd()
        os.chdir(root)
        try:
            exec(compile(src.replace(needle, str(root)), path, "exec"),
                 mod.__dict__)
        finally:
            os.chdir(old)
    return mod


def _ref_load_samples(mod, root, *args, **kwargs):
    """The reference reads its label artifacts from cwd at CALL time."""
    old = os.getcwd()
    os.chdir(root)
    try:
        return mod.load_samples(*args, **kwargs)
    finally:
        os.chdir(old)


def _make_world(root):
    """Four clips for vid1: labeled 1, labeled 0, NaN label, and a clip
    with no clips_label.csv row at all; events include a make/none
    overlap (none must win) and frames outside any interval."""
    clip_root = root / "smarter_clips" / "clips_hmm_smooth_vid1_smart"
    clip_specs = [(1, "left", 100, 30), (2, "right", 200, 24),
                  (3, "left", 300, 18), (4, "none", 400, 12)]
    events, label_rows = {}, []
    for k, side, base, n in clip_specs:
        cdir = clip_root / f"vid1_clip_{k}_{side}"
        cdir.mkdir(parents=True)
        for i in range(n):
            (cdir / f"vid1_frame_{base + i}.jpg").write_bytes(b"jpg")
        events[str(cdir)] = {
            "event_make": [[base + 2, base + 6]],
            "event_miss": [[base + 8, base + 10]],
            # overlaps the make tail: the none pass runs last and wins
            "event_none": [[base + 5, base + 5], [base + n - 2, base + n]],
        }
    label_rows = ["clip_path,label",
                  f"{clip_root}/vid1_clip_1_left,1",
                  f"{clip_root}/vid1_clip_2_right,0",
                  f"{clip_root}/vid1_clip_3_left,"]  # NaN; clip 4 missing
    (root / "clips_label.csv").write_text("\n".join(label_rows) + "\n")
    (root / "clip_labelling_template.json").write_text(json.dumps(events))
    return clip_root


@pytest.mark.parametrize("stride,start_clip,end_clip",
                         [(1, 0, 30), (3, 0, 30), (2, 1, 3)])
def test_load_samples_matches_reference(tmp_path, stride, start_clip,
                                        end_clip, capsys):
    from vit_research_tpu.data import labels as labels_mod
    from vit_research_tpu.data.samples import load_samples

    clip_root = _make_world(tmp_path)
    ref_mod = _load_ref_dataset(str(tmp_path))
    ref = _ref_load_samples(ref_mod, str(tmp_path), ["vid1"], stride=stride,
                            start_clip=start_clip, end_clip=end_clip)
    capsys.readouterr()

    ours = load_samples(
        [1], str(clip_root).replace("vid1", "vid{vid}"),
        labels_mod.load_clip_labels(str(tmp_path / "clips_label.csv")),
        labels_mod.load_event_template(
            str(tmp_path / "clip_labelling_template.json")),
        stride=stride, start_clip=start_clip, end_clip=end_clip)

    assert len(ours) == len(ref) > 0
    for r_ref, r_ours in zip(ref, ours):
        assert r_ours == r_ref, (r_ref, r_ours)


def test_unlabeled_and_overlap_semantics(tmp_path, capsys):
    """Spot-check the joined fields directly on the reference output:
    NaN and missing clip rows both -1; the none interval overwrites the
    overlapping make frame; 'event-made' string for makes."""
    clip_root = _make_world(tmp_path)
    ref_mod = _load_ref_dataset(str(tmp_path))
    ref = _ref_load_samples(ref_mod, str(tmp_path), ["vid1"], stride=1)
    capsys.readouterr()
    by_clip = {}
    for r in ref:
        by_clip.setdefault(r["clip_num"], []).append(r)
    assert {c[0]["label"] for c in
            (by_clip[3], by_clip[4])} == {-1}
    assert by_clip[1][0]["label"] == 1 and by_clip[2][0]["label"] == 0
    c1 = by_clip[1]
    assert c1[2]["status"] == "event-made" and c1[2]["status_id"] == 2
    assert c1[5]["status"] == "event-none" and c1[5]["status_id"] == 0
    assert c1[8]["status_id"] == 1
    assert c1[0]["status_id"] == -1 and c1[0]["status"] == ""
