"""Differential tests: the reference's MANUAL-INTERVAL LABEL PARSERS as
oracles — ``generate_manual_intervals`` + ``class_from_frame``, which the
reference duplicates (with drift!) across three embedding-writer scripts
(reference: nba_proj/write_per_vid_embeddings_chroma.py:19-60,114-148;
write_embeddings.py:15-91,127-152; write_per_video_embeddings.py).

The three reference copies do NOT agree:

- the chroma-writer variant checks left, right AND none intervals and
  falls back to 'ignore' for unlabeled frames — this is the variant our
  ``data.labels.ManualIntervals`` reproduces exactly;
- both npz-writer variants check only left/right intervals and fall back
  to 'none' (any unlabeled frame lands in the none CLASS — including
  frames inside explicit none intervals, which happen to agree by
  accident of the fallback);
- only the npz-writer variants drop rows whose tokens are vid1 frames
  at CSV parse ("vid1 is not a full game"); the chroma-writer variant
  keeps them, as do we. All variants force-'ignore' vid3 frames
  1..4900; ours takes that window as a configurable ignore list.

Loaded truncated (the scripts run their pipeline at module scope) with
a synthetic manual_intervals.csv in cwd. Skipped when no reference tree
is present.
"""

import os

import pytest

from _ref_oracle import REF_ROOT, load_truncated, stub_set

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")

CSV = """left_start,left_end,right_start,right_end,none_start,none_end
vid2_100,vid2_200,vid2_300,vid2_400,vid2_500,vid2_600
vid1_10,vid1_20,vid3_5000,vid3_5100,,
vid4_1000,vid4_1200,,,vid2_700,vid2_800
"""

# Probe grid: interval interiors, both boundaries, off-by-one outside,
# the vid3 force-ignore window edges, unlabeled frames, and (last) vid1
# frames from the row the reference drops.
FRAMES = [f"vid{v}_frame_{n}.jpg" for v, n in [
    (2, 99), (2, 100), (2, 150), (2, 200), (2, 201),
    (2, 299), (2, 300), (2, 400), (2, 401),
    (2, 499), (2, 500), (2, 600), (2, 601),
    (2, 699), (2, 700), (2, 800), (2, 801),
    (3, 1), (3, 2500), (3, 4900), (3, 4901), (3, 4999),
    (3, 5000), (3, 5050), (3, 5100), (3, 5101),
    (4, 999), (4, 1000), (4, 1100), (4, 1200), (4, 1201),
    (5, 1), (5, 12345),
    (1, 10), (1, 15), (1, 20),
]]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = tmp_path_factory.mktemp("labels")
    (root / "data").mkdir()
    (root / "data" / "manual_intervals.csv").write_text(CSV)
    return root


@pytest.fixture(scope="module")
def ref_chroma_writer(world):
    pytest.importorskip("pandas")
    return load_truncated(
        "ref_chroma_writer", "write_per_vid_embeddings_chroma.py",
        "frames_path = ", stub_set("chroma", "official", "tf", "skvideo"),
        cwd=str(world))


@pytest.fixture(scope="module")
def ref_npz_writer(world):
    pytest.importorskip("pandas")
    return load_truncated(
        "ref_npz_writer", "write_embeddings.py",
        "frames_path = ", stub_set("official", "tf", "skvideo"),
        cwd=str(world))


@pytest.fixture(scope="module")
def ours(world):
    from vit_research_tpu.data.labels import ManualIntervals
    mi = ManualIntervals.from_csv(str(world / "data" /
                                      "manual_intervals.csv"))
    # the reference's hardcoded vid3 none-frame limiter
    mi.ignore.append((3, 1, 4900))
    return mi


def test_interval_parse_matches_reference(ref_chroma_writer, ours):
    """generate_manual_intervals token pairs == our (vid, start, end)
    triples, vid1 rows included — only the npz-writer copies drop those
    (reference: nba_proj/write_per_vid_embeddings_chroma.py:19-60)."""
    for side in ("left", "right", "none"):
        ref_pairs = {(s, e) for s, e in ref_chroma_writer.im_ranges[side]}
        ours_pairs = {(f"vid{v}_{s}", f"vid{v}_{e}")
                      for v, s, e in ours.intervals[side]}
        assert ref_pairs == ours_pairs, side
    assert ("vid1_10", "vid1_20") in {
        (s, e) for s, e in ref_chroma_writer.im_ranges["left"]}


def test_class_from_frame_matches_chroma_variant(ref_chroma_writer, ours):
    """Exact agreement with the three-side / 'ignore'-fallback variant on
    EVERY probe frame, vid1 included (reference:
    nba_proj/write_per_vid_embeddings_chroma.py:114-148)."""
    for frame in FRAMES:
        assert ours.class_from_frame(frame) == \
            ref_chroma_writer.class_from_frame(frame), frame


def test_npz_writer_variant_documented_drift(ref_chroma_writer,
                                             ref_npz_writer, ours):
    """The npz-writer copy drops vid1 rows at parse, never checks none
    intervals, and falls back to 'none': agreement with ours on
    left/right/explicit-none frames, 'none'-vs-'ignore' on unlabeled
    ones (reference: nba_proj/write_embeddings.py:15-91,127-152)."""
    assert not any(s.startswith("vid1_")
                   for s, _ in ref_npz_writer.im_ranges["left"])
    for frame in FRAMES:
        if frame.startswith("vid1_"):
            # row dropped there -> unlabeled -> the 'none' fallback
            assert ref_npz_writer.class_from_frame(frame) == "none"
            continue
        npz_cls = ref_npz_writer.class_from_frame(frame)
        chroma_cls = ref_chroma_writer.class_from_frame(frame)
        got = ours.class_from_frame(frame)
        if chroma_cls in ("left", "right", "none"):
            # inside an explicit interval: all three agree ('none'
            # agreement is via the npz variant's fallback)
            assert npz_cls == chroma_cls == got, frame
        else:
            # unlabeled: npz variant buckets it as the none CLASS,
            # the chroma variant (and ours) ignore it — except inside
            # the vid3 window, where all say 'ignore'
            v3 = frame.startswith("vid3_") and \
                int(frame.split("_")[2].split(".")[0]) <= 4900
            assert got == chroma_cls == "ignore", frame
            assert npz_cls == ("ignore" if v3 else "none"), frame


def test_label_array_mapping(ours):
    """label_array uses the TemporalHead convention -1/0/1/2 over the
    same class_from_frame semantics
    (reference: nba_proj/smarter_generate_clips.py:102-140)."""
    arr = ours.label_array(["vid2_frame_150.jpg", "vid2_frame_350.jpg",
                            "vid2_frame_550.jpg", "vid5_frame_1.jpg"])
    assert arr == [0, 1, 2, -1]
