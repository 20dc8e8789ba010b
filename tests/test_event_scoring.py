"""evaluate/event_scoring.py + cli score-events: the localization
numbers the reference's harness never computed."""

import json

import pytest

from vit_research_tpu import cli
from vit_research_tpu.evaluate.event_scoring import (
    score_event_localization, truth_events_by_clip)


def _chunk(rank, sf, ef, status_id=0, **kw):
    d = {"rank": rank, "start_frame": sf, "end_frame": ef,
         "center_frame": (sf + ef) // 2 if sf is not None else None,
         "status_id": status_id, "logit": 1.0 / rank}
    d.update(kw)
    return d


def _row(vid, clip, topk, side="left", status_ids=None):
    return {"vid": vid, "clip": clip, "side": side, "topk_chunks": topk,
            "status_ids": status_ids
            or [c.get("status_id") for c in topk]}


def test_truth_events_by_clip_parses_dir_names():
    tpl = {"/data/clips/vid3_clip_7_left":
           {"event_make": [[120, 140]], "event_miss": [],
            "event_none": [[10, 20]]},
           "vid3_clip_8_right": {"event_miss": [[5, 9], [30, 31]]}}
    truth = truth_events_by_clip(tpl)
    assert truth[(3, 7)] == [(120, 140)]          # event_none excluded
    assert truth[(3, 8)] == [(5, 9), (30, 31)]
    with pytest.raises(ValueError, match="vid"):
        truth_events_by_clip({"not_a_clip_dir!": {"event_make": [[1, 2]]}})


def test_truth_events_subtract_overlapping_event_none():
    # later-category-wins (make -> miss -> none): frames inside an
    # event_none range are NOT events even when make/miss covers them,
    # matching data/labels.py::frame_event_status and the chunks' own
    # status_id ground truth
    tpl = {"vid1_clip_0_left": {"event_make": [[100, 120]],
                                "event_none": [[90, 130]]},
           "vid1_clip_1_left": {"event_make": [[100, 120]],
                                "event_none": [[110, 114]]},
           "vid1_clip_2_left": {"event_miss": [[50, 60]],
                                "event_none": [[55, 80]]}}
    truth = truth_events_by_clip(tpl)
    assert (1, 0) not in truth                     # fully overwritten
    assert truth[(1, 1)] == [(100, 109), (115, 120)]  # split by the hole
    assert truth[(1, 2)] == [(50, 54)]             # right side trimmed


def test_hit_at_k_and_center_error_with_template():
    truth = {(1, 0): [(100, 120)]}
    # rank-1 misses the event, rank-2 overlaps it
    rows = [_row(1, 0, [_chunk(1, 10, 30), _chunk(2, 95, 105)])]
    rep = score_event_localization(rows, truth, ks=(1, 2))
    assert rep["clips_scored"] == 1
    assert rep["ground_truth"] == "template"
    assert rep["hit_at"]["1"] == 0.0 and rep["hit_at"]["2"] == 1.0
    # top-1 center 20 vs event center 110 -> error 90
    assert rep["center_error_mean"] == pytest.approx(90.0)
    assert rep["per_side_hit_at"]["left"]["2"] == 1.0


def test_template_scoring_skips_unlabeled_and_frameless_clips():
    truth = {(1, 0): [(0, 10)]}
    rows = [
        _row(1, 0, [_chunk(1, None, None)]),   # no frame numbers
        _row(1, 1, [_chunk(1, 0, 5)]),         # no labeled events
    ]
    rep = score_event_localization(rows, truth, ks=(1,))
    assert rep["clips_scored"] == 0
    assert rep["clips_without_frame_numbers"] == 1
    assert rep["clips_without_events"] == 1
    assert rep["hit_at"]["1"] is None


def test_status_id_fallback_ground_truth():
    # clip A: event chunk (status 2) ranked 1st -> hit@1
    # clip B: event chunk exists in the sequence but top-1 is none -> miss@1
    # clip C: no event chunks at all -> skipped
    rows = [
        _row(1, 0, [_chunk(1, 0, 5, status_id=2),
                    _chunk(2, 4, 9, status_id=0)]),
        _row(1, 1, [_chunk(1, 0, 5, status_id=0)],
             status_ids=[0, 1, 0]),
        _row(1, 2, [_chunk(1, 0, 5, status_id=0)], status_ids=[0, 0]),
    ]
    rep = score_event_localization(rows, None, ks=(1,))
    assert rep["ground_truth"] == "status_id"
    assert rep["clips_scored"] == 2
    assert rep["clips_without_events"] == 1
    assert rep["hit_at"]["1"] == 0.5


def test_score_events_cli(tmp_path, capsys):
    rows = [_row(1, 0, [_chunk(1, 95, 105), _chunk(2, 10, 30)]),
            _row(1, 1, [_chunk(1, 10, 30), _chunk(2, 200, 210)],
                 side="right")]
    results = tmp_path / "logit_sequences.json"
    results.write_text(json.dumps(rows))
    tpl = {"clips/vid1_clip_0_left": {"event_make": [[100, 120]]},
           "clips/vid1_clip_1_right": {"event_miss": [[205, 220]]}}
    events = tmp_path / "clip_labelling_template.json"
    events.write_text(json.dumps(tpl))
    out = tmp_path / "scores.json"
    cli.main(["score-events", str(results), "--events", str(events),
              "--ks", "1,2", "--out", str(out)])
    text = capsys.readouterr().out
    assert "scored 2 clips" in text and "hit@1" in text
    rep = json.loads(out.read_text())
    assert rep["hit_at"]["1"] == 0.5   # clip 1's top-1 misses its event
    assert rep["hit_at"]["2"] == 1.0
    assert rep["per_side_hit_at"]["right"]["2"] == 1.0
    assert "center_error_mean" in rep

    # status_id fallback path through the CLI (no --events)
    cli.main(["score-events", str(results), "--ks", "1"])
    text = capsys.readouterr().out
    assert "ground truth: status_id" in text

    # template without event intervals -> clean exit
    empty = tmp_path / "empty.json"
    empty.write_text(json.dumps({"clips/vid1_clip_0_left":
                                 {"event_none": [[1, 2]]}}))
    with pytest.raises(SystemExit, match="no event_make/event_miss"):
        cli.main(["score-events", str(results), "--events", str(empty)])

    # a typo'd --events path must not masquerade as an empty template
    with pytest.raises(SystemExit, match="no such file"):
        cli.main(["score-events", str(results), "--events",
                  str(tmp_path / "clip_labeling_template.json")])

    # malformed template key -> clean CLI error, not a raw traceback
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"comment": {"event_make": [[1, 2]]}}))
    with pytest.raises(SystemExit, match="does not end in"):
        cli.main(["score-events", str(results), "--events", str(bad)])


def test_min_event_span():
    from vit_research_tpu.evaluate.event_scoring import min_event_span

    tmpl = {
        "clips/vid1_clip2_left": {"event_make": [[10, 14]],
                                  "event_miss": [[30, 31]]},
        "clips/vid1_clip3_right": {"event_make": [[5, 20]],
                                   # none overwrites 5-17 -> span 18..20
                                   "event_none": [[1, 17]]},
    }
    assert min_event_span(tmpl) == 2            # the [30,31] miss
    assert min_event_span({}) is None
    assert min_event_span({"c/vid1_clip1_left": {}}) is None
    # none-subtraction shortens the surviving span
    assert min_event_span(
        {"c/vid1_clip1_left": {"event_make": [[5, 20]],
                               "event_none": [[1, 17]]}}) == 3
    # an event fully overwritten by none contributes nothing
    assert min_event_span(
        {"c/vid1_clip1_left": {"event_make": [[5, 8]],
                               "event_none": [[5, 8]]}}) is None
