"""Event-localization scoring: close the reference's open eval loop.

The reference's evaluation harness ranks each clip's chunks by logit and
dumps the top-k as "event localization" (reference:
nba_proj/test/get_clip_sequences.py:569-598,800-813) — but never scores
the ranking against the labeled event intervals it trained on
(`clip_labelling_template.json`); its results record is epoch logs
pasted into source comments. This module computes the missing numbers:

- **hit@k**: fraction of event-bearing clips where any of the top-k
  chunks overlaps a labeled event interval;
- **center error**: |top-1 chunk center − nearest event center| in
  frames (mean and median over scored clips);
- per-side breakdown and explicit skip accounting (clips without
  labeled events, clips whose chunks carry no frame numbers).

Two ground-truth sources, in order of preference:

1. the event template JSON (frame-number intervals per clip dir —
   ``truth_events_by_clip``), matched against chunk frame spans;
2. the chunks' own ``status_id`` (already threaded through the eval
   rows), for results files produced without the template on hand.
"""

from __future__ import annotations

import os

import numpy as np

from vit_research_tpu.data import naming

# status ids (data/labels.py): 1 = event-miss, 2 = event-make
EVENT_STATUS_IDS = (1, 2)


def _subtract_spans(spans, holes):
    """Remove inclusive-interval ``holes`` from inclusive ``spans``."""
    for hs, he in holes:
        nxt = []
        for s, e in spans:
            if he < s or hs > e:     # no overlap
                nxt.append((s, e))
                continue
            if s < hs:
                nxt.append((s, hs - 1))
            if he < e:
                nxt.append((he + 1, e))
        spans = nxt
    return spans


def truth_events_by_clip(event_template: dict,
                         keys=("event_make", "event_miss")) -> dict:
    """``{(vid, clip): [(start_frame, end_frame), ...]}`` from a loaded
    event template (data/labels.py::load_event_template). Template keys
    are clip paths; vid/clip parse from the dir basename.

    Frames covered by an ``event_none`` range are NOT events even if a
    make/miss range also covers them: the reference applies categories
    sequentially with later ones overwriting (make -> miss -> none,
    reference: nba_proj/dataset.py:126-141, mirrored by
    data/labels.py::frame_event_status) — so the none ranges are
    subtracted here, keeping template-mode ground truth consistent with
    the chunks' own ``status_id`` labels."""
    out: dict = {}
    for clip_path, events in (event_template or {}).items():
        name = os.path.basename(os.path.normpath(str(clip_path)))
        try:
            vid, clip, _side = naming.parse_clip_dir(name)
        except (ValueError, IndexError):
            raise ValueError(
                f"event template key {clip_path!r} does not end in a "
                "vid{N}_clip{K}_{side} directory name")
        spans = _event_spans(events, keys)
        if spans:
            out.setdefault((vid, clip), []).extend(spans)
    return out


def _event_spans(events: dict, keys) -> list:
    """One clip's event spans under the given keys, with ``event_none``
    overwrites subtracted (unless none itself is requested) — the shared
    ground-truth extraction for truth_events_by_clip and
    min_event_span, so the make/miss-minus-none semantics live once."""
    spans = [(int(s), int(e)) for key in keys
             for s, e in (events or {}).get(key, ())]
    if "event_none" not in keys:
        spans = _subtract_spans(
            spans, [(int(s), int(e)) for s, e
                    in (events or {}).get("event_none", ())])
    return spans


def min_event_span(event_template: dict,
                   keys=("event_make", "event_miss")) -> int | None:
    """Shortest labeled event span in frames (inclusive), after
    subtracting ``event_none`` overwrites — or ``None`` when the
    template holds no event intervals.

    This is the number the strided-embedding deployment rule needs:
    choose ``--frame-stride`` <= the shortest event you want localized
    (parallel/embed.py::embed_video_strided LIMIT note) — an event
    strictly inside one stride gap touches no keyframe, so neither
    plain interpolation nor novelty-gated refinement can see it
    (tests/test_strided_embed.py::
    test_refine_blind_to_sub_stride_interior_event)."""
    spans_all = [span for events in (event_template or {}).values()
                 for span in _event_spans(events, keys)]
    if not spans_all:
        return None
    return min(e - s + 1 for s, e in spans_all)


def _overlaps(sf, ef, spans) -> bool:
    return any(sf <= e and s <= ef for s, e in spans)


def _center_error(chunk, spans):
    c = chunk.get("center_frame")
    if c is None:
        sf, ef = chunk.get("start_frame"), chunk.get("end_frame")
        if sf is None or ef is None:
            return None
        c = (sf + ef) // 2
    return min(abs(c - (s + e) / 2.0) for s, e in spans)


def score_event_localization(rows, truth: dict | None = None, *,
                             ks=(1, 3, 5)) -> dict:
    """Score eval rows (evaluate/clip_sequences.py schema, or the same
    loaded back from logit_sequences.json).

    Args:
      rows: clip rows with ``topk_chunks``.
      truth: {(vid, clip): [(s, e), ...]} frame-number event intervals
        (see :func:`truth_events_by_clip`). When None, falls back to the
        rows' own chunk ``status_id`` ground truth (a top-k chunk "hits"
        when its status is an event status).
    """
    ks = sorted(set(int(k) for k in ks))
    hits = {k: [] for k in ks}
    errors = []
    per_side: dict = {}
    scored = skipped_no_event = skipped_no_frames = 0

    for row in rows:
        topk = row.get("topk_chunks") or []
        if truth is not None:
            spans = truth.get((int(row["vid"]), int(row["clip"])))
            if not spans:
                skipped_no_event += 1
                continue
            if not any(c.get("start_frame") is not None
                       and c.get("end_frame") is not None for c in topk):
                skipped_no_frames += 1
                continue

            def is_hit(c):
                return (c.get("start_frame") is not None
                        and c.get("end_frame") is not None
                        and _overlaps(c["start_frame"], c["end_frame"],
                                      spans))

            err = _center_error(topk[0], spans) if topk else None
        else:
            statuses = [c.get("status_id") for c in topk]
            if all(s is None for s in statuses):
                skipped_no_event += 1
                continue
            # event-bearing clip = any chunk in the SEQUENCE is an event
            # chunk (the template-free analog of "has labeled events")
            seq_statuses = row.get("status_ids") or statuses
            if not any(s in EVENT_STATUS_IDS for s in seq_statuses
                       if s is not None):
                skipped_no_event += 1
                continue

            def is_hit(c):
                return c.get("status_id") in EVENT_STATUS_IDS

            err = None

        scored += 1
        side_bucket = per_side.setdefault(
            str(row.get("side")), {k: [] for k in ks})
        for k in ks:
            hit = any(is_hit(c) for c in topk[:k])
            hits[k].append(hit)
            side_bucket[k].append(hit)
        if err is not None:
            errors.append(err)

    result = {
        "clips_scored": scored,
        "clips_without_events": skipped_no_event,
        "clips_without_frame_numbers": skipped_no_frames,
        "ground_truth": "template" if truth is not None else "status_id",
        "hit_at": {str(k): (float(np.mean(v)) if v else None)
                   for k, v in hits.items()},
        "per_side_hit_at": {
            side: {str(k): (float(np.mean(v)) if v else None)
                   for k, v in b.items()}
            for side, b in per_side.items()},
    }
    if errors:
        result["center_error_mean"] = float(np.mean(errors))
        result["center_error_median"] = float(np.median(errors))
    return result
