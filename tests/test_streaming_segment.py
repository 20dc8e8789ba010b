"""Live segmentation: StreamingClipExtractor + segment_knn_hmm_stream
vs their offline counterparts.

Pinned:
- pushing any decoded sequence through StreamingClipExtractor
  reproduces clip_intervals_from_decoded verbatim (fuzzed, plus edge
  streaks touching both sequence ends and pad=0);
- clips are emitted as soon as their padded extent is final, not at
  finish();
- the streaming kNN+HMM pipeline yields exactly the offline pipeline's
  clip intervals on a decisive stream (no forced commits), with
  identical confident write-back collection contents, regardless of the
  micro-batch split.
"""

import numpy as np
import pytest

from vit_research_tpu.segment import pipeline as seg_pipeline
from vit_research_tpu.segment.clips import (
    StreamingClipExtractor,
    clip_intervals_from_decoded,
)
from vit_research_tpu.segment.hmm import STATES


def _stream(decoded, **kw):
    ex = StreamingClipExtractor(**kw)
    out = []
    for s in decoded:
        out.extend(ex.push(s))
    out.extend(ex.finish())
    return out


@pytest.mark.parametrize("seed", range(6))
def test_extractor_matches_offline_fuzz(seed):
    rng = np.random.default_rng(seed)
    decoded = []
    while len(decoded) < 600:
        decoded += [STATES[rng.integers(3)]] * int(rng.integers(1, 60))
    decoded = decoded[:600]
    for min_len, pad in [(20, 10), (1, 0), (30, 100), (600, 5)]:
        want = clip_intervals_from_decoded(decoded, min_len=min_len, pad=pad)
        assert _stream(decoded, min_len=min_len, pad=pad) == want


def test_extractor_edge_streaks_and_int_states():
    # qualifying streaks at both ends; int states; end clamp at finish
    decoded = [0] * 30 + [2] * 10 + [1] * 30
    want = clip_intervals_from_decoded(
        [STATES[s] for s in decoded], min_len=20, pad=15)
    got = _stream(decoded, min_len=20, pad=15)
    assert got == want
    assert got[0].start == 0 and got[-1].end == len(decoded) - 1


def test_extractor_emits_before_stream_end():
    """A clip becomes final pad frames past its streak — long before
    finish()."""
    ex = StreamingClipExtractor(min_len=20, pad=5)
    emitted_at = None
    seq = ["left"] * 30 + ["none"] * 200
    for i, s in enumerate(seq):
        if ex.push(s):
            emitted_at = i
            break
    assert emitted_at == 34  # streak ends at 29, +5 pad -> final at 34


def test_stream_pipeline_matches_offline():
    from vit_research_tpu.store.vector_store import Collection

    rng = np.random.default_rng(7)
    centers = np.eye(3, 16) * 4.0
    corpus, labels = [], []
    for c in range(3):
        corpus.append(centers[c] + 0.1 * rng.normal(size=(40, 16)))
        labels += [c] * 40
    corpus = np.concatenate(corpus).astype(np.float32)
    labels = np.asarray(labels, np.int32)
    probs = np.full((len(labels), 3), 0.05)
    probs[np.arange(len(labels)), labels] = 0.9
    cdict = {"embeddings": corpus, "labels": labels, "probs": probs}

    side_ids = {"left": 0, "right": 1, "none": 2}
    frames, names = [], []
    for side, n in [("none", 30), ("left", 150), ("none", 30),
                    ("right", 150), ("none", 20)]:
        frames.append(centers[side_ids[side]]
                      + 0.1 * rng.normal(size=(n, 16)))
    frames = np.concatenate(frames).astype(np.float32)
    names = [f"vid9_frame_{i+1}.jpg" for i in range(len(frames))]

    col_off = Collection("off", space="l2")
    decoded, _, _ = seg_pipeline.segment_with_knn_hmm(
        names, frames, cdict, k=25, collection=col_off, vid=9,
        min_len=100, pad=20)
    want = clip_intervals_from_decoded(decoded, min_len=100, pad=20)
    assert len(want) == 2  # the world has one left and one right clip

    for batch_size in (16, 128, len(frames)):
        col_live = Collection(f"live{batch_size}", space="l2")
        batches = ((names[i: i + batch_size], frames[i: i + batch_size])
                   for i in range(0, len(frames), batch_size))
        got = list(seg_pipeline.segment_knn_hmm_stream(
            batches, cdict, k=25, collection=col_live, vid=9,
            min_len=100, pad=20, max_lag=256))
        assert got == want, batch_size
        off = col_off.get(limit=10**6)
        live = col_live.get(limit=10**6)
        assert sorted(off["ids"]) == sorted(live["ids"])
        assert (dict(zip(off["ids"], off["metadatas"]))
                == dict(zip(live["ids"], live["metadatas"])))


def test_stream_pipeline_emits_before_exhaustion():
    """The first clip must surface while later batches are still being
    consumed — the property the reference's loop couldn't provide."""
    rng = np.random.default_rng(8)
    centers = np.eye(3, 8) * 4.0
    corpus = np.concatenate(
        [centers[c] + 0.05 * rng.normal(size=(30, 8)) for c in range(3)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 30).astype(np.int32)
    probs = np.full((90, 3), 0.05)
    probs[np.arange(90), labels] = 0.9
    cdict = {"embeddings": corpus, "labels": labels, "probs": probs}

    seq = [("left", 80), ("none", 120)]
    frames = np.concatenate(
        [centers[{"left": 0, "none": 2}[s]]
         + 0.05 * rng.normal(size=(n, 8)) for s, n in seq]
    ).astype(np.float32)
    names = [f"vid3_frame_{i+1}.jpg" for i in range(len(frames))]

    consumed = []

    def batches():
        for i in range(0, len(frames), 20):
            consumed.append(i)
            yield names[i: i + 20], frames[i: i + 20]

    gen = seg_pipeline.segment_knn_hmm_stream(
        batches(), cdict, k=15, min_len=50, pad=10, max_lag=64)
    first = next(gen)
    assert first.side == "left"
    assert consumed[-1] < len(frames) - 20  # stream not yet exhausted
    rest = list(gen)
    assert clip_intervals_from_decoded(
        ["left"] * 80 + ["none"] * 120, min_len=50, pad=10) == [first, *rest]
