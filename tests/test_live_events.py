"""evaluate/live.py: event rows the moment a possession clip ends.

The reference could only rank event chunks post-hoc over a rebuilt
dataset (nba_proj/test/get_clip_sequences.py:600-813); LiveEventScorer
applies the same stack to one finished clip at a time.
"""

import numpy as np
import pytest

from vit_research_tpu.data.chunks import build_chunks
from vit_research_tpu.evaluate.live import LiveEventScorer
from vit_research_tpu.store.vector_store import Collection

D = 16


def _collection():
    """Tiny ratt_db-schema collection (mirrors tests/test_caches.py)."""
    col = Collection("ratt_db", space="cosine")
    ids, embs, metas = [], [], []
    rng = np.random.default_rng(0)
    for vid in (7, 8):
        for clip in range(2):
            side = "left" if clip % 2 == 0 else "right"
            label = (vid + clip) % 2
            for s in range(4):
                t = (s + 0.5) / 4
                ids.append(f"v{vid}c{clip}s{s}")
                embs.append(rng.normal(size=D).astype(np.float32))
                metas.append({
                    "vid_num": vid, "clip_num": clip, "side": side,
                    "label": label, "t_center": t, "t_width": 0.1,
                    "start_idx": s * 4, "end_idx": s * 4 + 7,
                    "class_logit": 0.0,
                })
    col.upsert(ids, np.stack(embs), metas)
    return col


def _embed_fn(paths):
    """Deterministic per-frame embedding keyed on the frame number."""
    out = []
    for p in paths:
        n = int(str(p).rsplit("_", 1)[-1].split(".")[0])
        rng = np.random.default_rng(n)
        v = rng.normal(size=D).astype(np.float32)
        out.append(v / np.linalg.norm(v))
    return np.stack(out)


def _encode_batch(arr):
    arr = np.asarray(arr, np.float32)
    emb = arr.mean(axis=1)
    # a deterministic stage-1 proxy logit, like make_encode_fn's second
    # output (models/heads.py::ChunkEncoder class head)
    return emb, emb.sum(-1, keepdims=True)


def _head_apply(q, s, c, t):
    # deterministic function of every branch so retrieval reaches the logit
    return (np.asarray(q, np.float32).sum(-1, keepdims=True)
            + 0.1 * np.asarray(s, np.float32).sum((1, 2)).reshape(-1, 1)
            + 0.1 * np.asarray(c, np.float32).sum((1, 2)).reshape(-1, 1)
            + 0.1 * np.asarray(t, np.float32).sum((1, 2)).reshape(-1, 1))


def _scorer(**kw):
    kw.setdefault("chunk_size", 8)
    kw.setdefault("chunk_stride", 4)
    kw.setdefault("k_sim", 3)
    kw.setdefault("k_contrast", 3)
    kw.setdefault("k_temporal", 2)
    return LiveEventScorer(_embed_fn, _encode_batch, _head_apply,
                           _collection(), **kw)


def _paths(n, start=1):
    return [f"vid1_frame_{i}.jpg" for i in range(start, start + n)]


def test_score_clip_row_schema_and_determinism():
    scorer = _scorer(top_k_event_chunks=3)
    row = scorer.score_clip(_paths(40), side="left", clip_num=2, vid=1)
    assert row["clip_key"] == "vid1_clip2"
    assert row["side"] == "left" and row["label"] == -1
    # (40 - 8) / 4 + 1 windows
    assert row["num_chunks"] == 9
    assert len(row["raw_sequence"]) == 9
    assert len(row["z_sequence"]) == 9
    # top-k ranked by logit, descending, ranks 1..k
    topk = row["topk_chunks"]
    assert [c["rank"] for c in topk] == [1, 2, 3]
    logits = [c["logit"] for c in topk]
    assert logits == sorted(logits, reverse=True)
    assert max(logits) == max(row["raw_sequence"])
    # frame bounds parsed from the real frame names
    assert topk[0]["start_frame"] is not None
    assert topk[0]["end_frame"] - topk[0]["start_frame"] == 7
    # the stack is deterministic: scoring the same clip twice is identical
    again = scorer.score_clip(_paths(40), side="left", clip_num=2, vid=1)
    assert again == row


def test_score_clip_too_short_returns_none():
    scorer = _scorer()
    assert scorer.score_clip(_paths(7), side="left",
                             clip_num=1, vid=1) is None
    assert scorer.score_clip(_paths(8), side="left",
                             clip_num=1, vid=1) is not None


def test_build_clip_chunks_matches_offline_windowing():
    """Live chunking must agree with the offline dataset arithmetic
    (data/chunks.py over load_samples-shaped records) field for field."""
    scorer = _scorer(chunk_size=8, chunk_stride=2)
    paths = _paths(20)
    live = scorer.build_clip_chunks(paths, side="right", clip_num=3, vid=9)
    offline_samples = [{
        "pth": p, "side": "right", "t_norm": (i + 1) / len(paths),
        "clip_num": 3, "vid_num": 9, "label": -1, "status": "",
        "status_id": -1,
    } for i, p in enumerate(paths)]
    offline = build_chunks(offline_samples, chunk_size=8, chunk_stride=2)
    assert live == offline
    assert [c["start_idx"] for c in live] == list(range(0, 13, 2))
    # unlabeled live frames chunk to status 0, exactly like offline
    # chunks built without an event template
    assert {c["status_id"] for c in live} == {0}


def test_retrieval_reaches_the_logit():
    """Wiping the collection must change the scores — i.e. the live
    path really retrieves, not just classifies the query."""
    paths = _paths(24)
    full = _scorer().score_clip(paths, side="left", clip_num=1, vid=1)
    empty = LiveEventScorer(
        _embed_fn, _encode_batch, _head_apply,
        Collection("empty", space="cosine"),
        chunk_size=8, chunk_stride=4, k_sim=3, k_contrast=3, k_temporal=2
    ).score_clip(paths, side="left", clip_num=1, vid=1)
    assert full["raw_sequence"] != empty["raw_sequence"]
    # zero-padded branches: query contribution alone remains
    assert empty["num_chunks"] == full["num_chunks"]


def test_zeros_query_ablation():
    paths = _paths(24)
    plain = _scorer().score_clip(paths, side="left", clip_num=1, vid=1)
    ablated = _scorer(zeros_query=True).score_clip(
        paths, side="left", clip_num=1, vid=1)
    assert plain["raw_sequence"] != ablated["raw_sequence"]


def test_proxy_label_drives_branch_selection():
    """Unlabeled live queries retrieve with the stage-1 proxy label:
    with the proxy OFF, label -1 zero-pads sim (nothing is 'same') and
    lets EVERY labeled candidate count as contrast — the head sees
    different branch inputs, so the logits must differ. The reported
    labels stay -1 either way (the proxy never leaks into the row)."""
    paths = _paths(32)
    with_proxy = _scorer().score_clip(paths, side="left", clip_num=1, vid=1)
    without = _scorer(proxy_label=False).score_clip(
        paths, side="left", clip_num=1, vid=1)
    assert with_proxy["raw_sequence"] != without["raw_sequence"]
    for row in (with_proxy, without):
        assert row["label"] == -1
        assert all(c["label"] == -1 for c in row["topk_chunks"])
