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


def test_emb_cache_skips_reembedding():
    """Embeddings remembered from the stream are reused: with every
    frame cached, score_clip must not call embed_fn at all — and must
    produce the identical row."""
    paths = _paths(24)
    baseline = _scorer().score_clip(paths, side="left", clip_num=1, vid=1)

    def explode(_paths):
        raise AssertionError("re-embedded frames the stream already paid for")

    scorer = LiveEventScorer(explode, _encode_batch, _head_apply,
                             _collection(), chunk_size=8, chunk_stride=4,
                             k_sim=3, k_contrast=3, k_temporal=2)
    scorer.remember(paths, _embed_fn(paths))
    cached = scorer.score_clip(paths, side="left", clip_num=1, vid=1)
    assert cached == baseline
    # partial cache: misses fall back to ONE embed_fn call
    calls = []
    scorer2 = LiveEventScorer(
        lambda ps: (calls.append(list(ps)), _embed_fn(ps))[1],
        _encode_batch, _head_apply, _collection(),
        chunk_size=8, chunk_stride=4, k_sim=3, k_contrast=3, k_temporal=2)
    scorer2.remember(paths[:10], _embed_fn(paths[:10]))
    assert scorer2.score_clip(paths, side="left",
                              clip_num=1, vid=1) == baseline
    assert len(calls) == 1 and len(calls[0]) == 14


def test_emb_cache_cap_is_lru():
    scorer = _scorer(emb_cache_cap=4)
    scorer.remember(_paths(6), _embed_fn(_paths(6)))
    assert len(scorer.emb_cache) == 4
    # oldest two evicted, newest four kept
    assert set(scorer.emb_cache) == set(_paths(4, start=3))


def test_encode_batches_are_power_of_two():
    """Every distinct batch shape is a fresh jit compile on the real
    encoder; clip lengths vary per possession, so the encode batch is
    padded to a power-of-two bucket (results must be unaffected)."""
    sizes = []

    def tracking_encode(arr):
        sizes.append(np.asarray(arr).shape[0])
        return _encode_batch(arr)

    scorer = LiveEventScorer(_embed_fn, tracking_encode, _head_apply,
                             _collection(), chunk_size=8, chunk_stride=4,
                             k_sim=3, k_contrast=3, k_temporal=2)
    # 40 frames -> 9 chunks -> bucket 16; 24 frames -> 5 -> 8; 8 -> 1 -> 1
    for n in (40, 24, 8):
        scorer.score_clip(_paths(n), side="left", clip_num=1, vid=1)
    assert sizes == [16, 8, 1]
    assert all(s & (s - 1) == 0 for s in sizes)


def test_no_self_exclusion_against_colliding_stored_rows():
    """A live clip's session-local (vid, clip, start_idx) can collide
    with unrelated stored rows; self-exclusion must NOT fire (the query
    is not in the collection), or its best neighbors silently vanish."""
    rng = np.random.default_rng(1)
    col = Collection("ratt_db", space="cosine")
    ids, embs, metas = [], [], []
    # every stored row collides with the live clip's chunk coordinates
    # (vid=1, clip=1, start_idx 0/4/8...): with self-exclusion these
    # would ALL be dropped and the branches zero-padded
    for s in range(6):
        for label in (0, 1):
            ids.append(f"c{s}l{label}")
            embs.append(rng.normal(size=D).astype(np.float32))
            metas.append({"vid_num": 1, "clip_num": 1, "side": "left",
                          "label": label, "t_center": (s + 0.5) / 6,
                          "t_width": 0.1, "start_idx": s * 4,
                          "end_idx": s * 4 + 7})
    col.upsert(ids, np.stack(embs), metas)
    scorer = LiveEventScorer(_embed_fn, _encode_batch, _head_apply, col,
                             chunk_size=8, chunk_stride=4,
                             k_sim=3, k_contrast=3, k_temporal=2)
    got = scorer.score_clip(_paths(24), side="left", clip_num=1, vid=1)
    empty = LiveEventScorer(
        _embed_fn, _encode_batch, _head_apply,
        Collection("empty", space="cosine"), chunk_size=8, chunk_stride=4,
        k_sim=3, k_contrast=3, k_temporal=2
    ).score_clip(_paths(24), side="left", clip_num=1, vid=1)
    assert got["raw_sequence"] != empty["raw_sequence"]


def test_stored_twin_dropped_by_similarity_cap():
    """Scoring a game whose chunks ALREADY sit in the collection (the
    offline re-score flow: segment --score-events against the ratt_db
    built from the same game) must not retrieve the query's own stored
    twin at cosine ~1.0 — coordinates can't identify it (session-local
    numbering), the default self_sim_cap must. The twin's OWNER chunk
    must score exactly as if the twin were absent (for the other chunks
    the new row is a legitimate neighbor and may shift them)."""
    paths = _paths(24)
    # the first chunk's exact stage-1 embedding, as the store would
    # hold it (mean of frames 1..8, L2-normalized like score_clip's)
    twin = _embed_fn(paths[:8]).mean(0)
    twin = twin / np.linalg.norm(twin)

    def score(col, **kw):
        return LiveEventScorer(
            _embed_fn, _encode_batch, _head_apply, col, chunk_size=8,
            chunk_stride=4, k_sim=3, k_contrast=3, k_temporal=2, **kw
        ).score_clip(paths, side="left", clip_num=1, vid=1)

    base = score(_collection())
    col_twin = _collection()
    col_twin.upsert(["twin"], twin[None], [{
        "vid_num": 99, "clip_num": 0, "side": "left", "label": 1,
        "t_center": 0.5, "t_width": 0.1, "start_idx": 0, "end_idx": 7}])
    # default cap drops the twin for chunk 0 (start_idx 0, the twin's
    # owner): its logit is exactly the no-twin value
    assert score(col_twin)["raw_sequence"][0] == base["raw_sequence"][0]
    # ...and the leak it guards against is real: with the cap off, the
    # twin tops chunk 0's branch and shifts its logit
    capless = score(col_twin, self_sim_cap=None)
    assert capless["raw_sequence"][0] != base["raw_sequence"][0]


def test_retrieval_label_never_reaches_ground_truth_labels():
    """chunk['retrieval_label'] steers branch selection only; the
    entry's query_meta label — what _stack_entries exports as the
    training/eval ground truth — must stay the TRUE label."""
    from vit_research_tpu.retrieval.cache_stage2 import (_stack_entries,
                                                         build_live_entry)

    col = _collection()
    rng = np.random.default_rng(2)
    q = rng.normal(size=D).astype(np.float32)
    ch = {"vid": 1, "clip": 1, "start_idx": 0, "end_idx": 7,
          "side": "left", "label": -1, "t_center": 0.5, "t_width": 0.1,
          "retrieval_label": 1}
    entry = build_live_entry(ch, q, q, col, k_sim=3, k_contrast=3,
                             k_temporal=2, exclude_self=False)
    assert entry["query_meta"]["label"] == -1
    assert _stack_entries([entry])["labels"].tolist() == [-1]
    # ...while the proxy did drive selection: sim rows are label-1 only,
    # contrast rows label-0 only (an un-overridden -1 query would have
    # zero-padded sim entirely)
    sim_lbls = [m["label"] for m in entry["sim_meta"] if m["side"] != "PAD"]
    con_lbls = [m["label"] for m in entry["contrast_meta"]
                if m["side"] != "PAD"]
    assert sim_lbls and set(sim_lbls) == {1}
    assert con_lbls and set(con_lbls) == {0}


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
