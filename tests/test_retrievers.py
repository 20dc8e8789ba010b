"""Retrievers: filter semantics, padding, parity with a brute-force oracle."""

import numpy as np

from vit_research_tpu.retrieval.retrievers import FrameRetriever, RattChunkRetriever
from vit_research_tpu.store.vector_store import Collection


def build_collection(n=120, d=32, seed=0, time_field="t_norm"):
    rng = np.random.default_rng(seed)
    col = Collection("ragdb", space="cosine")
    emb = rng.normal(size=(n, d)).astype(np.float32)
    metas = []
    for i in range(n):
        metas.append({
            "vid_num": i % 4,
            "side": "left" if i % 2 == 0 else "right",
            time_field: (i % 10) / 10.0,
            "clip_num": i % 6,
        })
    col.upsert([f"e{i}" for i in range(n)], emb, metas)
    return col, emb, metas


def oracle(q, emb, metas, vid, side, t_lo, t_hi, top_k, time_field):
    qn = q / (np.linalg.norm(q) + 1e-8)
    en = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
    scores = en @ qn
    ok = np.array([
        m["vid_num"] != vid and m["side"] == side
        and t_lo <= m[time_field] <= t_hi for m in metas])
    idx = np.argsort(-np.where(ok, scores, -np.inf))[:top_k]
    idx = [i for i in idx if ok[i]]
    out = np.zeros((top_k, emb.shape[1]), np.float32)
    for j, i in enumerate(idx):
        out[j] = en[i]
    return out


def metadata_for(vids, sides, t_centers, t_widths):
    return {
        "vid": np.asarray(vids),
        "side": np.asarray(sides, dtype=object),
        "t_center": np.asarray(t_centers, np.float32),
        "t_width": np.asarray(t_widths, np.float32),
    }


def test_frame_retriever_matches_oracle():
    col, emb, metas = build_collection(time_field="t_norm")
    rng = np.random.default_rng(1)
    q = rng.normal(size=(3, 32)).astype(np.float32)
    # Window edges avoid the 0.1 grid so f32 rounding can't flip membership.
    md = metadata_for([0, 1, 2], ["left", "right", "left"],
                      [0.42, 0.51, 0.23], [0.37, 0.55, 0.21])
    ret = FrameRetriever(col, top_k=5)
    out = ret(q, md)
    assert out.shape == (3, 5, 32)
    for i in range(3):
        t_lo = md["t_center"][i] - md["t_width"][i] / 2
        t_hi = md["t_center"][i] + md["t_width"][i] / 2
        want = oracle(q[i], emb, metas, md["vid"][i], md["side"][i],
                      t_lo, t_hi, 5, "t_norm")
        np.testing.assert_allclose(out[i], want, atol=1e-4)


def test_chunk_retriever_normalizes_query_and_matches_oracle():
    col, emb, metas = build_collection(time_field="t_center")
    rng = np.random.default_rng(2)
    q = 5.0 * rng.normal(size=(2, 32)).astype(np.float32)  # unnormalized
    md = metadata_for([1, 3], ["left", "right"], [0.52, 0.33], [0.55, 0.41])
    ret = RattChunkRetriever(col, top_k=4)
    out = ret(q, md)
    for i in range(2):
        t_lo = md["t_center"][i] - md["t_width"][i] / 2
        t_hi = md["t_center"][i] + md["t_width"][i] / 2
        want = oracle(q[i], emb, metas, md["vid"][i], md["side"][i],
                      t_lo, t_hi, 4, "t_center")
        np.testing.assert_allclose(out[i], want, atol=1e-4)


def test_zero_padding_when_few_candidates():
    col, _, _ = build_collection(n=8)
    q = np.random.default_rng(3).normal(size=(1, 32)).astype(np.float32)
    # Window so tight no candidate matches.
    md = metadata_for([0], ["left"], [0.55], [0.01])
    out = FrameRetriever(col, top_k=6)(q, md)
    np.testing.assert_array_equal(out, np.zeros((1, 6, 32), np.float32))


def test_view_refresh_after_upsert():
    col, emb, metas = build_collection(n=16)
    ret = FrameRetriever(col, top_k=3)
    q = np.random.default_rng(4).normal(size=(1, 32)).astype(np.float32)
    md = metadata_for([9], ["left"], [0.5], [1.0])
    _ = ret(q, md)
    # Add a perfectly-matching vector; the retriever must see it.
    target = (q[0] / np.linalg.norm(q[0])).astype(np.float32)
    col.upsert(["new"], target[None],
               [{"vid_num": 0, "side": "left", "t_norm": 0.5, "clip_num": 0}])
    out = ret(q, md)
    cos = out[0, 0] @ target
    assert cos > 0.999


def test_view_refresh_after_inplace_update():
    """Re-upserting an EXISTING id replaces its row in place — neither
    count() nor the array object changes — and the retriever must still
    see the new vector (mutation-counter versioning)."""
    col, emb, metas = build_collection(n=16)
    ret = FrameRetriever(col, top_k=1)
    q = np.random.default_rng(6).normal(size=(1, 32)).astype(np.float32)
    md = metadata_for([9], ["left"], [0.5], [1.0])
    _ = ret(q, md)  # snapshot taken
    target = (q[0] / np.linalg.norm(q[0])).astype(np.float32)
    # Overwrite an existing row (id e0: side left, t_norm 0.0 -> move it
    # into the window too).
    col.upsert(["e0"], target[None],
               [{"vid_num": 0, "side": "left", "t_norm": 0.5,
                 "clip_num": 0}])
    out = ret(q, md)
    assert out[0, 0] @ target > 0.999


def test_l2_collection_ranks_by_l2():
    """Retrievers honor the collection's space: on an l2 collection the
    nearest row by L2 wins even when a farther row has higher cosine."""
    col = Collection("frames", space="l2")
    d = 8
    q = np.zeros((1, d), np.float32)
    q[0, 0] = 1.0
    # row A: same direction as q but huge norm -> cosine 1.0, L2 far.
    a = np.zeros(d, np.float32); a[0] = 50.0
    # row B: different direction, small -> lower cosine, L2 near.
    b = np.zeros(d, np.float32); b[0] = 0.9; b[1] = 0.5
    meta = {"vid_num": 1, "side": "left", "t_norm": 0.5, "clip_num": 0}
    col.upsert(["a", "b"], np.stack([a, b]), [dict(meta), dict(meta)])
    out = FrameRetriever(col, top_k=1)(q, metadata_for(
        [9], ["left"], [0.5], [1.0]))
    bn = b / np.linalg.norm(b)
    assert out[0, 0] @ bn > 0.999  # L2-nearest (b), not cosine-nearest (a)


def test_empty_collection():
    col = Collection("ragdb", space="cosine")
    ret = RattChunkRetriever(col, top_k=3)
    q = np.ones((2, 8), np.float32)
    md = metadata_for([0, 1], ["left", "right"], [0.5, 0.5], [1.0, 1.0])
    out = ret(q, md)
    np.testing.assert_array_equal(out, np.zeros((2, 3, 8), np.float32))
