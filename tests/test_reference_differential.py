"""Differential tests: the REFERENCE's own code as the oracle.

These load the actual reference modules from /root/reference (read-only;
bytecode writing disabled so the tree is never touched) and compare
outputs mechanically — the strongest form of parity evidence for the
pure-Python logic this framework re-implements:

- dataset.py ``chunk_event_label`` / ``build_chunks`` /
  ``oversample_chunk_samples`` must match EXACTLY (including RNG call
  order for oversampling, reference: nba_proj/dataset.py:26-73,166-260);
- hmm.py lattice decode must match modulo the reference's documented
  off-by-one quirks (segment/hmm.py module docstring; reference:
  nba_proj/hmm.py:109-135 reads dp[count-1] and backpointers[i-1], and
  leaves its first two entries as -1).

Skipped when no reference tree is present (the framework stands alone).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/nba_proj"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available")


def _load_ref(module_name, filename):
    """Import a reference module without writing bytecode anywhere."""
    prev = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    try:
        spec = importlib.util.spec_from_file_location(
            module_name, os.path.join(REF_ROOT, filename))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.dont_write_bytecode = prev


@pytest.fixture(scope="module")
def ref_dataset():
    """Reference dataset.py with heavyweight deps stubbed.

    The three functions under test are pure numpy/python; stubbing
    tensorflow/tf_keras/loader skips a ~40 s TF import the tests never
    touch (a stub attribute access would fail loudly if they did)."""
    saved = {}
    stubs = {}
    for name in ("tensorflow", "tensorflow.keras", "loader"):
        if name not in sys.modules:
            stubs[name] = types.ModuleType(name)
    if "tensorflow" in stubs:
        stubs["tensorflow"].keras = stubs.get(
            "tensorflow.keras", sys.modules.get("tensorflow.keras"))
    if "loader" in stubs:
        stubs["loader"].preprocess_frame = lambda *a, **k: None
    for name, mod in stubs.items():
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        yield _load_ref("ref_dataset", "dataset.py")
    finally:
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


def _frame_samples(rng, n_clips=5, frames_per_clip=18):
    """Frame sample dicts in the shared load_samples schema."""
    recs = []
    for c in range(n_clips):
        vid = 1 + c % 2
        side = ("left", "right")[c % 2]
        label = int(rng.integers(0, 2))
        for i in range(1, frames_per_clip + 1):
            status_id = int(rng.choice([0, 0, 0, 1, 2]))
            recs.append({
                "pth": f"/frames/vid{vid}_frame_{c * 100 + i}.jpg",
                "side": side,
                "t_norm": i / frames_per_clip,
                "clip_num": c,
                "vid_num": vid,
                "label": label,
                "status": {0: "event-none", 1: "event-miss",
                           2: "event-make"}[status_id],
                "status_id": status_id,
            })
    # shuffled input: both implementations must sort within clips
    rng.shuffle(recs)
    return recs


def test_chunk_event_label_matches_reference(ref_dataset):
    from vit_research_tpu.data.chunks import chunk_event_label

    rng = np.random.default_rng(0)
    for _ in range(200):
        labels = rng.integers(0, 3, size=int(rng.integers(1, 15))).tolist()
        thr = int(rng.integers(1, 5))
        assert (chunk_event_label(labels, thr)
                == ref_dataset.chunk_event_label(labels, thr)), (labels, thr)


def test_build_chunks_matches_reference_exactly(ref_dataset):
    from vit_research_tpu.data.chunks import build_chunks

    rng = np.random.default_rng(1)
    recs = _frame_samples(rng)
    keys = ("frames", "label", "status", "status_id", "side", "vid",
            "clip", "t_center", "t_width", "start_idx", "end_idx")

    def canon(chunks):
        # The reference emits clips in first-seen (input) order; ours
        # sorts by (vid, clip) so chunking is deterministic regardless
        # of filesystem enumeration. Content must be identical.
        return sorted(([c[k] for k in keys] for c in chunks),
                      key=lambda row: (row[5], row[6], row[9]))

    for size, stride in [(12, 4), (8, 2), (6, 6), (18, 4)]:
        ours = build_chunks(recs, chunk_size=size, chunk_stride=stride)
        ref = ref_dataset.build_chunks(recs, chunk_size=size,
                                       chunk_stride=stride)
        assert canon(ours) == canon(ref), (size, stride)

    # With input already in (vid, clip) order — what load_samples
    # produces — the emitted chunk ORDER matches the reference's too.
    recs_sorted = sorted(recs, key=lambda r: (r["vid_num"], r["clip_num"]))
    ours = build_chunks(recs_sorted, chunk_size=8, chunk_stride=2)
    ref = ref_dataset.build_chunks(recs_sorted, chunk_size=8, chunk_stride=2)
    assert [[c[k] for k in keys] for c in ours] \
        == [[c[k] for k in keys] for c in ref]


def test_oversample_matches_reference_exactly(ref_dataset):
    # Same seed -> identical output ORDER: the implementations must make
    # identical RNG calls (per-class choice sizes in class order, then
    # one shuffle) for cached/downstream runs to reproduce.
    from vit_research_tpu.data.chunks import (build_chunks,
                                              oversample_chunk_samples)

    rng = np.random.default_rng(2)
    chunks = build_chunks(_frame_samples(rng), chunk_size=8, chunk_stride=2)
    for target in ("max", 2):
        ours = oversample_chunk_samples(chunks, target=target, seed=7)
        ref = ref_dataset.oversample_chunk_samples(chunks, target=target,
                                                   seed=7)
        assert [id(c) for c in ours] == [id(c) for c in ref], target


def _blocky_probs(rng, blocks):
    out = []
    for state, n in blocks:
        for _ in range(n):
            p = np.full(3, 0.1) + rng.uniform(0, 0.05, 3)
            p[state] = 0.8 + rng.uniform(0, 0.1)
            out.append(p / p.sum())
    return np.asarray(out)


def test_hmm_decode_matches_reference_modulo_documented_quirks():
    from vit_research_tpu.segment.hmm import HMM

    ref_hmm = _load_ref("ref_hmm", "hmm.py")
    rng = np.random.default_rng(3)
    blocks = [(0, 40), (2, 10), (1, 40), (2, 8), (0, 30)]
    probs = _blocky_probs(rng, blocks)
    cols = [{"left": float(p[0]), "right": float(p[1]), "none": float(p[2])}
            for p in probs]

    ref = ref_hmm.hmm(cap_count=len(cols) + 10)
    ref.add_first(cols[0])
    for c in cols[1:]:
        ref.add_col_to_lattice(c)
    ref_dec = ref.decode_sequence()

    ours = HMM()
    ours.add_first(cols[0])
    for c in cols[1:]:
        ours.add_col_to_lattice(c)
    our_dec = ours.decode_sequence()

    assert len(ref_dec) == len(our_dec) == len(cols)
    # Documented quirks: the reference leaves entries 0-1 as -1 and its
    # backtrace is shifted one frame late relative to the true argmax
    # path (segment/hmm.py docstring). Away from block boundaries both
    # must agree under that shift; we allow a +-2-frame boundary wobble
    # (the reference also rounds lattice scores to 3 decimals).
    boundaries = np.cumsum([n for _, n in blocks])[:-1]
    checked = 0
    for i in range(2, len(cols) - 1):
        if min(abs(i - b) for b in boundaries) <= 2:
            continue
        assert ref_dec[i] == our_dec[i - 1], i
        checked += 1
    assert checked > 100  # the comparison actually covered the sequence

    # Both recover the exact possession-run label structure.
    state_names = ("left", "right", "none")
    want = [state_names[s] for s, _ in blocks]

    def runs(seq):
        out = []
        for s in seq:
            if s != -1 and (not out or out[-1] != s):
                out.append(s)
        return out

    assert runs(our_dec) == want
    assert runs(ref_dec) == want


class _FakeTensor:
    """Minimal .numpy() shim for the reference retrievers' tf-tensor
    metadata contract (metadata["vid"][i].numpy())."""

    def __init__(self, v):
        self._v = v

    def numpy(self):
        return self._v


def _shim_metadata(md):
    out = {}
    for k, vals in md.items():
        out[k] = [_FakeTensor(v.encode() if isinstance(v, str) else v)
                  for v in vals]
    return out


def _retrieval_world(rng, n=160, d=24, space="cosine", time_field="t_norm"):
    from vit_research_tpu.store.vector_store import Collection

    col = Collection("ref_diff", space=space)
    ids, embs, metas = [], [], []
    for i in range(n):
        v = rng.normal(size=d).astype(np.float32)
        v /= np.linalg.norm(v)
        ids.append(f"r{i}")
        embs.append(v)
        metas.append({
            "vid_num": int(rng.integers(1, 5)),
            "clip_num": int(rng.integers(0, 3)),
            "side": str(rng.choice(["left", "right"])),
            time_field: round(float(rng.integers(0, 20)) / 20, 5),
            "label": int(rng.integers(0, 2)),
        })
    col.upsert(ids, np.stack(embs), metas)
    return col


def _queries(rng, b=6, d=24):
    q = rng.normal(size=(b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    md = {
        "vid": np.asarray([int(rng.integers(1, 5)) for _ in range(b)]),
        "side": [str(rng.choice(["left", "right"])) for _ in range(b)],
        "t_center": np.asarray([0.5] * b, np.float32),
        "t_width": np.asarray([1.0] * b, np.float32),  # wide window
    }
    return q, md


def test_frame_retriever_matches_reference():
    from vit_research_tpu.retrieval.retrievers import FrameRetriever

    ref_mod = _load_ref("ref_frame_retriever",
                        "retrieval/frame_retriever.py")
    rng = np.random.default_rng(11)
    col = _retrieval_world(rng, time_field="t_norm")
    q, md = _queries(rng)

    ref = ref_mod.FrameRetriever(col, top_k=5, search_k=50)(
        q, _shim_metadata(md))
    ours = FrameRetriever(col, top_k=5, search_k=50)(q, md)
    assert ref.shape == ours.shape == (6, 5, 24)
    assert np.abs(ref).sum() > 0  # the world actually yields neighbors
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_ratt_chunk_retriever_matches_reference():
    from vit_research_tpu.retrieval.retrievers import RattChunkRetriever

    ref_mod = _load_ref("ref_ratt_retriever",
                        "retrieval/ratt_chunk_retriever.py")
    rng = np.random.default_rng(12)
    col = _retrieval_world(rng, time_field="t_center")
    q, md = _queries(rng)

    ref = ref_mod.RattChunkRetriever(col, top_k=5, search_k=50)(
        q, _shim_metadata(md))
    ours = RattChunkRetriever(col, top_k=5, search_k=50)(q, md)
    assert ref.shape == ours.shape == (6, 5, 24)
    assert np.abs(ref).sum() > 0
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
