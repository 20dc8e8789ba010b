"""Async DB rebuild: shadow build, atomic swap, no half-built reads."""

import threading
import time

import numpy as np

from vit_research_tpu.retrieval.retrievers import FrameRetriever
from vit_research_tpu.store.vector_store import Collection
from vit_research_tpu.train.async_rebuild import (
    RebuildScheduler,
    SwappableCollection,
)

D = 8


def fill(col, scale, n=32):
    rng = np.random.default_rng(0)
    embs = (scale * rng.normal(size=(n, D))).astype(np.float32)
    metas = [{"vid_num": i % 3, "side": "left", "t_norm": (i % 8) / 8.0}
             for i in range(n)]
    col.upsert([f"e{i}" for i in range(n)], embs, metas)


def test_swap_is_atomic_and_visible():
    base = Collection("ragdb", space="cosine")
    fill(base, 1.0)
    sw = SwappableCollection(base)
    assert sw.count() == 32

    sched = RebuildScheduler(
        sw, make_collection=lambda: Collection("ragdb", space="cosine"),
        rebuild_fn=lambda col: fill(col, 2.0, n=16))
    assert sched.kick()
    assert not sched.kick()  # one in flight at a time
    sched.wait()
    # Before swap: old data still served.
    assert sw.count() == 32
    assert sched.maybe_swap()
    assert sw.count() == 16
    assert not sched.maybe_swap()  # nothing pending
    assert sched.swaps == 1


def test_retriever_follows_swap():
    base = Collection("ragdb", space="cosine")
    fill(base, 1.0)
    sw = SwappableCollection(base)
    ret = FrameRetriever(sw, top_k=3)
    q = np.random.default_rng(1).normal(size=(1, D)).astype(np.float32)
    md = {"vid": np.asarray([9]), "side": np.asarray(["left"], object),
          "t_center": np.asarray([0.5]), "t_width": np.asarray([2.0])}
    out1 = ret(q, md)
    assert np.abs(out1).sum() > 0

    # Rebuild into a shadow holding a single perfect match.
    target = (q[0] / np.linalg.norm(q[0])).astype(np.float32)

    def build(col):
        col.upsert(["hit"], target[None],
                   [{"vid_num": 0, "side": "left", "t_norm": 0.5}])

    sched = RebuildScheduler(
        sw, lambda: Collection("ragdb", space="cosine"), build)
    sched.kick()
    sched.wait()
    sched.maybe_swap()
    out2 = ret(q, md)
    assert out2[0, 0] @ target > 0.999
    # Only one row now; rest zero-padded.
    assert np.abs(out2[0, 1:]).sum() == 0


def test_reads_never_see_half_built_db():
    base = Collection("ragdb", space="cosine")
    fill(base, 1.0, n=8)
    sw = SwappableCollection(base)

    def slow_build(col):
        for i in range(4):
            fill_col_part(col, i)
            time.sleep(0.02)

    def fill_col_part(col, i):
        col.upsert([f"n{i}"], np.ones((1, D), np.float32),
                   [{"vid_num": 0, "side": "left", "t_norm": 0.1}])

    sched = RebuildScheduler(
        sw, lambda: Collection("ragdb", space="cosine"), slow_build)
    sched.kick()
    # Concurrent reads during the rebuild must always see the OLD size.
    sizes = set()
    for _ in range(20):
        sizes.add(sw.count())
        time.sleep(0.005)
    sched.wait()
    assert sizes == {8}
    sched.maybe_swap()
    assert sw.count() == 4


def test_rebuild_error_surfaces_at_swap():
    sw = SwappableCollection(Collection("ragdb", space="cosine"))

    def boom(col):
        raise RuntimeError("rebuild exploded")

    sched = RebuildScheduler(
        sw, lambda: Collection("ragdb", space="cosine"), boom)
    sched.kick()
    sched.wait()
    import pytest

    with pytest.raises(RuntimeError, match="rebuild exploded"):
        sched.maybe_swap()
