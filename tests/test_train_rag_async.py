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

    def rebuild(shadow, project_fn):
        # Re-embed all chunks through the *current* projection — passed
        # live by train_rag's kick(project_np) — the reference's
        # db_rebuild with the trained ProjectionHead.
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

        write_frame_ragdb(samples, embed, shadow, project_fn=project_fn,
                          batch_size=32)

    sched = RebuildScheduler(
        sw, lambda: Collection("ragdb", space="cosine"), rebuild)

    cfg = ExperimentConfig(name="rag", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))

    params, history = train_rag(
        train, val, chunk_embed_fn, retriever, cfg=cfg,
        rebuild_scheduler=sched)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_loss"])
    # At least one shadow rebuild was swapped in (rebuild_every=1).
    assert sched.swaps >= 1
    # The active collection is the rebuilt one (projected embeddings).
    assert sw.count() == len(chunks)
