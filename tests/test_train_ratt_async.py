"""train_ratt with the async rebuild scheduler: the kick passes the
LIVE 2304->768 chunk projection — a trainer-specific contract
(project_fn takes (B, T, D) frame embeddings, unlike train_rag's (B, d)
chunk embeddings), so this path needs its own coverage
(reference: nba_proj/train/training_ratt.py:560-561 rebuild cadence)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_training_loops import HEAD, TRAIN, chunk_world, \
    fill_collection, frame_embs_fn  # noqa: E402

from vit_research_tpu.retrieval.retrievers import RattChunkRetriever  # noqa: E402
from vit_research_tpu.store.vector_store import Collection  # noqa: E402
from vit_research_tpu.train.async_rebuild import (  # noqa: E402
    RebuildScheduler,
    SwappableCollection,
)
from vit_research_tpu.train.train_ratt import train_ratt  # noqa: E402
from vit_research_tpu.utils.configs import (  # noqa: E402
    ExperimentConfig,
    RetrievalConfig,
)


def test_train_ratt_with_async_rebuild():
    chunks = chunk_world()
    train = [c for c in chunks if c["vid"] <= 3]
    val = [c for c in chunks if c["vid"] == 4]

    base = fill_collection(chunks)
    sw = SwappableCollection(base)
    retriever = RattChunkRetriever(sw, top_k=4)

    shapes_seen = []

    def rebuild(shadow, project_fn):
        # Re-embed every chunk through the CURRENT chunk projection
        # (frame embeddings -> 2304-d stats -> 768), the reference's
        # db_rebuild_ratt with the trained projector.
        fe = np.asarray(frame_embs_fn(chunks), np.float32)
        z = np.asarray(project_fn(fe))
        shapes_seen.append((fe.shape, z.shape))
        ids = [f"v{c['vid']}c{c['clip']}s{c['start_idx']}" for c in chunks]
        metas = [{"vid_num": c["vid"], "clip_num": c["clip"],
                  "side": c["side"], "label": int(c["label"]),
                  "t_center": c["t_center"], "t_width": c["t_width"],
                  "start_idx": c["start_idx"], "end_idx": c["end_idx"]}
                 for c in chunks]
        z = z / np.maximum(np.linalg.norm(z, axis=1, keepdims=True), 1e-12)
        shadow.upsert(ids, z, metas)

    sched = RebuildScheduler(
        sw, lambda: Collection("ratt_db", space="cosine"), rebuild)

    cfg = ExperimentConfig(name="ratt", head=HEAD, train=TRAIN,
                           retrieval=RetrievalConfig(top_k=4))
    params, history = train_ratt(
        train, val, frame_embs_fn, retriever, cfg=cfg,
        rebuild_scheduler=sched)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val_loss"])
    # At least one shadow rebuild swapped in (rebuild_every=1).
    assert sched.swaps >= 1
    assert sw.count() == len(chunks)
    # The kick forwarded the frame-embedding projection contract:
    # (N, T, D) in, (N, D) out.
    assert shapes_seen and shapes_seen[0][0][2] == shapes_seen[0][1][1]
    assert shapes_seen[0][0][0] == len(chunks)
