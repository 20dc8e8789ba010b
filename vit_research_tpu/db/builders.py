"""Vector-DB builders and epoch-periodic rebuilders.

Equivalents of the reference's db_maintainence suite, each taking
callables (embed/project/encode fns) so any backbone or engine plugs in:

- :func:`write_frame_ragdb` — frame-level RAG DB with enrichment
  (reference: nba_proj/write_clips_to_ragdb.py:296-391).
- :func:`rebuild_frame_db` — epoch-periodic frame-level rebuild: wipe,
  re-embed, re-project through the *current* ProjectionHead, upsert
  (reference: nba_proj/db_maintainence/db_rebuild.py:100-232).
- :func:`rebuild_chunk_db` — chunk-level rebuild from 2304-d pooled stats
  through the trained 2304->768 projector
  (reference: nba_proj/db_maintainence/db_rebuild_chunk.py:191-290,
  db_rebuild_ratt.py:169-257).
- :func:`write_ratt_chunk_db` — chunk-encoder embeddings from the memmap
  frame store into the RATT collections
  (reference: nba_proj/ratt_write_clips_to_ragdb.py:318-433).
- :func:`write_labeled_frame_collection` — manually-labeled frame
  embeddings with one-hot prob metadata
  (reference: nba_proj/write_per_vid_embeddings_chroma.py:203-278).
- :func:`write_class_npz` — per-class npz artifacts
  (reference: nba_proj/write_embeddings.py:177-243).

All writes are batched upserts (the reference flushed every ~10 clips;
here the batch size is a parameter).
"""

from __future__ import annotations

import numpy as np

from vit_research_tpu.db.enrich import chunk_stats
from vit_research_tpu.db.frame_store import gather_chunk_embedding_batch


def _batched(items, size):
    for i in range(0, len(items), size):
        yield i, items[i:i + size]


def write_frame_ragdb(samples, embed_fn, collection, *, enricher=None,
                      project_fn=None, batch_size: int = 256) -> int:
    """Frame-level RAG DB write.

    Args:
      samples: per-frame dicts from data/samples.load_samples.
      embed_fn: callable(paths) -> (n, D) base embeddings.
      enricher: optional db.enrich.Enricher applied to the base embeddings.
      project_fn: optional callable (e.g. trained ProjectionHead apply).
    Returns number of rows upserted."""
    total = 0
    max_frame_idx = None
    if enricher is not None:
        from vit_research_tpu.data import naming

        # Corpus-level normalizer, computed ONCE: the index encoding must
        # not depend on how the write is batched (db/enrich.py).
        all_idx = [naming.frame_num(s["pth"].rsplit("/", 1)[-1])
                   for s in samples]
        max_frame_idx = max(all_idx) if all_idx else 1
    for _, batch in _batched(samples, batch_size):
        paths = [s["pth"] for s in batch]
        embs = np.asarray(embed_fn(paths), np.float32)
        if enricher is not None:
            from vit_research_tpu.data import naming

            frame_idx = [naming.frame_num(p.rsplit("/", 1)[-1])
                         for p in paths]
            embs = enricher(embs, [s["t_norm"] for s in batch],
                            [s["side"] for s in batch], frame_idx,
                            max_frame_idx=max_frame_idx)
        if project_fn is not None:
            embs = np.asarray(project_fn(embs), np.float32)
        metas = [{
            "side": s["side"], "t_norm": float(s["t_norm"]),
            "clip_num": int(s["clip_num"]), "vid_num": int(s["vid_num"]),
        } for s in batch]
        collection.upsert(paths, embs, metas)
        total += len(batch)
    return total


def wipe_collection(collection, keep_where: dict | None = None) -> None:
    """Reset a collection before rebuild. The reference deleted everything
    except a sentinel (delete where vid_num != 'vid0',
    reference: nba_proj/db_maintainence/db_rebuild.py:121)."""
    collection.delete(where=keep_where if keep_where is not None else {})


def rebuild_frame_db(samples, embed_fn, project_fn, collection, *,
                     enricher=None, batch_size: int = 256) -> int:
    """Epoch-periodic frame-level rebuild: embeddings move under the
    retriever as the ProjectionHead trains
    (reference: nba_proj/train/training.py:479-480 -> db_rebuild.py)."""
    wipe_collection(collection)
    return write_frame_ragdb(samples, embed_fn, collection,
                             enricher=enricher, project_fn=project_fn,
                             batch_size=batch_size)


def _chunk_id(ch) -> str:
    return f"vid{ch['vid']}_clip{ch['clip']}_s{ch['start_idx']}"


def rebuild_chunk_db(chunk_samples, frame_embed_fn, project_fn, collection, *,
                     include_label: bool = True,
                     batch_size: int = 64) -> int:
    """Chunk-level rebuild from pooled stats: per chunk, frame embeddings
    -> concat(mean, mean-delta, std-delta) (2304-d) -> trained projector
    -> upsert with chunk metadata."""
    wipe_collection(collection)
    total = 0
    for _, batch in _batched(chunk_samples, batch_size):
        frame_paths = [p for ch in batch for p in ch["frames"]]
        t = len(batch[0]["frames"])
        embs = np.asarray(frame_embed_fn(frame_paths), np.float32)
        embs = embs.reshape(len(batch), t, -1)
        stats = chunk_stats(embs)
        proj = np.asarray(project_fn(stats), np.float32)
        ids = [_chunk_id(ch) for ch in batch]
        metas = []
        for ch in batch:
            m = {
                "vid_num": int(ch["vid"]), "clip_num": int(ch["clip"]),
                "side": ch["side"], "t_center": float(ch["t_center"]),
                "t_width": float(ch["t_width"]),
                "start_idx": int(ch["start_idx"]),
                "end_idx": int(ch["end_idx"]),
            }
            if include_label:
                m["label"] = int(ch["label"])
            metas.append(m)
        collection.upsert(ids, proj, metas)
        total += len(batch)
    return total


def write_ratt_chunk_db(chunk_index, store, encode_fn, collections, *,
                        batch_size: int = 256, l2_normalize: bool = True) -> int:
    """Chunk-encoder embeddings into the RATT collections.

    Args:
      chunk_index: dict from db.frame_store.build_chunk_index/load_chunk_index.
      store: FrameStore.
      encode_fn: callable((B, T, D) frame embeddings) ->
        (chunk_embs (B, D), class_logits (B, 1)) — frozen ChunkEncoder.
      collections: one or more target collections (the reference wrote two,
        nba_proj/ratt_write_clips_to_ragdb.py:395-424).
    """
    if not isinstance(collections, (list, tuple)):
        collections = [collections]
    n = len(chunk_index["label"])
    total = 0
    for start in range(0, n, batch_size):
        ids_range = np.arange(start, min(start + batch_size, n))
        frame_embs = gather_chunk_embedding_batch(store, chunk_index,
                                                  ids_range)
        chunk_embs, class_logits = encode_fn(frame_embs)
        chunk_embs = np.array(chunk_embs, np.float32)  # writable copy
        if l2_normalize:
            chunk_embs /= (np.linalg.norm(chunk_embs, axis=1, keepdims=True)
                           + 1e-8)
        ids = [f"chunk_{i}" for i in ids_range]
        metas = [{
            "vid_num": int(chunk_index["vid"][i]),
            "clip_num": int(chunk_index["clip"][i]),
            "side": str(chunk_index["side"][i]),
            "label": int(chunk_index["label"][i]),
            "t_center": float(chunk_index["t_center"][i]),
            "t_width": float(chunk_index["t_width"][i]),
            "class_logit": float(np.asarray(class_logits).reshape(-1)[j]),
            "start_idx": int(chunk_index["start_idx"][i]),
            "end_idx": int(chunk_index["end_idx"][i]),
        } for j, i in enumerate(ids_range)]
        for col in collections:
            col.upsert(ids, chunk_embs, metas)
        total += len(ids_range)
    return total


def write_labeled_frame_collection(frames, labels, probs, embed_fn,
                                   collection, *, batch_size: int = 128) -> int:
    """Manually-labeled frames -> collection with label + per-class prob
    metadata (reference: nba_proj/write_per_vid_embeddings_chroma.py:203-278)."""
    total = 0
    idx = list(range(len(frames)))
    for _, batch_idx in _batched(idx, batch_size):
        paths = [frames[i] for i in batch_idx]
        embs = np.asarray(embed_fn(paths), np.float32)
        metas = [{
            "label": str(labels[i]),
            "left_prob": float(probs[i][0]),
            "right_prob": float(probs[i][1]),
            "none_prob": float(probs[i][2]),
        } for i in batch_idx]
        collection.upsert([p.rsplit("/", 1)[-1] for p in paths], embs, metas)
        total += len(batch_idx)
    return total


def write_class_npz(frames_by_class, embed_fn, out_template: str) -> dict:
    """Per-class npz artifacts: embeddings + frame_ids
    (reference: nba_proj/write_embeddings.py:177-243 wrote
    {left,right,none}_embeddings.npz)."""
    out = {}
    for cls, paths in frames_by_class.items():
        embs = np.asarray(embed_fn(paths), np.float32)
        path = out_template.format(cls=cls)
        np.savez(path, embeddings=embs[:, None, :],
                 frame_ids=np.asarray([p.rsplit("/", 1)[-1] for p in paths],
                                      dtype=str))
        out[cls] = path
    return out


def reproject_chunk_rows(chunks, frame_embs_fn, project_fn, collection, *,
                         batch_size: int = 256) -> int:
    """Re-embed existing ``chunk_{i}`` rows with a LIVE chunk projection,
    preserving stored metadata.

    The RATT training loop's rebuild (reference: db_rebuild_ratt invoked
    from nba_proj/train/training_ratt.py:560-561): rows written by
    :func:`write_ratt_chunk_db` (positional ``chunk_{i}`` ids) get fresh
    embeddings from ``project_fn((B, T, D) frame embeddings) -> (B, D)``
    while their stored metadata — including ``class_logit`` from the
    original frozen-encoder write — is kept. Rows the collection doesn't
    hold yet get metadata synthesized from the chunk dicts.

    Refuses on store/collection mismatch: positional ids are only
    meaningful when the collection was written from the SAME store and
    chunking, so a stored row whose (vid_num, start_idx) disagrees with
    the chunk at that position is a hard error, not a silent
    embedding/metadata mix-up.
    """
    total = 0
    for s in range(0, len(chunks), batch_size):
        batch = chunks[s:s + batch_size]
        ids = [f"chunk_{i}" for i in range(s, s + len(batch))]
        z = np.array(project_fn(
            np.asarray(frame_embs_fn(batch), np.float32)), np.float32)
        z /= (np.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
        got = collection.get(ids=ids)
        by_id = dict(zip(got.get("ids", []), got.get("metadatas") or []))
        metas = []
        for cid, ch in zip(ids, batch):
            m = by_id.get(cid)
            if m is not None:
                # A row missing vid_num/start_idx is itself suspect — it
                # wasn't written by write_ratt_chunk_db, so positional-id
                # identity can't be trusted. Treat missing as mismatch
                # rather than defaulting to the expected values (ADVICE r3).
                if (int(m.get("vid_num", -1)) != int(ch["vid"])
                        or int(m.get("start_idx", -1))
                        != int(ch["start_idx"])):
                    raise ValueError(
                        f"collection row {cid} (vid "
                        f"{m.get('vid_num')}, start {m.get('start_idx')}) "
                        f"does not match the store's chunk at that "
                        f"position (vid {ch['vid']}, start "
                        f"{ch['start_idx']}): the chunk index and the "
                        "collection come from different stores or "
                        "chunkings — refusing to mix embeddings and "
                        "metadata")
            else:
                m = {
                    "vid_num": int(ch["vid"]), "clip_num": int(ch["clip"]),
                    "side": ch["side"], "label": int(ch["label"]),
                    "t_center": float(ch["t_center"]),
                    "t_width": float(ch["t_width"]),
                    "start_idx": int(ch["start_idx"]),
                    "end_idx": int(ch["end_idx"]),
                }
            metas.append(m)
        collection.upsert(ids, z, metas)
        total += len(batch)
    return total
