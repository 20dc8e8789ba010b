"""Stage-2 per-chunk retrieval cache: sim / contrast / temporal branches.

Equivalent of the reference's stage-2 cache
(reference: nba_proj/train/training_stage2.py:422-805,868-941):

- every chunk is encoded with the frozen ChunkEncoder;
- ``future`` chunk = the chunk ``FUTURE_CHUNK_STEP`` windows ahead within
  the same (vid, clip), clamped to the clip's last chunk like the
  reference's ``min(idx + future_step, last_idx)``
  (reference: :78-96,496-507);
- **sim**: top K_SIM same-side, same-label neighbors of the chunk's own
  embedding; **contrast**: top K_CONTRAST same-side, different-label;
  **temporal**: top K_TEMPORAL same-side neighbors of the *future*
  chunk's embedding — all with self-exclusion and signature dedup, padded
  with zero embeddings and a PAD meta template;
- cached entries are pickled with periodic checkpoints; validation uses
  the same logic LIVE against the current collection
  (reference: :269-389,894-941 ``fetch_live_batch``).
"""

from __future__ import annotations

import os

import numpy as np

from vit_research_tpu.retrieval.cache_bins import KEY_PRECISION
from vit_research_tpu.retrieval.cache_io import (load_cache,  # noqa: F401
                                                 save_cache)

PAD_META = {
    "label": -1, "side": "PAD", "vid": -1, "clip": -1,
    "t_center": -1.0, "t_width": -1.0, "start_idx": -1, "end_idx": -1,
}


def make_chunk_key(chunk) -> tuple:
    return (int(chunk["vid"]), int(chunk["clip"]), int(chunk["start_idx"]))


def normalize_meta(meta) -> dict:
    """Raw collection metadata -> the uniform PAD_META key schema.

    The reference normalized candidate metas to ``vid``/``clip`` keys
    (reference: nba_proj/train/training_stage2.py:176-190); without this
    the cached ``*_meta`` lists would mix raw ``vid_num``/``clip_num``
    rows with PAD rows, and label-less collections would crash the
    batch stack."""
    return {
        "label": int(meta.get("label", -1)),
        "side": str(meta.get("side", "PAD")),
        "vid": int(meta.get("vid_num", meta.get("vid", -1))),
        "clip": int(meta.get("clip_num", meta.get("clip", -1))),
        "t_center": float(meta.get("t_center", -1.0)),
        "t_width": float(meta.get("t_width", -1.0)),
        "start_idx": int(meta.get("start_idx", -1)),
        "end_idx": int(meta.get("end_idx", -1)),
    }


def dedup_signature(meta) -> tuple:
    return (int(meta["vid"]), round(float(meta["t_center"]), KEY_PRECISION))


def same_chunk_meta(query_meta, cand_meta) -> bool:
    return (int(query_meta["vid"]) == int(cand_meta["vid"])
            and int(query_meta["clip"]) == int(cand_meta["clip"])
            and int(query_meta["start_idx"]) == int(cand_meta["start_idx"]))


def build_future_lookup(all_chunks, future_step: int) -> dict:
    """chunk key -> key of the chunk ``future_step`` windows ahead in the
    same clip, clamped to the clip's last chunk — end-of-clip chunks use
    the last chunk (possibly themselves) as their future, never a zero
    embedding (reference: nba_proj/train/training_stage2.py:78-96 clamps
    with ``min(idx + future_step, last_idx)``; an actual zero query would
    cosine-match every row at 0.0 and return arbitrary neighbors)."""
    by_clip: dict = {}
    for ch in all_chunks:
        by_clip.setdefault((int(ch["vid"]), int(ch["clip"])), []).append(ch)
    lookup = {}
    for (vid, clip), chunks in by_clip.items():
        chunks = sorted(chunks, key=lambda c: int(c["start_idx"]))
        keys = [make_chunk_key(c) for c in chunks]
        for i, k in enumerate(keys):
            lookup[k] = keys[min(i + future_step, len(keys) - 1)]
    return lookup


def _meta_from_chunk(ch) -> dict:
    return {
        "label": int(ch["label"]), "side": str(ch["side"]),
        "vid": int(ch["vid"]), "clip": int(ch["clip"]),
        "t_center": float(ch["t_center"]), "t_width": float(ch["t_width"]),
        "start_idx": int(ch["start_idx"]), "end_idx": int(ch["end_idx"]),
    }


def _pad_or_trim(items, k, dim):
    embs = np.zeros((k, dim), np.float32)
    metas = [dict(PAD_META) for _ in range(k)]
    for i, it in enumerate(items[:k]):
        embs[i] = it["emb"]
        metas[i] = it["meta"]
    return embs, metas


def _select_branch(candidates, query_meta, *, want, k, dim,
                   q_label=None, exclude_self=True,
                   near_self_emb=None, self_sim_cap=0.9999):
    """want: 'same' | 'diff' | 'any' (label relation to the query).

    ``q_label`` overrides the query's label for the relation test only
    (the entry's reported metadata is untouched). ``exclude_self=False``
    skips the same-chunk drop — correct for queries that are NOT in the
    collection (live mid-game chunks), whose session-local
    (vid, clip, start_idx) coordinates can collide with unrelated stored
    rows and would otherwise silently drop legitimate neighbors.

    ``near_self_emb`` is the live-query analogue of ``exclude_self``:
    drop candidates whose cosine to it is >= ``self_sim_cap``. A live
    clip scored against a collection that ALREADY holds the same game
    (the offline re-score flow) would otherwise retrieve its own stored
    twin at cosine ~1.0 — a neighbor distribution the stage-2 head,
    trained with coordinate self-exclusion, never saw. Coordinates
    cannot identify the twin here because live numbering is
    session-local; the embedding can."""
    items, seen = [], set()
    if q_label is None:
        q_label = int(query_meta["label"])
    if near_self_emb is not None:
        ns = np.asarray(near_self_emb, np.float32)
        ns = ns / (np.linalg.norm(ns) + 1e-8)
    for cand in candidates:
        m = cand["meta"]
        if exclude_self and same_chunk_meta(query_meta, m):
            continue
        if near_self_emb is not None:
            ce = np.asarray(cand["emb"], np.float32)
            cos = float(np.dot(ce, ns)) / (float(np.linalg.norm(ce)) + 1e-8)
            if cos >= self_sim_cap:
                continue
        if str(m["side"]) != str(query_meta["side"]):
            continue
        sig = dedup_signature(m)
        if sig in seen:
            continue
        lbl = int(m["label"])  # normalize_meta guarantees the key
        if want == "same" and lbl != q_label:
            continue
        if want == "diff" and (lbl == q_label or lbl < 0):
            # Unlabeled candidates (label -1 / missing metadata) are NOT
            # hard negatives — their label is unknown, not different
            # (cache_bins applies the same exclusion to its neg pool).
            continue
        items.append(cand)
        seen.add(sig)
        if len(items) >= k:
            break
    return _pad_or_trim(items, k, dim)


def _query(collection, emb, search_k):
    res = collection.query(query_embeddings=np.asarray(emb, np.float32),
                           n_results=search_k,
                           include=("embeddings", "metadatas"))
    out = []
    for e, m in zip(res["embeddings"][0], res["metadatas"][0]):
        out.append({"emb": np.asarray(e, np.float32),
                    "meta": normalize_meta(m)})
    return out


def build_live_entry(chunk, query_emb, future_emb, collection, *,
                     k_sim: int, k_contrast: int, k_temporal: int,
                     search_k_content: int = 64,
                     search_k_temporal: int = 32,
                     exclude_self: bool = True,
                     self_sim_cap: float | None = None) -> dict:
    """One chunk's sim/contrast/temporal branches against the *current*
    collection (shared by the cache builder and the live validation path).

    ``chunk['retrieval_label']``, when present, overrides the true label
    for BRANCH SELECTION only (sim=same / contrast=diff): an unlabeled
    query (label -1 — the reference's inference-only marker, and every
    live mid-game clip) would otherwise zero-pad its sim branch and
    accept ANY label as "contrast". Callers with a label estimate (e.g.
    the stage-1 proxy class logit, which the reference itself stores as
    ``class_logit`` metadata, nba_proj/ratt_write_clips_to_ragdb.py:
    395-424) can retrieve as if labeled while the entry's
    ``query_meta['label']`` — what ``_stack_entries`` exports as the
    ground-truth ``labels`` array — stays the true label.

    ``exclude_self=False`` is for queries NOT in the collection (live
    chunks): see ``_select_branch``. ``self_sim_cap``, when set, drops
    candidates at cosine >= cap to ``query_emb`` in EVERY branch — the
    embedding-based twin drop for live queries (only the QUERY's twin,
    mirroring the coordinate rule: the future chunk's own stored row
    stays retrievable from the temporal branch, as offline)."""
    dim = int(np.shape(query_emb)[-1])
    query_meta = _meta_from_chunk(chunk)
    q_label = int(chunk.get("retrieval_label", query_meta["label"]))
    near_self = query_emb if self_sim_cap is not None else None
    cap = self_sim_cap if self_sim_cap is not None else 0.9999

    content = _query(collection, query_emb, search_k_content)
    sim_embs, sim_meta = _select_branch(
        content, query_meta, want="same", k=k_sim, dim=dim,
        q_label=q_label, exclude_self=exclude_self,
        near_self_emb=near_self, self_sim_cap=cap)
    con_embs, con_meta = _select_branch(
        content, query_meta, want="diff", k=k_contrast, dim=dim,
        q_label=q_label, exclude_self=exclude_self,
        near_self_emb=near_self, self_sim_cap=cap)

    temporal = _query(collection, future_emb, search_k_temporal)
    tmp_embs, tmp_meta = _select_branch(
        temporal, query_meta, want="any", k=k_temporal, dim=dim,
        q_label=q_label, exclude_self=exclude_self,
        near_self_emb=near_self, self_sim_cap=cap)

    return {
        "query_emb": np.asarray(query_emb, np.float32),
        "future_emb": np.asarray(future_emb, np.float32),
        "query_meta": query_meta,
        "sim_embs": sim_embs, "sim_meta": sim_meta,
        "contrast_embs": con_embs, "contrast_meta": con_meta,
        "temporal_embs": tmp_embs, "temporal_meta": tmp_meta,
    }


def build_stage2_cache(all_chunks, encode_fn, collection, *,
                       k_sim: int, k_contrast: int, k_temporal: int,
                       future_step: int = 2, search_k_content: int = 64,
                       search_k_temporal: int = 32,
                       checkpoint_path: str | None = None,
                       checkpoint_every: int = 100,
                       verbose: bool = False) -> dict:
    """Full cache build.

    Args:
      encode_fn: callable(chunk dict) -> (D,) embedding (frozen
        ChunkEncoder from the memmap store,
        reference: nba_proj/train/training_stage2.py:391-398).

    Periodic checkpoints go to ``checkpoint_path + ".partial"`` and only
    the COMPLETE cache is written to ``checkpoint_path`` — so a
    cache-file existence check (cli train-stage2) can never mistake an
    interrupted build for a finished one, and a rerun resumes from the
    partial file instead of redoing built entries.
    """
    keys = [make_chunk_key(ch) for ch in all_chunks]
    embs = {k: np.asarray(encode_fn(ch), np.float32)
            for k, ch in zip(keys, all_chunks)}
    future = build_future_lookup(all_chunks, future_step)

    partial_path = checkpoint_path + ".partial" if checkpoint_path else None
    cache: dict = {}
    if partial_path and os.path.exists(partial_path):
        cache = load_cache(partial_path)
        if verbose:
            print(f"[CACHE] resuming from {partial_path} "
                  f"({len(cache)} entries)")
    for i, (key, chunk) in enumerate(zip(keys, all_chunks)):
        if key in cache:
            continue
        query_emb = embs[key]
        next_key = future.get(key)
        future_emb = (np.zeros_like(query_emb) if next_key is None
                      else embs[next_key])
        cache[key] = build_live_entry(
            chunk, query_emb, future_emb, collection,
            k_sim=k_sim, k_contrast=k_contrast, k_temporal=k_temporal,
            search_k_content=search_k_content,
            search_k_temporal=search_k_temporal)
        if verbose and (i + 1) % 10 == 0:
            print(f"[CACHE] built {i + 1}/{len(all_chunks)}")
        if partial_path and (i + 1) % checkpoint_every == 0:
            save_cache(cache, partial_path)
    if checkpoint_path:
        save_cache(cache, checkpoint_path)
        if partial_path and os.path.exists(partial_path):
            os.remove(partial_path)
    return cache


def fetch_cache_batch(cache, chunks):
    """Batch of cached entries -> dict of stacked arrays
    (reference: nba_proj/train/training_stage2.py:868-892)."""
    entries = [cache[make_chunk_key(ch)] for ch in chunks]
    return _stack_entries(entries)


def fetch_live_batch(chunks, encode_fn, collection, *, k_sim, k_contrast,
                     k_temporal, future_step: int = 2,
                     search_k_content: int = 64, search_k_temporal: int = 32,
                     all_chunks=None, pool_embs: dict | None = None,
                     exclude_self: bool = True,
                     self_sim_cap: float | None = None):
    """Live (uncached) retrieval for validation
    (reference: nba_proj/train/training_stage2.py:894-941).

    ``pool_embs`` (chunk key -> (D,) embedding) lets a caller that fetches
    many batches over the same pool encode it ONCE — without it every
    call re-encodes the whole pool, which is O(N^2) encodes across a
    full evaluation loop."""
    pool = all_chunks if all_chunks is not None else chunks
    future = build_future_lookup(pool, future_step)
    embs = (pool_embs if pool_embs is not None
            else {make_chunk_key(ch): np.asarray(encode_fn(ch), np.float32)
                  for ch in pool})
    entries = []
    for ch in chunks:
        key = make_chunk_key(ch)
        next_key = future.get(key)
        future_emb = (np.zeros_like(embs[key]) if next_key is None
                      else embs.get(next_key, np.zeros_like(embs[key])))
        entries.append(build_live_entry(
            ch, embs[key], future_emb, collection,
            k_sim=k_sim, k_contrast=k_contrast, k_temporal=k_temporal,
            search_k_content=search_k_content,
            search_k_temporal=search_k_temporal,
            exclude_self=exclude_self, self_sim_cap=self_sim_cap))
    return _stack_entries(entries)


def _stack_entries(entries) -> dict:
    def meta_labels(key):
        return np.asarray([[int(m["label"]) for m in e[key]]
                           for e in entries], np.int32)

    return {
        "query_emb": np.stack([e["query_emb"] for e in entries]),
        "future_emb": np.stack([e["future_emb"] for e in entries]),
        "sim_embs": np.stack([e["sim_embs"] for e in entries]),
        "contrast_embs": np.stack([e["contrast_embs"] for e in entries]),
        "temporal_embs": np.stack([e["temporal_embs"] for e in entries]),
        "sim_labels": meta_labels("sim_meta"),
        "contrast_labels": meta_labels("contrast_meta"),
        "temporal_labels": meta_labels("temporal_meta"),
        "labels": np.asarray([int(e["query_meta"]["label"])
                              for e in entries], np.int32),
    }



