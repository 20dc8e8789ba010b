"""Live event localization: score possession clips the moment they end.

The reference's event pipeline is strictly post-hoc — games are
segmented into clips, clips chunked into a frame store, and only then
does the evaluation harness rank each clip's chunks by stage-2 logit
(reference: nba_proj/test/get_clip_sequences.py:600-813, fed by the
dataset rebuild at :613-629). Nothing can be scored until the whole
game is on disk and the store is rebuilt.

This module closes that gap for the live-segmentation surface
(segment/pipeline.py::KnnHmmStreamSession): the instant a possession
clip's padded extent is final — mid-game — its frames are chunked with
the SAME windowing arithmetic as the offline dataset (data/chunks.py,
reference: nba_proj/dataset.py:189-260), embedded, encoded with the
frozen stage-1 ChunkEncoder, run through live sim/contrast/temporal
retrieval + the stage-2 RATTHeadV2, and returned as one eval row in
exactly the offline schema (evaluate/clip_sequences.py) — so
``cli score-events`` and every downstream consumer work unchanged on
rows produced seconds after the possession ended.

No new inference math: ``score_clip`` is ``infer_clip_sequences``
scoped to a single finished clip, with the frame-store gather replaced
by an in-memory embed of the clip's frames (a live clip is not in any
store yet).
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np

from vit_research_tpu.data.chunks import build_chunks
from vit_research_tpu.evaluate.clip_sequences import infer_clip_sequences
from vit_research_tpu.retrieval.cache_stage2 import make_chunk_key


class LiveEventScorer:
    """Score one finished clip at a time against a retrieval collection.

    Args:
      embed_fn: frame paths -> (N, D) float32 frame embeddings (e.g.
        ``EmbeddingEngine.embed_paths`` — the SAME embedder that built
        the retrieval collection, or retrieval is meaningless).
      encode_batch: (B, T, D) -> (chunk_embs, logits), the frozen
        stage-1 ChunkEncoder (train/train_chunk_encoder.py::make_encode_fn).
      head_apply: callable(query, sim, contrast, temporal) -> (B, 1)
        logits — the trained stage-2 RATTHeadV2.
      collection: vector-store collection of chunk embeddings
        (ratt_db schema) for live retrieval.
      chunk_size/chunk_stride: MUST match the stage-1/stage-2 training
        chunking or the encoder sees shapes it was never trained on.
      proxy_label: live clips carry no make/miss label, and the
        sim/contrast retrieval branches select by label relation —
        an unlabeled (-1) query would zero-pad sim and accept any label
        as contrast. When True (default), the stage-1 encoder's own
        class logit (the supervised proxy head the reference persists
        as ``class_logit`` DB metadata,
        nba_proj/ratt_write_clips_to_ragdb.py:395-424) estimates each
        chunk's label for branch selection only; the emitted row still
        reports ``label`` -1.
      self_sim_cap: drop retrieved candidates at cosine >= this to the
        query chunk (default 0.9999; None disables). Live chunks can't
        use coordinate self-exclusion (session-local numbering), but
        when the scored game is already IN the collection its stored
        twin returns at cosine ~1.0 — a self-leak the stage-2 head never
        saw in training. Genuine neighbors, even overlapping windows of
        near-static video, sit below the cap or are informationally the
        query itself.
    """

    def __init__(self, embed_fn, encode_batch, head_apply, collection, *,
                 chunk_size: int = 8, chunk_stride: int = 2,
                 k_sim: int = 8, k_contrast: int = 8, k_temporal: int = 4,
                 future_step: int = 2, search_k_content: int = 64,
                 search_k_temporal: int = 32, top_k_event_chunks: int = 5,
                 batch_size: int = 16, zeros_query: bool = False,
                 proxy_label: bool = True, emb_cache_cap: int | None = None,
                 self_sim_cap: float | None = 0.9999):
        self.embed_fn = embed_fn
        self.encode_batch = encode_batch
        self.head_apply = head_apply
        self.collection = collection
        self.chunk_size = int(chunk_size)
        self.chunk_stride = int(chunk_stride)
        self.k_sim = int(k_sim)
        self.k_contrast = int(k_contrast)
        self.k_temporal = int(k_temporal)
        self.future_step = int(future_step)
        self.search_k_content = int(search_k_content)
        self.search_k_temporal = int(search_k_temporal)
        self.top_k_event_chunks = int(top_k_event_chunks)
        self.batch_size = int(batch_size)
        self.zeros_query = bool(zeros_query)
        self.proxy_label = bool(proxy_label)
        # frame basename -> (D,) embedding, LRU-bounded at emb_cache_cap
        # (None = unbounded). Segmentation already embedded every frame
        # once; without this score_clip re-embeds each clip's copied
        # frames from disk — a second full embed pass on the deployment
        # target (TPU behind a ~25 MB/s tunnel). Populate with
        # ``remember``; misses fall back to ``embed_fn``.
        self.emb_cache: OrderedDict = OrderedDict()
        self.emb_cache_cap = emb_cache_cap
        self.self_sim_cap = self_sim_cap

    def remember(self, frame_paths, embs) -> None:
        """Cache frame embeddings (keyed by basename — clip dirs hold
        copies of the source frames under the same names) so a later
        ``score_clip`` need not re-embed them."""
        embs = np.asarray(embs, np.float32)
        for p, e in zip(frame_paths, embs):
            key = os.path.basename(str(p))
            self.emb_cache[key] = e
            self.emb_cache.move_to_end(key)
        if self.emb_cache_cap is not None:
            while len(self.emb_cache) > self.emb_cache_cap:
                self.emb_cache.popitem(last=False)

    def _frame_embeddings(self, frame_paths) -> np.ndarray:
        """(N, D) embeddings for the clip's frames: cache hits by
        basename, ONE embed_fn call for all misses."""
        rows = [self.emb_cache.get(os.path.basename(p))
                for p in frame_paths]
        miss = [i for i, r in enumerate(rows) if r is None]
        if miss:
            fresh = np.asarray(
                self.embed_fn([frame_paths[i] for i in miss]), np.float32)
            for j, i in enumerate(miss):
                rows[i] = fresh[j]
        return np.stack([np.asarray(r, np.float32) for r in rows])

    def build_clip_chunks(self, frame_paths, *, side: str, clip_num: int,
                          vid: int) -> list[dict]:
        """Chunk a finished clip's ordered frame paths with the offline
        windowing (``t_norm = i / num_frames`` is within-clip, so it is
        fully determined the moment the clip ends — data/samples.py,
        reference: nba_proj/dataset.py:75-164). Live clips carry no
        make/miss label or event template: ``label`` is -1 (the
        reference's inference-only marker) and frame statuses are -1,
        which chunk to status 0 exactly like offline chunks built
        without a template."""
        n = len(frame_paths)
        samples = [{
            "pth": str(p), "side": str(side), "t_norm": (i + 1) / n,
            "clip_num": int(clip_num), "vid_num": int(vid),
            "label": -1, "status": "", "status_id": -1,
        } for i, p in enumerate(frame_paths)]
        return build_chunks(samples, chunk_size=self.chunk_size,
                            chunk_stride=self.chunk_stride)

    def score_clip(self, frame_paths, *, side: str, clip_num: int,
                   vid: int) -> dict | None:
        """One finished clip -> one eval row (the offline
        ``infer_clip_sequences`` schema: z-normalized logit sequence,
        ``topk_chunks`` event localization, per-chunk frame bounds).
        Returns None when the clip is shorter than one chunk."""
        frame_paths = [str(p) for p in frame_paths]
        chunks = self.build_clip_chunks(frame_paths, side=side,
                                        clip_num=clip_num, vid=vid)
        if not chunks:
            return None
        embs = self._frame_embeddings(frame_paths)
        row_of = {p: i for i, p in enumerate(frame_paths)}

        # ONE batched ChunkEncoder dispatch for the whole clip (the
        # pool-encode inside infer_clip_sequences would otherwise issue
        # one per chunk), which also yields the stage-1 proxy logits.
        # Batch dim padded to a power-of-two bucket: the encoder is
        # jitted, and every distinct num_chunks would otherwise be a
        # fresh TPU compile (60-340 s over the tunnel) stalling the
        # live follow loop mid-game.
        n = len(chunks)
        gathered = np.stack([embs[[row_of[p] for p in ch["frames"]]]
                             for ch in chunks])
        bucket = 1 << (n - 1).bit_length()
        if bucket != n:
            pad = np.zeros((bucket - n,) + gathered.shape[1:], np.float32)
            gathered = np.concatenate([gathered, pad])
        chunk_embs, logits = self.encode_batch(gathered)
        chunk_embs = np.asarray(chunk_embs, np.float32)[:n]
        logits = None if logits is None else np.asarray(logits)[:n]
        chunk_embs = chunk_embs / (np.linalg.norm(chunk_embs, axis=-1,
                                                  keepdims=True) + 1e-8)
        if self.proxy_label and logits is not None:
            for ch, lg in zip(chunks, np.asarray(logits).reshape(-1)):
                ch["retrieval_label"] = int(lg > 0)
        encoded = {make_chunk_key(ch): e
                   for ch, e in zip(chunks, chunk_embs)}

        def encode_fn(ch):
            return encoded[make_chunk_key(ch)]

        rows = infer_clip_sequences(
            chunks, self.head_apply, encode_fn, self.collection,
            k_sim=self.k_sim, k_contrast=self.k_contrast,
            k_temporal=self.k_temporal, future_step=self.future_step,
            search_k_content=self.search_k_content,
            search_k_temporal=self.search_k_temporal,
            batch_size=self.batch_size, zeros_query=self.zeros_query,
            top_k_event_chunks=self.top_k_event_chunks,
            # a live clip is in NO store: its session-local
            # (vid, clip, start_idx) can collide with unrelated stored
            # rows, and coordinate self-exclusion would silently drop
            # them. self_sim_cap is the live substitute: when the SAME
            # game already sits in the collection (the offline re-score
            # flow), the query's stored twin comes back at cosine ~1.0
            # and would systematically inflate the branches — drop it by
            # embedding instead of coordinates
            exclude_self=False, self_sim_cap=self.self_sim_cap)
        return rows[0] if rows else None
