"""Inference harness: per-clip chunk-logit sequences + event localization.

Equivalent of the reference's evaluation program
(reference: nba_proj/test/get_clip_sequences.py:600-813):

- rebuild the chunk dataset for the test videos, run the stage-2 head with
  live retrieval per batch;
- optional **zeroed-query ablation** (the reference zeroes the local query
  embedding to isolate retrieval's contribution, :684-692);
- per clip: ordered logit / prob / pred sequences, z-normalized logits
  (:94-98), and the top-k event chunks ranked by logit (:569-598);
- results to JSON + CSV (:800-813).

The reference needed explicit sublayer builds and per-block pickle weight
restores to load its model (:490-551); here params load whole from Orbax
or npz (train/checkpoint.py).
"""

from __future__ import annotations

import csv
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vit_research_tpu.retrieval import cache_stage2 as CS
from vit_research_tpu.train.common import batch_iterator


def _frame_bound(ch, pos: int):
    """Global frame NUMBER of a chunk's first/last frame, parsed from its
    frame paths (``vid{N}_frame_{M}``); explicit start_frame/end_frame
    keys win; None when neither is available."""
    explicit = ch.get("start_frame" if pos == 0 else "end_frame")
    if explicit is not None:
        return int(explicit)
    frames = ch.get("frames")
    if not frames:
        return None
    from vit_research_tpu.data import naming

    name = os.path.basename(str(frames[pos]))
    try:
        return naming.parse_frame_name(name)[1]
    except (ValueError, IndexError):
        return None


def z_normalize(x) -> np.ndarray:
    x = np.asarray(x, np.float32)
    if len(x) < 2:
        return x
    return (x - x.mean()) / (x.std() + 1e-6)


def get_topk_chunks_for_sequence(seq, k: int = 5) -> list[dict]:
    """Top-k chunks of one clip by logit; rows carry localization info."""
    k = min(k, len(seq))
    top = sorted(seq, key=lambda x: x["logit"], reverse=True)[:k]
    rows = []
    for rank, x in enumerate(top, start=1):
        sf, ef = x.get("start_frame"), x.get("end_frame")
        row = {
            "rank": rank, "vid": x["vid"], "clip": x["clip"],
            "side": x["side"], "label": x["label"],
            "chunk_start_idx": x["start_idx"],
            "chunk_end_idx": x["end_idx"],
            "start_frame": sf, "end_frame": ef,
            "center_frame": (sf + ef) // 2
            if sf is not None and ef is not None else None,
            "logit": float(x["logit"]), "prob": float(x["prob"]),
            "pred": int(x["pred"]),
        }
        # our extension for cli score-events — added only when the
        # chunk carries an event label so the row schema stays exactly
        # the reference's otherwise (the differential pins equality,
        # reference: nba_proj/test/get_clip_sequences.py:569-598)
        if x.get("status_id") is not None:
            row["status_id"] = x["status_id"]
        rows.append(row)
    return rows


def infer_clip_sequences(chunks, head_apply, encode_fn, collection, *,
                         k_sim: int, k_contrast: int, k_temporal: int,
                         future_step: int = 2, search_k_content: int = 64,
                         search_k_temporal: int = 32, batch_size: int = 16,
                         zeros_query: bool = False,
                         top_k_event_chunks: int = 5,
                         exclude_self: bool = True,
                         self_sim_cap: float | None = None) -> list[dict]:
    """Run the stage-2 head over test chunks with live retrieval.

    Args:
      head_apply: callable(query (B,D), sim, contrast, temporal) ->
        logits (B, 1) (e.g. functools.partial(model.apply, params)).
      zeros_query: zero the local query embedding (ablation).
      exclude_self: drop collection candidates with the query's own
        (vid, clip, start_idx). Keep True when the chunks ARE in the
        collection (the offline eval path, like the reference's);
        pass False for chunks that are not stored (live clips), whose
        session-local coordinates can collide with unrelated rows.
      self_sim_cap: when set, drop candidates at cosine >= cap to the
        query embedding — the embedding-based self-exclusion for live
        queries whose coordinates cannot identify their stored twin
        (cache_stage2.build_live_entry).
    Returns one row dict per clip (reference row schema)."""
    clip_outputs: dict = {}
    # Encode the pool ONCE: fetch_live_batch would otherwise re-encode
    # every chunk per 16-chunk batch (O(N^2/16) device forwards).
    pool_embs = {CS.make_chunk_key(ch):
                 np.asarray(encode_fn(ch), np.float32) for ch in chunks}
    for batch in batch_iterator(chunks, batch_size, shuffle=False,
                                drop_remainder=False):
        raw = CS.fetch_live_batch(
            batch, encode_fn, collection, k_sim=k_sim, k_contrast=k_contrast,
            k_temporal=k_temporal, future_step=future_step,
            search_k_content=search_k_content,
            search_k_temporal=search_k_temporal, all_chunks=chunks,
            pool_embs=pool_embs, exclude_self=exclude_self,
            self_sim_cap=self_sim_cap)
        query = raw["query_emb"]
        if zeros_query:
            query = np.zeros_like(query)
        logits = np.asarray(head_apply(
            jnp.asarray(query, jnp.float32),
            jnp.asarray(raw["sim_embs"], jnp.float32),
            jnp.asarray(raw["contrast_embs"], jnp.float32),
            jnp.asarray(raw["temporal_embs"], jnp.float32))).reshape(-1)
        probs = np.asarray(jax.nn.sigmoid(jnp.asarray(logits)))
        for ch, logit, prob in zip(batch, logits, probs):
            key = (int(ch["vid"]), int(ch["clip"]))
            entry = {
                "vid": int(ch["vid"]), "clip": int(ch["clip"]),
                "side": str(ch["side"]), "label": int(ch["label"]),
                "start_idx": int(ch["start_idx"]),
                "end_idx": int(ch["end_idx"]),
                "t_center": float(ch["t_center"]),
                "start_frame": _frame_bound(ch, 0),
                "end_frame": _frame_bound(ch, -1),
                "logit": float(logit), "prob": float(prob),
                "pred": int(prob > 0.5),
            }
            if "status_id" in ch:
                entry["status_id"] = int(ch["status_id"])
            clip_outputs.setdefault(key, []).append(entry)

    rows = []
    for _key, seq in clip_outputs.items():
        seq = sorted(seq, key=lambda x: x["start_idx"])
        raw_seq = [x["logit"] for x in seq]
        rows.append({
            "clip_key": f"vid{seq[0]['vid']}_clip{seq[0]['clip']}",
            "vid": seq[0]["vid"], "clip": seq[0]["clip"],
            "side": seq[0]["side"], "label": seq[0]["label"],
            "num_chunks": len(seq),
            "start_idxs": [x["start_idx"] for x in seq],
            "end_idxs": [x["end_idx"] for x in seq],
            "start_frames": [x.get("start_frame") for x in seq],
            "end_frames": [x.get("end_frame") for x in seq],
            "t_centers": [x["t_center"] for x in seq],
            "raw_sequence": raw_seq,
            "z_sequence": z_normalize(raw_seq).tolist(),
            "prob_sequence": [x["prob"] for x in seq],
            "pred_sequence": [x["pred"] for x in seq],
            "status_ids": [x.get("status_id") for x in seq],
            "topk_chunks": get_topk_chunks_for_sequence(
                seq, top_k_event_chunks),
        })
    rows.sort(key=lambda x: (x["vid"], x["clip"]))
    return rows


def save_results(rows, out_json: str, out_csv: str | None = None) -> None:
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(rows, f, indent=2)
    if out_csv:
        if rows:
            with open(out_csv, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                for r in rows:
                    w.writerow({k: json.dumps(v) if isinstance(v, (list, dict))
                                else v for k, v in r.items()})
        else:
            open(out_csv, "w").close()
