"""kNN vote classifiers for possession-side labeling.

Three reference behaviors, re-implemented batched:

1. **Two-pass self-labeling** (reference: nba_proj/chroma.py:36-134):
   query 25-NN; if >=20/25 neighbors agree the frame is accepted with
   temperature-softmax vote probabilities (T=7) and written back to the
   DB; undecided frames go to pass 2 against the enlarged corpus, where
   plain argmax decides.
2. **Streaming fused confidence**
   (reference: nba_proj/generate_clips_hmm.py:179-310): per-frame
   confidence per class = (neighbor-vote fraction + mean stored
   probability) / 2; these feed the HMM as emissions; results with mean
   prob >= 0.7 (0.999998 when the vote is unanimous) are upserted back.
3. **Plain streak voting** (reference: nba_proj/generate_clips.py:99-187)
   is the same machinery with count-only confidence.

The reference did one ANN query per frame (the slowest loop in the repo,
SURVEY.md section 3.2); here neighbor search is one masked matmul for the
whole frame set (ops/topk.py), and the vote math is vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from vit_research_tpu.ops.topk import masked_topk

SIDES = ("left", "right", "none")


def corpus_from_collection(col) -> dict:
    """Read a labeled frame collection (write-frame-db / self-label
    write-backs) into the kNN corpus dict shape used by segment/*:
    ``{'embeddings' (M, D), 'labels' (M,) int ids, 'probs' (M, 3)}``.

    Raises ValueError for empty or unlabeled collections (callers like
    the CLI translate this into their own exit semantics)."""
    got = col.get(include=("embeddings", "metadatas"))
    if not got["ids"]:
        raise ValueError(f"collection {col.name!r} is empty — build it "
                         "with write-frame-db first")
    labels, probs = [], []
    for m in got["metadatas"]:
        label = m.get("label")
        if label is None:
            raise ValueError(
                f"collection {col.name!r} rows carry no 'label' metadata "
                "— not a labeled frame collection (frame RAG collections "
                "store side/t_norm only; build a corpus with "
                "write-frame-db)")
        label = str(label)
        if label not in SIDES:
            raise ValueError(f"collection {col.name!r} has non-side label "
                             f"{label!r}; not a labeled frame collection")
        labels.append(SIDES.index(label))
        probs.append([float(m.get(f"{s}_prob", 0.0)) for s in SIDES])
    return {"embeddings": np.asarray(got["embeddings"], np.float32),
            "labels": np.asarray(labels, np.int64),
            "probs": np.asarray(probs, np.float32)}


def temp_softmax(x, temperature: float = 1.0) -> np.ndarray:
    x = np.asarray(x, np.float64) / temperature
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def knn_labels(query_embs, corpus_embs, corpus_labels, k: int,
               metric: str = "l2", mask=None):
    """Batched k-NN: returns (neighbor_label_ids (Q, k), neighbor_idx).

    corpus_labels: int array (N,) with 0=left, 1=right, 2=none.
    ``metric='cosine'`` ranks by angle (both sides L2-normalized here —
    ops/topk.masked_topk expects pre-normalized inputs for 'cosine',
    so passing raw rows would silently rank by unnormalized dot
    product, favoring large-norm rows regardless of direction)."""
    q = np.asarray(query_embs, np.float32)
    c = np.asarray(corpus_embs, np.float32)
    if metric == "cosine":
        from vit_research_tpu.ops.topk import l2_normalize

        q = np.asarray(l2_normalize(q))
        c = np.asarray(l2_normalize(c))
    scores, idx = masked_topk(q, c, mask, k=k, metric=metric)
    idx = np.asarray(idx)
    valid = np.asarray(scores) > -1e29
    labels = np.asarray(corpus_labels)[idx]
    labels = np.where(valid, labels, -1)
    return labels, idx, valid


def vote_counts(neighbor_labels) -> np.ndarray:
    """(Q, k) label ids -> (Q, 3) votes (ignores -1 padding)."""
    counts = np.stack([(neighbor_labels == c).sum(axis=1) for c in range(3)],
                      axis=1)
    return counts


def classify_pass1(neighbor_labels, min_votes: int = 20,
                   temperature: float = 7.0):
    """Pass-1 decision per query: side index or -1 (defer to pass 2),
    plus temperature-softmax probs (reference: nba_proj/chroma.py:36-71)."""
    counts = vote_counts(neighbor_labels)
    winner = counts.argmax(axis=1)
    accept = counts.max(axis=1) >= min_votes
    decision = np.where(accept, winner, -1)
    probs = temp_softmax(counts, temperature)
    return decision, probs


def classify_pass2(neighbor_labels, temperature: float = 7.0):
    """Pass-2: plain argmax (reference: nba_proj/chroma.py:102-134)."""
    counts = vote_counts(neighbor_labels)
    return counts.argmax(axis=1), temp_softmax(counts, temperature)


def fused_confidence(neighbor_labels, neighbor_probs, *, top_n: int,
                     confidence_threshold: float = 0.7):
    """Streaming-classifier confidence fusion
    (reference: nba_proj/generate_clips_hmm.py:179-310).

    Args:
      neighbor_labels: (Q, k) label ids (-1 = padding).
      neighbor_probs: (Q, k, 3) stored per-neighbor probabilities.
      top_n: the k used for the unanimity check.

    Returns dict with:
      'emissions' (Q, 3): mean stored probabilities -> HMM emission probs.
      'fused' (Q, 3): (vote fraction + mean prob) / 2 -> decision scores.
      'decision' (Q,): argmax of fused.
      'confident' (Q,): mean-prob >= threshold -> eligible for upsert.
      'upsert_probs' (Q, 3): probs to store back (0.999998 one-hot when
        the vote is unanimous, else the class means).
    """
    q, k = neighbor_labels.shape
    valid = (neighbor_labels >= 0)[..., None].astype(np.float64)
    denom = np.maximum(valid.sum(axis=1), 1.0)
    mean_probs = (np.asarray(neighbor_probs, np.float64) * valid).sum(axis=1) \
        / denom
    counts = vote_counts(neighbor_labels).astype(np.float64)
    frac = counts / max(k, 1)
    fused = (mean_probs + frac) / 2.0
    decision = fused.argmax(axis=1)

    dec_mean = np.take_along_axis(mean_probs, decision[:, None], axis=1)[:, 0]
    confident = dec_mean >= confidence_threshold
    unanimous = np.take_along_axis(counts, decision[:, None], axis=1)[:, 0] \
        == top_n
    upsert_probs = mean_probs.copy()
    one_hot = np.full((q, 3), 1e-6)
    np.put_along_axis(one_hot, decision[:, None], 0.999998, axis=1)
    upsert_probs = np.where(unanimous[:, None], one_hot, upsert_probs)
    return {
        "emissions": mean_probs,
        "fused": fused,
        "decision": decision,
        "confident": confident,
        "upsert_probs": upsert_probs,
    }


def two_pass_self_label(query_embs, corpus_embs, corpus_labels, *,
                        k: int = 25, min_votes: int = 20,
                        temperature: float = 7.0, metric: str = "l2"):
    """Full two-pass self-labeling over a frame set.

    Pass 1 labels confident frames against the seed corpus; accepted
    frames join the corpus (as in the reference's upsert-back,
    nba_proj/chroma.py:257-309) and pass 2 labels the rest against the
    enlarged corpus.

    Returns (labels (Q,), probs (Q, 3), accepted_pass1 (Q,) bool)."""
    query_embs = np.asarray(query_embs, np.float32)
    nl, _, _ = knn_labels(query_embs, corpus_embs, corpus_labels, k,
                          metric=metric)
    decision, probs = classify_pass1(nl, min_votes, temperature)
    accepted = decision >= 0

    out_labels = decision.copy()
    out_probs = probs.copy()
    deferred = ~accepted
    if deferred.any():
        big_corpus = np.concatenate(
            [np.asarray(corpus_embs, np.float32), query_embs[accepted]], axis=0)
        big_labels = np.concatenate(
            [np.asarray(corpus_labels), decision[accepted]], axis=0)
        nl2, _, _ = knn_labels(query_embs[deferred], big_corpus, big_labels,
                               k, metric=metric)
        d2, p2 = classify_pass2(nl2, temperature)
        out_labels[deferred] = d2
        out_probs[deferred] = p2
    return out_labels, out_probs, accepted
