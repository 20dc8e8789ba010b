"""End-to-end possession segmentation pipelines.

Three orchestrations, mirroring the reference's evolution:

1. :func:`segment_with_knn_streaks` — the earliest path
   (reference: nba_proj/generate_clips.py:99-368): per-frame k-NN vote
   with stored-prob averaging, sliding-window streak detection with
   flagged re-checks, `clip_intervals.csv` plus confident self-upserts.
2. :func:`segment_with_knn_hmm` — the generate_clips_hmm path
   (reference: nba_proj/generate_clips_hmm.py:367-490): embed every frame,
   k-NN fused-confidence emissions against a labeled corpus, Viterbi
   smooth, extract padded clips; confident frames are upserted back into
   the corpus collection. The reference did 3 device/DB crossings per
   frame (its slowest loop, SURVEY.md section 3.2); here each stage is one
   batched pass.
3. :func:`segment_with_temporal_head` — the "smarter" path
   (reference: nba_proj/smarter_generate_clips.py:349-423): embed, label
   from manual intervals, train (or reuse) the TemporalHead CNN, softmax
   probs, Viterbi smooth, write clips.

All return the decoded sequence and the clip directories written.
"""

from __future__ import annotations

import os

import numpy as np

from vit_research_tpu.data import naming
from vit_research_tpu.segment import clips as clips_mod
from vit_research_tpu.segment import knn as knn_mod
from vit_research_tpu.segment.hmm import STATES, smooth_probabilities


def segment_with_knn_hmm(frame_names, embeddings, corpus, *,
                         out_root: str | None = None,
                         src_dir: str | None = None,
                         k: int = 50, confidence_threshold: float = 0.7,
                         min_len: int = 100, pad: int = 100,
                         collection=None, vid: int | None = None,
                         metric: str = "l2", transition_matrix=None):
    """Args:
      frame_names: ordered frame filenames.
      embeddings: (N, D) frame embeddings (from parallel/embed.py).
      corpus: dict with 'embeddings' (M, D), 'labels' (M,) int ids,
        'probs' (M, 3) stored per-frame probabilities.
      collection: optional vector-store collection for confident
        write-back (reference: nba_proj/generate_clips_hmm.py:459-471).
      transition_matrix: optional (3, 3) HMM transitions overriding the
        reference's hand-tuned matrix (calibrate with segment/tune.py).
    Returns (decoded list[str], clip_dirs, fused dict)."""
    nl, idx, _ = knn_mod.knn_labels(
        embeddings, corpus["embeddings"], corpus["labels"], k, metric=metric)
    neighbor_probs = np.asarray(corpus["probs"])[np.asarray(idx)]
    fused = knn_mod.fused_confidence(
        nl, neighbor_probs, top_n=k,
        confidence_threshold=confidence_threshold)

    path = smooth_probabilities(fused["emissions"],
                                transition_matrix=transition_matrix)
    decoded = [STATES[i] for i in path]

    _confident_writeback(collection, fused, frame_names, embeddings, vid)

    clip_dirs = []
    if out_root is not None and src_dir is not None:
        clip_dirs = clips_mod.save_clips_from_sequence(
            decoded, list(frame_names), src_dir, out_root,
            min_len=min_len, pad=pad, vid=vid)
    return decoded, clip_dirs, fused


class KnnHmmStreamSession:
    """Stateful per-batch body for live kNN+HMM segmentation, shared by
    :func:`segment_knn_hmm_stream` and the serving daemon's segment
    sessions (one implementation, two surfaces).

    Built for arbitrary arrival patterns on a shared chip:

    - the corpus is staged to the DEVICE once at construction — a
      per-push host→device re-upload of a large corpus would dominate
      every batch (hundreds of MB for a six-figure frame corpus);
    - query batches are zero-padded to power-of-two buckets, so clients
      pushing ragged batch sizes reuse a handful of compiled top-k
      shapes instead of triggering one compile per distinct length;
    - ``metric`` follows the vector store's semantics: ``'cosine'``
      L2-normalizes corpus and queries and ranks by dot product, exactly
      like ``Collection.query`` over the same rows; ``'l2'``/``'ip'``
      pass through;
    - confident write-back (pass ``collection``) mirrors the offline
      pipeline's per-frame math and new-ids-only guard.
    """

    def __init__(self, corpus, *, k: int = 50,
                 confidence_threshold: float = 0.7,
                 min_len: int = 100, pad: int = 100, max_lag: int = 512,
                 drain_every: int = 32, collection=None,
                 vid: int | None = None, metric: str = "l2",
                 corpus_prenormalized: bool = False,
                 transition_matrix=None):
        import jax
        import jax.numpy as jnp

        from vit_research_tpu.ops.topk import l2_normalize
        from vit_research_tpu.segment.hmm import StreamingViterbi

        self._metric = metric
        if metric == "cosine":
            self._topk_metric = "ip"
        elif metric in ("l2", "ip"):
            self._topk_metric = metric
        else:
            raise ValueError(f"unknown metric {metric!r}")
        # jnp.asarray is a no-op for an already-device f32 array, so a
        # caller holding a staged corpus (the serving daemon's shared
        # snapshot) pays no re-transfer; cosine normalization is one
        # device op over resident rows (no host round-trip).
        embs = jnp.asarray(corpus["embeddings"], jnp.float32)
        if metric == "cosine" and not corpus_prenormalized:
            # corpus_prenormalized lets a server normalize ONCE and share
            # the resident buffer across sessions (queries are always
            # normalized per batch below)
            embs = l2_normalize(embs)
        self._corpus_dev = jax.device_put(embs)
        self._labels = np.asarray(corpus["labels"])
        self._probs = np.asarray(corpus["probs"])
        self.k = int(k)
        self.confidence_threshold = float(confidence_threshold)
        self.collection = collection
        self.vid = vid
        self.viterbi = StreamingViterbi(
            max_lag=max_lag, drain_every=drain_every,
            transition_matrix=transition_matrix)
        self.extractor = clips_mod.StreamingClipExtractor(
            min_len=min_len, pad=pad)
        self.frames_seen = 0

    @property
    def corpus_size(self) -> int:
        return len(self._labels)

    @property
    def forced(self) -> int:
        return self.viterbi.forced

    def push_batch(self, frame_names, embeddings) -> list:
        """One micro-batch: kNN vote → streaming Viterbi → online clip
        extraction. Returns the ClipIntervals (global frame indices)
        whose padded extent became final."""
        from vit_research_tpu.ops.topk import l2_normalize, masked_topk

        embeddings = np.asarray(embeddings, np.float32)
        n = len(embeddings)
        if n == 0:
            return []
        q = embeddings
        bucket = 1 << max(4, int(n - 1).bit_length())
        if bucket != n:
            q = np.concatenate(
                [q, np.zeros((bucket - n, q.shape[1]), np.float32)])
        if self._metric == "cosine":
            # normalize AFTER padding (zero rows stay zero under the
            # eps guard) so ragged pushes compile one normalize+top-k
            # graph per bucket, not per distinct batch length
            q = l2_normalize(q)
        scores, idx = masked_topk(q, self._corpus_dev, None, k=self.k,
                                  metric=self._topk_metric)
        scores = np.asarray(scores)[:n]
        idx = np.asarray(idx)[:n]
        nl = np.where(scores > -1e29, self._labels[idx], -1)
        fused = knn_mod.fused_confidence(
            nl, self._probs[idx], top_n=self.k,
            confidence_threshold=self.confidence_threshold)
        _confident_writeback(self.collection, fused, list(frame_names),
                             embeddings, self.vid)
        clips = []
        for row in fused["emissions"]:
            for state in self.viterbi.push(row):
                clips.extend(self.extractor.push(STATES[state]))
        self.frames_seen += n
        return clips

    def finish(self) -> list:
        """Flush the decoder and the extractor; returns the tail clips."""
        clips = []
        for state in self.viterbi.finish():
            clips.extend(self.extractor.push(STATES[state]))
        clips.extend(self.extractor.finish())
        return clips


def segment_knn_hmm_stream(batches, corpus, *, k: int = 50,
                           confidence_threshold: float = 0.7,
                           min_len: int = 100, pad: int = 100,
                           max_lag: int = 512, drain_every: int = 32,
                           collection=None,
                           vid: int | None = None, metric: str = "l2",
                           transition_matrix=None):
    """Live variant of :func:`segment_with_knn_hmm` for streams.

    The reference's generate_clips_hmm loop WAS incremental — one frame
    at a time through embed → 50-NN → lattice
    (reference: nba_proj/generate_clips_hmm.py:367-490) — but it could
    only decode (and hence emit clips) after the whole game, and paid
    3 device/DB crossings per frame. This generator keeps the
    incremental delivery and drops the cost: consume an iterator of
    ``(frame_names, embeddings)`` micro-batches as the embedder produces
    them, run one batched k-NN fused-confidence pass per micro-batch
    (:class:`KnnHmmStreamSession`), push emissions through
    StreamingViterbi (bounded memory, states final as soon as survivor
    paths coalesce — segment/hmm.py), and yield
    :class:`~vit_research_tpu.segment.clips.ClipInterval`\\ s with
    GLOBAL frame indices the moment their padded extent is final —
    minutes before a 2-hour game ends, not after it.

    Confident frames are written back to ``collection`` per micro-batch
    (same per-frame math and new-ids-only guard as the offline path, so
    the final collection contents are identical). On decisive streams
    the yielded clips equal the offline pipeline's exactly; ambiguous
    stretches longer than ``max_lag`` fall back to fixed-lag commits
    (see StreamingViterbi).
    """
    session = KnnHmmStreamSession(
        corpus, k=k, confidence_threshold=confidence_threshold,
        min_len=min_len, pad=pad, max_lag=max_lag,
        drain_every=drain_every, collection=collection, vid=vid,
        metric=metric, transition_matrix=transition_matrix)
    for frame_names, embeddings in batches:
        yield from session.push_batch(frame_names, embeddings)
    yield from session.finish()


def _confident_writeback(collection, fused, frame_names, embeddings, vid):
    """Upsert confident frames back into the corpus collection
    (reference: nba_proj/generate_clips_hmm.py:459-471,
    nba_proj/generate_clips.py:345-368). Only NEW frame ids are written:
    ids are frame basenames, and overwriting an existing row would
    replace manually-labeled seed metadata with a kNN-derived guess
    (same guard as the CLI's self-label --upsert)."""
    if collection is None or not fused["confident"].any():
        return
    existing = set(collection.get(ids=list(frame_names))["ids"])
    sel = [i for i in np.nonzero(fused["confident"])[0]
           if frame_names[i] not in existing]
    if not sel:
        return
    metas = []
    for i in sel:
        p = fused["upsert_probs"][i]
        metas.append({
            "label": STATES[fused["decision"][i]],
            "video": vid if vid is not None
            else naming.vid_num(frame_names[i]),
            "left_prob": float(p[0]),
            "right_prob": float(p[1]),
            "none_prob": float(p[2]),
        })
    collection.upsert([frame_names[i] for i in sel],
                      np.asarray(embeddings)[sel], metas)


def segment_with_knn_streaks(frame_names, embeddings, corpus, *,
                             out_root: str | None = None,
                             src_dir: str | None = None,
                             k: int = 25,
                             confidence_threshold: float = 0.85,
                             window: int = 50, dominance: float = 0.8,
                             min_len: int = 50, pad: int = 0,
                             collection=None, vid: int | None = None,
                             metric: str = "l2",
                             intervals_csv: str | None = None):
    """The pre-HMM streaming classifier as one batched pass
    (reference: nba_proj/generate_clips.py:99-368): k-NN fused decisions,
    sliding-window streak detection with flagged re-checks
    (segment/streaks.py), optional `clip_intervals.csv`, optional clip
    dirs, and confident (>= threshold) self-upserts.

    Returns (decoded list[str], clip_dirs, intervals) where ``intervals``
    is the raw list of (side_id, start, end)."""
    from vit_research_tpu.segment.streaks import streak_intervals

    nl, idx, _ = knn_mod.knn_labels(
        embeddings, corpus["embeddings"], corpus["labels"], k, metric=metric)
    neighbor_probs = np.asarray(corpus["probs"])[np.asarray(idx)]
    fused = knn_mod.fused_confidence(
        nl, neighbor_probs, top_n=k,
        confidence_threshold=confidence_threshold)

    conf = np.max(fused["fused"], axis=1)
    intervals = streak_intervals(
        fused["decision"], conf, window=window, dominance=dominance,
        conf_threshold=confidence_threshold, min_len=min_len)

    decoded = ["none"] * len(frame_names)
    for side, s, e in intervals:
        decoded[s:e + 1] = [STATES[side]] * (e - s + 1)

    _confident_writeback(collection, fused, frame_names, embeddings, vid)

    if intervals_csv is not None:
        with open(intervals_csv, "w") as f:
            f.write("side,start_frame,end_frame\n")
            for side, s, e in intervals:
                f.write(f"{STATES[side]},"
                        f"{naming.frame_num(frame_names[s])},"
                        f"{naming.frame_num(frame_names[e])}\n")

    clip_dirs = []
    if out_root is not None and src_dir is not None:
        clip_dirs = clips_mod.save_clips_from_sequence(
            decoded, list(frame_names), src_dir, out_root,
            min_len=min_len, pad=pad, vid=vid)
    return decoded, clip_dirs, intervals


def segment_with_temporal_head(frame_names, embeddings, manual_intervals, *,
                               out_root: str | None = None,
                               src_dir: str | None = None,
                               params_path: str | None = None,
                               epochs: int = 3000, lr: float = 1e-5,
                               min_len: int = 100, pad: int = 100,
                               vid: int | None = None, seed: int = 0):
    """The smarter_generate_clips pipeline. Caches trained TemporalHead
    params at ``params_path`` (.npz) like the reference's ``.pt`` reuse
    (reference: nba_proj/smarter_generate_clips.py:379-387)."""
    from vit_research_tpu.models.temporal_head import TemporalHead
    from vit_research_tpu.train.checkpoint import (
        load_params_npz,
        save_params_npz,
    )
    from vit_research_tpu.train.train_temporal import (
        predict_probs,
        train_temporal_head,
    )

    labels = np.asarray(manual_intervals.label_array(frame_names), np.int32)

    model = TemporalHead(embed_dim=np.shape(embeddings)[-1])
    if params_path and os.path.exists(params_path):
        import jax
        import jax.numpy as jnp

        template = model.init(jax.random.PRNGKey(seed),
                              jnp.zeros((1, 4, np.shape(embeddings)[-1])))
        params = load_params_npz(template, params_path)
    else:
        model, params, _ = train_temporal_head(
            embeddings, labels, epochs=epochs, lr=lr, seed=seed)
        if params_path:
            save_params_npz(params, params_path)

    probs = predict_probs(model, params, embeddings)
    path = smooth_probabilities(probs)
    decoded = [STATES[i] for i in path]

    clip_dirs = []
    if out_root is not None and src_dir is not None:
        clip_dirs = clips_mod.save_clips_from_sequence(
            decoded, list(frame_names), src_dir, out_root,
            min_len=min_len, pad=pad, vid=vid)
    return decoded, clip_dirs, probs
