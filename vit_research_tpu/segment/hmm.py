"""Possession-side HMM smoother (left / right / none).

Re-design of the reference's streaming 3-state Viterbi lattice
(reference: nba_proj/hmm.py:5-135). The API surface is kept —
``add_first`` / ``add_col_to_lattice`` / ``decode_sequence`` with
probability dicts keyed ``left/right/none`` — but the implementation
buffers emissions on the host and decodes with one jitted
``lax.scan`` (ops/viterbi.py) instead of a per-frame Python DP loop.

Differences from the reference, by design:
- No 501-column window cap: memory is O(T*3) floats, trivial even for a
  2-hour game (~200k frames). The reference's cap hit an unimplemented
  "shift method" and an interactive `input('stop')`
  (nba_proj/hmm.py:56-65); here decoding any length just works.
- The decoded path is the true argmax path (the reference backtrace has
  an off-by-one, nba_proj/hmm.py:124, and leaves its first entry as -1).
"""

from __future__ import annotations

import numpy as np

import vit_research_tpu.ops.viterbi as viterbi_ops

STATES = ("left", "right", "none")

# Hand-tuned transitions forbidding direct left<->right switches
# (reference: nba_proj/hmm.py:10).
DEFAULT_TRANSITIONS = np.array(
    [
        [0.985, 0.0, 0.015],
        [0.0, 0.985, 0.015],
        [0.15, 0.15, 0.70],
    ],
    dtype=np.float32,
)

UNIFORM_PRIOR = np.full((3,), 1.0 / 3.0, dtype=np.float32)

_PROB_FLOOR = 1e-6  # reference zero-replacement (nba_proj/hmm.py:50-55)


def _col_to_probs(col) -> np.ndarray:
    if isinstance(col, dict):
        p = np.array([col["left"], col["right"], col["none"]], dtype=np.float32)
    else:
        p = np.asarray(col, dtype=np.float32)
    return np.maximum(p, _PROB_FLOOR)


class HMM:
    """Streaming-API Viterbi smoother with batched device decode."""

    def __init__(self, cap_count: int | None = None, transition_matrix=None,
                 prior=None):
        # cap_count kept for API compatibility; used only as an initial
        # buffer-size hint (the buffer grows as needed).
        self.transition_matrix = (
            DEFAULT_TRANSITIONS if transition_matrix is None
            else np.asarray(transition_matrix, dtype=np.float32)
        )
        self.prior = UNIFORM_PRIOR if prior is None else np.asarray(prior, np.float32)
        self._log_trans = np.asarray(
            viterbi_ops.log_transition_matrix(self.transition_matrix))
        cap = int(cap_count) if cap_count else 1024
        self._probs = np.empty((max(cap, 16), 3), dtype=np.float32)
        self.count = 0
        self.decoded_sequence: list = []

    # -- streaming API (reference: nba_proj/hmm.py:16-19,49-107) -------------

    def add_first(self, first) -> None:
        self.count = 0
        self._append(first)

    def add_col_to_lattice(self, col) -> None:
        self._append(col)

    def _append(self, col) -> None:
        if self.count == self._probs.shape[0]:
            grown = np.empty((self._probs.shape[0] * 2, 3), dtype=np.float32)
            grown[: self.count] = self._probs[: self.count]
            self._probs = grown
        self._probs[self.count] = _col_to_probs(col)
        self.count += 1

    def add_cols(self, probs) -> None:
        """Vectorized bulk append of a (T, 3) probability array."""
        probs = np.asarray(probs, dtype=np.float32)
        need = self.count + probs.shape[0]
        if need > self._probs.shape[0]:
            grown = np.empty((max(need, self._probs.shape[0] * 2), 3), np.float32)
            grown[: self.count] = self._probs[: self.count]
            self._probs = grown
        self._probs[self.count: need] = np.maximum(probs, _PROB_FLOOR)
        self.count = need

    # -- decoding (reference: nba_proj/hmm.py:109-135) ------------------------

    def decode_indices(self) -> np.ndarray:
        if self.count == 0:
            return np.zeros((0,), dtype=np.int32)
        log_emit = np.log(self._probs[: self.count])
        path, _ = viterbi_ops.viterbi(
            log_emit, self._log_trans, np.log(self.prior))
        return np.asarray(path)

    def decode_sequence(self) -> list:
        path = self.decode_indices()
        self.decoded_sequence = [STATES[i] for i in path]
        return self.decoded_sequence


_PARALLEL_THRESHOLD = 8192  # beyond this, log-depth decode wins on TPU


def smooth_probabilities(probs, transition_matrix=None, prior=None,
                         parallel: bool | None = None) -> np.ndarray:
    """One-shot decode: (T, 3) or (B, T, 3) probs -> int state path(s).

    This is the vectorized entry the segmentation pipelines use
    (reference pattern: nba_proj/smarter_generate_clips.py:399-411 feeds
    softmax probs column-by-column; here one device call does the game).
    Long sequences automatically use the log-depth associative-scan
    decoder (ops/viterbi.viterbi_parallel); force with ``parallel``."""
    probs = np.maximum(np.asarray(probs, dtype=np.float32), _PROB_FLOOR)
    trans = (DEFAULT_TRANSITIONS if transition_matrix is None
             else np.asarray(transition_matrix, np.float32))
    prior = UNIFORM_PRIOR if prior is None else np.asarray(prior, np.float32)
    log_trans = viterbi_ops.log_transition_matrix(trans)
    log_prior = np.log(prior)
    log_emit = np.log(probs)
    t = probs.shape[-2]
    use_parallel = (t >= _PARALLEL_THRESHOLD) if parallel is None else parallel
    if probs.ndim == 2:
        fn = (viterbi_ops.viterbi_parallel if use_parallel
              else viterbi_ops.viterbi)
        path, _ = fn(log_emit, log_trans, log_prior)
        return np.asarray(path)
    if use_parallel:
        import jax

        paths, _ = jax.vmap(viterbi_ops.viterbi_parallel,
                            in_axes=(0, None, None))(
            log_emit, log_trans, log_prior)
    else:
        paths, _ = viterbi_ops.viterbi_batch(log_emit, log_trans, log_prior)
    return np.asarray(paths)
