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


def validate_transition_matrix(m) -> np.ndarray:
    """Check a user-supplied transition matrix and return it as (3, 3)
    float32. Raises ValueError on anything that would silently corrupt
    the Viterbi decode: wrong shape, non-finite or negative entries, or
    rows that are not probability distributions (e.g. raw transition
    COUNTS — a zero row collapses to log(0) everywhere, an unnormalized
    row biases every step by a constant)."""
    m = np.asarray(m, dtype=np.float32)
    if m.shape != (3, 3):
        raise ValueError(f"transition matrix must be 3x3, got shape "
                         f"{m.shape}")
    if not np.isfinite(m).all():
        raise ValueError("transition matrix has non-finite entries")
    if (m < 0).any():
        raise ValueError("transition matrix has negative entries")
    rows = m.sum(axis=1)
    if not np.allclose(rows, 1.0, atol=1e-3):
        raise ValueError(
            "transition matrix rows must each sum to 1 (probabilities, "
            f"not counts); row sums are {rows.tolist()}")
    return m


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


class StreamingViterbi:
    """Online Viterbi decoder with bounded memory and bounded latency.

    The capability the reference wanted but never built: its lattice kept
    every column and hit an unimplemented "shift method" + interactive
    ``input('stop')`` at the 501-column window cap (reference:
    nba_proj/hmm.py:32-35,56-65 — the author's comment asks exactly "how
    do I efficiently shift out some of the frames in the window ... while
    keeping the decoded sequence intact"). This class answers it:

    - States are emitted as soon as EVERY survivor path agrees on them
      (path coalescence) — those emissions are exactly the offline
      decode's prefix.
    - A state that falls ``max_lag`` frames behind is force-committed
      along the current best path (classic fixed-lag Viterbi), and the
      lattice is re-anchored on the committed state, so the rest of the
      decode is exact *conditioned on* the commitments and the emitted
      sequence is always a valid path (no forbidden transitions).
    - Memory is O(max_lag * S) regardless of stream length.

    Coalescence is checked every ``drain_every`` pushes (one O(window)
    sweep), so emissions arrive in bursts, but the pending window never
    exceeds ``max_lag`` after a push returns — a push that would exceed
    it drains immediately. On pathological streams that never coalesce,
    each push past the lag bound pays the O(max_lag * S^2) forced-commit
    rebuild (~0.04 ms at S=3, max_lag=512 — still far cheaper than the
    frame work upstream). Math follows ops/viterbi.py exactly (f32, emission
    added after the max, first-argmax tie-breaking), so with an infinite
    ``max_lag`` the concatenated emissions equal
    :func:`smooth_probabilities` bit-for-bit.

    Usage::

        sv = StreamingViterbi(max_lag=512)
        for probs in frame_probability_stream:   # each (3,) or dict
            for state in sv.push(probs):
                handle(STATES[state])
        for state in sv.finish():
            handle(STATES[state])
    """

    def __init__(self, max_lag: int = 512, *, transition_matrix=None,
                 prior=None, drain_every: int = 32):
        if max_lag < 1:
            raise ValueError(f"max_lag must be >= 1, got {max_lag}")
        trans = (DEFAULT_TRANSITIONS if transition_matrix is None
                 else np.asarray(transition_matrix, np.float32))
        self._log_trans = np.asarray(
            viterbi_ops.log_transition_matrix(trans), np.float32)
        p = UNIFORM_PRIOR if prior is None else np.asarray(prior, np.float32)
        self._log_prior = np.log(p)
        self.max_lag = int(max_lag)
        self.drain_every = max(1, int(drain_every))
        self._n_states = self._log_trans.shape[0]
        self._scores: np.ndarray | None = None  # dp at newest pending time
        self._le: list[np.ndarray] = []   # pending log-emissions
        self._bp: list[np.ndarray] = []   # _bp[k] maps state at pending k
        #                                   -> state at pending k-1
        #                                   (_bp[0] is never read)
        self._since_drain = 0
        self.emitted = 0        # states emitted so far
        self.forced = 0         # of which force-committed (not coalesced)
        self._finished = False

    @property
    def pending(self) -> int:
        """Frames pushed but not yet emitted."""
        return len(self._le)

    def push(self, col) -> list[int]:
        """Feed one frame's (S,) state probabilities (array or
        left/right/none dict); returns the states newly fixed by this
        push (possibly empty — emissions arrive in bursts)."""
        if self._finished:
            raise RuntimeError("push after finish()")
        le = np.log(_col_to_probs(col))
        if self._scores is None:
            self._scores = self._log_prior + le
            self._bp.append(np.zeros(self._n_states, np.int32))  # unread
        else:
            bp, self._scores = self._step(self._scores, le)
            self._bp.append(bp)
        self._le.append(le)
        self._since_drain += 1
        if (self._since_drain >= self.drain_every
                or len(self._le) > self.max_lag):
            return self._drain()
        return []

    def finish(self) -> list[int]:
        """Flush: commit all pending states along the best path."""
        if self._finished:
            return []
        self._finished = True
        out = self._drain()
        w = len(self._le)
        if w:
            out.extend(self._best_path()[:w])
            self.emitted += w
            self._le.clear()
            self._bp.clear()
        return out

    # -- internals -----------------------------------------------------------

    def _step(self, dp: np.ndarray, le: np.ndarray):
        """One max-plus forward step (same math/tie-breaking as
        ops/viterbi._forward_step): returns (backpointers, next dp)."""
        m = dp[:, None] + self._log_trans
        return m.argmax(axis=0).astype(np.int32), m.max(axis=0) + le

    def _backtrace(self, state: int, upto: int) -> list[int]:
        """States at pending times 0..upto along the survivor path that
        is in ``state`` at pending time ``upto``."""
        seq = [0] * (upto + 1)
        cur = int(state)
        for k in range(upto, -1, -1):
            seq[k] = cur
            if k > 0:
                cur = int(self._bp[k][cur])
        return seq

    def _best_path(self) -> list[int]:
        """Best current path over the whole pending window."""
        return self._backtrace(int(np.argmax(self._scores)),
                               len(self._le) - 1)

    def _drain(self) -> list[int]:
        self._since_drain = 0
        w = len(self._le)
        if w == 0:
            return []
        out: list[int] = []
        # Backward survivor sweep: ps[s] = state at pending k on the
        # survivor path that ends in terminal state s.
        ps = np.arange(self._n_states)
        k = w - 1
        merge = -1
        while True:
            if (ps == ps[0]).all():
                merge = k
                break
            if k == 0:
                break
            ps = self._bp[k][ps]
            k -= 1
        if merge >= 0:
            # All survivors share the prefix 0..merge — emit it (exact).
            out.extend(self._backtrace(int(ps[0]), merge))
            self.emitted += merge + 1
            del self._le[: merge + 1]
            del self._bp[: merge + 1]
            w = len(self._le)
        excess = w - self.max_lag
        if excess > 0:
            # Fixed-lag forced commit: take the current best path's first
            # `excess` states, then re-anchor the lattice on the last
            # committed state so future decoding conditions on it.
            path = self._best_path()
            out.extend(path[:excess])
            self.emitted += excess
            self.forced += excess
            anchor = path[excess - 1]
            del self._le[:excess]
            del self._bp[:excess]
            dp = np.full(self._n_states, viterbi_ops.NEG_INF, np.float32)
            dp[anchor] = 0.0
            for j, le in enumerate(self._le):
                self._bp[j], dp = self._step(dp, le)
            self._scores = dp
        return out


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
