"""Viterbi decoding as a jittable max-plus scan.

The reference implements the 3-state possession HMM as a per-frame Python
loop over a preallocated lattice with backpointers
(reference: nba_proj/hmm.py:49-135). On TPU that becomes a `jax.lax.scan`
over the time axis: the forward pass carries the (S,) max-plus scores and
emits (S,) backpointer columns; the backtrace is a second (reversed) scan
over the backpointers. Everything is static-shape, batches with `vmap`,
and runs in O(T) with O(T*S) memory — no window cap needed (the reference
capped its lattice at 501 columns and never implemented the shift,
nba_proj/hmm.py:56-65).

Note: the reference backtrace reads the backpointer of column ``i-1`` when
stepping from column ``i`` (nba_proj/hmm.py:124), an off-by-one this
implementation does not reproduce; we decode the true argmax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _forward_step(dp, log_emit_t, log_trans):
    # scores[i, j] = dp[i] + log_trans[i, j]; best predecessor per target state.
    scores = dp[:, None] + log_trans
    backptr = jnp.argmax(scores, axis=0)
    dp_next = jnp.max(scores, axis=0) + log_emit_t
    return dp_next, backptr


@functools.partial(jax.jit, static_argnames=())
def viterbi(log_emit: jax.Array, log_trans: jax.Array, log_prior: jax.Array):
    """Most-likely state path.

    Args:
      log_emit: (T, S) log emission scores (log p(obs_t | state)).
      log_trans: (S, S) log transition matrix, rows = from-state. Forbidden
        transitions should be ``NEG_INF`` (not -inf, to avoid NaN under jit).
      log_prior: (S,) log initial distribution.

    Returns:
      (path, score): path (T,) int32 state indices; score () float32 log
      probability of the decoded path.
    """
    log_emit = jnp.asarray(log_emit, jnp.float32)
    log_trans = jnp.asarray(log_trans, jnp.float32)
    log_prior = jnp.asarray(log_prior, jnp.float32)

    dp0 = log_prior + log_emit[0]

    def step(dp, emit_t):
        dp_next, backptr = _forward_step(dp, emit_t, log_trans)
        return dp_next, backptr

    dp_final, backptrs = jax.lax.scan(step, dp0, log_emit[1:])
    # backptrs: (T-1, S); backptrs[t, s] = best state at time t given state s
    # at time t+1.
    last_state = jnp.argmax(dp_final)
    score = dp_final[last_state]

    def back_step(state, bp_t):
        # state is the decoded state at time t+1; bp_t[state] is time t's.
        prev = bp_t[state]
        return prev, prev

    _, rev_path = jax.lax.scan(back_step, last_state, backptrs, reverse=True)
    path = jnp.concatenate([rev_path, last_state[None]]).astype(jnp.int32)
    return path, score


viterbi_batch = jax.jit(jax.vmap(viterbi, in_axes=(0, None, None)))
"""Batched Viterbi over (B, T, S) emissions with shared transitions/prior."""


@jax.jit
def viterbi_parallel(log_emit: jax.Array, log_trans: jax.Array,
                     log_prior: jax.Array):
    """Log-depth Viterbi via tropical-semiring associative scans.

    Max-plus matrix composition is associative, so the forward lattice is
    a ``jax.lax.associative_scan`` over per-step (S, S) score matrices
    (O(log T) depth instead of the sequential scan's O(T) — the
    difference between ~0.7 s and ~10 ms for a 200k-frame game on TPU).

    The path is recovered exactly like the sequential backtrace: the
    backpointer table ``bp_t[j] = argmax_i alpha_t[i] + trans[i, j]``
    comes straight from alpha in one vectorized op, and iterated
    backpointer lookup is function composition over a finite domain —
    associative — so all suffix compositions ``bp_t ∘ ... ∘ bp_{T-2}``
    form a second (cheap, (S,)-gather) associative scan. Tie-breaking
    among co-optimal paths therefore matches :func:`viterbi`'s
    first-argmax backtrace (up to float reassociation in alpha, which can
    differ from the sequential recurrence by ulps).

    Same contract as :func:`viterbi`.
    """
    log_emit = jnp.asarray(log_emit, jnp.float32)
    log_trans = jnp.asarray(log_trans, jnp.float32)
    log_prior = jnp.asarray(log_prior, jnp.float32)
    t, s = log_emit.shape

    alpha0 = (log_prior + log_emit[0])[None]  # (1, S)
    if t == 1:
        last = jnp.argmax(alpha0[0])
        return last[None].astype(jnp.int32), alpha0[0, last]

    def compose(a, b):
        # (..., S, S) max-plus products: C[i,j] = max_k A[i,k] + B[k,j].
        return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    # Step matrices M_t[i, j] = trans[i, j] + emit_t[j] for t >= 1.
    step = log_trans[None, :, :] + log_emit[1:, None, :]

    # alpha_t = best score ending in state j at t.
    prefix = jax.lax.associative_scan(compose, step)  # (T-1, S, S)
    alpha_rest = jnp.max(alpha0[0][None, :, None] + prefix, axis=1)
    alpha = jnp.concatenate([alpha0, alpha_rest], axis=0)  # (T, S)

    # bp[t, j] = best state at time t given state j at t+1 (first argmax,
    # identical to the sequential forward step's backpointer).
    bp = jnp.argmax(alpha[:-1][:, :, None] + log_trans[None, :, :], axis=1)

    # Suffix-compose the index maps: g[t] = bp_t ∘ bp_{t+1} ∘ ... ∘ bp_{T-2}
    # maps the final state to the state at time t.
    # (reverse=True folds later elements first, so the earlier map lands in
    # fn's second argument — same flip as a reverse max-plus suffix scan.)
    g = jax.lax.associative_scan(
        lambda a, b: jnp.take_along_axis(b, a, axis=-1), bp, reverse=True)

    last = jnp.argmax(alpha[-1])
    path = jnp.concatenate([g[:, last], last[None]]).astype(jnp.int32)
    return path, alpha[-1, last]


def masked_log(p, floor: float = 1e-6):
    """log with the reference's zero-replacement semantics
    (reference: nba_proj/hmm.py:50-55 replaces 0 probs with 1e-6)."""
    p = jnp.asarray(p, jnp.float32)
    return jnp.log(jnp.maximum(p, floor))


def log_transition_matrix(trans) -> jax.Array:
    """Elementwise log of a transition matrix with 0 -> NEG_INF (forbidden)."""
    t = jnp.asarray(trans, jnp.float32)
    return jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-38)), NEG_INF)
