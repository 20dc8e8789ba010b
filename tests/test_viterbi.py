"""Viterbi op vs. brute-force enumeration, plus HMM streaming API."""

import itertools

import numpy as np
import pytest

import vit_research_tpu.ops.viterbi as V
from vit_research_tpu.segment.hmm import (
    DEFAULT_TRANSITIONS,
    HMM,
    STATES,
    smooth_probabilities,
)


def path_score(path, log_emit, log_trans, log_prior):
    score = log_prior[path[0]] + log_emit[0, path[0]]
    for t in range(1, len(path)):
        score += log_trans[path[t - 1], path[t]] + log_emit[t, path[t]]
    return score


def brute_force(log_emit, log_trans, log_prior):
    T, S = log_emit.shape
    best_score, best_path = -np.inf, None
    for path in itertools.product(range(S), repeat=T):
        score = log_prior[path[0]] + log_emit[0, path[0]]
        for t in range(1, T):
            score += log_trans[path[t - 1], path[t]] + log_emit[t, path[t]]
        if score > best_score:
            best_score, best_path = score, path
    return np.array(best_path), best_score


@pytest.mark.parametrize("T,S,seed", [(2, 3, 0), (5, 3, 1), (7, 3, 2), (6, 4, 3)])
def test_viterbi_matches_brute_force(T, S, seed):
    rng = np.random.default_rng(seed)
    log_emit = rng.normal(size=(T, S)).astype(np.float32)
    trans = rng.uniform(0.1, 1.0, size=(S, S)).astype(np.float32)
    trans /= trans.sum(axis=1, keepdims=True)
    log_trans = np.log(trans)
    log_prior = np.log(np.full((S,), 1.0 / S, dtype=np.float32))

    path, score = V.viterbi(log_emit, log_trans, log_prior)
    bf_path, bf_score = brute_force(log_emit, log_trans, log_prior)
    # Ties between optimal paths may break differently; assert optimality.
    assert abs(float(score) - bf_score) < 1e-4
    decoded_score = path_score(np.asarray(path), log_emit, log_trans, log_prior)
    assert abs(decoded_score - bf_score) < 1e-4


def test_viterbi_forbidden_transitions():
    # With the reference transition matrix, decoded paths must never jump
    # left<->right directly (transition prob 0, nba_proj/hmm.py:10).
    rng = np.random.default_rng(42)
    probs = rng.dirichlet(np.ones(3), size=400).astype(np.float32)
    path = smooth_probabilities(probs)
    for a, b in zip(path[:-1], path[1:]):
        assert not (a == 0 and b == 1) and not (a == 1 and b == 0)


def test_viterbi_batch_matches_single():
    rng = np.random.default_rng(7)
    B, T = 4, 50
    probs = rng.dirichlet(np.ones(3), size=(B, T)).astype(np.float32)
    batch_paths = smooth_probabilities(probs)
    for b in range(B):
        single = smooth_probabilities(probs[b])
        np.testing.assert_array_equal(batch_paths[b], single)


def test_hmm_streaming_api_matches_oneshot():
    rng = np.random.default_rng(3)
    probs = rng.dirichlet(np.ones(3), size=123).astype(np.float32)
    h = HMM(cap_count=16)  # force buffer growth
    h.add_first({"left": probs[0, 0], "right": probs[0, 1], "none": probs[0, 2]})
    for p in probs[1:]:
        h.add_col_to_lattice({"left": p[0], "right": p[1], "none": p[2]})
    labels = h.decode_sequence()
    assert len(labels) == 123
    expect = [STATES[i] for i in smooth_probabilities(probs)]
    assert labels == expect


def test_hmm_zero_prob_floor():
    # Zeros must be floored, not produce -inf/NaN (nba_proj/hmm.py:50-55).
    h = HMM()
    h.add_first({"left": 0.0, "right": 0.0, "none": 1.0})
    h.add_col_to_lattice({"left": 1.0, "right": 0.0, "none": 0.0})
    seq = h.decode_sequence()
    assert seq[0] == "none"


def test_smooth_denoises_flicker():
    # A long left-possession with brief noisy flickers should decode clean.
    T = 300
    probs = np.tile(np.array([0.8, 0.1, 0.1], np.float32), (T, 1))
    probs[100] = [0.1, 0.8, 0.1]  # single-frame "right" flicker
    probs[200] = [0.2, 0.1, 0.7]  # single-frame "none" flicker
    path = smooth_probabilities(probs)
    assert (path == 0).all()


@pytest.mark.parametrize("T,S,seed", [(2, 3, 0), (5, 3, 1), (7, 3, 2),
                                      (64, 4, 3), (1, 3, 4)])
def test_viterbi_parallel_matches_sequential(T, S, seed):
    rng = np.random.default_rng(seed)
    log_emit = rng.normal(size=(T, S)).astype(np.float32)
    trans = rng.uniform(0.1, 1.0, size=(S, S)).astype(np.float32)
    trans /= trans.sum(axis=1, keepdims=True)
    log_trans = np.log(trans)
    log_prior = np.log(np.full((S,), 1.0 / S, dtype=np.float32))

    seq_path, seq_score = V.viterbi(log_emit, log_trans, log_prior)
    par_path, par_score = V.viterbi_parallel(log_emit, log_trans, log_prior)
    assert abs(float(seq_score) - float(par_score)) < 1e-3
    # Both paths achieve the optimal score (tie-breaking may differ).
    ps = path_score(np.asarray(par_path), log_emit, log_trans, log_prior)
    assert abs(ps - float(seq_score)) < 1e-3


@pytest.mark.parametrize("seed", range(8))
def test_viterbi_parallel_tie_breaking_matches_sequential(seed):
    """With heavily-tied integer scores (exact in float, so alpha agrees
    bit-for-bit between the two recurrences), the parallel decode must pick
    the SAME co-optimal path as the sequential first-argmax backtrace."""
    rng = np.random.default_rng(seed)
    T, S = 40, 4
    log_emit = rng.integers(0, 2, size=(T, S)).astype(np.float32)
    log_trans = rng.integers(0, 2, size=(S, S)).astype(np.float32)
    log_prior = np.zeros((S,), np.float32)

    seq_path, seq_score = V.viterbi(log_emit, log_trans, log_prior)
    par_path, par_score = V.viterbi_parallel(log_emit, log_trans, log_prior)
    np.testing.assert_array_equal(np.asarray(seq_path), np.asarray(par_path))
    assert float(seq_score) == float(par_score)


def test_smooth_parallel_long_sequence_matches():
    rng = np.random.default_rng(9)
    probs = rng.dirichlet(np.ones(3), size=500).astype(np.float32)
    a = smooth_probabilities(probs, parallel=False)
    b = smooth_probabilities(probs, parallel=True)
    np.testing.assert_array_equal(a, b)


def test_default_transitions_unchanged():
    np.testing.assert_allclose(
        DEFAULT_TRANSITIONS,
        [[0.985, 0, 0.015], [0, 0.985, 0.015], [0.15, 0.15, 0.7]],
    )
