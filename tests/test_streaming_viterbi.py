"""StreamingViterbi: bounded-memory online decode vs the offline oracle.

The reference's lattice kept every column and had an unimplemented
"shift method" at its 501-column window cap (reference:
nba_proj/hmm.py:32-35,56-65); StreamingViterbi is the working
capability. Pinned here:

- with an unbounded lag, the concatenation of all ``push``/``finish``
  emissions equals the offline decode (ops/viterbi via
  smooth_probabilities) exactly — including tie-heavy uniform inputs;
- every coalesced emission is a prefix of the offline decode (the
  mid-stream guarantee, not just the final result);
- the pending window never exceeds ``max_lag`` after a push returns,
  even on adversarial near-uniform streams, and forced commits keep the
  emitted sequence a valid path (no forbidden left<->right jumps);
- on decisive streams a small lag stays exact (coalescence fires long
  before the forced path).
"""

import numpy as np
import pytest

from vit_research_tpu.ops.viterbi import NEG_INF, log_transition_matrix
from vit_research_tpu.segment.hmm import (
    DEFAULT_TRANSITIONS,
    StreamingViterbi,
    smooth_probabilities,
)


def _random_probs(rng, t):
    p = rng.gamma(1.0, size=(t, 3)).astype(np.float32)
    return p / p.sum(axis=1, keepdims=True)


def _decisive_probs(rng, segments):
    """segments: list of (state, length) with strong emissions."""
    rows = []
    for state, length in segments:
        base = np.full((length, 3), 0.015, np.float32)
        base[:, state] = 0.97
        rows.append(base)
    p = np.concatenate(rows)
    return p + rng.uniform(0, 1e-3, p.shape).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("drain_every", [1, 7, 64])
def test_unbounded_lag_matches_offline_exactly(seed, drain_every):
    rng = np.random.default_rng(seed)
    probs = _random_probs(rng, 257)
    offline = smooth_probabilities(probs)
    sv = StreamingViterbi(max_lag=10**9, drain_every=drain_every)
    got = []
    for row in probs:
        got.extend(sv.push(row))
    got.extend(sv.finish())
    assert sv.forced == 0
    assert got == list(offline)


def test_uniform_ties_match_offline():
    probs = np.full((100, 3), 1 / 3, np.float32)
    offline = smooth_probabilities(probs)
    sv = StreamingViterbi(max_lag=10**9, drain_every=5)
    got = []
    for row in probs:
        got.extend(sv.push(row))
    got.extend(sv.finish())
    assert got == list(offline)


def test_coalesced_emissions_are_offline_prefix_mid_stream():
    """The streaming guarantee itself: every un-forced emission already
    equals the offline decode's prefix BEFORE the stream ends."""
    rng = np.random.default_rng(3)
    probs = _decisive_probs(rng, [(0, 60), (2, 40), (1, 60), (2, 40)])
    offline = list(smooth_probabilities(probs))
    sv = StreamingViterbi(max_lag=10**9, drain_every=8)
    got = []
    saw_midstream_emission = False
    for i, row in enumerate(probs):
        got.extend(sv.push(row))
        assert got == offline[: len(got)], f"prefix diverged at frame {i}"
        if got and i < len(probs) - 1:
            saw_midstream_emission = True
    got.extend(sv.finish())
    assert got == offline
    assert saw_midstream_emission  # decisive stream must emit early
    assert sv.forced == 0


def test_window_bound_and_valid_path_on_ambiguous_stream():
    """Near-uniform probs never coalesce — the fixed-lag path must kick
    in, keep memory bounded, and still emit a transition-valid path."""
    rng = np.random.default_rng(4)
    t, lag = 400, 16
    probs = np.full((t, 3), 1 / 3, np.float32) + rng.uniform(
        -1e-4, 1e-4, (t, 3)).astype(np.float32)
    sv = StreamingViterbi(max_lag=lag, drain_every=4)
    got = []
    for row in probs:
        got.extend(sv.push(row))
        assert sv.pending <= lag
    got.extend(sv.finish())
    assert len(got) == t
    assert sv.forced > 0
    log_trans = np.asarray(log_transition_matrix(DEFAULT_TRANSITIONS))
    for a, b in zip(got, got[1:]):
        assert log_trans[a, b] > NEG_INF / 2, (a, b)


def test_small_lag_exact_on_decisive_stream():
    rng = np.random.default_rng(5)
    probs = _decisive_probs(rng, [(0, 150), (2, 30), (1, 150), (2, 30)])
    offline = list(smooth_probabilities(probs))
    sv = StreamingViterbi(max_lag=12, drain_every=3)
    got = []
    for row in probs:
        got.extend(sv.push(row))
        assert sv.pending <= 12
    got.extend(sv.finish())
    assert got == offline
    assert sv.forced == 0  # coalescence always beat the lag bound


def test_counters_dict_inputs_and_finish_semantics():
    sv = StreamingViterbi(max_lag=64)
    rows = [{"left": 0.9, "right": 0.05, "none": 0.05}] * 10
    got = []
    for r in rows:
        got.extend(sv.push(r))
    got.extend(sv.finish())
    assert len(got) == 10 and set(got) == {0}
    assert sv.emitted == 10
    assert sv.finish() == []  # idempotent
    with pytest.raises(RuntimeError):
        sv.push(rows[0])
    assert StreamingViterbi(max_lag=5).finish() == []  # empty stream
    with pytest.raises(ValueError):
        StreamingViterbi(max_lag=0)
