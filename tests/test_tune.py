"""segment/tune.py: transition fitting, interval PRF, threshold pick,
and the grid sweep's top-k prefix-slice reuse."""

import numpy as np
import pytest

from vit_research_tpu.data.labels import ManualIntervals
from vit_research_tpu.segment import knn as knn_mod
from vit_research_tpu.segment import tune as tune_mod
from vit_research_tpu.segment.clips import ClipInterval
from vit_research_tpu.segment.hmm import (DEFAULT_TRANSITIONS,
                                          validate_transition_matrix)


def test_fit_transition_matrix_counts_and_zeros():
    # 0,0,0,2,2,1,1 -> counts: 0->0 x2, 0->2, 2->2, 2->1, 1->1
    seq = [0, 0, 0, 2, 2, 1, 1]
    m = tune_mod.fit_transition_matrix([seq], smoothing=0.0)
    assert m.shape == (3, 3)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    # structural zeros hold regardless of data
    assert m[0, 1] == 0.0 and m[1, 0] == 0.0
    np.testing.assert_allclose(m[0], [2 / 3, 0.0, 1 / 3], atol=1e-6)
    np.testing.assert_allclose(m[2], [0.0, 0.5, 0.5], atol=1e-6)


def test_fit_transition_matrix_smoothing_and_ignores():
    # -1 breaks transitions on both sides
    m = tune_mod.fit_transition_matrix([[0, -1, 0, 0]], smoothing=1.0)
    # only one real transition (0->0); smoothing fills permitted cells
    assert m[0, 0] == pytest.approx(2 / 3)
    assert m[0, 2] == pytest.approx(1 / 3)
    assert m[0, 1] == 0.0
    # rows with no data are uniform over permitted cells
    assert m[2, 0] == pytest.approx(1 / 3)
    # structural zeros can be disabled
    m2 = tune_mod.fit_transition_matrix([[0, 1]], smoothing=1.0,
                                        structural_zeros=())
    assert m2[0, 1] > 0.0


def test_validate_transition_matrix():
    # the reference default and a counting fit both pass
    m = validate_transition_matrix(DEFAULT_TRANSITIONS)
    assert m.dtype == np.float32 and m.shape == (3, 3)
    validate_transition_matrix(tune_mod.fit_transition_matrix([[0, 0, 2]]))
    # structural zeros are fine — only whole-row problems are rejected
    validate_transition_matrix([[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    with pytest.raises(ValueError, match="3x3"):
        validate_transition_matrix([[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError, match="sum to 1"):
        validate_transition_matrix([[90, 0, 10], [0, 90, 10],
                                    [20, 20, 60]])    # raw counts
    with pytest.raises(ValueError, match="sum to 1"):
        validate_transition_matrix(np.zeros((3, 3)))  # zero rows
    with pytest.raises(ValueError, match="negative"):
        validate_transition_matrix([[1.5, 0, -0.5], [0, 1, 0], [0, 0, 1]])
    with pytest.raises(ValueError, match="non-finite"):
        validate_transition_matrix(np.full((3, 3), np.nan))


def test_interval_prf_greedy_matching():
    true = [ClipInterval("left", 0, 99), ClipInterval("right", 200, 299)]
    # perfect
    r = tune_mod.interval_prf(list(true), true)
    assert r["f1"] == 1.0 and r["matched"] == 2
    # one side-mismatch
    pred = [ClipInterval("right", 0, 99), ClipInterval("right", 200, 299)]
    r = tune_mod.interval_prf(pred, true)
    assert r["matched"] == 1 and r["precision"] == 0.5 and r["recall"] == 0.5
    # duplicate detection counts as FP (greedy one-to-one)
    pred = [ClipInterval("left", 0, 99), ClipInterval("left", 1, 98)]
    r = tune_mod.interval_prf(pred, true)
    assert r["matched"] == 1 and r["precision"] == 0.5
    # low IoU fails the match
    pred = [ClipInterval("left", 90, 189)]
    r = tune_mod.interval_prf(pred, true, iou=0.5)
    assert r["matched"] == 0
    # empty cases: nothing to find + nothing predicted is vacuously
    # perfect (precision = recall = f1 = 1.0)
    r = tune_mod.interval_prf([], [])
    assert r["precision"] == 1.0 and r["recall"] == 1.0 and r["f1"] == 1.0
    assert tune_mod.interval_prf([], true)["recall"] == 0.0
    assert tune_mod.interval_prf(list(true), [])["recall"] == 1.0
    assert tune_mod.interval_prf(list(true), [])["precision"] == 0.0


def test_writeback_threshold_picks_smallest_meeting_target():
    # confidences 0.6/0.7/0.8/0.9; the 0.6 row is WRONG, rest right
    emissions = np.zeros((4, 3))
    decision = np.array([0, 0, 1, 2])
    for i, c in enumerate((0.6, 0.7, 0.8, 0.9)):
        emissions[i, decision[i]] = c
    truth = np.array([1, 0, 1, 2])  # row 0 decided 0, truth 1
    r = tune_mod.writeback_threshold(emissions, decision, truth,
                                     target_precision=0.99,
                                     grid=(0.5, 0.65, 0.75))
    assert r["threshold"] == 0.65  # excludes the wrong 0.6 row
    assert r["precision"] == 1.0
    assert r["coverage"] == pytest.approx(3 / 4)
    # unreachable target: threshold None, but the best precision the
    # grid actually achieved is reported (not a hardcoded 0.0)
    r = tune_mod.writeback_threshold(emissions, decision, truth,
                                     target_precision=1.01,
                                     grid=(0.5, 0.65))
    assert r["threshold"] is None
    assert r["best_threshold"] == 0.65
    assert r["precision"] == 1.0
    assert r["coverage"] == pytest.approx(3 / 4)


def _world(n_per=60, d=16, seed=0):
    """Synthetic embeddings: three separated clusters, a game that runs
    none/left/none/right/none, and a labeled corpus."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(3, d)) * 5.0
    sides = ["none"] * 10 + ["left"] * n_per + ["none"] * 8 \
        + ["right"] * n_per + ["none"] * 10
    name2id = {"left": 0, "right": 1, "none": 2}
    frames = [f"vid1_frame_{i + 1}.jpg" for i in range(len(sides))]
    embs = np.stack([centers[name2id[s]] + rng.normal(size=d) * 0.1
                     for s in sides]).astype(np.float32)
    corpus_labels = np.repeat([0, 1, 2], 12)
    corpus_embs = (centers[corpus_labels]
                   + rng.normal(size=(len(corpus_labels), d)) * 0.1
                   ).astype(np.float32)
    probs = np.full((len(corpus_labels), 3), 0.05, np.float32)
    probs[np.arange(len(corpus_labels)), corpus_labels] = 0.9
    corpus = {"embeddings": corpus_embs, "labels": corpus_labels,
              "probs": probs}
    mi = ManualIntervals()
    start = 1
    for side, n in [("none", 10), ("left", n_per), ("none", 8),
                    ("right", n_per), ("none", 10)]:
        mi.intervals[side].append((1, start, start + n - 1))
        start += n
    return frames, embs, corpus, mi, sides


def test_tune_knn_hmm_finds_a_perfect_combo():
    frames, embs, corpus, mi, sides = _world()
    results, trans, knn = tune_mod.tune_knn_hmm(
        frames, embs, corpus, mi, ks=(3, 5, 10), min_lens=(20, 50),
        pads=(0, 5), metric="l2")
    assert "reference" in trans and "fitted" in trans
    # the k_max arrays come back so callers never re-run the device
    # top-k (the k-prefix IS the smaller-k result)
    assert knn["neighbor_labels"].shape == (len(frames), 10)
    assert knn["neighbor_probs"].shape == (len(frames), 10, 3)
    best = results[0]
    assert best.f1 == 1.0
    assert best.frame_accuracy > 0.95
    assert best.n_true == 2
    # results are sorted best-first
    f1s = [r.f1 for r in results]
    assert f1s == sorted(f1s, reverse=True)
    # a min_len longer than the possessions can't match anything
    worst = [r for r in results if r.params["min_len"] == 50
             and r.params["pad"] == 5]
    assert all(r.n_pred <= 2 for r in worst)


def test_tune_prefix_slice_equals_fresh_knn():
    """The sweep computes top-k once at max(k); its k'-prefix must equal
    a fresh kNN at k' (exact top-k is score-sorted)."""
    frames, embs, corpus, mi, _ = _world(seed=3)
    k_small, k_big = 4, 9
    nl_big, idx_big, _ = knn_mod.knn_labels(
        embs, corpus["embeddings"], corpus["labels"], k_big, metric="l2")
    nl_small, idx_small, _ = knn_mod.knn_labels(
        embs, corpus["embeddings"], corpus["labels"], k_small, metric="l2")
    np.testing.assert_array_equal(np.asarray(idx_big)[:, :k_small],
                                  np.asarray(idx_small))
    np.testing.assert_array_equal(np.asarray(nl_big)[:, :k_small],
                                  np.asarray(nl_small))


def test_tune_caps_k_at_corpus_size():
    frames, embs, corpus, mi, _ = _world()
    n = len(corpus["labels"])
    results, _, _ = tune_mod.tune_knn_hmm(
        frames, embs, corpus, mi, ks=(5, n + 50), min_lens=(20,),
        pads=(0,), metric="l2")
    assert {r.params["k"] for r in results} == {5, n}


def test_tune_rejects_empty_grids():
    frames, embs, corpus, mi, _ = _world()
    for kw in ({"ks": ()}, {"min_lens": ()}, {"pads": ()}):
        kwargs = dict(ks=(5,), min_lens=(20,), pads=(0,), metric="l2")
        kwargs.update(kw)
        with pytest.raises(ValueError, match="empty parameter grid"):
            tune_mod.tune_knn_hmm(frames, embs, corpus, mi, **kwargs)


def test_fitted_transitions_beat_reference_on_mismatched_scale():
    """A world whose possessions are far shorter than the reference's
    hand-tuned dwell times: the counting fit should adapt and decode at
    least as accurately."""
    frames, embs, corpus, mi, sides = _world(n_per=12, seed=7)
    results, trans, _ = tune_mod.tune_knn_hmm(
        frames, embs, corpus, mi, ks=(5,), min_lens=(5,), pads=(0,),
        metric="l2")
    by_trans = {r.params["transitions"]: r for r in results
                if r.params["k"] == 5}
    assert by_trans["fitted"].frame_accuracy >= \
        by_trans["reference"].frame_accuracy
    # the fitted matrix reflects the short dwell times
    assert trans["fitted"][0, 2] > DEFAULT_TRANSITIONS[0, 2]
