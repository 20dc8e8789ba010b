"""Loss zoo + optim + checkpoint + diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.train import checkpoint as ckpt_mod
from vit_research_tpu.train import diagnostics as diag
from vit_research_tpu.train import losses as L
from vit_research_tpu.train.optim import make_optimizer, two_phase_schedule
from vit_research_tpu.utils.configs import TrainConfig


def test_bce_matches_optax():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 16), jnp.float32)
    got = L.bce_with_logits(labels, logits)
    want = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))
    assert abs(float(got) - float(want)) < 1e-6


def test_bce_pos_weight_scales_positive_term():
    logits = jnp.asarray([0.0, 0.0])
    labels = jnp.asarray([1.0, 0.0])
    base = L.bce_with_logits(labels, logits)
    heavier = L.bce_with_logits(labels, logits, pos_weight=2.0)
    # positive term doubled: loss = (2*log2 + log2)/2 vs (log2+log2)/2
    assert float(heavier) > float(base)
    np.testing.assert_allclose(float(heavier), np.log(2.0) * 1.5, atol=1e-6)


def test_sqrt_pos_weight():
    labels = jnp.asarray([1.0, 0.0, 0.0, 0.0, 0.0])
    assert abs(float(L.sqrt_pos_weight(labels)) - 2.0) < 1e-6


def test_simple_retrieval_contrastive_direction():
    # q aligned with own retrieval mean, orthogonal to neighbor's => low loss.
    q = jnp.eye(4, 8)
    retrieved = jnp.tile(q[:, None, :], (1, 3, 1))
    low = L.simple_retrieval_contrastive(q, retrieved)
    # q aligned with neighbor's mean instead => high loss.
    high = L.simple_retrieval_contrastive(jnp.roll(q, 1, axis=0), retrieved)
    assert float(low) < float(high)


def test_in_batch_infonce_identity_batch():
    z = jnp.eye(6, 16) * 10
    loss_distinct = L.in_batch_infonce(z)
    z_same = jnp.tile(z[:1], (6, 1))
    loss_collapsed = L.in_batch_infonce(z_same)
    assert float(loss_distinct) < float(loss_collapsed)


def test_supcon_prefers_clustered_labels():
    a = jnp.asarray([[1, 0], [1, 0], [0, 1], [0, 1]], jnp.float32)
    labels_good = jnp.asarray([0, 0, 1, 1])
    labels_bad = jnp.asarray([0, 1, 0, 1])
    good = L.supervised_contrastive(a, labels_good)
    bad = L.supervised_contrastive(a, labels_bad)
    assert float(good) < float(bad)


def test_retrieval_margin_masks_and_direction():
    anchor = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
    retrieved = jnp.asarray([
        [[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]],   # pos aligned, neg orthogonal
        [[0.0, 1.0], [1.0, 0.0], [0.0, 0.0]],   # pos orthogonal, neg aligned
    ])
    flags = jnp.asarray([[0, 1, -1], [0, 1, -1]])
    loss, d = L.retrieval_margin(anchor, retrieved, flags, margin=0.2)
    # sample 0: relu(0.2 - 1 + 0) = 0 ; sample 1: relu(0.2 - 0 + 1) = 1.2
    np.testing.assert_allclose(float(loss), 0.6, atol=1e-5)
    assert float(d["ret_valid_frac"]) == 1.0
    # all-padding sample is excluded
    flags2 = jnp.asarray([[0, 1, -1], [-1, -1, -1]])
    loss2, d2 = L.retrieval_margin(anchor, retrieved, flags2)
    np.testing.assert_allclose(float(loss2), 0.0, atol=1e-5)
    assert float(d2["ret_valid_frac"]) == 0.5


def test_attention_entropy_uniform_is_max():
    uniform = jnp.full((2, 4), 0.25)
    peaked = jnp.asarray([[0.97, 0.01, 0.01, 0.01]] * 2)
    assert float(L.attention_entropy(uniform)) > float(
        L.attention_entropy(peaked))


def test_find_best_f1():
    labels = np.array([0, 0, 1, 1])
    probs = np.array([0.1, 0.4, 0.6, 0.9])
    f1, t = L.find_best_f1(labels, probs)
    assert f1 == 1.0 and 0.4 < t < 0.6


def test_two_phase_schedule_and_optimizer():
    sched = two_phase_schedule(1e-3, 1e-5, 100, 0.5)
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(49)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)), 1e-5, rtol=1e-5)
    cfg = TrainConfig(accum_steps=2, num_epochs=2)
    tx = make_optimizer(cfg, steps_per_epoch=5)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    # First micro-step of MultiSteps: no update applied yet.
    updates, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
    updates, state = tx.update(g, state, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0


def test_phase2_lr_engages_under_accumulation():
    """The phase boundary must be expressed in accumulated-update units:
    MultiSteps advances the inner schedule once per accum cycle, so a
    micro-step boundary would never be reached (the original bug trained
    entire runs at lr_phase1)."""
    cfg = TrainConfig(accum_steps=4, num_epochs=2, lr_phase1=1e-3,
                      lr_phase2=1e-5, phase_split=0.5)
    steps_per_epoch = 20  # micro-batches: 40 total -> 10 updates, b'dry 5
    tx = make_optimizer(cfg, steps_per_epoch)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    cycle_deltas = []
    for micro in range(40):
        updates, state = tx.update(g, state, params)
        delta = float(jnp.abs(updates["w"]).max())
        if delta > 0:  # the applying micro-step of each accum cycle
            cycle_deltas.append(delta)
    assert len(cycle_deltas) == 10
    # Adam step magnitude tracks the lr: phase 1 ~1e-3, phase 2 ~1e-5.
    assert all(d > 3e-4 for d in cycle_deltas[:5]), cycle_deltas
    assert all(d < 3e-5 for d in cycle_deltas[5:]), cycle_deltas


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(3)}
    mngr = ckpt_mod.CheckpointManager(str(tmp_path), "run1", max_to_keep=2)
    mngr.save(1, state, metrics={"val_acc": 0.7})
    assert mngr.maybe_update_best(1, 0.7)
    state2 = {"params": {"w": state["params"]["w"] + 1},
              "step": jnp.asarray(4)}
    mngr.save(2, state2, metrics={"val_acc": 0.6})
    assert not mngr.maybe_update_best(2, 0.6)
    mngr.wait()
    got = mngr.restore(template=state)
    np.testing.assert_allclose(np.asarray(got["params"]["w"]),
                               np.asarray(state2["params"]["w"]))
    best = mngr.restore_best(template=state)
    np.testing.assert_allclose(np.asarray(best["params"]["w"]),
                               np.asarray(state["params"]["w"]))


def test_params_npz_roundtrip(tmp_path):
    params = {"a": {"b": jnp.ones((2, 2)), "c": jnp.zeros((3,))}}
    p = str(tmp_path / "w.npz")
    ckpt_mod.save_params_npz(params, p)
    got = ckpt_mod.load_params_npz(params, p)
    np.testing.assert_allclose(np.asarray(got["a"]["b"]), 1.0)


def test_diagnostics():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    r = jnp.tile(q[:, None, :], (1, 3, 1))
    assert float(diag.retrieval_purity(q, r)) > 0.99
    labels = jnp.asarray([1, 0, 1, 0])
    rl = jnp.asarray([[1, 1, -1], [0, 1, -1], [1, 1, 1], [0, 0, 0]])
    ag = diag.label_agreement(rl, labels)
    assert 0.0 < float(ag) <= 1.0
    cc = diag.confusion_counts(labels, jnp.asarray([3.0, -3.0, -3.0, 3.0]))
    assert int(cc["tp"]) == 1 and int(cc["tn"]) == 1
    assert int(cc["fp"]) == 1 and int(cc["fn"]) == 1
    sep = diag.conditioned_separation(
        np.asarray(q), [1, 1, 0, 0], ["left"] * 4, [0.5] * 4, [1, 2, 1, 2])
    assert np.isfinite(sep["gap"])
