"""Checkpoint/resume: optimizer state restores and training continues
exactly where it left off (the reference restarts its optimizer on every
resume — SURVEY.md section 5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_research_tpu.models.heads import ProjectionHead
from vit_research_tpu.train.checkpoint import CheckpointManager

D = 8


def build_step():
    model = ProjectionHead(input_dim=D, hidden_dim=D, proj_dim=D)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
    tx = optax.adam(1e-2)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply(p, x)
            return jnp.mean((out - y) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return params, tx, step


def test_resume_reproduces_uninterrupted_run(tmp_path):
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(4, D)), jnp.float32) for _ in range(6)]
    ys = [jnp.asarray(rng.normal(size=(4, D)), jnp.float32) for _ in range(6)]

    # Uninterrupted 6 steps.
    params, tx, step = build_step()
    opt_state = tx.init(params)
    for x, y in zip(xs, ys):
        params, opt_state, _ = step(params, opt_state, x, y)
    ref = params

    # 3 steps -> checkpoint -> restore -> 3 more steps.
    params2, tx2, step2 = build_step()
    opt_state2 = tx2.init(params2)
    for x, y in zip(xs[:3], ys[:3]):
        params2, opt_state2, _ = step2(params2, opt_state2, x, y)
    mngr = CheckpointManager(str(tmp_path), "resume_test")
    state = {"params": params2, "opt_state": opt_state2,
             "step": jnp.asarray(3)}
    mngr.save(3, state)
    mngr.wait()

    params3, tx3, step3 = build_step()
    template = {"params": params3, "opt_state": tx3.init(params3),
                "step": jnp.asarray(0)}
    restored = mngr.restore(template=template)
    assert int(restored["step"]) == 3
    p, o = restored["params"], restored["opt_state"]
    for x, y in zip(xs[3:], ys[3:]):
        p, o, _ = step3(p, o, x, y)

    # Adam moments restored => identical trajectory.
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fresh_optimizer_diverges_from_resume(tmp_path):
    """Sanity that the test above is meaningful: restarting the optimizer
    (the reference's behavior) gives a different trajectory."""
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(4, D)), jnp.float32) for _ in range(6)]
    ys = [jnp.asarray(rng.normal(size=(4, D)), jnp.float32) for _ in range(6)]

    params, tx, step = build_step()
    opt_state = tx.init(params)
    for x, y in zip(xs, ys):
        params, opt_state, _ = step(params, opt_state, x, y)
    ref = params

    params2, tx2, step2 = build_step()
    opt_state2 = tx2.init(params2)
    for x, y in zip(xs[:3], ys[:3]):
        params2, opt_state2, _ = step2(params2, opt_state2, x, y)
    opt_state2 = tx2.init(params2)  # optimizer restart (reference behavior)
    for x, y in zip(xs[3:], ys[3:]):
        params2, opt_state2, _ = step2(params2, opt_state2, x, y)

    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree_util.tree_leaves(ref),
                 jax.tree_util.tree_leaves(params2))]
    assert max(diffs) > 1e-5


def test_retention_keeps_best_and_periodic(tmp_path):
    """Newest-N retention must never garbage-collect the best-by-metric
    step or keep_period multiples."""
    mngr = CheckpointManager(str(tmp_path), "run", max_to_keep=3,
                             keep_period=10)
    state = {"w": np.zeros(2, np.float32)}
    # metric peaks at step 4, then decays; 12 epochs total
    metrics = [0.1, 0.2, 0.5, 0.6, 0.9, 0.4, 0.3, 0.3, 0.2, 0.2, 0.1, 0.1]
    for s, m in enumerate(metrics):
        mngr.save(s, {"w": state["w"] + s}, metrics={"val_acc": m})
        mngr.maybe_update_best(s, m)
    mngr.wait()
    steps = sorted(mngr._mngr.all_steps())
    # newest 3 = {9, 10, 11}; best = 4; periodic = {0, 10}
    assert steps == [0, 4, 9, 10, 11]
    best = mngr.restore_best()
    np.testing.assert_allclose(best["w"], 4.0)
    assert mngr.latest_step() == 11


def test_retention_best_survives_manager_restart(tmp_path):
    mngr = CheckpointManager(str(tmp_path), "run", max_to_keep=2)
    for s, m in enumerate([0.9, 0.1, 0.2]):
        mngr.save(s, {"w": np.full(2, float(s), np.float32)},
                  metrics={"val_acc": m})
        mngr.maybe_update_best(s, m)
    mngr.wait()
    # New manager instance (fresh process) keeps protecting step 0.
    mngr2 = CheckpointManager(str(tmp_path), "run", max_to_keep=2)
    for s, m in [(3, 0.3), (4, 0.2)]:
        mngr2.save(s, {"w": np.full(2, float(s), np.float32)},
                   metrics={"val_acc": m})
        mngr2.maybe_update_best(s, m)
    mngr2.wait()
    steps = sorted(mngr2._mngr.all_steps())
    assert 0 in steps  # the best step survived both sweeps
    np.testing.assert_allclose(mngr2.restore_best()["w"], 0.0)


def test_resume_structure_mismatch_names_migrating(tmp_path):
    """A checkpoint saved under a DIFFERENT optimizer structure must not
    resume with a cryptic Orbax traceback: maybe_resume re-raises with a
    pointer at MIGRATING.md's checkpoint-compatibility note."""
    import pytest

    from vit_research_tpu.train.common import TrainState, maybe_resume

    params = {"w": jnp.zeros((2,), jnp.float32)}
    old_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    mngr = CheckpointManager(str(tmp_path), "run")
    mngr.save(0, {"params": params, "opt_state": old_tx.init(params),
                  "step": 0})
    mngr.wait()

    new_tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(1e-3, weight_decay=1e-4))
    state = TrainState(params=params, opt_state=new_tx.init(params))
    with pytest.raises(RuntimeError, match="MIGRATING.md"):
        maybe_resume(mngr, state, resume=True)
