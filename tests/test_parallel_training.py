"""Multi-chip correctness: the sharded training step must match the
single-device step bit-for-bit-ish (gradient psum over the data axis is
inserted by the partitioner, not hand-written — verify it's right)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_research_tpu.models.heads import ProjectionHead, RAGHead
from vit_research_tpu.train import losses
from vit_research_tpu.utils.configs import HeadConfig

D, K = 16, 3
HEAD = HeadConfig(embed_dim=D, num_layers=1, num_heads=2, mlp_dim=8,
                  num_queries=2, max_tokens=8)


def build():
    proj = ProjectionHead(input_dim=D, hidden_dim=D, proj_dim=D)
    head = RAGHead(HEAD)
    key = jax.random.PRNGKey(0)
    params = {
        "proj": proj.init(key, jnp.zeros((1, D))),
        "head": head.init(key, jnp.zeros((1, D)), jnp.zeros((1, K, D))),
    }
    tx = optax.sgd(1e-2)

    def loss_fn(params, embs, retrieved, labels):
        z = proj.apply(params["proj"], embs)
        logits, _ = head.apply(params["head"], z, retrieved)
        return losses.bce_with_logits(labels, logits)

    @jax.jit
    def step(params, opt_state, embs, retrieved, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, embs, retrieved,
                                                  labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return params, tx, step


def test_dp_sharded_step_matches_single_device():
    devices = jax.devices()
    assert len(devices) == 8
    mesh = Mesh(np.asarray(devices).reshape(8), ("data",))

    rng = np.random.default_rng(0)
    b = 16
    embs = jnp.asarray(rng.normal(size=(b, D)), jnp.float32)
    retrieved = jnp.asarray(rng.normal(size=(b, K, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, b), jnp.float32)

    # Single device baseline.
    params, tx, step = build()
    p1, _, loss1 = step(params, tx.init(params), embs, retrieved, labels)

    # Data-sharded inputs; params replicated.
    params2, tx2, step2 = build()
    data_sh = NamedSharding(mesh, P("data"))
    embs_s = jax.device_put(embs, NamedSharding(mesh, P("data", None)))
    ret_s = jax.device_put(retrieved, NamedSharding(mesh, P("data", None,
                                                            None)))
    lab_s = jax.device_put(labels, data_sh)
    rep = NamedSharding(mesh, P())
    params2 = jax.device_put(params2, rep)
    with mesh:
        p2, _, loss2 = step2(params2, tx2.init(params2), embs_s, ret_s,
                             lab_s)

    assert abs(float(loss1) - float(loss2)) < 1e-5
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_tp_sharded_forward_matches():
    """Tensor-parallel weight sharding must not change results."""
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices[:4]).reshape(2, 2), ("data", "model"))

    proj = ProjectionHead(input_dim=D, hidden_dim=D, proj_dim=D)
    key = jax.random.PRNGKey(1)
    params = proj.init(key, jnp.zeros((1, D)))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, D)), jnp.float32)

    ref = proj.apply(params, x)

    def rule(path, leaf):
        names = "/".join(str(getattr(p, "key", "")) for p in path)
        if leaf.ndim == 2 and "d1/kernel" in names:
            return P(None, "model")
        if leaf.ndim == 2 and "out/kernel" in names:
            return P("model", None)
        return P()

    sharded = jax.device_put(
        params, jax.tree_util.tree_map_with_path(
            lambda p, v: NamedSharding(mesh, rule(p, v)), params))
    x_s = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    with mesh:
        got = jax.jit(proj.apply)(sharded, x_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_dryrun_multichip_entry():
    """The driver-facing dry run executes on the virtual mesh."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)
    ge.dryrun_multichip(4)
