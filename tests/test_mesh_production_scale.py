"""Production-dims partitioning: the REAL ViT-B/16 graph on the 8-device
CPU mesh.

The rest of the mesh suite (and earlier dryruns) proved the sharding
rules on toy dims (d=32, 16x16 images, 2 layers). Partitioner behavior
is shape-dependent — padding decisions, all-reduce placement, layout
picks all change with real dims — so this file runs the exact
production configs once each, marked slow:

- the frame-embedding engine (`parallel/embed.py`) at full ViT-B/16:
  768-d, 12 layers, 197 tokens, 224x224 inputs, bf16, FUSED patch path
  (the bench.py graph), batch sharded over an 8-way 'data' axis —
  asserting the engine's own in/out shardings and parity vs a
  single-device engine on identical params;
- the stage-2 RATTHeadV2 three-branch train step
  (`train/train_stage2.py::make_step_fns`) at real dims (768-d,
  k=8/branch) on a (4 data x 2 model) mesh with the batch dict sharded
  over 'data', asserting loss-decrease parity vs the same step run
  unsharded.

Reference the tests partition: nba_proj/train/training.py:37-39 (the
HF ViT-B/16 the reference loads) and training_stage2.py:998-1074 (the
stage-2 step graph).
"""

import contextlib
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vit_research_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.slow


def test_engine_mesh_forward_vitb16_production_dims():
    from vit_research_tpu.data.preprocess import HF_VIT_SPEC
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel import mesh as mesh_lib
    from vit_research_tpu.parallel.embed import EmbeddingEngine

    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16")
    model, params = init_vit(cfg, seed=0)
    mesh = make_mesh((8,), ("data",))
    batch = 8
    imgs = np.random.default_rng(0).integers(
        0, 256, size=(batch, 224, 224, 3), dtype=np.uint8)

    sharded = EmbeddingEngine(model, params, HF_VIT_SPEC, mesh=mesh,
                              batch_size=batch, use_fused_patch_embed=True)
    # The engine's own jit must carry the data-axis shardings end to end
    # at these dims (not just the toy dims the dryrun pins).
    dev_imgs = jax.device_put(imgs, mesh_lib.data_sharding(mesh, 4))
    assert "data" in (dev_imgs.sharding.spec or ()), dev_imgs.sharding
    out = sharded._jitted(sharded.params, dev_imgs)
    assert "data" in (out.sharding.spec or ()), out.sharding
    a = np.asarray(out)
    assert a.shape == (batch, 768)
    # L2-normalized CLS embeddings, all finite.
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, atol=2e-2)

    single = EmbeddingEngine(model, params, HF_VIT_SPEC, batch_size=batch,
                             use_fused_patch_embed=True)
    b = single.embed_batch(imgs)
    # bf16 graph: partitioning changes reduction order; cosine agreement
    # is the right metric for L2-normalized outputs.
    cos = (a * b).sum(-1)
    assert (1 - cos).max() < 1e-3, (1 - cos).max()


def test_stage2_mesh_train_production_dims():
    from vit_research_tpu.models.ratt_v2 import RATTHeadV2
    from vit_research_tpu.train.train_stage2 import make_step_fns
    from vit_research_tpu.utils.configs import HeadConfig

    assert len(jax.devices()) == 8
    mesh = make_mesh((4, 2), ("data", "model"))
    d, b = 768, 8
    cfg = HeadConfig(embed_dim=d, k_sim=8, k_contrast=8, k_temporal=8)
    head = RATTHeadV2(cfg)
    key = jax.random.PRNGKey(0)
    params = head.init(key, jnp.zeros((1, d)), jnp.zeros((1, 8, d)),
                       jnp.zeros((1, 8, d)), jnp.zeros((1, 8, d)))

    rng = np.random.default_rng(0)
    labels = np.zeros(b, np.float32)
    labels[: b // 4] = 1.0
    pos_weight = float(np.sqrt((b - labels.sum()) / labels.sum()))
    host_batch = {
        "query_emb": rng.normal(size=(b, d)).astype(np.float32),
        "sim_embs": rng.normal(size=(b, 8, d)).astype(np.float32),
        "contrast_embs": rng.normal(size=(b, 8, d)).astype(np.float32),
        "temporal_embs": rng.normal(size=(b, 8, d)).astype(np.float32),
        "labels": labels,
    }

    def run(steps, shard):
        # 1e-4: adam at 1e-3 overshoots on this random 768-d batch by
        # step 3 (measured 0.90 -> 0.51 -> 5.81).
        tx = optax.adam(1e-4)
        p, opt = params, None
        batch = {
            k: (jax.device_put(jnp.asarray(v), NamedSharding(
                mesh, P("data", *([None] * (np.ndim(v) - 1)))))
                if shard else jnp.asarray(v))
            for k, v in host_batch.items()
        }
        if shard:
            assert batch["labels"].sharding.spec == P("data")
        opt = tx.init(p)
        step, _ = make_step_fns(head, tx, pos_weight)
        out_losses, r = [], jax.random.PRNGKey(1)
        ctx = mesh if shard else contextlib.nullcontext()
        with ctx:
            for _ in range(steps):
                r, sub = jax.random.split(r)
                p, opt, loss, _acc, grad_rms = step(p, opt, batch, sub)
                out_losses.append(float(loss))
        return out_losses, grad_rms

    sharded_losses, grad_rms = run(3, shard=True)
    single_losses, _ = run(3, shard=False)
    assert all(np.isfinite(v) for v in sharded_losses), sharded_losses
    assert sharded_losses[-1] < sharded_losses[0], sharded_losses
    for branch, v in grad_rms.items():
        assert float(v) > 0, (branch, grad_rms)
    # Same math, different partitioning: trajectories must agree to f32
    # reduction-order tolerance at 768-d.
    np.testing.assert_allclose(sharded_losses, single_losses, rtol=2e-4)
