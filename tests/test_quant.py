"""Tests for ops/quant.py — dynamic int8 GEMM quantization.

The int8 path is opt-in (``ViTConfig(gemm_quant="int8")``) and off the
parity path; these tests pin (a) dot_general numerics vs the f32
contraction, (b) that the quantized ViT keeps the identical parameter
tree (any checkpoint loads into it), and (c) that its embeddings track
the f32 model closely enough for this pipeline's retrieval consumers.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.ops.quant import int8_dot_general
from vit_research_tpu.utils.configs import VIT_B16_224


def _rel_err(got, ref):
    return float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))


class TestInt8DotGeneral:
    def test_dense_contraction(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 37, 96)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(96, 128)) * 0.05, jnp.float32)
        dn = (((2,), (0,)), ((), ()))
        assert _rel_err(int8_dot_general(x, w, dn),
                        lax.dot_general(x, w, dn)) < 2e-2

    def test_negative_axes_match_positive(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, 5, 32)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
        a = int8_dot_general(x, w, (((2,), (0,)), ((), ())))
        b = int8_dot_general(x, w, (((-1,), (0,)), ((), ())))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multi_axis_contraction(self):
        # The attention out-projection: (B,T,H,dh) x (H,dh,D).
        rng = np.random.default_rng(2)
        o = jnp.asarray(rng.normal(size=(2, 9, 4, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(4, 8, 24)) * 0.1, jnp.float32)
        dn = (((2, 3), (0, 1)), ((), ()))
        assert _rel_err(int8_dot_general(o, w, dn),
                        lax.dot_general(o, w, dn)) < 2e-2

    def test_scale_invariance_per_row(self):
        # Per-token scales: scaling one token must not perturb another
        # token's quantized output row.
        rng = np.random.default_rng(3)
        x = np.asarray(rng.normal(size=(1, 4, 32)), np.float32)
        w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
        dn = (((2,), (0,)), ((), ()))
        base = np.asarray(int8_dot_general(jnp.asarray(x), w, dn))
        x2 = x.copy()
        x2[0, 0] *= 1000.0
        scaled = np.asarray(int8_dot_general(jnp.asarray(x2), w, dn))
        np.testing.assert_allclose(scaled[0, 1:], base[0, 1:], rtol=1e-6)

    def test_output_dtype_follows_promotion(self):
        x = jnp.ones((2, 8), jnp.bfloat16)
        w = jnp.ones((8, 4), jnp.bfloat16)
        out = int8_dot_general(x, w, (((1,), (0,)), ((), ())))
        assert out.dtype == jnp.bfloat16

    def test_straight_through_gradients(self):
        # round/clip would zero every gradient; the STE backward must
        # instead match the unquantized dot's gradients exactly.
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(5, 24)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(24, 12)) * 0.1, jnp.float32)
        dn = (((1,), (0,)), ((), ()))

        def loss_q(x, w):
            return jnp.sum(jnp.sin(int8_dot_general(x, w, dn)))

        def loss_f(x, w):
            return jnp.sum(jnp.sin(lax.dot_general(x, w, dn)))

        gq = jax.grad(loss_q, argnums=(0, 1))(x, w)
        gf = jax.grad(loss_f, argnums=(0, 1))(x, w)
        for a, b in zip(gq, gf):
            assert float(jnp.linalg.norm(a)) > 0
            # sin' is evaluated at the (slightly different) quantized
            # primal, so allow a small relative difference.
            assert _rel_err(a, b) < 0.1

    def test_gradients_flow_through_multi_axis(self):
        rng = np.random.default_rng(5)
        o = jnp.asarray(rng.normal(size=(2, 7, 4, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(4, 8, 16)) * 0.1, jnp.float32)
        dn = (((2, 3), (0, 1)), ((), ()))
        g = jax.grad(lambda a, b: jnp.sum(int8_dot_general(a, b, dn) ** 2),
                     argnums=(0, 1))(o, w)
        assert g[0].shape == o.shape and g[1].shape == w.shape
        assert all(float(jnp.linalg.norm(x)) > 0 for x in g)

    def test_batch_dims_unsupported(self):
        x = jnp.ones((2, 3, 4))
        w = jnp.ones((2, 4, 5))
        with pytest.raises(NotImplementedError):
            int8_dot_general(x, w, (((2,), (1,)), ((0,), (0,))))


class TestQuantizedViT:
    def _small(self, **over):
        return dataclasses.replace(
            VIT_B16_224, num_layers=3, hidden_size=96, num_heads=4,
            mlp_dim=192, image_size=(96, 96), **over)

    def test_param_tree_identical_and_outputs_close(self):
        cfg_f = self._small()
        cfg_q = self._small(gemm_quant="int8")
        model_f, params = init_vit(cfg_f, seed=0)
        model_q, params_q = init_vit(cfg_q, seed=0)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_q))
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(2, 96, 96, 3)), jnp.float32)
        e_f = model_f.apply(params, img)["pre_logits"]
        e_q = model_q.apply(params, img)["pre_logits"]  # f32 params load as-is
        cos = jnp.sum(e_f * e_q, -1) / (
            jnp.linalg.norm(e_f, axis=-1) * jnp.linalg.norm(e_q, axis=-1))
        assert float(jnp.min(cos)) > 0.98

    def test_composes_with_tome(self):
        cfg = self._small(gemm_quant="int8", tome_r=2)
        model, params = init_vit(cfg, seed=0)
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=(2, 96, 96, 3)), jnp.float32)
        out = model.apply(params, img)
        assert out["pre_logits"].shape == (2, 96)
        assert np.isfinite(np.asarray(out["pre_logits"])).all()

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="gemm_quant"):
            init_vit(self._small(gemm_quant="fp8"), seed=0)

    def test_int8_dot_under_dp_mesh_is_bit_exact(self):
        # The quantized dot itself is batch-sharding-invariant: per-row
        # activation scales (max|x| over the contracted axis) and the
        # integer multiply-accumulate are order-independent, so sharding
        # the row axis over the 8-device mesh must reproduce the
        # single-device result bit-for-bit.
        import jax.sharding as shd

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(16, 12, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 48)) * 0.05, jnp.float32)
        dn = (((2,), (0,)), ((), ()))
        f = jax.jit(lambda a, b: int8_dot_general(a, b, dn))
        single = np.asarray(f(x, w))

        mesh = shd.Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        x_s = jax.device_put(
            x, shd.NamedSharding(mesh, shd.PartitionSpec("data")))
        w_r = jax.device_put(w, shd.NamedSharding(mesh, shd.PartitionSpec()))
        np.testing.assert_array_equal(np.asarray(f(x_s, w_r)), single)

    def test_int8_forward_under_dp_mesh_tracks_single_device(self):
        # Full-model DP forward: NOT bit-exact, because the partitioned
        # program fuses the f32 pre-GEMM math (LayerNorm etc.) differently,
        # and ~1e-7 input wobble flips int8 rounding at bucket boundaries;
        # a handful of +-1-bucket flips compound through the layers.
        # What we pin: the sharded result stays within a small fraction of
        # the model's own quantization error vs f32 (>= 1e-1 rel).
        import jax.sharding as shd

        cfg = self._small(gemm_quant="int8")
        model, params = init_vit(cfg, seed=0)
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.uniform(size=(8, 96, 96, 3)), jnp.float32)
        f = jax.jit(lambda p, x: model.apply(p, x)["pre_logits"])
        single = np.asarray(f(params, img))

        mesh = shd.Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
        img_s = jax.device_put(
            img, shd.NamedSharding(mesh, shd.PartitionSpec("data")))
        params_r = jax.device_put(
            params, shd.NamedSharding(mesh, shd.PartitionSpec()))
        sharded = np.asarray(f(params_r, img_s))
        assert _rel_err(jnp.asarray(sharded), jnp.asarray(single)) < 2e-2

    def test_quantization_aware_training_reduces_loss(self):
        # The STE backward makes the int8 backbone trainable end-to-end:
        # a few joint-train steps on one batch must reduce the loss
        # (without the STE every GEMM gradient would be zero and the
        # loss would only move through the LN/bias/head params).
        import optax

        from vit_research_tpu.models.heads import ProjectionHead, RAGHead
        from vit_research_tpu.train.train_step import make_joint_train_step
        from vit_research_tpu.utils.configs import HeadConfig

        cfg = dataclasses.replace(
            self._small(gemm_quant="int8"), image_size=(32, 32),
            patch_size=8, num_layers=1)
        vit, vit_params = init_vit(cfg, seed=0)
        proj = ProjectionHead(input_dim=96, hidden_dim=32, proj_dim=16)
        head = RAGHead(HeadConfig(embed_dim=16, num_layers=1, num_heads=2,
                                  num_queries=2))
        rng = np.random.default_rng(0)
        frames = jnp.asarray(rng.uniform(size=(4, 2, 32, 32, 3)), jnp.float32)
        retrieved = jnp.asarray(rng.normal(size=(4, 3, 16)), jnp.float32)
        labels = jnp.asarray([0, 1, 0, 1], jnp.float32)
        key = jax.random.PRNGKey(0)
        params = {
            "vit": vit_params,
            "proj": proj.init(key, jnp.zeros((1, 96))),
            "head": head.init(key, jnp.zeros((1, 16)),
                              jnp.zeros((1, 3, 16))),
        }
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)
        step = make_joint_train_step(vit, proj, head, tx)
        first = None
        for _ in range(15):
            params, opt_state, loss = step(params, opt_state, frames,
                                           retrieved, labels)
            first = first if first is not None else float(loss)
        assert float(loss) < first * 0.8


class TestStaticInt8:
    """gemm_quant='int8-static': calibrated per-site activation scales
    baked as graph constants (VERDICT r3 item 1 — removes the dynamic
    path's per-GEMM abs-max reduction)."""

    def _small(self, **over):
        return dataclasses.replace(
            VIT_B16_224, num_layers=3, hidden_size=96, num_heads=4,
            mlp_dim=192, image_size=(96, 96), **over)

    def _calibrated(self, **over):
        from vit_research_tpu.ops.quant import calibration_mode

        cfg = self._small(gemm_quant="int8-static", **over)
        model, params = init_vit(cfg, seed=0)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(2, 96, 96, 3)), jnp.float32)
        with calibration_mode() as scales:
            model.apply(params, img)
        assert len(scales) == 3 * 6  # 6 dense sites per layer, in order
        cfg = dataclasses.replace(cfg, gemm_quant_scales=tuple(scales))
        model_s, _ = init_vit(cfg, seed=0)
        return model_s, params, img

    def test_calibrate_then_static_outputs_close_to_f32(self):
        model_s, params, img = self._calibrated()
        model_f, _ = init_vit(self._small(), seed=0)
        e_f = model_f.apply(params, img)["pre_logits"]
        e_s = model_s.apply(params, img)["pre_logits"]
        cos = jnp.sum(e_f * e_s, -1) / (
            jnp.linalg.norm(e_f, axis=-1) * jnp.linalg.norm(e_s, axis=-1))
        # per-tensor static scales are coarser than dynamic per-token
        assert float(jnp.min(cos)) > 0.97

    def test_static_jits_and_matches_eager(self):
        model_s, params, img = self._calibrated()
        eager = model_s.apply(params, img)["pre_logits"]
        jitted = jax.jit(lambda p, x: model_s.apply(p, x)["pre_logits"])
        out = jitted(params, img)
        # jit fuses the round/clip into different epilogues than eager
        # dispatch on CPU — semantics equal, last-ulp rounding differs
        np.testing.assert_allclose(np.asarray(out), np.asarray(eager),
                                   atol=1e-4, rtol=1e-4)
        # a second trace at another batch shape restarts the site cursor
        out3 = jitted(params, jnp.concatenate([img, img, img]))
        assert out3.shape == (6, 96)

    def test_uncalibrated_static_is_a_hard_error(self):
        cfg = self._small(gemm_quant="int8-static")
        model, params = init_vit(cfg, seed=0)
        img = jnp.zeros((1, 96, 96, 3), jnp.float32)
        with pytest.raises(ValueError, match="calibration_mode"):
            model.apply(params, img)

    def test_scale_count_mismatch_is_a_hard_error(self):
        # too few scales — caught by the setup-time site-count check
        # (which also guards the too-many direction, tested below),
        # failing fast at param init before any apply
        cfg = dataclasses.replace(self._small(gemm_quant="int8-static"),
                                  gemm_quant_scales=(0.1, 0.2))
        with pytest.raises(ValueError, match="18 dense dot sites"):
            init_vit(cfg, seed=0)

    def test_static_close_to_dynamic_int8(self):
        model_s, params, img = self._calibrated()
        model_d, _ = init_vit(self._small(gemm_quant="int8"), seed=0)
        e_d = model_d.apply(params, img)["pre_logits"]
        e_s = model_s.apply(params, img)["pre_logits"]
        cos = jnp.sum(e_d * e_s, -1) / (
            jnp.linalg.norm(e_d, axis=-1) * jnp.linalg.norm(e_s, axis=-1))
        assert float(jnp.min(cos)) > 0.98

    def test_gradients_flow_static(self):
        from vit_research_tpu.ops.quant import StaticInt8DotGeneral

        x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)),
                        jnp.float32)
        w = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)),
                        jnp.float32)
        dot = StaticInt8DotGeneral((0.05,))

        def loss(w):
            return jnp.sum(dot(x, w, (((1,), (0,)), ((), ()))) ** 2)

        g = jax.grad(loss)(w)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_wrong_architecture_scales_rejected(self):
        # too MANY scales = calibration from a different architecture —
        # must be as hard an error as too few (review r4)
        cfg = dataclasses.replace(self._small(gemm_quant="int8-static"),
                                  gemm_quant_scales=tuple([0.04] * 72))
        with pytest.raises(ValueError, match="different architecture"):
            init_vit(cfg, seed=0)
