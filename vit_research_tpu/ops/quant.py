"""Dynamic int8 quantization for the transformer GEMMs (opt-in).

TPU v5e's MXU runs int8 matmuls ~1.8x faster than bf16 (measured
307 TOP/s vs 168 TFLOP/s at the ViT-B MLP shape, BENCH_NOTES.md). This
module
provides ``int8_dot_general`` — a drop-in for ``jax.lax.dot_general``
that dynamically quantizes both operands to symmetric int8 (per-token
activation scales, per-output-channel weight scales), runs the
contraction as s8 x s8 -> s32 on the MXU, dequantizes, and backprops
via a straight-through estimator (QAT-ready). It is injected into the
flax ``nn.Dense``/``nn.DenseGeneral`` layers via their ``dot_general``
argument, so the module structure — and therefore XLA's schedule of the
surrounding graph, measured to matter (BENCH_NOTES.md, "apply-level
rewrites are a trap") — and the parameter tree are unchanged: any
checkpoint loads into the quantized model.

Measured end-to-end at ViT-B/16 embed shapes the dynamic-quantization
elementwise passes offset the MXU gain (throughput ties bf16), so this
is a quantization-aware-training and GEMM-dominated-shape capability,
not an embed-throughput knob. Off the parity path (quantization
perturbs outputs ~1e-2 relative per GEMM); enable via
``ViTConfig(gemm_quant="int8")``; composes with ``tome_r``. No
reference counterpart — the reference runs f32 throughout
(e.g. nba_proj/train/training.py:47-60).
"""

from __future__ import annotations

import contextlib
import functools
import threading

import jax
import jax.numpy as jnp
from jax import lax


def _axmax_scale(x: jnp.ndarray, axes: tuple) -> jnp.ndarray:
    """Symmetric abs-max scale over ``axes`` (kept as size-1 dims)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True)
    return jnp.maximum(s, 1e-12) / 127.0


def _int8_dot_forward(dimension_numbers, lhs, rhs):
    (lc, rc), (lb, rb) = dimension_numbers

    ls = _axmax_scale(lhs, lc)
    rs = _axmax_scale(rhs, rc)
    lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                  -127, 127).astype(jnp.int8)
    rq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / rs),
                  -127, 127).astype(jnp.int8)

    out = lax.dot_general(lq, rq, dimension_numbers,
                          preferred_element_type=jnp.int32)

    ls_free = jnp.squeeze(ls, axis=lc)  # (*lhs_free,)
    rs_free = jnp.squeeze(rs, axis=rc)  # (*rhs_free,)
    scale = ls_free.reshape(ls_free.shape + (1,) * rs_free.ndim) * rs_free
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    return (out.astype(jnp.float32) * scale).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _int8_dot_ste(dimension_numbers, lhs, rhs):
    return _int8_dot_forward(dimension_numbers, lhs, rhs)


def _ste_fwd(dimension_numbers, lhs, rhs):
    return _int8_dot_forward(dimension_numbers, lhs, rhs), (lhs, rhs)


def _ste_bwd(dimension_numbers, res, g):
    # Straight-through estimator: gradients as if the contraction were
    # the unquantized dot evaluated at the same operands (round/clip
    # would otherwise zero every gradient, silently breaking training
    # with gemm_quant enabled). The primal f32 dot inside jax.vjp is
    # unused and DCE'd under jit; only the two transpose contractions
    # remain.
    lhs, rhs = res
    _, vjp = jax.vjp(
        lambda a, b: lax.dot_general(a, b, dimension_numbers), lhs, rhs)
    dl, dr = vjp(g.astype(jnp.promote_types(lhs.dtype, rhs.dtype)))
    return dl, dr


_int8_dot_ste.defvjp(_ste_fwd, _ste_bwd)


def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """``lax.dot_general`` with both operands dynamically quantized to int8.

    Scales are per-slice along the non-contracted dims (per token for the
    activations, per output channel for the weights), so the dequantized
    result ``(s8 @ s8).int32 * (s_lhs x s_rhs)`` tracks the f32 product to
    ~1e-2 relative error. Differentiable via a straight-through
    estimator (backward is the unquantized dot's transpose), so
    quantization-aware training works. Batch dims are unsupported (the
    flax dense layers never pass them); ``precision``/
    ``preferred_element_type`` of the float contraction are irrelevant to
    the int8 path and ignored.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if lb or rb:
        raise NotImplementedError("int8_dot_general supports no batch dims")
    lc = tuple(a % lhs.ndim for a in lc)
    rc = tuple(a % rhs.ndim for a in rc)
    return _int8_dot_ste(((lc, rc), (lb, rb)), lhs, rhs)


# --------------------------------------------------------------- static
#
# Dynamic quantization ties bf16 end-to-end because every GEMM pays an
# abs-max REDUCTION over the activations before it can quantize — a full
# extra HBM pass that XLA cannot fuse into the producer (BENCH_NOTES.md,
# "dynamic int8 GEMMs"). The static path removes exactly that cost: the
# per-site activation scale is a CONSTANT baked into the graph, measured
# once offline on a calibration batch, so the forward's only quantize
# work is a round/clip that fuses into the preceding elementwise
# epilogue. Weight scales stay per-output-channel and in-graph (the
# weight-side abs-max is over the (D_in,) contraction of a weight tensor
# — thousands of times smaller than the token-dim activation pass).
#
# The scale is per-SITE and per-TENSOR (one scalar per dense layer, in
# deterministic trace order), coarser than the dynamic path's per-token
# scales: expect ~2-4x the quantization error, still ~1e-2 relative.
# CALIBRATION COVERAGE MATTERS: scales calibrated on random pixels
# measured 0.9884 mean cosine vs f32 on structured frames, vs 0.99986
# when calibrated on 8 representative frames of the same world
# (BENCH_NOTES.md "static-int8 calibration coverage") — always
# calibrate on frames drawn from the distribution you will embed.
# Calibration must run EAGERLY (outside jit — the recorder reads
# concrete values):
#
#     cfg = dataclasses.replace(cfg, gemm_quant="int8-static")
#     model, params = init_vit(cfg, seed=0)
#     with calibration_mode() as scales:
#         model.apply(params, sample_images)          # eager forward
#     cfg = dataclasses.replace(cfg, gemm_quant_scales=tuple(scales))
#     model, _ = init_vit(cfg, seed=0)                # static, jittable

_calibration = threading.local()


@contextlib.contextmanager
def calibration_mode():
    """Collect per-site static activation scales from eager forwards.

    Yields a list that fills with one scale per dot-general call site in
    execution order (multiple forwards under one context max-reduce per
    site — calibrate over several batches for a safer envelope)."""
    if getattr(_calibration, "scales", None) is not None:
        raise RuntimeError("calibration_mode is not reentrant")
    _calibration.scales = []
    try:
        yield _calibration.scales
    finally:
        _calibration.scales = None


def _static_int8_dot_forward(dimension_numbers, act_scale, lhs, rhs):
    (lc, rc), _ = dimension_numbers
    ls = jnp.asarray(act_scale, jnp.float32)
    rs = _axmax_scale(rhs, rc)
    lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                  -127, 127).astype(jnp.int8)
    rq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / rs),
                  -127, 127).astype(jnp.int8)
    out = lax.dot_general(lq, rq, dimension_numbers,
                          preferred_element_type=jnp.int32)
    rs_free = jnp.squeeze(rs, axis=rc)
    out_dtype = jnp.promote_types(lhs.dtype, rhs.dtype)
    return (out.astype(jnp.float32) * (ls * rs_free)).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _static_int8_dot_ste(dimension_numbers, act_scale, lhs, rhs):
    return _static_int8_dot_forward(dimension_numbers, act_scale, lhs, rhs)


def _static_ste_fwd(dimension_numbers, act_scale, lhs, rhs):
    return (_static_int8_dot_forward(dimension_numbers, act_scale, lhs, rhs),
            (lhs, rhs))


def _static_ste_bwd(dimension_numbers, act_scale, res, g):
    return _ste_bwd(dimension_numbers, res, g)


_static_int8_dot_ste.defvjp(_static_ste_fwd, _static_ste_bwd)


class StaticInt8DotGeneral:
    """``lax.dot_general`` replacement with STATIC per-site activation
    scales, consumed in call order.

    One instance is created per model ``apply`` (flax ``setup`` runs per
    binding), so the site cursor naturally starts at 0 for every forward
    — including every distinct jit trace (pad buckets). With EMPTY
    scales inside :func:`calibration_mode`, each call records
    ``max|activation| / 127`` into the active list and computes the
    dynamic-int8 result (so calibration sees int8-conditioned
    downstream activations); with scales, each call consumes the next
    one. Empty scales outside calibration is a hard error — silently
    falling back to dynamic would quietly re-add the cost this path
    exists to remove."""

    def __init__(self, scales=()):
        self.scales = tuple(float(s) for s in scales)
        self._i = 0

    def __call__(self, lhs, rhs, dimension_numbers, precision=None,
                 preferred_element_type=None):
        (lc, rc), (lb, rb) = dimension_numbers
        if lb or rb:
            raise NotImplementedError(
                "StaticInt8DotGeneral supports no batch dims")
        lc = tuple(a % lhs.ndim for a in lc)
        rc = tuple(a % rhs.ndim for a in rc)
        dn = ((lc, rc), (lb, rb))
        recording = getattr(_calibration, "scales", None)
        if not self.scales:
            if recording is None:
                raise ValueError(
                    "gemm_quant='int8-static' needs calibrated scales: "
                    "run one eager forward under quant.calibration_mode() "
                    "and set ViTConfig.gemm_quant_scales to the result")
            m = float(jnp.max(jnp.abs(lhs.astype(jnp.float32)))) / 127.0
            m = max(m, 1e-12)
            if self._i < len(recording):
                recording[self._i] = max(recording[self._i], m)
            else:
                recording.append(m)
            self._i += 1
            return _int8_dot_ste(dn, lhs, rhs)
        if self._i >= len(self.scales):
            raise ValueError(
                f"static int8 scales exhausted at call {self._i}: the "
                f"model makes more dot_general calls than the "
                f"{len(self.scales)} calibration recorded — re-calibrate "
                "with the same architecture flags")
        s = self.scales[self._i]
        self._i += 1
        return _static_int8_dot_ste(dn, s, lhs, rhs)
