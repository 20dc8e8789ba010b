"""Test harness: run everything on a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; multi-chip sharding is validated on
XLA's host platform with 8 virtual devices (the TPU analog of a fake
backend — see SURVEY.md section 4).

Note: the image's sitecustomize pre-imports jax and pins
JAX_PLATFORMS=axon, so the platform must be overridden through
jax.config (backends initialize lazily), not env vars."""

import os

# TensorFlow (the differential oracles) must not use oneDNN fast-math:
# its reordered f32 accumulation drifts ~1e-4 per dense layer vs exact
# f32, which the unscaled-pooler heads amplify to ~1e-2 at the logits —
# enough to sink loop-level trajectory differentials. Must be set before
# the first tensorflow import anywhere in the process.
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# A pre-set count other than 8 (e.g. left over from a debugging shell)
# would make every mesh test fail with confusing reshape errors deep in
# sharding code — diagnose it here instead.
assert jax.device_count() == 8, (
    f"tests assume 8 virtual CPU devices, got {jax.device_count()} — "
    f"check the inherited XLA_FLAGS ({os.environ.get('XLA_FLAGS')!r})")
# CPU oneDNN matmuls default to bf16-like precision in this jax build;
# pin full precision so numeric tests compare against numpy references.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
