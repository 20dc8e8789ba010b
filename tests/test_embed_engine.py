"""Embedding engine: fused vs. conv parity, sharded-mesh parity, padding."""

import dataclasses

import jax
import numpy as np
import pytest

from vit_research_tpu.data.preprocess import PreprocessSpec
from vit_research_tpu.models.vit import init_vit
from vit_research_tpu.parallel.embed import EmbeddingEngine
from vit_research_tpu.parallel.mesh import make_mesh
from vit_research_tpu.utils.configs import ViTConfig

TINY = ViTConfig(
    image_size=(32, 32), patch_size=8, hidden_size=64, num_layers=2,
    num_heads=2, mlp_dim=128, use_flash_attention=False,
)
SPEC = PreprocessSpec(size=(32, 32), rescale=1 / 255.0,
                      mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))


@pytest.fixture(scope="module")
def model_params():
    return init_vit(TINY, seed=0)


def rand_batch(n, rng=None):
    rng = rng or np.random.default_rng(0)
    return rng.integers(0, 256, size=(n, 32, 32, 3)).astype(np.uint8)


def test_fused_matches_conv_path(model_params):
    model, params = model_params
    imgs = rand_batch(4)
    fused = EmbeddingEngine(model, params, SPEC, batch_size=4,
                            use_fused_patch_embed=True, interpret_pallas=True)
    conv = EmbeddingEngine(model, params, SPEC, batch_size=4,
                           use_fused_patch_embed=False)
    a = fused.embed_batch(imgs)
    b = conv.embed_batch(imgs)
    assert a.shape == (4, 64)
    cos = (a * b).sum(-1)
    assert (1 - cos).max() < 1e-4  # both outputs are L2-normalized


def test_l2_normalized(model_params):
    model, params = model_params
    eng = EmbeddingEngine(model, params, SPEC, batch_size=4,
                          use_fused_patch_embed=False)
    out = eng.embed_batch(rand_batch(4))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)


def test_padding_and_multi_dispatch(model_params):
    model, params = model_params
    eng = EmbeddingEngine(model, params, SPEC, batch_size=4,
                          use_fused_patch_embed=False)
    imgs = rand_batch(10)  # 3 dispatches: 4 + 4 + 2(padded)
    out = eng.embed_batch(imgs)
    assert out.shape == (10, 64)
    ref = eng.embed_batch(imgs[:4])
    np.testing.assert_allclose(out[:4], ref, atol=1e-5)


def test_sharded_mesh_matches_single_device(model_params):
    model, params = model_params
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    mesh = make_mesh((8,), ("data",))
    sharded = EmbeddingEngine(model, params, SPEC, mesh=mesh, batch_size=16,
                              use_fused_patch_embed=False)
    single = EmbeddingEngine(model, params, SPEC, batch_size=16,
                             use_fused_patch_embed=False)
    imgs = rand_batch(16)
    a = sharded.embed_batch(imgs)
    b = single.embed_batch(imgs)
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_token_endpoint_under_mesh(model_params):
    # Regression: out_shardings/out_dim used to hardcode rank-2 output,
    # breaking non-pooled endpoints ('encoded_tokens' is (B, T, D)).
    model, params = model_params
    mesh = make_mesh((8,), ("data",))
    eng = EmbeddingEngine(model, params, SPEC, mesh=mesh, batch_size=8,
                          endpoint="encoded_tokens", l2_normalize=False,
                          use_fused_patch_embed=False)
    out = eng.embed_batch(rand_batch(8))
    assert out.shape == (8, 17, 64)  # CLS + 4x4 patches
    assert eng.out_trailing == (17, 64) and eng.out_dim == 64
    single = EmbeddingEngine(model, params, SPEC, batch_size=8,
                             endpoint="encoded_tokens", l2_normalize=False,
                             use_fused_patch_embed=False)
    np.testing.assert_allclose(out, single.embed_batch(rand_batch(8)),
                               atol=1e-4)
    # the N == 0 fallback keeps the endpoint's rank too
    assert eng.embed_paths([]).shape == (0, 17, 64)


def test_warmup_precompiles_buckets(model_params):
    """warmup() traces the forward jit and the small-request pad buckets
    so a serving daemon's first requests pay no cold compile (ADVICE r2).
    Results after warmup must be unchanged."""
    model, params = model_params
    eng = EmbeddingEngine(model, params, SPEC, batch_size=128,
                          use_fused_patch_embed=False)
    eng.warmup(buckets=(32, 64))
    if hasattr(eng._pad_jit, "_cache_size"):
        assert eng._pad_jit._cache_size() >= 2  # both buckets compiled
    imgs = rand_batch(3)
    small = EmbeddingEngine(model, params, SPEC, batch_size=128,
                            use_fused_patch_embed=False)
    np.testing.assert_allclose(eng.embed_batch(imgs),
                               small.embed_batch(imgs), atol=1e-6)


def test_embed_paths_pipeline(tmp_path, model_params):
    from vit_research_tpu.data import synthetic

    model, params = model_params
    paths = synthetic.write_video_frames(
        str(tmp_path / "f"), 1, [("left", 5), ("right", 5)], size=(32, 32))
    eng = EmbeddingEngine(model, params, SPEC, batch_size=4,
                          use_fused_patch_embed=False)
    out = eng.embed_paths(paths, num_workers=2)
    assert out.shape == (10, 64)
    # Batch path and path path agree.
    from vit_research_tpu.data.preprocess import load_frames

    batch = load_frames(paths, SPEC, num_workers=2)
    np.testing.assert_allclose(out, eng.embed_batch(batch), atol=1e-5)


def test_embed_paths_prefetch_matches_inline(tmp_path, model_params):
    from vit_research_tpu.data import synthetic

    model, params = model_params
    paths = synthetic.write_video_frames(
        str(tmp_path / "pf"), 2, [("left", 7), ("none", 6)], size=(32, 32))
    eng = EmbeddingEngine(model, params, SPEC, batch_size=4,
                          use_fused_patch_embed=False)
    inline = eng.embed_paths(paths, num_workers=2, prefetch=0)
    buffered = eng.embed_paths(paths, num_workers=2, prefetch=3)
    np.testing.assert_allclose(buffered, inline, atol=1e-6)


def test_embed_paths_prefetch_propagates_decode_errors(model_params):
    model, params = model_params
    eng = EmbeddingEngine(model, params, SPEC, batch_size=4,
                          use_fused_patch_embed=False)
    with pytest.raises(Exception):
        eng.embed_paths(["/nonexistent/frame.jpg"] * 6, num_workers=2,
                        prefetch=2)


def test_bf16_softmax_close_to_f32(model_params):
    """ViTConfig.softmax_dtype='bfloat16' (the VPU-traffic speed knob,
    BENCH_NOTES.md) stays within the 1e-3 cosine production budget of the
    f32-softmax parity path on identical weights."""
    model, params = model_params
    bf16_model, _ = init_vit(dataclasses.replace(TINY,
                                                 softmax_dtype="bfloat16"),
                             seed=0)
    imgs = rand_batch(8)
    a = EmbeddingEngine(model, params, SPEC, batch_size=8,
                        use_fused_patch_embed=False).embed_batch(imgs)
    b = EmbeddingEngine(bf16_model, params, SPEC, batch_size=8,
                        use_fused_patch_embed=False).embed_batch(imgs)
    cos = (a * b).sum(-1)  # both L2-normalized
    assert (1 - cos).max() < 1e-3, (1 - cos).max()
    # ...and it is NOT the identical computation (the flag is live).
    assert np.abs(a - b).max() > 0


def test_softmax_dtype_validated():
    with pytest.raises(ValueError, match="softmax_dtype"):
        init_vit(dataclasses.replace(TINY, softmax_dtype="float16"), seed=0)


def test_bf16_softmax_live_under_flash_attention(model_params):
    """softmax_dtype='bfloat16' must not be silently ignored when the
    Pallas path is enabled: the attention routes to XLA (which honors the
    dtype) instead of the f32-internal kernel."""
    model, params = model_params
    bf16_flash, _ = init_vit(
        dataclasses.replace(TINY, softmax_dtype="bfloat16",
                            use_flash_attention=True),
        seed=0, interpret_pallas=True)
    bf16_xla, _ = init_vit(
        dataclasses.replace(TINY, softmax_dtype="bfloat16"), seed=0)
    imgs = rand_batch(4)
    a = EmbeddingEngine(bf16_flash, params, SPEC, batch_size=4,
                        use_fused_patch_embed=False).embed_batch(imgs)
    b = EmbeddingEngine(bf16_xla, params, SPEC, batch_size=4,
                        use_fused_patch_embed=False).embed_batch(imgs)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_small_request_bucketed_transfer_matches_host_pad(model_params):
    """Serving fix (BENCH_NOTES 2026-08-20): a request much smaller than
    the engine batch transfers only a power-of-two bucket of real frames
    and zero-pads ON DEVICE — bytes moved scale with offered load, not
    engine batch size. Results must be identical to the host-pad path."""
    model, params = model_params
    big = EmbeddingEngine(model, params, SPEC, batch_size=128,
                          use_fused_patch_embed=False)
    small = EmbeddingEngine(model, params, SPEC, batch_size=8,
                            use_fused_patch_embed=False)
    # bucket selection: pow2 >= n, min 32, None once it reaches the batch
    assert big._transfer_bucket(5) == 32
    assert big._transfer_bucket(33) == 64
    assert big._transfer_bucket(64) == 64
    assert big._transfer_bucket(65) is None  # 128 == batch: host pad
    assert big._transfer_bucket(128) is None
    assert small._transfer_bucket(3) is None  # 32 >= batch: host pad
    imgs = rand_batch(5)
    a = big.embed_batch(imgs)    # bucketed device-pad dispatch
    b = small.embed_batch(imgs)  # classic host-pad dispatch
    assert a.shape == (5, 64)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_small_request_bucketed_transfer_under_mesh(model_params):
    """The device-pad path under a data mesh: the bucket stays a multiple
    of the data axis and results match the single-device engine."""
    model, params = model_params
    mesh = make_mesh((8,), ("data",))
    sharded = EmbeddingEngine(model, params, SPEC, mesh=mesh, batch_size=64,
                              use_fused_patch_embed=False)
    assert sharded._transfer_bucket(5) == 32  # already a multiple of 8
    single = EmbeddingEngine(model, params, SPEC, batch_size=64,
                             use_fused_patch_embed=False)
    imgs = rand_batch(5)
    np.testing.assert_allclose(sharded.embed_batch(imgs),
                               single.embed_batch(imgs), atol=1e-4)
