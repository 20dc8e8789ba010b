"""Shared engine construction for the example bench harnesses.

One copy of the parity / tiny-smoke configurations and of the
VRT_PLATFORM routing, so the measured configuration cannot drift
between harnesses (bench_e2e_segment, bench_rebuild_chunk,
bench_softmax_bf16 previously each carried their own copy).
"""

import dataclasses
import os


def route_platform() -> None:
    """Honor VRT_PLATFORM before any backend initializes.

    The image's sitecustomize pre-imports jax pinned to the axon TPU
    tunnel; JAX_PLATFORMS set later is IGNORED. Backends initialize
    lazily, so routing through jax.config (the way the CLI does) still
    wins — this is what keeps --tiny smokes off-device."""
    if os.environ.get("VRT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["VRT_PLATFORM"])


def build_engine(batch: int, tiny: bool = False, tome_r: int = 0,
                 **cfg_overrides):
    """The production frame-embedding engine at the parity configuration
    (HF ViT-B/16 @224, bf16, fused patch embed), or the tiny 32x32 ViT
    used by CPU smokes (not a perf configuration)."""
    from vit_research_tpu.data.preprocess import HF_VIT_SPEC, PreprocessSpec
    from vit_research_tpu.models.hf_import import HF_VIT_B16_224
    from vit_research_tpu.models.vit import init_vit
    from vit_research_tpu.parallel.embed import EmbeddingEngine
    from vit_research_tpu.utils.configs import ViTConfig

    if tiny:
        cfg = ViTConfig(image_size=(32, 32), patch_size=8, hidden_size=64,
                        num_layers=2, num_heads=2, mlp_dim=128,
                        use_flash_attention=False, tome_r=tome_r,
                        **cfg_overrides)
        spec = PreprocessSpec(size=(32, 32))
    else:
        cfg = dataclasses.replace(HF_VIT_B16_224, dtype="bfloat16",
                                  tome_r=tome_r, **cfg_overrides)
        spec = HF_VIT_SPEC
    model, params = init_vit(cfg, seed=0)
    return EmbeddingEngine(model, params, spec, batch_size=batch,
                           use_fused_patch_embed=not tiny)
